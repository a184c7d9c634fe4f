"""robots.txt parse + gate (operators/robots.py): RFC 9309 group
semantics, Google-extension pattern matching, longest-match verdicts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_text_spark.operators.robots import (
    parse_robots,
    robots_verdict,
    url_path,
)

ROBOTS_A = """# site policy
User-agent: *
Disallow: /private/
Allow: /private/public/

User-agent: strictbot
User-agent: gptbot
Disallow: /
Allow: /welcome$
"""


def _rules(spark):
    rb = spark.createDataFrame(
        [
            ("a.example", ROBOTS_A),
            ("b.example", "User-agent: *\nDisallow: /tmp/*.log\n"),
            # rules before any User-agent line are invalid -> dropped
            ("c.example", "Disallow: /\n"),
        ],
        ["domain", "robots_txt"],
    )
    return parse_robots(rb)


def test_parse_groups_and_agents(spark):
    got = {
        (r.domain, r.agent, r.rule_type, r.path_prefix)
        for r in _rules(spark).collect()
    }
    # blank line does NOT end the '*' group; both UA lines of the
    # second group share its rules; empty values and pre-group rules
    # are gone
    assert got == {
        ("a.example", "*", "disallow", "/private/"),
        ("a.example", "*", "allow", "/private/public/"),
        ("a.example", "strictbot", "disallow", "/"),
        ("a.example", "strictbot", "allow", "/welcome$"),
        ("a.example", "gptbot", "disallow", "/"),
        ("a.example", "gptbot", "allow", "/welcome$"),
        ("b.example", "*", "disallow", "/tmp/*.log"),
    }


def test_verdicts_star_agent(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.example/open/x",),
            ("https://a.example/private/x",),
            ("https://a.example/private/public/x",),  # longest match: allow
            ("https://b.example/tmp/x.log?q=1",),      # query dropped
            ("https://b.example/tmp/x.logs",),         # unanchored wildcard
            ("https://c.example/anything",),           # no valid rules
            ("https://d.example/",),                   # no robots at all
        ],
        ["url"],
    )
    got = {
        r.url: (r.allowed, r.matched_prefix)
        for r in robots_verdict(urls, _rules(spark), agent="*").collect()
    }
    assert got["https://a.example/open/x"] == (True, None)
    assert got["https://a.example/private/x"] == (False, "/private/")
    assert got["https://a.example/private/public/x"] == (
        True,
        "/private/public/",
    )
    assert got["https://b.example/tmp/x.log?q=1"] == (False, "/tmp/*.log")
    assert got["https://b.example/tmp/x.logs"] == (False, "/tmp/*.log")
    assert got["https://c.example/anything"] == (True, None)
    assert got["https://d.example/"] == (True, None)


def test_verdicts_specific_agent_with_fallback(spark):
    urls = spark.createDataFrame(
        [
            ("https://a.example/welcome",),   # $-anchored allow, len ties /
            ("https://a.example/welcome2",),  # anchor misses -> '/' disallow
            ("https://b.example/tmp/x.log",), # no gptbot group -> '*' rules
        ],
        ["url"],
    )
    got = {
        r.url: (r.allowed, r.matched_prefix)
        for r in robots_verdict(
            urls, _rules(spark), agent="GPTBot"
        ).collect()
    }
    assert got["https://a.example/welcome"] == (True, "/welcome$")
    assert got["https://a.example/welcome2"] == (False, "/")
    assert got["https://b.example/tmp/x.log"] == (False, "/tmp/*.log")


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [
            ("https://x.example",),
            ("https://x.example/a/b?q=1#frag",),
            ("http://x.example:8080/p",),
        ],
        ["url"],
    )
    got = [r.p for r in df.select(url_path("url").alias("p")).collect()]
    assert got == ["/", "/a/b", "/p"]


def test_verdict_gate_is_broadcast_no_rule_shuffle(spark):
    """The rule side must broadcast: a crawl-sized URL frame joining
    a KB-sized rule table through a shuffle would be the classic
    avoidable Exchange."""
    urls = spark.range(100).select(
        F.concat(F.lit("https://a.example/p"), "id").alias("url")
    )
    plan = (
        robots_verdict(urls, _rules(spark), agent="*")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_allow_all_group_survives_and_blocks_fallback(spark):
    """'Disallow:' (empty) = allow-everything. The group must still
    EXIST so its agent does NOT fall back to the '*' rules — an
    inner agents-rules join erased it and wrongly excluded the whole
    site."""
    rb = spark.createDataFrame(
        [("e.example", "User-agent: gptbot\nDisallow:\n\nUser-agent: *\nDisallow: /\n")],
        ["domain", "robots_txt"],
    )
    urls = spark.createDataFrame([("https://e.example/any/page",)], ["url"])
    rules = parse_robots(rb)
    (gpt,) = robots_verdict(urls, rules, agent="gptbot").collect()
    assert gpt.allowed is True and gpt.matched_prefix is None
    (star,) = robots_verdict(urls, rules, agent="*").collect()
    assert star.allowed is False


def test_bom_prefixed_file_still_parses(spark):
    rb = spark.createDataFrame(
        # chr()-built BOM — no invisible literal in source
        [("f.example", chr(0xFEFF) + "User-agent: *\nDisallow: /\n")],
        ["domain", "robots_txt"],
    )
    urls = spark.createDataFrame([("https://f.example/x",)], ["url"])
    (r,) = robots_verdict(urls, parse_robots(rb), agent="*").collect()
    assert r.allowed is False, "BOM swallowed the whole file (fail-open)"


def test_host_case_and_userinfo_normalized(spark):
    urls = spark.createDataFrame(
        [("https://A.Example/private/x",), ("https://u:p@a.example/private/y",)],
        ["url"],
    )
    got = [r.allowed for r in robots_verdict(urls, _rules(spark), agent="*").collect()]
    assert got == [False, False]


def test_hostile_pattern_chars_never_throw(spark):
    r"""Regex metacharacters (incl. a \E quote-breaker) in rule
    values must match literally, not crash the gate or inject
    semantics."""
    rb = spark.createDataFrame(
        [("g.example", "User-agent: *\nDisallow: /a\\E(\nDisallow: /b.+x\n")],
        ["domain", "robots_txt"],
    )
    urls = spark.createDataFrame(
        [
            ("https://g.example/a\\E(",),   # literal match -> disallowed
            ("https://g.example/b.+xz",),   # literal '.+' -> disallowed
            ("https://g.example/bZZxz",),   # would match if .+ were live
        ],
        ["url"],
    )
    got = {
        r.url: r.allowed
        for r in robots_verdict(urls, parse_robots(rb), agent="*").collect()
    }
    assert got["https://g.example/a\\E("] is False
    assert got["https://g.example/b.+xz"] is False
    assert got["https://g.example/bZZxz"] is True


def test_duplicate_url_rows_preserved(spark):
    urls = spark.createDataFrame(
        [("https://a.example/private/x", 1), ("https://a.example/private/x", 2)],
        ["url", "fetch"],
    )
    out = robots_verdict(urls, _rules(spark), agent="*").collect()
    assert len(out) == 2 and all(not r.allowed for r in out)
