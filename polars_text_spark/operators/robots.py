"""robots.txt parsing + URL crawl-policy gate — compliance filtering
for web-crawl corpora.

Beyond-reference operator. A responsibly-built training corpus drops
pages the site's robots.txt disallowed for the collecting agent;
doing that over a 100 TB crawl means evaluating millions of
(robots.txt, URL) pairs, which is a JOIN problem, not a per-URL
library call.

Semantics follow the Google/RFC 9309 interpretation:

- A **group** is one or more consecutive ``User-agent:`` lines
  followed by ``Allow:``/``Disallow:`` rules; the next
  ``User-agent:`` line AFTER rules starts a new group. Blank lines
  and ``#`` comments are ignored (RFC 9309 — they do NOT end a
  group). Field names are case-insensitive.
- Agent selection per domain: the group(s) naming the requested
  agent when any exist, else the ``*`` group(s). Token equality,
  case-insensitive — no partial-name matching.
- Rule matching: a pattern matches the URL path from the start;
  ``*`` matches any span and a trailing ``$`` anchors the end (the
  standard extension). The verdict comes from the matching rule
  with the LONGEST pattern; at equal length ``Allow`` wins
  (least-restrictive tie-break). No matching rule — or no robots
  entry for the domain at all — means allowed.
- An empty ``Disallow:`` value means "nothing disallowed" and an
  empty ``Allow:`` adds nothing: both drop at parse time.

Scale shape: parsing is per-domain local (posexplode + two
domain-partitioned windows over files that are KBs each — bounded
group state, no global window); the gate computes verdicts on the
DISTINCT (domain, path) key frame only — broadcast rule join,
pattern match in the join projection, ``max(struct(len, is_allow))``
aggregate — then joins back, so URL payload columns cross exactly
one shuffle and never enter a grouping key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from polars_text_spark.operators._cols import require_free_columns

__all__ = ["parse_robots", "robots_verdict", "url_path"]

_FIELD = r"(?i)^\s*(user-agent|allow|disallow)\s*:\s*(.*?)\s*$"


def url_path(col: Column | str) -> Column:
    """The path component of a URL column (query/fragment dropped,
    empty path -> ``/``) — the piece robots rules match against."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(
    robots: DataFrame,
    *,
    domain_col: str = "domain",
    text_col: str = "robots_txt",
) -> DataFrame:
    """One row per (domain, agent, rule): ``(domain, agent,
    rule_type 'allow'|'disallow', path_prefix)``. Agents are
    lower-cased; a group with multiple ``User-agent`` lines emits
    its rules once per agent."""
    lines = robots.select(
        F.lower(F.col(domain_col)).alias("domain"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    # strip comments AND BOM/zero-width junk (a UTF-8 BOM before the
    # first User-agent line is common in the wild; unstripped it
    # makes the field regex miss the line and the WHOLE file parses
    # empty — a silent fail-open for the compliance gate), then
    # classify fields; unrecognized/blank lines drop out BEFORE
    # grouping (RFC 9309: they do not break a group)
    cleaned = F.regexp_replace(
        # code-point escapes, not literal invisible chars in source
        # (the mojibake-fixture lesson: raw BOM literals are one bad
        # editor round-trip from silent divergence)
        F.regexp_replace(F.col("line"), "[\ufeff\u200b]", ""),
        r"#.*$",
        "",
    )
    parsed = lines.select(
        "domain",
        "pos",
        F.lower(F.regexp_extract(cleaned, _FIELD, 1)).alias("field"),
        F.regexp_extract(cleaned, _FIELD, 2).alias("value"),
    ).filter(F.col("field") != "")
    w = Window.partitionBy("domain").orderBy("pos")
    # a user-agent line starts a NEW group iff the previous
    # recognized line was not also a user-agent line
    is_ua = (F.col("field") == "user-agent").cast("int")
    prev_ua = F.lag(is_ua, 1, 0).over(w)
    new_block = ((is_ua == 1) & (prev_ua == 0)).cast("int")
    blocks = parsed.withColumn(
        "block",
        F.sum(new_block).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).filter(F.col("block") > 0)  # rules before any user-agent line drop
    agents = (
        blocks.filter(F.col("field") == "user-agent")
        .select("domain", "block", F.lower(F.col("value")).alias("agent"))
        .distinct()
    )
    rules = blocks.filter(
        (F.col("field") != "user-agent") & (F.col("value") != "")
    ).select(
        "domain",
        "block",
        F.col("field").alias("rule_type"),
        F.col("value").alias("path_prefix"),
    )
    # LEFT join: a group whose only rules had empty values (the
    # common 'Disallow:' allow-all idiom) must still EXIST — it is
    # carried as a null-rule row, because group PRESENCE drives the
    # agent-vs-* fallback. An inner join here silently erased such
    # groups and sent their agents to the '*' rules (fail-closed for
    # an allow-all group, the exact inversion of the site's intent).
    return agents.join(rules, ["domain", "block"], "left").select(
        "domain", "agent", "rule_type", "path_prefix"
    )


def _pattern_regex(prefix: Column) -> Column:
    """Java-regex equivalent of a robots path pattern: regex
    metacharacters escaped character-by-character, ``*`` -> ``.*``,
    trailing ``$`` -> end anchor, anchored at the start.

    Deliberately NOT ``\\Q..\\E`` quoting: a pattern containing the
    two characters ``\\E`` would terminate the quote and inject live
    regex — a single hostile/garbage robots line could then throw
    ``PatternSyntaxException`` inside the join projection and abort
    the whole crawl-gate job. Per-character escaping has no such
    escape hatch."""
    anchored = prefix.endswith("$")
    body = F.when(
        anchored, prefix.substr(F.lit(1), F.length(prefix) - 1)
    ).otherwise(prefix)
    escaped = F.regexp_replace(
        body, r"[\\^$.|?+()\[\]{}]", r"\\$0"
    )
    return F.concat(
        F.lit("^"),
        F.regexp_replace(escaped, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )


def robots_verdict(
    urls: DataFrame,
    rules: DataFrame,
    *,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Gate every URL row against parsed rules: appends ``(domain,
    path, allowed, matched_prefix)``. Group selection, longest-match
    and the allow tie-break follow the module contract; URLs whose
    domain has no robots entry (or no applicable group) pass. Input
    row multiplicity is preserved (duplicate URL rows stay
    duplicate).

    Plan shape: the verdict is computed once per DISTINCT
    (domain, path) over a slim key frame — the broadcast rule join,
    per-row pattern regex, and the ``max(struct)`` aggregate all run
    on keys only — then joined back, so the URL frame's payload
    columns cross exactly ONE shuffle (the join) and never enter a
    grouping key."""
    require_free_columns(
        urls,
        ("domain", "__path", "path", "allowed", "matched_prefix"),
        "robots_verdict",
    )
    a = agent.lower()
    if a == "*":
        chosen = rules.filter(F.col("agent") == "*")
    else:
        # group presence (incl. null-rule allow-all groups) decides
        # the fallback; null rules then drop below as never-matching
        specific = (
            rules.filter(F.col("agent") == a).select("domain").distinct()
        )
        chosen = rules.filter(F.col("agent") == a).unionByName(
            rules.filter(F.col("agent") == "*").join(
                specific, "domain", "left_anti"
            )
        )
    # host lower-cased (DNS names are case-insensitive; rules are
    # lower-cased at parse) and userinfo skipped — an un-normalized
    # 'https://A.Example/..' missing the join would silently pass
    host = F.lower(
        F.regexp_extract(
            F.col(url_col),
            r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)",
            1,
        )
    )
    u = urls.withColumn("domain", host).withColumn(
        "__path", url_path(F.col(url_col))
    )
    keys = u.select("domain", "__path").distinct()
    cand = keys.join(F.broadcast(chosen), "domain", "left")
    # rlike with a PER-ROW pattern needs the SQL form (the Column API
    # wrapper requires a literal regex)
    matched = F.col("path_prefix").isNotNull() & F.expr(
        "rlike(__path, __rx)"
    )
    scored = cand.withColumn(
        "__rx", _pattern_regex(F.col("path_prefix"))
    ).withColumn(
        "__m",
        F.when(
            matched,
            F.struct(
                # longest-PATTERN-wins; tie -> allow (is_allow sorts
                # second in the lexicographic struct max)
                F.length("path_prefix").alias("plen"),
                (F.col("rule_type") == "allow").cast("int").alias(
                    "is_allow"
                ),
                F.col("path_prefix").alias("prefix"),
            ),
        ),
    )
    verdicts = scored.groupBy("domain", "__path").agg(
        F.max("__m").alias("__best")
    )
    out = u.join(verdicts, ["domain", "__path"], "left")
    return out.select(
        *urls.columns,
        "domain",
        F.col("__path").alias("path"),
        F.coalesce(F.col("__best.is_allow") == 1, F.lit(True)).alias(
            "allowed"
        ),
        F.col("__best.prefix").alias("matched_prefix"),
    )
