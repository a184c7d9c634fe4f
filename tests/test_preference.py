"""Preference-pair (DPO) audit (operators/preference.py): hand-case
flags, null/empty semantics, multiplicity preservation, and the
no-broadcast scale shape of the contradiction join."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from polars_text_spark.operators.preference import preference_pair_audit


def _pairs(spark):
    return spark.createDataFrame(
        [
            # valid pair; prompt shared with pair 2
            (1, "p1", "good answer here", "a worse answer"),
            # identical pair (also self-contradicted by construction)
            (2, "p1", "same text", "same text"),
            # empty rejected side
            (3, "p2", "fine", ""),
            # null chosen side
            (4, "p3", None, "something"),
            # chosen text equals pair 1's REJECTED text -> label noise
            (5, "p4", "a worse answer", "yet another answer"),
        ],
        "pair_id long, prompt string, chosen string, rejected string",
    )


def test_preference_audit_hand_cases(spark):
    got = {r.pair_id: r for r in preference_pair_audit(_pairs(spark)).collect()}
    assert len(got) == 5  # multiplicity preserved

    assert got[1].valid and not got[1].identical_pair
    assert got[1].len_chosen == 3 and got[1].len_rejected == 3
    assert got[1].len_log_ratio == 0.0
    assert got[1].prompt_pair_count == 2  # shares p1 with pair 2

    assert got[2].identical_pair and got[2].chosen_contradicted
    assert not got[2].valid

    assert got[3].empty_side and not got[3].valid
    assert got[4].empty_side and not got[4].valid and got[4].len_chosen == 0

    assert got[5].chosen_contradicted and not got[5].valid
    # length-bias diagnostic is the documented log2 ratio
    assert got[5].len_log_ratio == math.log2((3 + 1) / (3 + 1))


def test_preference_audit_no_broadcast_of_rejected_hashes(spark):
    """The contradiction join's right side is corpus-sized (every
    distinct rejected hash) — it must NOT be broadcast; the plan keys
    both joins on sha2 digests, never text."""
    from polars_text_spark.plans.explain import explain_str

    plan = explain_str(preference_pair_audit(_pairs(spark)), "formatted")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_preference_audit_reserved_column_guard(spark):
    import pytest

    df = _pairs(spark).withColumn("__pp_ch", F.lit(1))
    with pytest.raises(ValueError, match="__pp_ch"):
        preference_pair_audit(df)
