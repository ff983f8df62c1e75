"""Physical-plan pins for the round-5 continuation tier (q139+):
the scale shapes each docstring claims must be visible in the plan.
"""

from __future__ import annotations

from ocr_service_spark.operators.corpus import (
    q147_clf_inference,
    q148_reshard_stability,
)
from ocr_service_spark.operators.dedup import q158_simhash_neardup
from ocr_service_spark.operators.quality import (
    q142_serving_state,
    q146_code_routing,
)
from ocr_service_spark.operators.text_stats import q139_count_min_tokens
from ocr_service_spark.operators.weburl import (
    q153_text_citations,
    q161_image_text_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _formatted_plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q139_sketch_probe_is_broadcast(spark):
    # the 512-cell sketch must broadcast to the distinct-token probe —
    # a shuffle join here would move the big side for a fixed-size dim
    plan = _formatted_plan(q139_count_min_tokens(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_q147_weight_table_is_broadcast(spark):
    # the fastText shape: the CLF_BUCKETS-row model table broadcasts;
    # gram instances never shuffle for the lookup
    plan = _formatted_plan(q147_clf_inference(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_map_only_queries_plan_zero_exchanges(spark):
    # pure-codegen projections must ride the scan: any Exchange means
    # an accidental shuffle crept into a map-only operator. q152 is
    # here BY DESIGN: its top-gram table is a per-document statistic,
    # so it must never pay a corpus-wide gram shuffle (array_sort +
    # run-length fold, not explode -> groupBy -> rank).
    from ocr_service_spark.operators.quality import q152_repetition_battery

    for fn in (q142_serving_state, q146_code_routing, q153_text_citations,
               q161_image_text_pairs, q152_repetition_battery):
        plan = _formatted_plan(fn(spark, SF_DIR))
        assert "Exchange" not in plan, (fn.__name__, plan)


def test_q148_single_final_shuffle(spark):
    # both rendezvous assignments are inline codegen argmaxes; the only
    # shuffle is the 16-row old_shard rollup
    plan = _formatted_plan(q148_reshard_stability(spark, SF_DIR))
    hash_exchanges = [
        ln
        for ln in plan.splitlines()
        if ln.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(hash_exchanges) == 1, plan


def test_q158_band_buckets_are_capped_map_side(spark):
    # the hot-bucket cap must plan as WindowGroupLimit (rank pre-limit
    # before the shuffle), the same pin q34 carries
    plan = _formatted_plan(q158_simhash_neardup(spark, SF_DIR))
    assert "WindowGroupLimit" in plan, plan
