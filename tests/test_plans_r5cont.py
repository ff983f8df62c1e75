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
    # an accidental shuffle crept into a map-only operator.
    for fn in (q142_serving_state, q146_code_routing, q153_text_citations):
        plan = _formatted_plan(fn(spark, SF_DIR))
        assert "Exchange" not in plan, (fn.__name__, plan)


def test_q161_fans_out_before_parse_only_one_exchange(spark):
    # q161 moved to the q152 class in round 6: the page synthesis +
    # real-parser extraction is compute-bound per doc, so the 8-byte
    # doc_id projection repartitions to defaultParallelism first — and
    # that fan-out must stay the ONLY exchange (the extraction itself
    # remains shuffle-free).
    import re

    plan = _formatted_plan(q161_image_text_pairs(spark, SF_DIR))
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 1, plan
    assert "RoundRobinPartitioning" in plan, plan


def test_q152_fans_out_before_compute_no_gram_shuffle(spark):
    # round-6 fix for the single-task 27 s defect: the battery is
    # compute-bound per doc, so the (doc_id, text) projection must
    # repartition to defaultParallelism BEFORE the heavy stage (the
    # q102/q103 generation fan-out rule) and run in one Arrow-batched
    # pandas UDF. Still a per-document statistic: the fan-out exchange
    # must be the ONLY one — a corpus-wide gram shuffle stays banned.
    import re

    from ocr_service_spark.operators.quality import q152_repetition_battery

    df = q152_repetition_battery(spark, SF_DIR)
    plan = _formatted_plan(df)
    exchanges = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(exchanges) == 1, plan
    assert "hashpartitioning(doc_id" in plan, plan
    assert "MapInPandas" in plan, plan
    assert "HashAggregate" not in plan, plan  # no gram shuffle/agg
    assert df.rdd.getNumPartitions() > 1


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
