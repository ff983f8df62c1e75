"""q149 (host-skew report / salting advisor) and q150 (token-budget
selection) semantic pins.

The oracles pin cross-engine values; here the metrics' MEANING is
pinned: Gini of a uniform distribution is ~0 and of the planted skew
is substantial, the mega-host gets the big salt factor, and the
budget cut keeps exactly the greedy quality prefix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_service_spark.operators.corpus import (
    BUDGET_DEN,
    BUDGET_NUM,
    q150_budget_selection,
)
from ocr_service_spark.operators.weburl import host_skew_report, q149_host_skew

SF = "/root/testdata/sf0.001"


def _report(spark, counts):
    df = spark.createDataFrame(counts, "host string, n_docs bigint")
    return {r.host: r for r in host_skew_report(df).collect()}


def test_gini_extremes(spark):
    # perfectly uniform -> gini 0
    uni = _report(spark, [(f"h{i}", 10) for i in range(8)])
    assert all(r.gini_bp == 0 for r in uni.values())
    assert all(r.salt_factor == 1 for r in uni.values())
    # one host owns ~everything -> gini near (n-1)/n = 7500 bp for n=4
    skew = _report(spark, [("big", 970), ("a", 10), ("b", 10), ("c", 10)])
    assert skew["big"].gini_bp >= 7000
    assert skew["big"].salt_factor == 97  # 970 div median 10
    assert skew["big"].rank == 1 and skew["big"].share_bp == 9700


def test_q149_planted_skew(spark):
    rows = {r.host: r for r in q149_host_skew(spark, SF).collect()}
    assert len(rows) == 51
    big = rows["h0.big"]
    assert big.rank == 1
    # a third of the corpus on one host of 51
    assert 3000 <= big.share_bp <= 3700
    assert big.salt_factor > 10
    # small hosts need no salting
    assert all(r.salt_factor <= 2 for h, r in rows.items() if h != "h0.big")
    # one corpus-level gini on every row, and it is substantial
    ginis = {r.gini_bp for r in rows.values()}
    assert len(ginis) == 1 and ginis.pop() > 2500


def test_q150_budget_cut_is_greedy_prefix(spark):
    rows = sorted(
        q150_budget_selection(spark, SF).collect(),
        key=lambda r: (-r.quality, r.doc_id),
    )
    total = rows[-1].cum_tokens
    assert total == sum(r.n_tokens for r in rows)
    budget = total * BUDGET_NUM / BUDGET_DEN
    # kept rows form a prefix of the quality ordering
    kept = [r.keep for r in rows]
    assert True in kept and False in kept
    first_drop = kept.index(False)
    assert all(kept[:first_drop]) and not any(kept[first_drop:])
    assert rows[first_drop - 1].cum_tokens <= budget < rows[first_drop].cum_tokens
