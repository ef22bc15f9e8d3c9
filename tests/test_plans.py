"""Physical-plan regression tests — pin the plan properties the engine's
scale story depends on (PLANS.md).  A correctness-preserving refactor that
silently loses predicate pushdown, broadcasts, or map-side partial
aggregation would pass every value test and still be 100x slower at 100 TB;
these tests fail it immediately.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    return E.queries()


def test_q6_pushes_filters_to_parquet_scan(spark, queries):
    # pure filter+agg: the predicate must reach the scan, not a post-filter
    p = _plan(queries["q6_forecast_revenue"](spark, SF))
    assert "PushedFilters: [" in p
    assert "IsNotNull(l_shipdate)" in p


def test_per_row_text_ops_have_no_shuffle(spark, queries):
    # text_stats and quantization are embarrassingly parallel; any Exchange
    # in their plan is a regression
    assert "Exchange" not in _plan(queries["text_stats"](spark, SF))
    assert "Exchange" not in _plan(queries["embedding_quantize"](spark, SF))


def test_dim_joins_broadcast(spark, queries):
    # q3/q5 join fact tables against small dims: must broadcast, and q3's
    # top-10 must compile to TakeOrderedAndProject (no global sort)
    p3 = _plan(queries["q3_shipping_priority"](spark, SF))
    assert "BroadcastHashJoin" in p3
    assert "TakeOrderedAndProject" in p3
    assert "BroadcastHashJoin" in _plan(queries["q5_nation_revenue"](spark, SF))


def test_carrier_semi_join_is_broadcast_left_semi(spark, queries):
    p = _plan(queries["semi_join_carriers"](spark, SF))
    assert "LeftSemi" in p
    assert "BroadcastHashJoin" in p


def test_top_tokens_avoids_global_sort(spark, queries):
    assert "TakeOrderedAndProject" in _plan(queries["top_tokens"](spark, SF))


def test_event_rollup_has_partial_aggregation(spark, queries):
    # groupBy must split into map-side partial + final HashAggregate pairs
    p = _plan(queries["events_hourly"](spark, SF))
    assert p.count("HashAggregate") >= 2


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """Co-bucketed tables must sort-merge join with NO Exchange on either
    side — the write-once-join-forever pattern write_bucketed exists for."""
    from vectordb_watermark_spark.sources.io import write_bucketed

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], n_buckets=8,
                   path=str(tmp_path / "ob"), sort_cols=["o_orderkey"])
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], n_buckets=8,
                   path=str(tmp_path / "lb"), sort_cols=["l_orderkey"])
    try:
        a = spark.table("t_orders_b")
        b = spark.table("t_lineitem_b")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = b.join(a, b.l_orderkey == a.o_orderkey).groupBy("o_orderpriority").count()
            p = _plan(j)
            assert "SortMergeJoin" in p
            # exactly ONE exchange: the final groupBy's repartition on
            # o_orderpriority — the join inputs read pre-bucketed scans
            assert p.count("+- Exchange") == 1
            assert "hashpartitioning(o_orderpriority" in p
            # values still correct vs the unbucketed join
            plain = li.join(orders, li.l_orderkey == orders.o_orderkey) \
                      .groupBy("o_orderpriority").count()
            assert {tuple(r) for r in j.collect()} == {tuple(r) for r in plain.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """A filter on the partition column must prune directories at plan time
    (the scan's partition filters, not a post-scan filter)."""
    from vectordb_watermark_spark.sources.io import write_partitioned

    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    out = str(tmp_path / "ev_parted")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "click")
    p = _plan(back)
    assert "PartitionFilters: [" in p and "event_type" in p.split("PartitionFilters")[1].split("]")[0]
    assert back.count() == ev.filter(F.col("event_type") == "click").count()


def test_temporal_join_plans(spark):
    """asof_join compiles to ONE key-shuffle (window exchange, no join
    operator at all); range_join compiles to a hash equi-join — never a
    nested-loop/cartesian plan for the range predicate."""
    from vectordb_watermark_spark.operators.temporal import asof_join, range_join

    l = spark.range(100).selectExpr("id % 5 AS k", "id AS t", "id AS ev")
    r = spark.range(50).selectExpr("id % 5 AS k", "id AS t", "CAST(id AS DOUBLE) AS v")
    pa = _plan(asof_join(l, r, ["k"], "t", "t", ["v"]))
    assert "Join" not in pa  # pure window carry-forward
    assert pa.count("+- Exchange") == 1 and "hashpartitioning(k" in pa

    ri = spark.range(50).selectExpr("id % 5 AS k", "id AS lo", "id + 10 AS hi", "id AS iid")
    pr = _plan(range_join(l, ri, ["k"], "t", "lo", "hi", band=16))
    assert "NestedLoop" not in pr and "Cartesian" not in pr
    assert "SortMergeJoin" in pr or "ShuffledHashJoin" in pr or "BroadcastHashJoin" in pr


def test_arrow_signature_kernels_partition_invariant(spark):
    # the numpy kernels fold per-batch; results must not depend on how rows
    # land in batches/partitions (reduceat boundaries, memo state)
    from vectordb_watermark_spark.operators import dedup as D

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def canon(rows):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r) for r in rows
        }

    for op in (D.minhash_signatures, D.simhash):
        one = canon(op(docs.repartition(1)).collect())
        many = canon(op(docs.repartition(13)).collect())
        assert one == many and len(one) > 0


def test_decontamination_broadcasts_benchmark_side(spark, queries):
    # corpus shingles join a broadcast benchmark shingle set — a sort-merge
    # join here would shuffle the full exploded corpus
    p = _plan(queries["decontaminate_docs"](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_sequence_packing_single_hash_exchange_no_global_sort(spark, queries):
    # one window per keyed hash group: exactly one hashpartitioning exchange
    # on the group column, and no range partitioning (global sort) anywhere
    p = _plan(queries["sequence_packing"](spark, SF))
    assert p.count("+- Exchange") == 1 and "hashpartitioning" in p
    assert "rangepartitioning" not in p


def test_corpus_logfreq_plan_shape(spark, queries):
    # two-pass corpus scoring: vocabulary groupBy must be map-side combined
    # (partial_count) and the vocab join must not be a nested loop
    p = _plan(queries["corpus_logfreq_score"](spark, SF))
    assert "partial_count" in p
    assert "NestedLoop" not in p


def test_repetition_and_pii_are_shuffle_free(spark, queries):
    assert "Exchange" not in _plan(queries["quality_repetition"](spark, SF))
    assert "Exchange" not in _plan(queries["pii_redaction"](spark, SF))


def test_round4_tpch_shapes_decorrelate_cleanly(spark, queries):
    """The adapted q2/q11/q16/q20/q21 exist to exercise Catalyst's subquery
    decorrelation — their physical plans must contain no cartesian product
    and no unintended nested-loop join, and q21's EXISTS / NOT EXISTS must
    land as semi/anti joins."""
    for name in ("q2_min_cost_supplier", "q11_important_stock",
                 "q16_parts_supplier_counts", "q20_excess_inventory",
                 "q21_suppliers_waiting"):
        p = _plan(queries[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name
    p21 = _plan(queries["q21_suppliers_waiting"](spark, SF))
    assert "LeftSemi" in p21 and "LeftAnti" in p21
    p16 = _plan(queries["q16_parts_supplier_counts"](spark, SF))
    assert "LeftAnti" in p16  # NOT IN -> null-aware anti join
