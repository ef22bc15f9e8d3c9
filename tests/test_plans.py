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
