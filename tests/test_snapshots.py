"""Snapshot-diff contracts beyond the driver oracles: null-pattern changes
must be visible (the audit-primitive false-negative ADVICE r7 flagged)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_watermark_spark.operators.snapshots import (
    snapshot_diff,
    snapshot_diff_stats,
)


def _snap(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, a string, b string")


def test_null_value_swap_detected(spark):
    """old (NULL,'x') vs new ('x',NULL): hash functions skip NULL inputs, so
    without null markers both sides hash identically and the change is
    silently reported 'unchanged'."""
    old = _snap(spark, [(1, None, "x"), (2, "same", "same"), (3, "x", None)])
    new = _snap(spark, [(1, "x", None), (2, "same", "same"), (3, "x", None)])
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed"}

    stats = snapshot_diff_stats(old, new).first()
    assert stats["n_changed"] == 1 and stats["n_unchanged"] == 2
    assert stats["n_added"] == 0 and stats["n_removed"] == 0


def test_null_to_value_and_back_detected(spark):
    old = _snap(spark, [(1, None, "k"), (2, "v", "k")])
    new = _snap(spark, [(1, "", "k"), (2, None, "k")])  # NULL vs '' differ too
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "changed", 2: "changed"}


def test_custom_hash_fn_receives_null_safe_inputs(spark):
    """The md5/concat_ws twin the driver oracle pins goes through hash_fn —
    the null markers must flow into it as well."""
    old = _snap(spark, [(1, None, "x")])
    new = _snap(spark, [(1, "x", None)])
    out = snapshot_diff(
        old, new, hash_fn=lambda cols: F.md5(F.concat_ws("|", *cols))
    ).collect()
    assert [(r["doc_id"], r["change"]) for r in out] == [(1, "changed")]


def test_added_removed_unchanged_basic(spark):
    old = _snap(spark, [(1, "a", "b"), (2, "c", "d")])
    new = _snap(spark, [(2, "c", "d"), (3, "e", "f")])
    got = {r["doc_id"]: r["change"] for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 3: "added"}
