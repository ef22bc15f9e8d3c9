"""Scale probe for the round-12 analytics wave: 5M synthetic events /
200k users through funnel, retention cohorts, transitions, ROC-AUC and
key-skew; 500k x 64 embeddings through PSI drift; 200k-node exact-kNN
edge table through triangle counting.  Writes SCALE_ANALYTICS.json.

Synthetic data is generated IN SPARK (range + keyed-hash columns) so the
probe itself is shuffle-shaped like production: nothing is collected,
nothing is driver-generated.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from vectordb_watermark_spark import get_spark
from vectordb_watermark_spark.operators.analytics import (
    event_transitions,
    funnel,
    psi_per_dim,
    retention_cohorts,
    roc_auc,
)
from vectordb_watermark_spark.operators.graph import triangle_count
from vectordb_watermark_spark.operators.partitioning import key_skew_stats

N_EVENTS = 5_000_000
N_USERS = 200_000
N_VECS = 500_000
DIM = 64


def main() -> None:
    spark = get_spark(
        "analytics-scale", master="local[16]", shuffle_partitions=64
    )
    out: dict = {"n_events": N_EVENTS, "n_users": N_USERS, "n_vecs": N_VECS}

    # --- events: keyed-hash users/types, event-time = id order ---------
    types = ["view", "click", "purchase", "signup", "error"]
    ev = (
        spark.range(N_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("id") * 2  # ~4 months span
            ).alias("ts"),
            (F.abs(F.xxhash64("id", F.lit(1))) % N_USERS).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(t) for t in types]),
                (F.abs(F.xxhash64("id", F.lit(2))) % 5 + 1).cast("int"),
            ).alias("event_type"),
            (F.abs(F.xxhash64("id", F.lit(3))) % 10000 / 100.0).alias("value"),
        )
        .persist()
    )
    ev.count()

    t0 = time.time()
    fu = funnel(ev, ["view", "click", "purchase"]).collect()
    out["funnel_sec"] = round(time.time() - t0, 2)
    out["funnel_rows"] = {r["step_type"]: r["n_users"] for r in fu}

    t0 = time.time()
    rc = retention_cohorts(ev, granularity="week").collect()
    out["retention_sec"] = round(time.time() - t0, 2)
    out["retention_cells"] = len(rc)

    t0 = time.time()
    tr = event_transitions(ev).collect()
    out["transitions_sec"] = round(time.time() - t0, 2)
    out["transition_cells"] = len(tr)

    t0 = time.time()
    auc = roc_auc(
        ev.select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
            F.floor(F.col("value") * 10 + 0.5).cast("long").alias("score"),
        )
    ).collect()[0]
    out["auc_sec"] = round(time.time() - t0, 2)
    out["auc"] = auc["auc"]

    t0 = time.time()
    ks = key_skew_stats(ev, "user_id").collect()[0]
    out["skew_sec"] = round(time.time() - t0, 2)
    out["skew_ratio_ppm"] = ks["skew_ratio_ppm"]

    # --- round-13 additions (VERDICT r12 #5): the r12 analytics ops not
    # --- yet probed at the 5M-event scale --------------------------------
    from vectordb_watermark_spark.operators.analytics import (
        funnel_timing,
        roc_auc_by,
        stickiness,
        trending_types,
    )

    t0 = time.time()
    tt = trending_types(ev, granularity="day").collect()
    out["trending_sec"] = round(time.time() - t0, 2)
    out["trending_rows"] = len(tt)

    t0 = time.time()
    st = stickiness(ev, window_days=7).collect()
    out["stickiness_sec"] = round(time.time() - t0, 2)
    out["stickiness_days"] = len(st)

    t0 = time.time()
    ab = roc_auc_by(
        ev.select(
            "event_type",
            F.when(F.col("value") > 50, 1).otherwise(0).alias("label"),
            F.floor(F.col("value") * 10 + 0.5).cast("long").alias("score"),
        ),
        slice_col="event_type",
    ).collect()
    out["auc_by_sec"] = round(time.time() - t0, 2)
    out["auc_by_slices"] = len(ab)

    t0 = time.time()
    ft = funnel_timing(
        # integer event time (epoch ns) — the contract funnel_timing pins
        ev.withColumn(
            "ts_ns", (F.unix_timestamp("ts") * F.lit(1_000_000_000)).cast("long")
        ),
        ["view", "click", "purchase"],
        ts_col="ts_ns",
    ).collect()
    out["funnel_timing_sec"] = round(time.time() - t0, 2)
    out["funnel_timing_rows"] = len(ft)

    # within-session funnel: gap-sessionize (lag + cumsum per user), then
    # the same funnel operator keyed on the composite (user, session)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    sess = ev.withColumn(
        "gap", F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    ).withColumn(
        "session_id",
        F.sum(
            F.when(F.col("gap").isNull() | (F.col("gap") > 1800), 1).otherwise(0)
        ).over(w),
    )
    t0 = time.time()
    sf_ = funnel(
        sess, ["view", "click", "purchase"], user_col=["user_id", "session_id"]
    ).collect()
    out["session_funnel_sec"] = round(time.time() - t0, 2)
    out["session_funnel_rows"] = {r["step_type"]: r["n_users"] for r in sf_}

    from vectordb_watermark_spark.operators.analytics import rate_anomalies
    from vectordb_watermark_spark.operators.partitioning import join_cardinality

    t0 = time.time()
    ra = rate_anomalies(ev, granularity="hour").collect()
    out["rate_anomaly_sec"] = round(time.time() - t0, 2)
    out["rate_buckets"] = len(ra)

    t0 = time.time()
    jc = join_cardinality(
        ev.select("user_id"), ev.select("user_id"), "user_id"
    ).collect()[0]
    out["join_card_sec"] = round(time.time() - t0, 2)
    out["join_card_n_out"] = jc["n_out"]
    ev.unpersist()

    # table_diff: 5M-row self-diff with planted drop/change/insert
    from vectordb_watermark_spark.operators.quality import table_diff

    tbl = spark.range(N_EVENTS).select(
        "id", (F.xxhash64("id", F.lit(9)) % 1000).alias("v")
    ).persist()
    tbl.count()
    right = (
        tbl.filter(F.col("id") % 97 != 0)
        .withColumn(
            "v", F.when(F.col("id") % 10 == 0, F.col("v") + 1).otherwise(F.col("v"))
        )
    )
    t0 = time.time()
    td = table_diff(tbl, right, "id").collect()[0]
    out["table_diff_sec"] = round(time.time() - t0, 2)
    out["table_diff_changed"] = td["n_changed"]
    tbl.unpersist()

    # rebalance: 2M rows, 10 skewed classes
    from vectordb_watermark_spark.operators.quality import rebalance_classes

    cls = spark.range(2_000_000).select(
        F.col("id").alias("doc_id"),
        (F.abs(F.xxhash64("id", F.lit(4))) % 100 % 10).alias("label"),
    ).persist()
    cls.count()
    t0 = time.time()
    n_bal = rebalance_classes(cls, "label").count()
    out["rebalance_sec"] = round(time.time() - t0, 2)
    out["rebalance_rows"] = int(n_bal)
    cls.unpersist()

    # --- PSI drift: 500k x 64, candidate half gets a mean shift --------
    def vecs(shift: float):
        comps = F.array(*[
            ((F.xxhash64("id", F.lit(100 + d)) % 2001) / 10000.0 + shift)
            .cast("float")
            for d in range(DIM)
        ])
        return spark.range(N_VECS // 2).select("id", comps.alias("emb"))

    base, cand = vecs(0.0).persist(), vecs(0.03).persist()
    base.count(), cand.count()
    t0 = time.time()
    psi = psi_per_dim(base, cand, vec_col="emb").collect()
    out["psi_sec"] = round(time.time() - t0, 2)
    out["psi_dims"] = len(psi)
    out["psi_min"] = min(r["psi"] for r in psi)

    from vectordb_watermark_spark.operators.analytics import class_margins

    lbl = base.select(
        (F.abs(F.xxhash64("id", F.lit(5))) % 10).cast("int").alias("label"),
        "emb",
    )
    t0 = time.time()
    cm = class_margins(lbl).collect()
    out["class_margins_sec"] = round(time.time() - t0, 2)
    out["class_margins_rows"] = len(cm)
    base.unpersist(), cand.unpersist()

    # --- triangles on a 200k-node sparse graph (keyed-hash edges) ------
    edges = (
        spark.range(200_000 * 8)
        .select(
            (F.col("id") % 200_000).alias("src"),
            (F.abs(F.xxhash64("id", F.lit(7))) % 200_000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .persist()
    )
    edges.count()
    t0 = time.time()
    tri = triangle_count(edges).collect()[0]["n_triangles"]
    out["triangle_sec"] = round(time.time() - t0, 2)
    out["n_triangles"] = int(tri)
    edges.unpersist()

    print(json.dumps(out))
    with open("SCALE_ANALYTICS.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
