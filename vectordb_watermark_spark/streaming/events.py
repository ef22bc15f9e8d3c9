"""Structured Streaming over the events table — engine extensions.

The reference has no streaming surface (SURVEY.md §2.10); these operators are
the incremental/event-time extensions a production deployment of the engine
needs, built on Structured Streaming:

- :func:`stream_events` — file-source stream of the events schema.
- :func:`windowed_event_counts` — event-time tumbling-window aggregation with
  a (temporal) watermark for late data.
- :func:`sessionize_stream` — custom stateful sessionization via
  ``applyInPandasWithState`` (gap-based sessions per user).
- :func:`sessionize_batch` — the deterministic batch twin (lag + cumulative
  window), which is the DuckDB-oracle-checkable definition of a session.
- :func:`incremental_embed` — ``foreachBatch`` glue that runs the watermark
  EMBED pipeline over newly arrived vector rows per micro-batch.

Scale notes: windowed aggs shuffle on (window, key) with partial aggregation;
sessionization state is per-user and bounded by the watermark timeout; the
batch twin is one window function over a (user_id, ts) range-partitioned
sort — no single-partition global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: events.parquet stores TIMESTAMP(MICROS); reading the column with an
#: explicit BIGINT schema yields the raw epoch-microsecond int64, which both
#: readers below normalize to epoch-nanoseconds (``ts`` * 1000) so every
#: downstream operator and its DuckDB oracle (``epoch_ns``) agree exactly.
EVENTS_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)

DEFAULT_GAP_SECONDS = 1800  # 30-minute session gap


def _normalize_ts_ns(raw: DataFrame) -> DataFrame:
    return raw.withColumn("ts", F.col("ts") * F.lit(1000))


def read_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """Batch reader for the events table with ``ts`` as epoch-nanosecond
    BIGINT (the engine's canonical event-time unit)."""
    return _normalize_ts_ns(spark.read.schema(EVENTS_SCHEMA).parquet(events_dir))


def stream_events(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream of events with a proper event-time column
    (``event_time`` TIMESTAMP derived from the nanosecond epoch)."""
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return _normalize_ts_ns(raw).withColumn(
        "event_time", F.timestamp_seconds(F.expr("ts DIV 1000000000"))
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window counts per event_type with late-data
    handling: ``(window_start, window_end, event_type, n_events, sum_value)``.

    Works on both a stream (stateful, watermark-bounded) and a batch frame
    (the watermark is a no-op in batch) — one definition, two execution modes.
    """
    src = events.withWatermark("event_time", watermark_delay) if events.isStreaming else events
    return (
        src.groupBy(F.window("event_time", window_duration), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | tuple[str, ...] = ("user_id", "event_type"),
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Exact deduplication with BOUNDED state — the streaming-safe twin of
    batch ``dropDuplicates`` for a training-data ingest.

    On a stream: ``dropDuplicatesWithinWatermark`` keeps the first row per
    key and *evicts* key state once the event-time watermark passes, so an
    unbounded ingest holds state proportional to distinct keys per watermark
    horizon, never per stream lifetime (plain ``dropDuplicates`` on a stream
    accumulates every key ever seen — a guaranteed OOM at 100 TB/day).
    Duplicates farther apart than ``watermark_delay`` may both survive; that
    is the documented contract for horizon-bounded exact dedup.

    On a batch frame the same call degrades to ``dropDuplicates(keys)`` —
    one definition, two execution modes, like
    :func:`windowed_event_counts`.
    """
    keys = list(keys)
    if events.isStreaming:
        return events.withWatermark("event_time", watermark_delay).dropDuplicatesWithinWatermark(
            keys
        )
    return events.dropDuplicates(keys)


def click_purchase_interval_join(
    events: DataFrame,
    window_seconds: int = 1800,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each click matched to the same user's
    purchases within ``window_seconds`` AFTER the click.

    On a stream both sides carry event-time watermarks and the time-bound
    join condition, so Spark can expire join state: each side holds only
    ``watermark_delay + window_seconds`` of history per key — the property
    that makes an unbounded two-stream join runnable at all.  On a batch
    frame the identical condition is a plain inner join (one definition,
    two modes, like :func:`windowed_event_counts`).

    Output: ``(user_id, click_id, purchase_id, gap_seconds, value)``.
    """
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_time").alias("click_time"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("event_time").alias("purchase_time"),
        F.col("value"),
    )
    if events.isStreaming:
        clicks = clicks.withWatermark("click_time", watermark_delay)
        purchases = purchases.withWatermark("purchase_time", watermark_delay)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_time") >= F.col("click_time"))
        & (F.col("purchase_time") <= F.col("click_time") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return (
        clicks.join(purchases, cond)
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            (F.unix_timestamp("purchase_time") - F.unix_timestamp("click_time")).alias(
                "gap_seconds"
            ),
            F.round("value", 2).alias("value"),
        )
    )


def sessionize_batch(
    events: DataFrame, gap_seconds: int = DEFAULT_GAP_SECONDS
) -> DataFrame:
    """Gap-based sessionization, batch definition:
    ``(user_id, session_id, session_start_sec, session_end_sec, n_events)``.

    A new session starts when the gap to the previous event of the same user
    exceeds ``gap_seconds``.  Expressed as lag + running sum over a window
    partitioned by user — shuffles once on user_id, no global sort.  This is
    the oracle-checkable twin of :func:`sessionize_stream`.
    """
    sec = F.expr("ts DIV 1000000000")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    marked = (
        events.select("user_id", "event_id", sec.alias("sec"))
        .withColumn("prev_sec", F.lag("sec").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_sec").isNull()
                | ((F.col("sec") - F.col("prev_sec")) > gap_seconds),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_session").over(w))
    )
    return marked.groupBy("user_id", "session_id").agg(
        F.min("sec").alias("session_start_sec"),
        F.max("sec").alias("session_end_sec"),
        F.count(F.lit(1)).alias("n_events"),
    )


def sessionize_batch_oracle_sql(gap_seconds: int = DEFAULT_GAP_SECONDS) -> str:
    """DuckDB twin of :func:`sessionize_batch` over the ``events`` view."""
    return f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000000000 AS sec FROM events
),
marked AS (
  SELECT user_id, event_id, sec,
         CASE WHEN lag(sec) OVER w IS NULL
                   OR sec - lag(sec) OVER w > {gap_seconds}
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
),
sess AS (
  SELECT user_id, sec,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       CAST(min(sec) AS BIGINT) AS session_start_sec,
       CAST(max(sec) AS BIGINT) AS session_end_sec,
       CAST(count(*) AS BIGINT) AS n_events
FROM sess GROUP BY user_id, session_id
"""


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState`` — the custom
    stateful operator shape (SURVEY.md §2.10 extension).

    State per user: (open-session start, last event sec, count).  A session
    is emitted when the gap is exceeded by a new event or when the state
    times out past the watermark.  Output schema matches
    :func:`sessionize_batch` minus the deterministic session_id (streaming
    emission order is inherently arrival-dependent).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "user_id long, session_start_sec long, session_end_sec long, n_events long"
    )
    state_schema = "start_sec long, last_sec long, n long"

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n)],
                columns=["user_id", "session_start_sec", "session_end_sec", "n_events"],
            )
            return
        secs = []
        for pdf in pdf_iter:
            secs.extend((pdf["ts"] // 1_000_000_000).tolist())
        secs.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for s in secs:
            if start is None:
                start, last, n = s, s, 1
            elif s - last > gap_seconds:
                closed.append((user_id, start, last, n))
                start, last, n = s, s, 1
            else:
                last, n = s, n + 1
        if start is not None:
            state.update((start, last, n))
            state.setTimeoutTimestamp(last * 1000 + gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_sec", "session_end_sec", "n_events"],
            )

    return (
        events.withWatermark("event_time", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def continuous_rollup(
    stream: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
):
    """Hypertable-style continuous aggregate: the streaming windowed counts
    are incrementally MERGED into a persistent rollup table each
    micro-batch — queries hit the small pre-aggregated table instead of
    re-scanning raw events (the TimescaleDB continuous-aggregate /
    materialized-rollup pattern, expressed as Structured Streaming).

    ``update`` output mode emits only windows changed by the batch;
    ``foreachBatch`` upserts them into the rollup parquet by
    ``(window_start, event_type)`` — at 100 TB/day the rollup table stays
    ~rows-per-window × windows, and each refresh touches only dirty
    windows.  Returns the DataStreamWriter (call ``.start()``).
    """
    agg = windowed_event_counts(stream, window_duration, watermark_delay)

    def refresh(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.count():
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.withColumn(
            "rk", F.concat_ws("|", F.col("window_start"), F.col("event_type"))
        )
        # Read-then-overwrite-the-same-path is unsafe: if the overwrite
        # deletes the old files while any plan still references them (cache
        # eviction, executor loss), the recompute reads a missing source.
        # Instead: fully materialize the merge into a STAGED directory, then
        # swap it into place.  Existence is probed explicitly (not via a
        # catch-all around the read) so a transient FS error / corrupt
        # footer fails the micro-batch and the checkpointed retry preserves
        # the accumulated rollup instead of silently resetting it.
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path
        target = jvm_path(rollup_path)
        staged = jvm_path(rollup_path + ".__staged__")
        fs = target.getFileSystem(spark._jsc.hadoopConfiguration())
        # crash recovery: a prior refresh may have died between
        # delete(target) and rename(staged, target) — finish that swap
        # before reading, so the accumulated history is never lost.
        if not fs.exists(target) and fs.exists(staged):
            if not fs.rename(staged, target):
                raise RuntimeError(f"rollup swap recovery failed: {staged} -> {target}")
        if fs.exists(target):
            base = spark.read.parquet(rollup_path).withColumn(
                "rk", F.concat_ws("|", F.col("window_start"), F.col("event_type"))
            )
            # upsert: untouched base rows + every batch row (new or updated)
            merged = (
                base.join(batch_df.select("rk"), "rk", "left_anti")
                .unionByName(batch_df)
                .drop("rk")
            )
        else:
            merged = batch_df.drop("rk")
        # rollup tables are small (one row per window x type); a staged full
        # rewrite per refresh is the parquet-only equivalent of MERGE INTO
        merged.write.mode("overwrite").parquet(staged.toString())
        # Hadoop FS delete/rename signal failure via their return value, not
        # an exception; a silently failed swap would drop this batch's
        # updates while the checkpoint commits — fail the micro-batch
        # instead so the checkpointed retry re-runs it.
        if fs.exists(target) and not fs.delete(target, True):
            raise RuntimeError(f"rollup swap: could not delete {target}")
        if not fs.rename(staged, target):
            raise RuntimeError(f"rollup swap: rename failed {staged} -> {target}")

    return (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(refresh)
    )


def incremental_embed(
    stream: DataFrame,
    message: str,
    key: str,
    output_path: str,
    checkpoint_path: str,
    rate: float = 0.1,
):
    """Incremental watermark EMBED over newly arrived vector rows: each
    micro-batch runs the batch embed pipeline and appends the watermarked
    rows to ``output_path``.  ``foreachBatch`` is the canonical bridge from
    Structured Streaming to a batch dataflow (SURVEY.md §2.10 extension —
    the reference's embed is batch-only)."""
    from vectordb_watermark_spark.plans.embed import embed_watermark

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        res = embed_watermark(batch_df, message, key, rate=rate)
        res.updated.write.mode("append").parquet(output_path)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
