"""Vector-table sources and sinks (SURVEY.md §2.1 S1-S11).

The reference's scan/update operators are psycopg2/Milvus row loops
(database/pgvector/pg_func.py:67-100, database/milvus/milvus_func.py:64-198);
here a "vector table" is a Parquet (or any Spark-readable) table with schema
``(id BIGINT, emb ARRAY<FLOAT>)`` and everything is declarative:

- full scan S1/S2        -> ``spark.read.parquet`` (partitioned; the Milvus
  16 384-row pagination dance disappears).
- predicated scans S3-S5 -> filters/semi-joins that Catalyst pushes down.
- batch UPDATE S8/S9     -> :func:`merge_update` (join + coalesce overwrite —
  same semantics as a Delta ``MERGE INTO`` without the Delta dependency).
- backup/snapshot S10    -> plain parquet write.

JDBC: :func:`read_jdbc_vectors` reads a *live* pgvector table (partitioned on
id bounds, vector text parsed in-plan) and :func:`stage_jdbc_updates` +
:func:`merge_from_staging_sql` implement the set-based writeback.  No
database or driver jar exists in this environment, so the JDBC entry points
are exercised only through their pure pieces (vector text codec, merge SQL);
the engine's canonical storage is columnar files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_vector_table(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    vec_col: str = "emb",
    validate_dim: int | None = None,
) -> DataFrame:
    """Load a vector table, normalizing column names to (id, emb).

    ``validate_dim`` adds a size(emb)=D filter check constraint — at scale
    this runs as a codegen'd filter, not a UDF.
    """
    df = spark.read.parquet(path)
    cols = df.columns
    if id_col not in cols or vec_col not in cols:
        raise ValueError(f"expected columns {id_col!r}, {vec_col!r}; table has {cols}")
    out = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("emb"))
    if validate_dim is not None:
        out = out.filter(F.size("emb") == validate_dim)
    return out


def vector_dim(df: DataFrame, vec_col: str = "emb") -> int:
    """Dimension probe (S6) — one-row sample, like the reference's
    ``LIMIT 1`` probe (database/pgvector/client.py:144-176).  Prefer a table
    property in a real catalog; this is the fallback."""
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None:
        raise ValueError("empty vector table")
    return row["d"]


def merge_update(
    base: DataFrame, updates: DataFrame, key_col: str = "id", update_cols: list[str] | None = None
) -> DataFrame:
    """Upsert-by-key: rows in ``updates`` replace matching ``base`` rows.

    Equivalent to Delta ``MERGE INTO ... WHEN MATCHED THEN UPDATE`` (which is
    exactly the reference's batch-UPDATE / delete+insert sink semantics,
    SURVEY.md §2.1 S8/S9).  A left join + coalesce: one shuffle on the key,
    broadcast automatically when ``updates`` is small (the common case —
    carriers are ~10% of rows).
    """
    if update_cols is None:
        update_cols = [c for c in updates.columns if c != key_col]
    renamed = updates.select(
        F.col(key_col), *[F.col(c).alias(f"__new_{c}") for c in update_cols]
    )
    out = base.join(renamed, key_col, "left")
    for c in update_cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c))).drop(f"__new_{c}")
    return out


def snapshot(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Backup sink (S10) — replaces the reference's .npz carrier backup
    (pg_func.py:441-461) with a columnar snapshot."""
    df.write.mode(mode).parquet(path)


def load_npy(spark: SparkSession, path: str, id_start: int = 1) -> DataFrame:
    """S7 bulk load: a ``.npy`` (N, D) float matrix -> vector table
    ``(id, emb)`` with sequential ids (reference
    database/pgvector/docker/insert.py:27-79 loads the same shape via
    execute_values).  The file is memory-mapped on the driver and shipped in
    row chunks; for files beyond driver memory convert to parquet once and
    use the columnar scan instead."""
    import numpy as np

    mat = np.load(path, mmap_mode="r")
    if mat.ndim != 2:
        raise ValueError(f"expected (N, D) matrix, got shape {mat.shape}")
    rows = (
        (id_start + i, [float(x) for x in mat[i]]) for i in range(mat.shape[0])
    )
    return spark.createDataFrame(rows, "id long, emb array<float>")


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    The canonical 100 TB co-location pattern: bucket fact tables by their
    join/aggregation key ONCE at write time; every later join or groupBy on
    ``bucket_cols`` between co-bucketed tables (same columns, same
    ``n_buckets``) reads each bucket as a pre-hashed partition and skips the
    shuffle exchange entirely (verified by plan assertion in
    tests/test_plans.py).  ``sort_cols`` additionally pre-sorts within
    buckets, eliminating the sort side of a sort-merge join.

    Bucketing requires the table catalog (``saveAsTable``); ``path`` makes
    it an external table at that location.
    """
    validate_identifier(name)
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet hive-partitioned by ``partition_cols`` — equality and
    range predicates on those columns then prune entire directories at plan
    time (partition pruning), the first lever against a 100 TB scan."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet with per-row-group BLOOM FILTERS on ``bloom_cols`` —
    the third pruning lever after partition and min/max pruning: a point
    lookup (S4) on a high-cardinality key over 100 TB skips every row group
    whose bloom filter excludes the value, even where min/max ranges
    overlap (typical for hash-ish ids scattered across files).  ``ndv`` is
    the expected distinct values per row group (sizes the filter).  Readers
    need no opt-in — parquet-mr consults the filter during row-group
    selection."""
    w = df.write.mode(mode)
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
        )
    w.parquet(path)


def truncate_table(df: DataFrame) -> DataFrame:
    """S11 table truncate (reference attack/clear.py:16 `DELETE FROM t`):
    an empty frame with the same schema — write it with mode='overwrite'."""
    return df.limit(0)


def validate_identifier(name: str) -> str:
    """P14 SQL-identifier hygiene (reference insert.py:21-25): alnum and
    underscores only; returns the name or raises."""
    if not name or not name.replace("_", "").isalnum():
        raise ValueError(f"invalid identifier: {name!r}")
    return name


# ---------------------------------------------------------------------------
# JDBC pgvector source/sink (SURVEY.md §1.4 optional source parity)
# ---------------------------------------------------------------------------

def pgvector_to_array(col) -> "F.Column":
    """Parse pgvector's wire/text representation ``'[0.1,0.2,...]'`` into
    ``array<float>`` — over JDBC the ``vector`` type surfaces as text
    (no JDBC driver maps it natively).  Pure Catalyst expression."""
    cleaned = F.regexp_replace(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"), r"[\[\]\s]", "")
    return F.transform(F.split(cleaned, ","), lambda x: x.cast("float"))


def array_to_pgvector(col) -> "F.Column":
    """Inverse of :func:`pgvector_to_array`: render ``array<float>`` as the
    ``'[x,y,...]'`` literal pgvector's text input parser accepts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(F.lit("["), F.concat_ws(",", c), F.lit("]"))


def read_jdbc_vectors(
    spark: SparkSession,
    url: str,
    table: str,
    id_col: str = "id",
    vec_col: str = "embedding",
    num_partitions: int = 64,
    lower: int | None = None,
    upper: int | None = None,
    fetch_size: int = 10_000,
    properties: dict | None = None,
) -> DataFrame:
    """S1/S2 against a LIVE pgvector database (ref pg_func.py:67-100 scans
    with psycopg2 row loops; Milvus needs a 16 384-row pagination dance,
    milvus_func.py:64-198).  Spark-native replacement: a partitioned
    ``spark.read.jdbc`` on ``id_col`` bounds — each executor reads one id
    range concurrently, predicates/projections push down to the database,
    and the ``vector`` column is parsed to ``array<float>`` in-plan.

    ``lower``/``upper`` default to a one-row min/max probe (pushed down as a
    subquery).  Requires the PostgreSQL JDBC driver jar on the Spark
    classpath (``spark.jars`` / ``--packages org.postgresql:postgresql``).
    """
    props = {"fetchsize": str(fetch_size), **(properties or {})}
    if lower is None or upper is None:
        # alias must not start with '_' — legal in Postgres but a syntax
        # error in stricter engines (Derby), caught by the embedded-Derby
        # integration test
        probe = spark.read.jdbc(
            url,
            f"(SELECT min({id_col}) AS lo, max({id_col}) AS hi FROM {table}) bounds_probe",
            properties=props,
        ).first()
        # engines that fold unquoted identifiers to upper case (Derby,
        # Oracle, DB2) return the aliases as LO/HI — read case-insensitively
        bounds = {k.lower(): v for k, v in probe.asDict().items()}
        if bounds["lo"] is None or bounds["hi"] is None:
            raise ValueError(
                f"cannot derive id bounds: {table} is empty — pass "
                "lower/upper explicitly or load the table another way"
            )
        lower = int(bounds["lo"]) if lower is None else lower
        upper = int(bounds["hi"]) if upper is None else upper
    df = spark.read.jdbc(
        url,
        table,
        column=id_col,
        lowerBound=lower,
        upperBound=upper + 1,  # Spark's upperBound is exclusive
        numPartitions=num_partitions,
        properties=props,
    )
    return df.withColumn(vec_col, pgvector_to_array(vec_col))


def stage_jdbc_updates(
    df: DataFrame,
    url: str,
    staging_table: str,
    vec_col: str = "embedding",
    batch_size: int = 10_000,
    properties: dict | None = None,
) -> None:
    """First half of the S8/S9 writeback to a live database: bulk-write the
    updated rows to ``staging_table`` (overwritten), vectors rendered as
    pgvector text literals.  Spark's JDBC sink supports append/overwrite
    only — per-row UPDATE loops (the reference's writeback,
    pg_func.py:363-377) do not scale, so the merge half is one server-side
    set-based statement: see :func:`merge_from_staging_sql`."""
    props = {"batchsize": str(batch_size), **(properties or {})}
    out = df
    if vec_col in df.columns:
        out = df.withColumn(vec_col, array_to_pgvector(vec_col))
    out.write.jdbc(url, staging_table, mode="overwrite", properties=props)


def merge_from_staging_sql(
    target: str, staging: str, key_col: str = "id", update_cols: list[str] | None = None,
    vec_col: str = "embedding", dialect: str = "postgres",
) -> str:
    """Second half of the writeback: the single set-based server-side merge
    statement to run against the database (psql / any DBAPI conn) after
    :func:`stage_jdbc_updates`.  One statement touches every staged row —
    the scale-correct replacement for the reference's per-row UPDATE loop.

    ``dialect='postgres'`` (default) emits ``UPDATE..FROM`` with the staged
    text vector cast back through pgvector's input parser (``::vector``).
    ``dialect='ansi'`` emits SQL:2003 ``MERGE INTO`` (no pgvector cast) for
    engines without ``UPDATE..FROM`` — exercised end-to-end against
    embedded Apache Derby in `test_jdbc_derby_roundtrip`."""
    if update_cols is None:
        update_cols = [vec_col]
    if dialect == "ansi":
        sets = ", ".join(f"{c} = s.{c}" for c in update_cols)
        return (
            f"MERGE INTO {target} t USING {staging} s ON t.{key_col} = s.{key_col} "
            f"WHEN MATCHED THEN UPDATE SET {sets}"
        )
    if dialect != "postgres":
        raise ValueError(f"unknown dialect {dialect!r} (postgres|ansi)")
    sets = ", ".join(
        f"{c} = s.{c}::vector" if c == vec_col else f"{c} = s.{c}"
        for c in update_cols
    )
    return (
        f"UPDATE {target} t SET {sets} "
        f"FROM {staging} s WHERE t.{key_col} = s.{key_col}"
    )


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = 8, exact: bool = False
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) key column interleaving ``bits``
    quantile-bucket bits per column -> ``(df_with_key, key_col_name)``.

    Each column is first mapped to a ``2^bits``-level rank bucket via
    its quantile boundaries (one ``approx_percentile`` aggregate per
    call — bounded-state Greenwald-Khanna summaries on the executors,
    ``2^bits + 1`` doubles to the driver, independent of row count AND
    of column cardinality), so skewed and differently-scaled columns
    interleave fairly; then the bucket bits interleave
    ``x0 y0 x1 y1 ...`` into one long.  Everything after the one
    aggregate is per-row codegen expressions.

    Bucket boundaries do not need exactness — file-span narrowing is
    unchanged by an ±ε boundary shift — so the default is the
    bounded-state sketch (the exact ``percentile`` aggregate buffers
    every distinct value per column in executor memory, an OOM on a
    high-cardinality double column at 100 TB).  ``exact=True`` keeps
    the old exact path for small deterministic twins.
    """
    if not cols:
        raise ValueError("zorder_value: no columns")
    if not 1 <= bits <= 16:
        raise ValueError(f"bits must be in 1..16, got {bits}")
    if bits * len(cols) > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits exceeds a 63-bit z-value"
        )
    n_b = 1 << bits
    qs = [i / n_b for i in range(n_b + 1)]
    if exact:
        q_agg = [
            F.percentile(
                F.col(c).cast("double"), F.array(*[F.lit(q) for q in qs])
            ).alias(c)
            for c in cols
        ]
    else:
        # GK sketch: state is O(accuracy) per column regardless of
        # cardinality; 1e-4 relative rank error is far below bucket width
        # for any bits <= 12
        q_agg = [
            F.percentile_approx(
                F.col(c).cast("double"),
                F.array(*[F.lit(q) for q in qs]),
                F.lit(10000),
            ).alias(c)
            for c in cols
        ]
    row = df.agg(*q_agg).collect()[0]
    bucketed = []
    for c in cols:
        # strictly increasing boundary subsequence (duplicate quantiles on
        # skewed data would make width_bucket ill-defined); buckets 0..n_b-1
        bounds = sorted(set(row[c]))
        if len(bounds) < 2:
            bucketed.append(F.lit(0))  # constant column: one bucket
            continue
        arr = F.array(*[F.lit(float(b)) for b in bounds])
        # rank bucket = count of boundaries <= x, clamped — exact quantile
        # buckets (uniform-width width_bucket would misgrade skewed data)
        b_col = F.aggregate(
            arr, F.lit(0),
            lambda acc, bd: acc + F.when(F.col(c).cast("double") >= bd, 1).otherwise(0),
        )
        b_col = F.least(
            F.greatest(b_col - 1, F.lit(0)), F.lit(len(bounds) - 2)
        )
        # rescale sparse bucket ids onto the bits-wide grid
        scale = (n_b - 1) / max(len(bounds) - 2, 1)
        bucketed.append(F.round(b_col * F.lit(scale), 0).cast("long"))
    z = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, b_col in enumerate(bucketed):
            pos = bit * len(cols) + ci
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b_col.cast("long"), bit).bitwiseAND(F.lit(1)),
                    pos,
                )
            )
    key = "__zorder"
    return df.withColumn(key, z), key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    n_files: int = 32,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered parquet write — the MULTI-column data-skipping
    lever (the layout Delta/Iceberg `OPTIMIZE ZORDER BY` produces):
    rows are range-partitioned and sorted by a Morton key interleaving
    the rank bits of ``cols``, so every output file covers a small
    hyper-rectangle of the value space and parquet min/max (and any
    bloom) stats prune files for predicates on ANY of the columns —
    unlike a single-column sort, which only prunes its leading column.
    One bounded-state quantile sketch + one range shuffle; scale-safe
    at any corpus size and any column cardinality.

    No reference analogue (the reference has no storage layout layer);
    cited pattern: Morton curves as shipped by Delta Lake / Iceberg.
    """
    keyed, key = zorder_value(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction for a parquet table (the Delta/Iceberg
    ``OPTIMIZE`` / bin-packing shape): rewrite ``path`` into
    ``ceil(total_bytes / target_mb)`` files and return a stats dict
    ``{files_before, files_after, rows, bytes_before}``.

    Streaming sinks and incremental appends accrete tiny files; at scan
    time each costs a task schedule and a footer read, and at 100 TB the
    footer metadata alone dominates small-file scans.  Compaction is one
    read + one write:

    - ``sort_cols`` None -> round-robin ``repartition(n)`` (skew-proof,
      no shuffle key to hotspot);
    - ``sort_cols`` given -> ``repartitionByRange`` + in-partition sort,
      restoring min/max-statistics clustering on those columns (the
      cheap cousin of :func:`write_zordered` for single-axis locality).

    Safety: the rewrite lands in a private staging dir first, its row
    count is verified against the source, and only then is the original
    swapped out (rename, then delete).  NOT safe under concurrent
    readers/writers of ``path`` — run it as table maintenance between
    jobs, like the ANN store's ``compact_index`` fence documents.
    """
    if target_mb < 1:
        raise ValueError(f"target_mb must be >= 1, got {target_mb}")
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path
    fs = jvm_path(path).getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jvm_path(path)):
        raise ValueError(f"compact_parquet: no table at {path!r}")

    def _data_files(p):
        out = []
        for st in fs.listStatus(jvm_path(p)):
            name = st.getPath().getName()
            if st.isDirectory():
                out += _data_files(st.getPath().toString())
            elif not name.startswith(("_", ".")):
                out.append((st.getPath().toString(), st.getLen()))
        return out

    files = _data_files(path)
    files_before = len(files)
    bytes_before = sum(sz for _, sz in files)
    n_out = max(1, -(-bytes_before // (target_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    n_rows = df.count()
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)

    import uuid

    parent = path.rstrip("/").rsplit("/", 1)[0]
    staging = f"{parent}/.compact_{uuid.uuid4().hex[:12]}"
    out.write.mode("overwrite").parquet(staging)
    got = spark.read.parquet(staging).count()
    if got != n_rows:
        fs.delete(jvm_path(staging), True)
        raise RuntimeError(
            f"compact_parquet: staging row count {got} != source {n_rows}; "
            f"source left untouched"
        )
    old = f"{parent}/.compact_old_{uuid.uuid4().hex[:12]}"
    if not fs.rename(jvm_path(path), jvm_path(old)):
        fs.delete(jvm_path(staging), True)
        raise RuntimeError(f"compact_parquet: could not move {path!r} aside")
    if not fs.rename(jvm_path(staging), jvm_path(path)):
        # put the original back; nothing is lost
        fs.rename(jvm_path(old), jvm_path(path))
        fs.delete(jvm_path(staging), True)
        raise RuntimeError(
            f"compact_parquet: could not move staging into place; original "
            f"restored at {path!r}"
        )
    fs.delete(jvm_path(old), True)
    files_after = len(_data_files(path))
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": int(n_rows),
        "bytes_before": int(bytes_before),
    }
