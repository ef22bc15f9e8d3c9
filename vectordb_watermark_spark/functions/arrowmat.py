"""Zero-copy bridges between Arrow vector columns and numpy matrices.

Spark ships ``array<float>`` columns to Python as Arrow ``list<float32>``.
The idiomatic-looking ``np.stack(pdf[col].map(np.asarray))`` inside a pandas
UDF unboxes every element through Python lists — measured ~0.3 s per 10k x
384 batch and ~17 s for a 100k driver collect.  Reading the Arrow buffer
directly (``ListArray.values`` + reshape) is a metadata-only operation:
~0 ms per batch, ~2.5 s for the same collect including the transfer.  Every
vector kernel in the engine (kNN probe, codec encode/decode, graph features)
goes through these helpers; kernels use ``mapInArrow`` rather than
``mapInPandas`` so no pandas object conversion happens at all.

Fixed-width vectors are the engine's data contract (SURVEY.md §1.1); the
helpers *verify* it via the list offsets and raise on ragged or null rows
rather than silently mis-reshaping.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_array_to_matrix(arr: pa.Array | pa.ChunkedArray, dtype=np.float32) -> np.ndarray:
    """Arrow ``list<float>`` (or fixed-size list) array -> ``(n, dim)`` numpy
    matrix, zero-copy on the value buffer when possible.

    Raises ``ValueError`` on ragged rows or nulls — a vector table with
    varying dimension is a data error the engine surfaces, not masks.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("vector column contains nulls")
    n = len(arr)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if isinstance(arr, pa.FixedSizeListArray):
        dim = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        return np.ascontiguousarray(flat.reshape(n, dim)).astype(dtype, copy=False)
    offsets = arr.offsets.to_numpy()
    widths = np.diff(offsets)
    dim = int(widths[0]) if len(widths) else 0
    if not (widths == dim).all():
        raise ValueError("ragged vector column: rows differ in dimension")
    flat = arr.values.to_numpy(zero_copy_only=False)
    # a sliced array's offsets need not start at 0 — honor them
    start = int(offsets[0])
    return flat[start : start + n * dim].reshape(n, dim).astype(dtype, copy=False)


def matrix_to_list_array(mat: np.ndarray, value_type=pa.float32()) -> pa.ListArray:
    """``(n, dim)`` numpy matrix -> Arrow ``list<value_type>`` array, one
    buffer allocation (the transpose of :func:`list_array_to_matrix`)."""
    n, dim = mat.shape
    values = pa.array(np.ascontiguousarray(mat).reshape(-1), type=value_type)
    offsets = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, values)


def collect_matrix(df, id_col: str = "id", vec_col: str = "emb") -> tuple[np.ndarray, np.ndarray]:
    """Collect ``(id, vector)`` rows to the driver as ``(ids int64 (n,),
    mat float32 (n, dim))`` via Arrow — the build-side collect for
    broadcast-style vector operators."""
    from pyspark.sql import functions as F

    tbl = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toArrow()
    ids = tbl["id"].to_numpy().astype(np.int64, copy=False)
    mat = list_array_to_matrix(tbl["v"])
    return ids, mat


def arrow_type_of(spark_type) -> pa.DataType:
    """Spark ``DataType`` -> the Arrow type Spark itself maps it to.

    Kernel outputs built with ``pa.array(python_list)`` get Arrow's
    INFERRED type (Python ints -> int64), which fails the declared
    ``mapInArrow`` schema whenever the column is int/short/etc.  Deriving
    the type from the Spark schema keeps kernels correct for every id/qid
    column type, not just long and string.
    """
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(spark_type)
