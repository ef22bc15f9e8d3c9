"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given SF,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, doubles compared exactly — both sides
are expected to round).  Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")


def canon(df) -> tuple[int, list[str], str]:
    """(n_rows, sorted_cols, value_hash) for a pandas DataFrame."""
    cols = sorted(df.columns)
    df = df[cols]

    def cell(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, float):
            if v != v:
                return "nan"
            if v == 0.0:
                return "0"
            return repr(round(v, 9))
        if v is None:
            return "null"
        return str(v)

    rows = sorted("|".join(cell(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(df), cols, h


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from vectordb_watermark_spark import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {str(exc)[:200]}")
            n_fail += 1
            continue
        sn, sc, sh = canon(sdf)
        on, oc, oh = canon(odf)
        status = "PASS" if (sn, sc, sh) == (on, oc, oh) else "FAIL"
        # the DRIVER's canonicalizer sort_values over every column — list
        # cells crash it even when the local hash compare passes
        if status == "PASS" and len(sdf) and any(
            isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
            for v in sdf.iloc[0]
        ):
            status = "FAIL"
            print(f"WARN {name}: array-valued column would crash the driver gate")
        if status == "FAIL":
            n_fail += 1
        print(
            f"{status} {name}: spark({sn} rows, {sh}) oracle({on} rows, {oh}) "
            f"cols={'ok' if sc == oc else f'{sc} vs {oc}'} [{time.time()-t0:.1f}s]"
        )
        if status == "FAIL" and sn and on and sc == oc:
            s_rows = sorted(map(tuple, sdf[sorted(sdf.columns)].values.tolist()))[:3]
            o_rows = sorted(map(tuple, odf[sorted(odf.columns)].values.tolist()))[:3]
            print(f"     spark sample:  {s_rows}")
            print(f"     oracle sample: {o_rows}")
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
