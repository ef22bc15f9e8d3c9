"""Command-line surface — the reference's backend API verbs, one JSON line each.

The reference exposes its engine through FastAPI endpoints
(ref backend/app.py: /api/connect, /api/tables, /api/columns,
/api/primarykeys, /api/get_vector_dimension, /api/check_model,
/api/train_model, /api/embed_watermark, /api/extract-watermark,
/api/vector_visualization).  The HTTP transport is out of scope (SURVEY.md
§7.1) — this CLI maps the same verbs onto the engine so a reference user can
run every operation they run today, scriptably:

    python -m vectordb_watermark_spark.cli tables DIR
    python -m vectordb_watermark_spark.cli embed TABLE --message M --key K --out OUT
    python -m vectordb_watermark_spark.cli extract TABLE --key K --nonce N

Every subcommand prints exactly ONE JSON object on stdout (the REST
responses' moral equivalent); logs go to stderr.  Tables are parquet paths
with an ``(id, emb ARRAY<FLOAT>)`` schema (`--id-col/--vec-col` to remap).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from vectordb_watermark_spark import get_spark

    return get_spark(
        "vdbwm-cli", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus
    )


def _load(spark, args):
    from pyspark.sql import functions as F

    df = spark.read.parquet(args.table)
    if args.id_col != "id" or args.vec_col != "emb":
        df = df.select(
            F.col(args.id_col).alias("id"), F.col(args.vec_col).alias("emb")
        )
    return df


def cmd_connect(args) -> dict:  # /api/connect + /api/tables
    from vectordb_watermark_spark.sources.catalog import list_tables, register_dir

    spark = _spark(args)
    register_dir(spark, args.dir)
    return {"connected": True, "tables": list_tables(spark)}


def cmd_columns(args) -> dict:  # /api/columns (vector columns flagged)
    from vectordb_watermark_spark.sources.catalog import (
        list_vector_columns,
        register_dir,
    )

    spark = _spark(args)
    register_dir(spark, args.dir)
    cols = spark.table(args.name).schema
    return {
        "columns": [{"name": f.name, "type": f.dataType.simpleString()} for f in cols],
        "vector_columns": list_vector_columns(spark, args.name),
    }


def cmd_keys(args) -> dict:  # /api/primarykeys
    from vectordb_watermark_spark.sources.catalog import (
        list_key_candidates,
        register_dir,
    )

    spark = _spark(args)
    register_dir(spark, args.dir)
    return {"primary_keys": list_key_candidates(spark, args.name)}


def cmd_dim(args) -> dict:  # /api/get_vector_dimension
    from vectordb_watermark_spark.sources.io import vector_dim

    spark = _spark(args)
    return {"dimension": vector_dim(_load(spark, args), "emb")}


def cmd_check_model(args) -> dict:  # /api/check_model
    # reports BOTH checkpoint kinds (learned .npz / calibrated .json) and
    # which one embed/extract would actually load (training.load_codec)
    from vectordb_watermark_spark.training import model_info

    return {"dimension": args.dimension, **model_info(args.dimension, args.results_dir)}


def cmd_train(args) -> dict:  # /api/train_model
    spark = _spark(args)
    df = _load(spark, args)
    if args.learned:
        from vectordb_watermark_spark.training import train_learned_codec

        out = train_learned_codec(
            df, vec_col="emb", sample_limit=args.sample_limit,
            results_dir=args.results_dir, epochs=args.epochs,
        )
        return {
            "trained": True, "kind": "learned",
            "best_val_ber": out["best_val_ber"],
            "epochs": len(out["history"]), "model_path": out["model_path"],
        }
    from vectordb_watermark_spark.training import train_codec

    ckpt = train_codec(df, key=args.key, results_dir=args.results_dir)
    return {
        "trained": True, "kind": "calibrated", "grade": ckpt["grade"],
        "val_ber": ckpt["val_ber"], "delta": ckpt["delta"],
    }


def cmd_embed(args) -> dict:  # /api/embed_watermark
    from vectordb_watermark_spark.plans.embed import embed_watermark

    spark = _spark(args)
    res = embed_watermark(
        _load(spark, args), args.message, args.key, rate=args.rate,
        results_dir=args.results_dir,
    )
    res.updated.write.mode("overwrite").parquet(args.out)
    return {
        "embedded": True, "nonce_hex": res.nonce_hex,
        "carriers": res.n_carriers, "out": args.out,
    }


def cmd_extract(args) -> dict:  # /api/extract-watermark
    from vectordb_watermark_spark.plans.extract import extract_watermark

    spark = _spark(args)
    out = extract_watermark(
        _load(spark, args), args.key, args.nonce, rate=args.rate,
        results_dir=args.results_dir,
    )
    return {
        "success": out.success, "message": out.message,
        "recovered_blocks": out.recovered_blocks,
        "valid_decodes": out.valid_decodes, "total_decodes": out.total_decodes,
        "error": out.error,
    }


def cmd_attack(args) -> dict:  # attack/*.py scripts
    from vectordb_watermark_spark.operators import attacks as A

    if args.kind == "truncate" and args.keep_dims is None:
        raise SystemExit("attack --kind truncate requires --keep-dims")
    spark = _spark(args)
    df = _load(spark, args)
    if args.kind == "gaussian":
        out = A.gaussian_attack(df, ratio=args.ratio, sigma=args.sigma, seed_key=args.seed)
    elif args.kind == "subset":
        out = A.subset_attack(df, keep_ratio=args.ratio, seed_key=args.seed)
    elif args.kind == "mean":
        out = A.mean_replace_attack(df, ratio=args.ratio, seed_key=args.seed)
    elif args.kind == "truncate":
        out = A.truncate_pad_attack(df, keep_dims=args.keep_dims)
    else:  # pragma: no cover - argparse restricts choices
        raise ValueError(args.kind)
    out.write.mode("overwrite").parquet(args.out)
    return {"attacked": True, "kind": args.kind, "rows": out.count(), "out": args.out}


def cmd_visualize(args) -> dict:  # /api/vector_visualization
    from vectordb_watermark_spark.operators.viz import pairwise_stats, project_2d

    spark = _spark(args)
    df = _load(spark, args)
    stats = pairwise_stats(df, max_rows=args.sample, seed_key=args.seed).first().asDict()
    pts = project_2d(df, max_rows=args.sample, seed_key=args.seed)
    if args.out:
        pts.write.mode("overwrite").parquet(args.out)
    return {"stats": stats, "points": pts.count(), "out": args.out}


def cmd_evaluate(args) -> dict:  # algorithms/deep_learning/test.py
    from vectordb_watermark_spark.plans.codec import OrthogonalCodec
    from vectordb_watermark_spark.plans.evaluate import evaluate_codec
    from vectordb_watermark_spark.sources.io import vector_dim

    spark = _spark(args)
    df = _load(spark, args)
    codec = OrthogonalCodec(vector_dim(df, "emb"), args.key)
    return evaluate_codec(df, codec).first().asDict()


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="vdbwm", description=__doc__)
    p.add_argument("--cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    def table_cmd(name, fn, **extra):
        c = sub.add_parser(name)
        c.add_argument("table")
        c.add_argument("--id-col", default="id")
        c.add_argument("--vec-col", default="emb")
        c.set_defaults(fn=fn)
        for flag, kw in extra.items():
            c.add_argument(flag, **kw)
        return c

    for name in ("connect", "tables"):
        c = sub.add_parser(name)
        c.add_argument("dir")
        c.set_defaults(fn=cmd_connect)
    for name, fn in (("columns", cmd_columns), ("keys", cmd_keys)):
        c = sub.add_parser(name)
        c.add_argument("dir")
        c.add_argument("name")
        c.set_defaults(fn=fn)

    table_cmd("dim", cmd_dim)
    c = sub.add_parser("check-model")
    c.add_argument("dimension", type=int)
    c.add_argument("--results-dir", default="results")
    c.set_defaults(fn=cmd_check_model)

    table_cmd(
        "train", cmd_train,
        **{"--key": dict(default="train-key"), "--results-dir": dict(default="results"),
           "--learned": dict(action="store_true"), "--epochs": dict(type=int, default=20),
           "--sample-limit": dict(type=int, default=100_000)},
    )
    table_cmd(
        "embed", cmd_embed,
        **{"--message": dict(required=True), "--key": dict(required=True),
           "--rate": dict(type=float, default=0.1), "--out": dict(required=True),
           "--results-dir": dict(default=None)},
    )
    table_cmd(
        "extract", cmd_extract,
        **{"--key": dict(required=True), "--nonce": dict(required=True),
           "--rate": dict(type=float, default=0.1), "--results-dir": dict(default=None)},
    )
    table_cmd(
        "attack", cmd_attack,
        **{"--kind": dict(choices=["gaussian", "subset", "mean", "truncate"], required=True),
           "--sigma": dict(type=float, default=0.05), "--ratio": dict(type=float, default=0.5),
           "--keep-dims": dict(type=int, default=None), "--seed": dict(default="attack-1"),
           "--out": dict(required=True)},
    )
    table_cmd(
        "visualize", cmd_visualize,
        **{"--sample": dict(type=int, default=500), "--seed": dict(default="viz-1"),
           "--out": dict(default=None)},
    )
    table_cmd("evaluate", cmd_evaluate, **{"--key": dict(default="eval-key")})
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    out = args.fn(args)
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
