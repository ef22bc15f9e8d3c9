"""Registry hygiene guard (VERDICT r13 #8): every gallery query must have
a DuckDB oracle, except the FOUR standing rows-only entries — each at its
cross-engine ceiling with a hash-exact sibling pinning its semantics
(COVERAGE.md "rows-only" section).  Importable (pytest calls
``check_registry``) and runnable::

    python tools/registry_guard.py

The guard fails when the oracle-less set grows (a new query shipped
without its twin), when it shrinks without pruning this list (an entry
gained an oracle — celebrate, then remove it here so the list stays the
documented ground truth), and when an oracle has no query (orphan twin).
"""

from __future__ import annotations

import sys

#: the documented rows-only set — change ONLY together with COVERAGE.md.
#: pca_projection: eigenvector sign ambiguity (pinned by pca_invariants);
#: knn_lsh_edges / ivf_topk / lsh_topk: approximate candidate sets whose
#: recall contracts are the hash-exact knn_lsh_recall / ivf_recall /
#: lsh_recall rows.  bpe_token_counts LEFT this list in round 14 — the
#: merge loop turned out to be a DuckDB recursive CTE after all.
ROWS_ONLY_ALLOWED = frozenset(
    {"pca_projection", "knn_lsh_edges", "ivf_topk", "lsh_topk"}
)


def check_registry() -> list[str]:
    """Return a list of violations (empty == healthy registry)."""
    from vectordb_watermark_spark.gallery import build_oracles, build_queries

    queries, oracles = build_queries(), build_oracles()
    problems: list[str] = []
    oracle_less = {name for name in queries if name not in oracles}
    for name in sorted(oracle_less - ROWS_ONLY_ALLOWED):
        problems.append(
            f"query {name!r} has no oracle and is not on the documented "
            "rows-only list (tools/registry_guard.py / COVERAGE.md)"
        )
    for name in sorted(ROWS_ONLY_ALLOWED - oracle_less):
        problems.append(
            f"rows-only entry {name!r} is stale: "
            + (
                "it now HAS an oracle — remove it from ROWS_ONLY_ALLOWED"
                if name in queries
                else "no such query in the registry"
            )
        )
    for name in sorted(set(oracles) - set(queries)):
        problems.append(f"oracle {name!r} has no matching query (orphan)")
    if len(queries) < 50:
        problems.append(
            f"registry has {len(queries)} queries < the 50-slot driver window"
        )
    return problems


def main() -> int:
    sys.path.insert(0, ".")
    problems = check_registry()
    for p in problems:
        print("FAIL", p)
    from vectordb_watermark_spark.gallery import build_oracles, build_queries

    print(
        f"registry: {len(build_queries())} queries / {len(build_oracles())} "
        f"oracles / {len(ROWS_ONLY_ALLOWED)} documented rows-only; "
        f"violations: {len(problems)}"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
