"""Registry hygiene (VERDICT r13 #8): the oracle-less query set must not
grow silently past the documented rows-only list, and no oracle may
orphan.  Pure registry introspection — no SparkSession needed."""

import subprocess
import sys


def test_registry_guard_clean():
    sys.path.insert(0, ".")
    from tools.registry_guard import ROWS_ONLY_ALLOWED, check_registry

    assert check_registry() == []
    # round 14: bpe_token_counts gained its recursive-CTE oracle, so the
    # standing rows-only set is exactly the four cross-engine-ceiling rows
    assert ROWS_ONLY_ALLOWED == {
        "pca_projection", "knn_lsh_edges", "ivf_topk", "lsh_topk",
    }


def test_registry_guard_cli_runs():
    out = subprocess.run(
        [sys.executable, "tools/registry_guard.py"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "violations: 0" in out.stdout
