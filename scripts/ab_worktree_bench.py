"""One-command code-vs-box A/B adjudication (VERDICT r11 item 7).

The r11 method that separated a REAL PQ regression from box-epoch
drift: run the SAME keys through the isolated-bench protocol twice on
the same box — once from a detached git worktree at a reference commit
(the pre-change code), once from the current tree — and print the
per-key ratio. A uniform shift across keys is the box; a single key
moving alone is the code.

Usage: python scripts/ab_worktree_bench.py <commit> [sf_dir] key [key...]
       (sf_dir defaults to /root/testdata/sf0.1; passes default to the
        isolated protocol's 5, override with SPARK_GRAFT_ISOLATED_PASSES)

Both legs run in fresh subprocesses (own JVM each) via
scripts/isolated_bench.py, so neither inherits the other's codegen
cache or heap state. The old-code leg runs THAT commit's
isolated_bench when present (falling back to the current script run
against the old tree for commits predating it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_leg(tree: str, sf_dir: str, keys: list[str]) -> dict[str, dict]:
    script = os.path.join(tree, "scripts", "isolated_bench.py")
    if not os.path.exists(script):  # commit predates the script
        script = os.path.join(REPO, "scripts", "isolated_bench.py")
    proc = subprocess.run(
        [sys.executable, script, sf_dir, *keys],
        capture_output=True,
        text=True,
        timeout=900 + 180 * len(keys),
        cwd=tree,
        env={**os.environ, "PYTHONPATH": tree},
    )
    if proc.returncode != 0:
        raise SystemExit(
            f"leg at {tree} failed (rc {proc.returncode}):\n"
            + proc.stderr[-1500:]
        )
    return json.loads(proc.stdout.strip().splitlines()[-1])["isolated"]


def main(argv: list[str]) -> None:
    if len(argv) < 2:
        raise SystemExit(
            "usage: ab_worktree_bench.py <commit> [sf_dir] key [key ...]"
        )
    commit, *rest = argv
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest.pop(0)
    keys = rest
    if not keys:
        raise SystemExit("no keys given")

    with tempfile.TemporaryDirectory(prefix="dcs_ab_") as td:
        wt = os.path.join(td, "old")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            old = _run_leg(wt, sf_dir, keys)
            new = _run_leg(REPO, sf_dir, keys)
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )

    rows = {}
    for k in keys:
        o = old.get(k, {}).get("best")
        n = new.get(k, {}).get("best")
        rows[k] = {
            "old_best": o,
            "new_best": n,
            "ratio_new_over_old": round(n / o, 3) if o and n else None,
            "old_series": old.get(k, {}).get("series"),
            "new_series": new.get(k, {}).get("series"),
        }
        print(f"{k}: old {o}s  new {n}s  ratio {rows[k]['ratio_new_over_old']}")
    print(json.dumps({"commit": commit, "sf_dir": sf_dir, "ab": rows}))


if __name__ == "__main__":
    main(sys.argv[1:])
