"""One-time backfill of content signatures into driver_ledger.json.

Each ledger entry records the ROUND whose driver run verified the key.
The code the driver saw is the repo tree at that round's boundary
commit ("round N: verdict/advice/correctness/bench"). This script
materializes each needed boundary tree in a temporary git worktree,
extracts every registered key's (builder source, oracle SQL) signature
there via a subprocess (the historical trees predate
registry.content_sig, so the subprocess carries its own copy of the
inspection — the HASH ITSELF is computed by the current repo's
registry.sig_of so the definition cannot fork), and writes the sig for
each entry's own round into the ledger.

A key whose historical source cannot be recovered (registered later
than its ledger round claims, import failure in the old tree) keeps no
sig — the rotation treats sig-less entries as edited, i.e. maximally
re-verifiable, which is the safe direction.

Usage: python scripts/backfill_ledger_sigs.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from database_cloner_spark.registry import sig_of  # noqa: E402
from scripts.update_ledger import LEDGER, load_ledger  # noqa: E402

# Runs inside each historical tree: emit
# {key: [builder_source, oracle, [helper sources...]]} as JSON. Sources
# only — hashing happens in THIS process via sig_of. The helper walk is
# carried INLINE (historical trees predate registry.helper_sources) but
# must stay semantically identical to registry.helper_sources so the
# definition cannot fork.
_EXTRACT = r"""
import inspect, json, sys, types
sys.path.insert(0, ".")
from database_cloner_spark import registry

_PKG = "database_cloner_spark."

def _helpers(builder):
    simple = (int, float, str, bytes, bool, frozenset, tuple)
    found, seen, stack = {}, {id(builder)}, [builder]
    while stack:
        fn = stack.pop()
        code = getattr(fn, "__code__", None)
        g = getattr(fn, "__globals__", None)
        if code is None or g is None:
            continue
        names, codes = set(), [code]
        while codes:
            c = codes.pop()
            names.update(c.co_names)
            for const in c.co_consts:
                if isinstance(const, types.CodeType):
                    codes.append(const)
        candidates = [(nm, g.get(nm)) for nm in names]
        for _, obj in list(candidates):
            if isinstance(obj, types.ModuleType) and (
                obj.__name__.startswith(_PKG) or obj.__name__ == _PKG[:-1]
            ):
                candidates.extend((nm, getattr(obj, nm, None)) for nm in names)
        for nm, obj in candidates:
            if obj is None or id(obj) in seen:
                continue
            mod = getattr(obj, "__module__", None) or ""
            in_pkg = mod.startswith(_PKG) or mod == _PKG[:-1]
            if isinstance(obj, types.FunctionType) and in_pkg:
                seen.add(id(obj))
                try:
                    src = inspect.getsource(obj)
                except (OSError, TypeError):
                    src = obj.__qualname__
                found[(mod, obj.__qualname__)] = src
                stack.append(obj)
            elif isinstance(obj, type) and in_pkg:
                seen.add(id(obj))
                try:
                    src = inspect.getsource(obj)
                except (OSError, TypeError):
                    src = obj.__qualname__
                found[(mod, obj.__qualname__)] = src
            elif nm.isupper() and isinstance(obj, simple):
                owner = getattr(fn, "__module__", "") or ""
                found[(owner, "const:" + nm)] = "%s=%r" % (nm, obj)
    return [found[k] for k in sorted(found)]

out = {}
for name, spec in registry.specs().items():
    try:
        src = inspect.getsource(spec.builder)
    except (OSError, TypeError):
        src = spec.builder.__qualname__
    out[name] = [src, spec.oracle, _helpers(spec.builder)]
print(json.dumps(out))
"""


def _boundary_commit(rnd: int) -> str | None:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"], cwd=REPO, capture_output=True, text=True
    ).stdout
    for line in out.splitlines():
        sha, _, subject = line.partition(" ")
        if subject.startswith(f"round {rnd}: verdict"):
            return sha
    return None


def _sources_at(commit: str) -> dict[str, list]:
    with tempfile.TemporaryDirectory(prefix="dcs_sig_") as td:
        wt = os.path.join(td, "tree")
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, commit],
            cwd=REPO, check=True, capture_output=True,
        )
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _EXTRACT],
                cwd=wt, capture_output=True, text=True, timeout=600,
                env={**os.environ, "PYTHONPATH": wt},
            )
            if proc.returncode != 0:
                print(f"  extract failed at {commit[:8]}: {proc.stderr[-400:]}")
                return {}
            return json.loads(proc.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO, capture_output=True,
            )


def main() -> None:
    ledger = load_ledger(LEDGER)
    rounds = sorted({v["round"] for v in ledger.values()})
    per_round: dict[int, dict[str, list]] = {}
    for rnd in rounds:
        commit = _boundary_commit(rnd)
        if commit is None:
            print(f"round {rnd}: no boundary commit — entries stay sig-less")
            continue
        print(f"round {rnd}: extracting sources at {commit[:8]} ...")
        per_round[rnd] = _sources_at(commit)

    filled = missing = 0
    for key, entry in ledger.items():
        srcs = per_round.get(entry["round"], {})
        if key in srcs:
            row = srcs[key]
            helpers = row[2] if len(row) > 2 else None
            entry["sig"] = sig_of(row[0], row[1], helpers)
            filled += 1
        else:
            missing += 1
    with open(LEDGER, "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=0)
        f.write("\n")
    print(f"backfilled {filled} sigs ({missing} entries left sig-less)")


if __name__ == "__main__":
    main()
