"""Parallel full-suite runner (VERDICT r12 item 6).

The suite runs ~40 min single-process — long enough to start getting
skipped under time pressure, which is how green suites rot. This
container has no pytest-xdist and installs are off-limits, so the
sharding is hand-rolled at FILE granularity: N pytest subprocesses,
each its own JVM (a SparkSession cannot be shared across processes),
each running a disjoint set of test files.

Balancing: tests/.shard_durations.json maps test file -> measured
seconds (regenerate with --record, which parses `--durations=0` output
from the shard logs and rewrites the map). Files missing from the map
get a pessimistic default so new test files land alone-ish until
measured. Longest-processing-time greedy packing.

Isolation per shard:
- SPARK_GRAFT_WAREHOUSE points at a shard-private dir (bucketed-table
  tests saveAsTable into the warehouse; two JVMs sharing one would
  clobber each other's table dirs);
- the content-keyed export cache is safe to share since its r13 atomic
  rename publish (sources/export_cache.py);
- everything else tests touch is tmp_path-scoped or read-only.

Usage:
    python scripts/par_pytest.py            # run, 4 shards
    python scripts/par_pytest.py -n 6       # more shards
    python scripts/par_pytest.py --record   # run AND refresh durations

Exit code: 0 iff every shard's pytest exits 0. Shard logs land in
/tmp/dcs_par_pytest/shard<i>.log for post-mortem.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUR_FILE = os.path.join(REPO, "tests", ".shard_durations.json")
LOG_DIR = os.path.join(tempfile.gettempdir(), "dcs_par_pytest")
DEFAULT_SECONDS = 120.0  # unmeasured file: assume heavy until measured
# pytest --durations=0 line: "12.34s call tests/test_foo.py::test_bar"
_DUR_LINE = re.compile(
    r"^\s*(\d+(?:\.\d+)?)s\s+(?:call|setup|teardown)\s+(tests/[^:]+\.py)::"
)


def test_files() -> list[str]:
    return sorted(
        os.path.relpath(p, REPO)
        for p in glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )


def load_durations() -> dict[str, float]:
    try:
        with open(DUR_FILE) as fh:
            d = json.load(fh)
        return {k: float(v) for k, v in d.items()} if isinstance(d, dict) else {}
    except (OSError, ValueError, TypeError):
        return {}


def pack(files: list[str], n: int, dur: dict[str, float]) -> list[list[str]]:
    """LPT greedy: heaviest file onto the lightest shard."""
    shards: list[tuple[float, list[str]]] = [(0.0, []) for _ in range(n)]
    for f in sorted(files, key=lambda f: -dur.get(f, DEFAULT_SECONDS)):
        i = min(range(n), key=lambda j: shards[j][0])
        total, members = shards[i]
        members.append(f)
        shards[i] = (total + dur.get(f, DEFAULT_SECONDS), members)
    return [members for _, members in shards]


def parse_durations(log_paths: list[str]) -> dict[str, float]:
    """Aggregate per-test call/setup/teardown seconds per file."""
    out: dict[str, float] = {}
    for p in log_paths:
        try:
            lines = open(p, errors="replace").read().splitlines()
        except OSError:
            continue
        for line in lines:
            m = _DUR_LINE.match(line)
            if m:
                out[m.group(2)] = out.get(m.group(2), 0.0) + float(m.group(1))
    return {k: round(v, 1) for k, v in out.items()}


def main(argv: list[str]) -> int:
    n = 4
    record = "--record" in argv
    if "-n" in argv:
        n = int(argv[argv.index("-n") + 1])
    extra = [
        a for i, a in enumerate(argv)
        if a not in ("--record", "-n") and argv[i - 1 : i] != ["-n"]
    ]

    files = test_files()
    dur = load_durations()
    shards = [s for s in pack(files, n, dur) if s]
    os.makedirs(LOG_DIR, exist_ok=True)

    t0 = time.time()
    procs = []
    for i, members in enumerate(shards):
        est = sum(dur.get(f, DEFAULT_SECONDS) for f in members)
        log = os.path.join(LOG_DIR, f"shard{i}.log")
        env = dict(os.environ)
        env["SPARK_GRAFT_WAREHOUSE"] = os.path.join(
            tempfile.gettempdir(), f"dcs_par_wh_{os.getpid()}_{i}"
        )
        cmd = [
            sys.executable, "-m", "pytest", "-q", "--durations=0",
            "-p", "no:cacheprovider", *extra, *members,
        ]
        print(
            f"shard {i}: {len(members)} files, est {est / 60:.1f} min "
            f"-> {log}",
            flush=True,
        )
        procs.append(
            (i, log, subprocess.Popen(
                cmd, cwd=REPO, env=env,
                stdout=open(log, "w"), stderr=subprocess.STDOUT,
            ))
        )

    rc = 0
    for i, log, p in procs:
        code = p.wait()
        tail = ""
        try:
            for line in reversed(open(log, errors="replace").read().splitlines()):
                if re.search(r"\d+ (passed|failed|error)", line):
                    tail = line.strip()
                    break
        except OSError:
            pass
        print(f"shard {i}: exit {code}  {tail}", flush=True)
        rc = rc or code
    wall = time.time() - t0
    print(f"total wall: {wall / 60:.1f} min across {len(shards)} shards")

    if record:
        measured = parse_durations([log for _, log, _ in procs])
        if measured:
            merged = {**dur, **measured}
            # drop rows for deleted files
            merged = {k: v for k, v in merged.items() if k in set(files)}
            with open(DUR_FILE, "w") as fh:
                json.dump(dict(sorted(merged.items())), fh, indent=1)
                fh.write("\n")
            print(f"recorded {len(measured)} file durations -> {DUR_FILE}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
