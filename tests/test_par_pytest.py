"""Unit tests for the sharded-suite runner's pure logic
(scripts/par_pytest.py): LPT packing and duration-log parsing. The
subprocess orchestration itself is exercised every time the suite runs
sharded; these pin the parts a refactor could silently break."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "par_pytest",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "par_pytest.py",
    ),
)
par = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(par)


def test_pack_balances_by_duration():
    files = [f"tests/t{i}.py" for i in range(6)]
    dur = {files[0]: 100.0, files[1]: 90.0, files[2]: 10.0,
           files[3]: 10.0, files[4]: 5.0, files[5]: 5.0}
    shards = par.pack(files, 2, dur)
    totals = sorted(
        sum(dur[f] for f in s) for s in shards
    )
    # LPT lands both shards at 110 (100+10 vs 90+10+5+5)
    assert totals == [110.0, 110.0]
    assert sorted(f for s in shards for f in s) == sorted(files)


def test_pack_unmeasured_files_get_pessimistic_default():
    files = ["tests/a.py", "tests/b.py", "tests/c.py"]
    shards = par.pack(files, 3, {})
    assert sorted(len(s) for s in shards) == [1, 1, 1]


def test_pack_more_shards_than_files():
    shards = par.pack(["tests/a.py"], 4, {})
    assert [s for s in shards if s] == [["tests/a.py"]]


def test_parse_durations_aggregates_per_file(tmp_path):
    log = tmp_path / "shard0.log"
    log.write_text(
        "12.34s call tests/test_a.py::test_one\n"
        "0.50s setup tests/test_a.py::test_one\n"
        "2.00s call tests/test_b.py::test_two[param-1]\n"
        "garbage line\n"
        "0.01s teardown tests/test_b.py::test_two[param-1]\n"
    )
    got = par.parse_durations([str(log)])
    assert got == {"tests/test_a.py": 12.8, "tests/test_b.py": 2.0}


def test_parse_durations_missing_log_is_empty(tmp_path):
    assert par.parse_durations([str(tmp_path / "nope.log")]) == {}


def test_test_files_discovers_this_file():
    assert "tests/test_par_pytest.py" in par.test_files()
