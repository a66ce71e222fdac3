"""BENCH_DETAIL.json carry-forward robustness (r12 ADVICE).

bench.py merges "foreign" sections (sf1_derived, streaming_throughput, ...)
from the previous detail file into each rewrite. A corrupt or partially
written file — including one whose top-level JSON value is an array or
string — must be treated as absent, never crash the bench run.
"""

import json
import os

from bench import load_prev_detail


def _write(tmp_path, payload: str) -> str:
    p = os.path.join(str(tmp_path), "BENCH_DETAIL.json")
    with open(p, "w") as fh:
        fh.write(payload)
    return p


def test_missing_file_is_absent(tmp_path):
    assert load_prev_detail(os.path.join(str(tmp_path), "nope.json")) == (0, {})


def test_invalid_json_is_absent(tmp_path):
    assert load_prev_detail(_write(tmp_path, "{truncated")) == (0, {})


def test_top_level_array_is_absent(tmp_path):
    # Pre-fix this raised AttributeError (list.get) and killed the run.
    assert load_prev_detail(_write(tmp_path, "[1, 2, 3]")) == (0, {})


def test_top_level_string_is_absent(tmp_path):
    assert load_prev_detail(_write(tmp_path, json.dumps("oops"))) == (0, {})


def test_non_dict_run_section_keeps_foreign(tmp_path):
    p = _write(tmp_path, json.dumps({"run": [1], "sf1_derived": {"x": 1}}))
    seq, foreign = load_prev_detail(p)
    assert seq == 0
    assert foreign == {"sf1_derived": {"x": 1}}


def test_normal_carry_forward(tmp_path):
    p = _write(
        tmp_path,
        json.dumps(
            {
                "run": {"seq": 7},
                "sf": 0.1,  # owned section: must NOT be carried forward
                "sf1_derived": {"per_key": {}},
            }
        ),
    )
    seq, foreign = load_prev_detail(p)
    assert seq == 7
    assert foreign == {"sf1_derived": {"per_key": {}}}
