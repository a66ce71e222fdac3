"""Crash-freedom smoke for the rows-only (✗-oracle) keys on nasty data.

The hash-compared keys get full oracle parity on the adversarial
fixtures; the rows-only keys (sketch signatures, IVF/PQ recall paths,
language ID, random strings, binary manifests) have no oracle to
compare against — but they must still be TOTAL: a combined namespace of
every nasty table (empty/CJK/emoji documents, malformed-JSON events,
NULL-ridden relational tables, zero/empty/NULL vectors) must not crash
any of them. This is the net that would have caught the ANSI-mode
divide-by-zero in the IVF/PQ tier had the cosine fix not already landed
via the oracled keys.
"""

from __future__ import annotations

import pytest

from database_cloner_spark.registry import specs
from tests import (
    test_adversarial_docs,
    test_adversarial_embeddings,
    test_adversarial_events,
    test_adversarial_relational,
)

_EXEMPT: dict[str, str] = {
    # (goal state: empty)
}


@pytest.fixture(scope="module")
def nasty_all_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nasty_all"))
    test_adversarial_docs.write_fixture(d)
    test_adversarial_events.write_fixture(d)
    test_adversarial_relational.write_fixture(d)
    test_adversarial_embeddings.write_fixture(d)
    return d


_ROWS_ONLY = sorted(k for k, s in specs().items() if s.oracle is None)


def test_rows_only_inventory():
    # q_text_langid graduated to a full two-phase oracle in round 5;
    # q_dedup_minhash / q_dedup_simhash / q_sim_ivf_topk graduated in
    # round 10 (portable-hash re-base; seeded IVF deterministic
    # replay), then q_sim_topk_pandas (exact integer-grid scoring),
    # q_dedup_embedding_bucketed (seeded cells + deterministic max)
    # and q_rand_string (portable MINSTD mixer) later the same round.
    # Round 11 graduated the whole Lloyd family — q_sim_pq_topk /
    # q_sim_ivfpq_topk / q_sim_ivf_kmeans_topk — by re-basing means
    # onto the exact integer grid (VERDICT r10 item 4). Round 12
    # graduated q_pack_bins (recursive-CTE FFD replay) and
    # q_scan_binary (read_blob + md5-over-hex manifest), VERDICT r11
    # item 4. What remains is irreducible BY DESIGN: the deliberate
    # Python-UDF password surface (q_udf_password).
    assert sorted(_ROWS_ONLY) == ["q_udf_password"], _ROWS_ONLY


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_total_on_nasty_input(spark, nasty_all_dir, name):
    if name in _EXEMPT:
        pytest.skip(_EXEMPT[name])
    df = specs()[name].builder(spark, nasty_all_dir)
    assert df.count() >= 0  # force full execution; totality is the assertion


def test_clone_pipeline_total_on_nasty_namespace(spark, nasty_all_dir, tmp_path):
    """The reference's main surface must survive the nasty namespace
    end-to-end: clone every nasty table with content verification ON
    (fingerprints over NULL-ridden, unicode, NULL-timestamp data) and
    succeed for all of them."""
    from database_cloner_spark.pipeline import CloneConfig, ClonePipeline

    result = ClonePipeline(
        spark,
        CloneConfig(
            source_dir=nasty_all_dir,
            target_dir=str(tmp_path / "nasty_clone"),
            verify_clone=True,
            parallelism=4,
            seed=3,
        ),
    ).run()
    assert result.ok, [(r.table, r.status, r.error) for r in result.results]
    assert result.total_count == 10  # documents+events+7 relational+embeddings
    assert all(r.verified for r in result.results)
