"""Round-trip tests for the clone pipeline (SURVEY.md §5.2 item 3):
clone sf0.001 -> verify fingerprints -> idempotent second run -> reports.
"""

from __future__ import annotations

import os

import pytest

from database_cloner_spark.pipeline import CloneConfig, ClonePipeline
from database_cloner_spark.pipeline.verify import diff_counts, verify_clone
from database_cloner_spark.sources.parquet import load

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def clone_run(spark, tmp_path_factory):
    target = str(tmp_path_factory.mktemp("clone_target"))
    cfg = CloneConfig(
        source_dir=SF,
        target_dir=target,
        tables="region, nation, customer,supplier",  # messy CSV on purpose
        parallelism=4,
    )
    result = ClonePipeline(spark, cfg).run()
    return cfg, result


def test_all_tables_cloned_and_verified(clone_run):
    cfg, result = clone_run
    assert result.ok
    assert result.total_count == 4
    assert {r.status for r in result.results} == {"cloned"}
    assert all(r.verified for r in result.results)


def test_clone_content_identical(spark, clone_run):
    cfg, _ = clone_run
    src = load(spark, SF, "customer")
    dst = spark.read.parquet(os.path.join(cfg.target_dir, "clone_customer.parquet"))
    assert diff_counts(src, dst) == (0, 0)
    assert verify_clone(src, dst, deep=True)["match"]


def test_second_run_is_idempotent_skip(spark, clone_run):
    cfg, _ = clone_run
    result2 = ClonePipeline(spark, cfg).run()
    assert result2.ok
    assert {r.status for r in result2.results} == {"skipped"}


def test_principals_and_grants_metadata(spark, clone_run):
    cfg, result = clone_run
    pdf = spark.read.parquet(os.path.join(cfg.target_dir, "_principals"))
    gdf = spark.read.parquet(os.path.join(cfg.target_dir, "_grants"))
    # Reference naming fidelity (clone_databases.sh:303-316).
    users = {r.user_name for r in pdf.collect()}
    assert "clone_region_user_owner" in users
    assert "clone_region_user" in users
    app_privs = {
        r.privilege
        for r in gdf.filter(
            (gdf.role_name == "app_role_clone_region") & (gdf.object_kind == "tables")
        ).collect()
    }
    assert app_privs == {"SELECT", "INSERT", "UPDATE", "DELETE"}
    owner_db_privs = {
        r.privilege
        for r in gdf.filter(
            (gdf.role_name == "owner_role_clone_region") & (gdf.object_kind == "database")
        ).collect()
    }
    assert owner_db_privs == {"CONNECT", "TEMPORARY", "CREATE"}


def test_reports_written(spark, clone_run):
    cfg, result = clone_run
    summary = spark.read.text(os.path.join(cfg.target_dir, "_credential_summary"))
    text = "\n".join(r.value for r in summary.collect())
    assert "Credential Summary" in text
    for p in result.principals:
        assert p.target_db in text
    log = spark.read.parquet(os.path.join(cfg.target_dir, "_clone_log"))
    assert log.filter(log.level == "SUCCESS").count() >= 4


def test_failed_table_isolated(spark, tmp_path):
    cfg = CloneConfig(
        source_dir=SF,
        target_dir=str(tmp_path / "t"),
        tables="region,nope_missing_table",
        parallelism=2,
    )
    result = ClonePipeline(spark, cfg).run()
    assert not result.ok
    by_name = {r.table: r for r in result.results}
    assert by_name["region"].status == "cloned"
    assert by_name["nope_missing_table"].status == "failed"


def test_partitioned_clone_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    target = str(tmp_path / "part_target")
    cfg = CloneConfig(
        source_dir=SF,
        target_dir=target,
        tables=["lineitem"],
        partition_by={"lineitem": "l_returnflag"},
        parallelism=1,
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok
    assert result.results[0].verified is True  # column-order-proof fingerprint

    clone = spark.read.parquet(os.path.join(target, "clone_lineitem.parquet"))
    pruned = clone.filter(F.col("l_returnflag") == "A")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan or (
        "PartitionFilters" in plan and "l_returnflag" in plan.split("PartitionFilters")[1][:120]
    ), f"no partition pruning:\n{plan[:1500]}"
    want = load(spark, SF, "lineitem").filter(F.col("l_returnflag") == "A").count()
    assert pruned.count() == want


def test_sorted_clone_has_tight_rowgroup_stats(spark, tmp_path):
    import pyarrow.parquet as pq

    target = str(tmp_path / "sorted_target")
    cfg = CloneConfig(
        source_dir=SF,
        target_dir=target,
        tables=["orders"],
        sort_within_partitions_by={"orders": "o_orderkey"},
        parallelism=1,
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok and result.results[0].verified is True

    # Within every output file, consecutive row groups must cover
    # non-overlapping, increasing o_orderkey ranges — the property that
    # lets a point/range predicate skip whole row groups.
    out_dir = os.path.join(target, "clone_orders.parquet")
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert files
    checked = 0
    for fname in files:
        md = pq.ParquetFile(os.path.join(out_dir, fname)).metadata
        idx = next(
            i for i in range(len(md.schema))
            if md.schema.column(i).name == "o_orderkey"
        )
        prev_max = None
        for rg in range(md.num_row_groups):
            stats = md.row_group(rg).column(idx).statistics
            assert stats.min <= stats.max
            if prev_max is not None:
                assert stats.min >= prev_max  # sorted => disjoint ranges
            prev_max = stats.max
            checked += 1
    assert checked >= len(files)


def test_admission_gate_refuses_then_proceeds(spark, tmp_path):
    """Reference clone_databases.sh:625-708: refuse to clone while the
    target has active writers; proceed once they're gone."""
    from database_cloner_spark.pipeline import admission

    target = str(tmp_path / "gated")
    cfg = CloneConfig(source_dir=SF, target_dir=target, tables=["region"])
    os.makedirs(target, exist_ok=True)
    admission.acquire(target, holder="etl-job-7", table="clone_region")

    refused = ClonePipeline(spark, cfg).run()
    assert not refused.ok
    r = refused.results[0]
    assert r.status == "failed" and "active writer" in r.error
    assert "etl-job-7" in r.error  # kill advice names the holder
    # Refusal must not have touched the target.
    assert not os.path.exists(os.path.join(target, "clone_region.parquet"))

    # Registry is queryable metadata (principals-table pattern).
    writers = admission.active_writers_df(spark, target)
    assert writers.count() == 1
    assert writers.collect()[0].holder == "etl-job-7"

    assert admission.release(target, holder="etl-job-7") == 1
    ok = ClonePipeline(spark, cfg).run()
    assert ok.ok and ok.results[0].status == "cloned"


def test_admission_gate_force_overrides(spark, tmp_path):
    from database_cloner_spark.pipeline import admission

    target = str(tmp_path / "forced")
    os.makedirs(target, exist_ok=True)
    admission.acquire(target, holder="stuck-writer", table="clone_nation")
    cfg = CloneConfig(
        source_dir=SF, target_dir=target, tables=["nation"], force=True
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok and result.results[0].status == "cloned"
    # force proceeds but does NOT clear the registry.
    assert len(admission.active_writers(target)) == 1


def test_partitioned_clone_bigint_column_verifies(spark, tmp_path):
    """ADVICE r1: partitionBy on an integer-typed column writes it into
    directory names; read-back inference returns int where the source
    was bigint, and xxhash64 is type-sensitive — verification must cast
    back to the source schema instead of reporting a false mismatch."""
    target = str(tmp_path / "bigint_part")
    cfg = CloneConfig(
        source_dir=SF,
        target_dir=target,
        tables=["nation"],
        partition_by={"nation": "n_regionkey"},  # bigint in the source
        parallelism=1,
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok
    assert result.results[0].verified is True


def test_passwords_secure_by_default_seeded_on_request():
    """ADVICE r1: default passwords come from the OS CSPRNG (two draws
    differ); a seed is an explicit reproducibility override."""
    from database_cloner_spark.pipeline.principals import make_principals

    a = make_principals("clone_db1", "clone_")
    b = make_principals("clone_db1", "clone_")
    assert a.owner_password != b.owner_password  # 1/62^16 false-fail odds
    assert a.owner_password != a.app_password

    s1 = make_principals("clone_db1", "clone_", seed=7)
    s2 = make_principals("clone_db1", "clone_", seed=7)
    assert s1.owner_password == s2.owner_password
    assert s1.app_password == s2.app_password


# -- principal probes (clone_databases.sh:480-551, :880-884) ---------------


def test_principal_probes_pass_on_healthy_clone(spark, tmp_path):
    from database_cloner_spark.pipeline import probe

    cfg = CloneConfig(
        source_dir=SF,
        target_dir=str(tmp_path / "probe_ok"),
        tables="region,nation",
        parallelism=2,
        test_user_connections=True,
        lb_host="pg-lb.internal",
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok
    frame = spark.read.parquet(os.path.join(cfg.target_dir, "_principal_probes"))
    rows = frame.collect()
    # 2 dbs x (2 connect + 1 dml + 1 ddl + 1 search_path)
    assert len(rows) == 10
    assert all(r.status == "passed" for r in rows)


def test_principal_probe_fails_when_grant_row_missing(spark, tmp_path):
    """VERDICT r2 #6 exit criterion: removing a grant row must fail the
    probe — the queryable twin of 'app user cannot connect via LB'."""
    from pyspark.sql import functions as F

    from database_cloner_spark.pipeline import probe

    cfg = CloneConfig(
        source_dir=SF,
        target_dir=str(tmp_path / "probe_bad"),
        tables="region",
        parallelism=1,
        lb_host="pg-lb.internal",
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok

    # Sabotage: drop the app role's CONNECT grant, rewrite _grants.
    gpath = os.path.join(cfg.target_dir, "_grants")
    gr = spark.read.parquet(gpath)
    cut = gr.filter(
        ~((F.col("privilege") == "CONNECT") & F.col("role_name").startswith("app_role_"))
    )
    cut.cache().count()  # materialize before overwriting the source files
    cut.repartition(1).write.mode("overwrite").parquet(gpath + "_new")
    import shutil

    shutil.rmtree(gpath)
    os.rename(gpath + "_new", gpath)

    report = probe.test_user_connections(
        spark, cfg.target_dir, enabled=True, lb_host="pg-lb.internal"
    )
    assert not report.ok
    failed = report.frame.filter("status = 'failed'").collect()
    assert any(r.probe == "connect" and r.severity == "error" for r in failed)


def test_principal_probe_skip_semantics(spark, tmp_path):
    """TEST_USER_CONNECTIONS=false and unset LB_HOST both skip cleanly."""
    from database_cloner_spark.pipeline import probe

    cfg = CloneConfig(
        source_dir=SF,
        target_dir=str(tmp_path / "probe_skip"),
        tables="region",
        parallelism=1,
        test_user_connections=False,
        lb_host="pg-lb.internal",
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok
    assert not os.path.exists(os.path.join(cfg.target_dir, "_principal_probes"))
    log = spark.read.parquet(os.path.join(cfg.target_dir, "_clone_log"))
    assert log.filter("message LIKE '%TEST_USER_CONNECTIONS=false%'").count() == 1

    toggled = probe.test_user_connections(spark, cfg.target_dir, enabled=True, lb_host=None)
    assert toggled.skipped and toggled.ok
    assert "Load balancer not configured" in toggled.skip_reason


def test_ownership_and_default_privileges_metadata(spark, clone_run):
    """CS:406-438 ownership transfer + CS:370-373 default privileges
    must be recorded as queryable metadata."""
    from pyspark.sql import functions as F

    cfg, result = clone_run
    own = spark.read.parquet(os.path.join(cfg.target_dir, "_ownership"))
    rows = {(r.object_name, r.owner) for r in own.collect()}
    for p in result.principals:
        assert (p.target_db, p.owner_user) in rows
    assert own.filter(F.col("object_kind") != "table").count() == 0

    gr = spark.read.parquet(os.path.join(cfg.target_dir, "_grants"))
    dflt = gr.filter(F.col("object_kind").startswith("default:"))
    # 7 default-privilege rules per db (tables CS:364, sequences CS:370,
    # functions CS:373), all granted to the app role
    assert dflt.count() == 7 * len(result.principals)
    assert dflt.filter(~F.col("role_name").startswith("app_role_")).count() == 0
    kinds = {
        (r.object_kind, r.privilege) for r in dflt.collect()
    }
    assert kinds == {
        ("default:tables", "SELECT"),
        ("default:tables", "INSERT"),
        ("default:tables", "UPDATE"),
        ("default:tables", "DELETE"),
        ("default:sequences", "USAGE"),
        ("default:sequences", "SELECT"),
        ("default:functions", "EXECUTE"),
    }


def test_clone_from_orc_source_converts_to_parquet(spark, tmp_path):
    """Mixed-format lake: ClonePipeline pointed at an ORC namespace acts
    as the one-pass distributed converter (SCALE.md rule 7) — auto
    worklist from *.orc, content-verified parquet clones out."""
    from database_cloner_spark.sources.orc import export_orc

    src_dir = str(tmp_path / "orc_ns")
    os.makedirs(src_dir)
    for t in ("region", "nation"):
        export_orc(load(spark, SF, t), os.path.join(src_dir, f"{t}.orc"))

    target = str(tmp_path / "orc_clone_target")
    result = ClonePipeline(
        spark,
        CloneConfig(
            source_dir=src_dir,
            target_dir=target,
            source_format="orc",
            parallelism=2,
            seed=7,
        ),
    ).run()
    assert result.ok and result.total_count == 2
    assert all(r.verified for r in result.results)

    dst = spark.read.parquet(os.path.join(target, "clone_nation.parquet"))
    src = load(spark, SF, "nation")
    assert sorted(dst.collect()) == sorted(src.collect())


def test_clone_from_mongoexport_source(spark, tmp_path):
    """source_format='mongoexport' (VERDICT r10 item 2): the pipeline
    discovers <table>.json collections, decodes extended-JSON wrappers
    IN the clone pass, and lands typed parquet that verifies."""
    from database_cloner_spark.sources.bson import orders_mongoexport
    import shutil

    src = tmp_path / "mongo_src"
    src.mkdir()
    shutil.copytree(
        orders_mongoexport(spark, SF), src / "orders.json"
    )
    target = str(tmp_path / "mongo_clone")
    cfg = CloneConfig(
        source_dir=str(src),
        target_dir=target,
        source_format="mongoexport",
    )
    result = ClonePipeline(spark, cfg).run()
    assert result.ok and result.total_count == 1
    landed = spark.read.parquet(os.path.join(target, "clone_orders.parquet"))
    dt = dict(landed.dtypes)
    assert dt["placed"] == "timestamp"       # $date decoded
    assert dt["total_cents"] == "bigint"     # $numberLong decoded
    assert dt["payload"] == "binary"         # $binary decoded
    assert landed.count() == load(spark, SF, "orders").count()
