"""Post-clone principal probes — the reference's user-connection tests.

The reference validates each provisioned principal by CONNECTING as it
through the load balancer and running probe queries
(clone_databases.sh:480-551): `SELECT 1` as the app user, a DML probe
against `information_schema.tables`, `SELECT 1` + a DDL probe as the
owner user, and a `SHOW search_path` sanity check; the Mongo path gates
the whole thing behind TEST_USER_CONNECTIONS (:880-884) and routes via
MONGO_USER_CONNSTRING_TEMPLATE when set (:904-916).

Spark has no auth endpoint, and this engine models grants as DATA
(pipeline/principals.py). So "can principal X do Y" is a QUERY over the
written `_principals` / `_grants` metadata joined with the cloned
namespace catalog — the same assertion the reference makes, answered
from the grant matrix instead of a live socket. Failure semantics
mirror the reference: a failed connect probe is an ERROR (fails the
test, :519/:538 `return 1`), a failed DML/DDL/search-path probe is a
WARNING (:513/:532/:547 log_warning, no early return).

All probes run in ONE Spark job over the two tiny metadata frames
(broadcast-joined); nothing here scales with data volume, so the probe
cost is constant whether the clone was 10 MB or 100 TB.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_cloner_spark.sources.parquet import table_names

# (probe name, user_kind it applies to, object_kind, privilege, severity
# on failure). Severities follow clone_databases.sh:480-551.
PROBES = (
    # psql -c "SELECT 1" as each user: the user must exist and its role
    # must hold CONNECT on the database (:504-506, :523-525).
    ("connect", "app", "database", "CONNECT", "error"),
    ("connect", "owner", "database", "CONNECT", "error"),
    # App-user DML probe: SELECT over the cloned schema's tables (:510-512).
    ("dml_select", "app", "tables", "SELECT", "warning"),
    # Owner-user DDL probe: CREATE on the schema (:529-531).
    ("ddl_create", "owner", "schema", "CREATE", "warning"),
)


@dataclass
class ProbeReport:
    ok: bool  # False iff any error-severity probe failed
    frame: DataFrame  # one row per (target_db, user_name, probe, status)
    rows: list | None = None  # the frame, collected ONCE (bounded: ~5/db)
    skipped: bool = False
    skip_reason: str | None = None


def principal_probe_frame(
    spark: SparkSession, target_dir: str, db_prefix: str = "clone_"
) -> DataFrame:
    """One row per (target_db, user_name, probe) with status passed /
    failed — the queryable analogue of the reference's per-user probe
    log lines. Pure DataFrame ops over the metadata tables:

      principals ⋈ grants on (target_db, granted_role=role_name)
      ⟕ expected-probe matrix, missing grant row => failed.

    The DML probe additionally requires the cloned table to actually be
    present in the namespace (the reference's information_schema.tables
    count, :511): a grant on a table that never landed is a failure.
    """
    pr = spark.read.parquet(os.path.join(target_dir, "_principals"))
    gr = spark.read.parquet(os.path.join(target_dir, "_grants"))

    # Which target dbs actually materialized in the namespace (catalog
    # scan, the information_schema analogue).
    present = {
        t for t in table_names(target_dir) if t.startswith(db_prefix)
    }
    probes = spark.createDataFrame(
        list(PROBES), "probe string, user_kind string, object_kind string, privilege string, severity string"
    )

    # Every (principal, applicable probe) pair, then left-join the grant
    # matrix; a missing grant row means the probe fails.
    expected = pr.join(F.broadcast(probes), on="user_kind", how="inner")
    # A left join keeps `privilege` from the left side either way, so the
    # miss is detected via a marker column carried on the right:
    granted = expected.join(
        F.broadcast(
            gr.withColumnRenamed("role_name", "granted_role").withColumn(
                "grant_ok", F.lit(True)
            )
        ),
        on=["target_db", "granted_role", "object_kind", "privilege"],
        how="left_outer",
    ).fillna(False, subset=["grant_ok"])

    table_present = F.col("target_db").isin(list(present)) if present else F.lit(False)
    status = F.when(
        F.col("grant_ok") & (
            (F.col("probe") != F.lit("dml_select")) | table_present
        ),
        F.lit("passed"),
    ).otherwise(F.lit("failed"))
    return granted.select(
        "target_db",
        "user_name",
        "user_kind",
        "probe",
        "severity",
        status.alias("status"),
    )


def search_path_probe_frame(spark: SparkSession, target_dir: str) -> DataFrame:
    """`SHOW search_path` analogue (:544-548): the app user's implied
    schema (the owner user's name, per the reference's schema-per-owner
    layout) must belong to a provisioned owner principal of the SAME
    target db. Warning-severity."""
    pr = spark.read.parquet(os.path.join(target_dir, "_principals"))
    apps = pr.filter(F.col("user_kind") == "app")
    owners = pr.filter(F.col("user_kind") == "owner").select(
        "target_db", F.col("user_name").alias("schema_name")
    )
    # app user "<db>_user" resolves schema "<db>_user_owner"
    expected_schema = F.concat(F.col("user_name"), F.lit("_owner"))
    joined = apps.withColumn("want_schema", expected_schema).join(
        F.broadcast(owners).withColumn("schema_ok", F.lit(True)),
        on=[
            apps.target_db == owners.target_db,
            expected_schema == owners.schema_name,
        ],
        how="left_outer",
    )
    return joined.select(
        apps.target_db.alias("target_db"),
        apps.user_name.alias("user_name"),
        F.lit("app").alias("user_kind"),
        F.lit("search_path").alias("probe"),
        F.lit("warning").alias("severity"),
        F.when(F.col("schema_ok"), F.lit("passed"))
        .otherwise(F.lit("failed"))
        .alias("status"),
    )


def test_user_connections(
    spark: SparkSession,
    target_dir: str,
    db_prefix: str = "clone_",
    enabled: bool = True,
    lb_host: str | None = None,
) -> ProbeReport:
    """Run every probe; the reference's skip semantics are preserved:
    TEST_USER_CONNECTIONS=false (:880-884) and unset LB_HOST (:495-498)
    both skip cleanly with a log line, succeeding."""
    if not enabled:
        return ProbeReport(
            ok=True, frame=None, skipped=True,
            skip_reason="User connection testing skipped (TEST_USER_CONNECTIONS=false)",
        )
    if not lb_host:
        return ProbeReport(
            ok=True, frame=None, skipped=True,
            skip_reason="Load balancer not configured. Skipping user connection testing.",
        )
    frame = principal_probe_frame(spark, target_dir, db_prefix).unionByName(
        search_path_probe_frame(spark, target_dir)
    )
    # Evaluate the probe DAG exactly ONCE: ~5 rows per cloned db, so the
    # collect is bounded metadata; ok/logging/persistence all derive
    # from these rows instead of re-running the joins per consumer.
    rows = frame.collect()
    n_errors = sum(
        1 for r in rows if r.status == "failed" and r.severity == "error"
    )
    return ProbeReport(ok=n_errors == 0, frame=frame, rows=rows)
