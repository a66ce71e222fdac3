"""Live-server integration smoke suite (VERDICT r12 item 7).

Exercises the JDBC seams tests/test_jdbc.py can only contract-test:
partitioned read, batched restore, and server_side_clone_sql DDL
parity against a REAL PostgreSQL. Every test skips cleanly unless a
server is reachable AND the JDBC driver class is on the Spark
classpath, so the suite is a no-op in the serverless sandbox and turns
on by itself in the deploy/docker-compose.yml environment:

    docker compose -f deploy/docker-compose.yml up -d
    curl -fLo /tmp/postgresql.jar \
        https://jdbc.postgresql.org/download/postgresql-42.7.4.jar
    PYSPARK_SUBMIT_ARGS="--jars /tmp/postgresql.jar pyspark-shell" \
        python -m pytest tests/test_deploy_integration.py -v

Run this file ALONE: the driver jar must ride the FIRST SparkSession
of the process (the suite's session fixture is process-wide).

The MongoDB live path is deliberately NOT tested here: reading a live
collection through Spark needs the mongo-spark connector jar and raw
.bson decode needs pymongo (sources/bson.py's documented seam); the
executable ingestion contract (mongoexport extended JSON) is fully
covered serverless in tests/test_sources.py. The compose file still
provisions mongod so a deployer holding those jars can extend this
file in place.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

from database_cloner_spark.sources import jdbc

PG_URL = os.environ.get(
    "DCS_PG_URL", "jdbc:postgresql://localhost:5432/appdb"
)
PG_USER = os.environ.get("DCS_PG_USER", "clone_runner")
PG_PASSWORD = os.environ.get("DCS_PG_PASSWORD", "clone_dev_pw")


def _host_port(jdbc_url: str) -> tuple[str, int]:
    rest = jdbc_url.split("://", 1)[1]
    hostport = rest.split("/", 1)[0]
    host, _, port = hostport.partition(":")
    return host, int(port or 5432)


def _reachable(jdbc_url: str) -> bool:
    try:
        with socket.create_connection(_host_port(jdbc_url), timeout=1.0):
            return True
    except OSError:
        return False


def _driver_loaded(spark) -> bool:
    try:
        spark._sc._jvm.java.lang.Class.forName("org.postgresql.Driver")
        return True
    except Exception:  # noqa: BLE001  (py4j wraps ClassNotFoundException)
        return False


@pytest.fixture(scope="module")
def pg(spark):
    """The gate: a live server AND the driver jar, else skip."""
    if not _reachable(PG_URL):
        pytest.skip(f"no PostgreSQL at {PG_URL} (deploy/docker-compose.yml)")
    if not _driver_loaded(spark):
        pytest.skip(
            "org.postgresql.Driver not on the Spark classpath "
            "(PYSPARK_SUBMIT_ARGS=\"--jars postgresql.jar pyspark-shell\")"
        )
    return jdbc.JdbcTarget(url=PG_URL, user=PG_USER, password=PG_PASSWORD)


@pytest.fixture()
def pg_conn(spark, pg):
    """Raw driver connection for DDL/verification (autocommit — CREATE
    DATABASE cannot run inside a transaction block)."""
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    props.setProperty("user", pg.user)
    props.setProperty("password", pg.password)
    conn = jvm.java.sql.DriverManager.getConnection(pg.url, props)
    conn.setAutoCommit(True)
    yield conn
    conn.close()


def _exec(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.execute(sql)
    finally:
        st.close()


def _query_one(conn, sql: str):
    st = conn.createStatement()
    try:
        rs = st.executeQuery(sql)
        rs.next()
        return rs.getObject(1)
    finally:
        st.close()


def test_partitioned_read_roundtrip(spark, pg, pg_conn):
    """save_table -> load_table with a JdbcPartitionSpec: values round-
    trip exactly and the scan actually arrives in num_partitions range
    slices (the whole point of refusing unpartitioned reads)."""
    from pyspark.sql import functions as F

    table = f"dcs_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.concat(F.lit("row-"), F.col("id").cast("string")).alias("s"),
    )
    try:
        jdbc.save_table(df, pg, table, mode="overwrite")
        spec = jdbc.JdbcPartitionSpec(
            column="k", lower_bound=0, upper_bound=1000, num_partitions=4
        )
        back = jdbc.load_table(spark, pg, table, spec)
        assert back.rdd.getNumPartitions() == 4
        assert back.count() == 1000
        assert back.agg(F.sum("v")).head()[0] == 999 * 1000
        sample = {r.k: r.s for r in back.filter(F.col("k") < 3).collect()}
        assert sample == {0: "row-0", 1: "row-1", 2: "row-2"}
    finally:
        _exec(pg_conn, f'DROP TABLE IF EXISTS "{table}"')


def test_batched_restore_appends(spark, pg, pg_conn):
    """write_options' batched insert path: overwrite then append — the
    restore semantics the pipeline's jdbc_target leg uses."""
    table = f"dcs_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 500).withColumnRenamed("id", "k")
    try:
        jdbc.save_table(df, pg, table, mode="overwrite")
        jdbc.save_table(df, pg, table, mode="append")
        n = _query_one(pg_conn, f'SELECT COUNT(*) FROM "{table}"')
        assert int(str(n)) == 1000
    finally:
        _exec(pg_conn, f'DROP TABLE IF EXISTS "{table}"')


def test_server_side_clone_ddl_executes(spark, pg, pg_conn):
    """server_side_clone_sql (the reference's CREATE DATABASE ...
    TEMPLATE fast path, clone_databases.sh:245-246) must be accepted
    verbatim by a real server and produce the clone."""
    src = f"dcs_tpl_src_{uuid.uuid4().hex[:8]}"
    dst = f"dcs_tpl_dst_{uuid.uuid4().hex[:8]}"
    try:
        _exec(pg_conn, f'CREATE DATABASE "{src}"')
        _exec(pg_conn, jdbc.server_side_clone_sql(src, dst))
        n = _query_one(
            pg_conn,
            "SELECT COUNT(*) FROM pg_database "
            f"WHERE datname = '{dst}'",
        )
        assert int(str(n)) == 1
    finally:
        _exec(pg_conn, f'DROP DATABASE IF EXISTS "{dst}"')
        _exec(pg_conn, f'DROP DATABASE IF EXISTS "{src}"')


def test_clone_pipeline_jdbc_dump(spark, pg, pg_conn, tmp_path):
    """End-to-end jdbc->parquet dump through ClonePipeline: the live
    read lands as parquet with identical content (the mongodump/
    pg_dump analogue the sandbox could only monkeypatch)."""
    from pyspark.sql import functions as F

    from database_cloner_spark.pipeline.clone import (
        CloneConfig,
        ClonePipeline,
    )

    table = f"dcs_smoke_{uuid.uuid4().hex[:8]}"
    df = spark.range(0, 800).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp")
    )
    try:
        jdbc.save_table(df, pg, table, mode="overwrite")
        cfg = CloneConfig(
            source_dir=str(tmp_path / "unused_src"),
            target_dir=str(tmp_path / "tgt"),
            source_format="jdbc",
            tables=table,
            jdbc_source=pg,
            jdbc_partition={
                table: jdbc.JdbcPartitionSpec(
                    column="k", lower_bound=0, upper_bound=800,
                    num_partitions=4,
                )
            },
            verify_clone=False,
            overwrite=True,
        )
        run = ClonePipeline(spark, cfg).run()
        assert sum(r.rows for r in run.results) == 800
        back = spark.read.parquet(
            os.path.join(str(tmp_path / "tgt"), f"{table}.parquet")
        )
        assert back.count() == 800
        assert back.agg(F.sum("k")).head()[0] == 799 * 800 // 2
    finally:
        _exec(pg_conn, f'DROP TABLE IF EXISTS "{table}"')
