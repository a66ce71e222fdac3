"""File-based source tests: delimited credentials, kv config, catalog."""

from __future__ import annotations

import os

from database_cloner_spark import catalog
from database_cloner_spark.sources.delimited import (
    MONGO_CREDENTIAL_SCHEMA,
    read_credentials,
)
from database_cloner_spark.sources.kv_config import read_config, read_kv_df


def test_read_pg_credentials(spark, tmp_path):
    p = tmp_path / "creds.txt"
    p.write_text(
        "clone_db1:clone_db1_user_owner:Pw1:clone_db1_user:Pw2\n"
        "clone_db2:clone_db2_user_owner:Pw3:clone_db2_user:Pw4\n"
    )
    df = read_credentials(spark, str(p))
    rows = {r.target_db: r for r in df.collect()}
    assert rows["clone_db1"].owner_user == "clone_db1_user_owner"
    assert rows["clone_db2"].app_password == "Pw4"


def test_read_mongo_credentials(spark, tmp_path):
    p = tmp_path / "mcreds.txt"
    p.write_text("clone_m1:clone_m1_user:Secret\n")
    df = read_credentials(spark, str(p), MONGO_CREDENTIAL_SCHEMA)
    r = df.collect()[0]
    assert (r.target_db, r.username, r.password) == ("clone_m1", "clone_m1_user", "Secret")


def test_kv_config(spark, tmp_path):
    p = tmp_path / "clone.conf"
    p.write_text(
        "# PostgreSQL Database Cloning Configuration\n"
        "\n"
        'PG_HOST="pg-lb.internal"\n'
        "PG_PORT=5432\n"
        "DATABASES_TO_CLONE=db1, db2 ,db3\n"
        'DB_PREFIX="clone_"\n'
        "EMPTY_OK=\n"
    )
    kv = {r.key: r.value for r in read_kv_df(spark, str(p)).collect()}
    assert kv["PG_HOST"] == "pg-lb.internal"  # quotes stripped
    assert kv["PG_PORT"] == "5432"
    assert kv["DATABASES_TO_CLONE"] == "db1, db2 ,db3"

    conf = read_config(spark, str(p), required=("PG_HOST", "DB_PREFIX"))
    assert conf["DB_PREFIX"] == "clone_"

    try:
        read_config(spark, str(p), required=("PG_HOST", "MISSING_KEY"))
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "MISSING_KEY" in str(e)


def test_catalog_tables_and_columns(spark):
    sf = "/root/testdata/sf0.001"
    tdf = catalog.tables_df(spark, sf)
    names = {r.tablename for r in tdf.collect()}
    assert {"region", "nation", "lineitem"} <= names
    assert catalog.table_exists(sf, "region")
    assert not catalog.table_exists(sf, "nope")

    cdf = catalog.columns_df(spark, sf)
    li_cols = [r.column_name for r in cdf.filter(cdf.table_name == "lineitem").collect()]
    assert "l_orderkey" in li_cols and len(li_cols) == 11
