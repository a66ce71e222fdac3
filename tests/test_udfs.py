"""Property tests for the non-oracle-checkable UDF surface
(SURVEY.md §5.2 item 4)."""

from __future__ import annotations

import re

from database_cloner_spark.queries.udfs import q_udf_password


def test_password_properties(spark, sf_dir):
    rows = q_udf_password(spark, sf_dir).collect()
    assert len(rows) == 25
    for r in rows:
        assert len(r.owner_password) == 16
        assert re.fullmatch(r"[A-Za-z0-9]{16}", r.owner_password)


def test_password_deterministic_per_seed(spark, sf_dir):
    a = {r.target_db: r.owner_password for r in q_udf_password(spark, sf_dir).collect()}
    b = {r.target_db: r.owner_password for r in q_udf_password(spark, sf_dir).collect()}
    assert a == b


def test_mask_never_leaks_password(spark, sf_dir):
    from database_cloner_spark.registry import get_query

    masked = [r.masked for r in get_query("q_str_mask").builder(spark, sf_dir).collect()]
    for m in masked:
        assert "s3cret" not in m
        assert "****:****@" in m


def test_rand_string_expression_properties(spark, sf_dir):
    from database_cloner_spark.registry import get_query

    build = get_query("q_rand_string").builder
    a = {r.target_db: r.password for r in build(spark, sf_dir).collect()}
    assert len(a) == 25
    for pw in a.values():
        assert re.fullmatch(r"[A-Za-z0-9]{16}", pw)
    # deterministic across runs AND across repartitioning (hash-keyed,
    # unlike rand())
    b = {r.target_db: r.password for r in build(spark, sf_dir).collect()}
    assert a == b
    assert len(set(a.values())) == 25  # no collisions across keys
