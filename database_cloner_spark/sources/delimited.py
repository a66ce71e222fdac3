"""`:`-delimited credential-record source (clone_databases.sh:574,:972).

The reference parses two record shapes from its temp credential files:
  PG    (5 fields): target_db:owner_user:owner_password:app_user:app_password
  Mongo (3 fields): target_db:username:password

spark.read.csv with sep=':' — a real distributed text source (splittable,
schema-typed), not a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PG_CREDENTIAL_SCHEMA = T.StructType(
    [
        T.StructField("target_db", T.StringType()),
        T.StructField("owner_user", T.StringType()),
        T.StructField("owner_password", T.StringType()),
        T.StructField("app_user", T.StringType()),
        T.StructField("app_password", T.StringType()),
    ]
)

MONGO_CREDENTIAL_SCHEMA = T.StructType(
    [
        T.StructField("target_db", T.StringType()),
        T.StructField("username", T.StringType()),
        T.StructField("password", T.StringType()),
    ]
)


def read_credentials(
    spark: SparkSession, path: str, schema: T.StructType = PG_CREDENTIAL_SCHEMA
) -> DataFrame:
    return spark.read.csv(path, sep=":", schema=schema)
