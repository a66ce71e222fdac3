"""Report & log sinks.

The reference's text artifacts: per-database password files
(clone_databases.sh:447-470), the credential summary (:554-609 PG,
:952-1005 Mongo), and the append-only timestamped log (:24-34).

Report files are small and format-exact, so they are composed driver-side
and written through a single-partition text sink (repartition(1)); the LOG
is the scalable one — an append parquet sink that Structured Streaming
can also feed (the [X] streaming tier shares it via foreachBatch).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from database_cloner_spark.pipeline.principals import DbPrincipals


def password_file_lines(p: DbPrincipals, host: str, port: int, generated_on: str) -> list[str]:
    """Format-faithful password file (clone_databases.sh:447-470)."""
    return [
        "PostgreSQL Database Cloning - Generated Passwords",
        f"Generated on: {generated_on}",
        f"Database: {p.target_db}",
        "===============================================",
        "",
        "App User (DML only):",
        f"Username: {p.app_user}",
        f"Password: {p.app_password}",
        "",
        "Schema Owner (DDL + DML):",
        f"Username: {p.owner_user}",
        f"Password: {p.owner_password}",
        "",
        "Connection Details:",
        f"Host: {host}",
        f"Port: {port}",
        f"Database: {p.target_db}",
        "",
        "Roles assigned:",
        f"- {p.app_user} -> {p.app_role}",
        f"- {p.owner_user} -> {p.owner_role}",
    ]


def credential_record(p: DbPrincipals) -> str:
    """The 5-field `:`-record (clone_databases.sh:476)."""
    return f"{p.target_db}:{p.owner_user}:{p.owner_password}:{p.app_user}:{p.app_password}"


def write_text_report(spark: SparkSession, lines: list[str], path: str, append: bool = False) -> None:
    """Text-report sink. Single logical file (reports are human-read);
    mode append accumulates across runs like `>>`."""
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    # repartition(1), NOT coalesce(1): coalescing a driver-parallelized
    # frame makes ONE task fetch every pickled slice from the driver
    # (~5s for a 25-line file, measured); the single-round shuffle is
    # ~8x faster and the file is identical.
    df.repartition(1).write.mode("append" if append else "overwrite").text(path)


class LogSink:
    """Append-only timestamped log (clone_databases.sh:24-34) as a
    parquet sink: (ts, level, message). Buffered per flush so each batch
    is one small append job; readable back as a DataFrame for the
    §2.1 write_log surface."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._buf: list[tuple[str, str, str]] = []

    def log(self, level: str, message: str) -> None:
        ts = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M:%S")
        self._buf.append((ts, level, message))

    def info(self, message: str) -> None:
        self.log("INFO", message)

    def error(self, message: str) -> None:
        self.log("ERROR", message)

    def warning(self, message: str) -> None:
        self.log("WARNING", message)

    def success(self, message: str) -> None:
        self.log("SUCCESS", message)

    def flush(self) -> None:
        if not self._buf:
            return
        df = self.spark.createDataFrame(self._buf, "ts string, level string, message string")
        # repartition, not coalesce — see write_text_report.
        df.repartition(1).write.mode("append").parquet(self.path)
        self._buf = []

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)


def credential_summary_lines(
    sets: list[DbPrincipals], host: str, port: int, generated_on: str
) -> list[str]:
    """The end-of-run credential summary (clone_databases.sh:554-609):
    header + one block per database, in work-list order."""
    lines = [
        "Database Cloning - Credential Summary",
        f"Generated on: {generated_on}",
        "=" * 47,
        "",
    ]
    for p in sets:
        lines += [
            f"Database: {p.target_db}",
            f"  Owner: {p.owner_user} / {p.owner_password}",
            f"  App:   {p.app_user} / {p.app_password}",
            f"  URI:   postgresql://{p.app_user}:****@{host}:{port}/{p.target_db}",
            "",
        ]
    return lines
