from database_cloner_spark.sources.parquet import load, table_names

__all__ = ["load", "table_names"]
