"""database_cloner_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``esaddk/database-cloner`` (a bash batch-ETL orchestrator that clones
PostgreSQL/MongoDB databases, provisions users/grants, and verifies the
result), rebuilt as an idiomatic Spark DataFrame/SQL engine:

- every computation the reference performs (catalog probes, filtered
  counts, existence checks, credential parsing, report sinks) is a
  declarative DataFrame plan optimized by Catalyst;
- the clone pipeline itself is a distributed read->write job graph with
  writer-side namespace rename, idempotence guards, and row-level
  verification (the reference only existence-checks, SURVEY.md tier [V]);
- the north-star extensions (windows, streaming over `events`,
  LLM-data-pipeline dedup/similarity/text ops) are first-class operators.

See SURVEY.md for the full operator inventory and reference citations.
"""

from database_cloner_spark.session import get_spark
from database_cloner_spark.registry import all_queries, all_oracles, get_query

__all__ = ["get_spark", "all_queries", "all_oracles", "get_query"]
__version__ = "0.1.0"
