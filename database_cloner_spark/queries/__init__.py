"""Operator inventory modules. Importing this package registers every
query into database_cloner_spark.registry (see SURVEY.md §2)."""

from database_cloner_spark.queries import (  # noqa: F401
    flagship,
    scans,
    filters,
    aggregates,
    sorts_setops,
    scalar_funcs,
    udfs,
    joins,
    windows,
    streaming_batch,
    llm_ops,
    sampling,
    analytics_ext,
    corpus_stats,
    dataquality,
    emb_quality,
)
