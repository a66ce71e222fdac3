"""Engine function library — reusable column builders shared across
operator modules (the analogue of a UDF catalog, except almost nothing
here is a UDF: every hot-path function is a JVM column expression)."""

from database_cloner_spark.functions.vector import (  # noqa: F401
    cosine,
    cosine_topk_pandas,
    dot,
    norm,
)
