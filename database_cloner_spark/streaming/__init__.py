from database_cloner_spark.streaming.source import events_stream
from database_cloner_spark.streaming import ops

__all__ = ["events_stream", "ops"]
