from database_cloner_spark.pipeline.clone import CloneConfig, ClonePipeline

__all__ = ["CloneConfig", "ClonePipeline"]
