from py_mongo_sync_spark.streaming.pipeline import CdcPipeline  # noqa: F401
