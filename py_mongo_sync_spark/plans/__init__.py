from py_mongo_sync_spark.plans.lake import LakeTable  # noqa: F401
from py_mongo_sync_spark.plans.checkpoints import CheckpointLog  # noqa: F401
