from data_pipelines_spark.lake.table import (  # noqa: F401
    ConcurrentCommitError,
    LakeTable,
    MergeStats,
    SchemaEvolutionError,
)
from data_pipelines_spark.lake.cascade import (  # noqa: F401
    Cascade,
    CascadeLagError,
)
