from data_pipelines_spark.functions.normalize import (  # noqa: F401
    bout_id,
    height_to_cm,
    id_from_url,
    normalize_date,
    normalize_id,
    normalize_result,
    normalize_url,
    slugify,
)
from data_pipelines_spark.functions.hashing import (  # noqa: F401
    bucket_id,
    change_flag,
    content_hash,
)
