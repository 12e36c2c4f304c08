"""Pipeline operators: sharding/keys, extraction, filters, stats."""

from doc2dataset_spark.operators.sharding import (  # noqa: F401
    assign_keys,
    filter_done_shards,
)
from doc2dataset_spark.operators.extract import extract_pages  # noqa: F401
from doc2dataset_spark.operators.filters import apply_page_filters  # noqa: F401
from doc2dataset_spark.operators.stats import shard_stats  # noqa: F401
