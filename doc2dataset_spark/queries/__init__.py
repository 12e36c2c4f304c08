"""Declared query surface: importing this package populates the registry.

Every query module imports UNCONDITIONALLY: each one depends only on
pyspark + baked-in libs (pandas/numpy), so any ImportError here is a real
defect (syntax error, broken transitive import) and must crash the
registry load rather than silently shrink the query surface the driver
gates on. Optional heavy codecs (PIL, fitz, pycld2 …) are import-gated at
CALL time inside operators/, never at module import time — keep it that
way when adding modules.
"""

from doc2dataset_spark.queries.core import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    all_oracles,
    all_queries,
    query,
)

# each import registers its queries; order groups related surfaces
from doc2dataset_spark.queries import relational  # noqa: F401, E402
from doc2dataset_spark.queries import windows  # noqa: F401, E402
from doc2dataset_spark.queries import textops  # noqa: F401, E402
from doc2dataset_spark.queries import dedup  # noqa: F401, E402
from doc2dataset_spark.queries import similarity  # noqa: F401, E402
from doc2dataset_spark.queries import udfs  # noqa: F401, E402
from doc2dataset_spark.queries import pipeline_demo  # noqa: F401, E402
from doc2dataset_spark.queries import multimodal_demo  # noqa: F401, E402
from doc2dataset_spark.queries import scale  # noqa: F401, E402
from doc2dataset_spark.queries import extras  # noqa: F401, E402
from doc2dataset_spark.queries import ml  # noqa: F401, E402
