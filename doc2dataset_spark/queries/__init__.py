"""Declared query surface: importing this package populates the registry."""

from doc2dataset_spark.queries.core import (  # noqa: F401
    REGISTRY,
    QuerySpec,
    all_oracles,
    all_queries,
    query,
)

# each import registers its queries
from doc2dataset_spark.queries import relational  # noqa: F401, E402
from doc2dataset_spark.queries import windows  # noqa: F401, E402

try:  # optional modules land in later phases; never break the registry
    from doc2dataset_spark.queries import textops  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import dedup  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import similarity  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import udfs  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import pipeline_demo  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import multimodal_demo  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import scale  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import extras  # noqa: F401
except ImportError:  # pragma: no cover
    pass
try:
    from doc2dataset_spark.queries import ml  # noqa: F401
except ImportError:  # pragma: no cover
    pass
