"""Input sources: url-list readers (S1-S8) and the fetch operator (S9-S11)."""

from doc2dataset_spark.sources.reader import read_url_list  # noqa: F401
from doc2dataset_spark.sources.fetch import fetch_documents  # noqa: F401
