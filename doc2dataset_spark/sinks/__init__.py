"""Output sinks (reference W1-W8, `writer.py`)."""

from doc2dataset_spark.sinks.writer import write_output, SINKS  # noqa: F401
