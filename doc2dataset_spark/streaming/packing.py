"""Streaming sequence packing: the batch ``pack_sequences`` operator
(queries/pipeline_extras.py) as an incremental stateful stream — documents
arrive in micro-batches and are appended to their shard's running token
offset, so packed training sequences grow continuously as ingest proceeds
(the "pack as you crawl" shape a live corpus pipeline needs, instead of a
nightly batch re-pack of everything ever crawled).

State is one bigint per shard — the shard's next free token offset —
checkpointed by Spark's state store. Output is append-mode: each doc's
(seq_id, start_off) is final the moment it is emitted, because offsets
within a shard only ever grow. Equality with the batch operator holds
whenever per-shard arrival order is doc_id order (the generator's
append-order contract); the test drives two out-of-the-box micro-batches
through a restartable checkpoint to pin exactly that.

Scale: state is O(PACK_SHARDS) bigints — nothing buffers documents; each
micro-batch shuffles once on the shard key, identical to the batch
window's exchange.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from doc2dataset_spark.queries.pipeline_extras import PACK_BUDGET, PACK_SHARDS
from doc2dataset_spark.queries.textops import _TOKS

OUTPUT_SCHEMA = (
    "doc_id bigint, shard bigint, n_tokens int, start_off bigint, "
    "seq_id bigint"
)
STATE_SCHEMA = "next_off bigint"


def pack_fn(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-shard offset accumulator: assign each arriving doc the next
    start offset, in doc_id order within the micro-batch."""
    (shard,) = key
    (next_off,) = state.get if state.exists else (0,)
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values("doc_id", ignore_index=True)
    # vectorized running offsets: start_off[i] = next_off + sum(n[:i])
    toks = batch["n_tokens"].astype("int64")
    offs = next_off + toks.cumsum().shift(1, fill_value=0)
    state.update((int(next_off + toks.sum()),))
    yield pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "shard": shard,
            "n_tokens": batch["n_tokens"],
            "start_off": offs,
            "seq_id": offs // PACK_BUDGET,
        }
    )


def pack_stream(docs: DataFrame) -> DataFrame:
    """documents stream → packed-sequence assignments. Token counting
    stays a JVM expression; only the narrow (doc_id, shard, n_tokens)
    projection crosses into Python."""
    prepped = docs.select(
        "doc_id",
        F.expr(f"doc_id % {PACK_SHARDS}").alias("shard"),
        F.size(F.expr(_TOKS)).alias("n_tokens"),
    )
    return prepped.groupBy("shard").applyInPandasWithState(
        pack_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_documents(spark: SparkSession, docs_dir: str, schema=None) -> DataFrame:
    """readStream over a directory of documents parquet files, one file
    per micro-batch (maxFilesPerTrigger=1) so multi-batch state handoff
    is exercised; file order is mtime order, the Spark file source's
    default."""
    if schema is None:
        schema = spark.read.parquet(docs_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_dir)
    )
