"""Q36 — the Python UDF surface (SURVEY §2.3): every Python-boundary flavor
the pipeline relies on, each verified against a pure-SQL DuckDB oracle so
the Arrow plumbing itself is what's being tested.

- ``q36_pandas_udf``     vectorized scalar pandas_udf (Arrow batches)
- ``q36_apply_in_pandas``  grouped-map applyInPandas (per-group pandas frame)
- ``q36_map_in_pandas``    partition-wise mapInPandas (the fetch-operator shape,
                           reference `downloader.py:295-305`)
- ``q36_explode_udtf``     UDF returning array + explode (the page-explode
                           shape, reference `downloader.py:148-216`)
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F

from doc2dataset_spark.queries.core import query
from doc2dataset_spark.session import load_table


# ---------------------------------------------------------------------------
# scalar pandas UDF: whitespace word count (vectorized str ops)
# ---------------------------------------------------------------------------
@query(
    "q36_pandas_udf",
    oracle=r"""
    SELECT doc_id,
           len(list_filter(string_split_regex(text, '\s+'), t -> t <> ''))
             AS n_words
    FROM documents
    """,
    tags=("udf", "documents"),
)
def q36_pandas_udf(spark, sf_dir):
    """Arrow-vectorized scalar UDF; oracle is the equivalent SQL."""

    @F.pandas_udf("int")
    def n_words(s: pd.Series) -> pd.Series:
        return s.str.split().map(len).astype("int32")

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", n_words("text").alias("n_words"))


# ---------------------------------------------------------------------------
# grouped-map applyInPandas: per-language doc ranking by length
# ---------------------------------------------------------------------------
@query(
    "q36_apply_in_pandas",
    oracle="""
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id)::INT AS len_rank
    FROM documents
    """,
    tags=("udf", "documents"),
)
def q36_apply_in_pandas(spark, sf_dir):
    """per-group pandas transform (rank docs by length within language)."""

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["len_rank"] = (pdf.index + 1).astype("int32")
        return pdf[["doc_id", "lang", "len_rank"]]

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return d.groupBy("lang").applyInPandas(
        rank_group, schema="doc_id long, lang string, len_rank int"
    )


# ---------------------------------------------------------------------------
# mapInPandas: partition-wise batch iterator (the fetch-operator shape)
# ---------------------------------------------------------------------------
@query(
    "q36_map_in_pandas",
    oracle="""
    SELECT doc_id, n_chars, (n_chars >= 200) AS is_long
    FROM documents WHERE source IN ('src0', 'src1', 'src2')
    """,
    tags=("udf", "documents"),
)
def q36_map_in_pandas(spark, sf_dir):
    """batch-iterator UDF over partitions — the same plumbing the HTTP
    fetch operator uses (thread pool per Arrow batch)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[pdf["source"].isin(["src0", "src1", "src2"])].copy()
            out["is_long"] = out["n_chars"] >= 200
            yield out[["doc_id", "n_chars", "is_long"]]

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return d.mapInPandas(op, schema="doc_id long, n_chars long, is_long boolean")


# ---------------------------------------------------------------------------
# UDF → array → explode (the per-page UDTF shape)
# ---------------------------------------------------------------------------
@query(
    "q36_explode_udtf",
    oracle=r"""
    SELECT doc_id,
           unnest(list_filter(string_split_regex(text, '\s+'),
                              t -> t <> '')[1:5]) AS token
    FROM documents WHERE doc_id < 50
    """,
    tags=("udf", "documents"),
)
def q36_explode_udtf(spark, sf_dir):
    """pandas UDF returning array<string>, exploded to rows — the shape of
    the reference's doc→pages flatMap (`downloader.py:148-216`)."""

    @F.pandas_udf("array<string>")
    def first_tokens(s: pd.Series) -> pd.Series:
        return s.map(lambda t: t.split()[:5])

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(first_tokens("text")).alias("token"))


# ---------------------------------------------------------------------------
# real Python UDTF (Spark 4): one input row → many output rows, with state
# ---------------------------------------------------------------------------
@query(
    "q36_python_udtf",
    oracle=r"""
    SELECT doc_id, (pos - 1)::INT AS pos, token
    FROM (
      SELECT doc_id,
             generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
      FROM (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           t -> t <> '') AS toks
        FROM documents WHERE doc_id < 20
      )
    ) WHERE token LIKE '%a%'
    """,
    tags=("udf", "documents"),
)
def q36_python_udtf(spark, sf_dir):
    """native Python UDTF (Spark 4 `udtf` API, not explode-emulation):
    tokenizes each doc and emits (pos, token) rows for tokens containing
    'a' — a table function with per-row fan-out and in-function filtering,
    the exact shape of the reference's doc→pages loop with its per-page
    skip conditions (`downloader.py:148-216`)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class TokenizeFilter:
        def eval(self, text: str):
            if text is None:
                return
            for pos, tok in enumerate(t for t in text.lower().split() if t):
                if "a" in tok:
                    yield pos, tok

    spark.udtf.register("tokenize_filter", TokenizeFilter)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM udtf_docs d, LATERAL tokenize_filter(d.text) t
        """
    )


# ---------------------------------------------------------------------------
# mapInArrow: RecordBatch-level UDF (no pandas conversion at all)
# ---------------------------------------------------------------------------
@query(
    "q36_map_in_arrow",
    oracle="""
    SELECT doc_id, n_chars * 2 AS dbl_chars
    FROM documents WHERE n_chars % 2 = 0
    """,
    tags=("udf", "documents"),
)
def q36_map_in_arrow(spark, sf_dir):
    """Arrow-native batch UDF (mapInArrow): operates on pyarrow
    RecordBatches directly — no pandas materialization, the cheapest
    Python boundary Spark has (the fetch/extract operators' upgrade path
    when per-row Python objects aren't needed)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def op(batches):
        for batch in batches:
            t = pa.Table.from_batches([batch])
            keep = t.filter(pc.equal(pc.bit_wise_and(t["n_chars"], 1), 0))
            out = pa.table(
                {
                    "doc_id": keep["doc_id"],
                    "dbl_chars": pc.multiply(keep["n_chars"], 2),
                }
            )
            yield from out.to_batches()

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return d.mapInArrow(op, schema="doc_id long, dbl_chars long")
