"""Property-based equivalence: the native Spark Column forms of the text
functions must agree with their pure-Python twins (the unit-test oracles
ported from the reference's `tests/test_extractor.py`) on arbitrary input —
not just the golden fixtures. Hypothesis drives the generation; each case
batch-evaluates through one Spark job so the suite stays fast.

Java regex vs Python re is the risk surface here (dotall semantics, empty
matches, unicode classes); these tests are what licenses computing T6-T10
JVM-side at 100 TB while the per-document UDF uses the Python forms.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from doc2dataset_spark.functions import text as T

# text-ish alphabet weighted toward the regexes' meta characters
_ALPHA = st.sampled_from(
    list("ab c<>/=\"'[],.\n\t0123456789") + ["<img ", "width=", "/>", "<p>"]
)
_PAGES = st.lists(
    st.lists(_ALPHA, min_size=0, max_size=40).map("".join),
    min_size=1,
    max_size=24,
)


def _spark_eval(spark, pages, col_fn, out_cast):
    df = spark.createDataFrame([(p,) for p in pages], "page string")
    return [
        r["v"] for r in df.select(col_fn(df.page).cast(out_cast).alias("v")).collect()
    ]


@settings(max_examples=20, deadline=None)
@given(pages=_PAGES)
def test_count_words_native_equals_python(spark, pages):
    got = _spark_eval(spark, pages, T.count_words_col, "int")
    want = [T.count_words(p) for p in pages]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(pages=_PAGES)
def test_images_in_page_native_equals_python(spark, pages):
    df = spark.createDataFrame([(p,) for p in pages], "page string")
    got = [
        list(r["v"])
        for r in df.select(T.images_in_page_col(df.page).alias("v")).collect()
    ]
    want = [T.images_in_page(p) for p in pages]
    assert got == want


@settings(max_examples=20, deadline=None)
@given(pages=_PAGES)
def test_remove_digits_native_equals_python(spark, pages):
    got = _spark_eval(spark, pages, T.remove_digits_col, "string")
    want = [T.remove_digits(p) for p in pages]
    assert got == want


def test_remove_digits_unicode_digits(spark):
    """The reference's r"[.\\d]+" is a Python re.UNICODE pattern, so Arabic-
    Indic / Devanagari digits are stripped too; Java \\d needs (?U) to agree."""
    pages = ["عدد ٠١٢٣٤٥٦٧٨٩ نهاية", "अंक ०१२३४५६७८९ अंत", "a7٣.x"]
    got = _spark_eval(spark, pages, T.remove_digits_col, "string")
    want = [T.remove_digits(p) for p in pages]
    assert got == want
    assert got[0] == "عدد  نهاية"
