"""Source readers (S1-S8) and fetch internals (S10-S11)."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from doc2dataset_spark.config import DownloadConfig
from doc2dataset_spark.sources.fetch import (
    _check_robots_headers,
    _fetch_with_retry,
)
from doc2dataset_spark.sources.reader import read_url_list

ROWS = [
    {"url": "file:///a/1.pdf", "caption": "one", "sha256": "x" * 64},
    {"url": "file:///a/2.pdf", "caption": "two", "sha256": "y" * 64},
]


def _cfg(path: str, fmt: str, **kw) -> DownloadConfig:
    return DownloadConfig(
        url_list=path,
        input_format=fmt,
        save_additional_columns=["caption"],
        verify_hash=("sha256", "sha256"),
        **kw,
    )


def _assert_frame(df):
    rows = sorted((r.asDict() for r in df.collect()), key=lambda r: r["url"])
    assert [r["url"] for r in rows] == ["file:///a/1.pdf", "file:///a/2.pdf"]
    assert rows[0]["caption"] == "one"
    assert rows[0]["sha256"] == "x" * 64
    assert set(df.columns) == {"url", "caption", "sha256"}


def test_tsv_scan(spark, tmp_path):
    p = tmp_path / "u.tsv"
    p.write_text(
        "url\tcaption\tsha256\n"
        + "\n".join(f"{r['url']}\t{r['caption']}\t{r['sha256']}" for r in ROWS)
    )
    _assert_frame(read_url_list(spark, _cfg(str(p), "tsv")))


def test_json_scan(spark, tmp_path):
    p = tmp_path / "u.json"
    p.write_text(json.dumps(ROWS))
    _assert_frame(read_url_list(spark, _cfg(str(p), "json")))


def test_jsonl_scan(spark, tmp_path):
    p = tmp_path / "u.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in ROWS))
    _assert_frame(read_url_list(spark, _cfg(str(p), "jsonl")))


def test_parquet_scan_prunes(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "u.parquet"
    table = pa.table(
        {
            "url": [r["url"] for r in ROWS],
            "caption": [r["caption"] for r in ROWS],
            "sha256": [r["sha256"] for r in ROWS],
            "unused_wide_column": ["z" * 100] * 2,
        }
    )
    pq.write_table(table, p)
    df = read_url_list(spark, _cfg(str(p), "parquet"))
    _assert_frame(df)
    # pruning reaches the scan: ReadSchema must not contain the wide column
    plan = df._jdf.queryExecution().toString()
    assert "unused_wide_column" not in plan.split("ReadSchema")[-1]


def test_gzip_transparency(spark, tmp_path):
    p = tmp_path / "u.csv.gz"
    body = "url,caption,sha256\n" + "\n".join(
        f"{r['url']},{r['caption']},{r['sha256']}" for r in ROWS
    )
    with gzip.open(p, "wt") as fh:
        fh.write(body)
    _assert_frame(read_url_list(spark, _cfg(str(p), "csv")))


def test_directory_glob(spark, tmp_path):
    d = tmp_path / "lists"
    os.makedirs(d)
    (d / "a.txt").write_text("file:///a/1.pdf\n")
    (d / "b.txt").write_text("file:///a/2.pdf\n")
    cfg = DownloadConfig(url_list=str(d), input_format="txt")
    df = read_url_list(spark, cfg)
    assert sorted(r["url"] for r in df.collect()) == [
        "file:///a/1.pdf",
        "file:///a/2.pdf",
    ]


def test_fetch_retry_eventually_fails(tmp_path):
    data, err = _fetch_with_retry(
        f"file://{tmp_path}/missing.bin", retries=2, timeout=1,
        user_agent_token=None, disallowed=None,
    )
    assert data is None and "No such file" in err


def test_fetch_local_path_without_scheme(tmp_path):
    p = tmp_path / "doc.bin"
    p.write_bytes(b"payload")
    data, err = _fetch_with_retry(
        str(p), retries=0, timeout=1, user_agent_token=None, disallowed=None
    )
    assert data == b"payload" and err is None


class _Headers:
    def __init__(self, values):
        self._values = values

    def get_all(self, name):
        return self._values if name == "X-Robots-Tag" else None


@pytest.mark.parametrize(
    "headers,ua,expect",
    [
        (["noai"], None, True),                    # unscoped applies to all
        (["noai, nofollow"], None, True),          # comma list: any match
        (["nofollow, noindex"], None, True),
        (["nofollow"], None, False),
        (["somebot: noindex"], "somebot", True),   # scoped + matching agent
        (["somebot: noindex"], "otherbot", False),  # scoped, different agent
        (["somebot: noindex"], None, False),       # scoped, we have no token
        (["all"], None, False),
        ([], None, False),
    ],
)
def test_robots_directives(headers, ua, expect):
    """Reference `downloader.py:20-34` semantics: directive lists split on
    commas; an agent-scoped value only applies when the agent matches our
    user_agent_token."""
    assert (
        _check_robots_headers(_Headers(headers), ["noai", "noindex"], ua)
        is expect
    )


def test_txt_urls_are_trimmed(spark, tmp_path):
    """CRLF-authored url lists: the trailing \\r must be stripped from the
    VALUE, not just ignored by the blank-line filter."""
    p = tmp_path / "urls.txt"
    p.write_bytes(b"http://a.com/x.pdf\r\n  http://b.com/y.pdf \r\n\r\n")
    cfg = DownloadConfig(
        url_list=str(p), output_folder=str(tmp_path / "o"), input_format="txt"
    )
    urls = [r["url"] for r in read_url_list(spark, cfg).collect()]
    assert urls == ["http://a.com/x.pdf", "http://b.com/y.pdf"]


def test_custom_url_col_also_in_additional_columns(spark, tmp_path):
    """A url_col repeated in save_additional_columns must not produce an
    ambiguous duplicate column after the rename."""
    p = tmp_path / "urls.csv"
    p.write_text("link,caption\nhttp://a.com/x.pdf,hello\n")
    cfg = DownloadConfig(
        url_list=str(p),
        output_folder=str(tmp_path / "o"),
        input_format="csv",
        url_col="link",
        save_additional_columns=["link", "caption"],
    )
    df = read_url_list(spark, cfg)
    assert df.columns.count("url") == 1
    assert [r["url"] for r in df.collect()] == ["http://a.com/x.pdf"]


def test_orc_url_list_roundtrip(spark, tmp_path):
    """ORC input format: Spark-native columnar scan, same pruning path as
    parquet (engine extension beyond the reference's format list)."""
    from doc2dataset_spark.config import DownloadConfig
    from doc2dataset_spark.sources.reader import read_url_list

    src = (tmp_path / "urls_orc").as_posix()
    spark.createDataFrame(
        [(f"file:///x/{i}.bin", f"cap {i}") for i in range(7)],
        "url string, caption string",
    ).write.orc(src)
    cfg = DownloadConfig(
        url_list=src, input_format="orc", output_folder="/tmp/unused",
        save_additional_columns=["caption"],
    )
    out = read_url_list(spark, cfg)
    rows = out.collect()
    assert len(rows) == 7
    assert {r.url for r in rows} == {f"file:///x/{i}.bin" for i in range(7)}
    assert all(r.caption.startswith("cap ") for r in rows)


def test_xml_url_list_roundtrip(spark, tmp_path):
    """XML input format (Spark 4 built-in datasource, rowTag=row):
    engine extension beyond the reference's format list, round-tripped
    through a written XML document."""
    from doc2dataset_spark.config import DownloadConfig
    from doc2dataset_spark.sources.reader import read_url_list

    src_dir = tmp_path / "urls_xml"
    src_dir.mkdir()
    rows_xml = "".join(
        f"<row><url>file:///x/{i}.bin</url><caption>cap {i}</caption></row>"
        for i in range(7)
    )
    (src_dir / "u.xml").write_text(f"<rows>{rows_xml}</rows>")
    cfg = DownloadConfig(
        url_list=(src_dir / "u.xml").as_posix(),
        input_format="xml",
        output_folder="/tmp/unused",
        save_additional_columns=["caption"],
    )
    out = read_url_list(spark, cfg)
    rows = out.collect()
    assert len(rows) == 7
    assert {r.url for r in rows} == {f"file:///x/{i}.bin" for i in range(7)}
    assert all(r.caption.startswith("cap ") for r in rows)
