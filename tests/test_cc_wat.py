"""CC WAT mining: stdlib WARC parsing + distributed link extraction.

Fixtures are synthetic WAT files built to the WARC/1.0 spec (version line,
headers, Content-Length payload, CRLF CRLF separator) with the JSON
envelope layout real WAT records use — the same navigation path the
reference walks in `examples/get_pdf_links_from_cc.py:80-110`.
"""

import gzip
import json

import pytest

from doc2dataset_spark.sources import cc_wat


def wat_record(target_uri: str, links=None, head_base=None, warc_type="metadata",
               raw_payload=None):
    if raw_payload is None:
        envelope = {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": target_uri},
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Links": links or [],
                            **({"Head": {"Base": head_base}} if head_base else {}),
                        }
                    }
                },
            },
            "Container": {"Filename": "crawl.warc.gz"},
        }
        raw_payload = json.dumps(envelope).encode()
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode()
        + f"WARC-Target-URI: {target_uri}\r\n".encode()
        + f"Content-Length: {len(raw_payload)}\r\n".encode()
        + b"\r\n"
    )
    return head + raw_payload + b"\r\n\r\n"


def write_wat(path, records, compress=True):
    blob = b"".join(records)
    if compress:
        blob = gzip.compress(blob)
    path.write_bytes(blob)
    return str(path)


@pytest.fixture(scope="module")
def wat_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("wats")
    w1 = write_wat(
        d / "a.wat.gz",
        [
            wat_record(
                "http://site-a.com/index.html",
                links=[
                    {"url": "docs/paper.pdf"},           # relative -> resolved
                    {"url": "http://cdn.com/x.PDF"},     # absolute, upper ext
                    {"url": "http://site-a.com/page"},   # not a pdf
                    {"url": "mailto:a@b.c"},             # non-http scheme
                    {"path": "A@/no-url-key"},           # malformed link
                ],
            ),
            wat_record(  # Head.Base overrides the page URL for resolution
                "http://site-b.com/deep/page.html",
                links=[{"url": "rel.pdf"}],
                head_base="http://base.org/root/",
            ),
            wat_record(  # non-metadata record types are skipped entirely
                "http://skip.me/x.pdf",
                links=[{"url": "http://skip.me/x.pdf"}],
                warc_type="response",
            ),
            wat_record(  # broken JSON payload -> skipped, not fatal
                "http://bad.com/", raw_payload=b"{not json"
            ),
        ],
    )
    w2 = write_wat(
        d / "b.wat",  # uncompressed variant
        [
            wat_record(
                "https://site-c.com/",
                links=[
                    {"url": "http://cdn.com/x.pdf?sig=1#frag"},  # query+frag
                    {"url": "http://cdn.com/x.PDF"},             # dup of w1's
                ],
            ),
            wat_record(  # record with no HTML-Metadata at all
                "http://empty.com/",
                raw_payload=json.dumps(
                    {"Envelope": {
                        "WARC-Header-Metadata": {"WARC-Target-URI": "http://empty.com/"},
                        "Payload-Metadata": {},
                    }}
                ).encode(),
            ),
        ],
        compress=False,
    )
    return [w1, w2]


def test_iter_warc_records_framing(wat_files):
    stream = cc_wat._open_wat(wat_files[0])
    records = list(cc_wat.iter_warc_records(stream))
    assert len(records) == 4
    headers, payload = records[0]
    assert headers["warc-type"] == "metadata"
    assert int(headers["content-length"]) == len(payload)
    assert json.loads(payload)["Envelope"]


def test_links_from_wat_resolution(wat_files):
    links = list(cc_wat.links_from_wat(wat_files[0]))
    assert "http://site-a.com/docs/paper.pdf" in links     # relative resolved
    assert "http://cdn.com/x.PDF" in links
    assert "http://base.org/root/rel.pdf" in links         # Head.Base wins
    assert "http://skip.me/x.pdf" not in links             # response record skipped
    assert "mailto:a@b.c" in links                         # absolutizer passes; miner filters


def test_mine_links_end_to_end(spark, wat_files):
    got = {
        r.url
        for r in cc_wat.mine_links(spark, wat_files, suffix=".pdf").collect()
    }
    assert got == {
        "http://site-a.com/docs/paper.pdf",
        "http://cdn.com/x.PDF",                 # case-insensitive suffix
        "http://base.org/root/rel.pdf",
        "http://cdn.com/x.pdf?sig=1#frag",      # suffix matched on path part
    }


def test_mine_links_dedups_across_files(spark, wat_files):
    df = cc_wat.mine_links(spark, wat_files)
    urls = [r.url for r in df.collect()]
    assert len(urls) == len(set(urls))  # x.PDF appears in both WATs, kept once


def test_read_wat_index(tmp_path):
    idx = tmp_path / "wat.paths.gz"
    idx.write_bytes(gzip.compress(b"crawl/a.wat.gz\ncrawl/b.wat.gz\n\n"))
    assert cc_wat.read_wat_index(str(idx)) == ["crawl/a.wat.gz", "crawl/b.wat.gz"]


def test_missing_file_raises_after_bounded_retries(tmp_path):
    with pytest.raises(FileNotFoundError):
        list(cc_wat.links_from_wat(str(tmp_path / "absent.wat.gz"), retries=1))


def test_truncated_record_raises(tmp_path):
    p = tmp_path / "trunc.wat"
    rec = wat_record("http://x.com/", links=[{"url": "a.pdf"}])
    p.write_bytes(rec[: len(rec) - 30])  # cut inside the payload
    with pytest.raises(ValueError, match="truncated"):
        list(cc_wat.links_from_wat(str(p)))


def test_null_links_record_is_skipped(tmp_path):
    """Real crawls contain metadata records with "Links": null — the record
    must be skipped, never a TypeError that kills the 90k-WAT job."""
    p = tmp_path / "nulls.wat"
    p.write_bytes(
        wat_record(
            "http://a.com/",
            raw_payload=json.dumps(
                {"Envelope": {
                    "WARC-Header-Metadata": {"WARC-Target-URI": "http://a.com/"},
                    "Payload-Metadata": {"HTTP-Response-Metadata": {
                        "HTML-Metadata": {"Links": None}}},
                }}
            ).encode(),
        )
        + wat_record(
            "http://b.com/",
            raw_payload=json.dumps(
                {"Envelope": {
                    "WARC-Header-Metadata": {"WARC-Target-URI": "http://b.com/"},
                    "Payload-Metadata": {"HTTP-Response-Metadata": {
                        "HTML-Metadata": {"Links": [
                            {"url": "ok.pdf"},
                            "not-a-dict",
                            {"url": 123},
                            {"no_url": "x"},
                        ]}}},
                }}
            ).encode(),
        )
    )
    assert list(cc_wat.links_from_wat(str(p))) == ["http://b.com/ok.pdf"]


def test_open_wat_streams_without_full_buffer(wat_files):
    """_open_wat must hand back an incremental reader over the underlying
    file object, not a BytesIO of the whole blob."""
    import io as _io

    stream = cc_wat._open_wat(wat_files[0])  # gzipped variant
    # a gzip stream wrapped for incremental reads — not BytesIO
    assert not isinstance(stream.raw, _io.BytesIO)
    assert list(cc_wat.iter_warc_records(stream))  # still parses fully


# ---------------------------------------------------------------------------
# canonical-URL dedup (native-expression canonicalizer)
# ---------------------------------------------------------------------------

CANON_CASES = [
    # (raw, canonical)
    ("http://A.Example.COM/x.pdf", "http://a.example.com/x.pdf"),
    ("http://a.com:80/x.pdf", "http://a.com/x.pdf"),
    ("https://a.com:443/x.pdf", "https://a.com/x.pdf"),
    ("https://a.com:8443/x.pdf", "https://a.com:8443/x.pdf"),  # non-default kept
    ("http://a.com", "http://a.com/"),  # empty path -> /
    ("http://a.com/x.pdf#page=2", "http://a.com/x.pdf"),  # fragment dropped
    (
        "http://a.com/x.pdf?b=1&a=2",
        "http://a.com/x.pdf?a=2&b=1",
    ),  # params sorted
    (
        "http://a.com/x.pdf?utm_source=tw&a=1&fbclid=F&gclid=G",
        "http://a.com/x.pdf?a=1",
    ),  # tracking stripped
    (
        "http://a.com/x.pdf?UTM_CAMPAIGN=z",
        "http://a.com/x.pdf",
    ),  # tracking match is case-insensitive, zero params -> no '?'
    ("HTTP://a.com/X.pdf", "http://a.com/X.pdf"),  # path case preserved
]


def test_canonical_url_exact_cases(spark):
    from doc2dataset_spark.sources.cc_wat import canonical_url_col

    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], "url string")
    got = [
        r[0]
        for r in df.select(canonical_url_col("url")).collect()
    ]
    assert got == [c for _, c in CANON_CASES]


def test_canonical_url_idempotent(spark):
    """canon(canon(u)) == canon(u) over every case — re-canonicalizing a
    stored canonical link must be a no-op."""
    from doc2dataset_spark.sources.cc_wat import canonical_url_col

    df = spark.createDataFrame([(r,) for r, _ in CANON_CASES], "url string")
    once = df.select(canonical_url_col("url").alias("url"))
    twice = once.select(canonical_url_col("url").alias("url"))
    assert [r[0] for r in once.collect()] == [r[0] for r in twice.collect()]


def test_dedup_canonical_picks_min_representative(spark):
    from doc2dataset_spark.sources.cc_wat import dedup_canonical

    raws = [
        "http://A.com/x.pdf?b=1&a=2",
        "http://a.com:80/x.pdf?a=2&b=1&utm_source=t",
        "http://a.com/x.pdf?a=2&b=1",
        "http://other.com/y.pdf",
    ]
    out = {
        r["canonical_url"]: r["url"]
        for r in dedup_canonical(
            spark.createDataFrame([(u,) for u in raws], "url string")
        ).collect()
    }
    assert out == {
        # min() of the three raw spellings is the uppercase-A one
        # ('A' < 'a' in codepoint order)
        "http://a.com/x.pdf?a=2&b=1": "http://A.com/x.pdf?b=1&a=2",
        "http://other.com/y.pdf": "http://other.com/y.pdf",
    }


def test_host_stats(spark):
    from doc2dataset_spark.sources.cc_wat import host_stats

    raws = [
        "http://A.com/1.pdf",
        "http://a.com:80/2.pdf",
        "https://b.com/3.pdf",
    ]
    got = {
        r["host"]: r["n_links"]
        for r in host_stats(
            spark.createDataFrame([(u,) for u in raws], "url string")
        ).collect()
    }
    assert got == {"a.com": 2, "b.com": 1}
