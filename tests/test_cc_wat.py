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
