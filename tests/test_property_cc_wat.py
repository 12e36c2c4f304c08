"""Property-based round-trip for the stdlib WARC/WAT parser: any set of
records we frame must parse back byte-identically, and link extraction
must match a direct pure-Python walk of the same envelopes — across
payload sizes, header orders, weird URLs, and gzip on/off. This is the
robustness license for running the parser over arbitrary crawl data."""

from __future__ import annotations

import gzip
import io
import json

from hypothesis import given, settings, strategies as st

from doc2dataset_spark.sources import cc_wat

# URL-ish strings including relative forms, queries, unicode, empties
_URL = st.one_of(
    st.just("http://a.com/x.pdf"),
    st.just("https://b.org/y.PDF?q=1#f"),
    st.just("docs/rel.pdf"),
    st.just("../up.pdf"),
    st.just("//proto-relative.com/z.pdf"),
    st.just("mailto:x@y.z"),
    st.just(""),
    st.text(
        alphabet="abc/.:?#%20é",
        min_size=0,
        max_size=30,
    ),
)

_RECORD = st.fixed_dictionaries(
    {
        "uri": st.just("http://page.example/dir/index.html"),
        "links": st.lists(_URL, min_size=0, max_size=8),
        "base": st.one_of(st.none(), st.just("http://base.example/root/")),
        "type": st.sampled_from(["metadata", "response", "request"]),
    }
)


def _build(records: list[dict]) -> bytes:
    out = []
    for r in records:
        payload = json.dumps(
            {
                "Envelope": {
                    "WARC-Header-Metadata": {"WARC-Target-URI": r["uri"]},
                    "Payload-Metadata": {
                        "HTTP-Response-Metadata": {
                            "HTML-Metadata": {
                                "Links": [{"url": u} for u in r["links"]],
                                **(
                                    {"Head": {"Base": r["base"]}}
                                    if r["base"]
                                    else {}
                                ),
                            }
                        }
                    },
                }
            }
        ).encode()
        out.append(
            b"WARC/1.0\r\n"
            + f"WARC-Type: {r['type']}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
    return b"".join(out)


def _expected_links(records: list[dict]) -> list[str]:
    """The reference algorithm, walked directly in Python."""
    from urllib.parse import urljoin

    got = []
    for r in records:
        if r["type"] != "metadata":
            continue
        base = r["uri"]
        if r["base"]:
            base = urljoin(base, r["base"])
        for u in r["links"]:
            if u.startswith("http://") or u.startswith("https://"):
                got.append(u)
            else:
                try:
                    got.append(urljoin(base, u))
                except ValueError:
                    pass
    return got


@settings(max_examples=60, deadline=None)
@given(st.lists(_RECORD, min_size=0, max_size=6), st.booleans())
def test_warc_roundtrip_and_link_extraction(records, compress):
    blob = _build(records)
    stream = io.BufferedReader(
        io.BytesIO(gzip.decompress(gzip.compress(blob)) if compress else blob)
    )
    parsed = list(cc_wat.iter_warc_records(stream))
    assert len(parsed) == len(records)
    for (headers, payload), rec in zip(parsed, records):
        assert headers["warc-type"] == rec["type"]
        assert int(headers["content-length"]) == len(payload)

    # link extraction == the reference walk
    links = []
    for (headers, payload), rec in zip(parsed, records):
        if headers.get("warc-type") == "metadata":
            links.extend(cc_wat.links_from_wat_record(payload))
    assert links == _expected_links(records)


# ---------------------------------------------------------------------------
# canonical-URL properties (Spark-evaluated, batched per example)
# ---------------------------------------------------------------------------

_SCHEME = st.sampled_from(["http", "HTTP", "https", "Https"])
_HOST = st.from_regex(r"[A-Za-z][A-Za-z0-9.-]{0,14}", fullmatch=True)
_PORT = st.sampled_from(["", ":80", ":443", ":8080"])
_PATH = st.from_regex(r"(/[A-Za-z0-9._~-]{0,8}){0,3}", fullmatch=True)
_PARAM = st.from_regex(
    r"[A-Za-z_][A-Za-z0-9_]{0,6}=[A-Za-z0-9]{0,6}", fullmatch=True
)
_TRACK = st.sampled_from(["utm_source=x", "utm_c=1", "fbclid=Z", "gclid=q"])
_FRAG = st.sampled_from(["", "#frag", "#p=2"])


@st.composite
def _url(draw):
    params = draw(
        st.lists(st.one_of(_PARAM, _TRACK), min_size=0, max_size=4)
    )
    q = "?" + "&".join(params) if params else ""
    return (
        draw(_SCHEME)
        + "://"
        + draw(_HOST)
        + draw(_PORT)
        + draw(_PATH)
        + q
        + draw(_FRAG)
    )


@settings(max_examples=12, deadline=None)
@given(st.lists(_url(), min_size=1, max_size=24))
def test_canonical_url_properties(urls):
    """For arbitrary http(s)-shaped URLs: canonicalization is idempotent
    and its output carries no fragment, no tracking params, a lowercase
    scheme/host, and no default port."""
    from pyspark.sql import SparkSession

    from doc2dataset_spark.sources.cc_wat import canonical_url_col

    spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = [
        r[0] for r in df.select(canonical_url_col("url").alias("url")).collect()
    ]
    df2 = spark.createDataFrame([(u,) for u in once], "url string")
    twice = [
        r[0] for r in df2.select(canonical_url_col("url").alias("url")).collect()
    ]
    assert once == twice  # idempotent
    for c in once:
        assert "#" not in c
        assert "utm_" not in c.lower() and "fbclid" not in c and "gclid" not in c
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        host = rest.split("/", 1)[0]
        assert host == host.lower()
        if scheme == "http":
            assert not host.endswith(":80")
        if scheme == "https":
            assert not host.endswith(":443")
