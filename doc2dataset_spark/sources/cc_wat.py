"""Common Crawl WAT mining: harvest document links from WARC metadata.

Re-expresses the reference's CC example (`examples/get_pdf_links_from_cc.py:
59-110`): read WAT files (gzip WARC streams whose `metadata` records carry a
JSON envelope of per-page HTML metadata), pull every outgoing link, resolve
relative URLs against the page (honoring ``<base href>``), keep http(s)
links matching a suffix (``.pdf``), dedup globally, and hand back a
DataFrame ready for ``download()``'s url_list input.

Differences from the reference, by design:

- **No fastwarc/simdjson dependency**: WAT records are plain WARC/1.0
  framing (header block, Content-Length payload, CRLF CRLF separator) and
  the payload is ordinary JSON — a stdlib parser covers the format, so the
  miner runs in any Python without native wheels.
- **Spark-first distribution**: the WAT path list becomes a DataFrame with
  one row per file; extraction is a ``mapInPandas`` fan-out (one task per
  WAT, the reference's one-partition-per-WAT shape) and dedup is the
  engine's own ``dropDuplicates`` — a hash shuffle on the url, not a
  driver-side set. At 100 TB (a full crawl is ~90k WATs) the path frame
  partitions 1:1 onto executors and the only shuffle is the final dedup.
- **Bounded retries**: the reference's ``while True`` fetch loop
  (`get_pdf_links_from_cc.py:70-77`) retries forever; here transient opens
  retry ``retries`` times then raise, so the task fails LOUDLY and Spark's
  task-retry/abort machinery owns the failure policy (a hung executor is
  the one failure mode a 90k-file job can't tolerate).
- **IO through fsio**: paths route via :mod:`doc2dataset_spark.fsio`, so
  ``file://`` fixtures and tests work hermetically and ``s3://`` works
  wherever fsspec+s3fs is installed (the reference hardcodes s3).
"""

from __future__ import annotations

import gzip
import io
import json
import time
from typing import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from doc2dataset_spark import fsio

# ---------------------------------------------------------------------------
# WARC/1.0 record framing (stdlib fastwarc replacement)
# ---------------------------------------------------------------------------


def iter_warc_records(stream) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) for each record of a WARC byte stream.

    Framing per the WARC spec: a ``WARC/...`` version line, header lines
    until a blank line, exactly ``Content-Length`` payload bytes, then a
    blank-line separator before the next record. Header names are
    case-insensitive; they are lowercased here.
    """
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():  # inter-record CRLFs
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            hline = stream.readline()
            if not hline or not hline.strip():
                break
            name, _, value = hline.decode("utf-8", "replace").partition(":")
            headers[name.strip().lower()] = value.strip()
        length = int(headers.get("content-length", "0"))
        payload = stream.read(length)
        if len(payload) < length:
            raise ValueError("truncated WARC payload")
        yield headers, payload


def _open_wat(path: str, retries: int = 3):
    """Open a (possibly gzipped) WAT file as a STREAMING binary reader —
    records are decompressed and parsed incrementally, never the whole
    ~400 MB file into memory (the reference buffers the full blob,
    `get_pdf_links_from_cc.py:72`; one-task-per-WAT times 32 concurrent
    tasks makes that a 10+ GB per-executor bill). Bounded retry on the
    OPEN only (reference retries forever); a mid-stream read error fails
    the task and Spark's task retry re-runs it — that, not a silent skip,
    is the per-WAT failure story."""
    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            fs, _ = fsio.url_to_fs(path)
            raw = fs.open(path, "rb")
            magic = raw.read(2)
            if hasattr(raw, "seek"):
                raw.seek(0)
            else:  # pragma: no cover - non-seekable remote stream
                raw.close()
                raw = fs.open(path, "rb")
            if magic == b"\x1f\x8b":  # gzip; multi-member safe
                return io.BufferedReader(gzip.GzipFile(fileobj=raw))
            return raw  # already a buffered binary reader
        except FileNotFoundError:
            raise  # permanent — retrying cannot help
        except (OSError, ValueError) as exc:  # pragma: no cover - timing
            last = exc
            if attempt < retries:
                time.sleep(min(2**attempt, 5))
    raise last  # type: ignore[misc]


# ---------------------------------------------------------------------------
# WAT envelope navigation (reference get_pdf_links_from_cc.py:80-110)
# ---------------------------------------------------------------------------


def _absolute(url: str, base_url: str) -> str | None:
    """Reference `make_link_absolute`: pass through absolute http(s) URLs,
    resolve everything else against the page base; unresolvable → None."""
    if url.startswith("http://") or url.startswith("https://"):
        return url
    try:
        return urljoin(base_url, url)
    except ValueError:
        return None


def links_from_wat_record(payload: bytes) -> Iterator[str]:
    """All absolutized outgoing links of one WAT metadata record.

    Envelope navigation mirrors the reference exactly: records without
    HTTP-Response-Metadata → HTML-Metadata → Links are skipped; the base
    URL is the WARC-Target-URI, overridden by ``Head.Base`` when present
    (`get_pdf_links_from_cc.py:93-103`)."""
    try:
        record = json.loads(payload)
    except (ValueError, UnicodeDecodeError):
        return  # reference: "A shard record failed" → skip
    try:
        envelope = record["Envelope"]
        http_resp = envelope["Payload-Metadata"]["HTTP-Response-Metadata"]
        metadata = http_resp["HTML-Metadata"]
        links = metadata["Links"]
        base_url = envelope["WARC-Header-Metadata"]["WARC-Target-URI"]
    except (KeyError, TypeError):
        return
    # real crawls contain records with "Links": null or a non-list —
    # skip the record (the reference's bare-except skip), don't kill
    # the task
    if not isinstance(links, list) or not isinstance(base_url, str):
        return
    head = metadata.get("Head") if isinstance(metadata, dict) else None
    if isinstance(head, dict) and "Base" in head:
        try:
            base_url = urljoin(base_url, head["Base"])
        except (ValueError, TypeError):
            pass
    for link in links:
        try:
            absolute = _absolute(link["url"], base_url)
        except (KeyError, TypeError, AttributeError, ValueError):
            continue  # non-dict link, non-string url, unresolvable join
        if absolute:
            yield absolute


def links_from_wat(path: str, retries: int = 3) -> Iterator[str]:
    """Every absolutized link in one WAT file (metadata records only)."""
    stream = _open_wat(path, retries=retries)
    for headers, payload in iter_warc_records(stream):
        if headers.get("warc-type") != "metadata":
            continue
        yield from links_from_wat_record(payload)


def read_wat_index(index_path: str) -> list[str]:
    """WAT paths from a crawl index file (``wat.paths.gz`` — one relative
    path per line; reference `read_wat_index_file`). Caller prepends the
    crawl root (e.g. ``s3://commoncrawl/``)."""
    fs, _ = fsio.url_to_fs(index_path)
    with fs.open(index_path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return [ln.strip() for ln in data.decode().splitlines() if ln.strip()]


# ---------------------------------------------------------------------------
# the distributed miner
# ---------------------------------------------------------------------------


def mine_links(
    spark: SparkSession,
    wat_paths: list[str],
    suffix: str = ".pdf",
    retries: int = 3,
) -> DataFrame:
    """(url) DataFrame of deduplicated document links across WAT files.

    One task per WAT file (the path frame is repartitioned to the file
    count, mirroring the reference's ``parallelize(wats, wat_count)``),
    link extraction streams record-by-record inside ``mapInPandas``, and
    the global dedup is a DataFrame ``dropDuplicates`` — url-hash shuffle,
    no driver-side state. Suffix matching is case-insensitive on the path
    part (the reference's ``endswith(".pdf")`` misses ``.PDF``; divergence
    documented here)."""
    import pandas as pd

    suffix_l = suffix.lower()

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for batch in batches:
            for path in batch["path"]:
                urls = [
                    u
                    for u in links_from_wat(path, retries=retries)
                    if (u.startswith("http://") or u.startswith("https://"))
                    and u.split("?", 1)[0].split("#", 1)[0].lower().endswith(suffix_l)
                ]
                yield pd.DataFrame({"url": urls})

    paths = spark.createDataFrame(
        [(p,) for p in wat_paths], "path string"
    ).repartition(max(len(wat_paths), 1))
    links = paths.mapInPandas(extract, "url string")
    return links.dropDuplicates(["url"])


# ---------------------------------------------------------------------------
# URL canonicalization (native expressions — runs in codegen, no UDF)
# ---------------------------------------------------------------------------

# tracking params dropped during canonicalization (lowercase match)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid)="


def canonical_url_col(col: str = "url"):
    """Canonical form of an http(s) URL as a pure column expression:
    scheme and host lowercased, default port stripped (``:80`` http /
    ``:443`` https), fragment dropped, tracking params removed
    (TRACKING_PARAM_RE), remaining query params sorted, empty path
    normalized to ``/``.

    The reference dedups RAW url strings
    (`get_pdf_links_from_cc.py:104` distinct), so
    ``http://A.com/x?b=1&a=2#f`` and ``http://a.com:80/x?a=2&b=1``
    survive as two downloads of the same bytes; canonical dedup is the
    production upgrade. All string surgery is regexp/array built-ins —
    whole-stage-codegen, no Python boundary, safe at 90k-WAT scale.
    Idempotence (canon∘canon == canon) is property-tested in
    tests/test_cc_wat.py."""
    from pyspark.sql import functions as F

    u = F.col(col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    netloc = F.lower(F.regexp_extract(u, r"^[A-Za-z][^:]*://([^/?#]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(netloc, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(netloc, r":443$", ""))
        .otherwise(netloc)
    )
    path = F.regexp_extract(u, r"^[A-Za-z][^:]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~F.lower(p).rlike(TRACKING_PARAM_RE),
        )
    )
    qtail = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, qtail)


def dedup_canonical(links: DataFrame) -> DataFrame:
    """(url, canonical_url) with one representative RAW url per
    canonical form — the deterministic min, so reruns pick the same
    winner. The dedup shuffles on the canonical hash exactly as
    mine_links' raw dedup does; at crawl scale the canonical key only
    merges groups (never splits), so skew cannot worsen."""
    from pyspark.sql import functions as F

    return (
        links.withColumn("canonical_url", canonical_url_col("url"))
        .groupBy("canonical_url")
        .agg(F.min("url").alias("url"))
        .select("url", "canonical_url")
    )


def host_stats(links: DataFrame) -> DataFrame:
    """Per-host link counts over the canonical host — the crawl-planning
    roll-up (politeness budgeting, domain caps) the miner's output feeds.
    One narrow aggregate, map-side combinable."""
    from pyspark.sql import functions as F

    return (
        links.withColumn(
            "host",
            F.lower(
                F.regexp_extract(F.col("url"), r"^[A-Za-z][^:]*://([^/?#:]*)", 1)
            ),
        )
        .groupBy("host")
        .agg(F.count("*").alias("n_links"))
    )
