"""Per-document page extraction (reference T1-T5/T12/T14,
`downloader.py:142-219`, `extractor.py:128-176`).

Spark-first split of responsibilities:

- The **decoder UDF** (mapInPandas — the pipeline's one flatMap) does only
  what genuinely needs Python: open the document bytes and produce per-page
  text in which every image is rewritten to a canonical
  ``<img height=".." width=".." src=".."/>`` marker (reference T3/T4). One
  input row fans out to one row per page.
- Everything downstream — image-size criteria, img removal, word counts,
  min-words / max-images / empty-page filters, digit removal, hashing — is
  native Spark SQL (see operators/filters.py): Catalyst can see it, reorder
  it, and run it in whole-stage codegen. The reference buries all of this
  inside a Python loop per page (`extractor.py:128-176`).

Decoders are pluggable:
- PyMuPDF (``fitz``) when importable: real PDFs via ``page.get_text("xhtml")``
  (reference T3, `extractor.py:136-139`).
- A deterministic FAKEDOC decoder for hermetic tests (this container has no
  PDF library): bytes = ``%FAKEDOC1.0\\n`` + form-feed-separated utf-8 pages.
  The Spark-side plumbing (schema, fan-out, error capture) is identical.
"""

from __future__ import annotations

import html.parser
import io
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from doc2dataset_spark.config import DownloadConfig

FAKEDOC_MAGIC = b"%FAKEDOC1.0\n"

try:  # pragma: no cover - not present in this container
    import fitz  # type: ignore

    _HAS_FITZ = True
except ImportError:
    fitz = None
    _HAS_FITZ = False


class _TextWithImgMarkers(html.parser.HTMLParser):
    """Extract plain text, rewriting <img> to the canonical marker form
    (reference `extractor.py:51-60` rewrites alt attrs via resiliparse;
    same observable contract: text + inline canonical img tags)."""

    def __init__(self, keep_images: bool) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.keep_images = keep_images

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "img" and self.keep_images:
            d = dict(attrs)
            self.parts.append(
                f'<img height="{d.get("height", 0)}" width="{d.get("width", 0)}"'
                f' src="{d.get("src", "")}"/>'
            )
        elif tag in ("p", "div", "br", "h1", "h2", "h3", "li", "tr"):
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        self.parts.append(data)

    def text(self) -> str:
        return "".join(self.parts)


def xhtml_to_text(page_xhtml: str, keep_images: bool) -> str:
    parser = _TextWithImgMarkers(keep_images)
    parser.feed(page_xhtml)
    return parser.text()


def decode_document(data: bytes) -> list[str]:
    """bytes → list of per-page xhtml strings. Raises on undecodable input
    (becomes status='failed_to_extract', reference `downloader.py:383-391`)."""
    if data.startswith(FAKEDOC_MAGIC):
        body = data[len(FAKEDOC_MAGIC):].decode("utf-8")
        return body.split("\x0c")
    if _HAS_FITZ and data.startswith(b"%PDF"):
        doc = fitz.open(stream=io.BytesIO(data))
        pages = []
        for page in doc.pages():
            # strip the volatile per-page id, reference `extractor.py:136-137`
            pages.append(page.get_text("xhtml").replace(' id="page0"', ""))
        return pages
    if data.startswith(b"%PDF"):
        # a REAL pdf in a container without the real codec: make the
        # error name the actual cause, not "unknown format" — at fleet
        # scale this is the difference between a misconfigured worker
        # image being obvious in the error histogram and being buried
        # under genuinely-corrupt documents
        raise ValueError(
            "cannot open document: real PDF but PyMuPDF (fitz) is not "
            "installed (pip install -r requirements-extras.txt)"
        )
    raise ValueError("cannot open document: unknown format")


def make_svg(page_xhtml: str, page_no: int) -> str:
    """T12 drawings (`extractor.py:76-77`): with fitz, ``get_svg_image()``;
    the fake decoder emits a deterministic placeholder SVG."""
    return f'<svg page="{page_no}" len="{len(page_xhtml)}"/>'


EXTRACT_SCHEMA_SUFFIX = (
    "page_no int, page_text string, drawings string, doc_error string"
)


def extract_pages(df: DataFrame, cfg: DownloadConfig) -> DataFrame:
    """Fan each document row out to one row per page (the T2 flatMap).

    Failed fetches (doc_bytes null) and failed decodes emit exactly one row
    with page_no null so status accounting downstream sees every input.
    ``max_pages`` caps the per-doc fan-out (reference F10 counts only
    successful pages and can emit max_pages+1 — we cap at exactly
    max_pages; divergence documented in SURVEY §2.1)."""
    passthrough = [f.name for f in df.schema.fields if f.name != "doc_bytes"]
    in_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name != "doc_bytes"
    )
    out_schema = f"{in_fields}, {EXTRACT_SCHEMA_SUFFIX}"
    max_pages = cfg.max_pages
    get_drawings = cfg.get_drawings
    save_figures = cfg.save_figures

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for rec in pdf.to_dict("records"):
                base = {c: rec[c] for c in passthrough}
                data = rec["doc_bytes"]
                if data is None:
                    rows.append(
                        {**base, "page_no": None, "page_text": None,
                         "drawings": None, "doc_error": None}
                    )
                    continue
                try:
                    pages = decode_document(bytes(data))
                    if max_pages is not None:
                        pages = pages[:max_pages]
                    for i, page_xhtml in enumerate(pages):
                        rows.append(
                            {
                                **base,
                                "page_no": i,
                                "page_text": xhtml_to_text(
                                    page_xhtml, keep_images=save_figures
                                ),
                                "drawings": make_svg(page_xhtml, i)
                                if get_drawings
                                else None,
                                "doc_error": None,
                            }
                        )
                    if not pages:
                        rows.append(
                            {**base, "page_no": None, "page_text": None,
                             "drawings": None, "doc_error": "empty document"}
                        )
                except Exception as exc:  # noqa: BLE001 — T14 error capture
                    rows.append(
                        {**base, "page_no": None, "page_text": None,
                         "drawings": None, "doc_error": str(exc)}
                    )
            yield pd.DataFrame(rows, columns=[*passthrough, "page_no",
                                              "page_text", "drawings",
                                              "doc_error"])

    return df.mapInPandas(run, schema=out_schema)
