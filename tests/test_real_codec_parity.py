"""Real-codec parity harness (SURVEY's "hard #1"): prove the import-gated
real paths — fitz PDF extraction, pycld2 langid, resiliparse HTML text —
byte-match the reference's behavior wherever those libs exist.

This container ships none of them, so every test here SKIPS locally but is
runnable as-is after `pip install -r requirements-extras.txt` (pinned to
the versions these goldens were authored against). The golden inputs are
ported verbatim from the reference's `tests/test_extractor.py:6-64`; the
hermetic regex-twin assertions for the same strings live in
`tests/test_text_functions.py` and stay green everywhere.

Documented divergences (asserted here, not papered over):
- decode_document strips the volatile `id="page0"` attribute fitz emits
  (reference `extractor.py:136-137` does the same replace).
- The reference's remove_img_tag treats the tag as a REGEX pattern and
  crashes/corrupts on metacharacters in src; ours is a literal replace.
  Parity is asserted on the reference's own (metachar-free) golden.
"""

from __future__ import annotations

import pytest

from doc2dataset_spark.functions.text import count_words, detect_language
from doc2dataset_spark.operators.extract import decode_document, xhtml_to_text

# reference test_extractor.py golden inputs (public test strings)
FA_WORDS = "نکیمن دیلوت هوضو هب ار"
MIXED_PAGE = (
    "<h1> header \n header </h2>نکیمن دیلوت  <img jslfndl />هوضو هب ار бла бла"
)


# ---------------------------------------------------------------------------
# pycld2 — T11
# ---------------------------------------------------------------------------
class TestPycld2Parity:
    @pytest.fixture(autouse=True)
    def _need(self):
        pytest.importorskip("pycld2")

    def test_reference_goldens(self):
        # reference test_extractor.py:55-64 verbatim
        assert detect_language("خداحافظ") == "fa"
        assert (
            detect_language("а неправильный формат идентификатора дн назад")
            == "ru"
        )
        assert (
            detect_language(
                "OK I fixed the Python bindings to always return 3 "
                "languages even"
            )
            == "en"
        )

    def test_garbage_returns_none_not_raise(self):
        # the reference wraps pycld2 errors the same way (extractor.py:71-73)
        assert detect_language("\x00\x01") in (None, "un", "en")


# ---------------------------------------------------------------------------
# fitz (PyMuPDF) — T1/T3
# ---------------------------------------------------------------------------
class TestFitzParity:
    @pytest.fixture(autouse=True)
    def _need(self):
        pytest.importorskip("fitz")

    def _pdf_bytes(self, texts: list[str]) -> bytes:
        import fitz

        doc = fitz.open()
        for t in texts:
            page = doc.new_page()
            page.insert_text((72, 72), t)
        return doc.tobytes()

    def test_real_pdf_page_fanout_and_text(self):
        data = self._pdf_bytes(["alpha beta gamma", "second page words"])
        pages = decode_document(data)
        assert len(pages) == 2
        assert "alpha beta gamma" in xhtml_to_text(pages[0], keep_images=False)
        assert count_words(xhtml_to_text(pages[0], keep_images=False)) == 3

    def test_page_id_stripped_like_reference(self):
        # reference extractor.py:136-137 strips the volatile per-page id
        data = self._pdf_bytes(["x"])
        (page,) = decode_document(data)
        assert 'id="page0"' not in page

    def test_get_text_xhtml_is_the_source_format(self):
        import fitz

        data = self._pdf_bytes(["hello world"])
        doc = fitz.open(stream=data)
        raw = doc[0].get_text("xhtml")
        assert raw.replace(' id="page0"', "") == decode_document(data)[0]


# ---------------------------------------------------------------------------
# resiliparse — the reference's HTML walk vs our stdlib parser
# ---------------------------------------------------------------------------
class TestResiliparseParity:
    @pytest.fixture(autouse=True)
    def _need(self):
        pytest.importorskip("resiliparse.parse.html")

    @staticmethod
    def _norm(s: str) -> str:
        return " ".join(s.split())

    def test_plain_text_agrees_modulo_whitespace(self):
        from resiliparse.extract.html2text import extract_plain_text

        ours = self._norm(xhtml_to_text(MIXED_PAGE, keep_images=False))
        theirs = self._norm(extract_plain_text(MIXED_PAGE, main_content=False))
        assert ours == theirs

    def test_word_count_matches_reference_on_tree_text(self):
        # reference counts 9 words on the mixed page (test_extractor.py:11-13)
        assert count_words(MIXED_PAGE) == 9
