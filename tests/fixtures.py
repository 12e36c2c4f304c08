"""Hermetic pipeline fixtures (FIXTURES.md §2): a synthetic document corpus
in the FAKEDOC container format with exactly known content, served over
file:// so the fetch UDF exercises its real path without a network."""

from __future__ import annotations

import csv
import hashlib
import os

from doc2dataset_spark.operators.extract import FAKEDOC_MAGIC

WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def fakedoc(pages: list[str]) -> bytes:
    return FAKEDOC_MAGIC + "\x0c".join(pages).encode("utf-8")


def para(n_words: int, start: int = 0) -> str:
    return " ".join(WORDS[(start + i) % len(WORDS)] for i in range(n_words))


def build_corpus(root: str) -> dict[str, dict]:
    """Write the fixture docs; return {name: {path, sha256, n_pages, ...}}."""
    os.makedirs(root, exist_ok=True)
    docs: dict[str, bytes] = {
        # 3 pages, 20 words each, no images — the happy path
        "plain": fakedoc([f"<p>{para(20, i)}</p>" for i in range(3)]),
        # 1 page, 3 words — rejected by min_words_per_page
        "short": fakedoc(["<p>alpha beta gamma</p>"]),
        # 2 pages with images: ok image, tiny image, extreme aspect,
        # attribute-less (always removed by the size test)
        "images": fakedoc(
            [
                f'<p>{para(20)}</p>'
                '<img width="100" height="100" src="ok.png"/>'
                '<img width="2" height="2" src="tiny.png"/>',
                f'<p>{para(20, 3)}</p>'
                '<img width="400" height="10" src="wide.png"/>'
                '<img src="noattr.png"/>',
            ]
        ),
        # page 0 English, page 1 Russian (T11: only page 0 decides)
        "multilang": fakedoc(
            [
                "<p>the quick brown fox and the lazy dog it is a test of "
                "the language that was detected in this text</p>",
                "<p>привет мир это не просто текст на русском что я с</p>",
            ]
        ),
        # whitespace-only page → skipped (F9) and counted failed
        "empty": fakedoc(["<p>   </p>"]),
        # digits for the T10 path
        "digits": fakedoc([f"<p>{para(15)} 7494 34-89 34.67</p>"]),
        # 12 numbered pages for the max_pages boundary
        "long": fakedoc([f"<p>page {para(12, i)} number</p>" for i in range(12)]),
    }
    meta: dict[str, dict] = {}
    for name, data in docs.items():
        path = os.path.join(root, f"{name}.fake")
        with open(path, "wb") as fh:
            fh.write(data)
        meta[name] = {
            "path": path,
            "url": f"file://{path}",
            "sha256": hashlib.sha256(data).hexdigest(),
            "bytes": data,
        }
    # corrupt: not a FAKEDOC container → failed_to_extract
    corrupt = os.path.join(root, "corrupt.bin")
    with open(corrupt, "wb") as fh:
        fh.write(b"\x00\x01garbage not a doc")
    meta["corrupt"] = {
        "path": corrupt,
        "url": f"file://{corrupt}",
        "sha256": hashlib.sha256(b"\x00\x01garbage not a doc").hexdigest(),
    }
    # missing: URL to a nonexistent file → failed_to_download
    meta["missing"] = {
        "path": os.path.join(root, "nope.fake"),
        "url": f"file://{os.path.join(root, 'nope.fake')}",
        "sha256": "0" * 64,
    }
    return meta


def write_url_csv(root: str, meta: dict[str, dict], badhash: bool = False) -> str:
    """urls.csv fixture (FIXTURES.md §1b): url, caption, sha256."""
    path = os.path.join(root, "urls.csv")
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["url", "caption", "sha256"])
        for name, m in sorted(meta.items()):
            digest = m["sha256"]
            if badhash and name == "plain":
                digest = "f" * 64
            w.writerow([m["url"], f"caption for {name}", digest])
    return path


def write_url_txt(root: str, meta: dict[str, dict]) -> str:
    path = os.path.join(root, "urls.txt")
    with open(path, "w") as fh:
        for _, m in sorted(meta.items()):
            fh.write(m["url"] + "\n")
    return path
