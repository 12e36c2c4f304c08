"""Unit oracles for the extraction text functions (reference semantics from
`extractor.py:13-77`, test strategy modeled on the reference's
`tests/test_extractor.py` — same behaviors exercised on our own strings)."""

from __future__ import annotations

from doc2dataset_spark.functions.text import (
    count_words,
    detect_language,
    get_image_size,
    image_removal_criteria,
    images_in_page,
    remove_digits,
    remove_img_tag,
    strip_tags,
)


def test_count_words_plain():
    assert count_words("one two three") == 3


def test_count_words_separators():
    # commas, angle brackets and square brackets are NOT word characters
    assert count_words("a,b") == 2
    assert count_words("x [y] z") == 3
    assert count_words("") == 0
    assert count_words("   ") == 0


def test_count_words_strips_tags():
    # tags become newlines before counting
    assert count_words("<p>hello world</p>") == 2
    assert count_words('<img width="5" src="a.png"/>word') == 1
    # multiline / dotall tag
    assert count_words("<div\nclass='x'>two words</div>") == 2


def test_count_words_rtl():
    assert count_words("سلام دنیا") == 2
    assert count_words("привет мир и всё") == 4


def test_images_in_page():
    page = 'a <img src="x.png"/> b <img width="3" height="4" src="y.png"/> c'
    imgs = images_in_page(page)
    assert len(imgs) == 2
    assert imgs[0] == '<img src="x.png"/>'


def test_get_image_size_defaults_zero():
    assert get_image_size('<img src="x.png"/>') == (0, 0)
    assert get_image_size('<img width="30" height="7" src="y"/>') == (30, 7)
    assert get_image_size('<img width="30"/>') == (30, 0)


def test_image_removal_criteria():
    small = '<img width="2" height="2" src="s"/>'
    ok = '<img width="100" height="100" src="o"/>'
    wide = '<img width="400" height="10" src="w"/>'
    noattr = '<img src="n"/>'
    assert image_removal_criteria(small, 5, 3.0)
    assert not image_removal_criteria(ok, 5, 3.0)
    assert image_removal_criteria(wide, 5, 3.0)
    assert image_removal_criteria(noattr, 0, 3.0)  # h==0 → drop, no crash
    assert not image_removal_criteria(noattr, 0, None)  # size-only passes 0


def test_remove_img_tag_literal():
    # metacharacters in src must not break removal (reference treats the
    # tag as a regex pattern and would crash/corrupt here)
    page = 'a <img src="x(1).png"/> b'
    assert remove_img_tag(page, '<img src="x(1).png"/>') == "a  b"


def test_strip_tags():
    assert strip_tags("<p>a</p><div>b</div>") == "\na\n\nb\n"


def test_remove_digits():
    assert remove_digits("t 7494 34-89 34.67 x") == "t  -  x"


def test_detect_language():
    assert detect_language("the cat sat on the mat and it was a good day") == "en"
    assert detect_language("привет мир это не просто текст что я с") == "ru"
    assert detect_language("") is None
