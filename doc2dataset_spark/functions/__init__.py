"""Column-level functions: text extraction regexes, hashing, image-tag
parsing — the reference's per-row transform layer re-expressed as native
Spark expressions (JVM-side, codegen'd) with pure-Python twins for use
inside extraction UDFs and for unit oracles."""

from doc2dataset_spark.functions.text import (  # noqa: F401
    ALL_TAGS_RE,
    ANY_WORD_RE,
    IMG_TAG_RE,
    count_words,
    count_words_col,
    detect_language,
    get_image_size,
    images_in_page,
    images_in_page_col,
    remove_digits,
    remove_digits_col,
    remove_img_tag,
    strip_tags,
)
