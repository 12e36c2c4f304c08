"""CLI mirroring the reference's ``download()`` surface (`main.py:66-104`,
console entry `__init__.py:3-4` via fire — argparse here, same kwargs).

    python -m doc2dataset_spark.cli --url_list urls.csv --input_format csv \
        --output_folder out --output_format parquet --min_words_per_page 5
"""

from __future__ import annotations

import argparse
import dataclasses
import json

from doc2dataset_spark.config import DownloadConfig
from doc2dataset_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="doc2dataset_spark",
        description="PySpark-native document ETL (doc2dataset capabilities)",
    )
    for f in dataclasses.fields(DownloadConfig):
        name = f"--{f.name}"
        if f.type == "bool":
            p.add_argument(
                name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=f.default,
            )
        elif f.name == "save_additional_columns":
            p.add_argument(name, nargs="*", default=None)
        elif f.name == "verify_hash":
            p.add_argument(name, nargs=2, metavar=("COL", "TYPE"), default=None)
        elif f.name == "disallowed_header_directives":
            p.add_argument(name, nargs="*", default=None)
        else:
            default = (
                f.default
                if f.default is not dataclasses.MISSING
                else None
            )
            argtype = type(default) if default is not None else str
            if argtype is type(None):
                argtype = str
            p.add_argument(name, type=argtype, default=default)
    return p


def main(argv: list[str] | None = None) -> int:
    args = vars(build_parser().parse_args(argv))
    if args.get("verify_hash") is not None:
        args["verify_hash"] = tuple(args["verify_hash"])
    if args.get("disallowed_header_directives") is None:
        args.pop("disallowed_header_directives")
    if args.get("url_list") is None:
        raise SystemExit("--url_list is required")
    cfg = DownloadConfig(**args)
    cfg.validate()
    from doc2dataset_spark.plans.pipeline import download

    spark = get_spark(app_name="doc2dataset_spark_cli")
    summary = download(spark, cfg)
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
