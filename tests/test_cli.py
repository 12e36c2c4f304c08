"""Packaging metadata: pyproject.toml vs the package itself."""

def test_pyproject_version_matches_package():
    """pyproject.toml cannot read __version__ without importing pyspark at
    build time, so the version is duplicated there — pin the two equal."""
    import os
    import tomllib

    import doc2dataset_spark

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
        meta = tomllib.load(fh)
    assert meta["project"]["version"] == doc2dataset_spark.__version__
    assert (
        meta["project"]["scripts"]["doc2dataset-spark"]
        == "doc2dataset_spark.cli:main"
    )


def test_cli_console_entry_help_exits_zero():
    """The pyproject console script points at cli:main; --help must work
    (the `pip install . && doc2dataset-spark --help` smoke, minus pip)."""
    import pytest

    from doc2dataset_spark.cli import main

    with pytest.raises(SystemExit) as ei:
        main(["--help"])
    assert ei.value.code == 0
