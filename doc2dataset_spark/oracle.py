"""DuckDB dual-runner: the local correctness harness (SURVEY §7 phase 0).

Runs a declared query through Spark and its oracle SQL through DuckDB on the
same parquet tables, canonicalizes both results, and compares:
row count, column names, and order-insensitive values — mirroring the
driver's CORRECTNESS gate so failures surface locally first.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from doc2dataset_spark.session import TABLES

# documents/embeddings exist in testdata; register everything present.


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize dtypes, sort rows by all columns."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


@dataclass
class CompareResult:
    name: str
    ok: bool
    rows_spark: int
    rows_oracle: int
    detail: str = ""

    def __str__(self) -> str:  # pragma: no cover
        mark = "PASS" if self.ok else "FAIL"
        return f"[{mark}] {self.name}: spark={self.rows_spark} oracle={self.rows_oracle} {self.detail}"


def compare_frames(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> CompareResult:
    if sorted(sdf.columns) != sorted(odf.columns):
        return CompareResult(
            name, False, len(sdf), len(odf),
            f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}",
        )
    if len(sdf) != len(odf):
        return CompareResult(name, False, len(sdf), len(odf), "row count mismatch")
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            bad = 0
            worst = 0.0
            for x, y in zip(av, bv):
                if (isinstance(x, float) and math.isnan(x)) and (
                    isinstance(y, float) and math.isnan(y)
                ):
                    continue
                if x != y:
                    bad += 1
                    try:
                        worst = max(worst, abs(float(x) - float(y)))
                    except TypeError:
                        pass
            if bad:
                return CompareResult(
                    name, False, len(sdf), len(odf),
                    f"float col '{c}': {bad} mismatches, max abs diff {worst:g}",
                )
        else:
            neq = av.astype(str) != bv.astype(str)
            # treat None/nan as equal across engines
            both_null = av.isna() & bv.isna()
            neq = neq & ~both_null
            if neq.any():
                i = int(neq.idxmax())
                return CompareResult(
                    name, False, len(sdf), len(odf),
                    f"col '{c}' row {i}: spark={av[i]!r} oracle={bv[i]!r}",
                )
    return CompareResult(name, True, len(sdf), len(odf))


def run_compare(spark, sf_dir: str, name: str) -> CompareResult:
    """Run one registered query against its oracle and compare."""
    from doc2dataset_spark.queries import REGISTRY

    spec = REGISTRY[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    if spec.oracle is None:
        return CompareResult(name, True, len(sdf), -1, "(rows-only: no oracle)")
    con = duck_connect(sf_dir)
    odf = con.execute(spec.oracle).fetchdf()
    con.close()
    return compare_frames(name, sdf, odf)
