"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle side-by-side, compare row count, column names, and
order-insensitive values (exact after normalization)."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


def _dtype_group(dtype) -> str:
    """Coarse dtype family used for the driver-fidelity check.

    The driver's value hash is dtype-sensitive: a DuckDB HUGEINT lands as
    float64 in its comparison frame while Spark emits int64, and the hashes
    diverge even when every value is numerically equal (the r07 x34 red row).
    Python `==` hides that (int 5 == float 5.0), so row comparison alone is
    not a faithful replica of the gate — we additionally require that each
    column's pandas dtype falls in the same family on both sides.
    """
    kind = getattr(dtype, "kind", "O")
    if kind in ("i", "u"):
        return "int"
    if kind == "f":
        return "float"
    if kind == "M":
        return "datetime"
    if kind == "b":
        return "bool"
    return "object"


def assert_dtype_compatible(sdf: pd.DataFrame, odf: pd.DataFrame, name: str = "?") -> None:
    mism = []
    for c in sorted(sdf.columns):
        sg, og = _dtype_group(sdf[c].dtype), _dtype_group(odf[c].dtype)
        if sg != og:
            mism.append((c, f"spark={sdf[c].dtype}({sg})", f"oracle={odf[c].dtype}({og})"))
    assert not mism, (
        f"{name}: dtype mismatch between Spark and oracle frames (the driver's "
        f"hash is dtype-sensitive — CAST the oracle to the Spark type): {mism}"
    )


def compare(spark, query_fn, oracle: str | None, sf_dir: str, name: str = "?") -> None:
    sdf = query_fn(spark, sf_dir).toPandas()
    if oracle is None:
        assert len(sdf) >= 0  # rows-only smoke
        return
    con = duck_connection(sf_dir)
    odf = con.execute(oracle).df()
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count spark={len(sdf)} oracle={len(odf)}"
    assert_dtype_compatible(sdf, odf, name)
    s_rows, o_rows = normalize(sdf), normalize(odf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[0]}"
