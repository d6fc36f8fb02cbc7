"""Local replica of the driver's DuckDB-oracle comparison."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s) or s.dtype == object:
            df[c] = s.astype(object).where(pd.notna(s), None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
    return df.sort_values(by=list(df.columns), na_position="first",
                          kind="mergesort").reset_index(drop=True)


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str) -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}")
    assert len(spark_df) == len(oracle_df), (
        f"{name}: row count {len(spark_df)} vs {len(oracle_df)}")
    a = _normalize(spark_df)
    b = _normalize(oracle_df)
    for c in a.columns:
        # The driver hashes VALUES, so an int64 Spark column vs a
        # float64 oracle column (DuckDB HUGEINT -> fetchdf float64)
        # is a hash mismatch even when 7991 == 7991.0.  Reproduce that
        # strictness locally: integer-vs-float dtype is a hard failure
        # (fix the oracle with CAST(... AS BIGINT)).
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        assert not ((ai and bf) or (af and bi)), (
            f"{name}: column {c} dtype mismatch spark={a[c].dtype} "
            f"oracle={b[c].dtype} — the driver's value-hash will differ; "
            f"CAST the oracle aggregate to BIGINT (or emit float on both sides)")
        av, bv = a[c].values, b[c].values
        if pd.api.types.is_float_dtype(a[c]) and pd.api.types.is_float_dtype(b[c]):
            ok = (av == bv) | (np.isnan(av.astype(float)) & np.isnan(bv.astype(float)))
        else:
            ok = np.array([x == y or (x is None and y is None)
                           or (x != x and y != y)  # NaN
                           for x, y in zip(av.tolist(), bv.tolist())])
        assert ok.all(), (
            f"{name}: column {c} differs at rows {np.where(~ok)[0][:5]}: "
            f"spark={av[~ok][:5]} oracle={bv[~ok][:5]}")
