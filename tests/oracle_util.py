"""Local stand-in for the driver's DuckDB oracle comparison.

Registers the parquet tables as DuckDB views, runs a query's Spark plan
and its oracle SQL, and compares row count + order-insensitive values
(column order normalized by name, doubles compared after the queries' own
rounding).
"""

from __future__ import annotations

import math

import duckdb

from alix_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    return v


def rows_normalized(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, con, sql: str) -> tuple[bool, str]:
    sdf = spark_df.toPandas()
    ddf = con.execute(sql).fetchdf()
    s_rows = rows_normalized(
        list(sdf.columns), [tuple(r) for r in sdf.itertuples(index=False)]
    )
    d_rows = rows_normalized(
        list(ddf.columns), [tuple(r) for r in ddf.itertuples(index=False)]
    )
    if sorted(sdf.columns) != sorted(ddf.columns):
        return False, f"columns differ: {sorted(sdf.columns)} vs {sorted(ddf.columns)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duck={len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            return False, f"row {i} differs:\n  spark={a}\n  duck ={b}"
    return True, "ok"
