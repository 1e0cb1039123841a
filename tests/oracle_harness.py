"""Local replica of the driver's correctness gate: run the Spark query and
the DuckDB oracle on the same parquet tables, normalize, compare values.

Normalization mirrors the driver: sort columns by name, then sort rows by
all columns; exact value equality (Decimal/int/str), tolerant only of float
representation (compared via repr of round-tripped doubles).
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

from realtimedatawarehouse_self_spark.sources.tables import TABLES


def register_duckdb_views(con, sf_dir: str) -> None:
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{path}'"
            )


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, int):
        return int(v)
    return str(v)


def _normalize(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, out


def compare_query(spark_df, duck_con, sql: str):
    """Return (ok, detail) comparing a Spark DataFrame against oracle SQL."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = duck_con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    _, sn = _normalize(s_cols, s_rows)
    _, dn = _normalize(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(sn, dn)):
        if a != b:
            return False, f"row {i} mismatch:\n  spark={a}\n  duck ={b}"
    return True, f"ok ({len(s_rows)} rows)"
