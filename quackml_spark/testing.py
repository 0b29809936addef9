"""Oracle-parity harness mirroring the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet directory and compares row count, column-name set, and values
(columns sorted by name, rows sorted — order-insensitive, like the
driver's value-hash). Used by tests/test_oracle_parity.py so every
declared query is verified locally before the driver ever sees it.
"""

from __future__ import annotations

import atexit
import math
import os
import shutil
import tempfile

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _spill_dir() -> str:
    """Per-process DuckDB spill directory, removed at interpreter exit.

    Large-SF oracle replays can spill tens of GB; by default DuckDB
    leaves ``duckdb_temp_storage-*.tmp`` behind on abnormal exit. A
    per-run tempdir with an atexit purge keeps the sandbox disk clean
    no matter how the sweep terminates.
    """
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
    os.makedirs(base, exist_ok=True)
    d = tempfile.mkdtemp(prefix="duckdb_spill_", dir=base)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"SET temp_directory='{_spill_dir()}'")
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        # the driver testdata ships single files; Spark-written tables
        # (tools/make_scale.py output) are DIRECTORIES of part files
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{pattern}')"
        )
    return con


def _canon_cell(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        # round-trip repr: bit-identical doubles canonicalize identically
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_canon_cell(x) for x in v))
    return ("s", str(v))


def _canon_rows(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    out = [tuple(_canon_cell(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str):
    """Return (ok, message) comparing a Spark DataFrame to a DuckDB query."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(oracle_sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs = _canon_rows(s_cols, s_rows)
    cd = _canon_rows(d_cols, d_rows)
    if cs != cd:
        diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
