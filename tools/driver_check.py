#!/usr/bin/env python3
"""Driver-FAITHFUL correctness comparator (round-8 retro).

`strict_check.py` is stricter on arithmetic (exact equality, no float
tolerance) but LAXER on representation than the round driver: it
flattens nested values and str-sorts rows, so it passed queries whose
raw array columns / out-of-range timestamps broke the driver's
pandas-based comparator (round 8: `scalar_array`, `ml_feature_hash`
pandas `sort_values` TypeError; `scd2_upsert` year-9999 `valid_to`
hash divergence). This tool replicates the driver's pandas path so a
representational regression fails LOCALLY first:

  * Spark result loaded with pandas.read_parquet (pyarrow -> pandas
    dtype round-trip, the path where year-9999 overflows ns range),
  * oracle SQL run in DuckDB, fetchdf() into pandas,
  * both frames sorted with pandas sort_values over ALL columns
    (raises on unsortable array/object cells, exactly as the driver
    does),
  * per-row value hash over the canonical cell representation.

Run BOTH tools as the local gate:
    python3 tools/strict_check.py  <sfDir> <verifyOutDir>
    python3 tools/driver_check.py  <sfDir> <verifyOutDir>
"""
import datetime
import hashlib
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def cell_repr(v):
    """Canonical string for one cell AFTER the pandas dtype round-trip.
    Engine-neutral: equal post-pandas values (incl. tz-normalized
    timestamps) produce equal strings; NaN/NaT/None all map to NULL."""
    if v is None:
        return "NULL"
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"  # driver-style: NaN and NULL both unrepresentable
        if math.isinf(f):
            return "Inf" if f > 0 else "-Inf"  # int(f) would raise
        if f == int(f) and abs(f) < 2**53:
            return str(int(f))  # 3.0 == 3 across engine float/int drift
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return ts.isoformat()
    if isinstance(v, datetime.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return str(v)


def canon(df):
    """Sort columns by name, rows by all columns — the driver's shape.
    sort_values RAISES on array/object cells it cannot order; that is
    the faithful behavior (the driver records `err`)."""
    cols = sorted(df.columns)
    out = df[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    return cols, out


def frame_hash(df, cols):
    h = hashlib.sha256()
    for row in df[cols].itertuples(index=False, name=None):
        for v in row:
            try:
                if pd.isna(v):
                    h.update(b"NULL")
                else:
                    h.update(cell_repr(v).encode())
            except (TypeError, ValueError):  # pd.isna on array-likes
                h.update(cell_repr(v).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def main(sf_dir, out_dir, only=()):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None}
        try:
            sdf = pd.read_parquet(f"{out_dir}/{name}")
            ddf = con.execute(sql).fetchdf()
            sc, s2 = canon(sdf)
            dc, d2 = canon(ddf)
            rec["schema_match"] = sc == dc
            rec["rows_match"] = len(s2) == len(d2)
            if rec["schema_match"] and rec["rows_match"]:
                rec["hash_match"] = frame_hash(s2, sc) == frame_hash(d2, dc)
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:140]}")
            n_bad += 1
            continue
        if rec["schema_match"] and rec["rows_match"] and rec["hash_match"]:
            n_ok += 1
        else:
            print(f"FAIL {name}: {rec}  rows {len(s2)} vs {len(d2)}")
            n_bad += 1
    print(f"DRIVER-FAITHFUL {sf_dir}: {n_ok} green, {n_bad} not")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))
