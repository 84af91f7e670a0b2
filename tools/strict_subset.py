#!/usr/bin/env python3
"""Bit-exact oracle check for a SUBSET of queries.

Same comparison as strict_check.py (no float tolerance, dtype-kind gate,
NaN==NaN), but takes query names so a Verify run filtered to the queries
under iteration can be checked without ERR noise from the undumped rest:

    sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/v q1 q2"
    python3 tools/strict_subset.py /root/testdata/sf0.01 /tmp/v q1 q2
"""
import json, math, sys
import duckdb

sfd, out = sys.argv[1], sys.argv[2]
names = sys.argv[3:]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfd}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
if not names:
    names = sorted(oracle)

def flat(v):
    if hasattr(v, "tolist"):
        for x in v.tolist():
            yield from flat(x)
    elif isinstance(v, (list, tuple)):
        for x in v:
            yield from flat(x)
    else:
        yield v

bad = 0
for name in names:
    if name not in oracle:
        print(name, "ERR no oracle entry"); bad += 1; continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        ddf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(name, "ERR", str(e)[:120]); bad += 1; continue
    cols = sorted(sdf.columns)
    if sorted(ddf.columns) != cols or len(sdf) != len(ddf):
        print(name, "SHAPE", sorted(sdf.columns), sorted(ddf.columns),
              len(sdf), len(ddf)); bad += 1; continue
    knd = {"i": "int", "u": "int", "f": "float"}
    dt = [c for c in cols
          if knd.get(sdf[c].dtype.kind, sdf[c].dtype.kind)
          != knd.get(ddf[c].dtype.kind, ddf[c].dtype.kind)]
    if dt:
        print(name, "DTYPE",
              {c: (str(sdf[c].dtype), str(ddf[c].dtype)) for c in dt})
        bad += 1; continue
    sr = sorted([tuple(flat(r)) for r in
                 sdf[cols].itertuples(index=False, name=None)], key=str)
    dr = sorted([tuple(flat(r)) for r in
                 ddf[cols].itertuples(index=False, name=None)], key=str)

    # `x is y` admits singleton nulls (None, pd.NaT) as equal; plain ==
    # is False for NaT==NaT. zip_longest (ADVICE r8): zip() would
    # silently truncate when one flattened row is a strict prefix of
    # the other (intra-cell array length drift passes the shape gate).
    import itertools
    _MISS = object()
    def exact(x, y):
        if x is _MISS or y is _MISS:
            return False
        if x is y:
            return True
        if isinstance(x, float) and isinstance(y, float) \
                and math.isnan(x) and math.isnan(y):
            return True
        return x == y and isinstance(x, float) == isinstance(y, float)
    ne = sum(1 for a, b in zip(sr, dr)
             for x, y in itertools.zip_longest(a, b, fillvalue=_MISS)
             if not exact(x, y))
    print(name, "OK" if ne == 0 else f"{ne} NON-EXACT", len(sdf), "rows")
    bad += 1 if ne else 0
print(f"STRICT-SUBSET {sfd}: {len(names) - bad} bit-exact, {bad} bad")
sys.exit(1 if bad else 0)
