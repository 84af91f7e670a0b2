import json, math, sys
import duckdb
sfd, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfd}/{t}.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
def flat(v):
    if hasattr(v, "tolist"):
        for x in v.tolist(): yield from flat(x)
    elif isinstance(v,(list,tuple)):
        for x in v: yield from flat(x)
    else: yield v
bad = 0
for name, sql in sorted(oracle.items()):
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        print(name, "ERR", str(e)[:90]); bad += 1; continue
    cols = sorted(sdf.columns)
    if sorted(ddf.columns) != cols or len(sdf) != len(ddf):
        print(name, "SHAPE", len(sdf), len(ddf)); bad += 1; continue
    # Dtype gate: the driver's hash compare flags int-vs-float repr drift
    # (e.g. DuckDB HUGEINT fetched as float64 vs Spark BIGINT) even when
    # Python would say 1008.0 == 1008. Compare numeric kinds per column.
    knd = {"i": "int", "u": "int", "f": "float"}
    dt = [c for c in cols
          if knd.get(sdf[c].dtype.kind, sdf[c].dtype.kind)
          != knd.get(ddf[c].dtype.kind, ddf[c].dtype.kind)]
    if dt:
        print(name, "DTYPE", {c: (str(sdf[c].dtype), str(ddf[c].dtype)) for c in dt})
        bad += 1; continue
    sr = sorted([tuple(flat(r)) for r in sdf[cols].itertuples(index=False, name=None)], key=str)
    dr = sorted([tuple(flat(r)) for r in ddf[cols].itertuples(index=False, name=None)], key=str)
    def isf(v): return isinstance(v, float)
    # `x is y` admits singleton nulls (None, pd.NaT); zip_longest guards
    # against silent truncation on intra-cell array length drift (ADVICE r8).
    import itertools
    _MISS = object()
    ne = sum(1 for a,b in zip(sr,dr)
             for x,y in itertools.zip_longest(a, b, fillvalue=_MISS)
             if not (x is not _MISS and y is not _MISS and
                     ((x is y) or (x==y and isf(x)==isf(y)) or
                      (isf(x) and isf(y) and math.isnan(x) and math.isnan(y)))))
    if ne: print(name, ne, "NON-EXACT"); bad += 1
print(f"STRICT {sfd}: {len(oracle)-bad} bit-exact, {bad} bad")
sys.exit(1 if bad else 0)  # so gate.sh's `|| rc=1` actually fires
