"""Local board checker, hardened to MIRROR the driver's compare
(round-8 postmortem: the old version compared rows unsorted with
%.9g float normalization, which masked two divergences the driver
caught — DuckDB HUGEINT rendering 382.0 vs Spark bigint 382, and an
array<double> column the driver's pandas differ cannot hash).

Driver-faithful rules enforced here:
  1. rows are SORTED (by all columns, as formatted strings) before
     hashing — declarations must not rely on ORDER BY alone;
  2. the hash is DTYPE-SENSITIVE: each column's pandas dtype kind is
     part of the hash, and float values keep a trailing .0 when
     integral (pandas' own rendering), so an un-CAST DuckDB
     sum()->HUGEINT/DECIMAL (float64/object in pandas) can never
     hash-equal a Spark BIGINT;
  3. any array/struct/ndarray-valued output column is a HARD FAIL —
     the driver's differ dies on them, so they must never ship.

Usage: python3 tools/oracle_check.py [sf_dir] [out_dir] [only,names]
"""
import duckdb, json, os, sys, hashlib
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verifyout"
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    # dtype-faithful scalar rendering: floats keep a .0 when integral
    # (pandas prints 382.0, not 382), ints never grow one.
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        if v != v:
            return "NaN"
        f = float(v)
        if f in (float("inf"), float("-inf")):
            return str(f)
        return f"{f:.1f}" if f == int(f) and abs(f) < 1e15 else f"{f:.9g}"
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.ndarray, list, dict, tuple)):
        raise TypeError(f"non-scalar cell {type(v).__name__}")
    # pandas NaT / duckdb decimal / timestamps all go through str()
    s = str(v)
    return "NULL" if s in ("NaT", "None") else s

def frame_fingerprint(df, cols):
    """(dtype signature, md5 of sorted formatted rows). Raises
    TypeError on any non-scalar cell (driver-differ parity)."""
    sub = df[cols]
    kinds = []
    for c in cols:
        k = sub[c].dtype.kind  # i/u=int f=float O=object b=bool M=ts
        if k == "O":
            # object column: every value must render as a scalar;
            # ndarray/list cells raise inside norm()
            kinds.append("O")
        else:
            kinds.append(k)
    rows = sorted(
        ",".join(norm(v) for v in row)
        for row in sub.itertuples(index=False))
    h = hashlib.md5(("|".join(kinds) + "\n"
                     + "\n".join(rows)).encode()).hexdigest()
    return "|".join(kinds), h

results = {}
items = sorted((n, q) for n, q in oracle.items()
               if only is None or n in only)
for name, sql in items:
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE ERR: {str(e).splitlines()[0][:120]}"
        continue
    sdir = f"{out}/{name}"
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{sdir}/*.parquet')").fetchdf()
    except Exception as e:
        results[name] = f"SPARK READ ERR: {e}"
        continue
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        results[name] = f"SCHEMA MISMATCH spark={scols} oracle={ocols}"
        continue
    if len(odf) != len(sdf):
        results[name] = f"ROWS MISMATCH spark={len(sdf)} oracle={len(odf)}"
        continue
    try:
        okinds, oh = frame_fingerprint(odf, ocols)
    except TypeError as e:
        results[name] = f"ORACLE NON-SCALAR COLUMN: {e}"
        continue
    try:
        skinds, sh = frame_fingerprint(sdf, scols)
    except TypeError as e:
        results[name] = f"SPARK NON-SCALAR COLUMN: {e}"
        continue
    if okinds != skinds:
        results[name] = (f"DTYPE MISMATCH spark={skinds} oracle={okinds} "
                         f"cols={ocols}")
        continue
    results[name] = ("OK" if oh == sh
                     else f"HASH MISMATCH ({len(odf)} rows)")
bad = {k: v for k, v in results.items() if v != "OK"}
print(f"{sum(1 for v in results.values() if v == 'OK')}/{len(results)} OK")
for k, v in bad.items():
    print(f"  {k}: {v}")
sys.exit(1 if bad else 0)
