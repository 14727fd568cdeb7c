import duckdb, json, glob, os, hashlib
sf = "/root/testdata/sf0.01"
out = "/tmp/verifyout"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out}/oracle_sql.json"))
def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float): return f"{v:.9g}"
    if isinstance(v, bool): return str(int(v))
    return str(v)
results = {}
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        results[name] = f"ORACLE ERR: {str(e).splitlines()[0][:120]}"
        continue
    sdir = f"{out}/{name}"
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{sdir}/*.parquet')").fetchdf()
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
    oh = hashlib.md5("\n".join(",".join(norm(v) for v in row) for row in odf[ocols].itertuples(index=False)).encode()).hexdigest()
    sh = hashlib.md5("\n".join(",".join(norm(v) for v in row) for row in sdf[scols].itertuples(index=False)).encode()).hexdigest()
    results[name] = "OK" if oh == sh else f"HASH MISMATCH ({len(odf)} rows)"
bad = {k: v for k, v in results.items() if v != "OK"}
print(f"{sum(1 for v in results.values() if v=='OK')}/{len(results)} OK")
for k, v in bad.items(): print(f"  {k}: {v}")
