import duckdb, json, glob, sys, math
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracles = json.load(open(f"{out}/oracle_sql.json"))
def norm(df):
    df = df[sorted(df.columns)]
    def r(v):
        if isinstance(v, float):
            return round(v, 6)
        return v
    rows = sorted([tuple(r(v) for v in row) for row in df.itertuples(index=False)], key=lambda x: str(x))
    return rows
for name, sql in sorted(oracles.items()):
    try:
        spark_df = duckdb.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        ora_df = con.sql(sql).df()
        a, b = norm(spark_df), norm(ora_df)
        ok = a == b
        print(f"{name}: rows {len(a)} vs {len(b)} -> {'MATCH' if ok else 'MISMATCH'}")
        if not ok:
            for x, y in list(zip(a, b))[:5]:
                if x != y: print("  spark:", x, " oracle:", y)
    except Exception as e:
        print(f"{name}: ERROR {e}")
