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
def canon_type(t):
    # Canonicalize declared types into their pandas-coercion class: the
    # driver's hash is computed over coerced values, so BIGINT vs INTEGER or
    # DOUBLE vs DECIMAL(24,2) hash identically — but HUGEINT coerces to
    # float64 (not int64) and MUST stay a distinct class: a bare sum() over
    # integers in a DuckDB oracle types HUGEINT and fails the driver's hash
    # even when every value is identical (the round-7 lesson).
    s = str(t)
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "DOUBLE") or s.startswith("DECIMAL"):
        return "float"
    return s
def coltypes(rel):
    return sorted(zip(rel.columns, [canon_type(t) for t in rel.types]))
for name, sql in sorted(oracles.items()):
    try:
        spark_rel = duckdb.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
        ora_rel = con.sql(sql)
        ta, tb = coltypes(spark_rel), coltypes(ora_rel)
        spark_df, ora_df = spark_rel.df(), ora_rel.df()
        a, b = norm(spark_df), norm(ora_df)
        ok = a == b and ta == tb
        print(f"{name}: rows {len(a)} vs {len(b)} -> {'MATCH' if ok else 'MISMATCH'}")
        if ta != tb:
            for (ca, va), (cb, vb) in zip(ta, tb):
                if (ca, va) != (cb, vb):
                    print(f"  TYPE-MISMATCH spark {ca}:{va}  oracle {cb}:{vb}")
        if a != b:
            for x, y in list(zip(a, b))[:5]:
                if x != y: print("  spark:", x, " oracle:", y)
    except Exception as e:
        print(f"{name}: ERROR {e}")
