#!/usr/bin/env python3
"""Dev-loop oracle compare: run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.

Usage: python3 tools/compare.py <sfDir> <outDir>
Mirrors the driver's check: for each query, sort columns by name, sort rows,
string-compare against the DuckDB result of oracle_sql.json[name].
"""
import duckdb, json, glob, os, sys

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sf_dir, '*.parquet')):
    name = os.path.basename(f).replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(out_dir, 'oracle_sql.json')))
fails = 0
for name, sql in sorted(oracle.items()):
    pq = os.path.join(out_dir, name, '*.parquet')
    try:
        spark_df = duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{pq}')").df()
    except Exception as e:
        print(f"{name}: NO-SPARK-OUTPUT {e}"); fails += 1; continue
    try:
        o = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE-ERR {e}"); fails += 1; continue
    # stringify array/list cells so sort_values can order them
    for df in (spark_df, o):
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].map(lambda v: str(list(v)) if hasattr(v, '__len__') and not isinstance(v, str) else v)
    cols = sorted(spark_df.columns)
    if cols != sorted(o.columns):
        print(f"{name}: SCHEMA-MISMATCH spark={cols} oracle={sorted(o.columns)}")
        fails += 1; continue
    sc = spark_df.reindex(cols, axis=1).sort_values(by=cols).reset_index(drop=True)
    oc = o.reindex(cols, axis=1).sort_values(by=cols).reset_index(drop=True)
    ok = sc.shape == oc.shape and (sc.astype(str).values == oc.astype(str).values).all()
    print(f"{name}: {'MATCH' if ok else 'MISMATCH'} {sc.shape}")
    if not ok:
        fails += 1
        if sc.shape == oc.shape:
            diff = (sc.astype(str).values != oc.astype(str).values)
            print(' spark:'); print(sc[diff.any(axis=1)].head(3))
            print(' oracle:'); print(oc[diff.any(axis=1)].head(3))
sys.exit(1 if fails else 0)
