# Dev-only local twin of the driver's correctness gate: compare Verify's
# parquet dumps against the DuckDB oracle (rows / schema / value hash,
# columns sorted by name, rows sorted by all columns). Run:
#   sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify [names]"
#   python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify [names]
import sys, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

sf, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def vhash(df):
    body = df.to_csv(index=False, float_format="%.10g")
    return hashlib.md5(body.encode()).hexdigest()


fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name:24s} MISSING spark dump")
        fails += 1
        continue
    spark_df = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
    try:
        ora_df = canon(con.execute(sql).fetchdf())
    except Exception as e:
        print(f"{name:24s} ORACLE ERR {str(e)[:120]}")
        fails += 1
        continue
    rows_ok = len(spark_df) == len(ora_df)
    schema_ok = list(spark_df.columns) == list(ora_df.columns)
    hash_ok = rows_ok and schema_ok and vhash(spark_df) == vhash(ora_df)
    status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name:24s} {status} rows={len(spark_df)}/{len(ora_df)} schema={schema_ok} hash={hash_ok}")
        if rows_ok and schema_ok and not hash_ok and len(spark_df) == len(ora_df):
            diff = (spark_df != ora_df) & ~(spark_df.isna() & ora_df.isna())
            bad = diff.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                print("  spark:", spark_df.loc[i].to_dict())
                print("  oracle:", ora_df.loc[i].to_dict())
    else:
        print(f"{name:24s} OK rows={len(spark_df)}")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
