#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify, then run
each oracle SQL in DuckDB over the same testdata and compare result sets
(sorted columns, sorted rows, exact/tolerant values). Dev tool only.
"""
import json, math, sys, glob, os
import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# optional 3rd arg: comma-separated subset (matches Verify's subset arg)
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    spark_df = pq.read_table(files).to_pandas() if files else None
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error {e}")
        fails += 1
        continue
    if spark_df is None:
        print(f"FAIL {name}: no spark parquet files")
        fails += 1
        continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
        fails += 1
        continue
    # Driver-strict dtype gate: the driver's hash is type-aware, so an
    # integer-contract column that comes back float/object from one engine
    # (e.g. DuckDB HUGEINT from an uncast window sum) must FAIL here even
    # when the float-coerced values agree (the round-5 ta_pack class).
    dt_bad = None
    for c in s_cols:
        sk, dk = spark_df[c].dtype.kind, duck_df[c].dtype.kind
        # ints must stay ints on both sides; floats must stay floats.
        if (sk in "iu") != (dk in "iu") or (sk == "f") != (dk == "f"):
            dt_bad = (c, spark_df[c].dtype, duck_df[c].dtype)
            break
    if dt_bad:
        print(f"FAIL {name}: dtype col={dt_bad[0]} spark={dt_bad[1]} duck={dt_bad[2]}")
        fails += 1
        continue
    s = spark_df[s_cols].sort_values(s_cols).reset_index(drop=True)
    d = duck_df[d_cols].sort_values(d_cols).reset_index(drop=True)
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    bad = None
    for c in s_cols:
        for i in range(len(s)):
            a, b = s[c].iloc[i], d[c].iloc[i]
            if isinstance(a, float) or isinstance(b, float):
                af, bf = float(a), float(b)
                ok = (math.isnan(af) and math.isnan(bf)) or af == bf
            else:
                ok = str(a) == str(b)
            if not ok:
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(s)} rows")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
