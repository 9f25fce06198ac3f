#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark result parquet, sort
rows/columns, and compare exactly (with a float-proximity warning).

Usage: python3 tools/compare_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, json, glob, math, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    try:
        sdf = pd.read_parquet(f"{outdir}/{name}")
    except Exception as e:
        print(f"FAIL {name}: spark result missing {e}")
        fails += 1
        continue
    # sort columns by name, rows by all columns
    odf = odf[sorted(odf.columns)]
    sdf = sdf[sorted(sdf.columns)]
    if list(odf.columns) != list(sdf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs oracle {list(odf.columns)}")
        fails += 1
        continue
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rows {len(sdf)} vs oracle {len(odf)}")
        fails += 1
        continue
    odf = odf.sort_values(by=list(odf.columns)).reset_index(drop=True)
    sdf = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True)
    mismatch = None
    for c in odf.columns:
        oc, sc = odf[c], sdf[c]
        if oc.dtype.kind == "f" or sc.dtype.kind == "f":
            bad = ~(
                (oc.isna() & sc.isna())
                | (oc.astype(float) == sc.astype(float))
            )
            if bad.any():
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: spark={sc[i]!r} oracle={oc[i]!r}"
                break
        else:
            if not oc.astype(str).equals(sc.astype(str)):
                bad = oc.astype(str) != sc.astype(str)
                i = bad.idxmax()
                mismatch = f"col {c} row {i}: spark={sc[i]!r} oracle={oc[i]!r} (dtypes {sc.dtype}/{oc.dtype})"
                break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fails += 1
    else:
        # dtype sanity note
        dt = [f"{c}:{sdf[c].dtype}/{odf[c].dtype}" for c in odf.columns
              if str(sdf[c].dtype) != str(odf[c].dtype)]
        note = f" [dtype diff: {', '.join(dt)}]" if dt else ""
        print(f"PASS {name} ({len(odf)} rows){note}")
print(f"{fails} failures / {len(oracle)} queries")

# Harness-compatibility pass over EVERY dump, oracle or not: the driver
# sorts each dump's rows in pandas before hashing, which crashes on
# unhashable cell types (round 3: an ARRAY column made kg_events `err`
# before even a row count). Reproduce that sort locally so a dump the
# driver cannot ingest fails HERE, not in the round report.
harness_fails = 0
dumps = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
for name in dumps:
    try:
        sdf = pd.read_parquet(os.path.join(outdir, name))
        sdf = sdf[sorted(sdf.columns)]
        sdf.sort_values(by=list(sdf.columns))
        # the driver also hashes stringified cells: force the conversion
        for c in sdf.columns:
            hash(tuple(sdf[c].astype(str).head(50)))
    except Exception as e:
        print(f"HARNESS-FAIL {name}: {type(e).__name__}: {e}")
        harness_fails += 1
        continue
    if name not in oracle:
        print(f"HARNESS-OK {name} ({len(sdf)} rows, rows-only)")
print(f"{harness_fails} harness failures / {len(dumps)} dumps")
sys.exit(1 if (fails or harness_fails) else 0)
