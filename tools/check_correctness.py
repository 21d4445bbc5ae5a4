#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only; the
engine itself is pure Scala/Spark). For each query dumped by graft.Verify:
read the Spark parquet result, run the oracle SQL in DuckDB over the sf
tables, sort columns by name + rows by all columns, and compare exactly.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # Verify writes manifest.json = the queries THIS run attempted (and
    # pre-deletes their stale dirs). Compare against the manifest, not
    # directory existence, so a reused out_dir can't pass a now-throwing
    # query on an earlier run's parquet.
    manifest_path = f"{out_dir}/manifest.json"
    manifest = set(json.load(open(manifest_path))) if os.path.exists(manifest_path) else None
    produced = {n for n in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, n))}
    if manifest is not None:
        for name in sorted(produced - manifest):
            print(f"  {name}: not in this run's manifest — ignored (stale?)")
        produced &= manifest
        missing = manifest - produced
    else:
        missing = set(oracles) - produced
    for name in sorted(missing):
        print(f"✗ {name}: NO SPARK RESULT (query threw in Verify?)")
        n_bad += 1
    for name in sorted(produced):
        qdir = os.path.join(out_dir, name)
        files = glob.glob(f"{qdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True) \
            if files else pd.DataFrame()
        if name not in oracles:
            print(f"  {name}: rows-only check, rows={len(got)}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"✗ {name}: ORACLE SQL ERROR: {e}")
            n_bad += 1
            continue
        g, w = norm(got), norm(want)
        try:
            pd.testing.assert_frame_equal(g, w, check_exact=True, check_dtype=False)
            # dtype check separately, with int/float distinction surfaced
            gt = [str(t) for t in g.dtypes]; wt = [str(t) for t in w.dtypes]
            flag = "" if gt == wt else f"  [dtypes spark={gt} duck={wt}]"
            print(f"✓ {name}: {len(g)} rows{flag}")
            n_ok += 1
        except AssertionError as e:
            n_bad += 1
            print(f"✗ {name}: MISMATCH rows spark={len(g)} duck={len(w)}")
            print("   ", str(e).replace("\n", "\n    ")[:1500])
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
