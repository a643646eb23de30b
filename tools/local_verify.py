#!/usr/bin/env python3
"""Local pre-check of the driver's correctness gate: read Verify.scala's
parquet dumps, run each oracle SQL in DuckDB over the same source tables,
compare row counts + values (columns sorted by name, rows sorted).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    ok, bad = [], []
    names = sorted(p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json"))
    for name in names:
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            bad.append((name, f"spark output unreadable: {e}"))
            continue
        if name not in oracle:
            ok.append((name, f"rows-only ({len(got)} rows)"))
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            bad.append((name, f"ORACLE SQL FAILED: {e}"))
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            bad.append((name, f"columns differ: {list(g.columns)} vs {list(e.columns)}"))
            continue
        if len(g) != len(e):
            bad.append((name, f"row count {len(g)} vs {len(e)}"))
            continue
        try:
            import pandas as pd
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        except AssertionError as ex:
            bad.append((name, "VALUES differ: " + str(ex).replace("\n", " | ")[:300]))
            continue
        # Type parity: the driver's hash is type-KIND-sensitive. int32
        # vs int64 hashes the same (q24/q25 pass the driver green), but
        # DuckDB widening SUM(BIGINT) -> HUGEINT surfaces as pandas
        # object/float64 vs Spark's int64 and flips the hash (the q104
        # round-5 red row). Values matching is not enough.
        mismatched = [(c, str(g[c].dtype), str(e[c].dtype))
                      for c in g.columns if g[c].dtype.kind != e[c].dtype.kind]
        if mismatched:
            bad.append((name, "TYPES differ (values match): " + ", ".join(
                f"{c}: spark={a} oracle={b}" for c, a, b in mismatched)))
        else:
            ok.append((name, f"match ({len(g)} rows)"))
    for n, m in ok:
        print(f"  OK   {n}: {m}")
    for n, m in bad:
        print(f"  FAIL {n}: {m}")
    print(f"\n{len(ok)} ok, {len(bad)} fail")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
