#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's t2 correctness gate.

Runs AFTER `graft.Verify` has dumped per-query parquet + oracle_sql.json
to OUT_DIR: executes each oracle SQL in DuckDB against the sf parquet
tables and compares to the Spark result (columns sorted by name, rows
sorted, values hashed loosely: exact for ints/strings, tolerant only in
formatting for floats — values must be equal after round-trip through
repr). Usage: check_oracle.py SF_DIR OUT_DIR
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    # pandas frame -> column-name-sorted, row-sorted list of tuples
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        row = []
        for v in t:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(f"{v:.17g}")
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return df.columns.tolist(), rows


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        gc, gr = canon(got)
        wc, wr = canon(want)
        # Kind check: DuckDB sum(int) yields HUGEINT -> pandas float64,
        # which the driver stringifies as "3.0" vs Spark's BIGINT "3" and
        # hash-mismatches even though %.17g formatting hides it here
        # (bit us on q28 in round 1). Compare dtype *kinds* so int-vs-float
        # (and datetime-vs-anything) skew is caught, while int32-vs-int64
        # width differences stay tolerated.
        gk = {c: got.dtypes[c].kind for c in got.columns}
        wk = {c: want.dtypes[c].kind for c in want.columns}
        grp = lambda k: "i" if k in "iu" else k
        kind_diff = {c: (gk[c], wk[c]) for c in gk
                     if c in wk and grp(gk[c]) != grp(wk[c])}
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} duck={wc}")
            n_fail += 1
        elif kind_diff:
            print(f"FAIL {name}: dtype kinds differ {kind_diff}")
            n_fail += 1
        elif gr != wr:
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            print(f"FAIL {name}: rows differ (spark={len(gr)} duck={len(wr)}) first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
