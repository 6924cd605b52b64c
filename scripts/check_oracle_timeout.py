#!/usr/bin/env python3
"""check_oracle.py variant for the sf1 heavy-tail sweeps: identical
canonicalization/compare, but each oracle statement runs in its OWN
subprocess with a wall-clock timeout so one pathological DuckDB plan
at 10x data cannot wedge the whole sweep. Usage:
  check_oracle_timeout.py SF_DIR OUT_DIR [TIMEOUT_S]
"""
import json
import math
import multiprocessing as mp
import sys

import pyarrow.parquet as pq


def canon(df):
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


TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def run_oracle(sf_dir, sql, q):
    import duckdb
    import os
    import re
    # Spark-written tables (ScaleUp's lineitem/documents) are parquet
    # DIRECTORIES; DuckDB needs a glob for those, single files stay as-is
    def glob_of(path):
        return path + "/*.parquet" if os.path.isdir(path) else path

    def fix(m):
        return "'" + glob_of(m.group(1)) + "'"
    sql = re.sub(r"'([^']+\.parquet)'", fix, sql)
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    # same views as check_oracle.py so bare-table oracle SQL (anything
    # not path-inlined by Verify) also resolves against sf_dir
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob_of(p)}'")
    df = con.execute(sql).df()
    q.put((canon(df), {c: df.dtypes[c].kind for c in df.columns}))


def main(sf_dir, out_dir, timeout_s):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    green = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pq.read_table(f"{out_dir}/{name}").to_pandas()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})", flush=True)
            n_fail += 1
            continue
        # consume the queue BEFORE join: a child flushing a large result
        # into the queue's pipe blocks until the parent reads — a parent
        # sitting in join() first deadlocks on any result > pipe buffer
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf_dir, sql, q))
        p.start()
        import time
        deadline = time.monotonic() + timeout_s
        result = None
        while time.monotonic() < deadline:
            try:
                result = q.get(timeout=1)
                break
            except Exception:
                if not p.is_alive() and q.empty():
                    break  # crashed without producing
        if result is None:
            # the child may have enqueued its result in the instant the
            # deadline expired — drain once before declaring a timeout
            try:
                result = q.get_nowait()
            except Exception:
                pass
        if result is None:
            if p.is_alive():
                p.terminate()
                p.join()
                print(f"TIMEOUT {name}: oracle exceeded {timeout_s}s", flush=True)
            else:
                p.join()
                print(f"FAIL {name}: oracle crashed (exit {p.exitcode})", flush=True)
            n_fail += 1
            continue
        p.join()
        (want_cols, want_rows), want_kinds = result
        got_cols, got_rows = canon(got)
        # dtype-KIND check, same as check_oracle.py: DuckDB sum(int)
        # arrives HUGEINT -> float64 and %.17g masks "3.0" vs "3" —
        # int-vs-float skew must fail here like the driver's gate would
        gk = {c: got.dtypes[c].kind for c in got.columns}
        grp = lambda k: "i" if k in "iu" else k
        kind_diff = {c: (gk[c], want_kinds[c]) for c in gk
                     if c in want_kinds and grp(gk[c]) != grp(want_kinds[c])}
        if sorted(got_cols) != sorted(want_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} vs {sorted(want_cols)}",
                  flush=True)
            n_fail += 1
        elif kind_diff:
            print(f"FAIL {name}: dtype kinds differ {kind_diff}", flush=True)
            n_fail += 1
        elif got_rows != want_rows:
            diff = sum(1 for a, b in zip(got_rows, want_rows) if a != b)
            diff += abs(len(got_rows) - len(want_rows))
            print(f"FAIL {name}: {len(got_rows)} vs {len(want_rows)} rows, "
                  f"{diff} differing", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)", flush=True)
            n_pass += 1
            green.append(name)
    # the machine-readable green list: check_plan_drift.py --update
    # --verified points here, so a baseline promote can only assert
    # queries THIS checker actually compared and passed
    with open(f"{out_dir}/.oracle_green", "w") as f:
        f.write("".join(n + "\n" for n in green))
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    t = int(sys.argv[3]) if len(sys.argv) > 3 else 900
    sys.exit(main(sys.argv[1], sys.argv[2], t))
