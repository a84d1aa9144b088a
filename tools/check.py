#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify.scala's
parquet dumps against the DuckDB oracle SQL and compare.

Usage: python3 tools/check.py <sfDir> <outDir>
(outDir = what graft.Verify wrote)."""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    # the driver's hash is dtype-sensitive: DuckDB sum(BIGINT) returning
    # HUGEINT -> pandas float64 vs Spark int64 is a FAIL even when every
    # value matches (round-1 q_json_props / q_text_stats). Cast in the SQL.
    dt = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
          if a[c].dtype.kind != b[c].dtype.kind]
    if dt:
        return f"DTYPE MISMATCH {dt}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    bad = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
            av = av.astype(float)
            bv = bv.astype(float)
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                d = (av - bv).abs().max()
                bad.append(f"{c}: {int(neq.sum())} values differ (maxabs={d})")
        else:
            neq = ~((av == bv) | (av.isna() & bv.isna()))
            if neq.any():
                bad.append(f"{c}: {int(neq.sum())} values differ")
    return "OK" if not bad else "VALUE MISMATCH " + "; ".join(bad)


def main(sf_dir: str, out_dir: str, json_out: str | None = None) -> None:
    import os
    import time
    skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
    # oracle-infra hardening (r16 verdict #6): big-SF oracle replays
    # spill — an unmanaged temp dir filled the root volume at sf10
    # (q_pq_recall ENOSPC) and the failure surfaced as a missing gate
    # row. Pin the spill location, pre-flight free space per oracle,
    # and bound each oracle's runtime; every infra failure is recorded
    # as an explicit "skipped: <reason>" row, never a silent hole.
    tmp_dir = os.environ.get("GRAFT_DUCKDB_TMP", "target/duckdb_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    min_free_gb = float(os.environ.get("GRAFT_MIN_FREE_GB", "5"))
    timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0"))  # 0 = none

    def fresh_connection():
        c = duckdb.connect()
        c.execute(f"SET temp_directory='{tmp_dir}'")
        if os.environ.get("GRAFT_DUCKDB_MEM"):
            c.execute(f"SET memory_limit='{os.environ['GRAFT_DUCKDB_MEM']}'")
        for t in TABLES:
            # v5 fixtures are DIRECTORIES of part files; testdata is
            # single files — glob dirs, read files as-is
            p = f"{sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        return c

    con = fresh_connection()

    def run_oracle(sql: str):
        """Returns (df, skip_reason). Timeout interrupts the query and
        leaves the connection reusable."""
        nonlocal con
        import shutil
        if shutil.disk_usage(tmp_dir).free / 1e9 < min_free_gb:
            return None, f"skipped: low_disk (<{min_free_gb} GB free in {tmp_dir})"
        if not timeout_s:
            return con.execute(sql).df(), None
        import threading
        box = {}
        worker_con = con
        def work():
            try:
                box["df"] = worker_con.execute(sql).df()
            except Exception as e:
                box["err"] = e
        th = threading.Thread(target=work, daemon=True)
        th.start()
        th.join(timeout_s)
        if th.is_alive():
            con.interrupt()
            th.join(30)
            if th.is_alive():
                # the worker ignored the interrupt — DuckDB connections
                # are not safe for concurrent use, so abandon this one
                # to the zombie thread and grade the remaining oracles
                # on a fresh connection (r17 advice)
                print("  [oracle_timeout: worker unresponsive, "
                      "recreating connection]")
                con = fresh_connection()
            return None, f"skipped: oracle_timeout ({timeout_s:.0f}s)"
        if "err" in box:
            raise box["err"]
        return box["df"], None
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    # a query that CRASHED in Verify leaves no output dir — without
    # this it would be silently skipped below and the n_ok/len summary
    # could read all-green over a partial run (r14 advice)
    verify_errors = {}
    err_path = f"{out_dir}/verify_errors.json"
    if os.path.isfile(err_path):
        with open(err_path) as f:
            verify_errors = json.load(f)
    n_ok = 0
    results = {}
    for name, sql in sorted(oracle.items()):
        if name in skip or (only and name not in only):
            continue
        # only grade queries the (possibly subset) Verify run attempted;
        # absent from BOTH the output dir and the error file = true
        # subset run, genuinely not attempted
        if json_out and not os.path.isdir(f"{out_dir}/{name}"):
            if name in verify_errors:
                print(f"{name}: SPARK CRASHED {verify_errors[name][:200]}")
                results[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"spark_crashed: {verify_errors[name][:200]}"}
            continue
        t0 = time.time()
        try:
            duck_df, skip_reason = run_oracle(sql)
            if skip_reason is not None:
                print(f"{name}: {skip_reason.upper()}")
                results[name] = {"rows_match": None, "schema_match": None,
                                 "hash_match": None, "spark_rows": None,
                                 "oracle_rows": None, "err": skip_reason}
                continue
        except Exception as e:
            reason = (f"skipped: enospc ({tmp_dir})"
                      if "No space left" in str(e) else f"duckdb: {str(e)[:200]}")
            print(f"{name}: DUCKDB ERROR {e}")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": None, "err": reason}
            continue
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"{name}: SPARK OUTPUT MISSING {e}")
            results[name] = {"rows_match": None, "schema_match": None,
                             "hash_match": None, "spark_rows": None,
                             "oracle_rows": len(duck_df), "err": "spark_missing"}
            continue
        res = compare(name, spark_df, duck_df)
        if res == "OK":
            n_ok += 1
        results[name] = {
            "rows_match": len(spark_df) == len(duck_df),
            "schema_match": "SCHEMA" not in res and "DTYPE" not in res,
            "hash_match": res == "OK",
            "spark_rows": len(spark_df), "oracle_rows": len(duck_df),
            "err": None if res == "OK" else res[:300],
        }
        print(f"{name}: {res} ({len(spark_df)} rows, "
              f"oracle {time.time() - t0:.1f}s)", flush=True)
    print(f"\n{n_ok}/{len(results) if json_out else len(oracle)} oracle queries match")
    # rows-only queries
    for d in sorted(os.listdir(out_dir)):
        full = f"{out_dir}/{d}"
        if os.path.isdir(full) and d not in oracle:
            try:
                n = len(pd.read_parquet(full))
                print(f"[rows-only] {d}: {n} rows" + (" !! EMPTY" if n == 0 else ""))
                if json_out:
                    results[d] = {"rows_match": n > 0, "schema_match": None,
                                  "hash_match": None, "spark_rows": n,
                                  "oracle_rows": None, "err": "no_oracle"}
            except Exception as e:
                print(f"[rows-only] {d}: READ ERROR {e}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
