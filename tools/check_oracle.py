#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Replays what the driver does with CORRECTNESS_r{N}.json: registers the
testdata parquet as DuckDB views, runs each oracle_sql.json entry, and
compares (sorted columns, sorted rows) against the Spark result parquet
written by graft.Verify. Dev-only tool — NOT part of the Scala library.
"""
import sys, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str, budget_sec: float = 0.0) -> int:
    """budget_sec > 0 enables the per-query oracle wall-clock budget
    (sf1 pre-flight): an oracle SQL exceeding it is recorded SKIPPED
    (oracle-too-slow), not failed — several oracles are deliberately
    brute-force-quadratic recomputations (semantic pair sets, top-k
    cosine) whose DuckDB cost explodes at 10x data while the engine
    side stays sub-quadratic by design; those stay pinned at
    sf0.01/sf0.1 where the driver runs them."""
    import os, threading
    con = duckdb.connect()
    for tbl in TABLES:
        # driver testdata ships single files; ScaleUp (sf1) writes
        # Spark directories named <tbl>.parquet/ — glob those
        path = f"{sf_dir}/{tbl}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{path}')")
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    skipped = []
    for name, sql in sqls.items():
        try:
            if budget_sec > 0:
                timer = threading.Timer(budget_sec, con.interrupt)
                timer.start()
                try:
                    oracle = con.execute(sql).fetchdf()
                except duckdb.InterruptException:
                    print(f"{name}: SKIPPED (oracle exceeded {budget_sec:.0f}s budget)", flush=True)
                    skipped.append(name)
                    continue
                finally:
                    timer.cancel()
            else:
                oracle = con.execute(sql).fetchdf()
            spark = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"{name}: ERROR {e}")
            failed.append(name)
            continue
        o = oracle.reindex(sorted(oracle.columns), axis=1)
        s = spark.reindex(sorted(spark.columns), axis=1)
        if sorted(o.columns) != sorted(s.columns):
            print(f"{name}: SCHEMA MISMATCH oracle={sorted(o.columns)} spark={sorted(s.columns)}")
            failed.append(name)
            continue
        cols = sorted(o.columns)
        o = o.sort_values(by=cols).reset_index(drop=True)
        s = s.sort_values(by=cols).reset_index(drop=True)
        if o.equals(s):
            print(f"{name}: MATCH rows={len(o)}", flush=True)
        else:
            print(f"{name}: MISMATCH oracle_rows={len(o)} spark_rows={len(s)}")
            print("  oracle dtypes:", dict(o.dtypes.astype(str)))
            print("  spark  dtypes:", dict(s.dtypes.astype(str)))
            if len(o) == len(s):
                neq = (o != s) & ~(o.isna() & s.isna())
                bad = neq.any(axis=1)
                print("  first diff rows (oracle | spark):")
                print(o[bad].head(3))
                print(s[bad].head(3))
            failed.append(name)
    n_run = len(sqls) - len(skipped)
    print(f"\n{n_run - len(failed)}/{n_run} MATCH"
          + (f" ({len(skipped)} skipped on oracle budget: {skipped})"
             if skipped else "")
          + f"; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0
    sys.exit(main(sys.argv[1], sys.argv[2], budget))
