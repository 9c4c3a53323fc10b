#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage:
  python3 scripts/selfcheck.py [sf_dir] [out_dir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sf_dir> <out_dir>"` (unless
   --skip-verify) to dump each SparkEntry query to parquet + oracle_sql.json.
2. Registers the sf_dir parquet tables as DuckDB views, runs each oracle
   SQL, and compares against the Spark parquet output: columns sorted by
   name, rows sorted, exact match for non-floats, tiny-tolerance report
   for floats.

NOTE: local dev tooling only (driver-side python/duckdb), not part of the
Scala library.
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_verify(sf_dir, out_dir):
    cmd = ["sbt", f'runMain graft.Verify {sf_dir} {out_dir}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.stderr.write(r.stderr[-4000:])
        sys.exit(f"sbt Verify failed rc={r.returncode}")


def norm_rows(cols, rows):
    """Sort columns by name, then rows; stringify for stable compare."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return [cols[i] for i in order], sorted(out, key=lambda t: tuple(str(x) for x in t))


def values_match(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(values_match(x, y) for x, y in zip(a, b))
    return a == b or str(a) == str(b)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-verify" not in sys.argv:
        run_verify(sf_dir, out_dir)

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    # --only=a,b,c: compare just those queries (fast per-edit loop when
    # the Spark dump was refreshed via SPARK_GRAFT_VERIFY_ONLY). The
    # full run (no flag) stays the gate.
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(x.strip() for x in a[len("--only="):].split(",") if x.strip())
    if only is not None:
        missing = only - set(oracle)
        if missing:
            sys.exit(f"--only names not in oracle_sql.json: {sorted(missing)}")
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir, f"{t}.parquet")
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        qdir = Path(out_dir, name)
        if not qdir.exists():
            results[name] = "NO-SPARK-OUTPUT"
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
            o_rel = con.sql(oracle[name])
            o_cols, o_rows = o_rel.columns, o_rel.fetchall()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            n_fail += 1
            continue
        s_cols_n, s_rows_n = norm_rows(s_cols, s_rows)
        o_cols_n, o_rows_n = norm_rows(o_cols, o_rows)
        if s_cols_n != o_cols_n:
            results[name] = f"SCHEMA-MISMATCH spark={s_cols_n} oracle={o_cols_n}"
            n_fail += 1
            continue
        if len(s_rows_n) != len(o_rows_n):
            results[name] = f"ROWCOUNT spark={len(s_rows_n)} oracle={len(o_rows_n)}"
            n_fail += 1
            continue
        bad = None
        exact = True
        for i, (sr, orr) in enumerate(zip(s_rows_n, o_rows_n)):
            if sr != orr:
                exact = False
                if not all(values_match(a, b) for a, b in zip(sr, orr)):
                    bad = (i, sr, orr)
                    break
        if bad:
            results[name] = f"VALUE-MISMATCH row{bad[0]} spark={bad[1]} oracle={bad[2]}"
            n_fail += 1
        else:
            results[name] = "PASS" if exact else "PASS(float-tol)"
            n_pass += 1

    for name, res in sorted(results.items()):
        print(f"{'OK ' if res.startswith('PASS') else 'BAD'} {name}: {res}")
    # queries without oracle: rows-only check (skipped under --only —
    # every non-selected dump dir would spam a rows-only line)
    for qdir in (sorted(Path(out_dir).iterdir()) if only is None else []):
        if qdir.is_dir() and qdir.name not in oracle:
            try:
                n = con.sql(f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
                print(f"--- {qdir.name}: rows-only ({n} rows)")
            except Exception as e:
                print(f"BAD {qdir.name}: rows-only ERROR {e}")
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(0 if n_fail == 0 else 1)


if __name__ == "__main__":
    main()
