#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/compare.py <sfDir> <outDir> [--json <path>]

Loads each SparkEntry query result (parquet written by graft.Verify),
runs the corresponding oracle SQL from oracle_sql.json in DuckDB over
the same sf tables, sorts columns by name and rows by all columns, and
compares cell values exactly. Mirrors the driver's hash-match check so
parity bugs surface before the round gate runs.

With --json, also writes a per-query report in the driver's
CORRECTNESS_r*.json schema — used to commit the sf1 gate as a
machine-checkable artifact (CORRECTNESS_sf1.json) each round.
"""
import duckdb
import glob
import json
import math
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if a != a and b != b:  # NaN-ish (pandas NaT etc.)
            return True
    except Exception:
        pass
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    con = duckdb.connect()
    # big replays (sf10 recursive closures) spill past /tmp's ~74 GB —
    # DUCKDB_TMPDIR points the spill somewhere roomier (/dev/shm) and
    # DUCKDB_MEMLIMIT caps the buffer pool so box RAM covers both
    if os.environ.get("DUCKDB_TMPDIR"):
        con.execute(
            f"SET temp_directory='{os.environ['DUCKDB_TMPDIR']}'")
    if os.environ.get("DUCKDB_MEMLIMIT"):
        con.execute(
            f"SET memory_limit='{os.environ['DUCKDB_MEMLIMIT']}'")
    for t in TABLES:
        # partial SF dirs are legal for targeted scale-proof runs —
        # a query against a genuinely missing table fails in its own row
        if os.path.exists(f"{sfdir}/{t}.parquet"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # --only q1,q2 restricts the replay (single-query retries of
    # oracle-heavy entries without re-running the rest); --threads N
    # bounds DuckDB's operator parallelism (transient memory) for them
    if "--only" in sys.argv:
        keep = set(sys.argv[sys.argv.index("--only") + 1].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    if "--threads" in sys.argv:
        con.execute(
            f"SET threads={int(sys.argv[sys.argv.index('--threads') + 1])}")
    n_pass = n_fail = 0
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, False, None, None, None, None, "no_spark_output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            record(name, None, None, None, len(got), None,
                   f"oracle_error: {e}")
            n_fail += 1
            continue
        got, exp = canon(got), canon(exp)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            record(name, None, False, None, len(got), len(exp), None)
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            record(name, False, True, None, len(got), len(exp), None)
            n_fail += 1
            continue
        bad = []
        for c in got.columns:
            # The driver hashes serialized values, so an int64 Spark column
            # vs a float64 oracle column (e.g. DuckDB HUGEINT from SUM over
            # integers) mismatches even when == passes. Mirror that.
            if got[c].dtype.kind != exp[c].dtype.kind:
                bad.append((c, "dtype", str(got[c].dtype), str(exp[c].dtype)))
                break
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (g, e) in enumerate(zip(gv, ev)):
                if not cells_equal(g, e):
                    bad.append((c, i, g, e))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ diffs, first: {bad[:3]}")
            record(name, True, True, False, len(got), len(exp), None)
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            record(name, True, True, True, len(got), len(exp), None)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
