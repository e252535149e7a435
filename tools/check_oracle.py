#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]

Expects graft.Verify to have been run first:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"

For each query: loads the Spark parquet result and the DuckDB oracle result,
sorts columns by name, sorts rows, and compares cell-by-cell. Reports EXACT /
CLOSE (float within 1e-9 rel) / MISMATCH so queries that silently rely on
float tolerance are visible before the driver grades them.
"""
import duckdb
import json
import math
import sys

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    return v


def compare(a_rows, b_rows):
    """Return (status, detail). Rows are lists of tuples, column-sorted."""
    if len(a_rows) != len(b_rows):
        return "MISMATCH", f"row count {len(a_rows)} vs {len(b_rows)}"
    exact = True
    maxrel = 0.0
    for ra, rb in zip(a_rows, b_rows):
        if len(ra) != len(rb):
            return "MISMATCH", f"col count {len(ra)} vs {len(rb)}"
        for va, vb in zip(ra, rb):
            if va is None and vb is None:
                continue
            if va is None or vb is None:
                return "MISMATCH", f"null vs value: {va!r} vs {vb!r}"
            if isinstance(va, float) or isinstance(vb, float):
                fa, fb = float(va), float(vb)
                if fa == fb or (math.isnan(fa) and math.isnan(fb)):
                    continue
                denom = max(abs(fa), abs(fb), 1e-30)
                rel = abs(fa - fb) / denom
                maxrel = max(maxrel, rel)
                if rel > 1e-9:
                    return "MISMATCH", f"float {fa!r} vs {fb!r} (rel {rel:.2e})"
                exact = False
            else:
                if str(va) != str(vb):
                    return "MISMATCH", f"{va!r} ({type(va).__name__}) vs {vb!r} ({type(vb).__name__})"
    if exact:
        return "EXACT", ""
    return "CLOSE", f"max float rel diff {maxrel:.2e}"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = sorted(
                con.sql(f"SELECT {', '.join(spark_cols)} FROM spark_rel ORDER BY ALL").fetchall(),
                key=repr)
            ora_rel = con.sql(oracle[name])
            ora_cols = sorted(ora_rel.columns)
            if spark_cols != ora_cols:
                print(f"  {name}: MISMATCH columns {spark_cols} vs {ora_cols}")
                n_bad += 1
                continue
            ora_rows = sorted(
                con.sql(f"SELECT {', '.join(ora_cols)} FROM ora_rel ORDER BY ALL").fetchall(),
                key=repr)
            status, detail = compare(spark_rows, ora_rows)
            flag = "" if status == "EXACT" else f"  [{detail}]"
            print(f"  {name}: {status} ({len(spark_rows)} rows){flag}")
            if status == "MISMATCH":
                n_bad += 1
        except Exception as e:
            print(f"  {name}: ERROR {e}")
            n_bad += 1
    print(("FAIL" if n_bad else "PASS") + f" ({len(oracle)} queries, {n_bad} bad)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
