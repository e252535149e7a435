#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB correctness gate (str-hash semantics).

Usage: python3 tools/check_oracle.py [sfDir] [verifyOutDir]

Expects graft.Verify to have been run first:
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"

Reproduces the driver's hash procedure as observed from CORRECTNESS_r01.json:
the Spark result is loaded with pandas.read_parquet (so parquet DECIMAL ->
decimal.Decimal objects, DATE -> datetime.date, TIMESTAMP -> datetime64[ns]),
the oracle runs in DuckDB and is fetched with .df() (DECIMAL -> float64,
DATE/TIMESTAMP -> datetime64[us], HUGEINT -> float64). Columns are sorted by
name, rows are sorted, and cells compare on exact str() — so a Spark
Decimal('138014.00') vs a DuckDB float 138014.0 is a MISMATCH even though the
values are equal. Local EXACT here therefore implies the driver's hash_match.

Reports EXACT / MISMATCH per query; also prints a CLOSE diagnostic when the
values are numerically equal but the representations differ (the usual
decimal-vs-double or date-vs-timestamp pitfalls).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def cells(df):
    """Sorted rows of stringified cells, columns sorted by name."""
    cols = sorted(df.columns)
    rows = [tuple(str(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows)


def numeric_equalish(a_rows, b_rows):
    """True when rows match under float coercion — distinguishes repr-only
    mismatches (fixable by casting) from genuine value differences."""
    if len(a_rows) != len(b_rows):
        return False

    def norm(rows):
        out = []
        for r in rows:
            nr = []
            for v in r:
                try:
                    nr.append(round(float(v), 6))
                except ValueError:
                    nr.append(v.split(" 00:00:00")[0])  # date vs midnight-timestamp
            out.append(tuple(str(x) for x in nr))
        return sorted(out)

    return norm(a_rows) == norm(b_rows)


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
            spark_df = pd.read_parquet(glob.glob(f"{out}/{name}")[0])
            ora_df = con.sql(oracle[name]).df()
            s_cols, s_rows = cells(spark_df)
            o_cols, o_rows = cells(ora_df)
            if s_cols != o_cols:
                print(f"  {name}: MISMATCH columns {s_cols} vs {o_cols}")
                n_bad += 1
                continue
            if s_rows == o_rows:
                print(f"  {name}: EXACT ({len(s_rows)} rows)")
                continue
            n_bad += 1
            if numeric_equalish(s_rows, o_rows):
                # representation-only: show the first differing cell pair
                detail = ""
                for ra, rb in zip(s_rows, o_rows):
                    for c, (va, vb) in zip(s_cols, zip(ra, rb)):
                        if va != vb:
                            detail = f"{c}: {va!r} vs {vb!r}"
                            break
                    if detail:
                        break
                print(f"  {name}: REPR-MISMATCH ({len(s_rows)} rows)  [{detail}]")
            else:
                print(f"  {name}: MISMATCH ({len(s_rows)} vs {len(o_rows)} rows)")
        except Exception as e:
            print(f"  {name}: ERROR {e}")
            n_bad += 1
    print(("FAIL" if n_bad else "PASS") + f" ({len(oracle)} queries, {n_bad} bad)")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
