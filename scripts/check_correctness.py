#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate.

NOT part of the shipped library (the engine is Scala/Spark only). Runs
each oracle SQL from Verify's oracle_sql.json in DuckDB against the same
parquet tables, and compares against the Spark result parquet written by
graft.Verify: columns sorted by name, rows sorted by all columns, values
compared exactly (with a float-diff report on mismatch).

Usage: check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if v.__class__.__name__ == "Decimal":
        return float(v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            ora = con.sql(sql)
            ora_cols = sorted(ora.columns)
            ora_rows = con.sql(
                f"SELECT {', '.join(ora_cols)} FROM ora ORDER BY ALL"
            ).fetchall()
            spark = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            sp_cols = sorted(spark.columns)
            sp_rows = con.sql(
                f"SELECT {', '.join(sp_cols)} FROM spark ORDER BY ALL"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: error: {e}")
            n_fail += 1
            continue
        if ora_cols != sp_cols:
            print(f"FAIL {name}: columns oracle={ora_cols} spark={sp_cols}")
            n_fail += 1
            continue
        # schema check: DuckDB SUM/COUNT/LENGTH/row_number widen to
        # HUGEINT/BIGINT and to_json yields JSON — the oracle must cast to
        # the exact Spark output type or the driver's schema compare fails
        otypes = dict(zip(ora.columns, [str(t) for t in ora.types]))
        stypes = dict(zip(spark.columns, [str(t) for t in spark.types]))
        tdiffs = {c: (otypes[c], stypes[c]) for c in otypes
                  if otypes[c] != stypes[c]}
        if tdiffs:
            print(f"FAIL {name}: column types differ: {tdiffs}")
            n_fail += 1
            continue
        if len(ora_rows) != len(sp_rows):
            print(f"FAIL {name}: rows oracle={len(ora_rows)} "
                  f"spark={len(sp_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (orow, srow) in enumerate(zip(ora_rows, sp_rows)):
            for c, (ov, sv) in enumerate(zip(orow, srow)):
                ov, sv = norm(ov), norm(sv)
                if ov != sv and not (
                        isinstance(ov, float) and isinstance(sv, float)
                        and math.isnan(ov) and math.isnan(sv)):
                    bad = (i, ora_cols[c], ov, sv)
                    break
            if bad:
                break
        if bad:
            i, cname, ov, sv = bad
            extra = ""
            if isinstance(ov, float) and isinstance(sv, float):
                extra = f" (absdiff={abs(ov - sv):.3e})"
            print(f"FAIL {name}: row {i} col {cname}: "
                  f"oracle={ov!r} spark={sv!r}{extra}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(ora_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
