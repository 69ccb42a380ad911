#!/usr/bin/env python3
"""Dev-only differential harness mimicking the driver's DuckDB oracle gate.

Usage: python3 tools/localverify.py <sfDir> <outDir>
(after `sbt "runMain graft.Verify <sfDir> <outDir>"`).

Not part of the shipped engine — the Scala code never depends on this.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = sorted(got.columns)
            got_types = dict(zip(got.columns, (str(t) for t in got.types)))
            got_rows = sorted(
                [tuple(norm(v) for v in row) for row in
                 got.select(", ".join(f'"{c}"' for c in got_cols)).fetchall()])
            exp = con.sql(sql)
            exp_cols = sorted(exp.columns)
            exp_types = dict(zip(exp.columns, (str(t) for t in exp.types)))
            exp_rows = sorted(
                [tuple(norm(v) for v in row) for row in
                 exp.select(", ".join(f'"{c}"' for c in exp_cols)).fetchall()])
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: harness error {e}")
            n_bad += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_bad += 1
            continue
        # The driver's value hash is TYPE-sensitive (q79 burned three rounds
        # on a BIGINT-vs-HUGEINT divergence with identical values), so the
        # local gate must compare DuckDB result types too.
        type_bad = [(c, got_types[c], exp_types[c]) for c in got_cols
                    if got_types[c] != exp_types[c]]
        if type_bad:
            print(f"FAIL {name}: column types differ (driver hash is "
                  f"type-sensitive)")
            for c, g, e in type_bad:
                print(f"  {c}: dump {g} != oracle {e}")
            n_bad += 1
            continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rowcount {len(got_rows)} != {len(exp_rows)}")
            print("  got:", got_rows[:3])
            print("  exp:", exp_rows[:3])
            n_bad += 1
            continue
        bad = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
        if bad:
            # distinguish exact mismatch from tiny float drift
            drift = all(
                all(
                    (a == b) or (
                        isinstance(a, float) and isinstance(b, float)
                        and abs(a - b) < 1e-9)
                    for a, b in zip(g, e))
                for g, e in bad)
            tag = "DRIFT<1e-9" if drift else "MISMATCH"
            print(f"FAIL {name}: {len(bad)}/{len(got_rows)} rows differ [{tag}]")
            for g, e in bad[:3]:
                print("  got:", g)
                print("  exp:", e)
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got_rows)} rows)")
            n_ok += 1
    # queries with no oracle: report row counts
    print(f"== {n_ok} ok, {n_bad} fail ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
