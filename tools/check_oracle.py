#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only...]

Mirrors the driver's pandas-based canonicalization (ADVICE r01): the Spark
result is read with pandas.read_parquet (pyarrow dtypes: parquet decimal ->
Python Decimal objects, float -> float32/64), the oracle with duckdb
``.df()`` (HUGEINT -> float64, DECIMAL -> float64). Columns are sorted by
name, rows via DataFrame.sort_values over all columns (which CRASHES on
numpy.ndarray cells exactly like the driver does), and values compared by
``str()`` rendering — so int64 14943 vs float64 14943.0 MISMATCHES here the
same way it does at the gate. A PASS here must imply a PASS at the gate.
"""
import sys, os, json, glob, datetime

import duckdb
import pandas as pd


def render(v):
    # date vs midnight-datetime are gate-equivalent (q39 was green at the
    # r01 gate with a Spark DATE column vs duckdb datetime64); everything
    # else renders strictly — int64 14943 != float64 14943.0.
    if isinstance(v, datetime.date) and not isinstance(v, datetime.datetime):
        return str(v) + " 00:00:00"
    return str(v)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonicalization: columns sorted by name, rows sorted
    by all columns, every cell rendered with str()."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    rows = [tuple(render(v) for v in row) for row in df.itertuples(index=False)]
    return list(df.columns), rows


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in files],
                            ignore_index=True)
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: load/oracle error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        try:
            gc, gr = canon(got)
            ec, er = canon(exp)
        except Exception as e:
            # the driver records this as verdict=err (e.g. unhashable ndarray)
            print(f"FAIL {name}: canonicalize error (driver err): "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
        if gc != ec:
            print(f"FAIL {name}: columns differ spark={gc} oracle={ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            print(f"FAIL {name}: rows differ (spark {len(gr)} vs oracle {len(er)})")
            er_set, gr_set = set(er), set(gr)
            diff_g = [r for r in gr if r not in er_set][:3]
            diff_e = [r for r in er if r not in gr_set][:3]
            print(f"  cols: {gc}")
            print(f"  spark-only: {diff_g}")
            print(f"  oracle-only: {diff_e}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
