#!/usr/bin/env python3
"""Local parity gate (SURVEY.md §5 tier-2 pre-flight).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
  python3 scripts/parity.py /root/testdata/sf0.01 /tmp/graft_verify [name ...]

Mimics the driver's t2 compare: for each declared oracle, read the Spark
parquet result, run the oracle SQL in DuckDB over views of the same
parquet tables, sort columns by name, and compare row-by-row, value-by-
value (exact; floats must be bit-identical after both engines' own
rounding — this is stricter than the driver can be, which is the point).
"""
import sys, json, glob, math, datetime

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    """Canonicalize a cell for cross-engine compare."""
    if v is None:
        return None
    try:
        import numpy as np
        import pandas as pd
        if isinstance(v, (np.ndarray, list, tuple)):
            return tuple(canon(x) for x in v)
        if v is pd.NaT:
            return None
        if isinstance(v, np.generic):
            v = v.item()
        if isinstance(v, pd.Timestamp):
            if pd.isna(v):
                return None
            return v.to_pydatetime().replace(tzinfo=None)
    except ImportError:
        pass
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    # pandas renders DuckDB DATE as midnight datetime64 while Spark's
    # date32 stays datetime.date — normalize both to midnight datetimes
    # (arrow-level both sides are date32; checked separately).
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day)
    if isinstance(v, bool):
        return int(v)
    return v


def is_missing(v):
    return v is None or (isinstance(v, float) and math.isnan(v))


def rows_of(df):
    cols = sorted(df.columns)
    out = []
    for t in df[cols].itertuples(index=False, name=None):
        out.append(tuple(canon(x) for x in t))
    return cols, out


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = 0
    failed = []
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output (query threw — see verify log)")
            failed.append(name)
            continue
        got = pq.read_table(files[0]).to_pandas()
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failed.append(name)
            continue
        gc, grows = rows_of(got)
        ec, erows = rows_of(exp)
        if gc != ec:
            print(f"FAIL {name}: columns spark={gc} duck={ec}")
            failed.append(name)
            continue
        # Dtype parity: the driver hashes TYPED values, so int64 1234 vs
        # float64 1234.0 hash-differ even though == passes (bit round 1:
        # fn_math floor/ceil LongType vs DuckDB DOUBLE). Exact dtype
        # compare, except the object/datetime pairing (Spark date32 →
        # python date objects vs DuckDB DATE → datetime64, both date32
        # at the arrow level).
        dkinds = {c for c in gc
                  if got[c].dtype != exp[c].dtype
                  and {got[c].dtype.kind, exp[c].dtype.kind} != {"O", "M"}}
        if dkinds:
            print(f"FAIL {name}: dtype mismatch "
                  + ", ".join(f"{c}: spark={got[c].dtype} duck={exp[c].dtype}"
                              for c in sorted(dkinds)))
            failed.append(name)
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} duck={len(erows)}")
            failed.append(name)
            continue
        bad = None
        for i, (g, e) in enumerate(zip(grows, erows)):
            if g != e:
                bad = (i, g, e)
                break
        if bad:
            i, g, e = bad
            print(f"FAIL {name}: first diff at row {i} (cols {gc}):")
            print(f"  spark: {g}")
            print(f"  duck : {e}")
            failed.append(name)
        else:
            print(f"ok   {name} ({len(grows)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {len(failed)} failed" +
          (": " + " ".join(failed) if failed else ""))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
