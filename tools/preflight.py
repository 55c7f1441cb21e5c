#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare (dev tool only —
NOT part of the library). Mimics the driver: run Verify's parquet dumps
against each oracle_sql.json entry replayed in DuckDB over the same
testdata tables; sort columns by name; compare values.

Usage: python3 tools/preflight.py <sfDir> <verifyOutDir> [key ...]
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    """Bit-exact normalization: floats compare by IEEE bits (the driver's
    hash compare gives no tolerance), ints by value regardless of width.
    """
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        return ("f", "nan") if math.isnan(v) else ("f", v.hex())
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    try:
        import numpy as np
        if isinstance(v, np.ndarray):
            return tuple(norm(x) for x in v.tolist())
        if isinstance(v, np.floating):
            return norm(float(v))
        if isinstance(v, np.integer):
            return ("i", int(v))
    except ImportError:
        pass
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for key, sql in sorted(oracle.items()):
        if only and key not in only:
            continue
        try:
            duck = con.execute(sql).fetchdf()
            spark = duckdb.connect().execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {key}: exec error: {e}")
            n_bad += 1
            continue
        dcols, scols = sorted(duck.columns), sorted(spark.columns)
        if dcols != scols:
            print(f"FAIL {key}: columns duck={dcols} spark={scols}")
            n_bad += 1
            continue
        # The driver sorts rows with pandas sort_values over every column
        # before hashing; list/array cells are unhashable there and crash
        # the compare (fn_array, round 1), and dict cells (STRUCT columns)
        # are unorderable the same way (probed round 7: TypeError "'<' not
        # supported between instances of 'dict'"). Reject both outright —
        # checking every row, since a null first row would mask a later
        # nested cell. Nested values must go through JSON serialization
        # (see nested_event_digest).
        def is_listy(v):
            return (isinstance(v, (list, tuple, dict))
                    or type(v).__name__ == "ndarray")
        bad_cols = [c for df in (duck, spark) for c in df.columns
                    if len(df) and df[c].map(is_listy).any()]
        if bad_cols:
            print(f"FAIL {key}: list-typed output columns {sorted(set(bad_cols))} "
                  "(unhashable in the driver's pandas sort)")
            n_bad += 1
            continue
        drows = [tuple(norm(v) for v in r) for r in duck[dcols].itertuples(index=False)]
        srows = [tuple(norm(v) for v in r) for r in spark[dcols].itertuples(index=False)]
        if drows == srows:
            print(f"OK   {key} ({len(drows)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            if len(drows) != len(srows):
                print(f"FAIL {key}: rowcount duck={len(drows)} spark={len(srows)}")
            else:
                diffs = [(i, d, s) for i, (d, s) in enumerate(zip(drows, srows)) if d != s]
                print(f"FAIL {key}: {len(diffs)} differing rows; first: {diffs[:3]}")
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
