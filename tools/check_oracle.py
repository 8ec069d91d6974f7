#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <sfdir> <verify_out_dir>

Reads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB against the sfdir tables,
and compares values column-sorted + row-ordered, with exact equality
(the driver hashes values, so anything non-identical is a FAIL).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    # normalize numpy arrays (parquet list columns) to Python lists so
    # the element-wise path below applies instead of ambiguous ndarray ==
    if hasattr(a, "tolist") and not isinstance(a, (int, float)):
        a = a.tolist()
    if hasattr(b, "tolist") and not isinstance(b, (int, float)):
        b = b.tolist()
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cells_equal(x, y) for x, y in zip(la, lb))
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    with open(f"{outdir}/oracle_sql.json") as f:
        oracles = json.load(f)

    only = sys.argv[3:] or sorted(oracles)
    n_pass = n_fail = 0
    for name in only:
        sql = oracles.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle")
            continue
        try:
            spark_df = canon(pd.read_parquet(f"{outdir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        try:
            duck_df = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        # The driver's harness pandas-sorts every result column before
        # hashing; list/ndarray cells are unhashable there and error the
        # whole query even when values are identical. Reject them here so
        # array-typed outputs fail pre-flight instead of at the driver.
        arr_cols = [c for c in spark_df.columns
                    if any(isinstance(v, (list, tuple)) or
                           (hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1)
                           for v in spark_df[c].head(5))]
        if arr_cols:
            print(f"FAIL {name}: array-typed result columns {arr_cols} "
                  "(driver harness cannot hash array cells — emit scalars "
                  "or a joined string)")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
            continue
        # Dtype-kind-strict: the driver hashes Python values, so width
        # (int32 vs int64) and tz resolution (ns vs us) don't matter,
        # but KIND does — an int64 Spark column vs a float64 DuckDB
        # column (e.g. sum(int) -> HUGEINT -> float) renders 99111 vs
        # 99111.0 and hash-mismatches even though the values compare ==.
        dtype_bad = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                     for c in spark_df.columns
                     if spark_df[c].dtype.kind != duck_df[c].dtype.kind]
        if dtype_bad:
            for c, sd, dd in dtype_bad:
                print(f"FAIL {name}: dtype col {c}: spark={sd} duckdb={dd}")
            n_fail += 1
            continue
        bad = None
        for ci, c in enumerate(spark_df.columns):
            sv, dv = spark_df[c].tolist(), duck_df[c].tolist()
            for ri in range(len(sv)):
                if not cells_equal(sv[ri], dv[ri]):
                    bad = (ri, c, sv[ri], dv[ri])
                    break
            if bad:
                break
        if bad:
            ri, c, a, b = bad
            print(f"FAIL {name}: row {ri} col {c}: spark={a!r} duckdb={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(oracles)} oracles ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
