#!/usr/bin/env python3
"""Self-determinism check: diff two graft.Verify output dirs.

Usage: check_selfdet.py <verify_out_a> <verify_out_b>

Run graft.Verify twice with different SPARK_GRAFT_CPUS (e.g. 4 vs 32 —
different shuffle partition counts change task boundaries, accumulation
groupings and AQE decisions) and require bit-identical results. Catches
tie-order / accumulation-order nondeterminism in OUR engine that the
DuckDB compare could miss by luck.
"""
import math
import os
import sys

import pandas as pd


def canon(df):
    return df.reindex(sorted(df.columns), axis=1).reset_index(drop=True)


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, (list, tuple)) or str(type(a)).endswith("ndarray'>"):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(eq(x, y) for x, y in zip(la, lb))
    try:
        # scalar NA (None / NaT): equal iff both are NA (NaT != NaT in pandas)
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    da, db = sys.argv[1], sys.argv[2]
    names = sorted(d for d in os.listdir(da) if not d.endswith(".json"))
    bad = 0
    for n in names:
        try:
            a = canon(pd.read_parquet(os.path.join(da, n)))
            b = canon(pd.read_parquet(os.path.join(db, n)))
        except Exception as e:
            print(f"READ-FAIL {n}: {e}")
            bad += 1
            continue
        if list(a.columns) != list(b.columns) or len(a) != len(b):
            print(f"SHAPE-DIFF {n}: {a.shape} vs {b.shape}")
            bad += 1
            continue
        mismatch = None
        for c in a.columns:
            av, bv = a[c].tolist(), b[c].tolist()
            for i in range(len(av)):
                if not eq(av[i], bv[i]):
                    mismatch = (c, i, av[i], bv[i])
                    break
            if mismatch:
                break
        if mismatch:
            print(f"VALUE-DIFF {n}: col={mismatch[0]} row={mismatch[1]} "
                  f"a={mismatch[2]!r} b={mismatch[3]!r}")
            bad += 1
    print(f"== {len(names) - bad}/{len(names)} identical ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
