#!/usr/bin/env python3
"""Compare two graft.Verify dump directories query by query.

For each query subdir present in BOTH dirs: load the parquet, sort columns
by name and rows by all columns, compare shape and values exactly.
Usage: compare_dumps.py <baseDir> <newDir> [only,names]
"""
import sys, os, glob
import pandas as pd

base, new = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

def load(d, q):
    files = glob.glob(os.path.join(d, q, "*.parquet"))
    if not files:
        return None
    df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting of mixed/array cells
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True), s.loc[order].reset_index(drop=True)

# union of both sides, so a dir present only in newDir (renamed/new query)
# is reported instead of silently skipped
names = sorted({q for d in (base, new) for q in os.listdir(d)
                if os.path.isdir(os.path.join(d, q))})
bad = []
for q in names:
    if only and q not in only:
        continue
    if not os.path.isdir(os.path.join(new, q)):
        print(f"MISSING  {q} (in base only)")
        bad.append(q)
        continue
    if not os.path.isdir(os.path.join(base, q)):
        print(f"MISSING  {q} (in new only)")
        bad.append(q)
        continue
    b = load(base, q)
    n = load(new, q)
    if b is None or n is None:
        print(f"EMPTYDIR {q}")
        bad.append(q)
        continue
    bdf, bs = b
    ndf, ns = n
    if list(bdf.columns) != list(ndf.columns):
        print(f"SCHEMA   {q}: {list(bdf.columns)} vs {list(ndf.columns)}")
        bad.append(q)
    elif len(bdf) != len(ndf):
        print(f"ROWS     {q}: {len(bdf)} vs {len(ndf)}")
        bad.append(q)
    elif not bs.equals(ns):
        neq = (bs != ns).any(axis=1)
        print(f"VALUES   {q}: {int(neq.sum())} differing rows of {len(bs)}")
        print(bs[neq].head(3).to_string())
        print(ns[neq].head(3).to_string())
        bad.append(q)
print(f"checked; {len(bad)} mismatches" if bad else "ALL MATCH")
sys.exit(1 if bad else 0)
