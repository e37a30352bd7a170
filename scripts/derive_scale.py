#!/usr/bin/env python3
"""Dev-only scale-probe data derivation: build an approximately REP-times
larger dataset from an existing /root/testdata sf directory, preserving each
table's schema and statistical character, so the bench can measure per-query
scaling exponents beyond the largest shipped sf (VERDICT r7 next-round #1).

Derivation rules (deterministic, replica k = 0..REP-1; k = 0 is the
original data unchanged):
- events:    ts shifted by k * (span + 1 day)  -> a REP-times longer
             history; event_id offset per replica; user_id/event_type kept,
             so per-key state in windows/joins genuinely grows REP-times.
- lineitem:  plain replication with per-replica l_orderkey offset (the
             registry only aggregates it).
- documents: doc_id offset per replica, and every whitespace token gets a
             per-replica suffix. This keeps each replica's INTERNAL
             near-duplicate structure identical to the original while
             making shingles DISJOINT across replicas - naive replication
             would turn every doc into an exact+near dup of its 9 copies
             and quadratically inflate every dedup candidate set, measuring
             an artifact instead of scaling.
- embeddings: vec_id offset; vector components rotated (np.roll) by
             k * dim // REP. A coordinate permutation preserves all
             intra-replica inner products (geometry identical per replica)
             while cross-replica cosines stay at random-vector levels - no
             synthetic near-dup inflation.
- all other tables: copied unchanged.

Usage: derive_scale.py <srcSfDir> <outDir> [REP]
"""
import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

src, out = sys.argv[1], sys.argv[2]
rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(out, exist_ok=True)

DAY_NS = 86_400_000_000_000


def write_like(path, df, like_schema):
    table = pa.Table.from_pandas(df, schema=like_schema, preserve_index=False)
    pq.write_table(table, path)


def replicate(table_name, transform):
    p = f"{src}/{table_name}.parquet"
    schema = pq.ParquetFile(p).schema_arrow
    base = pd.read_parquet(p)
    parts = []
    for k in range(rep):
        d = base.copy() if k else base
        parts.append(transform(d, k) if k else d)
    df = pd.concat(parts, ignore_index=True)
    write_like(f"{out}/{table_name}.parquet", df, schema)
    print(f"{table_name}: {len(base)} -> {len(df)} rows")


def events_transform_factory():
    ev = pd.read_parquet(f"{src}/events.parquet", columns=["ts"])
    span = (ev.ts.max() - ev.ts.min()).value + DAY_NS

    def t(d, k):
        d["ts"] = d["ts"] + pd.Timedelta(k * span, unit="ns")
        # offset must keep ids within int32: the registry's cast_columns
        # query CASTs event_id to INT by contract (10 replicas * 1e7 stays
        # below 2^31; original sf0.1 ids are < 1e6)
        d["event_id"] = d["event_id"] + k * 10**7
        return d

    return t


def lineitem_transform(d, k):
    d["l_orderkey"] = d["l_orderkey"] + k * 10**9
    return d


def documents_transform(d, k):
    d["doc_id"] = d["doc_id"] + k * 10**9
    # suffix every token: intra-replica similarity preserved, cross-replica
    # shingles disjoint
    d["text"] = d["text"].str.replace(r"(\S+)", rf"\g<1>k{k}", regex=True)
    d["n_chars"] = d["text"].str.len()
    return d


def embeddings_transform(d, k):
    d["vec_id"] = d["vec_id"] + k * 10**9
    dim = len(d["embedding"].iloc[0])
    shift = (k * dim) // max(1, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
    shift = max(1, shift) if k else 0
    d["embedding"] = d["embedding"].map(lambda v: np.roll(np.asarray(v), shift))
    return d


replicate("events", events_transform_factory())
replicate("lineitem", lineitem_transform)
replicate("documents", documents_transform)
replicate("embeddings", embeddings_transform)

for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
    p = f"{src}/{t}.parquet"
    if os.path.exists(p):
        shutil.copyfile(p, f"{out}/{t}.parquet")
        print(f"{t}: copied")
print(f"done -> {out} (rep={rep})")
