#!/usr/bin/env python3
"""Derive a deterministic sf1 (10x sf0.1) dataset for the SCALE bench
(r14, the r13 verdict's #5: the within-2x criterion at sf0.1 is muddied
by Spark's fixed plan+schedule floor; one sf1 map shows the ratios
collapsing toward the plans' true cost).

NOT driver testdata: the driver generates sf{0.001,0.01,0.1} only. This
script UNIONS 10 key-shifted copies of the driver's own sf0.1 tables —
every value distribution is the driver's; only the key spaces are
translated per copy so joins stay consistent (copy k shifts each key
space by k * (max_key + 1); nation/region are fixed dimensions and copy
once, unshifted, like TPC-H at every SF). Duplicate-sensitive columns
are perturbed deterministically so workloads keep their sf0.1 CHARACTER
— near-dup groups must stay the same SIZE, just 10x as many, or the
pair-listing workloads grow 100x instead of 10x (a first cut that
merely suffixed one token left cross-copy Jaccard ~1 and quadratically
inflated every near-dup entry; rejected). Copies are made DISSIMILAR:
doc text gets a per-copy filler token spliced after every 3rd token
(cross-copy 3-shingle Jaccard ~0.14 << the 0.8 entry threshold;
within-copy planted duplicates keep identical fillers, so the planted
structure is intact per copy), embeddings get a per-copy +-70%
multiplicative noise PROFILE (one deterministic 64-dim profile per
copy: cross-copy cosine ~0.86 << the 0.95 threshold; within-copy
planted near-identicals share the profile and stay near-identical).
Correctness is still gated at sf0.01 by the driver; sf1 exists ONLY for
the bench ratio table.

Usage: make_sf1.py [outdir=/tmp/graft-sf1]  (pyarrow only, no Spark)
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = '/root/testdata/sf0.1'
OUT = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft-sf1'
COPIES = 10

import os
os.makedirs(OUT, exist_ok=True)

tables = {n: pq.read_table(f'{SRC}/{n}.parquet') for n in
          ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
           'lineitem', 'events', 'documents', 'embeddings']}

# one shift unit per KEY SPACE = max+1 over every column in that space
spaces = {
    'cust': [('customer', 'c_custkey'), ('orders', 'o_custkey')],
    'order': [('orders', 'o_orderkey'), ('lineitem', 'l_orderkey')],
    'part': [('part', 'p_partkey'), ('lineitem', 'l_partkey')],
    'supp': [('supplier', 's_suppkey'), ('lineitem', 'l_suppkey')],
    'event': [('events', 'event_id')],
    'user': [('events', 'user_id')],
    'doc': [('documents', 'doc_id')],
    'vec': [('embeddings', 'vec_id')],
}
unit = {s: max(pc.max(tables[t][c]).as_py() for t, c in cols) + 1
        for s, cols in spaces.items()}
shift_cols = {(t, c): s for s, cols in spaces.items() for t, c in cols}

for name in ['region', 'nation']:
    pq.write_table(tables[name], f'{OUT}/{name}.parquet')
    print(name, tables[name].num_rows, '(fixed dimension, unshifted)')

for name, tbl in tables.items():
    if name in ('region', 'nation'):
        continue
    copies = []
    for k in range(COPIES):
        cols = []
        for field in tbl.schema:
            col = tbl[field.name]
            space = shift_cols.get((name, field.name))
            if space is not None and k > 0:
                col = pc.add(col, k * unit[space])
            elif name == 'documents' and field.name == 'text' and k > 0:
                # splice a per-copy filler after every 3rd token: most
                # 3-shingles now contain a filler, so cross-copy Jaccard
                # collapses while within-copy structure is untouched
                col = pc.replace_substring_regex(
                    pc.cast(col, pa.string()),
                    pattern=r'((?:\S+\s+){3})', replacement=rf'\1ct{k} ')
            elif name == 'embeddings' and field.name == 'embedding' and k > 0:
                import numpy as np
                arr = col.combine_chunks()
                flat = pc.cast(pc.list_flatten(arr), pa.float32()).to_numpy(
                    zero_copy_only=False)
                n = len(arr)
                dims = len(flat) // n
                assert dims * n == len(flat), 'ragged embedding lists'
                profile = (1.0 + np.random.default_rng(k).uniform(
                    -0.7, 0.7, dims)).astype(np.float32)
                noisy = pa.array((flat.reshape(n, dims) * profile).ravel(),
                                 pa.float32())
                col = pa.ListArray.from_arrays(arr.offsets, noisy)
            cols.append(col.combine_chunks() if hasattr(col, 'combine_chunks') else col)
        copies.append(pa.table(dict(zip(tbl.schema.names, cols))))
    out = pa.concat_tables(copies)
    # cast back to the source schema (shift widened nothing: int64 + k*unit)
    out = out.cast(tbl.schema)
    # r15: realistic ROW-GROUP sizing. pyarrow's default (1Mi rows per
    # group) wrote lineitem as SIX groups and documents as ONE — capping
    # every engine's scan parallelism at 1-6 tasks regardless of cores,
    # an artifact of this derivation, not of the workload (a real 10x
    # corpus is many files/splits). ~64 groups per table (floor 4096
    # rows) keeps groups in the MBs and lets BOTH engines parallelize;
    # row CONTENT is unchanged, so every oracle and planted structure
    # is untouched.
    rg = max(4096, out.num_rows // 64)
    pq.write_table(out, f'{OUT}/{name}.parquet', row_group_size=rg)
    print(name, out.num_rows, 'row_group_size', rg)
