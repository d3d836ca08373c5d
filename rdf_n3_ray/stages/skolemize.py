"""Skolemization — blank-node canonicalization (north rule).

Replaces the reference's in-process bnode label interning
(/root/reference/lib/rdf/n3/reader.rb:743-758) with globally-unique,
deterministic skolem IRIs: ``urn:skolem:<sha1(conv_id|turn_idx|label)>``.
Because parser labels are deterministic per turn and the salt is the
turn's identity, two runs (or a retried task) always produce identical
IRIs, and bnodes from different turns can never collide after the
dedup shuffle merges everything.

Formula nodes (labels starting "_form_") are skolemized the same way —
they name quoted graphs, and the graph column goes through the same
substitution.

Vectorized: per-batch numpy/pyarrow with a Python loop only over the
bnode rows (typically a small fraction of triples).
"""
from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def _skolem(conv: str, turn: int, label: str) -> str:
    h = hashlib.sha1(f"{conv}|{turn}|{label}".encode()).hexdigest()
    return f"<urn:skolem:{h}>"


def skolemize_batch(batch: pa.Table) -> pa.Table:
    import numpy as np

    conv = turn = None  # materialized lazily, once, only if needed
    memo: dict[tuple, str] = {}  # a turn's bnode recurs across quads
    new_cols = {}
    for col in ("subj", "pred", "obj", "graph"):
        vals = batch.column(col)
        if pa.types.is_null(vals.type):
            # an all-null column (pandas round-trips re-infer an
            # all-null graph block as type Null) holds no bnodes and
            # would crash pc.coalesce(null, string)
            new_cols[col] = vals
            continue
        mask = pc.starts_with(pc.coalesce(vals, pa.scalar("")), "_:")
        idx = np.nonzero(
            mask.combine_chunks().to_numpy(zero_copy_only=False))[0]
        if len(idx):
            if conv is None:
                conv = batch.column("conv_id").to_pylist()
                turn = batch.column("turn_idx").to_pylist()
            # object view: one conversion pass, then touch ONLY the
            # bnode rows (the old code python-looped every row of any
            # column containing a single bnode)
            out = (vals.combine_chunks()
                   if isinstance(vals, pa.ChunkedArray) else vals
                   ).to_numpy(zero_copy_only=False)
            for i in idx:
                key = (conv[i], turn[i], out[i])
                got = memo.get(key)
                if got is None:
                    got = memo[key] = _skolem(conv[i], turn[i], out[i][2:])
                out[i] = got
            new_cols[col] = pa.array(out, pa.string(), from_pandas=True)
        else:
            new_cols[col] = vals
    arrays = []
    for name in batch.schema.names:
        arrays.append(new_cols.get(name, batch.column(name)))
    return pa.table(dict(zip(batch.schema.names, arrays)))


def skolemize(ds, batch_size: int | None = None):
    """Stateless vectorizable map stage.

    batch_size stays None (one batch per block): forcing a large batch
    size makes Ray coalesce many upstream blocks per task, collapsing
    parallelism — the map is cheap, so block-sized batches are right.
    """
    return ds.map_batches(skolemize_batch, batch_format="pyarrow", batch_size=batch_size)
