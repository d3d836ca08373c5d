"""Shuffle-free canonical ordering for range-partitioned pipelines.

The flagship KG pipeline's last step is "stable (conv_id, turn_idx)
ordering" (north rule).  A global `Dataset.sort` is an all-to-all
exchange — at 10^12-turn scale the single biggest data movement in the
job.  But every upstream stage preserves the source's conv-range
partitioning: the transcript source shards conversations into
contiguous, ascending ranges (one per block), and parse / skolemize /
dedup-filter are all order-preserving per-block maps.  When that
invariant holds, each block covers a key range DISJOINT from every
other block's, so the canonical ordering costs one vectorized
per-block sort plus a driver-side permutation of block references —
ZERO shuffle, zero data movement.

`sorted_by` makes that exact, not assumed:

1. per-block stable sort on the keys (cheap; blocks are already nearly
   sorted; a positional tiebreaker keeps equal-key rows in emit order,
   which is the "stable" half of the north rule's ordering contract);
2. materialize and probe each block's (first, last) key tuple — one
   tiny task per block returning two rows, the block itself never
   moves;
3. if the per-block key ranges are pairwise disjoint (strictly — a key
   straddling two blocks would make tie order depend on execution
   order), reassemble the dataset from the SAME block refs permuted
   into range order via `from_arrow_refs`; otherwise fall back to the
   real global sort.

The driver-side permutation is what makes this robust under Ray Data's
default `preserve_order=False` streaming execution: blocks arrive in
completion order, but their content still partitions the key space, so
ordering the refs by each block's first key IS the global sort.  Any
input at all — partitioned or not — comes out globally sorted;
partitioned inputs just skip the shuffle.  This is classic sorted-run
detection, expressed over Ray Data block refs.

Scale note: the probe is one sub-millisecond task per block (~10^5-10^6
blocks at 10^12 turns — trivial against the all-to-all it replaces),
and the boundary tuples + refs on the driver are O(blocks), not
O(rows).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

_POS = "__sorted_by_pos"


def _block_sort(keys):
    def sort_block(t: pa.Table) -> pa.Table:
        # positional tiebreaker = stable sort: equal-key rows keep
        # their in-block (emit) order no matter the kernel's own
        # stability guarantees
        t2 = t.append_column(_POS, pa.array(np.arange(t.num_rows)))
        order = pc.sort_indices(
            t2, sort_keys=[(k, "ascending") for k in keys] +
            [(_POS, "ascending")])
        return t.take(order)

    return sort_block


@ray.remote(num_cpus=0)
def _bounds(t: pa.Table, keys):
    """(first, last) key tuples of one block; None for an empty block."""
    if t.num_rows == 0:
        return None
    return (tuple(t.column(k)[0].as_py() for k in keys),
            tuple(t.column(k)[t.num_rows - 1].as_py() for k in keys))


def sorted_by(ds, keys):
    """Return `ds` globally sorted by `keys` (stable within equal keys),
    avoiding the all-to-all shuffle when the blocks' key ranges are
    pairwise disjoint — which upstream range partitioning guarantees.
    """
    import ray.data as rd

    snap = ds.map_batches(
        _block_sort(keys), batch_format="pyarrow").materialize()
    refs = snap.to_arrow_refs()
    if len(refs) <= 1:
        return snap
    bounds = ray.get([_bounds.remote(r, keys) for r in refs])
    runs = [(b, r) for b, r in zip(bounds, refs) if b is not None]
    runs.sort(key=lambda br: br[0][0])  # list.sort is stable
    # strict inequality: a key equal across two blocks would make the
    # relative order of its rows depend on completion order — punt to
    # the global sort rather than guess
    if all(runs[i][0][1] < runs[i + 1][0][0] for i in range(len(runs) - 1)):
        return rd.from_arrow_refs([r for _, r in runs])
    return snap.sort(keys)
