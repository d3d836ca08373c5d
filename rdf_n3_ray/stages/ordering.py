"""Shuffle-free canonical ordering for range-partitioned pipelines.

The flagship KG pipeline's last step is "stable (conv_id, turn_idx)
ordering" (north rule).  A global `Dataset.sort` is an all-to-all
exchange — at 10^12-turn scale the single biggest data movement in the
job.  But every upstream stage preserves the source's conv-range
partitioning: the transcript source shards conversations into
contiguous, ascending ranges (one per block), and parse / skolemize /
dedup-filter are all order-preserving per-block maps.  When that
invariant holds, the dataset is already *globally* sorted up to
within-block order, so the canonical ordering costs one vectorized
per-block sort and ZERO shuffle.

`sorted_by` makes that exact, not assumed:

1. per-block stable sort on the keys (cheap; blocks are already nearly
   sorted, and ties — rows of one turn — never span a block);
2. collect each block's (first, last) key tuple (two tiny rows per
   block) and check the block boundaries are globally monotone;
3. monotone -> return the per-block-sorted dataset (block order IS the
   global order; Ray Data preserves block order through maps);
   overlapping boundaries -> fall back to the real global sort.

The check is exact: any input at all — partitioned or not — comes out
globally sorted; partitioned inputs just skip the shuffle.  This is
classic sorted-run detection, expressed over Ray Data blocks.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _block_sort(keys):
    def sort_block(t: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            t, sort_keys=[(k, "ascending") for k in keys])
        return t.take(order)

    return sort_block


def sorted_by(ds, keys, check_materialized: bool = True):
    """Return `ds` globally sorted by `keys`, avoiding the all-to-all
    shuffle when the blocks already form globally monotone key ranges.

    `check_materialized=False` skips the boundary probe and trusts the
    caller's partitioning contract (the resumable job path, whose
    shards are conv ranges by construction).
    """
    blockwise = ds.map_batches(_block_sort(keys), batch_format="pyarrow")
    if not check_materialized:
        return blockwise
    snap = blockwise.materialize()

    def boundaries(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.select(keys)
        return pa.concat_tables([t.select(keys).slice(0, 1),
                                 t.select(keys).slice(t.num_rows - 1, 1)])

    # two rows per block: (first, last) key tuples, in block order
    b = snap.map_batches(boundaries, batch_format="pyarrow").to_pandas()
    rows = list(b.itertuples(index=False, name=None))
    if all(rows[i] <= rows[i + 1] for i in range(len(rows) - 1)):
        return snap
    return snap.sort(keys)
