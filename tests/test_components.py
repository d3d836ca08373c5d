"""Tests for the distributed connected-components stage.

The stage must be byte-equal to the driver-side union-find
(`embed_dedup.dup_groups_from_pairs`) — both emit
label = min(component member id) — while keeping all per-round state
in the object store (the driver only sees one changed-count int per
bucket per round)."""
import numpy as np
import pandas as pd
import pytest

from rdf_n3_ray.stages.components import connected_components
from rdf_n3_ray.stages.embed_dedup import dup_groups_from_pairs


def _run(pairs: pd.DataFrame, num_buckets: int = 4,
         partitions: int = 4) -> pd.DataFrame:
    import ray.data as rd

    ds = rd.from_pandas(pairs.astype("int64")).repartition(partitions)
    out = connected_components(ds, num_buckets=num_buckets).to_pandas()
    if out.empty:  # empty Dataset.to_pandas() drops the schema
        return pd.DataFrame({"node": pd.Series(dtype="int64"),
                             "label": pd.Series(dtype="int64")})
    return (out.astype("int64").sort_values("node")
            .reset_index(drop=True))


def _reference(pairs: pd.DataFrame) -> pd.DataFrame:
    ref = dup_groups_from_pairs(pairs)
    return (ref.rename(columns={"id": "node", "group": "label"})
            .astype("int64").sort_values("node").reset_index(drop=True))


def test_matches_union_find_random_graph(ray_session):
    rng = np.random.default_rng(7)
    n, m = 5_000, 8_000
    pairs = pd.DataFrame({"a": rng.integers(0, n, m),
                          "b": rng.integers(0, n, m)})
    got = _run(pairs)
    pd.testing.assert_frame_equal(got, _reference(pairs))


def test_long_path_converges_via_pointer_halving(ray_session):
    """A 3000-node path has diameter 3000; with pointer halving the
    stage converges in O(log n) rounds — max_iters=24 is far below the
    diameter, so passing proves the halving pass works."""
    p = np.arange(3_000, dtype=np.int64)
    pairs = pd.DataFrame({"a": p[:-1], "b": p[1:]})
    got = _run(pairs)
    assert len(got) == 3_000
    assert got["label"].nunique() == 1 and got["label"].iloc[0] == 0


def test_self_loops_and_duplicate_edges(ray_session):
    pairs = pd.DataFrame({"a": [1, 1, 2, 5, 5, 9],
                          "b": [1, 2, 1, 6, 6, 9]})
    got = _run(pairs)
    pd.testing.assert_frame_equal(got, _reference(pairs))
    # components: {1,2} -> 1, {5,6} -> 5, {9} -> 9 (self-loop keeps it)
    lab = dict(zip(got["node"], got["label"]))
    assert lab == {1: 1, 2: 1, 5: 5, 6: 5, 9: 9}


def test_empty_edge_list(ray_session):
    pairs = pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})
    got = _run(pairs, partitions=1)
    assert len(got) == 0


def test_single_bucket_and_many_buckets_agree(ray_session):
    rng = np.random.default_rng(11)
    pairs = pd.DataFrame({"a": rng.integers(0, 500, 700),
                          "b": rng.integers(0, 500, 700)})
    one = _run(pairs, num_buckets=1, partitions=1)
    many = _run(pairs, num_buckets=7, partitions=3)
    pd.testing.assert_frame_equal(one, many)
