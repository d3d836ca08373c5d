"""Flagship KG-construction pipeline (north rule; SURVEY.md §3.3 tail).

    read transcripts
      -> ParseN3Turns           (actor-pool map_batches, Arrow)
      -> skolemize              (stateless vectorized map)
      + entity-link triples     (fused into the same extract stage;
                                 entity index pickled per worker)
      -> exact dedup            (combiner + groupby(quad-hash) shuffle)
      -> sort(conv_id, turn_idx)  stable output ordering
      -> write partitioned Parquet with per-partition lineage manifest

Two execution paths:

- ``build_kg_dataset``: one lazy streaming Dataset end-to-end — the
  bench / query path.  Nothing materializes except at the final consume.
- ``run_kg_job``: the resumable `ray job submit` path — input sharded by
  conversation range; each shard runs the parse+skolemize+link slice and
  lands in ``out/stage=triples/shard=K`` atomically with a lineage entry
  (skip-on-resume), then the global dedup shuffle reads the intermediate
  shards and writes the final table.  At 100 TB each shard is a bounded
  unit of retry; the intermediate Parquet doubles as the map-side
  shuffle spill.
"""
from __future__ import annotations

import hashlib
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from ..sources.transcripts import entity_table, transcripts_dataset
from ..stages.dedup import dedup_triples_narrow
from ..stages.parse_stage import parse_transcripts
from ..stages.skolemize import skolemize
from ..state.checkpoint import LineageManifest


def build_kg_dataset(
    transcripts,
    entities: pa.Table | None = None,
    parse_concurrency=None,
    dedup: bool = True,
    sort: bool = True,
):
    """transcript Dataset -> canonical triple Dataset (lazy).

    Single-pass: parse + entity-link happen in ONE fused map stage
    (stages/extract.py) so the input is read once; a two-branch
    parse/link union would scan every transcript row twice and bottleneck
    on the smaller branch's actor pool.
    """
    from ..stages.extract import extract_turn_kg

    if entities is None:
        entities = entity_table()
    triples = extract_turn_kg(transcripts, entities, concurrency=parse_concurrency)
    all_triples = skolemize(triples)
    if dedup:
        # narrow shuffle: only (hash128, row-identity) moves; full rows
        # are filtered in place (stages/dedup.py) — drops emit_idx
        all_triples = dedup_triples_narrow(all_triples)
    if sort:
        all_triples = all_triples.sort(["conv_id", "turn_idx"])
    return all_triples


def kg_pipeline_sf(sf_dir_or_scale: str | int = 100, turns: int = 10):
    """Convenience: synthetic transcripts -> KG triples Dataset."""
    n_convs = sf_dir_or_scale if isinstance(sf_dir_or_scale, int) else 100
    ts = transcripts_dataset(n_convs=n_convs, turns_per_conv=turns)
    return build_kg_dataset(ts)


# ----------------------------------------------------------------------
# Resumable job path
# ----------------------------------------------------------------------

def _fingerprint(*parts) -> str:
    return hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def run_kg_job(
    out_dir: str,
    n_convs: int = 1000,
    turns_per_conv: int = 20,
    seed: int = 42,
    n_shards: int = 8,
    parse_concurrency=None,
    fail_after_shards: int | None = None,
) -> dict:
    """Resumable, checkpointed KG build over the synthetic transcript
    table.  Returns metrics.  ``fail_after_shards`` injects a crash for
    the resume test.

    Shards = contiguous conversation ranges; every stage inside a shard
    is a pure function of (seed, conv range), so a resumed run's output
    is byte-identical to an uninterrupted one.
    """
    t0 = time.time()
    stage_dir = os.path.join(out_dir, "stage=triples")
    manifest = LineageManifest(stage_dir)
    shard_rows = {}
    processed = 0
    for k in range(n_shards):
        shard_id = f"{k:04d}"
        lo = k * n_convs // n_shards
        hi = (k + 1) * n_convs // n_shards
        fp = _fingerprint("triples", seed, n_convs, turns_per_conv, lo, hi)
        if manifest.is_done(shard_id, fp):
            shard_rows[shard_id] = manifest.entries[shard_id]["rows"]
            continue
        if fail_after_shards is not None and processed >= fail_after_shards:
            raise RuntimeError(f"injected failure before shard {shard_id}")
        tmp = manifest.begin(shard_id, fp)
        ts = _transcripts_conv_range(lo, hi, n_convs, turns_per_conv, seed)
        shard_triples = build_kg_dataset(
            ts, parse_concurrency=parse_concurrency, dedup=False, sort=False
        )
        shard_triples.write_parquet(tmp)
        rows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        manifest.commit(shard_id, fp, rows, metrics={"elapsed": time.time() - t0})
        shard_rows[shard_id] = rows
        processed += 1

    # global dedup + stable sort over the checkpointed intermediate
    import ray.data as rd

    final_dir = os.path.join(out_dir, "stage=final")
    fmanifest = LineageManifest(final_dir)
    ffp = _fingerprint("final", seed, n_convs, turns_per_conv, n_shards)
    if not fmanifest.is_done("all", ffp):
        tmp = fmanifest.begin("all", ffp)
        shard_files = [
            os.path.join(manifest.shard_dir(f"{k:04d}"), f)
            for k in range(n_shards)
            for f in sorted(os.listdir(manifest.shard_dir(f"{k:04d}")))
            if f.endswith(".parquet")
        ]
        triples = rd.read_parquet(shard_files)
        final = dedup_triples_narrow(triples).sort(["conv_id", "turn_idx"])
        final.write_parquet(tmp)
        nrows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        fmanifest.commit("all", ffp, nrows, metrics={"elapsed": time.time() - t0})
    return {
        "elapsed_sec": time.time() - t0,
        "shards": len(shard_rows),
        "intermediate_rows": sum(shard_rows.values()),
        "final_rows": fmanifest.entries["all"]["rows"],
        "out_dir": out_dir,
    }


def _transcripts_conv_range(lo: int, hi: int, n_convs: int, turns_per_conv: int, seed: int):
    """Transcript Dataset restricted to conversations [lo, hi)."""
    import numpy as np
    import ray.data as rd

    from ..sources.transcripts import conv_sizes, gen_rows

    sizes = conv_sizes(n_convs, turns_per_conv, seed)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    start, stop = int(offsets[lo]), int(offsets[hi])

    def gen(batch: pa.Table) -> pa.Table:
        idx = batch.column("id").to_numpy() + start
        return gen_rows(idx, offsets, seed)

    return rd.range(stop - start).map_batches(gen, batch_format="pyarrow")
