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
        # shuffle-free when the input's conv-range partitioning
        # survived (it always does on the source/job paths); exact
        # boundary check falls back to a global sort otherwise
        from ..stages.ordering import sorted_by

        all_triples = sorted_by(all_triples, ["conv_id", "turn_idx"])
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
        from ..stages.ordering import sorted_by

        final = sorted_by(dedup_triples_narrow(triples),
                          ["conv_id", "turn_idx"])
        final.write_parquet(tmp)
        nrows = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        # 16-byte/row hash sidecar (future append_kg_job anti-joins read
        # it instead of the full triple strings), written INSIDE the tmp
        # dir so the commit's atomic rename covers it: no partial or
        # stale sidecar can ever coexist with committed triples
        _write_hash_sidecar(tmp, [
            os.path.join(tmp, f) for f in sorted(os.listdir(tmp))
            if f.endswith(".parquet")])
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


# ----------------------------------------------------------------------
# Incremental append path
# ----------------------------------------------------------------------

def _typed_sentinels(sch, cols: list[str]):
    """Dtype-exact filler builder for hash_anti_join's bucket-fallback
    union (repo idiom: None-filled object columns would coerce the
    int/string triple columns and drift the written parquet schema).
    `sch` is a parquet footer schema; only `cols` are filled."""
    import numpy as np

    types = {c: str(t) for c, t in zip(sch.names, sch.types)}

    def _sentinels(n: int) -> dict:
        out = {}
        for c in cols:
            t = types[c]
            if t.startswith("int"):
                out[c] = np.full(n, -1, dtype=t)
            elif t in ("float", "double") or t.startswith("float"):
                out[c] = np.full(n, np.nan)
            else:
                out[c] = np.full(n, "", dtype=object)
        return out

    return _sentinels


def _stage_parquet_files(out_dir: str) -> list[str]:
    """All committed triple parquet files: the base final stage plus
    every prior append stage."""
    files: list[str] = []
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        if name == "stage=final" or name.startswith("stage=append-"):
            m = LineageManifest(os.path.join(out_dir, name))
            for sid in m.entries:
                d = m.shard_dir(sid)
                files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                             if f.endswith(".parquet"))
    return files


_KEYFMT_MARKER = "_KEYFMT_2"
"""Sidecar hash-format version sentinel.  Format 2 = NUL-separated
quad key (stages/keys.py); sidecars WITHOUT this marker were written
by the pre-fix builder whose vectorized concat lost its separators
(see keys.py module docstring), so their hashes do not match
recomputation — `_existing_hashes_ds` treats them as absent and
recomputes from the triples instead."""


def _hash_project(b):
    """(subj, pred, obj, graph) Arrow batch -> 16-byte (h1, h2) rows.
    Arrow-native: the IRI columns never round-trip through pandas."""
    import pyarrow as pa

    from ..stages.dedup import _quad_key128_table

    h1, h2 = _quad_key128_table(b)
    return pa.table({"h1": pa.array(h1, pa.int64()),
                     "h2": pa.array(h2, pa.int64())})


def _write_hash_sidecar(shard_tmp_dir: str, triple_files: list[str]) -> str:
    """Persist the 128-bit quad hashes of a shard so future appends
    anti-join by reading 16 bytes/row instead of full triples.  Written
    into `<shard tmp>/_hashes` BEFORE the manifest commit: the commit's
    atomic tmp->final rename makes triples and sidecar appear together,
    so no crash can leave a partial or stale sidecar next to committed
    data."""
    import ray.data as rd

    side = os.path.join(shard_tmp_dir, "_hashes")
    os.makedirs(side, exist_ok=True)
    if triple_files:  # a fully-deduped append commits zero files
        (rd.read_parquet(triple_files,
                         columns=["subj", "pred", "obj", "graph"])
         .map_batches(_hash_project, batch_format="pyarrow")
         .write_parquet(side))
    # format marker LAST: a crash mid-write leaves an unmarked (hence
    # ignored, recompute-from-triples) sidecar, never a trusted partial
    with open(os.path.join(side, _KEYFMT_MARKER), "w"):
        pass
    return side


def _existing_hashes_ds(out_dir: str):
    """Dataset of (h1, h2) over every committed stage — from sidecars
    where present (16-byte rows), recomputed from triples otherwise."""
    import ray.data as rd

    from ..stages.dedup import _quad_key128

    side_files: list[str] = []
    full_files: list[str] = []
    for name in sorted(os.listdir(out_dir)) if os.path.isdir(out_dir) else []:
        if name == "stage=final" or name.startswith("stage=append-"):
            m = LineageManifest(os.path.join(out_dir, name))
            for sid in m.entries:
                d = m.shard_dir(sid)
                side = os.path.join(d, "_hashes")
                # sidecar usable only in the current key format: v1
                # sidecars (no marker) hold separator-free hashes that
                # no longer match recomputation — fall back to triples
                if (os.path.isdir(side)
                        and os.path.exists(os.path.join(side,
                                                        _KEYFMT_MARKER))
                        and any(f.endswith(".parquet")
                                for f in os.listdir(side))):
                    side_files.extend(
                        os.path.join(side, f)
                        for f in sorted(os.listdir(side))
                        if f.endswith(".parquet"))
                else:
                    # pre-sidecar shard: recompute from the triples
                    full_files.extend(
                        os.path.join(d, f) for f in sorted(os.listdir(d))
                        if f.endswith(".parquet"))
    parts = []
    if side_files:
        parts.append(rd.read_parquet(side_files))
    if full_files:
        parts.append(rd.read_parquet(
            full_files, columns=["subj", "pred", "obj", "graph"])
            .map_batches(_hash_project, batch_format="pyarrow"))
    if not parts:
        return None
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def append_kg_job(
    out_dir: str,
    n_convs: int,
    lo: int,
    hi: int,
    turns_per_conv: int = 20,
    seed: int = 42,
    parse_concurrency=None,
    hash_broadcast_limit: int = 20_000_000,
    num_buckets: int = 64,
) -> dict:
    """Incrementally ingest conversations [lo, hi) of an
    `n_convs`-sized transcript universe into an existing KG output
    directory (base `run_kg_job` output and/or prior appends).

    New triples self-dedup with the narrow shuffle, then anti-join the
    EXISTING corpus by 128-bit quad hash: committed stages persist a
    16-byte/row hash sidecar, so an append over a 10^12-triple KB reads
    hashes, never historical triple strings.  Existing-hash probe is a
    size-gated broadcast (sorted h1 + aligned h2, searchsorted span
    check) with an h1-bucket-paired anti-join fallback past
    `hash_broadcast_limit`.  Output is a new `stage=append-{lo}-{hi}`
    directory with its own lineage manifest + hash sidecar: appends are
    idempotent and individually resumable, and the base stages are
    never rewritten."""
    import numpy as np
    import pandas as pd
    import ray
    import ray.data as rd

    from ..stages.dedup import _quad_key128

    t0 = time.time()
    # a compact generation committed but not yet promoted hides the
    # stages it consumed from _existing_hashes_ds (some may already be
    # retired) — anti-joining that partial corpus would re-ingest
    # duplicates that become permanent at the next promotion.  Finish
    # the pending promotion first, exactly like compact_kg_job does.
    _finish_pending_compact(out_dir)
    stage = os.path.join(out_dir, f"stage=append-{lo}-{hi}")
    manifest = LineageManifest(stage)
    fp = _fingerprint("append", seed, n_convs, turns_per_conv, lo, hi)
    if manifest.is_done("all", fp):
        return {"elapsed_sec": 0.0, "rows": manifest.entries["all"]["rows"],
                "out_dir": stage, "resumed": True}

    existing = _existing_hashes_ds(out_dir)

    ts = _transcripts_conv_range(lo, hi, n_convs, turns_per_conv, seed)
    new_triples = build_kg_dataset(
        ts, parse_concurrency=parse_concurrency, dedup=True, sort=False)

    if existing is not None:
        from ..stages.antijoin import hash_anti_join

        # schema from a committed stage's parquet footer: calling
        # new_triples.schema() would execute the parse pipeline early
        # just to enumerate constant columns.  The bucket fallback's
        # union needs identical columns AND dtypes on both sides (repo
        # idiom — None-filled object columns would coerce the
        # int/string triple columns and drift the written parquet
        # schema), hence the typed sentinel fillers.
        sch = pq.read_schema(_stage_parquet_files(out_dir)[0])
        tcols = list(sch.names)
        _sentinels = _typed_sentinels(sch, tcols)

        new_triples = hash_anti_join(
            new_triples, existing, hash_fn=_quad_key128, cols=tcols,
            sentinel_fn=_sentinels, broadcast_limit=hash_broadcast_limit,
            num_buckets=num_buckets)

    tmp = manifest.begin("all", fp)
    new_triples.sort(["conv_id", "turn_idx"]).write_parquet(tmp)
    rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
               for f in os.listdir(tmp) if f.endswith(".parquet"))
    _write_hash_sidecar(tmp, [
        os.path.join(tmp, f) for f in sorted(os.listdir(tmp))
        if f.endswith(".parquet")])
    manifest.commit("all", fp, rows,
                    metrics={"elapsed": time.time() - t0})
    return {"elapsed_sec": time.time() - t0, "rows": rows,
            "out_dir": stage, "resumed": False}


def _finish_pending_compact(out_dir: str) -> dict | None:
    """Promote a COMMITTED `stage=final.compact` generation: remove the
    consumed stages it recorded at commit time, then rename it to
    `stage=final`.  This is the ONLY promotion path — `compact_kg_job`
    calls it for the happy case too, so every crash point between
    commit and promotion is recovered by simply re-running: the
    consumed-stage list comes from the committed manifest, never from a
    re-scan of whatever stages happen to survive the crash (a re-scan
    after a partial retire would compute a wrong fingerprint and could
    discard the committed generation — the exact hazard this replaces).
    Returns the promotion metrics, or None when no committed compact
    generation is pending."""
    import shutil

    gen_dir = os.path.join(out_dir, "stage=final.compact")
    if not os.path.isdir(gen_dir):
        return None
    entry = LineageManifest(gen_dir).entries.get("all")
    if not entry or not entry.get("complete"):
        # crashed before commit: stale tmp, cleaned by the next begin()
        return None
    consumed = entry.get("metrics", {}).get("consumed_stages")
    if consumed is None:
        # Commit predates the consumed_stages metric.  Recover only if
        # the surviving stages' row count proves the committed
        # generation covers exactly their union (appends are disjoint,
        # so the union row count is the sum); anything else — a crash
        # mid-retire, or appends landed after the commit — needs a
        # human, and refusing beats silently losing or duplicating rows.
        stages = sorted(
            name for name in os.listdir(out_dir)
            if name == "stage=final" or name.startswith("stage=append-"))
        stage_rows = sum(pq.read_metadata(f).num_rows
                         for f in _stage_parquet_files(out_dir))
        if stage_rows != entry["rows"]:
            raise RuntimeError(
                f"committed compact generation ({entry['rows']} rows) "
                f"has no consumed_stages record and does not match the "
                f"surviving stages ({stage_rows} rows across "
                f"{stages!r}); refusing to promote")
        consumed = stages
    for name in consumed:
        p = os.path.join(out_dir, name)
        if os.path.isdir(p):
            shutil.rmtree(p)
    final = os.path.join(out_dir, "stage=final")
    if os.path.isdir(final):  # not in `consumed` => manifest corruption
        raise RuntimeError(
            f"stage=final exists but is not in the committed compact's "
            f"consumed_stages {consumed!r}; refusing to overwrite")
    os.rename(gen_dir, final)
    return {"rows": entry["rows"], "compacted_stages": len(consumed),
            "out_dir": out_dir}


def compact_kg_job(out_dir: str) -> dict:
    """Merge every committed stage (base final + appends) into a single
    `stage=final` generation.  A long-lived KB accumulates many small
    append stages; reads then pay per-stage file listing and tiny-file
    overhead.  Compaction rewrites the union (appends are disjoint by
    construction — the append anti-join guarantees it, so NO dedup
    shuffle is needed, only the stable global sort) and retires the
    consumed stages.

    Crash-safe: the new generation commits (atomic tmp->rename with its
    hash sidecar) under a name `_stage_parquet_files` does NOT scan, so
    readers never see old and new rows together, and the commit records
    the exact stage names it consumed.  Promotion (retire consumed
    stages, rename to `stage=final`) runs via `_finish_pending_compact`
    — on entry first, so a crash anywhere during a previous promotion
    (mid-retire, or after retiring everything but before the rename) is
    finished from the committed manifest before any re-scan of the
    stage list; no row committed to the compact generation can be
    lost."""
    import ray.data as rd

    recovered = _finish_pending_compact(out_dir)
    if recovered is not None:
        return {**recovered, "recovered": True}

    files = _stage_parquet_files(out_dir)
    if not files:
        return {"rows": 0, "compacted_stages": 0, "out_dir": out_dir}
    stages = sorted(
        name for name in os.listdir(out_dir)
        if name == "stage=final" or name.startswith("stage=append-"))
    if len(stages) <= 1:
        return {"rows": None, "compacted_stages": 0, "out_dir": out_dir,
                "skipped": "nothing to compact"}

    t0 = time.time()
    gen_dir = os.path.join(out_dir, "stage=final.compact")
    manifest = LineageManifest(gen_dir)
    fp = _fingerprint("compact", *files)
    tmp = manifest.begin("all", fp)
    (rd.read_parquet(files).sort(["conv_id", "turn_idx"])
     .write_parquet(tmp))
    rows = sum(pq.read_metadata(os.path.join(tmp, f)).num_rows
               for f in os.listdir(tmp) if f.endswith(".parquet"))
    _write_hash_sidecar(tmp, [
        os.path.join(tmp, f) for f in sorted(os.listdir(tmp))
        if f.endswith(".parquet")])
    manifest.commit("all", fp, rows, metrics={
        "elapsed": time.time() - t0, "consumed_stages": stages})

    promoted = _finish_pending_compact(out_dir)
    assert promoted is not None and promoted["rows"] == rows
    return {**promoted, "elapsed_sec": time.time() - t0}


def kg_diff(dir_a: str, dir_b: str, out_dir: str | None = None,
            hash_broadcast_limit: int = 20_000_000,
            num_buckets: int = 64) -> dict:
    """Quad-level diff of two committed KBs: triples B added relative
    to A and triples B removed, by 128-bit quad-hash anti-joins in
    both directions — the audit primitive for KB lifecycle work
    (did the re-ingest change anything?  what did the compaction
    drop?).  (The reference's Repository is a single in-memory graph;
    diffing generations is part of this repo's checkpoint/lineage
    surface, SURVEY §2.10.)

    Scale shape: each direction probes the OTHER side's persisted hash
    sidecars (16 bytes/row; recomputed only for pre-sidecar shards) via
    the shared `hash_anti_join` stage — size-gated broadcast with the
    h1-bucket distributed fallback — so full triple strings stream only
    for the side being projected, and only rows that actually differ
    reach `out_dir` (written as partitioned Parquet when given).
    Committed KBs are globally deduped by construction (the append
    anti-join guarantees it), so counts are exact set differences."""
    import ray.data as rd

    from ..stages.antijoin import hash_anti_join
    from ..stages.dedup import _quad_key128

    t0 = time.time()

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "graph"]

    def _side(files, other_hashes, label):
        if not files:
            return None, 0
        left = rd.read_parquet(files, columns=cols)
        diff = hash_anti_join(
            left, other_hashes,
            hash_fn=lambda b: _quad_key128(b),
            cols=cols,
            # typed fillers keep the bucket fallback's union from
            # drifting turn_idx/int columns to object/int64
            sentinel_fn=_typed_sentinels(pq.read_schema(files[0]), cols),
            broadcast_limit=hash_broadcast_limit,
            num_buckets=num_buckets)
        diff = diff.materialize()  # consumed twice: count + write
        n = diff.count()
        if out_dir is not None and n:
            diff.write_parquet(os.path.join(out_dir, label))
        return diff, n

    a_files = _stage_parquet_files(dir_a)
    b_files = _stage_parquet_files(dir_b)
    _, added = _side(b_files, _existing_hashes_ds(dir_a), "diff=added")
    _, removed = _side(a_files, _existing_hashes_ds(dir_b), "diff=removed")
    n_a = sum(pq.read_metadata(f).num_rows for f in a_files)
    n_b = sum(pq.read_metadata(f).num_rows for f in b_files)
    return {"added": added, "removed": removed,
            "n_a": n_a, "n_b": n_b, "common": n_a - removed,
            "elapsed_sec": time.time() - t0}
