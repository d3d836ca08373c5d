"""End-to-end Ray pipeline tests (SURVEY.md §5c/§5d)."""
import os

import pyarrow.parquet as pq
import pytest

from rdf_n3_ray.pipelines.kg import build_kg_dataset, run_kg_job
from rdf_n3_ray.sources.transcripts import (
    entity_table,
    make_turn_text,
    transcripts_dataset,
)
from rdf_n3_ray.stages.parse_stage import ParseN3Turns
from rdf_n3_ray.parser.n3_parser import parse_n3


def test_transcripts_deterministic(ray_session):
    a = transcripts_dataset(n_convs=20, turns_per_conv=5).to_pandas()
    b = transcripts_dataset(n_convs=20, turns_per_conv=5).to_pandas()
    a = a.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = b.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert a.equals(b)
    assert set(a.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}


def test_parse_stage_matches_oracle(ray_session):
    """Distributed parse == single-process oracle parse, per turn."""
    ts = transcripts_dataset(n_convs=15, turns_per_conv=6)
    triples = ts.map_batches(ParseN3Turns(), batch_format="pyarrow").to_pandas()
    grouped = {
        k: sorted(zip(g["subj"], g["pred"], g["obj"], g["graph"].fillna("")))
        for k, g in triples.groupby(["conv_id", "turn_idx"])
    }
    rows = transcripts_dataset(n_convs=15, turns_per_conv=6).to_pandas()
    for _, row in rows.iterrows():
        r = parse_n3(row["text"])
        expected = sorted((s, p, o, g or "") for s, p, o, g in r.quads)
        got = grouped.get((row["conv_id"], row["turn_idx"]), [])
        assert got == expected, (row["conv_id"], row["turn_idx"], row["text"])


def test_kg_dataset_end_to_end(ray_session):
    ts = transcripts_dataset(n_convs=25, turns_per_conv=5)
    kg = build_kg_dataset(ts)
    df = kg.to_pandas()
    assert len(df) > 50
    # skolemized: no bnodes survive canonicalization
    assert not df["subj"].str.startswith("_:").any()
    assert not df["obj"].str.startswith("_:").any()
    assert not df["graph"].dropna().str.startswith("_:").any()
    # exact dedup: no duplicate quads
    assert not df.duplicated(subset=["subj", "pred", "obj", "graph"]).any()
    # stable (conv_id, turn_idx) ordering (north rule)
    key = list(zip(df["conv_id"], df["turn_idx"]))
    assert key == sorted(key)
    # entity links present
    assert (df["pred"] == "<http://example.org/kg#mentions>").any()


def test_malformed_turns_dont_kill_pipeline(ray_session):
    # ~5% of turns are malformed by construction; pipeline must survive
    texts = [make_turn_text(42, c, t) for c in range(30) for t in range(5)]
    assert any(parse_n3(t).errors for t in texts)  # corpus includes bad docs


def test_run_kg_job_resume(ray_session, tmp_path):
    """Kill mid-run, resume: zero reprocessing, identical output."""
    out1 = str(tmp_path / "job1")
    with pytest.raises(RuntimeError):
        run_kg_job(out1, n_convs=40, turns_per_conv=4, n_shards=4, fail_after_shards=2)
    manifest_path = os.path.join(out1, "stage=triples", "_lineage.json")
    assert os.path.exists(manifest_path)
    import json

    before = json.load(open(manifest_path))["partitions"]
    assert len(before) == 2
    stamps = {k: v["completed_at"] for k, v in before.items()}

    m = run_kg_job(out1, n_convs=40, turns_per_conv=4, n_shards=4)
    after = json.load(open(manifest_path))["partitions"]
    assert len(after) == 4
    for k, ts_ in stamps.items():  # finished shards untouched on resume
        assert after[k]["completed_at"] == ts_

    # uninterrupted run elsewhere produces identical final rows
    out2 = str(tmp_path / "job2")
    m2 = run_kg_job(out2, n_convs=40, turns_per_conv=4, n_shards=4)
    t1 = pq.read_table(os.path.join(out1, "stage=final", "shard=all")).to_pandas()
    t2 = pq.read_table(os.path.join(out2, "stage=final", "shard=all")).to_pandas()
    t1 = t1.sort_values(list(t1.columns)).reset_index(drop=True)
    t2 = t2.sort_values(list(t2.columns)).reset_index(drop=True)
    assert t1.equals(t2)
    assert m["final_rows"] == m2["final_rows"]


def test_entity_table_shape():
    t = entity_table()
    assert set(t.schema.names) == {"mention_norm", "canonical_iri", "score"}
    assert t.num_rows >= 10


def test_kg_output_invariant_under_blocking(ray_session):
    """Same input at different parallelism/blockings must emit byte-
    identical triples — the determinism that makes retries and
    repartitioning safe at cluster scale (SURVEY §4)."""
    from rdf_n3_ray.pipelines.kg import build_kg_dataset
    from rdf_n3_ray.sources.transcripts import transcripts_dataset

    outs = []
    for nb in (2, 13):
        ts = transcripts_dataset(n_convs=40, turns_per_conv=6,
                                 override_num_blocks=nb)
        df = build_kg_dataset(ts).to_pandas()
        outs.append(df.reset_index(drop=True))
    assert outs[0].equals(outs[1]), (len(outs[0]), len(outs[1]))


def test_sorted_by_partitioned_fast_path_equals_global_sort(ray_session):
    """sorted_by on range-partitioned blocks must produce exactly the
    global-sort order without shuffling; on interleaved (unpartitioned)
    blocks the boundary check must detect the overlap and fall back —
    either way the output order is the global lexicographic order."""
    import ray.data as rd

    from rdf_n3_ray.stages.ordering import sorted_by

    # partitioned: two blocks with disjoint ascending conv ranges
    part = rd.from_items(
        [{"conv_id": f"conv-{c:06d}", "turn_idx": t, "v": c * 10 + t}
         for c in (1, 2) for t in (2, 0, 1)], override_num_blocks=1).union(
        rd.from_items(
            [{"conv_id": f"conv-{c:06d}", "turn_idx": t, "v": c * 10 + t}
             for c in (3, 4) for t in (1, 0)], override_num_blocks=1))
    got = sorted_by(part, ["conv_id", "turn_idx"]).to_pandas()
    want = part.sort(["conv_id", "turn_idx"]).to_pandas()
    assert got.values.tolist() == want.values.tolist()

    # unpartitioned: conv ranges interleave across blocks -> fallback
    mixed = rd.from_items(
        [{"conv_id": f"conv-{c:06d}", "turn_idx": 0, "v": c}
         for c in (5, 1)], override_num_blocks=1).union(
        rd.from_items(
            [{"conv_id": f"conv-{c:06d}", "turn_idx": 0, "v": c}
             for c in (3, 2)], override_num_blocks=1))
    got2 = sorted_by(mixed, ["conv_id", "turn_idx"]).to_pandas()
    assert got2["v"].tolist() == [1, 2, 3, 5]


def test_read_n3_files_source(ray_session, tmp_path):
    from rdf_n3_ray.sources.n3_files import read_n3_files

    (tmp_path / "a.n3").write_text("<#s> <#p> <#o> .")
    (tmp_path / "b.n3").write_text(
        "@prefix : <http://ex/>. :x a :T ; :n 1, 2 .")
    ds = read_n3_files(str(tmp_path))
    df = ds.to_pandas().sort_values(["doc", "emit_idx"]).reset_index(drop=True)
    assert len(df) == 4
    assert df[df.doc.str.endswith("a.n3")].subj.iloc[0].endswith("#s>")
    b = df[df.doc.str.endswith("b.n3")]
    assert set(b.pred) == {
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
        "<http://ex/n>"}


def test_serializer_absorbs_conv_skew(ray_session):
    """One pathologically hot conversation must spread across shuffle
    buckets (north rule: salted repartitioning for conv_id skew)."""
    import pandas as pd
    import ray.data as rd

    from rdf_n3_ray.stages.partitioning import turn_bucket

    hot = pd.DataFrame({
        "conv_id": ["conv_hot"] * 5000 + ["conv_a", "conv_b"],
        "turn_idx": list(range(5000)) + [0, 0],
        "subj": ["<http://ex/s>"] * 5002,
        "pred": ["<http://ex/p>"] * 5002,
        "obj": ["<http://ex/o>"] * 5002,
        "graph": [None] * 5002,
    })
    bucketed = turn_bucket(hot, num_buckets=64)
    counts = bucketed["tbucket"].value_counts()
    # hot conversation spreads: no bucket holds more than ~3x the mean
    assert counts.max() < 3 * (len(hot) / 64)

    from rdf_n3_ray.serializer.n3_writer import serialize_documents

    out = serialize_documents(rd.from_pandas(hot)).to_pandas()
    assert len(out) == 5002  # one doc per (conv, turn)


def test_per_turn_semantics_preserved_end_to_end(ray_session):
    """North-rule invariant: for every turn, the pipeline's rendered N3
    document is semantically equal (bnode-isomorphic) to parsing the
    original turn text directly, under stable (conv_id, turn_idx)
    ordering."""
    from rdf_n3_ray.isomorphism import isomorphic
    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.serializer.n3_writer import serialize_documents
    from rdf_n3_ray.sources.transcripts import transcripts_dataset
    from rdf_n3_ray.stages.parse_stage import parse_transcripts

    ts = transcripts_dataset(n_convs=30, turns_per_conv=6)
    originals = {(r["conv_id"], r["turn_idx"]): r["text"]
                 for r in ts.take_all()}
    rendered = serialize_documents(parse_transcripts(ts)).to_pandas()
    rendered = rendered.sort_values(["conv_id", "turn_idx"])
    assert len(rendered) > 50
    checked = 0
    for _, row in rendered.iterrows():
        text = originals[(row.conv_id, row.turn_idx)]
        direct = parse_n3(text)
        if direct.errors:
            continue
        back = parse_n3(row.n3)
        assert not back.errors, (row.conv_id, row.turn_idx, back.errors)
        assert isomorphic(direct.quads, back.quads), (
            row.conv_id, row.turn_idx, text, row.n3)
        checked += 1
    assert checked > 50


def test_append_kg_job_incremental(ray_session, tmp_path):
    """append_kg_job over conv ranges reproduces the one-shot full job
    exactly: base stage [0,20) + append stage [20,30) of a 30-conv
    universe == run_kg_job over the same 30 convs (row-set identity),
    and a re-run of the append is a resumed no-op."""
    import pandas as pd
    import ray.data as rd

    from rdf_n3_ray.pipelines.kg import (_stage_parquet_files,
                                         append_kg_job, run_kg_job)

    inc = str(tmp_path / "inc")
    base = append_kg_job(inc, n_convs=30, lo=0, hi=20, turns_per_conv=5)
    assert base["rows"] > 0 and not base["resumed"]
    app = append_kg_job(inc, n_convs=30, lo=20, hi=30, turns_per_conv=5)
    assert app["rows"] > 0 and not app["resumed"]

    full_dir = str(tmp_path / "full")
    run_kg_job(full_dir, n_convs=30, turns_per_conv=5, n_shards=3)

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "graph"]

    def rows(files):
        df = rd.read_parquet(files).to_pandas()[cols]
        return set(map(tuple, df.fillna("\x00").values.tolist()))

    got = rows(_stage_parquet_files(inc))
    want = rows(_stage_parquet_files(full_dir))
    assert got == want
    # triples present in base convs never reappear in the append stage
    assert base["rows"] + app["rows"] == len(got)

    again = append_kg_job(inc, n_convs=30, lo=20, hi=30, turns_per_conv=5)
    assert again["resumed"] and again["rows"] == app["rows"]


def test_kg_diff(ray_session, tmp_path):
    """kg_diff between a base KB and base+append reports exactly the
    appended rows as added (and as removed in the reverse direction),
    zero diff against itself, and materializes only the differing
    quads when out_dir is given."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.kg import append_kg_job, kg_diff

    base = str(tmp_path / "base")
    b = append_kg_job(base, n_convs=30, lo=0, hi=20, turns_per_conv=5)
    grown = str(tmp_path / "grown")
    b2 = append_kg_job(grown, n_convs=30, lo=0, hi=20, turns_per_conv=5)
    assert b2["rows"] == b["rows"]
    app = append_kg_job(grown, n_convs=30, lo=20, hi=30, turns_per_conv=5)

    d = kg_diff(base, grown, out_dir=str(tmp_path / "d1"))
    assert d["added"] == app["rows"] and d["removed"] == 0
    assert d["n_a"] == b["rows"] and d["n_b"] == b["rows"] + app["rows"]
    assert d["common"] == b["rows"]
    added = rd.read_parquet(str(tmp_path / "d1" / "diff=added")).to_pandas()
    assert len(added) == app["rows"]
    assert (added["conv_id"] >= "conv-000020").all()

    rev = kg_diff(grown, base)
    assert rev["added"] == 0 and rev["removed"] == app["rows"]

    self_d = kg_diff(base, base)
    assert self_d["added"] == 0 and self_d["removed"] == 0
    assert self_d["common"] == b["rows"]

    # hash_broadcast_limit=0 forces the h1-bucket fallback: identical
    # counts AND no schema drift in the written diff (typed sentinels —
    # turn_idx must stay int32, the committed KB dtype)
    import pyarrow.parquet as _pq

    fb = kg_diff(base, grown, out_dir=str(tmp_path / "d2"),
                 hash_broadcast_limit=0)
    assert fb["added"] == app["rows"] and fb["removed"] == 0
    d2 = str(tmp_path / "d2" / "diff=added")
    import os as _os
    f = [x for x in _os.listdir(d2) if x.endswith(".parquet")][0]
    sch = _pq.read_schema(_os.path.join(d2, f))
    assert str(sch.field("turn_idx").type) == "int32"
    fb_rows = rd.read_parquet(d2).to_pandas()
    assert sorted(map(tuple, fb_rows[added.columns].values.tolist())) == \
        sorted(map(tuple, added.values.tolist()))


def test_append_kg_job_bucket_fallback(ray_session, tmp_path):
    """hash_broadcast_limit=0 forces the h1-bucket anti-join; output
    must equal the broadcast path row-for-row with identical dtypes."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.kg import _stage_parquet_files, append_kg_job

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    for out, limit in ((a, 20_000_000), (b, 0)):
        append_kg_job(out, n_convs=20, lo=0, hi=12, turns_per_conv=4,
                      hash_broadcast_limit=limit)
        append_kg_job(out, n_convs=20, lo=12, hi=20, turns_per_conv=4,
                      hash_broadcast_limit=limit)
    da = rd.read_parquet(_stage_parquet_files(a)).to_pandas()
    db = rd.read_parquet(_stage_parquet_files(b)).to_pandas()
    cols = sorted(da.columns)
    assert cols == sorted(db.columns)
    da = da[cols].sort_values(cols).reset_index(drop=True)
    db = db[cols].sort_values(cols).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(da, db)


def test_rebuild_refreshes_hash_sidecar(ray_session, tmp_path):
    """Re-running run_kg_job with changed params rebuilds stage=final
    AND its hash sidecar atomically (a stale sidecar would silently
    corrupt every future append's anti-join)."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.kg import append_kg_job, run_kg_job

    out = str(tmp_path / "kb")
    run_kg_job(out, n_convs=10, turns_per_conv=4, n_shards=2)
    m2 = run_kg_job(out, n_convs=16, turns_per_conv=4, n_shards=2)

    side = str(tmp_path / "kb" / "stage=final" / "shard=all" / "_hashes")
    n_hashes = rd.read_parquet(side).count()
    assert n_hashes == m2["final_rows"]

    # an append after the rebuild dedups against the REBUILT corpus:
    # re-appending an already-ingested range drops every triple
    app = append_kg_job(out, n_convs=16, lo=0, hi=16, turns_per_conv=4)
    assert app["rows"] == 0


def test_compact_kg_job(ray_session, tmp_path):
    """Base + appends compact into one stage=final generation with a
    fresh sidecar; row set unchanged; later appends still dedup against
    the compacted corpus."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.kg import (_stage_parquet_files,
                                         append_kg_job, compact_kg_job)

    out = str(tmp_path / "kb")
    append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    append_kg_job(out, n_convs=30, lo=15, hi=25, turns_per_conv=4)

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "graph"]

    def rows():
        df = rd.read_parquet(_stage_parquet_files(out)).to_pandas()[cols]
        return set(map(tuple, df.fillna("\x00").values.tolist()))

    before = rows()
    m = compact_kg_job(out)
    assert m["compacted_stages"] == 2
    assert rows() == before
    assert sorted(n for n in __import__("os").listdir(out)
                  if n.startswith("stage=")) == ["stage=final"]
    # sidecar refreshed: hash count == row count
    side = f"{out}/stage=final/shard=all/_hashes"
    assert rd.read_parquet(side).count() == len(before)
    # re-appending an ingested range is a no-op against the compacted KB
    again = append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    assert again["rows"] == 0
    # appending genuinely new conversations still lands
    new = append_kg_job(out, n_convs=30, lo=25, hi=30, turns_per_conv=4)
    assert new["rows"] > 0


def _kb_rowset(out):
    import ray.data as rd

    from rdf_n3_ray.pipelines.kg import _stage_parquet_files

    cols = ["conv_id", "turn_idx", "subj", "pred", "obj", "graph"]
    df = rd.read_parquet(_stage_parquet_files(out)).to_pandas()[cols]
    return set(map(tuple, df.fillna("\x00").values.tolist()))


def test_compact_kg_job_crash_mid_retire(ray_session, tmp_path, monkeypatch):
    """Crash while retiring consumed stages (after the compact
    generation committed): the re-run finishes the promotion from the
    committed manifest — no recompute, no lost rows, appends still
    dedup against the full corpus."""
    import shutil

    from rdf_n3_ray.pipelines.kg import append_kg_job, compact_kg_job

    out = str(tmp_path / "kb")
    append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    append_kg_job(out, n_convs=30, lo=15, hi=25, turns_per_conv=4)
    before = _kb_rowset(out)

    real_rmtree = shutil.rmtree
    calls = {"n": 0}

    def crashing_rmtree(path, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first stage retired, crash on the second
            raise RuntimeError("injected crash mid-retire")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", crashing_rmtree)
    with pytest.raises(RuntimeError, match="mid-retire"):
        compact_kg_job(out)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    m = compact_kg_job(out)
    assert m.get("recovered") and m["compacted_stages"] == 2
    assert _kb_rowset(out) == before
    assert sorted(n for n in os.listdir(out)
                  if n.startswith("stage=")) == ["stage=final"]
    again = append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    assert again["rows"] == 0
    new = append_kg_job(out, n_convs=30, lo=25, hi=30, turns_per_conv=4)
    assert new["rows"] > 0


def test_compact_kg_job_crash_before_promote(ray_session, tmp_path,
                                             monkeypatch):
    """Crash after every consumed stage is retired but BEFORE the
    committed generation is renamed to stage=final — the worst window
    (zero visible stages).  The re-run must promote the committed
    generation instead of treating the KB as empty."""
    from rdf_n3_ray.pipelines import kg as KG
    from rdf_n3_ray.pipelines.kg import (_stage_parquet_files,
                                         append_kg_job, compact_kg_job)

    out = str(tmp_path / "kb")
    append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    append_kg_job(out, n_convs=30, lo=15, hi=25, turns_per_conv=4)
    before = _kb_rowset(out)

    real_rename = os.rename

    def crashing_rename(src, dst, *a, **kw):
        if dst.endswith(os.sep + "stage=final"):
            raise RuntimeError("injected crash before promote")
        return real_rename(src, dst, *a, **kw)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="before promote"):
        compact_kg_job(out)
    monkeypatch.setattr(os, "rename", real_rename)

    # every consumed stage is gone; the naive stage scan sees nothing
    assert _stage_parquet_files(out) == []
    m = compact_kg_job(out)
    assert m.get("recovered") and m["compacted_stages"] == 2
    assert _kb_rowset(out) == before
    again = append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    assert again["rows"] == 0


def _kb_row_multiset_size(out):
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.kg import _stage_parquet_files

    return sum(pq.read_metadata(f).num_rows
               for f in _stage_parquet_files(out))


def test_append_during_pending_compact_promotes_first(
        ray_session, tmp_path, monkeypatch):
    """An append launched while a committed compact generation is
    pending (crashed mid-retire, one stage already gone) must finish
    the promotion FIRST — anti-joining the partial corpus would
    re-ingest rows that live in the compact generation and duplicate
    them forever."""
    import shutil

    from rdf_n3_ray.pipelines.kg import append_kg_job, compact_kg_job

    out = str(tmp_path / "kb")
    append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    append_kg_job(out, n_convs=30, lo=15, hi=25, turns_per_conv=4)
    before = _kb_rowset(out)
    n_before = _kb_row_multiset_size(out)

    real_rmtree = shutil.rmtree
    calls = {"n": 0}

    def crashing_rmtree(path, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # first stage retired, crash on the second
            raise RuntimeError("injected crash mid-retire")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", crashing_rmtree)
    with pytest.raises(RuntimeError, match="mid-retire"):
        compact_kg_job(out)
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    # NOT compact_kg_job — the append itself must recover the pending
    # promotion, then dedup against the complete corpus
    again = append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    assert again["rows"] == 0  # idempotent: nothing re-ingested
    assert "stage=final.compact" not in os.listdir(out)
    new = append_kg_job(out, n_convs=30, lo=25, hi=30, turns_per_conv=4)
    assert new["rows"] > 0
    assert _kb_rowset(out) >= before
    # multiset check: no row appears twice across stages
    assert _kb_row_multiset_size(out) == n_before + new["rows"]


def test_finish_pending_compact_legacy_manifest(ray_session, tmp_path,
                                                monkeypatch):
    """A compact generation committed WITHOUT the consumed_stages
    metric (pre-upgrade code) recovers when the surviving stages' row
    count proves coverage, and refuses loudly when it cannot."""
    import json
    import shutil

    from rdf_n3_ray.pipelines import kg as KG
    from rdf_n3_ray.pipelines.kg import append_kg_job, compact_kg_job

    def commit_unpromoted_legacy(out):
        """Run compact with promotion stubbed out, then strip the
        consumed_stages metric — the exact on-disk state the
        pre-upgrade code left after a crash right after commit."""
        monkeypatch.setattr(KG, "_finish_pending_compact",
                            lambda _d: None)
        with pytest.raises(AssertionError):
            compact_kg_job(out)
        monkeypatch.undo()
        mpath = os.path.join(out, "stage=final.compact", "_lineage.json")
        doc = json.load(open(mpath))
        del doc["partitions"]["all"]["metrics"]["consumed_stages"]
        json.dump(doc, open(mpath, "w"))

    out = str(tmp_path / "kb")
    append_kg_job(out, n_convs=30, lo=0, hi=15, turns_per_conv=4)
    append_kg_job(out, n_convs=30, lo=15, hi=25, turns_per_conv=4)
    before = _kb_rowset(out)

    commit_unpromoted_legacy(out)
    m = compact_kg_job(out)  # row counts match -> safe to promote
    assert m.get("recovered") and m["compacted_stages"] == 2
    assert _kb_rowset(out) == before

    # refusal arm: surviving stages no longer match the committed
    # generation (legacy crash mid-retire: one stage already deleted)
    append_kg_job(out, n_convs=30, lo=25, hi=30, turns_per_conv=4)
    commit_unpromoted_legacy(out)
    shutil.rmtree(os.path.join(out, "stage=append-25-30"))
    with pytest.raises(RuntimeError, match="refusing to promote"):
        compact_kg_job(out)


def test_span_membership_vectorized_probe():
    """Sorted-membership kernel behind the broadcast hash anti-join:
    exact pair membership even with multi-row equal-h1 spans (forced
    h1 collisions), no Python loop over hit rows."""
    import numpy as np

    from rdf_n3_ray.stages.antijoin import span_membership

    # reference set with h1 collisions: h1=5 spans three h2 values
    eh1 = np.array([1, 5, 5, 5, 9], dtype=np.int64)
    eh2 = np.array([10, 3, 7, 11, 2], dtype=np.int64)
    h1v = np.array([5, 5, 1, 9, 4, 5], dtype=np.int64)
    h2v = np.array([7, 8, 10, 2, 3, 11], dtype=np.int64)
    got = span_membership(eh1, eh2, h1v, h2v)
    assert got.tolist() == [True, False, True, True, False, True]
    # empty edges
    assert span_membership(np.array([], np.int64), np.array([], np.int64),
                           h1v, h2v).tolist() == [False] * 6
    e = np.array([], np.int64)
    assert span_membership(eh1, eh2, e, e).tolist() == []
    # brute-force equivalence on random pairs with engineered collisions
    rng = np.random.default_rng(7)
    r1 = rng.integers(0, 40, 3000).astype(np.int64)
    r2 = rng.integers(0, 40, 3000).astype(np.int64)
    order = np.lexsort((r2, r1))
    s1, s2 = r1[order], r2[order]
    p1 = rng.integers(0, 40, 2000).astype(np.int64)
    p2 = rng.integers(0, 40, 2000).astype(np.int64)
    ref = set(zip(s1.tolist(), s2.tolist()))
    want = np.array([(a, b) in ref for a, b in zip(p1, p2)])
    assert (span_membership(s1, s2, p1, p2) == want).all()


def test_append_ignores_unversioned_hash_sidecar(ray_session, tmp_path):
    """Sidecars written before the key-format fix (no _KEYFMT_2
    marker) hold hashes of separator-free keys; the append path must
    treat them as absent and recompute from the triples, or stale
    hashes would silently fail to dedup re-ingested rows."""
    import glob
    import os

    from rdf_n3_ray.pipelines.kg import _KEYFMT_MARKER, append_kg_job

    inc = str(tmp_path / "inc")
    base = append_kg_job(inc, n_convs=20, lo=0, hi=15, turns_per_conv=5)
    # simulate a v1 KB: strip every format marker (the hashes
    # themselves stay — they just must not be trusted)
    markers = glob.glob(os.path.join(inc, "**", _KEYFMT_MARKER),
                        recursive=True)
    assert markers, "sidecar marker expected after append"
    for m in markers:
        os.remove(m)
    # overlapping re-append: with recomputed (trusted) hashes the
    # overlap dedups exactly; rows = only convs [15, 20)
    app = append_kg_job(inc, n_convs=20, lo=10, hi=20, turns_per_conv=5)
    full = str(tmp_path / "full")
    ref = append_kg_job(full, n_convs=20, lo=0, hi=20, turns_per_conv=5)
    assert base["rows"] + app["rows"] == ref["rows"]


def test_nul_join_keys_preserve_separators():
    """stages/keys: NUL separators survive the join AND the hash —
    the two historical failure modes (numpy scalar coercion stripping
    the separator; hash_pandas_object's categorize path collapsing
    strings at an embedded NUL) stay fixed."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rdf_n3_ray.stages.keys import NUL, hash128, nul_join

    key = nul_join(pd.Series(["a", "ab"]), pd.Series(["bc", "c"]))
    vals = key.to_pylist()
    assert vals == [f"a{NUL}bc", f"ab{NUL}c"]
    h1, h2 = hash128(key)
    assert h1[0] != h1[1] and h2[0] != h2[1]  # boundary shift separates
    # large_string inputs (parquet reads) join and hash identically
    big = nul_join(pa.array(["a", "ab"], pa.large_string()),
                   pa.array(["bc", "c"], pa.large_string()))
    b1, b2 = hash128(big)
    assert np.array_equal(b1, h1) and np.array_equal(b2, h2)
    # null fill: the quad key's absent-graph sentinel
    filled = nul_join(pd.Series(["s", "s"]), pd.Series(["g", None]),
                      fill_null="\x01")
    assert filled.to_pylist() == [f"s{NUL}g", f"s{NUL}\x01"]


def test_lru_cache_survives_past_cap():
    """stages/lru.LruDict: recently-hit entries survive capacity
    eviction (the old wholesale clear() dropped a hot worker's whole
    distinct-text working set at once)."""
    from rdf_n3_ray.stages.lru import LruDict

    c = LruDict(8)
    for i in range(8):
        c.put(f"k{i}", i)
    # touch k0/k1: they move to the MRU end
    assert c.get("k0") == 0 and c.get("k1") == 1
    c.put("k8", 8)  # triggers oldest-half eviction (k2..k5 go)
    assert len(c) == 5
    assert "k0" in c and "k1" in c and "k8" in c
    assert c.get("k2") is None and c.get("k5") is None
    # re-put of an existing key never evicts AND refreshes recency
    c.put("k0", 99)
    assert c.get("k0") == 99 and len(c) == 5
    for i in range(20, 23):
        c.put(f"k{i}", i)  # one eviction round; k0 must survive (MRU)
    assert "k0" in c
    # a cached None value is a hit, not a miss
    c.put("none-key", None)
    assert "none-key" in c
    assert c.get("none-key", "MISS") is None


def test_driver_contract_consistency():
    """Meta-guard on __ray_entry__: every oracle_sql() key has a
    queries() entry; every rows-only entry (no oracle) carries a
    documented reason in the dict source; the never-driver-checked
    entries stay at the FRONT of the dict (the driver records only the
    first 50 per round — see queries() docstring)."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs), sorted(set(oracles) - set(qs))
    # dict-order sanity: the first 37 keys were never covered by any
    # CORRECTNESS_r0{1..4} artifact (the round-5 reorder's invariant)
    covered = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in (1, 2, 3, 4):
        p = os.path.join(root, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(p):
            covered |= set(json.load(open(p)))
    first = list(qs)[:37]
    assert not (set(first) & covered), sorted(set(first) & covered)


def test_bucket64_numeric_and_null_columns():
    """keys.bucket64 over mixed dtypes: ints stringify, missing values
    stay missing (reaching fill_null) instead of baking 'nan' into the
    key, and buckets land in [0, n)."""
    import numpy as np
    import pandas as pd

    from rdf_n3_ray.stages.keys import bucket64, nul_join

    b = bucket64(16, pd.Series([1, 2, 3]), pd.Series(["x", "y", "z"]))
    assert b.dtype == np.int32 and ((b >= 0) & (b < 16)).all()
    j = nul_join(pd.Series([1.5, np.nan]), pd.Series(["x", "y"]),
                 fill_null="\x01")
    assert j.to_pylist() == ["1.5\x00x", "\x01\x00y"]
