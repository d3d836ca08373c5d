"""Tests for training-data ops: dedup, ANN, text stats, multimodal."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rdf_n3_ray.stages.ann import BruteForceTopK, brute_force_topk, lsh_topk
from rdf_n3_ray.stages.multimodal import (
    DecodeImage,
    FrameSample,
    suggest_batch_size,
    synthetic_media_table,
)
from rdf_n3_ray.stages.neardup import (
    exact_dedup_docs,
    explode_bands,
    jaccard,
    minhash_lsh_dedup,
    minhash_signatures,
    simhash_batch,
)
from rdf_n3_ray.stages.text_stats import LangId, fingerprints, quality_scores, token_counts


def _docs_df():
    return pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog!",  # near-dup of 0
                "completely different content about machine learning",
                "der hund und die katze sind nicht der gleichen",
                "the quick brown fox jumps over the lazy dog",  # exact dup of 0
                "",
            ],
        }
    )


def test_minhash_similar_docs_collide():
    df = _docs_df()
    sigs = minhash_signatures(df)
    s0 = np.array(sigs["signature"][0])
    s1 = np.array(sigs["signature"][1])
    s2 = np.array(sigs["signature"][2])
    sim01 = (s0 == s1).mean()
    sim02 = (s0 == s2).mean()
    assert sim01 > 0.6 > sim02


def test_jaccard():
    assert jaccard("abcdef", "abcdef") == 1.0
    assert jaccard("abcdefgh", "zzzzzzzz") == 0.0


def test_simhash_near_for_near_docs():
    df = _docs_df()
    out = simhash_batch(df)
    h0, h1, h2 = out["simhash"][0], out["simhash"][1], out["simhash"][2]
    d01 = bin(h0 ^ h1).count("1")
    d02 = bin(h0 ^ h2).count("1")
    assert d01 < d02


def test_quality_and_tokens():
    df = quality_scores(_docs_df())
    assert df["n_words"][0] == 9
    assert df["punct_ratio"][1] > 0
    tk = token_counts(_docs_df())
    assert tk["ws_tokens"][0] == 9
    assert tk["re_tokens"][5] == 0


def test_fingerprints_stable():
    a, b = fingerprints(_docs_df()), fingerprints(_docs_df())
    assert (a["fp_exact"] == b["fp_exact"]).all()
    assert a["fp_exact"][0] == a["fp_exact"][4]  # exact dup
    assert a["fp_exact"][0] != a["fp_exact"][1]


def test_langid():
    lid = LangId()
    assert lid.classify("the cat and the dog for a walk in the park") == "en"
    assert lid.classify("der hund und die katze sind nicht hier") == "de"
    assert lid.classify("") == "und"


# real per-language sentences (the synthetic documents table carries
# random lang labels over English word-soup, so classifier ACCURACY is
# only measurable on a genuine fixture corpus — round-1 gap)
_LANG_FIXTURE = [
    ("en", "the weather is nice and it is a good day for a walk"),
    ("en", "she said that the results of the experiment were clear"),
    ("en", "it is important to test the code before it ships"),
    ("en", "a quick look at the data shows that the trend is real"),
    ("en", "the committee agreed that the plan was good for everyone"),
    ("de", "der zug ist nicht mit den anderen wagen gekommen"),
    ("de", "die kinder spielen mit dem hund und der katze im garten"),
    ("de", "das wetter ist heute nicht so gut wie gestern"),
    ("de", "der lehrer hat die aufgabe mit den studenten besprochen"),
    ("de", "die stadt ist von dem fluss und den bergen umgeben"),
    ("fr", "le chat est sur la table et les enfants sont pour le parc"),
    ("fr", "la maison est grande et le jardin est pour les fleurs"),
    ("fr", "il est important de tester le code et les programmes"),
    ("fr", "les résultats de la recherche sont pour un nouveau projet"),
    ("fr", "le train est arrivé et les passagers sont pour la sortie"),
    ("es", "el perro y el gato están en la casa de los abuelos"),
    ("es", "los niños juegan en el parque y la plaza de la ciudad"),
    ("es", "es importante que el código funcione en los servidores"),
    ("es", "la comida de la abuela es la mejor de todas las casas"),
    ("es", "el tren llega a la estación y los pasajeros bajan en orden"),
]


def test_langid_accuracy_on_fixture_corpus():
    lid = LangId()
    preds = [(want, lid.classify(text)) for want, text in _LANG_FIXTURE]
    acc = sum(w == g for w, g in preds) / len(preds)
    assert acc >= 0.9, preds


def test_minhash_empty_and_null_text_pairs(ray_session):
    """Empty-text docs form exact pairs (one whole-text shingle each) and
    NULL text is treated as empty — matching the SQL oracle's
    coalesce(text,'') + substring semantics.  Regression: the verify
    stage used to silently drop 0-shingle docs, and NULL text round-
    tripped through astype(str) as the literal \"nan\"."""
    import ray.data as rd

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["", "", None, "some actual long content goes here"],
    })
    pairs = minhash_lsh_dedup(rd.from_pandas(df), threshold=0.5).to_pandas()
    got = {(a, b): s for a, b, s in zip(pairs.a, pairs.b, pairs.sim)}
    assert got.get((1, 2)) == 1.0
    assert got.get((1, 3)) == 1.0 and got.get((2, 3)) == 1.0
    assert not any(4 in p for p in got)


def test_exact_dedup_docs(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_docs_df())
    out = exact_dedup_docs(ds).to_pandas().sort_values("doc_id")
    assert set(out["doc_id"]) == {0, 1, 2, 3, 5}  # 4 deduped into 0


def test_minhash_lsh_dedup_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(_docs_df())
    pairs = minhash_lsh_dedup(ds, threshold=0.7).to_pandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 4)).any()  # exact dup pair
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got or (1, 4) in got  # near-dup found
    assert (0, 2) not in got


def test_brute_force_topk(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    emb = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    queries = emb[:3]
    df = brute_force_topk(ds, queries, k=5)
    assert len(df) == 15
    # self is always the top hit
    for qi in range(3):
        top = df[df["query_idx"] == qi].iloc[0]
        assert top["vec_id"] == qi
        assert top["sim"] == pytest.approx(1.0, abs=1e-5)


def test_lsh_topk_self_hit(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(4)
    emb = rng.standard_normal((300, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(tbl)
    df = lsh_topk(ds, emb[:2], k=5, n_planes=4)
    for qi in range(2):
        sub = df[df["query_idx"] == qi]
        assert len(sub) > 0 and sub.iloc[0]["vec_id"] == qi


def test_multimodal_stub_pipeline(ray_session):
    import ray.data as rd

    media = rd.from_arrow(synthetic_media_table(n=24))
    images = media.filter(lambda r: r["kind"] == "image")
    feats = images.map_batches(DecodeImage(), batch_format="pyarrow", batch_size=8).to_pandas()
    assert len(feats) == 8
    assert feats["pix_mean"].between(0, 255).all()
    # deterministic across runs
    feats2 = images.map_batches(DecodeImage(), batch_format="pyarrow", batch_size=4).to_pandas()
    assert feats.sort_values("media_id")["pix_mean"].tolist() == \
        feats2.sort_values("media_id")["pix_mean"].tolist()

    frames = media.map_batches(FrameSample(fps=4), batch_format="pyarrow").to_pandas()
    assert (frames["frame_idx"] >= 0).all()
    assert len(frames) > 8  # 8 videos x ~4+ frames each


def test_audio_windows_stage(ray_session):
    """AudioWindows: only audio rows emit; window counts follow the
    duration/rate/window arithmetic with the max_windows cap; RMS/ZCR
    match a local recompute on the same stub waveform; deterministic
    across batch sizes."""
    import ray.data as rd

    from rdf_n3_ray.stages.multimodal import AudioWindows, audio_windows

    media_t = synthetic_media_table(n=24)
    media = rd.from_arrow(media_t)
    out = audio_windows(media, batch_size=8).to_pandas()
    assert len(out) > 0
    audio_ids = {m for m, k in zip(media_t["media_id"].to_pylist(),
                                   media_t["kind"].to_pylist())
                 if k == "audio"}
    assert set(out["media_id"]) <= audio_ids

    st = AudioWindows()
    rows = media_t.to_pylist()
    for r in rows:
        if r["kind"] != "audio":
            continue
        wave = st._decode(r["payload"], int(r["duration_ms"]))
        k = min(st.max_windows, len(wave) // st.window)
        g = out[out["media_id"] == r["media_id"]]
        assert len(g) == k
        if k:
            f0 = wave[: st.window]
            assert g.sort_values("window_idx")["rms"].iloc[0] == \
                pytest.approx(float(np.sqrt((f0 ** 2).mean())), rel=1e-6)
            assert g.sort_values("window_idx")["zero_crossings"].iloc[0] \
                == int(np.abs(np.diff(np.signbit(f0))).sum())

    out2 = audio_windows(media, batch_size=3).to_pandas()
    assert out.sort_values(["media_id", "window_idx"])["rms"].tolist() == \
        out2.sort_values(["media_id", "window_idx"])["rms"].tolist()


def test_decode_image_real_codec_when_available():
    """The PIL branch: a real encoded PNG decodes to its actual pixel
    stats (not the deterministic fallback).  Skips where PIL is absent
    (this container); the fallback path is covered above."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = PIL.new("RGB", (10, 10), color=(100, 150, 200))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()
    dec = DecodeImage(target_size=(10, 10))
    arr = dec._decode(payload)
    assert arr.shape == (10, 10, 3)
    assert float(arr.mean()) == pytest.approx((100 + 150 + 200) / 3)
    # an undecodable payload still takes the deterministic fallback
    fb1 = dec._decode(b"not an image")
    fb2 = DecodeImage(target_size=(10, 10))._decode(b"not an image")
    assert (fb1 == fb2).all()


def test_suggest_batch_size():
    assert suggest_batch_size(1 << 20, worker_heap_bytes=2 << 30, concurrency=4) >= 1
    assert suggest_batch_size(1 << 30) == 1


def test_reason_dataset_fixed_point(ray_session):
    import ray.data as rd

    from rdf_n3_ray.parser.n3_parser import parse_n3
    from rdf_n3_ray.pipelines.reasoning import extract_rules, reason_dataset

    doc = """@prefix : <http://ex/>.
    :a a :A . :b a :A .
    { ?x a :A } => { ?x a :B }.
    { ?x a :B } => { ?x a :C }."""
    quads = parse_n3(doc).quads
    rules = extract_rules(quads)
    assert len(rules) == 2
    facts = pd.DataFrame(
        [{"subj": s, "pred": p, "obj": o} for s, p, o, g in quads if g is None
         and "implies" not in p]
    )
    ds = rd.from_pandas(facts)
    closure, inferred = reason_dataset(ds, rules)
    got = closure.to_pandas()
    objs = set(got["obj"])
    assert "<http://ex/B>" in objs and "<http://ex/C>" in objs
    assert inferred == 4  # a/b x B/C


def _clustered_embeddings(n_clusters=4, per_cluster=30, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((per_cluster, dim)) * 0.3
        rows.append(pts)
    mat = np.concatenate(rows)
    return pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })


def test_ivf_topk_recall_vs_brute_force(ray_session):
    import ray.data as rd

    from rdf_n3_ray.stages.ann import ivf_topk

    tbl = _clustered_embeddings()
    ds = rd.from_arrow(tbl)
    queries = np.asarray(tbl["embedding"].to_pylist()[:3], dtype=np.float64)
    exact = brute_force_topk(rd.from_arrow(tbl), queries, k=5,
                             dtype=np.float64)
    approx = ivf_topk(rd.from_arrow(tbl), queries, k=5, n_clusters=4,
                      nprobe=2)
    for qi in range(3):
        want = set(exact[exact.query_idx == qi].vec_id)
        got = set(approx[approx.query_idx == qi].vec_id)
        assert len(want & got) / len(want) >= 0.8, (qi, want, got)


def test_pq_topk_recall_vs_brute_force(ray_session):
    """PQ/ADC recall on clustered embeddings: the 8-byte codes must
    keep >= 0.8 of the exact top-5 per query, and the codes dataset is
    really m uint8 per row (the 100 TB memory-path invariant)."""
    import ray.data as rd

    from rdf_n3_ray.stages.ann import pq_encode, pq_topk, pq_train

    tbl = _clustered_embeddings()
    queries = np.asarray(tbl["embedding"].to_pylist()[:3], dtype=np.float64)
    # within a 30-point cluster the exact sims are tighter than the
    # quantization error, so top-5 ORDER is not recoverable from 4-byte
    # codes (reconstruction err ~0.05 > within-cluster sim spread);
    # the PQ contract is cluster-level: every retrieved neighbor must
    # come from the query's own cluster (= the exact top-30), and the
    # ADC score must approximate the true cosine within the
    # reconstruction error bound.
    exact = brute_force_topk(rd.from_arrow(tbl), queries, k=30,
                             dtype=np.float64)
    approx = pq_topk(rd.from_arrow(tbl), queries, k=5, m=4, ks=16)
    emb = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    for qi in range(3):
        cluster = set(exact[exact.query_idx == qi].vec_id)
        got = approx[approx.query_idx == qi]
        assert set(got.vec_id) <= cluster, (qi, set(got.vec_id), cluster)
        true_sim = emb[got.vec_id.to_numpy()] @ qn[qi]
        assert (np.abs(got.sim.to_numpy() - true_sim) < 0.15).all()

    ds, books = pq_train(rd.from_arrow(tbl), m=4, ks=16)
    codes = pq_encode(ds, books).to_pandas()
    assert len(codes) == tbl.num_rows
    assert all(len(c) == 4 for c in codes["code"])
    flat = np.concatenate([np.asarray(c) for c in codes["code"]])
    assert flat.dtype == np.uint8 and flat.max() < 16


def test_ivfpq_topk_degrades_to_pq_and_prunes(ray_session):
    """IVF+PQ at nprobe == n_clusters returns exactly pq_topk's result
    (partition pruning loses nothing when every partition is probed);
    at nprobe=2 every hit still comes from the query's own cluster."""
    import ray.data as rd

    from rdf_n3_ray.stages.ann import ivfpq_topk, pq_topk

    tbl = _clustered_embeddings()
    queries = np.asarray(tbl["embedding"].to_pylist()[:3], dtype=np.float64)
    full = ivfpq_topk(rd.from_arrow(tbl), queries, k=5, n_clusters=4,
                      nprobe=4, m=4, ks=16)
    flat = pq_topk(rd.from_arrow(tbl), queries, k=5, m=4, ks=16)
    pd.testing.assert_frame_equal(full.reset_index(drop=True),
                                  flat.reset_index(drop=True))

    pruned = ivfpq_topk(rd.from_arrow(tbl), queries, k=5, n_clusters=4,
                        nprobe=2, m=4, ks=16)
    exact30 = brute_force_topk(rd.from_arrow(tbl), queries, k=30,
                               dtype=np.float64)
    for qi in range(3):
        cluster = set(exact30[exact30.query_idx == qi].vec_id)
        got = set(pruned[pruned.query_idx == qi].vec_id)
        assert got and got <= cluster, (qi, got, cluster)


def test_cosine_dup_pairs_exact(ray_session):
    import ray.data as rd

    from rdf_n3_ray.stages.embed_dedup import cosine_dup_pairs

    tbl = _clustered_embeddings(n_clusters=3, per_cluster=8)
    ds = rd.from_arrow(tbl)
    pairs = cosine_dup_pairs(ds, threshold=0.9).to_pandas()
    # oracle: numpy all-pairs on the driver
    mat = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    iu, ju = np.triu_indices(len(mat), k=1)
    keep = sims[iu, ju] >= 0.9
    want = set(zip(iu[keep].tolist(), ju[keep].tolist()))
    got = set(zip(pairs.a.astype(int), pairs.b.astype(int)))
    assert got == want and len(want) > 0


def test_cosine_dup_pairs_lsh_recall(ray_session):
    import ray.data as rd

    from rdf_n3_ray.stages.embed_dedup import (
        cosine_dup_pairs,
        cosine_dup_pairs_lsh,
    )

    tbl = _clustered_embeddings(n_clusters=3, per_cluster=10, seed=9)
    exact = cosine_dup_pairs(rd.from_arrow(tbl), threshold=0.95).to_pandas()
    approx = cosine_dup_pairs_lsh(rd.from_arrow(tbl), threshold=0.95,
                                  n_planes=4, bands=6).to_pandas()
    want = set(zip(exact.a.astype(int), exact.b.astype(int)))
    got = set(zip(approx.a.astype(int), approx.b.astype(int)))
    assert len(want) > 0
    assert got <= want  # no false positives (exact verify in-bucket)
    assert len(want & got) / len(want) >= 0.8


def test_dup_groups_union_find():
    from rdf_n3_ray.stages.embed_dedup import dup_groups_from_pairs

    pairs = pd.DataFrame({"a": [1, 2, 5], "b": [2, 3, 6]})
    groups = dup_groups_from_pairs(pairs)
    g = dict(zip(groups.id, groups.group))
    assert g[1] == g[2] == g[3] == 1
    assert g[5] == g[6] == 5


def test_range_join_attrib_window_bounds(ray_session):
    """Window is (t-30min, t]: a click exactly 30min before is OUT, a
    click at the purchase instant is IN; zero-click purchases emit 0."""
    import os, tempfile

    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from rdf_n3_ray.pipelines.relational import range_join_attrib

    base = pd.Timestamp("2024-01-01 12:00:00")
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id":  [5, 5, 5, 5, 5, 9, 9],
        "event_type": ["click", "click", "click", "purchase", "view",
                       "purchase", "click"],
        "ts": [base - pd.Timedelta(minutes=30),   # boundary: excluded
               base - pd.Timedelta(minutes=29),   # in window
               base,                              # at instant: included
               base,                              # the purchase
               base - pd.Timedelta(minutes=1),    # wrong type: ignored
               base,                              # other user, no clicks<=ts
               base + pd.Timedelta(seconds=1)]})  # after purchase: out
    d = tempfile.mkdtemp()
    pq_.write_table(pa_.Table.from_pandas(ev), os.path.join(d, "events.parquet"))
    out = range_join_attrib(d).to_pandas()
    got = dict(zip(out.event_id, out.clicks_30m))
    assert got == {4: 2, 6: 0}
    assert out.clicks_30m.dtype == "int64"


def test_sessionize_gap_semantics(ray_session):
    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import SESSION_GAP_US, sessionize
    import rdf_n3_ray.pipelines.relational as R

    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 9],
        "ts": [base,
               base + pd.Timedelta(minutes=30),        # exactly the gap
               base + pd.Timedelta(minutes=30 + 31),   # > gap: new session
               base],
    })
    import os, tempfile
    d = tempfile.mkdtemp()
    import pyarrow as pa_, pyarrow.parquet as pq_
    pq_.write_table(pa_.Table.from_pandas(ev), os.path.join(d, "events.parquet"))
    out = sessionize(d).to_pandas()
    u7 = out[out.user_id == 7].sort_values("session_id")
    # exactly-30min gap stays in session 0; the 31-min gap opens session 1
    assert list(u7.n_events) == [2, 1]
    assert out[out.user_id == 9].session_id.tolist() == [0]


def test_asof_join_tiebreak(ray_session):
    import os, tempfile

    import pyarrow as pa_
    import pyarrow.parquet as pq_

    from rdf_n3_ray.pipelines.relational import asof_join_orders

    base = pd.Timestamp("2024-01-01")
    d = tempfile.mkdtemp()
    ev = pd.DataFrame({"event_id": [1, 2], "user_id": [5, 5],
                       "ts": [base + pd.Timedelta(days=2), base - pd.Timedelta(days=1)]})
    orders = pd.DataFrame({
        "o_orderkey": [10, 11, 12],
        "o_custkey": [5, 5, 5],
        # two orders share the latest eligible date -> max orderkey wins
        "o_orderdate": [base, base, base + pd.Timedelta(days=5)],
        "o_totalprice": [1.0, 2.0, 3.0]})
    pq_.write_table(pa_.Table.from_pandas(ev), os.path.join(d, "events.parquet"))
    pq_.write_table(pa_.Table.from_pandas(orders), os.path.join(d, "orders.parquet"))
    out = asof_join_orders(d).to_pandas()
    # event 2 predates every order -> dropped; event 1 matches orderkey 11
    assert out.event_id.tolist() == [1]
    assert out.o_orderkey.tolist() == [11]


def test_ivf_write_and_pruned_query(ray_session, tmp_path):
    import os

    import ray.data as rd

    from rdf_n3_ray.stages.ann import ivf_query, ivf_write

    tbl = _clustered_embeddings(n_clusters=4, per_cluster=25, seed=7)
    out = str(tmp_path / "ivf")
    ivf_write(rd.from_arrow(tbl), out, n_clusters=4)
    # partitioned layout exists
    parts = [d for d in os.listdir(out) if d.startswith("cluster=")]
    assert len(parts) >= 2, parts
    queries = np.asarray(tbl["embedding"].to_pylist()[:2], dtype=np.float64)
    res = ivf_query(out, queries, k=3, nprobe=2)
    # self-vectors must be their own top hit
    for qi in (0, 1):
        top = res[res.query_idx == qi].iloc[0]
        assert top.vec_id == qi and top.sim > 0.999


def test_brute_force_topk_tie_break(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "vec_id": pa.array([5, 3, 9, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 4, pa.list_(pa.float32())),
    })
    res = brute_force_topk(rd.from_arrow(tbl),
                           np.asarray([[1.0, 0.0]]), k=2)
    # all sims tie at 1.0 -> smallest vec_ids win
    assert res.vec_id.tolist() == [1, 3]


def test_reason_dataset_multi_pattern_chain(ray_session):
    """Semi-naive evaluation with a 2-pattern join rule + chained rule."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.reasoning import reason_dataset

    n = 50
    base = pd.DataFrame({
        "subj": [f"<n{i}>" for i in range(n)],
        "pred": ["<next>"] * n,
        "obj": [f"<n{i+1}>" for i in range(n)],
    })
    rules = [([("?x", "<next>", "?y"), ("?y", "<next>", "?z")],
              [("?x", "<skip>", "?z")]),
             ([("?x", "<skip>", "?z")], [("?x", "<reach>", "?z")])]
    closure, inferred = reason_dataset(rd.from_pandas(base), rules)
    df = closure.to_pandas()
    assert (df.pred == "<skip>").sum() == n - 1
    assert (df.pred == "<reach>").sum() == n - 1
    assert inferred == 2 * (n - 1)
    assert ((df.pred == "<skip>") & (df.subj == "<n0>")
            & (df.obj == "<n2>")).any()


def test_instantiate_gappy_index():
    """Regression: bindings frames arrive straight from drop_duplicates()
    with a gappy index; constant/existential slots are fresh RangeIndex
    Series.  Without reset_index the DataFrame constructor aligns on the
    index union, emitting NaN-corrupted triples and dropping bindings."""
    from rdf_n3_ray.pipelines.reasoning import _instantiate

    bindings = pd.DataFrame({"?x": ["<a>", "<b>", "<b>", "<c>"]})
    bindings = bindings.drop_duplicates()          # index [0, 1, 3]
    inst = _instantiate(bindings, [("?x", "<p>", "<C>")])
    assert len(inst) == 3
    assert not inst.isna().any().any()
    assert set(inst.subj) == {"<a>", "<b>", "<c>"}
    assert set(inst.pred) == {"<p>"} and set(inst.obj) == {"<C>"}
    # unbound existential slot must also stay aligned
    inst2 = _instantiate(bindings.drop_duplicates(), [("?x", "<p>", "?new")])
    assert len(inst2) == 3 and not inst2.isna().any().any()
    assert inst2.obj.nunique() == 1  # one interned node across firings


def test_reason_dataset_duplicate_bindings_no_nan(ray_session):
    """End-to-end: rules whose antecedents yield duplicate bindings
    (dropped mid-frame) must still infer clean, complete triples."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.reasoning import reason_dataset

    base = pd.DataFrame({
        "subj": ["<a>", "<a>", "<b>", "<c>"],
        "pred": ["<p>", "<q>", "<p>", "<p>"],
        "obj": ["<o1>", "<o2>", "<o3>", "<o4>"],
    })
    # ?x matched by two patterns -> concat of slot pieces has duplicate
    # rows for <a>, drop_duplicates leaves a gappy index
    rules = [([("?x", "<p>", "?y")], [("?x", "<t>", "<K>")])]
    closure, inferred = reason_dataset(rd.from_pandas(base), rules)
    df = closure.to_pandas()
    got = df[df.pred == "<t>"]
    assert set(got.subj) == {"<a>", "<b>", "<c>"}
    assert (got.obj == "<K>").all()
    assert not df.isna().any().any()


def test_reason_dataset_broad_antecedent_distributed(ray_session):
    """A non-selective pattern (?s <type> ?c over 1M triples) must stay
    distributed: bindings exceed _DRIVER_JOIN_LIMIT, so the join with
    the small subclass table runs as a bucket-paired merge and the
    consequent instantiation as map_batches — and still infer exactly
    the expected closure."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.reasoning import (
        _DRIVER_JOIN_LIMIT,
        reason_dataset,
    )

    n = 1_000_000
    assert n > _DRIVER_JOIN_LIMIT
    idx = np.arange(n)
    base = pd.DataFrame({
        "subj": pd.Series(idx).map(lambda i: f"<s{i}>"),
        "pred": "<type>",
        "obj": pd.Series(idx % 100).map(lambda c: f"<c{c}>"),
    })
    sub = pd.DataFrame({
        "subj": [f"<c{j}>" for j in range(100)],
        "pred": "<subclass>",
        "obj": [f"<d{j}>" for j in range(100)],
    })
    ds = rd.from_pandas(pd.concat([base, sub], ignore_index=True))
    rules = [([("?s", "<type>", "?c"), ("?c", "<subclass>", "?d")],
              [("?s", "<type>", "?d")])]
    closure, inferred = reason_dataset(ds, rules, max_iterations=4)
    assert inferred == n
    assert closure.count() == 2 * n + 100
    got = closure.map_batches(
        lambda b: b[(b.subj == "<s7>") & (b.obj == "<d7>")],
        batch_format="pandas").to_pandas()
    assert len(got) == 1 and got.iloc[0].pred == "<type>"


def test_reason_kb_path_partition_pruned(ray_session, tmp_path):
    """Predicate-partitioned KB: pattern scans read only matching
    partitions; closure matches the in-memory reasoner."""
    import os

    import ray.data as rd

    from rdf_n3_ray.pipelines.reasoning import (
        reason_dataset,
        reason_kb_path,
        write_kb_partitioned,
    )

    n = 40
    base = pd.DataFrame({
        "subj": [f"<n{i}>" for i in range(n)],
        "pred": ["<next>"] * n,
        "obj": [f"<n{i+1}>" for i in range(n)],
    })
    # noise triples under a different predicate (should be pruned away)
    noise = pd.DataFrame({
        "subj": [f"<m{i}>" for i in range(500)],
        "pred": ["<unrelated>"] * 500,
        "obj": [f"<m{i}>" for i in range(500)],
    })
    kb = pd.concat([base, noise], ignore_index=True)
    out = str(tmp_path / "kb")
    write_kb_partitioned(rd.from_pandas(kb), out)
    assert len([d for d in os.listdir(out) if d.startswith("pb=")]) >= 2

    rules = [([("?x", "<next>", "?y"), ("?y", "<next>", "?z")],
              [("?x", "<skip>", "?z")])]
    adds, inferred = reason_kb_path(out, rules)
    assert inferred == n - 1
    closure_mem, inf_mem = reason_dataset(rd.from_pandas(kb), rules)
    mem_new = closure_mem.to_pandas()
    assert inf_mem == inferred
    got = set(map(tuple, adds.to_pandas().values))
    want = set(map(tuple, mem_new[mem_new.pred == "<skip>"].values))
    assert got == want


def test_reason_kb_path_broad_antecedent_distributed(ray_session, tmp_path):
    """Partitioned-KB reasoner with a non-selective pattern above the
    driver-join limit: bindings joins run distributed, only the deduped
    delta reaches the driver, and the closure matches expectations."""
    import ray.data as rd

    from rdf_n3_ray.pipelines import reasoning as RZ
    from rdf_n3_ray.pipelines.reasoning import (
        reason_kb_path,
        write_kb_partitioned,
    )

    n = 60_000
    idx = np.arange(n)
    base = pd.DataFrame({
        "subj": pd.Series(idx).map(lambda i: f"<s{i}>"),
        "pred": "<type>",
        "obj": pd.Series(idx % 50).map(lambda c: f"<c{c}>"),
    })
    sub = pd.DataFrame({
        "subj": [f"<c{j}>" for j in range(50)],
        "pred": "<subclass>",
        "obj": [f"<d{j}>" for j in range(50)],
    })
    kb = pd.concat([base, sub], ignore_index=True)
    out = str(tmp_path / "kb")
    write_kb_partitioned(rd.from_pandas(kb), out)
    rules = [([("?s", "<type>", "?c"), ("?c", "<subclass>", "?d")],
              [("?s", "<type>", "?d")])]
    # force the distributed path without needing 500k+ test rows
    orig = RZ._DRIVER_JOIN_LIMIT
    RZ._DRIVER_JOIN_LIMIT = 10_000
    try:
        adds, inferred = reason_kb_path(out, rules)
    finally:
        RZ._DRIVER_JOIN_LIMIT = orig
    assert inferred == n
    adf = adds.to_pandas()
    assert len(adf) == n
    assert (adf.pred == "<type>").all()
    assert set(adf[adf.subj == "<s7>"].obj) == {"<d7>"}


def test_reason_kb_path_rederivation_not_counted(ray_session, tmp_path):
    """Symmetric rule over symmetric base facts derives nothing new —
    re-derivations of base triples must not count as inferred."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.reasoning import (
        reason_kb_path,
        write_kb_partitioned,
    )

    base = pd.DataFrame({
        "subj": ["<a>", "<b>"], "pred": ["<knows>"] * 2,
        "obj": ["<b>", "<a>"]})
    out = str(tmp_path / "kb")
    write_kb_partitioned(rd.from_pandas(base), out)
    rules = [([("?x", "<knows>", "?y")], [("?y", "<knows>", "?x")])]
    adds, inferred = reason_kb_path(out, rules)
    assert inferred == 0 and adds.count() == 0


def test_join2_broadcasts_over_dataframe_big_side(ray_session):
    """A driver merge can fan out past the join limit, leaving a plain
    DataFrame as the BIG side of the next join; the broadcast path must
    lift it into a Dataset instead of calling .map_batches on pandas."""
    import ray.data as rd

    from rdf_n3_ray.pipelines import reasoning as RZ

    big_df = pd.DataFrame({"?x": [f"x{i % 50}" for i in range(600)],
                           "?y": [f"y{i}" for i in range(600)]})
    small_ds = rd.from_pandas(pd.DataFrame(
        {"?y": [f"y{i}" for i in range(0, 600, 3)],
         "?z": [f"z{i}" for i in range(0, 600, 3)]})).materialize()
    orig_lim, orig_b = RZ._DRIVER_JOIN_LIMIT, RZ._JOIN_BROADCAST_LIMIT
    RZ._DRIVER_JOIN_LIMIT, RZ._JOIN_BROADCAST_LIMIT = 100, 10_000
    try:
        out = RZ._join2(big_df, small_ds)
    finally:
        RZ._DRIVER_JOIN_LIMIT, RZ._JOIN_BROADCAST_LIMIT = orig_lim, orig_b
    got = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    want = big_df.merge(small_ds.to_pandas(), on=["?y"])
    key = lambda df: sorted(map(tuple, df[["?x", "?y", "?z"]].values))
    assert key(got) == key(want)


def test_reason_kb_path_million_edges_bounded_driver(ray_session, tmp_path):
    """Productive ruleset at scale: transitive closure over a 10^6-edge
    relation (250k chains of 5 nodes) completes with BOUNDED driver
    memory — no corpus-sized pandas ever lands on the driver.  Enforced
    by a to_pandas spy that fails the test if any Dataset above the
    driver-join limit is pulled down; the seen-set anti-join AND the
    bindings joins are forced onto their distributed bucket paths
    (hash_broadcast_limit=0, _JOIN_BROADCAST_LIMIT=0) — the 100 TB
    shape, with every size-gated broadcast fast path disabled."""
    import ray.data as rd
    from ray.data import Dataset

    from rdf_n3_ray.pipelines import reasoning as RZ
    from rdf_n3_ray.pipelines.reasoning import (
        reason_kb_path,
        write_kb_partitioned,
    )

    chains, span = 250_000, 5  # 4 edges/chain -> 1M edges
    cid = np.repeat(np.arange(chains), span - 1)
    pos = np.tile(np.arange(span - 1), chains)
    base = pd.DataFrame({
        "subj": pd.Series(cid.astype(str)) + "_" + pd.Series(pos.astype(str)),
        "pred": "<r>",
        "obj": pd.Series(cid.astype(str)) + "_"
               + pd.Series((pos + 1).astype(str)),
    })
    out = str(tmp_path / "kb")
    write_kb_partitioned(rd.from_pandas(base), out)

    rules = [([("?x", "<r>", "?y"), ("?y", "<r>", "?z")],
              [("?x", "<r>", "?z")])]
    cap = RZ._DRIVER_JOIN_LIMIT + 1
    orig_to_pandas = Dataset.to_pandas

    def spy_to_pandas(self, *a, **kw):
        assert self.count() <= cap, (
            f"corpus-sized to_pandas on the driver: {self.count()} rows")
        return orig_to_pandas(self, *a, **kw)

    Dataset.to_pandas = spy_to_pandas
    orig_bcast = RZ._JOIN_BROADCAST_LIMIT
    RZ._JOIN_BROADCAST_LIMIT = 0
    try:
        adds, inferred = reason_kb_path(out, rules, hash_broadcast_limit=0)
    finally:
        Dataset.to_pandas = orig_to_pandas
        RZ._JOIN_BROADCAST_LIMIT = orig_bcast
    # per 5-node chain: pairs at distance 2..4 = 6 inferred triples
    assert inferred == chains * 6
    assert adds.count() == chains * 6
    # spot-check one chain's closure without materializing the rest
    got = adds.map_batches(
        lambda b: b[b["subj"].str.startswith("17_")],
        batch_format="pandas").to_pandas()
    want = {("17_0", "17_2"), ("17_0", "17_3"), ("17_0", "17_4"),
            ("17_1", "17_3"), ("17_1", "17_4"), ("17_2", "17_4")}
    assert set(zip(got.subj, got.obj)) == want


def test_explode_bands_validates_divisibility():
    sig = minhash_signatures(pd.DataFrame({"doc_id": [1], "text": ["hello world doc"]}))
    with pytest.raises(ValueError):
        explode_bands(sig, bands=128)   # bands > num_perm
    with pytest.raises(ValueError):
        explode_bands(sig, bands=24)    # 64 % 24 != 0
    ok = explode_bands(sig, bands=16)
    assert len(ok) == 16


def test_decontaminate_flags_overlapping_docs(ray_session):
    """Benchmark decontamination finds the benchmark docs themselves and
    any doc sharing a 13-word-gram; clean docs score 0."""
    from rdf_n3_ray.pipelines.relational import decontaminate

    out = decontaminate("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"])
    wc = docs.set_index("doc_id").text.str.split().str.len()
    # every benchmark doc LONG ENOUGH to contribute a gram self-hits
    bench_ids = [d for d in out.doc_id if d % 37 == 0 and wc[d] >= 13]
    assert bench_ids and (out.set_index("doc_id").n_hits[bench_ids] >= 1).all()
    assert (out.n_hits == 0).sum() > 400  # most of the corpus is clean
    assert out.n_hits.dtype == "int64"


def test_dup_gram_pairs_matches_oracle(ray_session):
    """Cross-doc exact duplicate n-gram pairs hash-match the DuckDB
    self-join recompute, and the no-candidate-broadcast fallback (the
    100 TB dup-mass-too-big path) returns the identical pair set."""
    from rdf_n3_ray.pipelines.relational import (
        DUP_GRAM_PAIRS_SQL, dup_gram_pairs)

    out = dup_gram_pairs("/root/testdata/sf0.01").to_pandas()
    assert len(out) > 0
    assert (out.doc_a < out.doc_b).all()
    assert not out.duplicated(["doc_a", "doc_b"]).any()
    assert out.shared_grams.dtype == "int64"
    _assert_oracle_equal(out, _duckdb_oracle(DUP_GRAM_PAIRS_SQL))

    fb = dup_gram_pairs("/root/testdata/sf0.01",
                        candidate_broadcast_limit=0).to_pandas()
    _assert_oracle_equal(fb, out)


def test_doc_dup_rate_matches_oracle(ray_session):
    """Per-doc duplicate-gram position counts hash-match the DuckDB
    recompute; every doc appears once, zero-dup docs included, and the
    no-broadcast fallback path returns the identical table."""
    from rdf_n3_ray.pipelines.relational import (
        DOC_DUP_RATE_SQL, doc_dup_rate)

    out = doc_dup_rate("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500 and out.doc_id.is_unique
    assert (out.dup_grams <= out.n_grams).all()
    assert (out.dup_grams > 0).any() and (out.dup_grams == 0).any()
    _assert_oracle_equal(out, _duckdb_oracle(DOC_DUP_RATE_SQL))

    fb = doc_dup_rate("/root/testdata/sf0.01",
                      candidate_broadcast_limit=0).to_pandas()
    _assert_oracle_equal(fb, out)


def test_winnow_fingerprints_matches_oracle(ray_session):
    """Winnowing (window-min over word 4-grams, w=8) hash-matches the
    DuckDB window recompute; the 2/(w+1) density guarantee holds in
    aggregate and every >=4-token doc yields at least one fingerprint."""
    from rdf_n3_ray.pipelines.relational import (
        WINNOW_FP_SQL, winnow_fingerprints)

    out = winnow_fingerprints("/root/testdata/sf0.01")
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(WINNOW_FP_SQL))

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"])
    wc = docs.set_index("doc_id").text.str.split().str.len()
    covered = set(out.doc_id)
    assert all(d in covered for d in wc.index[wc >= 4])
    # winnowing selects ~2/(w+1) of gram positions (pre-dedup it is a
    # guarantee; post-dedup stays well under one fp per gram)
    n_grams = int((wc[wc >= 4] - 3).sum())
    assert len(out) < 0.5 * n_grams


def test_winnow_dup_pairs_matches_oracle(ray_session):
    """Shared-fingerprint pair mining hash-matches the DuckDB
    self-join recompute (stop-fp cap applied on both engines), and
    every exact-dup doc pair (identical text) appears — winnowing
    selects identical fingerprints from identical token streams."""
    from rdf_n3_ray.pipelines.relational import (
        WINNOW_DUP_PAIRS_SQL, winnow_dup_pairs)

    out = winnow_dup_pairs("/root/testdata/sf0.01").to_pandas()
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(WINNOW_DUP_PAIRS_SQL))

    assert (out["doc_a"] < out["doc_b"]).all()
    assert (out["shared_fps"] >= 2).all()

    # cross-validate against the fingerprint query: recompute the pair
    # list from the (hash-green) winnow_fingerprints table in pandas
    from rdf_n3_ray.pipelines.relational import winnow_fingerprints
    fps = winnow_fingerprints("/root/testdata/sf0.01")
    fp_docs = fps.groupby("fp")["doc_id"].nunique()
    ok = fps[fps["fp"].isin(fp_docs[(fp_docs >= 2)
                                    & (fp_docs <= 64)].index)]
    m = ok.merge(ok, on="fp")
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    exp = (m.groupby(["doc_id_x", "doc_id_y"]).size()
           .reset_index(name="shared_fps"))
    exp = (exp[exp["shared_fps"] >= 2]
           .rename(columns={"doc_id_x": "doc_a", "doc_id_y": "doc_b"})
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
           .astype("int64"))
    pd.testing.assert_frame_equal(out.reset_index(drop=True), exp)


def test_domain_resample_matches_oracle(ray_session):
    """Temperature resampling reproduces the oracle's EXACT row set
    (deterministic hash gate + IEEE-correctly-rounded sqrt threshold);
    the smallest source survives intact and alpha=1 keeps everything."""
    from rdf_n3_ray.pipelines.relational import (
        DOMAIN_RESAMPLE_SQL, domain_resample)

    out = domain_resample("/root/testdata/sf0.01")
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(DOMAIN_RESAMPLE_SQL))

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "source"])
    docs["source"] = docs["source"].fillna("")
    n = docs.groupby("source").size()
    kept = out.groupby("source").size().reindex(n.index).fillna(0)
    smallest = n.idxmin()
    assert kept[smallest] == n[smallest]  # q = 1 for the smallest
    # kept fraction tracks sqrt(min/n) within binomial noise
    q = np.sqrt(n.min() / n)
    frac = kept / n
    assert ((frac - q).abs() < 4 * np.sqrt(q * (1 - q) / n) + 1e-9).all()

    full = domain_resample("/root/testdata/sf0.01", alpha=1.0)
    assert len(full) == len(docs)

    with pytest.raises(ValueError):
        domain_resample("/root/testdata/sf0.01", alpha=0.0)


def test_near_dedup_keep_matches_oracle(ray_session):
    """The composed keep-list (LSH pairs -> connected components ->
    verdict map) hash-matches the recursive-CTE oracle and agrees with
    jaccard_dup_groups: exactly the non-canonical cluster members are
    dropped."""
    from rdf_n3_ray.pipelines.relational import (
        NEAR_DEDUP_KEEP_SQL, jaccard_dup_groups, near_dedup_keep)

    out = near_dedup_keep("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500
    _assert_oracle_equal(out, _duckdb_oracle(NEAR_DEDUP_KEEP_SQL))

    groups = jaccard_dup_groups("/root/testdata/sf0.01")
    dropped = set(out.loc[~out["keep"], "doc_id"])
    expected_drop = set(
        groups.loc[groups["doc_id"] != groups["dup_group"], "doc_id"])
    assert dropped == expected_drop and len(dropped) > 0


def test_trade_pagerank_matches_oracle(ray_session):
    """Integer PageRank over the symmetrized trade graph is bit-equal
    to the unrolled SQL recurrence, conserves the teleport floor, and
    ranks high-degree nodes above the minimum."""
    from rdf_n3_ray.pipelines.relational import (
        TRADE_PAGERANK_SQL, trade_pagerank)

    out = trade_pagerank("/root/testdata/sf0.01").to_pandas()
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(TRADE_PAGERANK_SQL))
    assert (out["pr"] >= 150_000_000).all()  # teleport floor
    assert out["pr"].max() > 150_000_000
    assert set(out["kind"]) == {"customer", "supplier"}


def test_user_event_seq_matches_oracle(ray_session):
    """Ordered per-user event-type sequences hash-match the
    string_agg(ORDER BY) oracle; ordering and truncation verified
    directly for one user."""
    from rdf_n3_ray.pipelines.relational import (
        USER_EVENT_SEQ_SQL, user_event_seq)

    out = user_event_seq("/root/testdata/sf0.01").to_pandas()
    assert len(out) > 0 and (out["n_events"] <= 50).all()
    _assert_oracle_equal(out, _duckdb_oracle(USER_EVENT_SEQ_SQL))
    ev = pd.read_parquet("/root/testdata/sf0.01/events.parquet",
                         columns=["event_id", "ts", "user_id",
                                  "event_type"])
    uid = out["user_id"].iloc[0]
    g = (ev[ev["user_id"] == uid]
         .sort_values(["ts", "event_id"]).head(50))
    assert out.set_index("user_id").loc[uid, "seq"] == \
        ">".join(g["event_type"])


def test_event_mad_matches_oracle(ray_session):
    """Exact MAD summary hash-matches the quantile_disc oracle and its
    values reproduce a driver-side exact recompute."""
    from rdf_n3_ray.pipelines.relational import EVENT_MAD_SQL, event_mad

    out = event_mad("/root/testdata/sf0.01")
    assert len(out) == 1
    _assert_oracle_equal(out, _duckdb_oracle(EVENT_MAD_SQL))
    v = pd.read_parquet("/root/testdata/sf0.01/events.parquet",
                        columns=["value"])["value"].dropna().to_numpy()
    v.sort()
    med = v[max(1, int(np.ceil(0.5 * len(v)))) - 1]
    dev = np.sort(np.abs(v - med))
    mad = dev[max(1, int(np.ceil(0.5 * len(dev)))) - 1]
    row = out.iloc[0]
    assert row["median"] == med and row["mad"] == mad
    assert row["n_outliers"] == int((np.abs(v - med) > 3 * mad).sum())


def test_phrase_search_matches_oracle(ray_session):
    """Adjacent-token phrase search hash-matches the positional
    self-join oracle and counts true adjacency (not bag-of-words)."""
    from rdf_n3_ray.pipelines.relational import (
        PHRASE_SEARCH_SQL, phrase_search)

    out = phrase_search("/root/testdata/sf0.01")
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(PHRASE_SEARCH_SQL))
    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"]).set_index("doc_id")
    for did, n in zip(out["doc_id"].head(5), out["n_occ"].head(5)):
        words = docs.loc[did, "text"].split(" ")
        adj = sum(1 for i in range(len(words) - 1)
                  if words[i] == "part" and words[i + 1] == "filter")
        assert adj == n


def test_events_profile_matches_oracle(ray_session, tmp_path):
    """Column profile hash-matches the UNION-ALL oracle; the injective
    key encoding mirrors SQL semantics on the nasty corners: NULLs
    excluded from distinct counts, -0.0 equal to 0.0."""
    from rdf_n3_ray.pipelines.relational import (
        EVENTS_PROFILE_SQL, events_profile)

    out = events_profile("/root/testdata/sf0.01")
    assert list(out["column"]) == sorted(
        ["event_id", "ts", "user_id", "event_type", "value", "props"])
    _assert_oracle_equal(out, _duckdb_oracle(EVENTS_PROFILE_SQL))

    # corner-case table: NULLs in every column, -0.0 vs 0.0
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    t = pa.table({
        # 2^53 + {0,1}: distinct int64s that collapse through float64 —
        # with a NULL in the same column (the pandas coercion trigger)
        "event_id": pa.array([9007199254740992, 9007199254740993,
                              None, 4], pa.int64()),
        "ts": pa.array([1000, None, 1000, 2000], pa.timestamp("us")),
        "user_id": pa.array([7, 7, None, None], pa.int64()),
        "event_type": pa.array(["a", None, "a", "b"], pa.string()),
        # NaN is a VALUE (counted, distinct-counted); only None is NULL
        "value": pa.array([0.0, -0.0, None, float("nan")], pa.float64()),
        "props": pa.array([None, None, "{}", "{}"], pa.string()),
    })
    d = tmp_path / "evp"
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    got = events_profile(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    exp = con.execute(EVENTS_PROFILE_SQL).fetchdf()
    _assert_oracle_equal(got, exp)
    row = got.set_index("column")
    assert row.loc["value", "n_distinct"] == 2  # {0.0(-0.0), NaN}
    assert row.loc["value", "n_nulls"] == 1     # NaN is NOT a null
    assert row.loc["event_id", "n_distinct"] == 3  # 2^53, 2^53+1, 4
    assert row.loc["props", "n_nulls"] == 2


def test_semdedup_invariants(ray_session):
    """SemDeDup keep-list: one row per vector; GIVEN the run's own
    cluster assignment, the keep column exactly equals a test-local
    union-find over exact within-cluster cosine pairs (pins the pair
    mining + component resolution; the k-means fit itself is pinned by
    the embed_kmeans tests); co-cluster recall of exact pairs clears a
    floor; no co-clustered dup pair survives with both members kept."""
    from rdf_n3_ray.pipelines.relational import semdedup

    tau = 0.35
    out = semdedup("/root/testdata/sf0.001", tau=tau).to_pandas()
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    assert len(out) == len(emb)
    assert out["vec_id"].is_unique
    assert (~out["keep"]).sum() > 0

    mat = np.stack([np.asarray(e, dtype=np.float64)
                    for e in emb["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    cl = out.set_index("vec_id")["cluster"]

    # exact recompute of the keep-list given the observed clustering
    from rdf_n3_ray.stages.embed_dedup import dup_groups_from_pairs
    expected_keep = dict.fromkeys(map(int, ids), True)
    n_pairs = n_cocluster = 0
    for c, grp in out.groupby("cluster"):
        vids = np.sort(grp["vec_id"].to_numpy(np.int64))
        sub = mat[[pos[int(v)] for v in vids]]
        s = sub @ sub.T
        iu, ju = np.triu_indices(len(vids), 1)
        hit = s[iu, ju] >= tau
        pairs = pd.DataFrame({"a": vids[iu[hit]], "b": vids[ju[hit]]})
        groups = dup_groups_from_pairs(pairs)
        for vid, g in zip(groups["id"], groups["group"]):
            expected_keep[int(vid)] = (vid == g)
    got = dict(zip(out["vec_id"].astype(int), out["keep"]))
    assert got == expected_keep

    # recall floor: planted pairs co-cluster often enough to matter
    s = mat @ mat.T
    iu, ju = np.triu_indices(len(ids), 1)
    hit = s[iu, ju] >= tau
    a, b = ids[iu[hit]], ids[ju[hit]]
    n_pairs = int(hit.sum())
    co = (cl[a].to_numpy() == cl[b].to_numpy())
    n_cocluster = int(co.sum())
    assert n_pairs > 0 and n_cocluster / n_pairs >= 0.2

    kp = out.set_index("vec_id")["keep"]
    both = kp[a].to_numpy() & kp[b].to_numpy() & co
    assert both.sum() == 0


def test_triangle_count_matches_oracle(ray_session):
    """The degree-oriented wedge-closure triangle census hash-matches
    the self-join oracle, the distributed-orientation fallback
    (degree_broadcast_limit=0) returns the identical row, and the
    integer invariants hold (3*tri <= wedges, gcc in [0, 1e6])."""
    from rdf_n3_ray.pipelines.relational import (
        TRIANGLE_COUNT_SQL, triangle_count)

    out = triangle_count("/root/testdata/sf0.001")
    assert len(out) == 1
    _assert_oracle_equal(out, _duckdb_oracle(
        TRIANGLE_COUNT_SQL, "/root/testdata/sf0.001"))
    row = out.iloc[0]
    assert row["n_triangles"] > 0
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    assert 0 <= row["gcc_ppm"] <= 1_000_000

    fallback = triangle_count("/root/testdata/sf0.001",
                              degree_broadcast_limit=0)
    pd.testing.assert_frame_equal(out, fallback)


def test_dup_rate_by_source_matches_oracle(ray_session):
    """Per-source dup report hash-matches the closure oracle and is
    consistent with near_dedup_keep: per-source dropped counts equal
    the keep-list's drops grouped by source."""
    from rdf_n3_ray.pipelines.relational import (
        DUP_RATE_BY_SOURCE_SQL, dup_rate_by_source, near_dedup_keep)

    out = dup_rate_by_source("/root/testdata/sf0.01")
    assert out["n_docs"].sum() == 500 and out["n_dropped"].sum() > 0
    _assert_oracle_equal(out, _duckdb_oracle(DUP_RATE_BY_SOURCE_SQL))

    keep = near_dedup_keep("/root/testdata/sf0.01").to_pandas()
    src = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                          columns=["doc_id", "source"])
    j = keep.merge(src, on="doc_id")
    exp = (j[~j["keep"]].groupby(j["source"].fillna("")).size())
    got = out.set_index("source")["n_dropped"]
    for s, n in exp.items():
        assert got.get(s, 0) == n


def test_pack_sequences_matches_oracle(ray_session):
    """Greedy packing hash-matches the recursive-CTE oracle and holds
    its invariants: no bin over budget except oversize singletons, no
    doc lost, offsets are the exact prefix sums inside each bin."""
    from rdf_n3_ray.pipelines.relational import (
        PACK_SEQUENCES_SQL, pack_sequences)

    out = pack_sequences("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500
    _assert_oracle_equal(out, _duckdb_oracle(PACK_SEQUENCES_SQL))

    fill = out.groupby(["source", "bin_id"]).agg(
        tot=("n_tokens", "sum"), k=("doc_id", "size"))
    over = fill[fill["tot"] > 256]
    assert (over["k"] == 1).all()  # only oversize singletons overflow
    assert out["bin_id"].max() > 0  # the corpus actually packs
    for (_, _), g in out.groupby(["source", "bin_id"]):
        g = g.sort_values("doc_id")
        assert (g["off"].to_numpy()
                == np.concatenate([[0], np.cumsum(
                    g["n_tokens"].to_numpy())[:-1]])).all()


def test_dup_groups_cc_matches_oracle(ray_session):
    """The distributed connected-components dup grouping hash-matches
    the same recursive-CTE oracle as the driver union-find path (both
    emit min component member id), so the two implementations are
    interchangeable."""
    from rdf_n3_ray.pipelines.relational import (
        JACCARD_GROUPS_SQL, dup_groups_cc, jaccard_dup_groups)

    out = dup_groups_cc("/root/testdata/sf0.01")
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(JACCARD_GROUPS_SQL))
    pd.testing.assert_frame_equal(
        out, jaccard_dup_groups("/root/testdata/sf0.01"))


def test_curation_verdict_matches_oracle(ray_session):
    """The composed curation pipeline (lang gate + quality gate +
    exact-dup gate + dup-mass gate -> keep) hash-matches the DuckDB
    recompute built from the same proven CTE families; each gate
    fires for at least one doc so the composition is exercised."""
    from rdf_n3_ray.pipelines.relational import (
        CURATION_VERDICT_SQL, curation_verdict)

    out = curation_verdict("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500 and out.doc_id.is_unique
    assert set(out.keep.unique()) <= {0, 1}
    assert (out.keep == 1).any() and (out.keep == 0).any()
    # the keep column is exactly the AND of the four gates
    expect = ((out.lang_match == 1) & (out.quality_ok == 1)
              & (out.exact_dup == 0) & (out.dup_heavy == 0)).astype("int64")
    assert (out.keep == expect).all()
    _assert_oracle_equal(out, _duckdb_oracle(CURATION_VERDICT_SQL))


def test_source_report_matches_oracle(ray_session):
    """Per-source corpus report card: integer partial sums + exact
    distinct-lang counts hash-match the DuckDB group-by."""
    from rdf_n3_ray.pipelines.relational import (
        SOURCE_REPORT_SQL, source_report)

    out = source_report("/root/testdata/sf0.01")
    assert len(out) >= 2 and out.source.is_unique
    assert (out.n_langs >= 1).all()
    _assert_oracle_equal(out, _duckdb_oracle(SOURCE_REPORT_SQL))


def test_curation_verdict_every_gate_rejects(ray_session):
    """The sf0.01 corpus never trips the exact-dup or quality gates
    (review finding), so drive every gate in the REJECTING direction
    on a crafted corpus and hash-check it against the same oracle."""
    import os
    import tempfile

    import duckdb

    from rdf_n3_ray.pipelines.relational import (
        CURATION_VERDICT_SQL, curation_verdict)

    good = ("the cat and the dog went to the house in the town and it "
            "was good for all of it")
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [good,
                 "the bird and the fish swam to a rock in the sea and "
                 "it sang for all of the day",   # unique clean English
                 "the bird and the fish swam to a rock in the sea and "
                 "it sang for all of the day",   # exact dup of doc 2
                 "the end of it",                # < 5 words
                 "der hund und die katze ist von den nicht und der das "
                 "die mit den haus und garten",  # German, declared en
                 "the !!! ??? ### $$$ %%% and of to a in is that it "
                 "for !!! ??? ###"],             # punct-heavy English
        "lang": ["en"] * 6})
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = curation_verdict(td).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{os.path.join(td, 'documents.parquet')}')")
        want = con.execute(CURATION_VERDICT_SQL).fetchdf()
    _assert_oracle_equal(out, want)
    got = out.set_index("doc_id")
    assert got.loc[1, "keep"] == 1                      # clean doc kept
    assert got.loc[3, "exact_dup"] == 1                 # dup loser flagged
    assert got.loc[2, "exact_dup"] == 0                 # min-doc_id wins
    assert got.loc[2, "dup_heavy"] == 1                 # 100% shared grams
    assert got.loc[4, "quality_ok"] == 0                # too short
    assert got.loc[5, "lang_match"] == 0                # de text, en label
    assert got.loc[6, "quality_ok"] == 0                # punct ratio
    assert (got.loc[[3, 4, 5, 6], "keep"] == 0).all()


def test_dup_gram_pairs_stop_gram_cap(ray_session):
    """A gram in more docs than the cap is boilerplate: excluded from
    pair emission on both engines (here: cap 2 kills the 3-doc gram
    but keeps the 2-doc gram's pair and count)."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import dup_gram_pairs

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": ["common phrase shared by all three docs x1",
                 "common phrase shared by all three docs x2",
                 "common phrase shared by all three docs x3",
                 "rare pair gram only here twice yes",
                 "rare pair gram only here twice yes"]})
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        docs.to_parquet(os.path.join(td, "documents.parquet"))
        out = dup_gram_pairs(td, n=7, max_docs_per_gram=2).to_pandas()
    # docs 1-3 share the 7-gram "common phrase shared by all three docs"
    # across 3 docs -> stop-gram at cap 2; docs 4/5 (7 tokens) share
    # their single 7-gram
    assert out.to_dict("records") == [
        {"doc_a": 4, "doc_b": 5, "shared_grams": 1}]


def test_event_percentiles_descent_exact(ray_session):
    """Histogram-descent selection returns EXACT order statistics even
    when forced to actually descend (tiny collect_limit)."""
    import math

    from rdf_n3_ray.pipelines.relational import event_percentiles

    qs = (0.25, 0.5, 0.9, 0.99)
    out = event_percentiles("/root/testdata/sf0.01", qs=qs,
                            coarse_bins=64, collect_limit=50)
    vals = np.sort(pd.read_parquet(
        "/root/testdata/sf0.01/events.parquet", columns=["value"])
        ["value"].to_numpy())
    n = len(vals)
    for q, got in zip(out.q, out.value):
        want = vals[max(1, math.ceil(q * n)) - 1]
        assert got == want, (q, got, want)


def test_exact_percentiles_duplicate_heavy(ray_session):
    """Review regression: a value whose multiplicity exceeds
    collect_limit can never be subdivided by descent — the distinct-
    value final collect must still return exact order statistics
    (the old plain-value collect crashed with IndexError here)."""
    import math

    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import exact_percentiles

    rng = np.random.default_rng(9)
    vals = np.concatenate([
        np.full(5000, 42.42),                  # multiplicity >> limit
        np.round(rng.uniform(0, 100, 5000), 2),
    ])
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).materialize()
    qs = (0.1, 0.5, 0.75, 0.9)
    out = exact_percentiles(ds, "v", qs=qs, coarse_bins=64,
                            collect_limit=100)
    svals = np.sort(vals)
    for q, got in zip(out.q, out.value):
        want = svals[max(1, math.ceil(q * len(vals))) - 1]
        assert got == want, (q, got, want)


def test_minhash_broadcast_and_distributed_paths_agree(ray_session):
    """The size-gated broadcast fast path and the distributed co-group
    path must produce identical verified pairs (same candidates, same
    pre-filter, same exact verify)."""
    import ray.data as rd

    docs = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["doc_id", "text"])
    a = (minhash_lsh_dedup(rd.from_pandas(docs), threshold=0.5)
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    b = (minhash_lsh_dedup(rd.from_pandas(docs), threshold=0.5,
                           broadcast_limit=0)  # force distributed
         .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_hll_approx_distinct_within_tolerance(ray_session):
    """HLL estimate within ~3/sqrt(2^12) (~5%) of the exact count."""
    from rdf_n3_ray.pipelines.relational import approx_distinct_users

    exact = pd.read_parquet("/root/testdata/sf0.01/events.parquet",
                            columns=["user_id"]).user_id.nunique()
    est = approx_distinct_users(
        "/root/testdata/sf0.01").to_pandas().n_users_approx[0]
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_hll_core_estimator_branch(ray_session):
    """Exercise the RAW HLL estimator (not the small-range linear-
    counting correction): 60k distinct ids >> 2.5 * 2^12 registers."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import hll_distinct

    n = 60_000
    ds = rd.from_pandas(pd.DataFrame({"uid": np.arange(n, dtype=np.int64)}))
    est = hll_distinct(ds, "uid", p=12)
    assert est > 2.5 * (1 << 12)  # must have taken the raw-HLL branch
    assert abs(est - n) / n < 0.05, est


def test_grouped_percentiles_shared_descent(ray_session):
    """Round-3 rewrite: ONE shared keyed histogram descent must give
    exact per-group order statistics even with many groups, NULL
    values (ignored, DuckDB quantile_disc parity) and duplicate-heavy
    groups that descent cannot subdivide."""
    import math

    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import grouped_exact_percentiles

    rng = np.random.default_rng(31)
    frames = []
    for g in range(40):  # enough groups that a per-group loop would crawl
        vals = np.round(rng.uniform(0, 1000, 500), 2)
        if g % 3 == 0:
            vals[:300] = 7.77  # multiplicity above collect_limit
        frames.append(pd.DataFrame({"g": f"g{g:02d}", "v": vals}))
    df = pd.concat(frames, ignore_index=True)
    df.loc[rng.choice(len(df), 500, replace=False), "v"] = np.nan
    ds = rd.from_pandas(df).materialize()
    qs = (0.1, 0.5, 0.9)
    out = grouped_exact_percentiles(ds, "v", qs=qs, group_col="g",
                                    coarse_bins=64, collect_limit=100)
    got = {(r.group, r.q): r.value for r in out.itertuples()}
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].dropna().to_numpy())
        for q in qs:
            want = vals[max(1, math.ceil(q * len(vals))) - 1]
            assert got[(g, q)] == want, (g, q, got[(g, q)], want)


def test_exact_percentiles_all_null_and_empty(ray_session):
    """ADVICE r2 + r3 review: all-NULL input must yield NaN rows (one
    per quantile — quantile_disc over all-NULL is NULL), not IndexError
    and not a silently-missing row; NULLs must not shift the rank."""
    import math

    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import exact_percentiles

    ds = rd.from_pandas(pd.DataFrame({"v": [np.nan] * 50})).materialize()
    out = exact_percentiles(ds, "v", qs=(0.5,))
    assert len(out) == 1 and np.isnan(out["value"].iloc[0])

    # NULLs interleaved with values: n must count non-null only
    vals = [1.0, np.nan, 2.0, np.nan, 3.0, 4.0, np.nan]
    ds2 = rd.from_pandas(pd.DataFrame({"v": vals})).materialize()
    out2 = exact_percentiles(ds2, "v", qs=(0.5, 1.0))
    clean = np.sort([v for v in vals if not np.isnan(v)])
    for q, got in zip(out2.q, out2.value):
        assert got == clean[max(1, math.ceil(q * len(clean))) - 1]


def test_candidate_pairs_hot_bucket_cap():
    """A degenerate hot LSH bucket must not emit O(n^2) pairs: members
    above the cap are truncated deterministically; small buckets are
    untouched."""
    from rdf_n3_ray.stages.neardup import candidate_pairs

    n = 5000
    hot = pd.DataFrame({"doc_id": np.arange(n), "band": 0, "band_hash": 7})
    out = candidate_pairs(hot, max_bucket=100)
    assert len(out) == 100 * 99 // 2  # not n*(n-1)/2 = 12.5M
    assert out["a"].max() < 100 and out["b"].max() < 100  # smallest ids kept

    small = pd.DataFrame({"doc_id": [3, 1, 2], "band": 0, "band_hash": 9})
    out2 = candidate_pairs(small)
    assert sorted(map(tuple, out2[["a", "b"]].values.tolist())) == [
        (1, 2), (1, 3), (2, 3)]


def test_ivf_query_v1_index_fallback(ray_session, tmp_path):
    """ADVICE r2: an index directory written before the cluster_id
    data-column bump (v1) must still be queryable — the reader detects
    the missing column and falls back to scoring all rows of the probed
    partitions (union-of-probes semantics) instead of failing."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from rdf_n3_ray.stages.ann import ivf_query, ivf_write

    rng = np.random.default_rng(11)
    emb = rng.standard_normal((120, 8)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(120), pa.int64()),
        "embedding": pa.array([list(map(float, e)) for e in emb],
                              pa.list_(pa.float32())),
    })
    out_dir = str(tmp_path / "ivf")
    ivf_write(rd.from_arrow(tbl), out_dir, n_clusters=4)

    # strip cluster_id from every data file -> a v1-format index
    import glob
    import os
    for f in glob.glob(os.path.join(out_dir, "cluster=*", "*.parquet")):
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["cluster_id"]), f)

    df = ivf_query(out_dir, emb[:2], k=3, nprobe=4)  # all clusters probed
    for qi in range(2):
        sub = df[df["query_idx"] == qi]
        assert len(sub) == 3 and sub.iloc[0]["vec_id"] == qi  # self top hit


def _duckdb_oracle(sql: str, sf_dir: str = "/root/testdata/sf0.01"):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _assert_oracle_equal(ray_df: pd.DataFrame, oracle_df: pd.DataFrame):
    """Driver-gate-style compare: sorted columns, sorted rows, str cast."""
    a, b = ray_df.copy(), oracle_df.copy()
    assert sorted(a.columns) == sorted(b.columns)
    a, b = a[sorted(a.columns)], b[sorted(b.columns)]
    for c in a.columns:
        a[c], b[c] = a[c].astype(str), b[c].astype(str)
    a = a.sort_values(list(a.columns)).reset_index(drop=True)
    b = b.sort_values(list(b.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_shipping_priority_matches_oracle(ray_session):
    """TPC-H Q3 shape: two chained big-big bucket joins (no broadcast of
    either fact side), per-bucket partial top-k, driver merges <= B*k."""
    from rdf_n3_ray.pipelines.relational import (
        SHIPPING_PRIORITY_SQL, shipping_priority)

    out = shipping_priority("/root/testdata/sf0.01")
    assert len(out) == 10
    _assert_oracle_equal(out, _duckdb_oracle(SHIPPING_PRIORITY_SQL))


def test_top_event_per_user_matches_oracle(ray_session):
    """Per-user argmax: map-side partial argmax means at most one row per
    (batch, user) crosses the user-bucket shuffle."""
    from rdf_n3_ray.pipelines.relational import (
        TOP_EVENT_PER_USER_SQL, top_event_per_user)

    out = top_event_per_user("/root/testdata/sf0.01").to_pandas()
    assert out.user_id.is_unique
    _assert_oracle_equal(out, _duckdb_oracle(TOP_EVENT_PER_USER_SQL))


def test_user_running_total_matches_oracle(ray_session):
    """Cumulative window per user: in-bucket vectorized cumsum over
    integer cents, ties broken (ts, event_id) exactly as the SQL frame."""
    from rdf_n3_ray.pipelines.relational import (
        USER_RUNNING_TOTAL_SQL, user_running_total)

    out = user_running_total("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 10000
    _assert_oracle_equal(out, _duckdb_oracle(USER_RUNNING_TOTAL_SQL))


def test_grouped_percentiles_all_null_group(ray_session):
    """r3 review: a group whose values are ALL null must still appear
    in the output as NaN rows (quantile_disc GROUP BY keeps the group),
    and partial blocks with no surviving rows must not change the
    stage's schema."""
    import ray.data as rd

    from rdf_n3_ray.pipelines.relational import grouped_exact_percentiles

    df = pd.concat([
        pd.DataFrame({"g": "a", "v": np.arange(100, dtype="float64")}),
        pd.DataFrame({"g": "c", "v": [np.nan] * 50}),  # all-null group
    ], ignore_index=True)
    ds = rd.from_pandas(df).materialize()
    out = grouped_exact_percentiles(ds, "v", qs=(0.5,), group_col="g")
    got = {r.group: r.value for r in out.itertuples()}
    assert set(got) == {"a", "c"}
    assert got["a"] == 49.0  # rank ceil(0.5*100)=50 -> value 49
    assert np.isnan(got["c"])


def test_matrix_rejects_null_and_ragged():
    """r3 review: ListArray.flatten() silently drops null entries, which
    would misalign every following vector — _matrix must raise instead."""
    import pyarrow as pa
    import pytest

    from rdf_n3_ray.stages.ann import _matrix

    with_null = pa.array([[1.0, 2.0], None, [3.0, 4.0]],
                         type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="null embedding"):
        _matrix(with_null)

    # ragged lengths whose total still divides the row count (6 vals /
    # 3 rows) would reshape "successfully" into garbage
    ragged = pa.array([[1.0], [2.0, 3.0, 4.0], [5.0, 6.0]],
                      type=pa.list_(pa.float64()))
    with pytest.raises(ValueError, match="ragged"):
        _matrix(ragged)

    ok = pa.array([[1.0, 2.0], [3.0, 4.0]], type=pa.list_(pa.float64()))
    m = _matrix(ok)
    assert m.shape == (2, 2) and m[1, 0] == 3.0


def test_local_supplier_volume_matches_oracle(ray_session):
    """TPC-H Q5 shape: two independent bucket-join branches (lineitem ⋈
    supplier, orders ⋈ customer) whose shuffles overlap, then one final
    orderkey bucket join with the c_nationkey = s_nationkey condition.
    nation ⋈ region is the only broadcast."""
    from rdf_n3_ray.pipelines.relational import (
        LOCAL_SUPPLIER_VOLUME_SQL, local_supplier_volume)

    out = local_supplier_volume("/root/testdata/sf0.01")
    assert len(out) == 5  # every ASIA nation has local volume at sf0.01
    # revenue sorted descending
    assert (out["revenue"].to_numpy()[:-1]
            >= out["revenue"].to_numpy()[1:]).all()
    _assert_oracle_equal(out, _duckdb_oracle(LOCAL_SUPPLIER_VOLUME_SQL))
    # the past-the-gate fully distributed suppkey bucket join must
    # produce the identical frame
    dist = local_supplier_volume("/root/testdata/sf0.01",
                                 supp_broadcast_limit=0)
    pd.testing.assert_frame_equal(out, dist)


def test_small_qty_revenue_matches_oracle(ray_session):
    """TPC-H Q17 shape: the per-part AVG threshold and the qty < 0.2*avg
    row filter both computed from (partkey, quantity) count partials in
    ONE shuffle — no second fact pass, no threshold broadcast."""
    from rdf_n3_ray.pipelines.relational import (
        SMALL_QTY_REVENUE_SQL, small_qty_revenue)

    out = small_qty_revenue("/root/testdata/sf0.01")
    assert len(out) == 1 and out["avg_yearly"].iloc[0] > 0
    _assert_oracle_equal(out, _duckdb_oracle(SMALL_QTY_REVENUE_SQL))


def test_small_qty_revenue_empty_filter(ray_session):
    """No part matches -> zero revenue row, not a crash."""
    from rdf_n3_ray.pipelines.relational import small_qty_revenue

    out = small_qty_revenue("/root/testdata/sf0.001", brand="Brand#none")
    assert len(out) == 1 and out["avg_yearly"].iloc[0] == 0.0


def test_events_rollup_matches_oracle(ray_session):
    """GROUPING SETS via distributed finest-grain agg + driver re-agg of
    the dimension-sized grain; sentinel-encoded super-aggregate keys."""
    from rdf_n3_ray.pipelines.relational import (
        EVENTS_ROLLUP_SQL, events_rollup)

    out = events_rollup("/root/testdata/sf0.01")
    # grand total row consistency: n at lvl 3 == sum of lvl-0 ns
    lvl0, lvl3 = out[out["lvl"] == 0], out[out["lvl"] == 3]
    assert len(lvl3) == 1
    assert int(lvl3["n"].iloc[0]) == int(lvl0["n"].sum())
    _assert_oracle_equal(out, _duckdb_oracle(EVENTS_ROLLUP_SQL))


def test_pii_scrub_matches_oracle(ray_session):
    """Vectorized redaction: identical RE2-subset pattern run through
    pandas str kernels and DuckDB regexp_replace/extract_all."""
    from rdf_n3_ray.pipelines.relational import PII_SCRUB_SQL, pii_scrub

    out = pii_scrub("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500
    # the term list fires on this corpus; redaction counts consistent
    # with the literal marker count in the redacted text
    hit = out[out["n_redactions"] > 0]
    assert len(hit) > 0
    assert (hit["redacted"].str.count(r"\[PII\]").to_numpy()
            == hit["n_redactions"].to_numpy()).all()
    # no un-redacted term survives
    assert not out["redacted"].str.contains(r"\bspark\b").any()
    _assert_oracle_equal(out, _duckdb_oracle(PII_SCRUB_SQL))


def test_pii_scrub_email_phone_patterns():
    """The email/phone defaults (absent from the synthetic corpus) are
    exercised at the pattern level against DuckDB's RE2 directly."""
    import duckdb
    import re

    from rdf_n3_ray.pipelines.relational import _PII_COMBINED

    rx = re.compile(_PII_COMBINED)
    samples = [
        "contact me at jane.doe+spam@example-mail.co.uk today",
        "call 555-867-5309 or +155 555 1234x",
        "customer spark sparkle customers",  # word-boundary edges
        "no pii here at all",
    ]
    con = duckdb.connect()
    for s in samples:
        ours = rx.sub("[PII]", s)
        theirs = con.execute(
            "SELECT regexp_replace(?, ?, '[PII]', 'g')",
            [s, _PII_COMBINED]).fetchone()[0]
        assert ours == theirs, s


def test_order_priority_exists_matches_oracle(ray_session):
    """TPC-H Q4 shape: EXISTS semi-join on the shared orderkey bucket,
    lineitem side deduped map-side."""
    from rdf_n3_ray.pipelines.relational import (
        ORDER_PRIORITY_EXISTS_SQL, order_priority_exists)

    out = order_priority_exists("/root/testdata/sf0.01")
    assert len(out) == 5  # all five priorities occur at sf0.01
    _assert_oracle_equal(out, _duckdb_oracle(ORDER_PRIORITY_EXISTS_SQL))


def test_order_priority_exists_empty_window(ray_session):
    """A date window with no orders returns the typed empty frame."""
    from rdf_n3_ray.pipelines.relational import order_priority_exists

    out = order_priority_exists("/root/testdata/sf0.001",
                                date_from="2050-01-01",
                                date_to="2051-01-01")
    assert len(out) == 0
    assert list(out.columns) == ["o_orderpriority", "order_count"]


def test_customer_order_distribution_matches_oracle(ray_session):
    """TPC-H Q13 shape: LEFT JOIN count distribution; customers with
    zero orders must appear in the c_count=0 bucket."""
    import duckdb

    from rdf_n3_ray.pipelines.relational import (
        CUSTOMER_ORDER_DISTRIBUTION_SQL, customer_order_distribution)

    out = customer_order_distribution("/root/testdata/sf0.01")
    # total customers preserved across the distribution
    con = duckdb.connect()
    n_cust = con.execute(
        "SELECT COUNT(*) FROM "
        "read_parquet('/root/testdata/sf0.01/customer.parquet')"
    ).fetchone()[0]
    assert int(out["custdist"].sum()) == n_cust
    _assert_oracle_equal(out, _duckdb_oracle(CUSTOMER_ORDER_DISTRIBUTION_SQL))


def test_event_props_agg_matches_oracle(ray_session):
    """JSON-string field extraction via one vectorized regex pass."""
    from rdf_n3_ray.pipelines.relational import (
        EVENT_PROPS_AGG_SQL, event_props_agg)

    out = event_props_agg("/root/testdata/sf0.01").to_pandas()
    assert (out["n_events"] > 0).all() and (out["sum_k"] > 0).all()
    _assert_oracle_equal(out, _duckdb_oracle(EVENT_PROPS_AGG_SQL))


def test_train_val_split_matches_oracle(ray_session):
    """Deterministic multiplicative-hash split: same expression in
    numpy int64 and DuckDB BIGINT, overflow-safe for any doc_id."""
    from rdf_n3_ray.pipelines.relational import (
        TRAIN_VAL_SPLIT_SQL, train_val_split)

    out = train_val_split("/root/testdata/sf0.01").to_pandas()
    assert set(out["split"]) == {"train", "val"}
    # val rate ~1/10
    frac = (out["split"] == "val").mean()
    assert 0.02 < frac < 0.25
    _assert_oracle_equal(out, _duckdb_oracle(TRAIN_VAL_SPLIT_SQL))


def test_split_hash_int64_safe():
    """The hash never overflows int64 even at the uint extreme."""
    from rdf_n3_ray.pipelines.relational import _split_hash

    ids = np.array([0, 1, 2**31 - 1, 2**31, 2**62, 2**63 - 1],
                   dtype="int64")
    h = _split_hash(ids)
    assert (h >= 0).all() and (h < 2**32).all()
    # periodicity by construction: doc_id and doc_id + 2^31 collide
    assert _split_hash(np.array([5]))[0] == _split_hash(
        np.array([5 + 2**31]))[0]


def test_stratified_sample_matches_oracle(ray_session):
    """Exact per-stratum quota via the shared histogram descent."""
    import duckdb
    import math

    from rdf_n3_ray.pipelines.relational import (
        STRATIFIED_SAMPLE_SQL, stratified_sample)

    out = stratified_sample("/root/testdata/sf0.01").to_pandas()
    # exact quota per stratum
    con = duckdb.connect()
    strata = con.execute(
        "SELECT lang, COUNT(*) n FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet') "
        "GROUP BY lang").fetchdf()
    for _, r in strata.iterrows():
        want = max(1, math.ceil(0.2 * r["n"]))
        assert (out["lang"] == r["lang"]).sum() == want
    _assert_oracle_equal(out, _duckdb_oracle(STRATIFIED_SAMPLE_SQL))


def test_stratified_sample_hash_ties(ray_session, tmp_path):
    """doc_id and doc_id + 2^31 collide under the split hash by
    construction, so a table built from such pairs exercises the
    threshold-tie path (quota filled by smallest doc_id)."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import (
        STRATIFIED_SAMPLE_SQL, stratified_sample)

    base = np.arange(1, 21, dtype="int64")
    ids = np.concatenate([base, base + 2**31])  # 20 collision pairs
    t = pa.table({"doc_id": ids,
                  "lang": ["en"] * len(ids),
                  "text": ["x"] * len(ids),
                  "source": ["s"] * len(ids),
                  "n_chars": np.ones(len(ids), dtype="int64")})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = stratified_sample(str(tmp_path), rate=0.2).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(STRATIFIED_SAMPLE_SQL).fetchdf()
    assert len(out) == 8  # ceil(0.2 * 40)
    _assert_oracle_equal(out, want)
    # tie-break by doc_id: any collision pair with exactly ONE kept
    # member must have kept the LOW id
    kept = set(out["doc_id"])
    for lo_id in base:
        pair_kept = {lo_id, lo_id + 2**31} & kept
        if len(pair_kept) == 1:
            assert pair_kept == {lo_id}

    # odd quota (ceil(0.125*40)=5) GUARANTEES the boundary splits a
    # collision pair: exactly one pair keeps only its low id
    out5 = stratified_sample(str(tmp_path), rate=0.125).to_pandas()
    assert len(out5) == 5
    kept5 = set(out5["doc_id"])
    singles = [lo for lo in base
               if len({lo, lo + 2**31} & kept5) == 1]
    assert len(singles) == 1
    assert singles[0] in kept5  # the LOW id won the tie-break


def test_kmeans_lloyd_recovers_blobs(ray_session):
    """Three well-separated direction blobs on the sphere: full-data
    Lloyd recovers them purely and the cosine objective is monotone
    non-decreasing."""
    import ray.data as rd

    from rdf_n3_ray.stages.cluster import (kmeans_assign, kmeans_lloyd)

    rng = np.random.default_rng(3)
    centers = np.eye(3, 16)  # three orthogonal directions in R^16
    rows = []
    for b in range(3):
        pts = centers[b] + 0.05 * rng.standard_normal((40, 16))
        rows += [{"vec_id": b * 40 + i,
                  "embedding": pts[i].astype(np.float32).tolist(),
                  "blob": b} for i in range(40)]
    ds = rd.from_items(rows)

    cent, hist = kmeans_lloyd(ds, n_clusters=3, iters=5, seed=1)
    assert all(b >= a - 1e-12 for a, b in zip(hist, hist[1:]))
    assert hist[-1] > 0.95  # tight blobs -> near-1 mean cosine

    got = kmeans_assign(ds, cent).to_pandas()
    # purity: every blob maps to exactly one cluster, bijectively
    m = got.groupby("blob")["cluster"].nunique()
    assert (m == 1).all()
    assert got.groupby("blob")["cluster"].first().nunique() == 3


def test_kmeans_cluster_profile_shape(ray_session):
    """queries() surface: k rows, sizes sum to N, mean_sim in [-1, 1]."""
    import ray.data as rd

    from rdf_n3_ray.stages.cluster import kmeans_cluster_profile

    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    n = ds.count()
    out = kmeans_cluster_profile(ds, n_clusters=4, iters=3)
    assert out["size"].sum() == n
    assert ((out["mean_sim"] <= 1.0 + 1e-9)
            & (out["mean_sim"] >= -1.0 - 1e-9)).all()
    assert list(out.columns) == ["cluster", "size", "mean_sim"]


def test_pii_scrub_regex_ascii_parity_with_re2():
    """Python re defaults to Unicode \\w/\\b/\\d while DuckDB's RE2 is
    ASCII-only; pii_scrub compiles with re.ASCII so both engines split
    matches identically on non-ASCII text (the corpus has de/es/fr
    docs, and half-redacted PII is worse than none)."""
    import duckdb
    import re

    from rdf_n3_ray.pipelines.relational import _PII_COMBINED

    rx = re.compile(_PII_COMBINED, re.ASCII)
    samples = [
        "tëst@ex.com cafécustomer x",       # accented char adjacent
        "naïve.user@exämple.com écrit",     # unicode inside the match
        "müller spark café, customerß",     # \\b at unicode boundary
        "电话 555-123-4567 联系",             # CJK around a phone
    ]
    con = duckdb.connect()
    for s in samples:
        ours = rx.sub("[PII]", s)
        theirs = con.execute(
            "SELECT regexp_replace(?, ?, '[PII]', 'g')",
            [s, _PII_COMBINED]).fetchone()[0]
        assert ours == theirs, s
        n_ours = len(rx.findall(s))
        n_theirs = con.execute(
            "SELECT len(regexp_extract_all(?, ?))",
            [s, _PII_COMBINED]).fetchone()[0]
        assert n_ours == n_theirs, s


def test_split_hash_negative_ids_match_duckdb():
    """numpy % is floored, DuckDB % is truncated — the shared
    sign-normalizing form must agree on negative ids too."""
    import duckdb

    from rdf_n3_ray.pipelines.relational import (_SPLIT_HASH_SQL,
                                                 _split_hash)

    ids = np.array([-1, -5, -(2**31), -(2**31) - 1, -(2**62),
                    -(2**63) + 1, 0, 7], dtype="int64")
    ours = _split_hash(ids)
    con = duckdb.connect()
    theirs = con.execute(
        f"SELECT {_SPLIT_HASH_SQL} FROM (SELECT UNNEST(?) AS doc_id)",
        [ids.tolist()]).fetchdf().iloc[:, 0].to_numpy()
    np.testing.assert_array_equal(ours, theirs)


def test_stratified_sample_null_stratum(ray_session, tmp_path):
    """NULL lang rows form their own stratum (DuckDB PARTITION BY
    semantics) instead of being silently dropped."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import (
        STRATIFIED_SAMPLE_SQL, stratified_sample)

    n = 40
    langs = ["en"] * 20 + [None] * 20
    t = pa.table({"doc_id": np.arange(n, dtype="int64"),
                  "lang": pa.array(langs, pa.string()),
                  "text": ["x"] * n,
                  "source": ["s"] * n,
                  "n_chars": np.ones(n, dtype="int64")})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = stratified_sample(str(tmp_path), rate=0.2).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(STRATIFIED_SAMPLE_SQL).fetchdf()
    # ceil(0.2*20) per stratum, NULL included
    assert len(out) == 8 and out["lang"].isna().sum() == 4
    _assert_oracle_equal(out, want)


def test_stratified_sample_empty_input_returns_dataset(ray_session,
                                                       tmp_path):
    """The empty branch keeps the Dataset contract shape (callers do
    .to_pandas()/.count() uniformly)."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import stratified_sample

    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "lang": pa.array([], pa.string()),
                  "text": pa.array([], pa.string()),
                  "source": pa.array([], pa.string()),
                  "n_chars": pa.array([], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    out = stratified_sample(str(tmp_path))
    assert out.count() == 0
    # (to_pandas() of an empty Dataset drops columns — a Ray quirk —
    # so the schema is the contract to pin)
    assert sorted(out.schema().names) == ["doc_id", "lang"]


def test_kmeans_assign_handles_empty_block(ray_session):
    """A 0-row block must not reach the matmul ((0,0) @ (d,k) raises);
    the guard emits typed empty cluster/sim columns."""
    import ray.data as rd

    from rdf_n3_ray.stages.cluster import kmeans_assign

    full = pd.DataFrame({
        "vec_id": np.arange(4, dtype="int64"),
        "embedding": [np.eye(4)[i % 4].tolist() for i in range(4)]})
    empty = full.iloc[:0]
    ds = rd.from_pandas([empty, full])  # one empty block up front
    cent = np.eye(4)
    out = kmeans_assign(ds, cent).to_pandas()
    assert len(out) == 4
    assert set(out.columns) >= {"cluster", "sim"}
    assert (out["sim"] > 0.99).all()  # each unit vector has a centroid
    assert sorted(out["cluster"]) == [0, 1, 2, 3]


def test_promo_revenue_matches_oracle(ray_session):
    """TPC-H Q14 shape: big-big partkey bucket join, conditional
    aggregate folded to two int64 cents sums."""
    from rdf_n3_ray.pipelines.relational import (PROMO_REVENUE_SQL,
                                                 promo_revenue)

    out = promo_revenue("/root/testdata/sf0.01")
    assert len(out) == 1
    assert 0.0 < out["promo_revenue_pct"].iloc[0] < 100.0
    _assert_oracle_equal(out, _duckdb_oracle(PROMO_REVENUE_SQL))


def test_promo_revenue_empty_window(ray_session):
    """No lineitem in the window: NaN percentage, one row (SQL parity:
    SUM over empty is NULL)."""
    from rdf_n3_ray.pipelines.relational import promo_revenue

    out = promo_revenue("/root/testdata/sf0.001",
                        date_from="2050-01-01", date_to="2050-02-01")
    assert len(out) == 1 and np.isnan(out["promo_revenue_pct"].iloc[0])


def test_above_avg_low_activity_matches_oracle(ray_session):
    """TPC-H Q22 shape: global scalar (exact cents avg) + bucketed
    count-join; nothing fact-sized leaves its bucket."""
    from rdf_n3_ray.pipelines.relational import (
        ABOVE_AVG_LOW_ACTIVITY_SQL, above_avg_low_activity)

    out = above_avg_low_activity("/root/testdata/sf0.01")
    assert (out["n_customers"] > 0).all()
    _assert_oracle_equal(out, _duckdb_oracle(ABOVE_AVG_LOW_ACTIVITY_SQL))


def test_doc_repetition_matches_oracle(ray_session):
    """Type-token ratio with DuckDB string_split semantics pinned."""
    from rdf_n3_ray.pipelines.relational import (DOC_REPETITION_SQL,
                                                 doc_repetition)

    out = doc_repetition("/root/testdata/sf0.01").to_pandas()
    assert len(out) == 500
    assert ((out["repetition"] >= 0.0) & (out["repetition"] < 1.0)).all()
    assert (out["n_distinct"] <= out["n_tokens"]).all()
    _assert_oracle_equal(out, _duckdb_oracle(DOC_REPETITION_SQL))


def test_keyword_and_tfidf_search_match_oracle(ray_session):
    """Token-membership search and linear-idf TF-IDF: per-batch partial
    top-k under (score DESC, doc_id) merges to the exact SQL LIMIT."""
    from rdf_n3_ray.pipelines.relational import (
        KEYWORD_SEARCH_SQL, TFIDF_SEARCH_SQL, keyword_search,
        tfidf_search)

    kw = keyword_search("/root/testdata/sf0.01")
    assert len(kw) == 15 and (kw["score"] >= 1).all()
    _assert_oracle_equal(kw, _duckdb_oracle(KEYWORD_SEARCH_SQL))

    tf = tfidf_search("/root/testdata/sf0.01")
    assert len(tf) == 15 and (tf["score"] > 0).all()
    # tf-idf ranks repeat-mentions above mere membership: top tf-idf
    # score must be >= top keyword score scaled by the smallest idf
    _assert_oracle_equal(tf, _duckdb_oracle(TFIDF_SEARCH_SQL))


def test_tfidf_search_zero_df_term(ray_session):
    """A query term absent from the corpus contributes 0 (not NaN from
    0 * inf) and never poisons the scores of the other terms."""
    from rdf_n3_ray.pipelines.relational import tfidf_search

    out = tfidf_search("/root/testdata/sf0.01",
                       terms=("spark", "zzz_not_a_token", "merge"))
    assert len(out) == 15
    assert np.isfinite(out["score"]).all() and (out["score"] > 0).all()


def test_revenue_forecast_matches_oracle(ray_session):
    """TPC-H Q6 shape: predicate in the batch kernel, one partial row
    per batch, no shuffle."""
    from rdf_n3_ray.pipelines.relational import (
        REVENUE_FORECAST_SQL, revenue_forecast)

    out = revenue_forecast("/root/testdata/sf0.01")
    assert len(out) == 1 and out["n_items"].iloc[0] > 0
    _assert_oracle_equal(out, _duckdb_oracle(REVENUE_FORECAST_SQL))


def test_returned_top_customers_matches_oracle(ray_session):
    """TPC-H Q10 shape: chained orderkey->custkey bucket joins, nation
    broadcast, per-bucket partial top-k (driver sees <= B*k rows)."""
    from rdf_n3_ray.pipelines.relational import (
        RETURNED_TOP_CUSTOMERS_SQL, returned_top_customers)

    out = returned_top_customers("/root/testdata/sf0.01")
    assert len(out) == 20
    assert out["revenue"].is_monotonic_decreasing or len(
        out["revenue"].unique()) < 20  # ties broken by custkey
    _assert_oracle_equal(out, _duckdb_oracle(RETURNED_TOP_CUSTOMERS_SQL))


def test_large_orders_matches_oracle(ray_session):
    """TPC-H Q18 shape: HAVING-filtered winners drive broadcast
    semi-joins; only winner-sized frames ever reach the driver."""
    from rdf_n3_ray.pipelines.relational import (
        LARGE_ORDERS_SQL, large_orders)

    out = large_orders("/root/testdata/sf0.01")
    assert (out["total_qty"] > 300.0).all()
    _assert_oracle_equal(out, _duckdb_oracle(LARGE_ORDERS_SQL))


def test_large_orders_empty_window(ray_session):
    """Threshold above the max per-order quantity -> typed empty frame,
    not a crash."""
    from rdf_n3_ray.pipelines.relational import large_orders

    out = large_orders("/root/testdata/sf0.001", min_qty=1e9)
    assert len(out) == 0
    assert list(out.columns) == ["c_custkey", "c_name", "o_orderkey",
                                 "o_orderdate", "o_totalprice", "total_qty"]


def test_nation_trade_volume_matches_oracle(ray_session):
    """TPC-H Q7 shape: size-gated supplier broadcast + orderkey->custkey
    bucket-join chain, cross-nation filter in the custkey bucket."""
    from rdf_n3_ray.pipelines.relational import (
        NATION_TRADE_VOLUME_SQL, nation_trade_volume)

    out = nation_trade_volume("/root/testdata/sf0.01")
    assert set(out["supp_nation"]) == {"NATION_1", "NATION_2"}
    _assert_oracle_equal(out, _duckdb_oracle(NATION_TRADE_VOLUME_SQL))


def test_nation_trade_volume_distributed_path(ray_session):
    """Force the suppkey bucket-join fallback (broadcast gate = 0):
    identical result, nothing supplier-sized broadcast."""
    from rdf_n3_ray.pipelines.relational import (
        NATION_TRADE_VOLUME_SQL, nation_trade_volume)

    out = nation_trade_volume("/root/testdata/sf0.01",
                              supp_broadcast_limit=0)
    _assert_oracle_equal(out, _duckdb_oracle(NATION_TRADE_VOLUME_SQL))


def test_nation_trade_volume_empty_slice(ray_session):
    """sf0.001 has no NATION_1/NATION_2 suppliers: typed empty frame,
    matching the oracle's zero rows (no schema-dropping to_pandas)."""
    from rdf_n3_ray.pipelines.relational import (
        NATION_TRADE_VOLUME_SQL, nation_trade_volume)

    out = nation_trade_volume("/root/testdata/sf0.001")
    assert len(out) == 0
    assert len(_duckdb_oracle(NATION_TRADE_VOLUME_SQL,
                              sf_dir="/root/testdata/sf0.001")) == 0


def test_brand_disjunct_revenue_matches_oracle(ray_session):
    """TPC-H Q19 shape: disjunctive brand/size/qty clauses via a
    broadcast clause-tagged part slice; single-pass map sum."""
    from rdf_n3_ray.pipelines.relational import (
        BRAND_DISJUNCT_REVENUE_SQL, brand_disjunct_revenue)

    out = brand_disjunct_revenue("/root/testdata/sf0.01")
    assert out["n_items"].iloc[0] > 0
    _assert_oracle_equal(out, _duckdb_oracle(BRAND_DISJUNCT_REVENUE_SQL))


def test_brand_disjunct_revenue_distributed_path(ray_session):
    """Force the (partkey, quantity)-partial bucket-join fallback:
    identical result to the broadcast fast path."""
    from rdf_n3_ray.pipelines.relational import (
        BRAND_DISJUNCT_REVENUE_SQL, brand_disjunct_revenue)

    out = brand_disjunct_revenue("/root/testdata/sf0.01",
                                 part_broadcast_limit=0)
    _assert_oracle_equal(out, _duckdb_oracle(BRAND_DISJUNCT_REVENUE_SQL))


def test_brand_disjunct_revenue_empty_slice(ray_session):
    """sf0.001 has no part matching any clause: NULL revenue / 0 items,
    exactly the SQL aggregate-over-zero-rows result."""
    from rdf_n3_ray.pipelines.relational import (
        BRAND_DISJUNCT_REVENUE_SQL, brand_disjunct_revenue)

    out = brand_disjunct_revenue("/root/testdata/sf0.001")
    _assert_oracle_equal(out, _duckdb_oracle(
        BRAND_DISJUNCT_REVENUE_SQL, sf_dir="/root/testdata/sf0.001"))


def test_doc_rarity_matches_oracle(ray_session):
    """Mean global-token-probability per doc, integer-ppb quantized so
    sums are order-independent; broadcast-vocab fast path."""
    from rdf_n3_ray.pipelines.relational import DOC_RARITY_SQL, doc_rarity

    out = doc_rarity("/root/testdata/sf0.01").to_pandas()
    assert (out["n_tokens"] > 0).all()
    _assert_oracle_equal(out, _duckdb_oracle(DOC_RARITY_SQL))


def test_doc_rarity_distributed_path(ray_session):
    """Force the token-hash bucket join + doc_id regroup (vocab gate 0):
    identical result to the broadcast path."""
    from rdf_n3_ray.pipelines.relational import DOC_RARITY_SQL, doc_rarity

    out = doc_rarity("/root/testdata/sf0.001",
                     vocab_broadcast_limit=0).to_pandas()
    _assert_oracle_equal(out, _duckdb_oracle(
        DOC_RARITY_SQL, sf_dir="/root/testdata/sf0.001"))


def test_event_zscore_matches_oracle(ray_session):
    """Per-type moment partials -> broadcast (mean, std) -> map-side
    |z|>3 flags; exact integer-cent moments, op-for-op float parity."""
    from rdf_n3_ray.pipelines.relational import (
        EVENT_ZSCORE_SQL, event_zscore)

    out = event_zscore("/root/testdata/sf0.01").to_pandas()
    assert (out["z_milli"].abs() >= 3000).all()
    _assert_oracle_equal(out, _duckdb_oracle(EVENT_ZSCORE_SQL))


def test_ws_tokens_ascii_regex_parity():
    """Python str.split() splits Unicode whitespace (\\x85, NBSP, \\v);
    the oracles' RE2 '\\s+' is ASCII-only.  _ws_tokens must match RE2."""
    import duckdb

    from rdf_n3_ray.pipelines.relational import _ws_tokens

    texts = ["a\vb", "a\x85b", "a\xa0b", "a\x1cb", " x\t y\n", "", "  "]
    con = duckdb.connect()
    for t in texts:
        want = con.execute(
            r"SELECT list_filter(regexp_split_to_array(lower($1), '\s+'),"
            r" x -> x <> '')", [t]).fetchone()[0]
        got = _ws_tokens(pd.Series([t])).tolist()
        assert got == want, (t.encode(), got, want)


def test_event_zscore_bigvalue_exact_path(ray_session, tmp_path):
    """Values >= 2^22 cents route through the big-int exact path; the
    HUGEINT oracle must still hash-match (int64 squares would wrap)."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import EVENT_ZSCORE_SQL, event_zscore

    rng = np.random.default_rng(7)
    n = 4000
    vals = rng.normal(4e7, 1e6, size=n)  # xc ~ 4e9: int64^2 wraps
    vals[:5] = 4e7 + np.array([8e6, -9e6, 1e7, -1.2e7, 2e7])  # outliers
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(n)],
                       pa.timestamp("us")),
        "user_id": pa.array([i % 97 for i in range(n)], pa.int64()),
        "event_type": pa.array(["big" if i % 2 else "huge"
                                for i in range(n)]),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    out = event_zscore(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(EVENT_ZSCORE_SQL).fetchdf()
    assert len(out) > 0
    _assert_oracle_equal(out, want)


def test_top_bigrams_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import TOP_BIGRAMS_SQL, top_bigrams

    out = top_bigrams("/root/testdata/sf0.01")
    assert len(out) == 50
    # no cross-document bigram: every bigram's parts are real tokens
    assert out["bigram"].str.split(" ").str.len().eq(2).all()
    _assert_oracle_equal(out, _duckdb_oracle(TOP_BIGRAMS_SQL))


def test_top_bigrams_no_cross_doc_pairs(ray_session, tmp_path):
    """Two single-token docs must produce zero bigrams (the adjacency
    shift must respect document boundaries), and a doc with exotic
    whitespace tokenizes like the oracle's RE2."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import top_bigrams

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha", "beta", "x\vy gamma"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([5, 4, 10], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = top_bigrams(str(tmp_path))
    # 'alpha beta' must NOT appear; doc 3 has tokens ['x\vy', 'gamma']
    # (\v is NOT an RE2 \s separator) -> exactly one bigram
    assert out["bigram"].tolist() == ["x\vy gamma"]
    assert out["n"].tolist() == [1]


def test_bigram_pmi_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import BIGRAM_PMI_SQL, bigram_pmi

    out = bigram_pmi("/root/testdata/sf0.01")
    assert len(out) == 50
    assert (out["n"] >= 5).all()
    _assert_oracle_equal(out, _duckdb_oracle(BIGRAM_PMI_SQL))


def test_user_retention_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (USER_RETENTION_SQL,
                                                 user_retention)

    out = user_retention("/root/testdata/sf0.01")
    assert (out["retained"] <= out["active"]).all()
    _assert_oracle_equal(out, _duckdb_oracle(USER_RETENTION_SQL))


def test_user_retention_bucket_boundary(ray_session, tmp_path):
    """A user straddling a month boundary still counts as retained
    (calendar next-day, not same-month), and duplicate events on one
    day dedupe to a single active count."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import user_retention

    ts = pd.to_datetime(["2024-01-31 10:00", "2024-01-31 23:00",
                         "2024-02-01 01:00",   # next day across month
                         "2024-01-31 09:00",   # user 2: one day only
                         "2024-02-02 00:00"])  # user 2: gap, no retain
    tbl = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array([1.0] * 5),
        "props": pa.array(["{}"] * 5),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = user_retention(str(tmp_path))
    got = {str(d)[:10]: (a, r) for d, a, r in
           zip(out["day"], out["active"], out["retained"])}
    assert got == {"2024-01-31": (2, 1),   # u1 retained, u2 not
                   "2024-02-01": (1, 0),
                   "2024-02-02": (1, 0)}


def test_event_funnel_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (EVENT_FUNNEL_SQL,
                                                 event_funnel)

    out = event_funnel("/root/testdata/sf0.01")
    # funnel is monotone non-increasing
    assert list(out["users"]) == sorted(out["users"], reverse=True)
    _assert_oracle_equal(out, _duckdb_oracle(EVENT_FUNNEL_SQL))


def test_event_funnel_strict_ordering(ray_session, tmp_path):
    """A click BEFORE the first view must not convert; one strictly
    after must."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import event_funnel

    ts = pd.to_datetime(["2024-01-02", "2024-01-01",   # u1 click < view
                         "2024-01-01", "2024-01-02", "2024-01-03"])
    tbl = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(["view", "click",
                                "view", "click", "purchase"]),
        "value": pa.array([1.0] * 5),
        "props": pa.array(["{}"] * 5),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = event_funnel(str(tmp_path))
    assert out["users"].tolist() == [2, 1, 1]


def test_sole_late_supplier_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (SOLE_LATE_SUPPLIER_SQL,
                                                 sole_late_supplier)

    out = sole_late_supplier("/root/testdata/sf0.01")
    assert len(out) == 20
    _assert_oracle_equal(out, _duckdb_oracle(SOLE_LATE_SUPPLIER_SQL))


def test_sole_late_supplier_semantics(ray_session, tmp_path):
    """Single-supplier orders and two-late-supplier orders must not
    count; a multi-supplier order with exactly one late supplier blames
    that supplier."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import sole_late_supplier

    od = pd.Timestamp("2024-01-01")
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O"] * 3),
        "o_totalprice": pa.array([1.0] * 3),
        "o_orderdate": pa.array([od] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3),
    })
    late, ontime = od + pd.Timedelta(days=90), od + pd.Timedelta(days=5)
    li = pa.table({
        # order 1: supp 10 late, supp 11 on time -> blame 10
        # order 2: supp 10 and 11 BOTH late -> no blame
        # order 3: single supplier late -> no blame (needs >= 2 supp)
        "l_orderkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 5, pa.int64()),
        "l_suppkey": pa.array([10, 11, 10, 11, 10], pa.int64()),
        "l_linenumber": pa.array([1, 2, 1, 2, 1], pa.int32()),
        "l_quantity": pa.array([1.0] * 5),
        "l_extendedprice": pa.array([1.0] * 5),
        "l_discount": pa.array([0.0] * 5),
        "l_tax": pa.array([0.0] * 5),
        "l_returnflag": pa.array(["N"] * 5),
        "l_linestatus": pa.array(["O"] * 5),
        "l_shipdate": pa.array([late, ontime, late, late, late],
                               pa.timestamp("us")),
    })
    supp = pa.table({
        "s_suppkey": pa.array([10, 11], pa.int64()),
        "s_name": pa.array(["SUPP_10", "SUPP_11"]),
        "s_nationkey": pa.array([0, 0], pa.int32()),
    })
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(supp, str(tmp_path / "supplier.parquet"))
    out = sole_late_supplier(str(tmp_path))
    assert out[["s_suppkey", "numwait"]].values.tolist() == [[10, 1]]
    assert out["s_name"].tolist() == ["SUPP_10"]


def test_market_share_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (MARKET_SHARE_SQL,
                                                 market_share)

    out = market_share("/root/testdata/sf0.01")
    assert (out["target_rev"] <= out["total_rev"]).all()
    _assert_oracle_equal(out, _duckdb_oracle(MARKET_SHARE_SQL))


def test_market_share_distributed_fallback(ray_session):
    """Force both bucket-join fallbacks (customer AND supplier sides)
    and require bit-identical output to the broadcast fast path."""
    from rdf_n3_ray.pipelines.relational import market_share

    fast = market_share("/root/testdata/sf0.01")
    dist = market_share("/root/testdata/sf0.01", broadcast_limit=0)
    pd.testing.assert_frame_equal(fast, dist)


def test_market_share_absent_nation(ray_session):
    """A nation name matching no row still yields per-year rows with
    zero target share (oracle parity: CASE WHEN matches nothing)."""
    from rdf_n3_ray.pipelines.relational import market_share

    out = market_share("/root/testdata/sf0.01", nation="NO_SUCH")
    assert len(out) > 0
    assert (out["target_rev"] == 0.0).all()
    assert (out["share_ppm"] == 0).all()
    assert (out["total_rev"] > 0).all()


def test_event_funnel_no_step_events(ray_session, tmp_path):
    """A table with none of the funnel's event types returns one zero
    row per stage (the oracle's shape), not an empty frame."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import event_funnel

    tbl = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"]), pa.timestamp("us")),
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["scroll"]),
        "value": pa.array([1.0]),
        "props": pa.array(["{}"]),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = event_funnel(str(tmp_path))
    assert out["users"].tolist() == [0, 0, 0]
    assert out["stage"].tolist() == ["view", "click", "purchase"]


def test_bigram_pmi_bigram_free_corpus(ray_session, tmp_path):
    """Single-token documents produce no bigrams; the fold must return
    a typed empty frame, not crash on Ray's sum() -> None."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import bigram_pmi, top_bigrams

    tbl = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["alpha", "beta"]),
        "lang": pa.array(["en"] * 2),
        "source": pa.array(["s"] * 2),
        "n_chars": pa.array([5, 4], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = bigram_pmi(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["bigram", "n", "lift_milli"]
    out2 = top_bigrams(str(tmp_path))
    assert len(out2) == 0
    assert list(out2.columns) == ["bigram", "n"]


def test_type_cooccurrence_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (TYPE_COOCCURRENCE_SQL,
                                                 type_cooccurrence)

    out = type_cooccurrence("/root/testdata/sf0.01")
    assert (out["type_a"] < out["type_b"]).all()
    _assert_oracle_equal(out, _duckdb_oracle(TYPE_COOCCURRENCE_SQL))


def test_type_cooccurrence_lift_variance(ray_session, tmp_path):
    """Non-degenerate fixture: lift > 1 for correlated pair, < 1 for
    anti-correlated pair; bucket user-partition sum must equal the
    global distinct-user count."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import type_cooccurrence

    # users 1-4: A+B always together; C only for user 9 (never with A)
    rows = [(1, "A"), (1, "B"), (2, "A"), (2, "B"),
            (3, "A"), (3, "B"), (4, "A"), (4, "B"), (9, "C"), (9, "B")]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * len(rows)),
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, t in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = type_cooccurrence(str(tmp_path))
    got = {(a, b): (n, l) for a, b, n, l in
           zip(out["type_a"], out["type_b"], out["n_both"],
               out["lift_ppm"])}
    # P(AB)=4/5, P(A)=4/5, P(B)=5/5 -> lift 1.0
    assert got[("A", "B")] == (4, 1_000_000)
    # P(BC)=1/5, P(B)=1, P(C)=1/5 -> lift 1.0; A,C never co-occur
    assert got[("B", "C")] == (1, 1_000_000)
    assert ("A", "C") not in got


def test_search_index_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (SEARCH_INDEX_SQL,
                                                 search_index)

    out = search_index("/root/testdata/sf0.01")
    # postings are sorted and capped at 20
    assert out["postings"].str.split(",").str.len().le(20).all()
    _assert_oracle_equal(out, _duckdb_oracle(SEARCH_INDEX_SQL))


def test_search_index_persisted_roundtrip(ray_session, tmp_path):
    """search_index_write -> keyword_query: partition-pruned reads
    must agree with a direct DuckDB computation of matched-term
    counts."""
    import duckdb

    from rdf_n3_ray.pipelines.relational import (keyword_query,
                                                 search_index_write)

    idx = str(tmp_path / "tidx")
    search_index_write("/root/testdata/sf0.01", idx)
    terms = ["spark", "window", "nosuchtoken"]
    out = keyword_query(idx, terms, k=15)
    assert len(out) == 15

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')")
    want = con.execute(r"""
        WITH toks AS (
          SELECT DISTINCT doc_id, unnest(list_filter(
            regexp_split_to_array(lower(coalesce(text,'')),
                                  '[ \t\n\f\r]+'), x -> x <> '')) AS token
          FROM documents
        )
        SELECT doc_id, count(*)::BIGINT AS n_matched FROM toks
        WHERE token IN ('spark', 'window', 'nosuchtoken')
        GROUP BY doc_id ORDER BY n_matched DESC, doc_id LIMIT 15
    """).fetchdf()
    _assert_oracle_equal(out, want)

    # pruning: a query for one term reads only that term's bucket
    out1 = keyword_query(idx, ["spark"], k=5)
    assert (out1["n_matched"] == 1).all() and len(out1) == 5


def test_top_supplier_revenue_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (TOP_SUPPLIER_REVENUE_SQL,
                                                 top_supplier_revenue)

    out = top_supplier_revenue("/root/testdata/sf0.01")
    assert len(out) >= 1
    _assert_oracle_equal(out, _duckdb_oracle(TOP_SUPPLIER_REVENUE_SQL))


def test_top_supplier_revenue_keeps_ties(ray_session, tmp_path):
    """Two suppliers with identical max revenue both appear."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import top_supplier_revenue

    d = pd.Timestamp("1996-02-01")
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([1] * 3, pa.int64()),
        "l_suppkey": pa.array([10, 11, 12], pa.int64()),
        "l_linenumber": pa.array([1] * 3, pa.int32()),
        "l_quantity": pa.array([1.0] * 3),
        "l_extendedprice": pa.array([100.0, 100.0, 50.0]),
        "l_discount": pa.array([0.0] * 3),
        "l_tax": pa.array([0.0] * 3),
        "l_returnflag": pa.array(["N"] * 3),
        "l_linestatus": pa.array(["O"] * 3),
        "l_shipdate": pa.array([d] * 3, pa.timestamp("us")),
    })
    supp = pa.table({
        "s_suppkey": pa.array([10, 11, 12], pa.int64()),
        "s_name": pa.array(["S10", "S11", "S12"]),
        "s_nationkey": pa.array([0, 0, 0], pa.int32()),
    })
    pq.write_table(li, str(tmp_path / "lineitem.parquet"))
    pq.write_table(supp, str(tmp_path / "supplier.parquet"))
    out = top_supplier_revenue(str(tmp_path))
    assert out["s_suppkey"].tolist() == [10, 11]
    assert (out["total_revenue"] == 100.0).all()


def test_late_shipment_priority_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        LATE_SHIPMENT_PRIORITY_SQL, late_shipment_priority)

    out = late_shipment_priority("/root/testdata/sf0.01")
    assert set(out["ship_status"]) == {"late", "ontime"}
    _assert_oracle_equal(out, _duckdb_oracle(LATE_SHIPMENT_PRIORITY_SQL))


def test_min_cost_supplier_matches_oracle(ray_session):
    """TPC-H Q2 shape: lineitem distinct pairs as the part<->supplier
    relation, two bucket joins, per-part argmin with (acctbal, suppkey)
    tie-break — matches the oracle's ROW_NUMBER pick exactly."""
    from rdf_n3_ray.pipelines.relational import (
        MIN_COST_SUPPLIER_SQL, min_cost_supplier)

    out = min_cost_supplier("/root/testdata/sf0.01")
    assert out["p_partkey"].is_unique
    _assert_oracle_equal(out, _duckdb_oracle(MIN_COST_SUPPLIER_SQL))


def test_min_cost_supplier_absent_region(ray_session):
    out = __import__("rdf_n3_ray.pipelines.relational",
                     fromlist=["min_cost_supplier"]).min_cost_supplier(
        "/root/testdata/sf0.01", region="ATLANTIS")
    assert len(out) == 0
    assert list(out.columns) == ["s_acctbal", "s_name", "n_name",
                                 "p_partkey"]


def test_product_type_profit_matches_oracle(ray_session):
    """TPC-H Q9 shape: name-filtered part semi-join + supplier nation
    attach (gated broadcast), orderkey bucket join for the year."""
    from rdf_n3_ray.pipelines.relational import (
        PRODUCT_TYPE_PROFIT_SQL, product_type_profit)

    out = product_type_profit("/root/testdata/sf0.01")
    _assert_oracle_equal(out, _duckdb_oracle(PRODUCT_TYPE_PROFIT_SQL))


def test_product_type_profit_distributed_path(ray_session):
    """Gate forced to 0: the partkey/suppkey bucket-join fallback must
    produce the identical (nation, year) profit rows."""
    from rdf_n3_ray.pipelines.relational import (
        PRODUCT_TYPE_PROFIT_SQL, product_type_profit)

    out = product_type_profit("/root/testdata/sf0.01",
                              dim_broadcast_limit=0)
    _assert_oracle_equal(out, _duckdb_oracle(PRODUCT_TYPE_PROFIT_SQL))


def test_important_part_value_matches_oracle(ray_session):
    """TPC-H Q11 shape: grouped sum filtered against a fraction of the
    global sum, exact integer threshold (value_c * denom > total_c)."""
    from rdf_n3_ray.pipelines.relational import (
        IMPORTANT_PART_VALUE_SQL, important_part_value)

    out = important_part_value("/root/testdata/sf0.01")
    assert len(out) > 0
    # every returned part strictly exceeds its share of the total
    _assert_oracle_equal(out, _duckdb_oracle(IMPORTANT_PART_VALUE_SQL))


def test_supplier_part_counts_matches_oracle(ray_session):
    """TPC-H Q16 shape: distinct-supplier count per (brand, type, size)
    with the negative-balance supplier anti-join exclusion."""
    from rdf_n3_ray.pipelines.relational import (
        SUPPLIER_PART_COUNTS_SQL, supplier_part_counts)

    out = supplier_part_counts("/root/testdata/sf0.01")
    assert (out["p_brand"] != "Brand#5").all()
    _assert_oracle_equal(out, _duckdb_oracle(SUPPLIER_PART_COUNTS_SQL))


def test_top_part_shippers_matches_oracle(ray_session):
    """TPC-H Q20 shape: part-name semi-join -> windowed per-supplier
    quantity sum -> threshold -> qualified-key supplier re-scan."""
    from rdf_n3_ray.pipelines.relational import (
        TOP_PART_SHIPPERS_SQL, top_part_shippers)

    out = top_part_shippers("/root/testdata/sf0.01")
    assert (out["total_qty"] > 200.0).all()
    _assert_oracle_equal(out, _duckdb_oracle(TOP_PART_SHIPPERS_SQL))


def test_top_part_shippers_no_qualifiers(ray_session):
    from rdf_n3_ray.pipelines.relational import top_part_shippers

    out = top_part_shippers("/root/testdata/sf0.01", min_qty=1e12)
    assert len(out) == 0
    assert list(out.columns) == ["s_name", "n_name", "total_qty"]


def test_supplier_part_counts_empty_exclusion_set(ray_session):
    """sf0.001 has no negative-balance suppliers: the all-empty
    exclusion collect must keep its schema (_fold_pd guard)."""
    from rdf_n3_ray.pipelines.relational import supplier_part_counts

    out = supplier_part_counts("/root/testdata/sf0.001")
    assert len(out) > 0 and out["supplier_cnt"].min() >= 1


def test_product_type_profit_no_matching_parts(ray_session):
    from rdf_n3_ray.pipelines.relational import product_type_profit

    out = product_type_profit("/root/testdata/sf0.001",
                              name_prefix="zzz-nope")
    assert len(out) == 0
    assert list(out.columns) == ["n_name", "o_year", "profit"]


def test_top_part_shippers_no_matching_parts(ray_session):
    from rdf_n3_ray.pipelines.relational import top_part_shippers

    out = top_part_shippers("/root/testdata/sf0.001",
                            name_prefix="zzz-nope")
    assert len(out) == 0
    assert list(out.columns) == ["s_name", "n_name", "total_qty"]


def test_simhash_pairs_matches_oracle(ray_session):
    """Hamming-ball pairs via 4-band pigeonhole buckets == brute-force
    bit_count(xor) <= 1 over the bit-identical simhash recompute."""
    from rdf_n3_ray.pipelines.relational import (
        SIMHASH_PAIRS_SQL, simhash_pairs)

    out = simhash_pairs("/root/testdata/sf0.01").to_pandas()
    assert (out["a"] < out["b"]).all()
    assert not out.duplicated(["a", "b"]).any()
    _assert_oracle_equal(out, _duckdb_oracle(SIMHASH_PAIRS_SQL))


def test_simhash_pairs_recall_guarantee_bound(ray_session):
    """4 bands guarantee complete recall only to Hamming distance 3."""
    import pytest

    from rdf_n3_ray.stages.neardup import simhash_pairs_dataset

    with pytest.raises(ValueError):
        import ray.data as rd

        simhash_pairs_dataset(
            rd.from_items([{"doc_id": 1, "text": "x"}]), max_ham=4)


def test_simhash_pairs_ham3_complete(ray_session, tmp_path):
    """max_ham=3 (the guarantee boundary) on a crafted corpus: docs
    whose fingerprints differ in exactly 0..5 word-substitutions —
    every <=3 pair found, nothing above unless simhash says so."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import simhash_pairs
    from rdf_n3_ray.stages.neardup import simhash_batch

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    texts = [base] + [
        base.replace("alpha", f"sub{i}") for i in range(4)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = simhash_pairs(str(tmp_path), max_ham=3).to_pandas()

    sh = simhash_batch(pd.DataFrame({"doc_id": range(len(texts)),
                                     "text": texts}))
    fp = dict(zip(sh["doc_id"], sh["simhash"]))
    expect = {(a, b) for a in fp for b in fp if a < b
              and bin(fp[a] ^ fp[b]).count("1") <= 3}
    assert set(zip(out["a"], out["b"])) == expect


def test_knn_graph_matches_oracle(ray_session):
    """Exact kNN graph: every vec gets k=3 neighbors; parity with the
    DOUBLE-cast DuckDB self-join (float32 list_cosine_similarity would
    flip ROUND(.,4) on observed edges — see KNN_GRAPH_SQL comment)."""
    from rdf_n3_ray.pipelines.relational import KNN_GRAPH_SQL, knn_graph

    out = knn_graph("/root/testdata/sf0.01")
    # 500 vectors x 3 neighbors, none pointing at itself
    assert len(out) == 1500
    assert (out["src"] != out["dst"]).all()
    assert out.groupby("src").size().eq(3).all()
    _assert_oracle_equal(out, _duckdb_oracle(KNN_GRAPH_SQL))


def test_knn_graph_stage_tiebreak_and_self_mask(ray_session):
    """Duplicate vectors tie at sim=1.0: the lexsort tie-break must
    pick the smaller vec_id, and the self-row is excluded by id."""
    import ray.data as rd

    from rdf_n3_ray.stages.ann import knn_graph as knn_stage

    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[1.0, 0.0], [1.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
            pa.list_(pa.float32())),
    })
    out = (knn_stage(rd.from_arrow(tbl), k=2, concurrency=(1, 2))
           .to_pandas().sort_values(["src", "dst"]))
    by_src = {s: sorted(g["dst"]) for s, g in out.groupby("src")}
    # 0,1,2 are identical: each picks the two OTHER dups (smaller ids
    # first under ties), never itself; 3 is orthogonal to everyone.
    assert by_src[0] == [1, 2]
    assert by_src[1] == [0, 2]
    assert by_src[2] == [0, 1]
    assert by_src[3] == [0, 1]  # all sims 0, id-ascending tie-break


def test_rolling_active_users_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        ROLLING_ACTIVE_USERS_SQL, rolling_active_users)

    out = rolling_active_users("/root/testdata/sf0.01")
    assert (out["active_users"] > 0).all()
    # trailing-window counts are >= the single-day distinct count
    _assert_oracle_equal(out, _duckdb_oracle(ROLLING_ACTIVE_USERS_SQL))


def test_rolling_active_users_window_semantics(ray_session, tmp_path):
    """A user active once counts toward the next 6 days' windows —
    but only window-end days that actually occur in the data appear."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import rolling_active_users

    ts = pd.to_datetime([
        "2024-01-01 12:00",              # u1
        "2024-01-05 01:00",              # u2: 4 days later (in u1's window)
        "2024-01-20 09:00",              # u3: far away
    ])
    tbl = pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["view"] * 3),
        "value": pa.array([1.0] * 3),
        "props": pa.array(["{}"] * 3),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = rolling_active_users(str(tmp_path))
    got = {str(d)[:10]: int(n) for d, n in
           zip(out["day"], out["active_users"])}
    # only the 3 real event days are reported; Jan 5's trailing week
    # includes Jan 1, so both users count there
    assert got == {"2024-01-01": 1, "2024-01-05": 2, "2024-01-20": 1}


def test_event_quantile_buckets_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        EVENT_QUANTILE_BUCKETS_SQL, event_quantile_buckets)

    out = event_quantile_buckets("/root/testdata/sf0.01")
    assert set(out["bucket"]) <= {1, 2, 3, 4}
    # buckets are global: per-type totals must sum to the type counts
    _assert_oracle_equal(out, _duckdb_oracle(EVENT_QUANTILE_BUCKETS_SQL))


def test_event_quantile_buckets_boundary_rule(ray_session, tmp_path):
    """Values exactly AT a boundary stay in the lower bucket (rank-free
    `> boundary` rule, not NTILE's row-order tie lottery)."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import event_quantile_buckets

    vals = [1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 4.0, 4.0]
    tbl = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 8),
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 8, pa.int64()),
        "event_type": pa.array(["view"] * 8),
        "value": pa.array(vals),
        "props": pa.array(["{}"] * 8),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = event_quantile_buckets(str(tmp_path))
    # quantile_disc ranks max(1, ceil(q*8)) = 2, 4, 6 -> boundaries
    # q1=1.0, q2=2.0, q3=3.0; the boundary VALUES stay in the lower
    # bucket (`<= q`), so every value lands deterministically
    got = dict(zip(out["bucket"], out["n"]))
    assert got == {1: 2, 2: 2, 3: 2, 4: 2}


def test_source_token_gini_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        SOURCE_TOKEN_GINI_SQL, source_token_gini)

    out = source_token_gini("/root/testdata/sf0.01")
    assert (out["gini_milli"] >= 0).all()
    assert (out["gini_milli"] < 1000).all()
    _assert_oracle_equal(out, _duckdb_oracle(SOURCE_TOKEN_GINI_SQL))


def test_source_token_gini_extremes(ray_session, tmp_path):
    """Equal docs -> Gini 0; one doc holding ~everything -> high Gini.
    Exact rank-sum formula on the integer histogram."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import source_token_gini

    texts = (["one two three"] * 4                       # eq: 3 tokens each
             + ["a"] * 4 + [" ".join(["w"] * 996)])      # uneq: 4x1 + 996
    tbl = pa.table({
        "doc_id": pa.array(range(9), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 9),
        "source": pa.array(["eq"] * 4 + ["uneq"] * 5),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = source_token_gini(str(tmp_path))
    got = dict(zip(out["source"], out["gini_milli"]))
    assert got["eq"] == 0
    # exact: n=5, s0=1000, s1=1*1+2*1+3*1+4*1+5*996=4990
    # G = (2*4990 - 6*1000) / (5*1000) = 3980/5000 -> 796 milli
    assert got["uneq"] == 796


def test_label_centroids_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        LABEL_CENTROIDS_SQL, label_centroids)

    out = label_centroids("/root/testdata/sf0.01")
    # one row per (label, dim); dims 1-based and complete
    assert out.groupby("label")["dim"].agg(["min", "max"]).eq(
        [1, 64]).all().all()
    _assert_oracle_equal(out, _duckdb_oracle(LABEL_CENTROIDS_SQL))


def test_session_duration_percentiles_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        SESSION_DURATION_PERCENTILES_SQL, session_duration_percentiles)

    out = session_duration_percentiles("/root/testdata/sf0.01")
    assert list(out["q"]) == [0.5, 0.9, 0.99]
    assert out["duration_us"].is_monotonic_increasing
    _assert_oracle_equal(out,
                         _duckdb_oracle(SESSION_DURATION_PERCENTILES_SQL))


def test_doc_ttr_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import DOC_TTR_SQL, doc_ttr

    out = doc_ttr("/root/testdata/sf0.01").to_pandas()
    assert (out["n_distinct"] <= out["n_tokens"]).all()
    assert (out["ttr_milli"] <= 1000).all()
    _assert_oracle_equal(out, _duckdb_oracle(DOC_TTR_SQL))


def test_doc_ttr_empty_and_dup_tokens(ray_session, tmp_path):
    """Empty doc -> 0/0/0; all-repeated doc -> exact floor milli."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import doc_ttr

    texts = ["", "a a a", "x y z", "The the THE"]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = doc_ttr(str(tmp_path)).to_pandas()
    got = {d: (t, u, m) for d, t, u, m in zip(
        out["doc_id"], out["n_tokens"], out["n_distinct"],
        out["ttr_milli"])}
    assert got == {0: (0, 0, 0), 1: (3, 1, 333), 2: (3, 3, 1000),
                   3: (3, 1, 333)}  # lowercased dedup


def test_heavy_hitter_tokens_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        HEAVY_HITTER_TOKENS_SQL, heavy_hitter_tokens)

    out = heavy_hitter_tokens("/root/testdata/sf0.01")
    assert len(out) > 0
    _assert_oracle_equal(out, _duckdb_oracle(HEAVY_HITTER_TOKENS_SQL))


def test_heavy_hitter_sketch_guarantee(ray_session, tmp_path):
    """Tiny capacity (k=3) on an adversarial stream: the MG summary
    must still surface every token above N/(k+1), and the recount+
    threshold output is exact — the sketch proposes, the recount
    decides."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import heavy_hitter_tokens

    # 100 'a', 60 'b', and 140 distinct rare tokens: N=300, N/(k+1)=75
    texts = (["a " * 10] * 10 + ["b " * 6] * 10
             + [" ".join(f"r{i}_{j}" for j in range(14))
                for i in range(10)])
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = heavy_hitter_tokens(str(tmp_path), k=3)
    got = dict(zip(out["token"], out["n"]))
    assert got == {"a": 100}  # only freq > 300/4 = 75 qualifies


def test_event_mad_by_type_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        EVENT_MAD_BY_TYPE_SQL, event_mad_by_type)

    out = event_mad_by_type("/root/testdata/sf0.01")
    assert (out["mad"] >= 0).all()
    _assert_oracle_equal(out, _duckdb_oracle(EVENT_MAD_BY_TYPE_SQL))


def test_user_gap_percentiles_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        USER_GAP_PERCENTILES_SQL, user_gap_percentiles)

    out = user_gap_percentiles("/root/testdata/sf0.01")
    assert list(out["q"]) == [0.5, 0.9, 0.99]
    assert (out["gap_us"] >= 0).all()
    _assert_oracle_equal(out, _duckdb_oracle(USER_GAP_PERCENTILES_SQL))


def test_knn_label_accuracy_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        KNN_LABEL_ACCURACY_SQL, knn_label_accuracy)

    out = knn_label_accuracy("/root/testdata/sf0.01")
    assert (out["n_correct"] <= out["n"]).all()
    assert int(out["n"].sum()) == 500  # every vector gets one vote
    _assert_oracle_equal(out, _duckdb_oracle(KNN_LABEL_ACCURACY_SQL))


def test_knn_label_vote_tiebreak(ray_session, tmp_path):
    """1-1 vote splits (k=3 with a duplicate label pair) resolve to the
    SMALLEST label on both engines."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import knn_label_accuracy

    # vec 0 at origin-ish; neighbors: two label-7 dups and one label-2;
    # majority 7 wins.  vec 4 equidistant from one 5 and one 9 with
    # k=1... keep k=3 semantics: craft 4 vectors where votes tie 1-1-1
    # -> smallest label wins.
    emb = [[1.0, 0.0, 0.0], [0.9, 0.1, 0.0], [0.9, -0.1, 0.0],
           [0.8, 0.0, 0.1]]
    tbl = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array(emb, pa.list_(pa.float32())),
        "label": pa.array([4, 7, 2, 9], pa.int32()),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = knn_label_accuracy(str(tmp_path))
    # every vec's 3 neighbors are the other 3 vectors -> votes are
    # 1-1-1 -> winner = smallest neighbor label
    got = dict(zip(out["label"], zip(out["n"], out["n_correct"])))
    # vec0(l4): min(7,2,9)=2 wrong; vec1(l7): min(4,2,9)=2 wrong;
    # vec2(l2): min(4,7,9)=4 wrong; vec3(l9): min(4,7,2)=2 wrong
    assert got == {4: (1, 0), 7: (1, 0), 2: (1, 0), 9: (1, 0)}


def test_late_event_audit_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        LATE_EVENT_AUDIT_SQL, late_event_audit)

    out = late_event_audit("/root/testdata/sf0.01")
    assert (out["n_late"] <= out["n"]).all()
    _assert_oracle_equal(out, _duckdb_oracle(LATE_EVENT_AUDIT_SQL))


def test_late_event_audit_out_of_order(ray_session, tmp_path):
    """Out-of-order arrivals past the allowed lateness are flagged; the
    watermark carries ACROSS range boundaries (seeded cummax), and
    in-order or within-lateness events are not flagged."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import late_event_audit

    base = pd.Timestamp("2024-01-01 00:00:00")
    # arrival order (event_id): t=0h, t=5h, t=1h (4h late > 1h allowed),
    # t=4.5h (0.5h late, within lateness), t=6h (on time)
    offs_h = [0.0, 5.0, 1.0, 4.5, 6.0]
    ts = [base + pd.Timedelta(hours=h) for h in offs_h]
    tbl = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(pd.to_datetime(ts), pa.timestamp("us")),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array([1.0] * 5),
        "props": pa.array(["{}"] * 5),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    # num_ranges > rows forces 1-row ranges: every watermark hand-off
    # crosses a range boundary, exercising the seeded prefix max
    out = late_event_audit(str(tmp_path), lateness_s=3600, num_ranges=8)
    got = {int(w): (int(n), int(l)) for w, n, l in
           zip(out["window_start_s"], out["n"], out["n_late"])}
    e = int(base.timestamp())
    assert got == {e: (1, 0),                 # t=0h
                   e + 5 * 3600: (1, 0),      # t=5h (new high water)
                   e + 1 * 3600: (1, 1),      # t=1h — 4h late: flagged
                   e + 4 * 3600: (1, 0),      # t=4.5h — within 1h
                   e + 6 * 3600: (1, 0)}      # t=6h


def test_dedup_normalized_docs_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        DEDUP_NORMALIZED_SQL, dedup_normalized_docs)

    out = dedup_normalized_docs("/root/testdata/sf0.01").to_pandas()
    _assert_oracle_equal(out, _duckdb_oracle(DEDUP_NORMALIZED_SQL))


def test_dedup_normalized_catches_case_and_ws(ray_session, tmp_path):
    """Case and whitespace variants collapse to the min doc_id; a
    genuinely different doc survives."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import dedup_normalized_docs

    texts = ["Hello  World", "hello world", "hello\tworld\n",
             " HELLO WORLD ", "different doc"]
    tbl = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = dedup_normalized_docs(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]


def test_events_heatmap_matches_oracle(ray_session):
    from rdf_n3_ray.pipelines.relational import (
        EVENTS_HEATMAP_SQL, events_heatmap)

    out = events_heatmap("/root/testdata/sf0.01")
    assert out["dow"].between(0, 6).all()
    assert out["hour"].between(0, 23).all()
    _assert_oracle_equal(out, _duckdb_oracle(EVENTS_HEATMAP_SQL))


def test_dedup_normalized_space_only_strip(ray_session, tmp_path):
    """Trailing \\x0b is NOT stripped (space-only trim parity with the
    oracle's trim(..., ' ')) — the doc stays distinct."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import (
        DEDUP_NORMALIZED_SQL, dedup_normalized_docs)

    texts = ["hello", "hello\x0b", "hello "]
    tbl = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = dedup_normalized_docs(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(DEDUP_NORMALIZED_SQL).fetchdf()
    assert sorted(out["doc_id"]) == sorted(oracle["doc_id"]) == [0, 1]


def test_late_event_audit_pre_epoch_and_empty(ray_session, tmp_path):
    """Pre-1970 timestamps window via TRUNCATING division (DuckDB //
    parity), and a zero-row table returns an empty frame."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import (
        LATE_EVENT_AUDIT_SQL, late_event_audit)

    ts = pd.to_datetime(["1969-12-31 23:30:00", "1970-01-01 00:30:00"])
    tbl = pa.table({
        "event_id": pa.array(range(2), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["view"] * 2),
        "value": pa.array([1.0] * 2),
        "props": pa.array(["{}"] * 2),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = late_event_audit(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    oracle = con.execute(LATE_EVENT_AUDIT_SQL).fetchdf()
    # both events truncate into window 0 (numpy floor would put the
    # pre-epoch one at -3600), grouped to a single n=2 row
    assert list(out["window_start_s"]) == \
        [int(v) for v in oracle["window_start_s"]] == [0]
    assert int(out["n"].iloc[0]) == int(oracle["n"].iloc[0]) == 2

    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "user_id": pa.array([], pa.int64()),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
        "props": pa.array([], pa.string()),
    })
    pq.write_table(empty, str(tmp_path / "events.parquet"))
    out = late_event_audit(str(tmp_path))
    assert len(out) == 0


def test_user_gap_percentiles_degenerate_null_rows(ray_session,
                                                   tmp_path):
    """Every user has one event -> no gaps -> three (q, NULL) rows,
    matching the oracle's quantile_disc-over-empty expansion."""
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import user_gap_percentiles

    tbl = pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01"] * 3),
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 3], pa.int64()),
        "event_type": pa.array(["view"] * 3),
        "value": pa.array([1.0] * 3),
        "props": pa.array(["{}"] * 3),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = user_gap_percentiles(str(tmp_path))
    assert list(out["q"]) == [0.5, 0.9, 0.99]
    assert out["gap_us"].isna().all()
    # nullable Int64 NA, not float NaN: the oracle's column is BIGINT,
    # so the degenerate rows must stay integer-typed NULLs (ADVICE r4)
    assert str(out["gap_us"].dtype) == "Int64"


def test_events_heatmap_null_values_excluded(ray_session, tmp_path):
    """NULL event values drop from n AND sum_cents on both engines."""
    import duckdb
    import pyarrow.parquet as pq

    from rdf_n3_ray.pipelines.relational import (
        EVENTS_HEATMAP_SQL, events_heatmap)

    tbl = pa.table({
        "event_id": pa.array(range(3), pa.int64()),
        "ts": pa.array(pd.to_datetime(["2024-01-01 10:00"] * 3),
                       pa.timestamp("us")),
        "user_id": pa.array([1] * 3, pa.int64()),
        "event_type": pa.array(["view"] * 3),
        "value": pa.array([2.5, None, 1.5], pa.float64()),
        "props": pa.array(["{}"] * 3),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = events_heatmap(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    oracle = con.execute(EVENTS_HEATMAP_SQL).fetchdf()
    assert len(out) == len(oracle) == 1
    assert int(out["n"].iloc[0]) == int(oracle["n"].iloc[0]) == 2
    assert (int(out["sum_cents"].iloc[0])
            == int(oracle["sum_cents"].iloc[0]) == 400)


def test_round_half_away_matches_duckdb_round():
    """stages/rounding.round_half_away == DuckDB ROUND on boundary
    values where np.round (half-even) diverges (ADVICE r4)."""
    import duckdb

    from rdf_n3_ray.stages.rounding import round_half_away

    # 0.00005 and friends: representable floats near .5e-4 boundaries,
    # plus one-ulp-below-boundary values where floor(t+0.5) would
    # double-round up while std::round (DuckDB) stays down
    vals = [0.00005, 0.00015, -0.00005, -0.00015, 0.12345, -0.98765,
            1.5, 2.5, -1.5, -2.5, 0.0, 123.00025, -123.00025,
            4.9999999999999996e-05, -4.9999999999999996e-05,
            0.49999999999999994, -0.49999999999999994]
    ours4 = round_half_away(np.array(vals), 4)
    con = duckdb.connect()
    want4 = [con.execute("SELECT ROUND(?::DOUBLE, 4)", [v]).fetchone()[0]
             for v in vals]
    assert list(ours4) == want4
    ours0 = round_half_away(np.array(vals), 0)
    want0 = [con.execute("SELECT ROUND(?::DOUBLE, 0)", [v]).fetchone()[0]
             for v in vals]
    assert list(ours0) == want0
    # NaN propagates; pandas Series accepted
    assert np.isnan(round_half_away(pd.Series([np.nan]), 4))[0]


def test_ann_ivfpq_contract_equals_ann_pq(ray_session):
    """The ann_ivfpq contract entry runs IVF+PQ at nprobe ==
    n_clusters: every partition probed, so the composed
    coarse-prune+ADC path must reproduce ann_pq's ranking exactly
    (same codebooks, same queries, same tie-breaks) — the witness
    that the composition machinery loses nothing."""
    from rdf_n3_ray.pipelines.relational import ann_ivfpq, ann_pq

    a = ann_ivfpq("/root/testdata/sf0.001")
    b = ann_pq("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 20  # 4 queries x k=5


def test_reason_kb_path_million_edge_closure(ray_session, tmp_path):
    """KB-scale stress (VERDICT r4 item #4): transitive closure over a
    10^6-edge predicate-partitioned KB via the distributed semi-naive
    fixpoint.  250k disjoint 5-node chains x 4 edges = 1,000,000 base
    edges; the closure adds the distance-2/3/4 pairs = 6 per chain =
    1,500,000 inferred triples, converging in 3 delta iterations.

    Assertions: exact inferred count; the additions stay a DISTRIBUTED
    Dataset (only count() is consumed — no corpus-sized to_pandas);
    and driver max-RSS growth stays bounded by the seen-set machinery
    (hash arrays + plasma mappings), far below the ~90 MB of triple
    strings times the blowup a driver-side closure would hold (a
    measured 8-cpu run grows ~700 MB from plasma-mapped hash puts and
    transient lexsort merges; the bound below has headroom for CI
    contention but still rules out corpus-on-driver regressions)."""
    import resource
    import time

    import ray.data as rd

    from rdf_n3_ray.pipelines.reasoning import (
        reason_kb_path,
        write_kb_partitioned,
    )

    N_CHAINS, L = 250_000, 4

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        i = b["id"].to_numpy()
        chain = pd.Series(i // L).astype(str)
        pos = i % L
        return pd.DataFrame({
            "subj": "<c" + chain + "n" + pd.Series(pos).astype(str) + ">",
            "pred": "<p>",
            "obj": "<c" + chain + "n"
                   + pd.Series(pos + 1).astype(str) + ">",
        })

    ds = (rd.range(N_CHAINS * L, override_num_blocks=32)
          .map_batches(edges, batch_format="pandas"))
    out = str(tmp_path / "kb")
    write_kb_partitioned(ds, out)

    rules = [([("?x", "<p>", "?y"), ("?y", "<p>", "?z")],
              [("?x", "<p>", "?z")])]
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.time()
    adds, inferred = reason_kb_path(out, rules)
    elapsed = time.time() - t0
    rss_growth_mb = (resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                     - rss0) / 1024
    assert inferred == N_CHAINS * 6, inferred
    assert adds.count() == N_CHAINS * 6
    assert rss_growth_mb < 1500, f"driver RSS grew {rss_growth_mb:.0f} MB"
    # sanity spot-check one chain's closure without collecting the rest
    import pyarrow.compute as pc

    def pick(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("subj"), pa.scalar("<c7n0>")))

    got = sorted(r["obj"] for r in
                 adds.map_batches(pick, batch_format="pyarrow").take_all())
    assert got == ["<c7n2>", "<c7n3>", "<c7n4>"]
    print(f"million-edge closure: {elapsed:.1f}s, "
          f"driver +{rss_growth_mb:.0f} MB")


def test_fingerprints_distinct_on_embedded_nul():
    """fp_exact/fp_norm are identity columns: binary-ish documents
    sharing a prefix up to an embedded NUL must NOT collapse to one
    fingerprint (the default pandas hasher truncates at NUL; see
    stages/keys.py)."""
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["abc\x00one", "abc\x00two", "abc"]})
    out = fingerprints(df)
    assert out["fp_exact"].nunique() == 3
    assert out["fp_norm"].nunique() == 3
