"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container,
so the decode kernels are STUBBED (clearly marked below) behind a
deterministic fake; everything Ray-side — schema, actor-pool signature,
batch sizing for large binary rows, output layout — is real and tested.

Design rules for 100 TB binary data (build brief + ray_guide):
- payloads stay `binary` Arrow columns; stages run batch_format="pyarrow"
  (binary columns don't round-trip pandas cleanly)
- small batch_size (large rows): batch bytes × concurrency must fit the
  worker heap; callers size via `suggest_batch_size`
- decode/feature stages are actor pools: codec/model init once per actor
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),       # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),       # typed metadata (nullable)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def suggest_batch_size(avg_payload_bytes: int, worker_heap_bytes: int = 2 << 30,
                       concurrency: int = 4, safety: float = 8.0) -> int:
    """batch_size so batch × concurrency × safety fits the heap."""
    per_batch = worker_heap_bytes / (concurrency * safety)
    return max(1, int(per_batch // max(1, avg_payload_bytes)))


def synthetic_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=256 + (i % 7) * 128, dtype=np.uint8).tobytes() for i in range(n)],
        "mime": ["image/png" if i % 3 == 0 else "audio/wav" if i % 3 == 1 else "video/mp4" for i in range(n)],
        "width": [64 + (i % 4) * 32 if i % 3 == 0 else None for i in range(n)],
        "height": [64 + (i % 5) * 32 if i % 3 == 0 else None for i in range(n)],
        "duration_ms": [None if i % 3 == 0 else 1000 + i * 10 for i in range(n)],
    }
    return pa.table(rows, schema=MEDIA_SCHEMA)


class DecodeImage:
    """Actor-pool image decode stage.

    Uses PIL when importable (resolved ONCE per actor in __init__, not
    per batch); a payload PIL cannot decode — and every payload when
    PIL is absent, as in this container — falls back to a deterministic
    fake that derives pixel stats from a payload hash, so outputs stay
    stable and testable without codecs.
    """

    def __init__(self, target_size: tuple[int, int] = (32, 32)):
        self.target_size = target_size  # "model" config loaded once per actor
        try:
            from PIL import Image  # optional: not in this container

            self._pil_image = Image
        except ImportError:
            self._pil_image = None

    def _decode(self, payload: bytes) -> np.ndarray:
        if self._pil_image is not None:
            import io

            try:
                img = self._pil_image.open(io.BytesIO(payload))
                img = img.convert("RGB").resize(self.target_size)
                return np.asarray(img, dtype=np.uint8)
            except Exception:
                pass  # undecodable payload -> deterministic fallback
        # --- deterministic fallback (no image codec / bad payload) ----
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        w, ht = self.target_size
        return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        means, stds = [], []
        for p in payloads:
            img = self._decode(p)
            means.append(float(img.mean()))
            stds.append(float(img.std()))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "pix_mean": pa.array(means, pa.float32()),
                "pix_std": pa.array(stds, pa.float32()),
            }
        )


class FrameSample:
    """Actor-pool video frame-sampling stage (STUB decode; real Ray
    plumbing).  Emits one row per sampled frame — output rows >> input
    rows, which map_batches supports."""

    def __init__(self, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dur_col = batch.column("duration_ms")
        mask = pc.and_kleene(
            pc.equal(batch.column("kind"), "video"),
            pc.greater(pc.coalesce(dur_col, pa.scalar(0, dur_col.type)), 0))
        vid = batch.filter(mask)
        if vid.num_rows == 0:
            return pa.table({"media_id": pa.array([], pa.int64()),
                             "frame_idx": pa.array([], pa.int32()),
                             "ts_ms": pa.array([], pa.int32())})
        dur = (vid.column("duration_ms").to_numpy(zero_copy_only=False)
               .astype(np.float64))
        n = np.maximum(1, (dur / 1000.0 * self.fps).astype(np.int64))
        mids = np.repeat(
            vid.column("media_id").to_numpy(zero_copy_only=False), n)
        # concat of per-row arange(n_i): global arange minus repeated
        # row offsets
        offsets = np.concatenate(([0], np.cumsum(n)[:-1]))
        fi = np.arange(int(n.sum()), dtype=np.int64) - np.repeat(offsets, n)
        ts = (fi * 1000 / self.fps).astype(np.int64)
        return pa.table(
            {
                "media_id": pa.array(mids, pa.int64()),
                "frame_idx": pa.array(fi.astype(np.int32), pa.int32()),
                "ts_ms": pa.array(ts.astype(np.int32), pa.int32()),
            }
        )


class AudioWindows:
    """Actor-pool audio windowing stage (STUB decode; real plumbing):
    payload bytes -> waveform -> fixed-length analysis windows with
    per-window RMS energy and zero-crossing counts, one output row per
    window (rows >> input rows, like FrameSample).

    Decode is a clearly-marked deterministic stub — no audio codecs
    ship in this container (the reference has no audio either; this is
    the brief's training-data modality plumbing).  A real deployment
    replaces `_decode` with soundfile/librosa resolved once per actor
    in __init__; the windowing math below is the real, vectorized
    product: window/hop arithmetic from duration + sample rate, strided
    RMS/ZCR without a Python loop over samples."""

    SAMPLE_RATE = 8_000  # stub decode rate; a real decoder reports its own

    def __init__(self, window_ms: int = 200, max_windows: int = 64):
        self.window = int(self.SAMPLE_RATE * window_ms / 1000)
        self.max_windows = max_windows

    def _decode(self, payload: bytes, duration_ms: int) -> np.ndarray:
        # STUB: derive a deterministic waveform from the payload hash —
        # stable across retries/repartitions, testable without codecs
        h = hashlib.blake2b(payload, digest_size=16).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
        n = max(self.window, int(self.SAMPLE_RATE * duration_ms / 1000))
        return (rng.standard_normal(n) *
                np.sin(np.linspace(0, 20 * np.pi, n))).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dur_col = batch.column("duration_ms")
        mask = pc.and_kleene(
            pc.equal(batch.column("kind"), "audio"),
            pc.greater(pc.coalesce(dur_col, pa.scalar(0, dur_col.type)), 0))
        aud = batch.filter(mask)
        mids, widx, rms, zcr = [], [], [], []
        for mid, payload, dur in zip(
                aud.column("media_id").to_pylist(),
                aud.column("payload").to_pylist(),
                aud.column("duration_ms").to_pylist()):
            wave = self._decode(payload, int(dur))
            w = self.window
            k = min(self.max_windows, len(wave) // w)
            if k == 0:
                continue
            frames = wave[: k * w].reshape(k, w)  # zero-copy view
            mids.extend([mid] * k)
            widx.extend(range(k))
            rms.extend(np.sqrt((frames ** 2).mean(axis=1)).tolist())
            zcr.extend((np.abs(np.diff(np.signbit(frames),
                                       axis=1)).sum(axis=1)).tolist())
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "window_idx": pa.array(widx, pa.int32()),
            "rms": pa.array(np.asarray(rms, np.float32), pa.float32()),
            "zero_crossings": pa.array(np.asarray(zcr, np.int32),
                                       pa.int32()),
        })


def audio_windows(media_ds, concurrency: int = 2, batch_size: int = 8):
    """media table -> per-window audio features (AudioWindows pool)."""
    return media_ds.map_batches(
        AudioWindows, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency))


def decode_pipeline(media_ds, concurrency: int = 2, batch_size: int = 8):
    """media table -> per-image features + per-video frame rows."""
    try:
        nb = media_ds.num_blocks()  # only known for materialized inputs
    except NotImplementedError:
        nb = None  # lazy reads parallelize on their own
    if nb is not None and nb < concurrency:
        # a single input block starves the actor pool; split so every
        # actor gets work (binary payloads: keep blocks small anyway)
        media_ds = media_ds.repartition(concurrency * 2)
    # Arrow-native predicate (vectorized pc mask, fuses with the read) —
    # a per-row filter(lambda) here was the brief's named anti-pattern
    import pyarrow.compute as pc

    images = media_ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow")
    features = images.map_batches(
        DecodeImage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),  # elastic: fixed pools equal to
        # the session CPU count deadlock small sessions
    )
    frames = media_ds.map_batches(
        FrameSample, batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )
    return features, frames
