"""Multimodal columns: opaque binary payloads + typed metadata, processed by
actor-pool map_batches stages (decode / resize / feature-extract /
frame-sample).

Real image/audio codecs are not in this container: ``decode_payload`` handles
the deterministic synthetic ``FAKEIMG``/``FAKEVID`` container for real, and
gates genuine formats behind an import-try that raises NotImplementedError —
the Ray-side plumbing (schema, batch sizing, actor signature, output layout)
is real and tested either way.

Synthetic container formats (little-endian):
  FAKEIMG: b"FAKEIMG0" + uint16 h + uint16 w + h*w grayscale bytes
  FAKEVID: b"FAKEVID0" + uint16 n_frames + uint16 h + uint16 w
           + n*h*w grayscale bytes
  FAKEAUD: b"FAKEAUD0" + uint32 n_samples + uint16 sample_rate
           + n int16 samples
"""

from __future__ import annotations

from ..util import pool_size as _pool

import struct

import numpy as np
import pyarrow as pa

IMG_MAGIC = b"FAKEIMG0"
VID_MAGIC = b"FAKEVID0"
AUD_MAGIC = b"FAKEAUD0"

MEDIA_SCHEMA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),            # "image" | "video" | "audio"
    pa.field("payload", pa.large_binary()),   # opaque container bytes
    pa.field("width", pa.int32()),            # typed metadata
    pa.field("height", pa.int32()),
    pa.field("n_frames", pa.int32()),
    pa.field("n_samples", pa.int32()),        # audio-only (0 otherwise)
    pa.field("sample_rate", pa.int32()),
])


def encode_image(arr: np.ndarray) -> bytes:
    h, w = arr.shape
    return IMG_MAGIC + struct.pack("<HH", h, w) + arr.astype(np.uint8).tobytes()


def encode_video(frames: np.ndarray) -> bytes:
    n, h, w = frames.shape
    return VID_MAGIC + struct.pack("<HHH", n, h, w) + frames.astype(np.uint8).tobytes()


def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    n = len(samples)
    return AUD_MAGIC + struct.pack("<IH", n, sample_rate) + \
        samples.astype("<i2").tobytes()


def decode_payload(payload: bytes) -> np.ndarray:
    """-> (h, w) image, (n, h, w) video, or 1-D int16 audio waveform.
    Synthetic containers decode natively; real formats need codecs that
    aren't installed here."""
    if payload.startswith(AUD_MAGIC):
        n, _rate = struct.unpack_from("<IH", payload, len(AUD_MAGIC))
        off = len(AUD_MAGIC) + 6
        return np.frombuffer(payload, "<i2", n, off)
    if payload.startswith(IMG_MAGIC):
        h, w = struct.unpack_from("<HH", payload, len(IMG_MAGIC))
        off = len(IMG_MAGIC) + 4
        return np.frombuffer(payload, np.uint8, h * w, off).reshape(h, w)
    if payload.startswith(VID_MAGIC):
        n, h, w = struct.unpack_from("<HHH", payload, len(VID_MAGIC))
        off = len(VID_MAGIC) + 6
        return np.frombuffer(payload, np.uint8, n * h * w, off).reshape(n, h, w)
    try:
        import PIL.Image  # noqa: F401  (absent in this container)
    except ImportError:
        raise NotImplementedError(
            "real image codecs unavailable; only FAKEIMG/FAKEVID containers "
            "decode in this environment") from None
    raise NotImplementedError("unsupported container")


def media_rows_batch(docs: pa.Table) -> pa.Table:
    """documents batch (doc_id, text) -> media batch: payload bytes are the
    doc's utf-8 text tiled into an h×w grid (h, w from doc_id), so every
    derived feature is a pure function of the inputs. Runs INSIDE
    map_batches — the media table is derived distributedly, never built on
    the driver (payload encoding is inherently per-row numpy)."""
    ids, kinds, payloads, ws, hs, nf = [], [], [], [], [], []
    nsamp, srate = [], []
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        h = 16 + (doc_id % 7) * 8
        w = 16 + (doc_id % 5) * 8
        raw = np.frombuffer((text or " ").encode("utf-8"), np.uint8)
        if doc_id % 10 == 0:   # every 10th is a "video" of 4 frames
            n_frames = 4
            need = n_frames * h * w
            px = np.resize(raw, need).reshape(n_frames, h, w)
            payloads.append(encode_video(px))
            kinds.append("video")
            nf.append(n_frames)
            nsamp.append(0)
            srate.append(0)
        elif doc_id % 10 == 5:  # every 10th (offset 5) is an audio clip
            n = 2048 + (doc_id % 4) * 1024
            rate = 8000 + (doc_id % 3) * 4000
            wave = (np.resize(raw, n).astype(np.int16) - 128) * 256
            payloads.append(encode_audio(wave, rate))
            kinds.append("audio")
            nf.append(0)
            nsamp.append(n)
            srate.append(rate)
        else:
            px = np.resize(raw, h * w).reshape(h, w)
            payloads.append(encode_image(px))
            kinds.append("image")
            nf.append(1)
            nsamp.append(0)
            srate.append(0)
        ids.append(doc_id)
        hs.append(h)
        ws.append(w)
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "n_frames": pa.array(nf, pa.int32()),
        "n_samples": pa.array(nsamp, pa.int32()),
        "sample_rate": pa.array(srate, pa.int32()),
    })


def synth_media_ds(sf_dir: str, n: int | None = None):
    """Lazy Dataset of synthetic media rows (distributed derivation)."""
    import ray.data as rd

    from ..util import default_num_blocks

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"],
                         override_num_blocks=default_num_blocks())
    if n is not None:
        ds = ds.limit(n)
    return ds.map_batches(media_rows_batch, batch_format="pyarrow")


def synth_media_table(sf_dir: str, n: int | None = None) -> pa.Table:
    """Eager single-process variant for tests (same derivation fn)."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    if n is not None:
        docs = docs.slice(0, n)
    return media_rows_batch(docs)


class ImageFeatureStage:
    """Actor-pool stage: decode -> 8x8 mean-pool resize -> feature vector
    (mean, std, 16-bin histogram). Videos are frame-sampled (every 2nd
    frame) and features averaged over sampled frames. Audio waveforms are
    decimated (the resample analog), framed into 256-sample windows, and
    summarized as [rms mean, rms std, zero-crossing rate] + an 8-bin
    normalized energy histogram.

    Large binary payloads => callers should use a small batch_size; the
    stage itself is per-row numpy (decode is inherently per-payload)."""

    def __init__(self, pool: int = 8, frame_step: int = 2,
                 decimate: int = 2, win: int = 256):
        self.pool = pool
        self.frame_step = frame_step
        self.decimate = decimate
        self.win = win

    def _audio_features(self, wave: np.ndarray) -> np.ndarray:
        w = wave[::self.decimate].astype(np.float64)
        if len(w) == 0:  # empty clip: defined zero vector, not NaN stats
            return np.zeros(3 + 8)
        n = (len(w) // self.win) * self.win
        frames = w[:n].reshape(-1, self.win) if n else w.reshape(1, -1)
        rms = np.sqrt((frames ** 2).mean(axis=1))
        zcr = float((np.signbit(w[1:]) != np.signbit(w[:-1])).mean()) \
            if len(w) > 1 else 0.0
        hist, _ = np.histogram(rms, bins=8,
                               range=(0.0, float(rms.max()) or 1.0))
        hist = hist / max(len(rms), 1)
        return np.concatenate(([rms.mean(), rms.std(), zcr], hist))

    def _features(self, img: np.ndarray) -> np.ndarray:
        p = self.pool
        h, w = img.shape
        ph, pw = h // p, w // p
        pooled = img[:ph * p, :pw * p].reshape(ph, p, pw, p).mean(axis=(1, 3))
        hist, _ = np.histogram(img, bins=16, range=(0, 256))
        hist = hist / max(img.size, 1)
        return np.concatenate(([img.mean(), img.std(), pooled.mean()], hist))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ids, kinds = [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            arr = decode_payload(payload)
            if arr.ndim == 3:  # video: frame-sample then average
                frames = arr[::self.frame_step]
                f = np.mean([self._features(fr) for fr in frames], axis=0)
            elif arr.ndim == 1:  # audio waveform
                f = self._audio_features(arr)
            else:
                f = self._features(arr)
            feats.append(f.astype(np.float32))
            ids.append(mid)
            kinds.append(kind)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "features": pa.array([list(map(float, f)) for f in feats],
                                 pa.list_(pa.float32())),
        })


def media_features(sf_dir: str, concurrency=None, batch_size: int = 64):
    """Dataset pipeline: synthetic media rows (derived inside map_batches)
    -> decoded feature vectors. Task pool + per-process stage cache (the
    stage state is a few ints — an actor pool's startup dominated this
    short decode; a REAL model-backed decoder would flip back to an actor
    pool with the model in __init__). Small batches for the large binary
    payloads."""
    from ..util import make_task_stage

    ds = synth_media_ds(sf_dir)
    return ds.map_batches(make_task_stage(ImageFeatureStage, ()),
                          batch_format="pyarrow", batch_size=batch_size)


class MediaFeatureStatStage(ImageFeatureStage):
    """Scalar twin of ImageFeatureStage for the driver oracle: decodes every
    payload for REAL and reports what the decode / frame-sample / waveform
    path actually saw — decoded element count, frames sampled, feature
    dimensionality. Each scalar is an arithmetic function of doc_id that the
    SQL oracle recomputes independently, so the whole actor-pool decode
    plumbing is hash-checkable even though the float feature vectors
    themselves stay pytest-gated."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, dlen, fsamp, fdim = [], [], [], [], []
        for mid, kind, payload in zip(batch["media_id"].to_pylist(),
                                      batch["kind"].to_pylist(),
                                      batch["payload"].to_pylist()):
            arr = decode_payload(payload)
            if arr.ndim == 3:  # video: frame-sample then average
                frames = arr[::self.frame_step]
                f = np.mean([self._features(fr) for fr in frames], axis=0)
                fs = len(frames)
            elif arr.ndim == 1:  # audio waveform
                f = self._audio_features(arr)
                fs = 0
            else:
                f = self._features(arr)
                fs = 1
            ids.append(mid)
            kinds.append(kind)
            dlen.append(int(arr.size))
            fsamp.append(fs)
            fdim.append(int(len(f)))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(kinds, pa.string()),
            "decoded_len": pa.array(dlen, pa.int64()),
            "frames_sampled": pa.array(fsamp, pa.int64()),
            "feat_dim": pa.array(fdim, pa.int64()),
        })


def media_feature_stats(sf_dir: str, concurrency=None, batch_size: int = 64):
    """Dataset pipeline: synthetic media rows -> decoded scalar stats
    (task pool like media_features; small batches for the binary payloads)."""
    from ..util import make_task_stage

    ds = synth_media_ds(sf_dir)
    return ds.map_batches(make_task_stage(MediaFeatureStatStage, ()),
                          batch_format="pyarrow", batch_size=batch_size)
