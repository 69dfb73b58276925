"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

Decode is REAL for PNG and WAV payloads via the pure-stdlib codecs in
functions/codecs.py (zlib + ``wave``; magic-byte sniffed). Payloads in any
other format fall back to ``_decode_stub`` — a deterministic fake, clearly
marked — because no external codec library exists in this environment; on
a cluster with codecs, swap the stub for ``PIL.Image.open`` /
``soundfile.read``. Everything Ray-side — schema, batch sizing for large
binary rows, actor signature, output layout — is real and tested either
way.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .codecs import (decode_png, decode_wav, encode_png, encode_wav,
                     resize_nearest, sniff_kind)

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio"
    ("payload", pa.binary()),        # opaque encoded bytes
    ("width", pa.int32()),           # metadata (nullable for audio)
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),     # metadata (nullable for image)
])


def fake_media_table(texts: list[str], ids: list[int]) -> pa.Table:
    """Deterministic binary payloads derived from text (stand-in corpus)."""
    payloads = [t.encode() * 4 for t in texts]
    kinds = ["image" if i % 2 == 0 else "audio" for i in ids]
    return pa.table({
        "media_id": pa.array(ids, pa.int64()),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64 if k == "image" else None for k in kinds], pa.int32()),
        "height": pa.array([48 if k == "image" else None for k in kinds], pa.int32()),
        "sample_rate": pa.array([None if k == "image" else 16000 for k in kinds],
                                pa.int32()),
    })


def media_batch_from_docs(batch: pa.Table) -> pa.Table:
    """Per-block conversion of a documents batch into the media table —
    the DISTRIBUTED construction path (`map_batches` over the documents
    Dataset), so the stand-in corpus is built where the data lives instead
    of on the driver."""
    return fake_media_table(batch["text"].to_pylist(),
                            batch["doc_id"].to_pylist())


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels/samples from the payload
    digest. Replace with a real codec call in production; raises on unknown
    kinds exactly as a real decoder would."""
    if kind not in ("image", "audio"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest, dtype=np.uint8).astype(np.float32)


def _decode(payload: bytes, kind: str) -> np.ndarray:
    """Decode a media payload to a flat float32 array: REAL decode for
    PNG/WAV (magic-sniffed, functions/codecs.py), stub for everything
    else."""
    fmt = sniff_kind(payload)
    if fmt == "png":
        return decode_png(payload).astype(np.float32).reshape(-1)
    if fmt == "wav":
        return decode_wav(payload)[0].astype(np.float32).reshape(-1)
    return _decode_stub(payload, kind)


def real_media_table(texts: list[str], ids: list[int]) -> pa.Table:
    """Media rows with REAL encoded payloads — PNG images and WAV audio —
    derived deterministically from text (even ids get an 8x8 grayscale
    PNG whose pixels are the text's sha256 stream; odd ids get 256
    samples of int16 PCM from the same stream)."""
    rows = {k: [] for k in ("media_id", "kind", "payload", "width",
                            "height", "sample_rate")}
    for t, i in zip(texts, ids):
        stream = hashlib.sha256(t.encode()).digest() * 16  # 512 bytes
        if i % 2 == 0:
            img = np.frombuffer(stream[:64], np.uint8).reshape(8, 8)
            rows["media_id"].append(i)
            rows["kind"].append("image")
            rows["payload"].append(encode_png(img))
            rows["width"].append(8)
            rows["height"].append(8)
            rows["sample_rate"].append(None)
        else:
            pcm = (np.frombuffer(stream, np.uint8)[:256].astype(np.int16)
                   * 128 - 16384)
            rows["media_id"].append(i)
            rows["kind"].append("audio")
            rows["payload"].append(encode_wav(pcm, 16000))
            rows["width"].append(None)
            rows["height"].append(None)
            rows["sample_rate"].append(16000)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"]),
        "payload": pa.array(rows["payload"], pa.binary()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
    })


def real_media_batch_from_docs(batch: pa.Table) -> pa.Table:
    """Distributed construction of the REAL-payload media table (PNG/WAV
    bytes built where the data lives, `map_batches` over documents)."""
    return real_media_table(batch["text"].to_pylist(),
                            batch["doc_id"].to_pylist())


class MediaFeatureExtractor:
    """Actor-pool stage: decode -> fixed-length feature vector.

    Real-world shape: model/codec loaded ONCE per actor in __init__ (the
    reference's heavyweight per-process session factories, ST5,
    .../inject/DataAccessModule.java:21-32); per-batch work stays vectorized
    after the per-item decode. Use small batch_size for large payloads so a
    batch x concurrency fits in the worker heap.
    """

    def __init__(self):
        self.dim = 32  # feature dim; a real stage would load weights here

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.zeros((len(payloads), self.dim), dtype=np.float32)
        for i, (p, k) in enumerate(zip(payloads, kinds)):
            d = _decode(p, k)  # real for PNG/WAV, stub otherwise
            n = min(self.dim, len(d))
            feats[i, :n] = d[:n]
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "feature": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.reshape(-1)), self.dim),
        })


def extract_features(ds: ray.data.Dataset, concurrency: int = 2,
                     batch_size: int = 256) -> ray.data.Dataset:
    """Binary-safe actor-pool stage; batch_size deliberately small because
    each row carries an opaque payload (see module docstring)."""
    return ds.map_batches(MediaFeatureExtractor, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency,
                          num_cpus=1)


class ImageResizer:
    """Actor-pool resize stage: image rows get re-encoded at target WxH;
    non-image rows pass through untouched. PNG payloads get a REAL
    decode -> nearest-neighbor resample -> PNG re-encode
    (functions/codecs.py); other image formats keep the codec-shaped STUB
    (deterministic bytes from the payload digest + target dims). The Ray
    plumbing — per-actor target config, payload-safe batching, metadata
    rewrite — is the same either way."""

    def __init__(self, width: int = 32, height: int = 24):
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_p, out_w, out_h = [], [], []
        for p, k, w, h in zip(payloads, kinds,
                              batch["width"].to_pylist(),
                              batch["height"].to_pylist()):
            if k == "image" and sniff_kind(p) == "png":
                img = resize_nearest(decode_png(p), self.width, self.height)
                out_p.append(encode_png(img))
                out_w.append(self.width)
                out_h.append(self.height)
            elif k == "image":
                digest = hashlib.sha256(
                    p + bytes([self.width, self.height])).digest()
                out_p.append(digest * ((self.width * self.height) // 32 + 1))
                out_w.append(self.width)
                out_h.append(self.height)
            else:
                out_p.append(p)
                out_w.append(w)
                out_h.append(h)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out_p, pa.binary()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
            "sample_rate": batch["sample_rate"],
        })


class FrameSampler:
    """Actor-pool frame-sampling stage (1 -> k rows): audio/video payloads
    emit every ``stride``-th frame as its own row with a per-frame feature.
    WAV payloads get a REAL decode — frames are 16-sample PCM windows and
    frame_energy is the window's mean absolute amplitude; other formats
    keep the STUB kernel. The flat-map row expansion, frame indexing and
    small-batch handling are the same multimodal plumbing either way."""

    FRAME_LEN = 16  # PCM samples per frame window

    def __init__(self, stride: int = 4, max_frames: int = 8):
        self.stride, self.max_frames = stride, max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch["media_id"].to_pylist(), batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_feat = [], [], []
        for mid, k, p in zip(ids, kinds, payloads):
            if k != "audio":
                continue
            if sniff_kind(p) == "wav":
                pcm = decode_wav(p)[0].reshape(-1).astype(np.float64)
                if len(pcm) == 0:  # legal zero-frame WAV: nothing to emit
                    continue
                n_frames = max(1, len(pcm) // self.FRAME_LEN)
                for f in range(0, min(n_frames,
                                      self.max_frames * self.stride),
                               self.stride):
                    win = pcm[f * self.FRAME_LEN:(f + 1) * self.FRAME_LEN]
                    out_id.append(mid)
                    out_frame.append(f)
                    out_feat.append(float(np.abs(win).mean()))
                continue
            n_frames = max(1, len(p) // 16)
            for f in range(0, min(n_frames, self.max_frames * self.stride),
                           self.stride):
                d = _decode_stub(p + f.to_bytes(4, "little"), k)
                out_id.append(mid)
                out_frame.append(f)
                out_feat.append(float(d[:8].sum()))
        return pa.table({
            "media_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_frame, pa.int32()),
            "frame_energy": pa.array(out_feat, pa.float64()),
        })


def resize_images(ds: ray.data.Dataset, width: int = 32, height: int = 24,
                  concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(ImageResizer, batch_format="pyarrow",
                          batch_size=256, concurrency=concurrency, num_cpus=1,
                          fn_constructor_kwargs={"width": width,
                                                 "height": height})


def sample_frames(ds: ray.data.Dataset, stride: int = 4,
                  concurrency: int = 2) -> ray.data.Dataset:
    return ds.map_batches(FrameSampler, batch_format="pyarrow",
                          batch_size=256, concurrency=concurrency, num_cpus=1,
                          fn_constructor_kwargs={"stride": stride})
