"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool ``map_batches`` stages.

The image/audio codecs are not available in this environment, so the decode
kernel is STUBBED with a deterministic fake (clearly marked); everything
Ray-side — schema, batch sizing for large binary rows, actor signature,
output layout — is real and tested. Swap ``_decode_stub`` for a real
``PIL.Image.open`` / ``soundfile.read`` body on a cluster with codecs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

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
            feats[i] = _decode_stub(p, k)[: self.dim]
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
    non-image rows pass through untouched. The resample kernel is the
    codec-shaped STUB (deterministic bytes from the payload digest + target
    dims); the Ray plumbing — per-actor target config, payload-safe
    batching, metadata rewrite — is real."""

    def __init__(self, width: int = 32, height: int = 24):
        self.width, self.height = width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_p, out_w, out_h = [], [], []
        for p, k, w, h in zip(payloads, kinds,
                              batch["width"].to_pylist(),
                              batch["height"].to_pylist()):
            if k == "image":
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
    The frame decode is the STUB kernel; the flat-map row expansion, frame
    indexing and small-batch handling are the real multimodal plumbing."""

    def __init__(self, stride: int = 4, max_frames: int = 8):
        self.stride, self.max_frames = stride, max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds = batch["media_id"].to_pylist(), batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_frame, out_feat = [], [], []
        for mid, k, p in zip(ids, kinds, payloads):
            if k != "audio":
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
