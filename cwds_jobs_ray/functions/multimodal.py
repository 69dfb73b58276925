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
