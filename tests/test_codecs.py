"""Pure-stdlib PNG/WAV codecs + the real-decode multimodal path."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cwds_jobs_ray.functions.codecs import (decode_png, decode_wav,
                                            encode_png, encode_wav,
                                            resize_nearest, sniff_kind)
from cwds_jobs_ray.functions.multimodal import (
    FrameSampler, ImageResizer, MediaFeatureExtractor, real_media_table)


def _rng(seed=0):
    return np.random.default_rng(seed)


# --------------------------------------------------------------- PNG


def test_png_roundtrip_gray():
    img = _rng(1).integers(0, 256, (13, 7), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def test_png_roundtrip_rgb():
    img = _rng(2).integers(0, 256, (9, 11, 3), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img)


def _refilter(img: np.ndarray, ftype: int) -> bytes:
    """Forward-apply one PNG filter to every scanline (spec §6), producing
    a filtered stream the decoder must invert."""
    import struct
    import zlib
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    raw = img.reshape(h, w * c).astype(np.int32)
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        upleft = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if ftype == 0:
            f = cur
        elif ftype == 1:
            f = cur - left
        elif ftype == 2:
            f = cur - prev
        elif ftype == 3:
            f = cur - ((left + prev) >> 1)
        elif ftype == 4:
            p = left + prev - upleft
            pa_, pb, pc_ = (np.abs(p - left), np.abs(p - prev),
                            np.abs(p - upleft))
            pred = np.where((pa_ <= pb) & (pa_ <= pc_), left,
                            np.where(pb <= pc_, prev, upleft))
            f = cur - pred
        lines.append(bytes([ftype]) + (f & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))
    color_type = 0 if c == 1 else 2

    def chunk(typ, data):
        body = typ + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3])
def test_png_all_filters(ftype, channels):
    shape = (6, 5) if channels == 1 else (6, 5, 3)
    img = _rng(ftype * 10 + channels).integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(_refilter(img, ftype))
    np.testing.assert_array_equal(out, img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all....")


def test_resize_nearest():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = resize_nearest(img, 4, 4)
    assert small.shape == (4, 4)
    np.testing.assert_array_equal(small, img[::2, ::2])
    big = resize_nearest(img, 16, 16)
    assert big.shape == (16, 16)
    np.testing.assert_array_equal(big[::2, ::2], img)  # NN upscale repeats


# --------------------------------------------------------------- WAV


def test_wav_roundtrip_mono():
    pcm = _rng(3).integers(-32768, 32767, 500, dtype=np.int16)
    out, rate = decode_wav(encode_wav(pcm, 22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, pcm)


def test_wav_roundtrip_stereo():
    pcm = _rng(4).integers(-32768, 32767, (300, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(pcm, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(out, pcm)


def test_sniff_kind():
    img = np.zeros((2, 2), np.uint8)
    assert sniff_kind(encode_png(img)) == "png"
    assert sniff_kind(encode_wav(np.zeros(4, np.int16))) == "wav"
    assert sniff_kind(b"some text payload") is None


# ------------------------------------------------- real multimodal path


def test_real_media_feature_extract():
    t = real_media_table(["alpha", "beta", "gamma", "delta"], [0, 1, 2, 3])
    feats = MediaFeatureExtractor()(t)
    # image rows: features are the REAL decoded pixel values
    import hashlib
    px = np.frombuffer(hashlib.sha256(b"alpha").digest() * 2, np.uint8)[:32]
    np.testing.assert_array_equal(
        np.asarray(feats["feature"][0].as_py(), dtype=np.float32),
        px.astype(np.float32))
    # audio rows: features are the REAL decoded PCM samples
    stream = hashlib.sha256(b"beta").digest() * 16
    pcm = (np.frombuffer(stream, np.uint8)[:256].astype(np.int16)
           * 128 - 16384)
    np.testing.assert_array_equal(
        np.asarray(feats["feature"][1].as_py(), dtype=np.float32),
        pcm[:32].astype(np.float32))


def test_real_resize_roundtrips():
    t = real_media_table(["x", "y"], [0, 1])
    out = ImageResizer(width=4, height=4)(t)
    png = out["payload"][0].as_py()
    img = decode_png(png)
    assert img.shape == (4, 4)
    # resample of the known source image
    import hashlib
    src = np.frombuffer(hashlib.sha256(b"x").digest()[:64] * 1, np.uint8)
    src = np.frombuffer((hashlib.sha256(b"x").digest() * 16)[:64],
                        np.uint8).reshape(8, 8)
    np.testing.assert_array_equal(img, resize_nearest(src, 4, 4))
    # audio row untouched
    assert out["payload"][1].as_py() == t["payload"][1].as_py()


def test_real_frame_energy():
    t = real_media_table(["x", "y"], [0, 1])  # id 1 = audio
    frames = FrameSampler(stride=4, max_frames=4)(t).to_pandas()
    assert set(frames["media_id"]) == {1}
    assert list(frames["frame_idx"]) == [0, 4, 8, 12]
    import hashlib
    stream = hashlib.sha256(b"y").digest() * 16
    pcm = (np.frombuffer(stream, np.uint8)[:256].astype(np.int16)
           * 128 - 16384).astype(np.float64)
    for _, r in frames.iterrows():
        w = pcm[int(r.frame_idx) * 16:(int(r.frame_idx) + 1) * 16]
        assert r.frame_energy == pytest.approx(np.abs(w).mean())


def test_stub_fallback_unchanged():
    """Non-PNG/WAV payloads still go through the deterministic stub —
    the existing golden oracles depend on it."""
    from cwds_jobs_ray.functions.multimodal import fake_media_table
    import hashlib
    t = fake_media_table(["hello"], [0])
    feats = MediaFeatureExtractor()(t)
    digest = hashlib.sha256("hello".encode() * 4).digest()
    exp = np.frombuffer(digest, np.uint8).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(feats["feature"][0].as_py(), dtype=np.float32), exp)


def test_real_pipeline_distributed(ray_session):
    """End-to-end over a Dataset: real payload build -> resize -> features
    -> frames, all actor-pool map_batches stages."""
    from cwds_jobs_ray.functions.multimodal import (
        extract_features, real_media_batch_from_docs, resize_images,
        sample_frames)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": [f"doc number {i}" for i in range(8)],
    }))
    media = docs.map_batches(real_media_batch_from_docs,
                             batch_format="pyarrow", batch_size=4)
    resized = resize_images(media, width=4, height=4)
    feats = extract_features(resized).to_pandas().sort_values("media_id")
    assert len(feats) == 8
    assert all(len(f) == 32 for f in feats["feature"])
    frames = sample_frames(media).to_pandas()
    assert set(frames["media_id"]) == {1, 3, 5, 7}


# --------------------------------------------------- property (hypothesis)

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(h=st.integers(1, 12), w=st.integers(1, 12),
       ch=st.sampled_from([1, 3]), seed=st.integers(0, 2**31))
def test_png_roundtrip_property(h, w, ch, seed):
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = np.random.default_rng(seed).integers(0, 256, shape, dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(h=st.integers(1, 8), w=st.integers(1, 8),
       ftype=st.integers(0, 4), seed=st.integers(0, 2**31))
def test_png_filters_property(h, w, ftype, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3),
                                               dtype=np.uint8)
    np.testing.assert_array_equal(decode_png(_refilter(img, ftype)), img)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(n=st.integers(1, 400), ch=st.sampled_from([1, 2]),
       rate=st.sampled_from([8000, 16000, 44100]), seed=st.integers(0, 2**31))
def test_wav_roundtrip_property(n, ch, rate, seed):
    shape = (n,) if ch == 1 else (n, ch)
    pcm = np.random.default_rng(seed).integers(-32768, 32767, shape,
                                               dtype=np.int16)
    out, r = decode_wav(encode_wav(pcm, rate))
    assert r == rate
    np.testing.assert_array_equal(out, pcm)


def test_synth_dup_gather_sliced():
    """The dup-redelivery gather slices its takes; values must equal a
    one-shot take regardless of slicing."""
    from cwds_jobs_ray.synth import WalSpec, make_wal
    w1 = make_wal(WalSpec(seed=9, n_convs=50, n_events=5000,
                          dup_redelivery_frac=0.2))
    n = 5000
    base = w1.slice(0, n)
    dups = w1.slice(n)
    assert dups.num_rows == 1000
    # every dup row must appear verbatim in the base rows (same lsn/op/text)
    base_lsn = base["lsn"].to_pylist()
    pos = {v: i for i, v in enumerate(base_lsn)}
    for j in range(0, dups.num_rows, 97):
        i = pos[dups["lsn"][j].as_py()]
        for col in ("op", "conv_id", "turn_idx", "text"):
            assert dups[col][j].as_py() == base[col][i].as_py()
