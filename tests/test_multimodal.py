"""Multimodal plumbing tests: schema contract, Arrow batch path,
deterministic fake features, frame sampling, and the codec stub."""

from __future__ import annotations

import pytest

from lab5_lakehouse_etl_spark.functions import multimodal as M
from tests.conftest import SF_DIR

from lab5_lakehouse_etl_spark.session import load_table


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    return M.fake_media_from_documents(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "payload",
        "modality",
        "mime",
        "n_bytes",
    ]
    row = media.first()
    assert isinstance(row.payload, bytearray | bytes)
    assert row.n_bytes == len(row.payload)


def test_extract_features_deterministic(spark, media):
    f1 = {r.media_id: r.features for r in M.extract_features(media).collect()}
    f2 = {r.media_id: r.features for r in M.extract_features(media).collect()}
    assert f1 == f2
    vec = next(iter(f1.values()))
    assert len(vec) == M.FEATURE_DIM
    assert all(0.0 <= x < 1.0 for x in vec)


def test_sample_frames_covers_payload(media):
    frames = M.sample_frames(media, every_n_bytes=64).collect()
    by_media: dict[int, list] = {}
    for r in frames:
        by_media.setdefault(r.media_id, []).append(r)
    sizes = {r.media_id: r.n_bytes for r in media.collect()}
    for mid, fr in by_media.items():
        # full coverage: every frame but the last is exactly 64 bytes,
        # and together they reproduce the whole payload — no dropped tail
        lens = [len(f.frame_payload) for f in sorted(fr, key=lambda f: f.frame_idx)]
        assert all(ln == 64 for ln in lens[:-1])
        assert sum(lens) == sizes[mid]


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="image codecs"):
        M.decode_image(b"\x89PNG")


def test_resize_preserves_prefix_and_pads(media):
    resized = M.resize_media(media, width=32, height=32)
    out = {r.media_id: r for r in resized.collect()}
    for src in media.collect():
        r = out[src.media_id]
        assert (r.width, r.height) == (32, 32)
        assert len(r.payload) == 1024
        prefix = bytes(src.payload)[:1024]
        assert bytes(r.payload)[: len(prefix)] == prefix
        assert all(b == 0 for b in bytes(r.payload)[len(prefix):])
