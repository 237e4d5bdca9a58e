"""Multimodal plumbing tests (fake decoder; real codecs absent by design)."""

from __future__ import annotations

import hashlib

import pytest

from etl_docker_spark.llm import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG-fake-bytes-1", ("image", "image/png", 800, 600, None, None)),
        (2, b"RIFF-fake-audio", ("audio", "audio/wav", None, None, 16000, 2500)),
        (3, b"\x00\x00ftyp-fake-video", ("video", "video/mp4", 1920, 1080, None, 3500)),
        (4, None, ("image", "image/png", 100, 100, None, None)),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = {r.media_id: r for r in mm.extract_features(media, dim=8).collect()}
    assert out[1].n_bytes == len(b"\x89PNG-fake-bytes-1")
    assert out[1].checksum == int(hashlib.md5(b"\x89PNG-fake-bytes-1").hexdigest()[:8], 16)
    assert len(out[1].feature) == 8
    assert out[4].n_bytes == 0  # null-content row survives
    again = {r.media_id: r.feature for r in mm.extract_features(media, dim=8).collect()}
    assert again == {k: v.feature for k, v in out.items()}


def test_real_decoder_fails_fast(media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, decoder="real")


def test_sample_frames(spark, media):
    frames = mm.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r.media_id, []).append(r.frame_ms)
    assert sorted(by_id[3]) == [0, 1000, 2000, 3000]   # 3500ms video
    assert sorted(by_id[2]) == [0, 1000, 2000]         # 2500ms audio
    assert 1 not in by_id and 4 not in by_id           # no duration -> no frames


def test_resize_plan(spark, media):
    out = {r.media_id: r for r in mm.resize_plan(media, max_side=512).collect()}
    assert (out[1].target_width, out[1].target_height) == (512, 384)
    assert (out[3].target_width, out[3].target_height) == (512, 288)
    assert (out[4].target_width, out[4].target_height) == (100, 100)  # untouched


def test_strip_container_normalizes_reencodes(spark):
    """Demux removes container framing so byte-distinct re-encodes of one
    stream checksum identically; untouched payloads pass through."""
    from etl_docker_spark.llm.multimodal import extract_features, strip_container

    rows = [(1, b"streambytes"), (2, b"streambytes#PAD42"),
            (3, b"other"), (4, b"mid#PAD7marker#PAD")]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    feats = {r["media_id"]: r["checksum"]
             for r in extract_features(strip_container(media)).collect()}
    assert feats[1] == feats[2]          # re-encode collapses
    assert feats[1] != feats[3]
    # only a TRAILING marker is container framing; interior bytes survive
    from etl_docker_spark.llm.multimodal import _checksum
    assert feats[4] == _checksum(b"mid#PAD7marker")
