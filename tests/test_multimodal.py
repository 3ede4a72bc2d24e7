"""Unit tests for the multimodal binary-column operators.

Parity vs DuckDB is covered by test_parity; these pin the byte-level
semantics on hand-computable payloads and verify the stub gating.
"""

from __future__ import annotations

import hashlib

import pytest

from data_engineer_8_final_project_spark.operators import multimodal


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_media_type_assignment_and_payload_bytes(spark):
    df = _docs(spark, [(0, "aaa"), (1, "bb"), (2, "c"), (3, "")])
    media = {r.doc_id: r for r in multimodal.media_from_documents(df).collect()}
    assert [media[i].media_type for i in range(4)] == ["image", "audio", "video", "image"]
    assert bytes(media[0].payload) == b"aaa"
    assert media[1].meta.n_bytes == 2


def test_feature_extract_matches_hashlib(spark):
    df = _docs(spark, [(1, "hello world"), (2, "")])
    media = multimodal.media_from_documents(df)
    feats = {r.doc_id: r for r in multimodal.media_feature_extract(media).collect()}
    assert feats[1].payload_md5 == hashlib.md5(b"hello world").hexdigest()
    assert feats[1].byte_sum == sum(b"hello world")
    assert feats[1].payload_len == 11
    assert feats[2].payload_len == 0 and feats[2].byte_sum == 0


def test_frame_sampling_chunks_and_strides(spark):
    # doc_id=2 → 'video'; payload of 6 frames → frames 0 and 4 sampled
    text = "x" * (multimodal.FRAME_BYTES * 5 + 10)
    df = _docs(spark, [(2, text), (0, text)])  # doc 0 is 'image' → excluded
    frames = multimodal.sample_frames(multimodal.media_from_documents(df)).collect()
    got = {(r.doc_id, r.frame_no): (r.frame_md5, r.frame_len) for r in frames}
    assert set(got) == {(2, 0), (2, 4)}
    full = hashlib.md5(b"x" * multimodal.FRAME_BYTES).hexdigest()
    assert got[(2, 0)] == (full, multimodal.FRAME_BYTES)
    assert got[(2, 4)] == (full, multimodal.FRAME_BYTES)


def test_decode_stub_raises_without_codecs(spark):
    df = _docs(spark, [(1, "abc")])
    media = multimodal.media_from_documents(df)
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_media(media)


def test_fake_decode_deterministic_across_partitioning(spark):
    df = _docs(spark, [(i, f"payload number {i}") for i in range(20)])
    media = multimodal.media_from_documents(df)
    a = {r.doc_id: (r.width, r.height, r.n_channels)
         for r in multimodal.decode_media(media, deterministic_fake=True).collect()}
    b = {r.doc_id: (r.width, r.height, r.n_channels)
         for r in multimodal.decode_media(
             media.repartition(7), deterministic_fake=True).collect()}
    assert a == b
    assert all(16 <= w < 256 and 16 <= h < 256 and 1 <= c <= 4 for w, h, c in a.values())


def test_decode_media_real_pil_path(spark):
    """When PIL is importable the real decoder runs: true pixel dims for
    valid images, NULL dims (not a task failure) for undecodable
    payloads. Skips where the container forces the stub."""
    PIL = pytest.importorskip("PIL")
    from io import BytesIO

    from PIL import Image

    def png(w, h, mode="RGB"):
        buf = BytesIO()
        Image.new(mode, (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", bytearray(png(20, 10))),
        (2, "image", bytearray(png(7, 5, mode="L"))),
        (3, "image", bytearray(b"not an image")),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_channels"])
        for r in multimodal.decode_media(media).collect()
    }
    assert got[1] == (20, 10, 3)
    assert got[2] == (7, 5, 1)
    assert got[3] == (None, None, None)
