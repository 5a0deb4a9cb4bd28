"""Unit tests for the multimodal binary-column pipeline."""

from __future__ import annotations

import pytest


def test_fake_feature_extract_deterministic():
    from eeecs485_p4_mapreduce_spark.operators.multimodal import fake_feature_extract

    payload = bytes(range(256)) * 2
    hist = fake_feature_extract(payload)
    assert len(hist) == 8
    assert sum(hist) == 512
    assert hist == fake_feature_extract(payload)


def test_decode_stubs_raise():
    from eeecs485_p4_mapreduce_spark.operators import multimodal as mm

    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")


def test_extract_features_roundtrip(spark, sf_dir):
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        documents_as_media,
        extract_features,
    )

    media = documents_as_media(spark, sf_dir).limit(20)
    feats = extract_features(media)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_bytes == sum(r.byte_histogram)
        assert len(r.head_hex) == 8  # 4 bytes hex-encoded


def test_media_schema_binary(spark, sf_dir):
    from eeecs485_p4_mapreduce_spark.operators.multimodal import documents_as_media

    media = documents_as_media(spark, sf_dir)
    assert dict(media.dtypes)["payload"] == "binary"


def test_frame_energy_matches_reference(spark, sf_dir):
    """mapInPandas energy must equal a pure-Python recompute from the
    source text bytes, including tail-frame and empty-payload handling."""
    from eeecs485_p4_mapreduce_spark.catalog import load_table
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        ENERGY_FRAME_BYTES,
        mm_audio_energy,
    )

    got = {
        r.media_id: (r.n_frames, r.total_energy, r.max_frame_energy)
        for r in mm_audio_energy(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for row in docs[:50]:
        b = row.text.encode("utf-8")
        frames = [
            sum((x - 128) ** 2 for x in b[i : i + ENERGY_FRAME_BYTES])
            for i in range(0, len(b), ENERGY_FRAME_BYTES)
        ]
        want = (len(frames), sum(frames), max(frames) if frames else 0)
        assert got[row.doc_id] == want


def test_scene_cuts_matches_reference(spark, sf_dir):
    """The distributed scene-cut pass must equal the pure-Python reference
    on every document payload, and flagged cuts must exceed the 1.5x-mean
    threshold by construction."""
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        documents_as_media,
        mm_scene_cuts,
        scene_cuts,
    )

    got = {
        r.media_id: (
            r.n_frames,
            r.n_cuts,
            r.max_diff_energy,
            [int(x) for x in r.cuts_csv.split(",")] if r.cuts_csv else [],
        )
        for r in mm_scene_cuts(spark, sf_dir).collect()
    }
    payloads = {
        r.media_id: bytes(r.payload)
        for r in documents_as_media(spark, sf_dir).select("media_id", "payload").collect()
    }
    assert set(got) == set(payloads)
    for mid, payload in payloads.items():
        n_frames, cuts, max_diff = scene_cuts(payload)
        assert got[mid] == (n_frames, len(cuts), max_diff, cuts)
    assert any(r[1] > 0 for r in got.values()), "expected at least one cut"


def test_format_sniff_detects_magic_bytes(spark, tmp_path):
    """mm_format_sniff must classify constructed PNG/JPEG/RIFF/GIF/PDF
    payloads by their real magic bytes (the sf corpus is all text, so
    the positive paths need constructed media)."""
    from pyspark.sql import Row

    from eeecs485_p4_mapreduce_spark.operators.multimodal import sniff_formats

    payloads = {
        "png": b"\x89PNG\r\n\x1a\n" + b"x" * 20,
        "jpeg": b"\xff\xd8\xff\xe0" + b"x" * 20,
        "riff": b"RIFFxxxxWAVE" + b"x" * 20,
        "gif": b"GIF89a" + b"x" * 20,
        "pdf": b"%PDF-1.7\n" + b"x" * 20,
        "unknown/text": b"plain old text payload",
    }
    media = spark.createDataFrame(
        [Row(media_id=i, payload=p) for i, p in enumerate(payloads.values())]
    )
    got = {r.fmt: r.n_media for r in sniff_formats(media).collect()}
    for fmt in payloads:
        assert got.get(fmt) == 1, (fmt, got)
