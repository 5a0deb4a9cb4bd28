"""Property-based tests (hypothesis) for the engine's pure primitives.

These functions define cross-engine/cross-partitioning contracts (md5
routing, shingling, media sampling), so they get generated-input coverage
on top of the golden/oracle tests.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from eeecs485_p4_mapreduce_spark.mrlite.partitioner import md5_partition
from eeecs485_p4_mapreduce_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    THUMB_STRIDE,
    fake_thumbnail,
    sample_frames,
)


@given(st.text(), st.integers(min_value=1, max_value=64))
def test_md5_partition_range_and_formula(key, n):
    p = md5_partition(key, n)
    assert 0 <= p < n
    assert p == int(hashlib.md5(key.encode()).hexdigest(), 16) % n


@given(st.binary(max_size=4096))
def test_fake_thumbnail_is_stride_sample(payload):
    thumb = fake_thumbnail(payload)
    assert len(thumb) == (len(payload) + THUMB_STRIDE - 1) // THUMB_STRIDE
    assert thumb == bytes(payload[i] for i in range(0, len(payload), THUMB_STRIDE))


@given(st.binary(max_size=4096))
def test_sample_frames_shapes(payload):
    frames = sample_frames(payload)
    n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
    assert len(frames) == (n_frames + FRAME_STRIDE - 1) // FRAME_STRIDE
    for f in frames[:-1] if frames else []:
        assert len(f) == FRAME_BYTES
    # reassembly: sampled frames are exactly the stride-th slices
    for i, f in enumerate(frames):
        start = i * FRAME_STRIDE * FRAME_BYTES
        assert f == payload[start : start + FRAME_BYTES]


@settings(deadline=None)
@given(
    st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), max_size=8)
)
def test_wc_map_builtin_matches_shell_semantics(lines):
    """The pure-Python wc mapper must tokenize exactly like the
    reference's `tr '[ \\t]' '\\n'` pipeline: split on single spaces/tabs,
    keep empty tokens (blank segments), lowercase."""
    from eeecs485_p4_mapreduce_spark.mrlite.builtins import wc_map

    for line in lines:
        got = list(wc_map(line))
        import re

        want = [(t.lower(), "1") for t in re.split("[ \t]", line)]
        assert got == want


@settings(deadline=None, max_examples=30)
@given(
    st.integers(min_value=0, max_value=(1 << 16) - 1),
    st.integers(min_value=0, max_value=(1 << 16) - 1),
)
def test_zvalue_expr_matches_python_reference(a, b):
    """The SQL Morton interleave (as DuckDB evaluates it — same text the
    Spark side runs) must equal a bit-for-bit Python reference."""
    import duckdb

    from eeecs485_p4_mapreduce_spark.sources.layout import zvalue_expr

    want = 0
    for i in range(16):
        want |= ((a >> i) & 1) << (2 * i)
        want |= ((b >> i) & 1) << (2 * i + 1)
    got = duckdb.execute(
        f"SELECT {zvalue_expr('a', 'b', 16)} FROM (SELECT {a} AS a, {b} AS b)"
    ).fetchone()[0]
    assert got == want


@settings(deadline=None, max_examples=20)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=2,
        max_size=40,
    )
)
def test_zvalue_normalized_preserves_quadrants(pairs):
    """Normalized z-values must respect quadrant order: any point in the
    low-low quadrant of the (normalized) key plane sorts before any
    point in the high-high quadrant."""
    from eeecs485_p4_mapreduce_spark.sources.layout import zvalue_expr

    import duckdb

    los = [p for p in pairs]
    lo1 = min(a for a, _ in pairs); hi1 = max(a for a, _ in pairs)
    lo2 = min(b for _, b in pairs); hi2 = max(b for _, b in pairs)
    if hi1 == lo1 or hi2 == lo2:
        return  # degenerate domain: nothing to order
    expr = zvalue_expr("a", "b", 8, (lo1, hi1, lo2, hi2))
    rows = ", ".join(f"({a}, {b})" for a, b in pairs)
    got = duckdb.execute(
        f"SELECT a, b, {expr} AS z FROM (VALUES {rows}) t(a, b)"
    ).fetchall()
    mid1, mid2 = (lo1 + hi1) / 2, (lo2 + hi2) / 2
    low_z = [z for a, b, z in got if a < mid1 and b < mid2]
    high_z = [z for a, b, z in got if a > mid1 and b > mid2]
    for lz in low_z:
        for hz in high_z:
            assert lz < hz


@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_bmp_roundtrip_any_shape(w, h, seed):
    """encode_bmp → decode_bmp_pixels is the identity for every (w, h) —
    including widths whose 3-byte rows need 1-3 pad bytes."""
    import numpy as np

    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp,
    )

    px = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert np.array_equal(decode_bmp_pixels(encode_bmp(px)), px)


@given(
    st.integers(min_value=0, max_value=600),
    st.integers(min_value=1, max_value=192000),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_wav_roundtrip_any_length(n, rate, seed):
    """encode_wav → decode_wav_samples round-trips every sample count
    (odd counts exercise the RIFF word-alignment pad byte) and rate."""
    import numpy as np

    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
    )

    s = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=n, dtype=np.int64)
        .astype("<i2")
    )
    got_rate, got = decode_wav_samples(encode_wav(s, rate))
    assert got_rate == rate
    assert np.array_equal(got, s)


@given(
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=1, max_value=30),
)
def test_resize_pixels_nn_contract(sw, sh, tw, th):
    """Every target pixel equals its nearest-neighbor source pixel:
    out[y, x] == src[y*sh//th, x*sw//tw], for any shape pair."""
    import numpy as np

    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        resize_pixels,
    )

    y, x = np.mgrid[0:sh, 0:sw]
    src = np.stack([x % 251, y % 251, (x + y) % 251], axis=-1).astype(
        np.uint8
    )
    out = resize_pixels(src, tw, th)
    assert out.shape == (th, tw, 3)
    for ty in range(0, th, max(1, th // 4)):
        for tx in range(0, tw, max(1, tw // 4)):
            assert (
                out[ty, tx] == src[ty * sh // th, tx * sw // tw]
            ).all()


@settings(deadline=None, max_examples=40)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.integers(min_value=0, max_value=5),
)
def test_png_roundtrip_any_shape_and_filter(w, h, seed, ft):
    """encode_png → decode_png_pixels is the identity for every (w, h),
    RGB and greyscale, under every scanline filter type (ft 5 = a
    per-row rotation through all five) — the full DEFLATE + prediction
    pipeline, not just the byte plumbing."""
    import numpy as np

    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    rng = np.random.default_rng(seed)
    filters = [r % 5 for r in range(h)] if ft == 5 else ft
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_png_pixels(encode_png(rgb, filters)), rgb)
    grey = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert np.array_equal(decode_png_pixels(encode_png(grey, filters)), grey)


@settings(deadline=None, max_examples=30)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=4),  # palette bits
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
def test_gif_roundtrip_any_shape_palette_interlace(w, h, bits, seed, interlace):
    """encode_gif → decode_gif_pixels is the identity for every shape,
    palette size (2..16 colors), and interlace flag — generated inputs
    drive the LZW table through growth/KwKwK paths the fixtures don't."""
    import numpy as np

    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif,
    )

    n_colors = 1 << bits
    rng = np.random.default_rng(seed)
    palette = [
        tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(n_colors)
    ]
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    px = decode_gif_pixels(encode_gif(idx, palette, interlace=interlace))
    want = np.array(palette, dtype=np.uint8)[idx]
    assert np.array_equal(px, want)


@settings(deadline=None, max_examples=20)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
def test_jpeg_roundtrip_bounded_error(w, h, seed, grey):
    """encode_jpeg(quant=1) → decode_jpeg_pixels stays within the
    DCT/rounding error bound for every shape (edge-block padding, both
    colorspaces) — JPEG is lossy, so the property is closeness."""
    import numpy as np

    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if grey else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, quant=1))
    assert dec.shape == img.shape
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 3
