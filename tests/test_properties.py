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
