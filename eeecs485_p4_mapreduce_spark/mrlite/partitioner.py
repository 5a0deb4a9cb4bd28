"""The reference's shuffle partition function.

Key → partition by ``int(md5(key).hexdigest(), 16) % num_partitions``.
The reference never states this in code (its framework is starter-code
stubs) but it is pinned empirically by its per-partition reduce-output
asserts (reference: tests/test_worker_08.py:226-242 — with 2 partitions,
{"", "bye", "hello"} land in part 0 and {"world", "hadoop", "goodbye"} in
part 1, which md5-mod reproduces and Python's builtin hash does not).

Scale note: md5 is uniform, so partition balance at 100 TB is as good as
Spark's Murmur3; it is only ~2× slower per key, and only the parity layer
pays that cost. The idiomatic layer uses Spark's native hash exchange.
"""

from __future__ import annotations

import hashlib


def md5_partition(key: str, num_partitions: int) -> int:
    """Partition index for a key, exactly as the reference computes it."""
    digest = hashlib.md5(key.encode("utf-8")).hexdigest()
    return int(digest, 16) % num_partitions
