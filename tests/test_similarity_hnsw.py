"""Structural + recall tests for the HNSW-style layered ANN graph.

Oracle parity is covered by the parametrized gate in test_relational;
these tests assert what the hash can't: the graph is a valid layered
adjacency and the search actually finds near neighbors (an ANN that
hash-matches a useless spec is still useless — recall is the metric)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def hnsw_edges(spark, sf_dir):
    from eeecs485_p4_mapreduce_spark.operators.similarity import (
        sim_hnsw_build,
    )

    return sim_hnsw_build(spark, sf_dir).collect()


def test_hnsw_build_structure(hnsw_edges):
    from eeecs485_p4_mapreduce_spark.operators.similarity import (
        HNSW_M,
        HNSW_MAX_LEVEL,
    )

    assert {r.level for r in hnsw_edges} == set(range(HNSW_MAX_LEVEL + 1))
    out_deg = {}
    for r in hnsw_edges:
        assert r.src != r.dst
        assert 1 <= r.rank <= HNSW_M
        out_deg[(r.level, r.src)] = max(
            out_deg.get((r.level, r.src), 0), r.rank
        )
    assert all(d <= HNSW_M for d in out_deg.values())
    # layer populations must shrink as level rises (geometric level rule)
    pop = {
        lvl: len({s for (l, s) in out_deg if l == lvl})
        for lvl in range(HNSW_MAX_LEVEL + 1)
    }
    for lvl in range(HNSW_MAX_LEVEL):
        assert pop[lvl] >= pop[lvl + 1]


def test_hnsw_layer_membership_follows_level_rule(hnsw_edges):
    """Every node appearing at layer l must satisfy the md5 level rule
    level(vec_id) >= l — recomputed independently in Python."""
    import hashlib

    def level(vec_id: int) -> int:
        h = int(hashlib.md5(str(vec_id).encode()).hexdigest()[:8], 16)
        return (h % 4 == 0) + (h % 16 == 0) + (h % 64 == 0)

    for r in hnsw_edges:
        assert level(r.src) >= r.level, (r.src, r.level)
        assert level(r.dst) >= r.level, (r.dst, r.level)


def test_hnsw_recall_beats_flat_lsh(spark, sf_dir):
    """The layered-graph search must recover most of the true top-5 and
    strictly beat the flat single-bucket LSH path on the same corpus
    (the whole point of spending build time on the graph; flat LSH
    measures ~0.04 recall on these LSH-hostile synthetic embeddings)."""
    from eeecs485_p4_mapreduce_spark.operators.similarity import (
        sim_ann_lsh,
        sim_hnsw_search,
        sim_topk_bruteforce,
    )

    bf = {
        (r.query_id, r.neighbor_id)
        for r in sim_topk_bruteforce(spark, sf_dir).collect()
        if r.rank <= 5
    }
    hnsw = {
        (r.query_id, r.neighbor_id)
        for r in sim_hnsw_search(spark, sf_dir).collect()
    }
    flat = {
        (r.query_id, r.neighbor_id)
        for r in sim_ann_lsh(spark, sf_dir).collect()
        if r.rank <= 5
    }
    recall_hnsw = len(bf & hnsw) / len(bf)
    recall_flat = len(bf & flat) / len(bf)
    assert recall_hnsw >= 0.6, recall_hnsw
    assert recall_hnsw > recall_flat, (recall_hnsw, recall_flat)


def test_hnsw_shuffle_join_branch_matches_broadcast(spark, sf_dir, monkeypatch):
    """The scale path (adjacency too big to broadcast -> src-partitioned
    checkpoint + shuffle joins) must produce bit-identical results to
    the broadcast path — no correctness gate exercises it otherwise,
    since every test SF is broadcast-sized. Forced by faking the
    footer row count above the 64 MB threshold."""
    from eeecs485_p4_mapreduce_spark.operators import similarity as S

    want = sorted(
        map(tuple, S.sim_hnsw_search(spark, sf_dir).collect())
    )
    monkeypatch.setattr(
        S, "_parquet_row_count", lambda path: 10_000_000
    )
    got = sorted(
        map(tuple, S.sim_hnsw_search(spark, sf_dir).collect())
    )
    assert got == want


def test_hnsw_scaledplanes_matches_production_per_shard(
    spark, sf_dir, tmp_path
):
    """The probe-only scaled-planes variant (production planes ~
    log4(N) policy via shard-embedded bucket keys, shard-local level
    ids) must be FAITHFUL: on a single shard it degenerates to
    sim_hnsw_build exactly, and on an R=2 key-shifted replica every
    shard reproduces the base edge set 1:1 (shard 1 = base edges with
    both endpoints shifted by KEY_OFFSET) with zero cross-shard edges.
    That id-level equality is the scale measurement in miniature:
    per-bucket candidate pairs grow exactly proportionally to R under
    the plane policy, never R^2 like a fixed-plane replica probe."""
    import sys
    from pathlib import Path

    from eeecs485_p4_mapreduce_spark.operators.similarity import (
        sim_hnsw_build,
        sim_hnsw_scaledplanes,
    )

    sys.path.insert(
        0, str(Path(__file__).resolve().parents[1] / "tools")
    )
    from scale_probe import KEY_OFFSET, build

    base = sorted(tuple(r) for r in sim_hnsw_build(spark, sf_dir).collect())
    single = sorted(
        tuple(r) for r in sim_hnsw_scaledplanes(spark, sf_dir).collect()
    )
    assert single == base  # one shard == production pipeline

    rep_dir = str(tmp_path / "x2")
    build(2, rep_dir, src=sf_dir, spark=spark)
    out = sim_hnsw_scaledplanes(spark, rep_dir).collect()
    by_shard = {0: [], 1: []}
    for r in out:
        shard = r.src // KEY_OFFSET
        assert r.dst // KEY_OFFSET == shard, "cross-shard edge"
        by_shard[shard].append(
            (
                r.level,
                r.src - shard * KEY_OFFSET,
                r.dst - shard * KEY_OFFSET,
                r.rank,
                r.cosine,
            )
        )
    assert sorted(by_shard[0]) == base
    assert sorted(by_shard[1]) == base  # bucket work grew exactly 2x
