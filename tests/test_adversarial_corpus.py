"""Adversarial-corpus oracle parity (r12 sweep regression).

tools/adversarial_corpus.py appends documents engineered to expose
grain and NULL-discipline divergences the generated corpora never
trigger (empty text, empty tokens, intra-doc repeats, ...). The first
full sweep found four latent divergences in registered queries; this
test pins those four fixed queries — plus the empty-doc behavior they
now share — so a regression can't hide behind a clean sf0.01 run.
The FULL 310-query sweep stays a tool (`python tools/oracle_check.py
/tmp/sf_adversarial`, ~7 min) run at staging time, not per-commit.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT / "tools"))

FIXED = [
    "curate_weighted_sample",
    "mm_frame_sample",
    "mm_thumbnail",
    "ta_bpe_token_count",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory) -> str:
    from adversarial_corpus import build

    return build(str(tmp_path_factory.mktemp("sf_adv")))


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    import duckdb

    from eeecs485_p4_mapreduce_spark.catalog import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{table_path(adv_dir, t)}')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", FIXED)
def test_fixed_queries_match_oracle_on_adversarial_corpus(
    spark, adv_dir, adv_duck, name
):
    from oracle_check import canon_lines, lines_hash

    from eeecs485_p4_mapreduce_spark.registry import (
        ORACLES,
        QUERIES,
        load_all,
    )

    load_all()
    s_pd = QUERIES[name](spark, adv_dir).toPandas()
    d_pd = adv_duck.sql(ORACLES[name]).df()
    assert len(s_pd) == len(d_pd), f"{name}: {len(s_pd)} != {len(d_pd)}"
    assert sorted(s_pd.columns) == sorted(d_pd.columns)
    assert lines_hash(canon_lines(s_pd)) == lines_hash(canon_lines(d_pd))


def test_empty_doc_semantics(spark, adv_dir):
    """The empty-text doc must flow through each fixed query with the
    agreed semantics: excluded from weighted sampling (zero weight),
    present in the mm rows with empty payload stats, and 0
    chars-per-token rather than a division error."""
    from eeecs485_p4_mapreduce_spark.registry import QUERIES, load_all

    load_all()
    import duckdb

    from eeecs485_p4_mapreduce_spark.catalog import table_path

    empty_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM"
            f" read_parquet('{table_path(adv_dir, 'documents')}')"
            f" WHERE n_chars = 0"
        ).fetchall()
    }
    assert empty_ids, "adversarial corpus lost its empty doc"

    ws = {r.doc_id for r in QUERIES["curate_weighted_sample"](spark, adv_dir).collect()}
    assert not (ws & empty_ids), "zero-weight doc must never be sampled"

    thumbs = {
        r.media_id: r
        for r in QUERIES["mm_thumbnail"](spark, adv_dir).collect()
    }
    for d in empty_ids:
        assert thumbs[d].n_bytes == 0 and thumbs[d].thumb_hex == ""

    bpe = {
        r.doc_id: r
        for r in QUERIES["ta_bpe_token_count"](spark, adv_dir).collect()
    }
    for d in empty_ids:
        assert bpe[d].n_bpe_tokens == 0
        assert bpe[d].chars_per_token == 0.0
