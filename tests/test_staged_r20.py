"""Oracle + semantics tests for the STAGED r20 queries
(operators/staged_r20.py), with independent references per the
staging discipline: the EBML codec gets a hand-computed byte layout,
VINT width-boundary cases, and strictness fuzz; sessionization gets a
brute-force Python sessionizer over the same parquet; the Zipf octave
masses get a collections.Counter reference; the fertility census gets
a pure-Python regex recount; and the IVF-PQ rerank curve gets a
monotonicity invariant (more rerank budget can never lose recall)."""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

import pytest

from eeecs485_p4_mapreduce_spark.operators import staged_r20
from eeecs485_p4_mapreduce_spark.operators.multimodal import (
    _ebml_size,
    encode_mkv,
    parse_mkv_ebml,
)

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.parametrize("name", sorted(staged_r20.STAGED))
def test_staged_r20_matches_oracle(spark, duck, sf_dir, name):
    sys.path.insert(0, str(REPO_ROOT / "tools"))
    from oracle_check import canon_lines, lines_hash

    fn, oracle = staged_r20.STAGED[name]
    s_pd = fn(spark, sf_dir).toPandas()
    d_pd = duck.sql(oracle).df()
    assert len(s_pd) == len(d_pd), f"{name}: {len(s_pd)} != {len(d_pd)}"
    assert sorted(s_pd.columns) == sorted(d_pd.columns)
    s_lines, d_lines = canon_lines(s_pd), canon_lines(d_pd)
    assert lines_hash(s_lines) == lines_hash(d_lines), name


# --- EBML / Matroska codec ---------------------------------------------------


def test_ebml_vint_width_boundaries():
    """Size VINT widths turn over at 2^(7k)-1 (the all-ones pattern is
    reserved for 'unknown size' and never emitted)."""
    assert len(_ebml_size(0)) == 1
    assert len(_ebml_size(126)) == 1
    assert len(_ebml_size(127)) == 2  # 127 would be the 1-byte all-ones
    assert len(_ebml_size(16382)) == 2
    assert len(_ebml_size(16383)) == 3
    # round trip through the parser's reader
    from eeecs485_p4_mapreduce_spark.operators.multimodal import (
        _ebml_read_vint,
    )

    for n in (0, 1, 126, 127, 128, 16382, 16383, 2**28 - 2):
        v, w = _ebml_read_vint(_ebml_size(n), 0, keep_marker=False)
        assert (v, w) == (n, len(_ebml_size(n)))


def test_ebml_hand_computed_layout():
    """Byte-for-byte layout check: header(20) + segment(4 + vint +
    info(12) + clusters). One cluster of one 30-byte frame: block
    payload 34 -> block el 1+1+34=36, cluster content 4+36=40, cluster
    el 4+1+40=45, segment content 12+45=57 (<127 -> 1-byte vint),
    file = 20 + 4 + 1 + 57 = 82."""
    b = encode_mkv(1_000_000, [(500, [30])])
    assert len(b) == 82
    info = parse_mkv_ebml(b)
    # elements: EBML header + EBMLVersion + DocType + Segment + Info +
    # TimestampScale + Cluster + Timestamp + SimpleBlock = 9
    assert info == {
        "n_elements": 9,
        "n_clusters": 1,
        "n_blocks": 1,
        "frame_bytes": 30,
        "timestamp_scale": 1_000_000,
        "last_cluster_ts": 500,
        "file_bytes": 82,
    }


def test_ebml_strictness():
    b = encode_mkv(1_000_000, [(100, [40, 50]), (200, [60])])
    # truncation anywhere in the tail overruns a declared size
    with pytest.raises(ValueError):
        parse_mkv_ebml(b[:-1])
    # unknown element id
    with pytest.raises(ValueError):
        parse_mkv_ebml(b"\xec\x81\x00")  # Void element: real but unknown here
    # a block on a track other than 1
    bad = bytearray(b)
    idx = b.find(b"\xa3")  # first SimpleBlock id
    # block payload starts after id + 1-byte size; patch the track VINT
    bad[idx + 2] = 0x82  # track 2
    with pytest.raises(ValueError):
        parse_mkv_ebml(bytes(bad))
    # garbage appended after the segment
    with pytest.raises(ValueError):
        parse_mkv_ebml(b + b"\x00")


def test_ebml_fuzz_single_byte_flips_never_parse_silently_wrong():
    """Every single-byte flip either raises or changes a reported
    stat — the walker never returns the original stats from a
    corrupted file (frame fill bytes are the only don't-care bytes,
    and flipping one changes nothing the walker reports, so those
    flips must still PARSE; structural bytes must raise or shift)."""
    b = encode_mkv(700_000, [(120, [10])])
    ref = parse_mkv_ebml(b)
    silent_wrong = 0
    for i in range(len(b)):
        q = bytearray(b)
        q[i] ^= 0x01
        try:
            got = parse_mkv_ebml(bytes(q))
        except ValueError:
            continue
        if got == ref and q != bytearray(b):
            # the only bytes allowed to be don't-care: frame fill (10),
            # the block's relative timestamp (2, not reported), the
            # block flags byte (1), and the EBMLVersion payload (1)
            silent_wrong += 1
    assert silent_wrong <= 14, silent_wrong


# --- sessionization: brute-force Python reference ---------------------------


def test_sessionize_against_python_reference(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by_user: dict = {}
    for u, e, us in rows:
        by_user.setdefault(u, []).append((us, e))
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        sessions = []
        for us, _ in evs:
            if not sessions or us - sessions[-1][-1] > staged_r20.SESSION_GAP_US:
                sessions.append([us])
            else:
                sessions[-1].append(us)
        expect[u] = (
            len(evs),
            len(sessions),
            max(len(s) for s in sessions),
            sum(s[-1] - s[0] for s in sessions),
        )
    got = {
        r["user_id"]: (
            r["n_events"],
            r["n_sessions"],
            r["max_session_events"],
            r["active_us"],
        )
        for r in staged_r20.q111_sessionize(spark, sf_dir)
        .toPandas()
        .to_dict("records")
    }
    assert got == expect


# --- Zipf octaves: Counter reference ----------------------------------------


def test_zipf_rank_mass_against_counter(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    texts = con.sql(
        f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    c: Counter = Counter()
    for (t,) in texts:
        for tok in re.split(r"[ \t]", t.lower()):
            if tok:
                c[tok] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    octs: dict = {}
    for i, (_, freq) in enumerate(ranked):
        o = (i + 1).bit_length() - 1
        n, m = octs.get(o, (0, 0))
        octs[o] = (n + 1, m + freq)
    got = {
        r["octave"]: (r["n_tokens"], r["mass"])
        for r in staged_r20.ta_zipf_rank_mass(spark, sf_dir)
        .toPandas()
        .to_dict("records")
    }
    assert got == octs
    df = staged_r20.ta_zipf_rank_mass(spark, sf_dir).toPandas()
    assert int(df["mass"].sum()) == total  # octaves partition the ranks


# --- fertility census: pure-Python regex recount -----------------------------


def test_fertility_census_against_python(spark, sf_dir):
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT lang, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    bpe_pat = re.compile(r"[a-z0-9]+|[^a-z0-9 ]")
    word_pat = re.compile(r"[a-z0-9]+")
    agg: dict = {}
    for lang, text in rows:
        d = agg.setdefault(lang, [0, 0, 0, 0])
        d[0] += 1
        d[1] += len(word_pat.findall(text))
        d[2] += len(bpe_pat.findall(text))
        d[3] += len(text.encode("utf-8"))
    got = {
        r["lang"]: (r["n_docs"], r["n_words"], r["n_bpe_tokens"], r["n_bytes"])
        for r in staged_r20.ta_fertility_census(spark, sf_dir)
        .toPandas()
        .to_dict("records")
    }
    assert got == {k: tuple(v) for k, v in agg.items()}


# --- IVF-PQ rerank curve: monotonicity invariant -----------------------------


def test_rerank_recall_monotone_in_budget(spark, sf_dir):
    """A bigger exact-rerank budget can only add candidates the exact
    scorer may promote, so recall@k is non-decreasing in R — the
    invariant that makes the curve a tuning instrument."""
    df = (
        staged_r20.sim_ivfpq_rerank_recall(spark, sf_dir)
        .toPandas()
        .sort_values(["query_id", "rerank_r"])
    )
    assert set(df["rerank_r"]) == set(staged_r20.RERANK_RS)
    for _, grp in df.groupby("query_id"):
        overlaps = grp.sort_values("rerank_r")["n_overlap"].tolist()
        assert overlaps == sorted(overlaps), overlaps
        assert all(0 <= o <= 10 for o in overlaps)


# --- partition histogram: hashlib reference ----------------------------------


def test_partition_histogram_against_hashlib(spark, sf_dir):
    """The partition assignment must agree with a hashlib recount of
    the repo's hash32 routing (first 8 md5 hex chars mod W — the same
    32-bit convention every fingerprint in functions/text.py uses)
    key for key, and the loads must sum to the table size."""
    import hashlib

    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    expect: dict = {}
    keys: dict = {}
    for (u,) in rows:
        p = int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % (
            staged_r20.SKEW_HIST_W
        )
        expect[p] = expect.get(p, 0) + 1
        keys.setdefault(p, set()).add(u)
    got = {
        r["partition_id"]: (r["n_rows"], r["n_keys"])
        for r in staged_r20.skew_partition_histogram(spark, sf_dir)
        .toPandas()
        .to_dict("records")
    }
    assert got == {p: (n, len(keys[p])) for p, n in expect.items()}
    assert sum(n for n, _ in got.values()) == len(rows)


# --- SCD2: structural invariants ---------------------------------------------


def test_scd2_interval_invariants(spark, sf_dir):
    """Per user: versions are 1..n contiguous, intervals chain exactly
    (valid_to == next valid_from, -1 only on the single current row),
    adjacent versions change tier, and version event counts sum to the
    user's event count."""
    import duckdb

    df = (
        staged_r20.q113_scd2_dimension(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "version"])
    )
    con = duckdb.connect()
    totals = dict(
        con.sql(
            f"SELECT user_id, count(*) FROM "
            f"read_parquet('{sf_dir}/events.parquet') GROUP BY user_id"
        ).fetchall()
    )
    for uid, grp in df.groupby("user_id"):
        assert grp["version"].tolist() == list(range(1, len(grp) + 1))
        assert grp["is_current"].sum() == 1
        assert grp.iloc[-1]["is_current"] == 1
        assert grp.iloc[-1]["valid_to_us"] == -1
        for i in range(len(grp) - 1):
            assert grp.iloc[i]["valid_to_us"] == grp.iloc[i + 1][
                "valid_from_us"
            ]
            assert grp.iloc[i]["tier"] != grp.iloc[i + 1]["tier"]
        assert grp["n_events"].sum() == totals[uid]


# --- protobuf wire codec ------------------------------------------------------

PB_EDGE_ROWS = [
    (0, "web", None, 0, [0]),
    (-1, "web", "", -1, [1, 127, 128, 16383, 16384]),
    (2**62, "books", 'pró ✓ "q"', -(2**40), [2**63, 2**64 - 1]),
    (-(2**63), "s", "line\nbreak", 2**62, []),
    (63, "x" * 300, "y" * 300, -63, [5] * 40),  # 2-byte length varints
]


def test_pb_roundtrip_edge_values():
    from eeecs485_p4_mapreduce_spark.operators.staged_r20 import (
        decode_pb_blob,
        encode_pb_blob,
    )

    b = encode_pb_blob(PB_EDGE_ROWS)
    assert decode_pb_blob(b) == PB_EDGE_ROWS


def test_pb_negative_int64_is_ten_bytes():
    from eeecs485_p4_mapreduce_spark.operators.staged_r20 import _pb_varint

    for n in (-1, -(2**40), -(2**63)):
        assert len(_pb_varint(n)) == 10  # the spec's two's-complement rule
    assert len(_pb_varint(0)) == 1
    assert len(_pb_varint(127)) == 1
    assert len(_pb_varint(128)) == 2


def test_pb_zigzag_sign_boundaries():
    from eeecs485_p4_mapreduce_spark.operators.staged_r20 import (
        _pb_unzigzag,
        _pb_zigzag,
    )

    # spec examples: 0->0, -1->1, 1->2, -2->3
    assert [_pb_zigzag(n) for n in (0, -1, 1, -2, 2)] == [0, 1, 2, 3, 4]
    for n in (0, -1, 1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        assert _pb_unzigzag(_pb_zigzag(n)) == n


def test_pb_strictness():
    from eeecs485_p4_mapreduce_spark.operators.staged_r20 import (
        _pb_varint,
        decode_pb_blob,
        encode_pb_blob,
    )

    b = encode_pb_blob(PB_EDGE_ROWS)
    with pytest.raises(ValueError):
        decode_pb_blob(b[:-1])  # truncation
    # unknown field number 6 (varint 0x30)
    msg = _pb_varint(6 << 3 | 0) + _pb_varint(1)
    with pytest.raises(ValueError):
        decode_pb_blob(_pb_varint(len(msg)) + msg)
    # missing mandatory field (only field 1 present)
    msg = _pb_varint(1 << 3 | 0) + _pb_varint(7)
    with pytest.raises(ValueError):
        decode_pb_blob(_pb_varint(len(msg)) + msg)
    # wrong wire type for field 2
    msg = _pb_varint(2 << 3 | 0) + _pb_varint(7)
    with pytest.raises(ValueError):
        decode_pb_blob(_pb_varint(len(msg)) + msg)
    # varint longer than 10 bytes
    with pytest.raises(ValueError):
        decode_pb_blob(b"\xff" * 11)


def test_pb_single_byte_mutation_fuzz():
    """Corruption must raise or change decoded data — never return the
    original rows from different bytes (string payload bytes decode to
    different strings, caught by the data comparison)."""
    from eeecs485_p4_mapreduce_spark.operators.staged_r20 import (
        decode_pb_blob,
        encode_pb_blob,
    )

    b = encode_pb_blob(PB_EDGE_ROWS[:3])
    silent = 0
    for i in range(len(b)):
        q = bytearray(b)
        q[i] ^= 0xFF
        try:
            if decode_pb_blob(bytes(q)) == PB_EDGE_ROWS[:3]:
                silent += 1
        except (ValueError, UnicodeDecodeError):
            continue
    assert silent == 0, silent


# --- streaming SCD2: merge really happens incrementally ----------------------


def test_stream_scd2_processes_multiple_batches(spark, sf_dir, monkeypatch):
    """The batch-equivalence oracle is only meaningful if the stream
    actually merged MULTIPLE time slices — a degenerate single batch
    would make the test vacuous. Count merge invocations."""
    calls = []
    orig = staged_r20._scd2_merge

    def spy(dim, bver):
        calls.append(dim is None)
        return orig(dim, bver)

    monkeypatch.setattr(staged_r20, "_scd2_merge", spy)
    df = staged_r20.stream_scd2_incremental(spark, sf_dir)
    n = df.count()
    assert n > 0
    assert len(calls) >= 3, f"expected >=3 micro-batches, got {len(calls)}"
    assert calls[0] is True  # first batch initializes
    assert all(c is False for c in calls[1:])  # the rest truly merge


# --- skyline: brute-force dominance reference on adversarial points ---------


def test_skyline_dominance_edge_cases(spark):
    """Synthetic point set exercising every tie shape: duplicate points
    (both survive), equal-x lower-y (dominated), equal-y lower-x
    (dominated), a staircase frontier, and an interior point. Checked
    against the quadratic textbook dominance definition."""
    pts = [
        (1, 10, 1),  # staircase member (highest y)
        (2, 10, 1),  # duplicate x,y of id 1's coords? no: unique ids
        (3, 8, 3),
        (4, 8, 3),   # exact duplicate of id 3 -> BOTH survive
        (5, 8, 2),   # equal-x lower-y -> dominated by 3/4
        (6, 5, 3),   # equal-y lower-x -> dominated by 3/4
        (7, 12, 0),  # staircase member (highest x)
        (8, 6, 1),   # interior -> dominated
        (9, 10, 1),  # duplicate of (10,1): survives iff (10,1) is on
                     # the frontier and nothing dominates it
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        r["id"]
        for r in staged_r20._skyline_2d(df, "x", "y").toPandas().to_dict(
            "records"
        )
    }
    # quadratic reference
    def dominated(p, q):
        return (
            q[1] >= p[1]
            and q[2] >= p[2]
            and (q[1] > p[1] or q[2] > p[2])
        )

    expect = {
        p[0] for p in pts if not any(dominated(p, q) for q in pts if q != p)
    }
    assert got == expect
    # the adversarial shapes really are present
    assert {3, 4} <= expect  # duplicates both survive
    assert 5 not in expect and 6 not in expect and 8 not in expect


# --- survivorship: consistency with the registered dedup operators -----------


def test_survivorship_consistent_with_registered_dedup(spark, sf_dir):
    """The report's totals must reconcile with the registered operators
    it composes: exact-dropped = docs minus distinct md5 fingerprints,
    and survivors = |dedup_near_survivors ∩ exact keepers| computed
    from the registered near-survivor query itself."""
    from eeecs485_p4_mapreduce_spark.operators.dedup import (
        dedup_near_survivors,
    )
    from pyspark.sql import functions as F
    from eeecs485_p4_mapreduce_spark.catalog import load_table

    rep = staged_r20.curate_survivorship_report(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_fp = docs.select(F.md5("text")).distinct().count()
    assert int(rep["n_docs"].sum()) == n_docs
    assert int(rep["n_exact_dropped"].sum()) == n_docs - n_fp
    near_surv = dedup_near_survivors(spark, sf_dir).select("doc_id")
    keepers = (
        docs.withColumn(
            "k",
            (
                F.col("doc_id")
                == F.min("doc_id").over(
                    __import__("pyspark").sql.window.Window.partitionBy(
                        F.md5("text")
                    )
                )
            ).cast("int"),
        )
        .filter("k = 1")
        .select("doc_id")
    )
    expected_survivors = near_surv.join(keepers, "doc_id", "left_semi").count()
    assert int(rep["n_survivors"].sum()) == expected_survivors
