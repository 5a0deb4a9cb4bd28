"""Text-analysis operators over the `documents` table: token statistics,
quality scoring, language ID, fingerprinting, n-gram frequencies, BPE-ish
token counting. These are the per-document scoring passes of a training-data
pipeline — at 100 TB they run as pure map-side column expressions (no
shuffle except the final aggregations), so throughput is scan-bound.

All ratios are exact int/int divisions and all hashes are md5-derived, so
every query here has a bit-exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eeecs485_p4_mapreduce_spark.catalog import load_table
from eeecs485_p4_mapreduce_spark.functions.text import (
    STOPWORDS,
    count_in_list,
    hash32,
    tokens,
)
from eeecs485_p4_mapreduce_spark.registry import query

_DUCK_TOKS = "string_split_regex(lower(text), '[ \t]')"


@query(
    "ta_token_stats",
    oracle=f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct,
           round(list_aggregate(list_transform(toks, t -> len(t)), 'sum')
                 * 1.0 / len(toks), 4) AS avg_token_len,
           n_chars
    FROM (SELECT doc_id, n_chars, {_DUCK_TOKS} AS toks FROM documents)
    """,
)
def ta_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens()).alias("n_tokens"),
        F.size(F.array_distinct(tokens())).alias("n_distinct"),
        F.round(
            F.expr(
                "aggregate(transform(split(lower(text), '[ \t]'), t -> length(t)),"
                " 0L, (acc, x) -> acc + x)"
            )
            * F.lit(1.0)
            / F.size(tokens()),
            4,
        ).alias("avg_token_len"),
        "n_chars",
    )


_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@query(
    "ta_quality_score",
    oracle=f"""
    SELECT doc_id,
           round(len(list_filter(toks, t -> t IN ({_EN}))) * 1.0 / len(toks), 4)
             AS stopword_ratio,
           round(len(list_filter(toks, t -> regexp_full_match(t, '[a-z]+')))
                 * 1.0 / len(toks), 4) AS alpha_ratio,
           round(1.0 - len(list_distinct(toks)) * 1.0 / len(toks), 4)
             AS repetition_ratio,
           CASE WHEN len(toks) BETWEEN 20 AND 2000
                     AND len(list_filter(toks, t -> t IN ({_EN}))) * 1.0
                         / len(toks) < 0.5
                     AND 1.0 - len(list_distinct(toks)) * 1.0 / len(toks) < 0.9
                THEN 1 ELSE 0 END AS keep
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents)
    """,
)
def ta_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality gates: stopword density, alphabetic
    fraction, repetition, and a hard keep/drop verdict. Exact integer
    ratios (no float accumulation) so the verdict is engine-portable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = "split(lower(text), '[ \t]')"
    stop_cnt = count_in_list(toks, STOPWORDS["en"])
    alpha_cnt = f"size(filter({toks}, t -> t rlike '^[a-z]+$'))"
    n = f"size({toks})"
    dist = f"size(array_distinct({toks}))"
    return docs.selectExpr(
        "doc_id",
        f"round(cast({stop_cnt} as double) / {n}, 4) AS stopword_ratio",
        f"round(cast({alpha_cnt} as double) / {n}, 4) AS alpha_ratio",
        f"round(1.0e0 - cast({dist} as double) / {n}, 4) AS repetition_ratio",
        f"CASE WHEN {n} BETWEEN 20 AND 2000"
        f" AND cast({stop_cnt} as double) / {n} < 0.5"
        f" AND 1.0e0 - cast({dist} as double) / {n} < 0.9"
        f" THEN 1 ELSE 0 END AS keep",
    )


def _lang_hits_sql(duck: bool) -> dict[str, str]:
    out = {}
    for lang, words in STOPWORDS.items():
        quoted = ", ".join(f"'{w}'" for w in words)
        if duck:
            out[lang] = f"len(list_filter(toks, t -> t IN ({quoted})))"
        else:
            out[lang] = f"size(filter(toks, t -> t in ({quoted})))"
    return out


_DH = _lang_hits_sql(duck=True)
_SH = _lang_hits_sql(duck=False)


@query(
    "ta_langid",
    oracle=f"""
    SELECT doc_id, lang,
           CASE WHEN {_DH['en']} >= {_DH['de']} AND {_DH['en']} >= {_DH['fr']}
                     AND {_DH['en']} >= {_DH['es']} THEN 'en'
                WHEN {_DH['de']} >= {_DH['fr']} AND {_DH['de']} >= {_DH['es']}
                     THEN 'de'
                WHEN {_DH['fr']} >= {_DH['es']} THEN 'fr'
                ELSE 'es' END AS predicted_lang,
           {_DH['en']} AS hits_en, {_DH['de']} AS hits_de,
           {_DH['fr']} AS hits_fr, {_DH['es']} AS hits_es
    FROM (SELECT doc_id, lang, {_DUCK_TOKS} AS toks FROM documents)
    """,
)
def ta_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (n-gram heuristic family). Deterministic
    argmax with a fixed tiebreak order; the true `lang` column rides along
    so accuracy is measurable downstream."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("toks", tokens())
        .selectExpr(
            "doc_id",
            "lang",
            f"CASE WHEN {_SH['en']} >= {_SH['de']} AND {_SH['en']} >= {_SH['fr']}"
            f" AND {_SH['en']} >= {_SH['es']} THEN 'en'"
            f" WHEN {_SH['de']} >= {_SH['fr']} AND {_SH['de']} >= {_SH['es']} THEN 'de'"
            f" WHEN {_SH['fr']} >= {_SH['es']} THEN 'fr'"
            f" ELSE 'es' END AS predicted_lang",
            f"{_SH['en']} AS hits_en",
            f"{_SH['de']} AS hits_de",
            f"{_SH['fr']} AS hits_fr",
            f"{_SH['es']} AS hits_es",
        )
    )


@query(
    "ta_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS fp_md5,
           CASE WHEN len(text) >= 8 THEN
             list_min(list_transform(range(len(text) - 7),
               i -> CAST(CAST(concat('0x', substr(md5(substr(text, i + 1, 8)), 1, 8))
                         AS UBIGINT) AS BIGINT)))
           ELSE CAST(CAST(concat('0x', substr(md5(text), 1, 8)) AS UBIGINT) AS BIGINT)
           END AS fp_winnow,
           string_split_regex(lower(text), '[ \t]')[1] AS first_token,
           string_split_regex(lower(text), '[ \t]')[-1] AS last_token
    FROM documents
    """,
)
def ta_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact (md5) + winnowing-style rolling hash
    (min 32-bit hash over all 8-char windows — order-free, so it's stable
    under any partitioning; the winnowing family is public Rabin-Karp /
    MOSS-style fingerprinting). ~length(text) md5 calls per row, so the
    under-split bench source is spread to core width first (no-op on a
    properly-split table)."""
    from eeecs485_p4_mapreduce_spark.catalog import spread_small_source

    docs = spread_small_source(load_table(spark, sf_dir, "documents"))
    win_hash = hash32("substring(text, i, 8)")
    return docs.selectExpr(
        "doc_id",
        "md5(text) AS fp_md5",
        f"CASE WHEN length(text) >= 8 THEN "
        f"array_min(transform(sequence(1, length(text) - 7), i -> {win_hash})) "
        f"ELSE {hash32('text')} END AS fp_winnow",
        "element_at(split(lower(text), '[ \t]'), 1) AS first_token",
        "element_at(split(lower(text), '[ \t]'), -1) AS last_token",
    )


@query(
    "ta_top_bigrams",
    oracle="""
    SELECT bigram, count(*) AS cnt
    FROM (
      SELECT unnest(list_transform(range(len(toks) - 1),
                    i -> toks[i + 1] || ' ' || toks[i + 2])) AS bigram
      FROM (SELECT string_split_regex(lower(text), '[ \t]') AS toks
            FROM documents)
      WHERE len(toks) >= 2
    )
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 50
    """,
)
def ta_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level bigram frequencies (top 50, deterministic tiebreak).
    Scale: bigram explosion is map-side; the agg is partial, and only the
    top-k crosses to the driver via TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("toks", tokens())
        .filter(F.size("toks") >= 2)
        .selectExpr(
            "explode(transform(sequence(1, size(toks) - 1),"
            " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))))"
            " AS bigram"
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(50)
    )


@query(
    "ta_bpe_token_count",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+')) AS n_word_tokens,
           n_chars,
           coalesce(round(n_chars * 1.0
                 / nullif(len(regexp_extract_all(text,
                               '[a-z0-9]+|[^a-z0-9 ]')), 0), 4), 0.0)
             AS chars_per_token
    FROM documents
    """,
)
def ta_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with a BPE-ish regex segmentation (words + isolated
    punctuation), the standard cheap proxy for LLM token budgeting."""
    docs = load_table(spark, sf_dir, "documents")
    pat = "[a-z0-9]+|[^a-z0-9 ]"
    return docs.selectExpr(
        "doc_id",
        f"size(regexp_extract_all(text, '{pat}', 0)) AS n_bpe_tokens",
        "size(regexp_extract_all(text, '[a-z0-9]+', 0)) AS n_word_tokens",
        "n_chars",
        # NULL-safe: a token-free doc (empty text) has 0 chars/token,
        # not a divide-by-zero (adversarial-corpus sweep, r12)
        f"coalesce(round(cast(n_chars as double)"
        f" / nullif(size(regexp_extract_all(text, '{pat}', 0)), 0), 4),"
        " 0.0d) AS chars_per_token",
    )


# ---------------------------------------------------------------------------
# Corpus-level inverted-index statistics: per-token document frequency and
# IDF. Scale: the per-doc distinct is map-side (array_distinct inside the
# row), so the only shuffle is the partial-aggregated exchange on token —
# vocabulary cardinality, not corpus cardinality. The corpus size N is a
# one-row broadcast, not a window over the whole table.
# ---------------------------------------------------------------------------
@query(
    "ta_doc_frequency",
    oracle=f"""
    SELECT token,
           count(*) AS df,
           round((SELECT count(*) FROM documents) * 1.0 / count(*), 6)
             AS inv_doc_ratio,
           round(ln((SELECT count(*) FROM documents) * 1.0 / count(*)), 6)
             AS idf
    FROM (SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS token
          FROM documents)
    GROUP BY token
    """,
)
def ta_doc_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document frequency + IDF per token — the statistics half of an
    inverted index (reference analog: word count's `groupBy(key)` shuffle,
    /root/reference/tests/testdata/exec/wc_reduce.sh:14, keyed on distinct
    docs instead of occurrences)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = (
        docs.select("doc_id", F.explode(F.array_distinct(tokens())).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return df.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        F.round(F.col("n_docs") / F.col("df"), 6).alias("inv_doc_ratio"),
        F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"),
    )


@query(
    "ta_tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token
    ), idf AS (
      SELECT token,
             round(ln((SELECT count(*) FROM documents) * 1.0 / count(DISTINCT doc_id)), 6)
               AS idf
      FROM toks GROUP BY token
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, idf.idf,
             round(tf.tf * idf.idf, 6) AS tfidf,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY round(tf.tf * idf.idf, 6) DESC, tf.token)
               AS rnk
      FROM tf JOIN idf USING (token)
    )
    SELECT doc_id, token, tf, idf, tfidf, rnk FROM scored WHERE rnk <= 5
    """,
)
def ta_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document. Scale notes: the IDF table is
    vocabulary-sized (orders of magnitude smaller than the corpus), so it is
    broadcast to the term-frequency side; the only big-data shuffles are the
    (doc, token) partial agg and the per-doc window. Ranking ties break on
    the rounded score then token text, so the result is deterministic."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens()).alias("token"))
    # Pin tf: it feeds BOTH the idf derivation and the scoring join.
    # Unpinned, Catalyst planned the idf branch as its own
    # tokenize+distinct over the scan — a second full corpus pass at
    # 100 TB; checkpointed (lazily), one tokenize pass feeds both
    # consumers. KEPT as a checkpoint after the r15 pin A/B: a
    # DISK_ONLY persist pin removes the one plan-build job but pays a
    # serialize+reread round-trip on the token-grain table every
    # consumer — fresh-process min-of-3 totals 0.97 s (ckpt) vs 1.31 s
    # (persist); the checkpoint's in-memory RDD wins for token-grain
    # reuse.
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # df per token = number of tf rows for that token (count of distinct
    # docs containing it).
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select("token", F.round(F.log(F.col("n_docs") / F.col("df")), 6).alias("idf"))
    )
    scored = (
        tf.join(F.broadcast(idf), "token")
        .withColumn("tfidf", F.round(F.col("tf") * F.col("idf"), 6))
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("tfidf").desc(), F.col("token")
                )
            ),
        )
    )
    return scored.filter(F.col("rnk") <= 5).select(
        "doc_id", "token", "tf", "idf", "tfidf", "rnk"
    )


# ---------------------------------------------------------------------------
# Unigram-LM quality scoring (the cheap stand-in for CCNet's LM perplexity
# filter): score every document by the average log-probability of its
# tokens under the corpus's own unigram distribution; ppl_proxy = exp(-avg)
# is the per-token perplexity. Scale: the unigram table is vocabulary-sized
# and broadcast; the corpus-side flow is explode → broadcast join →
# per-doc agg, i.e. one shuffle keyed on doc_id. Floating point: each token
# log-prob is a deterministic single-value ln(); the per-doc sum spans at
# most the doc's token count, so round(4) absorbs order-of-addition noise.
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# PII detection + redaction: the scrub pass every training corpus runs
# before the tokenizer. Emails, phone numbers, and IPv4 literals are
# matched with patterns valid in BOTH regex dialects in play (Java for
# Spark, RE2 for the DuckDB oracle) — no lookarounds, no \b — and
# replaced with typed placeholder tags. The synthetic corpus contains no
# PII, so the query first augments each document with contact strings
# derived deterministically from doc_id; both engines apply the identical
# augmentation, which makes the oracle a real end-to-end check of the
# match+replace semantics (counts AND the md5 of the scrubbed text), not
# a vacuous all-zeros pass. Scale: pure map-side regex over the scan —
# zero shuffles, whole-stage codegen.
# ---------------------------------------------------------------------------
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


@query(
    "ta_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(aug, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(aug, '{_PII_PHONE}')) AS n_phones,
           len(regexp_extract_all(
             regexp_replace(aug, '{_PII_EMAIL}', '<EMAIL>', 'g'), '{_PII_IP}'))
             AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
                 aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_IP}', '<IP>', 'g')) AS scrub_md5,
           len(aug) - len(regexp_replace(regexp_replace(regexp_replace(
                 aug, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g'),
                 '{_PII_IP}', '<IP>', 'g')) AS chars_removed
    FROM (
      SELECT doc_id,
             text || ' contact user' || doc_id
                  || '@mail.example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
               AS aug
      FROM documents
    )
    """,
)
def ta_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@mail.example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1"),
        ).alias("aug"),
    )
    # IP counting runs AFTER email redaction on both sides: the mail
    # domain would otherwise never match, but ordering is still pinned
    # so the engines agree by construction, not by accident.
    # The intermediates are separate withColumn steps, each referenced
    # more than once downstream, so CollapseProject keeps them as their
    # own projections and every regexp_replace runs ONCE per row — the
    # inline form re-ran the email scrub 3x and phone/ip 2x.
    staged = aug.withColumn(
        "no_email", F.regexp_replace(F.col("aug"), _PII_EMAIL, "<EMAIL>")
    ).withColumn(
        "scrubbed",
        F.regexp_replace(
            F.regexp_replace(F.col("no_email"), _PII_PHONE, "<PHONE>"),
            _PII_IP,
            "<IP>",
        ),
    )
    return staged.select(
        "doc_id",
        # Python-API calls only: a pattern routed through a Spark SQL
        # string literal would have its backslashes eaten by the parser.
        F.size(
            F.regexp_extract_all(F.col("aug"), F.lit(_PII_EMAIL), F.lit(0))
        ).alias("n_emails"),
        F.size(
            F.regexp_extract_all(F.col("aug"), F.lit(_PII_PHONE), F.lit(0))
        ).alias("n_phones"),
        F.size(
            F.regexp_extract_all(F.col("no_email"), F.lit(_PII_IP), F.lit(0))
        ).alias("n_ips"),
        F.md5(F.col("scrubbed")).alias("scrub_md5"),
        (F.length("aug") - F.length("scrubbed")).alias("chars_removed"),
    )


# ---------------------------------------------------------------------------
# Gopher-style within-document repetition signals: the share of token mass
# captured by the single most frequent unigram / bigram, and the fraction
# of trigram occurrences that are repeats of an earlier trigram. These are
# the "repetitious document" gates from the Gopher / MassiveText filtering
# rules (public: Rae et al. 2021, table A1), complementing the cross-doc
# boilerplate detector (curate_boilerplate) with purely row-local math.
# Scale: zero shuffles — every metric is a higher-order-function fold over
# the token array inside the row, so the pass is scan-bound. The whole
# computation sits in ONE lambda let-binding (`transform(array(toks), ...)`)
# so the tokenizer regex runs exactly once per row (see functions/text.py
# on CollapseProject inlining).
# ---------------------------------------------------------------------------
def _rep_struct(duck: bool) -> str:
    """The per-doc repetition metrics as one engine-portable struct expr:
    n tokens, top-unigram count, n/ distinct trigram counts, top-bigram
    count — integer fields only; ratios are derived (and rounded) outside."""
    if duck:
        toks = "string_split_regex(lower(text), '[ \t]')"
        top = "list_max(list_transform(list_distinct({a}), u -> len(list_filter({a}, x -> x = u))))"
        bigrams = (
            "CASE WHEN len(__t) >= 2 THEN list_transform(range(len(__t) - 1),"
            " i -> __t[i + 1] || ' ' || __t[i + 2]) ELSE [] END"
        )
        trigrams = (
            "CASE WHEN len(__t) >= 3 THEN list_transform(range(len(__t) - 2),"
            " i -> __t[i + 1] || ' ' || __t[i + 2] || ' ' || __t[i + 3])"
            " ELSE [] END"
        )
        return (
            "list_transform([{toks}], __t -> {{"
            "'n': len(__t), "
            "'top_uni': {top_t}, "
            "'top_bi': list_transform([{bigrams}], __b ->"
            " CASE WHEN len(__b) > 0 THEN {top_b} ELSE 0 END)[1], "
            "'n_tri': len(__t) - 2, "
            "'n_tri_distinct': list_transform([{trigrams}], __g ->"
            " len(list_distinct(__g)))[1]"
            "}})[1]"
        ).format(
            toks=toks,
            top_t=top.format(a="__t"),
            top_b=top.format(a="__b"),
            bigrams=bigrams,
            trigrams=trigrams,
        )
    toks = "split(lower(text), '[ \t]')"
    # Top-element multiplicity in O(n log n): sort, then one linear fold
    # tracking the current and best run length. The obvious
    # distinct×filter form is O(distinct · n) per document — measured
    # 2.5x slower on this corpus once the bigram gate tripled the work.
    top = (
        "aggregate(array_sort({a}),"
        " named_struct('prev', cast(null as string), 'run', 0, 'best', 0),"
        " (acc, x) -> named_struct("
        "   'prev', x,"
        "   'run', IF(acc.prev <=> x, acc.run + 1, 1),"
        "   'best', greatest(acc.best, IF(acc.prev <=> x, acc.run + 1, 1))),"
        " acc -> acc.best)"
    )
    bigrams = (
        "CASE WHEN size(__t) >= 2 THEN transform(sequence(1, size(__t) - 1),"
        " i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1)))"
        " ELSE array() END"
    )
    trigrams = (
        "CASE WHEN size(__t) >= 3 THEN transform(sequence(1, size(__t) - 2),"
        " i -> concat(element_at(__t, i), ' ', element_at(__t, i + 1), ' ',"
        " element_at(__t, i + 2))) ELSE array() END"
    )
    return (
        "transform(array({toks}), __t -> named_struct("
        "'n', size(__t), "
        "'top_uni', {top_t}, "
        "'top_bi', transform(array({bigrams}), __b ->"
        " CASE WHEN size(__b) > 0 THEN {top_b} ELSE 0 END)[0], "
        "'n_tri', size(__t) - 2, "
        "'n_tri_distinct', transform(array({trigrams}), __g ->"
        " size(array_distinct(__g)))[0]"
        "))[0]"
    ).format(
        toks=toks,
        top_t=top.format(a="__t"),
        top_b=top.format(a="__b"),
        bigrams=bigrams,
        trigrams=trigrams,
    )


@query(
    "ta_gopher_repetition",
    oracle=f"""
    SELECT doc_id,
           r.n AS n_tokens,
           round(r.top_uni * 1.0 / r.n, 4) AS top_unigram_share,
           round(CASE WHEN r.n >= 2 THEN r.top_bi * 1.0 / (r.n - 1) ELSE 0 END, 4)
             AS top_bigram_share,
           round(CASE WHEN r.n >= 3
                      THEN (r.n_tri - r.n_tri_distinct) * 1.0 / r.n_tri
                      ELSE 0 END, 4) AS dup_trigram_frac,
           CASE WHEN r.top_uni * 1.0 / r.n <= 0.2
                     AND (r.n < 2 OR r.top_bi * 1.0 / (r.n - 1) <= 0.18)
                     AND (r.n < 3 OR (r.n_tri - r.n_tri_distinct) * 1.0
                                     / r.n_tri <= 0.3)
                THEN 1 ELSE 0 END AS keep
    FROM (SELECT doc_id, {_rep_struct(duck=True)} AS r FROM documents)
    """,
)
def ta_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id", f"{_rep_struct(duck=False)} AS r"
    ).selectExpr(
        "doc_id",
        "r.n AS n_tokens",
        "round(cast(r.top_uni as double) / r.n, 4) AS top_unigram_share",
        "round(CASE WHEN r.n >= 2 THEN cast(r.top_bi as double) / (r.n - 1)"
        " ELSE 0.0e0 END, 4) AS top_bigram_share",
        "round(CASE WHEN r.n >= 3 THEN cast(r.n_tri - r.n_tri_distinct as double)"
        " / r.n_tri ELSE 0.0e0 END, 4) AS dup_trigram_frac",
        "CASE WHEN cast(r.top_uni as double) / r.n <= 0.2"
        " AND (r.n < 2 OR cast(r.top_bi as double) / (r.n - 1) <= 0.18)"
        " AND (r.n < 3 OR cast(r.n_tri - r.n_tri_distinct as double) / r.n_tri <= 0.3)"
        " THEN 1 ELSE 0 END AS keep",
    )


@query(
    "ta_unigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ),
    freq AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
    tot AS (SELECT count(*) AS t FROM toks)
    SELECT doc_id,
           count(*) AS n_tokens,
           round(sum(ln(c * 1.0 / t)) / count(*), 4) AS avg_logprob,
           round(exp(-sum(ln(c * 1.0 / t)) / count(*)), 4) AS ppl_proxy
    FROM toks JOIN freq USING (token), tot
    GROUP BY doc_id
    """,
)
def ta_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens()).alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    # total tokens from the vocabulary-sized freq table, not a third
    # corpus-wide explode pass — sum(c) is the same count by definition
    tot = freq.agg(F.sum("c").alias("t"))
    logp = F.log(F.col("c") / F.col("t"))
    return (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum(logp) / F.count(F.lit(1)), 4).alias("avg_logprob"),
            F.round(F.exp(-F.sum(logp) / F.count(F.lit(1))), 4).alias("ppl_proxy"),
        )
    )


@query(
    "ta_bpe_merge_candidates",
    oracle="""
    WITH ch AS (
      SELECT unnest([substr(t, i, 2) for i in range(1, length(t))]) AS pair
      FROM (SELECT lower(text) AS t FROM documents)
    )
    SELECT pair, count(*) AS n_occurrences FROM ch
    WHERE NOT regexp_matches(pair, '[ \t]')
    GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT 50
    """,
)
def ta_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction, step one of BPE training: count every
    adjacent character pair in the corpus (word-internal only — pairs
    touching whitespace are not merge candidates) and rank the top 50
    merge candidates with a deterministic tie-break.

    Scale: the generate fans out to ~n_chars rows per document, but the
    pair domain is bounded by alphabet² — partial (map-side) aggregation
    collapses the fanout before the exchange, so the shuffle carries at
    most a few thousand rows per task regardless of corpus size, and the
    top-50 is a TakeOrdered over the tiny aggregated table. This is the
    whole reason BPE counting distributes well: the hot loop is a
    generate feeding a hash-agg inside one codegen stage, no Python.
    """
    docs = load_table(spark, sf_dir, "documents")
    # length >= 2 guard is load-bearing: Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0] (DuckDB's range(1, 0) is empty), so a 0/1-char
    # document would fabricate pairs without it.
    # Split to a char array ONCE, then pair adjacent elements: a
    # substring(text, i, 2) per position re-walks the string's bytes
    # from the start (UTF-8 offsets aren't random-access), making the
    # generate O(n_chars^2) per document — measured 4.9s vs 1.8s at
    # sf0.1 for the same pairs.
    pairs = (
        docs.filter(F.length("text") >= 2)
        .selectExpr("split(lower(text), '') AS cs")
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(cs) - 1),"
                    " i -> concat(element_at(cs, i), element_at(cs, i + 1)))"
                )
            ).alias("pair")
        )
    )
    return (
        pairs.filter(~F.col("pair").rlike("[ \t]"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(50)
    )


@query(
    "ta_bigram_logprob",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 2 THEN
                 list_transform(range(len(toks) - 1),
                   i -> {{'w1': toks[i + 1], 'w2': toks[i + 2]}})
               ELSE [] END) AS b
      FROM t
    ),
    bgf AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    f2 AS (SELECT w1, w2, count(*) AS c2 FROM bgf GROUP BY 1, 2),
    f1 AS (SELECT w1, count(*) AS c1 FROM bgf GROUP BY 1)
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(sum(ln(c2 * 1.0 / c1)) / count(*), 4) + 0.0 AS avg_logprob
    FROM bgf JOIN f2 USING (w1, w2) JOIN f1 USING (w1)
    GROUP BY doc_id
    """,
)
def ta_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram-LM fluency score per document: avg ln p(w2 | w1)
    over the doc's bigrams, with p = corpus bigram count / corpus
    first-word count (no smoothing needed — every scored bigram is in
    the counts by construction). The bigram twin of ta_unigram_logprob;
    low scores flag disfluent/boilerplate text better than unigram
    frequency alone.

    Scale: bigram and first-word count tables reduce with map-side
    combine; the scoring joins are keyed on the bigram/word — ordinary
    hash exchanges whose width is the n-gram vocabulary, never the
    corpus. The >= 2-token guard dodges Spark's descending sequence(1, 0)
    pitfall."""
    docs = load_table(spark, sf_dir, "documents")
    bgf = (
        docs.selectExpr("doc_id", "split(lower(text), '[ \\t]') AS toks")
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), i ->"
                    " struct(element_at(toks, i) AS w1,"
                    " element_at(toks, i + 1) AS w2))"
                )
            ).alias("b"),
        )
        .select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    )
    f2 = bgf.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    f1 = bgf.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    logp = F.log(F.col("c2") * 1.0 / F.col("c1"))
    return (
        bgf.join(f2, ["w1", "w2"])
        .join(f1, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (
                F.round(F.sum(logp) / F.count(F.lit(1)), 4) + F.lit(0.0)
            ).alias("avg_logprob"),
        )
    )


@query(
    "ta_readability",
    oracle=r"""
    SELECT doc_id,
           n_sentences, n_words, n_vowel_groups,
           round(n_words * 1.0 / n_sentences, 4) AS words_per_sentence,
           round(n_vowel_groups * 1.0 / greatest(n_words, 1), 4)
             AS syllables_per_word,
           round(206.835 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_vowel_groups * 1.0 / greatest(n_words, 1)), 4)
             AS flesch_proxy
    FROM (
      SELECT doc_id,
             greatest(len(list_filter(string_split_regex(text, '[.!?]'),
                          s -> trim(s) <> '')), 1) AS n_sentences,
             len(list_filter(string_split_regex(lower(text), '[ \t]'),
                 t -> t <> '')) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
               AS n_vowel_groups
      FROM documents
    )
    """,
)
def ta_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability proxy per document — a standard quality
    feature (too-hard or degenerate text filters): words/sentence and
    vowel-group-per-word as the syllable proxy, combined with the Flesch
    constants. All regex-derived counts — pure map-side, zero shuffles;
    regexes stay in the Python API so the pattern survives unescaped
    (SQL-literal backslash pitfall)."""
    docs = load_table(spark, sf_dir, "documents")
    sentences = F.greatest(
        F.size(
            F.filter(
                F.split("text", "[.!?]"), lambda s: F.trim(s) != ""
            )
        ),
        F.lit(1),
    )
    words = F.size(
        F.filter(F.split(F.lower("text"), "[ \t]"), lambda t: t != "")
    )
    vowel_groups = F.size(
        F.expr("regexp_extract_all(lower(text), '[aeiou]+', 0)")
    ).cast("bigint")
    scored = docs.select(
        "doc_id",
        sentences.alias("n_sentences"),
        words.alias("n_words"),
        vowel_groups.alias("n_vowel_groups"),
    )
    wps = F.col("n_words") * 1.0 / F.col("n_sentences")
    spw = F.col("n_vowel_groups") * 1.0 / F.greatest("n_words", F.lit(1))
    return scored.select(
        "doc_id",
        "n_sentences",
        "n_words",
        "n_vowel_groups",
        F.round(wps, 4).alias("words_per_sentence"),
        F.round(spw, 4).alias("syllables_per_word"),
        F.round(206.835 - 1.015 * wps - 84.6 * spw, 4).alias("flesch_proxy"),
    )


ZIPF_TOP_N = 100


@query(
    "ta_zipf_slope",
    oracle=f"""
    WITH freq AS (
      SELECT token, count(*) AS c
      FROM (SELECT unnest({_DUCK_TOKS}) AS token FROM documents)
      WHERE token <> ''
      GROUP BY token
    ),
    ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, token) AS DOUBLE))
               AS lr,
             ln(CAST(c AS DOUBLE)) AS lf
      FROM freq
      ORDER BY c DESC, token
      LIMIT {ZIPF_TOP_N}
    )
    SELECT count(*) AS n_points,
           round((avg(lr * lf) - avg(lr) * avg(lf))
                 / (avg(lr * lr) - avg(lr) * avg(lr)), 5) + 0.0 AS zipf_slope,
           round(avg(lf) - (avg(lr * lf) - avg(lr) * avg(lf))
                 / (avg(lr * lr) - avg(lr) * avg(lr)) * avg(lr), 5) + 0.0
             AS zipf_intercept
    FROM ranked
    """,
)
def ta_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus: OLS slope/intercept of
    ln(frequency) on ln(rank) for the top-N tokens — a one-number corpus
    health check (natural language sits near -1; spammy or templated
    corpora drift). Scale: the frequency table reduces with map-side
    combine; top-N is a TakeOrdered on the vocabulary-sized aggregate
    (``orderBy(...).limit(N)`` plans as TakeOrderedAndProject — a
    per-partition heap, never a single-partition pass over the whole
    vocabulary); the regression runs over N rows, where the ranking
    window is N-row-sized. Ties rank deterministically by
    (count desc, token)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = (
        freq.orderBy(F.col("c").desc(), "token")
        .limit(ZIPF_TOP_N)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.col("c").desc(), "token")),
        )
        .select(
            F.log(F.col("rnk").cast("double")).alias("lr"),
            F.log(F.col("c").cast("double")).alias("lf"),
        )
    )
    slope = (
        F.avg(F.col("lr") * F.col("lf")) - F.avg("lr") * F.avg("lf")
    ) / (F.avg(F.col("lr") * F.col("lr")) - F.avg("lr") * F.avg("lr"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.round(slope, 5) + F.lit(0.0)).alias("zipf_slope"),
        (
            F.round(F.avg("lf") - slope * F.avg("lr"), 5) + F.lit(0.0)
        ).alias("zipf_intercept"),
    )


@query(
    "ta_js_divergence",
    oracle=f"""
    WITH freq AS (
      SELECT lang, token, count(*) AS c
      FROM (SELECT lang, unnest({_DUCK_TOKS}) AS token FROM documents)
      WHERE token <> ''
      GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM freq GROUP BY 1),
    p AS (
      SELECT freq.lang, token, c * 1.0 / tot.t AS p
      FROM freq JOIN tot USING (lang)
    ),
    hp AS (SELECT lang, sum(-p * ln(p)) AS h FROM p GROUP BY 1),
    expanded AS (
      SELECT least(p.lang, l2.lang) AS lang_a,
             greatest(p.lang, l2.lang) AS lang_b,
             token, p.p
      FROM p, (SELECT DISTINCT lang FROM p) l2
      WHERE l2.lang <> p.lang
    ),
    m AS (
      SELECT lang_a, lang_b, token, sum(p) / 2 AS m
      FROM expanded GROUP BY 1, 2, 3
    ),
    hm AS (
      SELECT lang_a, lang_b, sum(-m * ln(m)) AS h FROM m GROUP BY 1, 2
    )
    SELECT hm.lang_a, hm.lang_b,
           round(hm.h - (ha.h + hb.h) / 2, 5) + 0.0 AS jsd_nats
    FROM hm
    JOIN hp ha ON ha.lang = hm.lang_a
    JOIN hp hb ON hb.lang = hm.lang_b
    """,
)
def ta_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between every language pair's token
    distribution — the distributional-drift metric a pipeline tracks to
    detect mixture shifts between corpus snapshots (symmetric, bounded
    by ln 2, defined even when supports differ).

    Computed via the entropy identity JSD(P,Q) = H((P+Q)/2)
    - (H(P)+H(Q))/2, which needs NO outer join: each (lang, token)
    probability row expands to the pairs containing its language, the
    mixture m sums per (pair, token) — one-sided tokens contribute
    their -(p/2)ln(p/2) mixture mass automatically — and per-language
    entropies come straight off the probability table. Scale: the
    frequency table is vocabulary-sized with map-side combine; the
    expansion factor is |languages|-1, never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        # freq feeds tot, hp, AND the pair expansion: without the
        # checkpoint the tokenize+count subtree recomputes four times
        # (16 exchanges in the physical plan; ~4x the scan work at
        # 100 TB). The table is vocabulary-sized — cheap to pin.
        .localCheckpoint(eager=False)
    )
    tot = freq.groupBy("lang").agg(F.sum("c").cast("bigint").alias("t"))
    # tot is |languages| rows — broadcast, don't shuffle the vocabulary
    p = freq.join(F.broadcast(tot), "lang").select(
        "lang", "token", (F.col("c") * 1.0 / F.col("t")).alias("p")
    )
    hp = p.groupBy("lang").agg(
        F.sum(-F.col("p") * F.log("p")).alias("h")
    ).localCheckpoint(eager=False)  # |languages| rows; feeds BOTH sides of the pair join
    langs = hp.select(F.col("lang").alias("lang2"))
    expanded = (
        p.join(F.broadcast(langs), F.col("lang2") != F.col("lang"))
        .select(
            F.least("lang", "lang2").alias("lang_a"),
            F.greatest("lang", "lang2").alias("lang_b"),
            "token",
            "p",
        )
    )
    m = expanded.groupBy("lang_a", "lang_b", "token").agg(
        (F.sum("p") / 2).alias("m")
    )
    hm = m.groupBy("lang_a", "lang_b").agg(
        F.sum(-F.col("m") * F.log("m")).alias("h")
    )
    ha = hp.select(F.col("lang").alias("lang_a"), F.col("h").alias("h_a"))
    hb = hp.select(F.col("lang").alias("lang_b"), F.col("h").alias("h_b"))
    return (
        hm.join(F.broadcast(ha), "lang_a")
        .join(F.broadcast(hb), "lang_b")
        .select(
            "lang_a",
            "lang_b",
            (
                F.round(
                    F.col("h") - (F.col("h_a") + F.col("h_b")) / 2, 5
                )
                + F.lit(0.0)
            ).alias("jsd_nats"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005) — the
# frequent-items member of the engine's sketch family (HLL: q26/q59;
# theta: q73; quantile: q26). The sketch is d x w hashed counters built
# with ONE partial-aggregated groupBy into d*w cells (4096 longs here —
# mergeable across partitions, shards, and days exactly like the HLL
# sketches), and a token's estimate is the MIN over its d cells, which
# can never undershoot the true count and overshoots by <= e*N/w with
# probability 1 - e^-d per query. Output follows the q26 contract:
# exact DuckDB-computable columns (the true top-K tokens by exact
# count) plus deterministic sketch-bound booleans, so the row hash
# proves the sketch obeyed its guarantees on this corpus.
# ---------------------------------------------------------------------------
CMS_D = 4  # hash rows (seeds)
CMS_W = 1024  # counters per row
CMS_TOP_K = 10


def _cms_positions(col: str):
    """Exploded (seed, bucket) cells for a token column — ONE definition
    shared by the sketch build and the probe side, because a drifted
    copy would silently probe the wrong cells (same hygiene as
    relational.py's bloom_build/bloom_might_contain pair)."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("seed"),
                    F.pmod(
                        F.xxhash64(F.col(col), F.lit(s)), F.lit(CMS_W)
                    ).alias("bucket"),
                )
                for s in range(CMS_D)
            ]
        )
    )


@query(
    "ta_heavy_hitters_cms",
    oracle=f"""
    WITH toks AS (
      SELECT unnest({_DUCK_TOKS}) AS token FROM documents
    ), exact AS (
      SELECT token, count(*) AS n_exact FROM toks GROUP BY token
    )
    SELECT token, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(rnk AS BIGINT) AS rank,
           TRUE AS cms_ge_exact, TRUE AS cms_within_bound
    FROM (
      SELECT token, n_exact,
             row_number() OVER (ORDER BY n_exact DESC, token) AS rnk
      FROM exact
    ) WHERE rnk <= {CMS_TOP_K}
    """,
)
def ta_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-{CMS_TOP_K} corpus tokens, each verified against the
    Count-Min sketch: ``cms_ge_exact`` (the estimate never undershoots —
    a structural CMS invariant) and ``cms_within_bound`` (overshoot
    <= e*N/{CMS_W}, the classic accuracy guarantee with d={CMS_D} rows).
    Both booleans are deterministic for a fixed corpus + seeds, so they
    hash-match the oracle's literals; pytest additionally pins the raw
    estimate error. The exact top-k is orderBy().limit() over the
    vocabulary-sized count table (TakeOrdered, no global window); the
    sketch build is one groupBy over (seed, bucket) with map-side
    partial aggregation — at 100 TB the sketch is {CMS_D}x{CMS_W} longs
    per partition merged by the shuffle, the same mergeability story as
    the HLL daily sketches in q59."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens()).alias("token"))
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_exact"))
    topk = (
        exact.orderBy(F.col("n_exact").desc(), "token")
        .limit(CMS_TOP_K)
        .withColumn(
            "rank",
            F.row_number()
            .over(
                Window.orderBy(F.col("n_exact").desc(), "token")
            )
            .cast("long"),
        )
    )
    cms = (
        toks.select(_cms_positions("token").alias("cell"))
        .groupBy("cell.seed", "cell.bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )
    # every token lands in exactly one bucket per seed, so one seed's
    # row of the sketch already sums to the corpus token count — no
    # second corpus pass for N
    n_total = (
        cms.filter(F.col("seed") == 0)
        .agg(F.sum("cell_count").alias("n_total"))
    )
    probes = topk.select(
        "token", "n_exact", "rank", _cms_positions("token").alias("p")
    )
    est = (
        probes.join(
            cms,
            (probes["p.seed"] == cms["seed"])
            & (probes["p.bucket"] == cms["bucket"]),
        )
        .groupBy("token", "n_exact", "rank")
        .agg(F.min("cell_count").alias("cms_est"))
    )
    return est.crossJoin(F.broadcast(n_total)).select(
        "token",
        "n_exact",
        "rank",
        (F.col("cms_est") >= F.col("n_exact")).alias("cms_ge_exact"),
        (
            (F.col("cms_est") - F.col("n_exact")).cast("double")
            <= F.exp(F.lit(1.0)) * F.col("n_total") / F.lit(CMS_W)
        ).alias("cms_within_bound"),
    )
