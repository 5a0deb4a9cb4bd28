"""Multimodal column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched Pandas
UDFs over ``mapInPandas``.

The container has no image/audio libraries; every image decode layer is
nevertheless REAL, implemented from the public specs in pure
Python/numpy: HEADER decode (``parse_image_header`` walks actual JPEG
marker streams / PNG IHDR / GIF LSD / BMP DIB layouts — see
mm_image_dimensions), uncompressed-BMP PIXEL decode (``encode_bmp``/
``decode_bmp_pixels``/``resize_pixels``, the real 24-bpp byte layout —
see mm_bmp_thumbnail), COMPRESSED PNG pixel decode
(``decode_png_pixels``: chunk walk + CRC32 verification + the repo's
own RFC 1951 inflate
+ all five scanline unfilters; color types 0/2/3/4/6 incl. PLTE/tRNS
palettes, non-interlaced and Adam7), COMPRESSED GIF pixel decode
(``decode_gif_pixels``: variable-width LSB-first LZW implemented from
scratch, palettes, extension skipping, 4-pass de-interlace), and
baseline sequential JPEG decode (``decode_jpeg_pixels``: stream-read
DQT/DHT tables, Huffman + EXTEND entropy decoding, dequantize, inverse
DCT, YCbCr→RGB; 4:4:4/4:2:2/4:2:0 interleaved MCUs + DRI/RSTn restart
intervals — the camera-file layouts). PNG and GIF are grounded
against canonical real-world fixture bytes in tests; JPEG against its
matching spec-built encoder plus the independent header parser. Only
compressed AUDIO (MP3/AAC/Opus) remains a declared stub
(``decode_audio``; ``fake_feature_extract`` is the deterministic
stand-in those paths use).
Everything Spark-side is real and tested: schema, batch iteration,
partitioning, and the UDF signatures — swapping the compressed-format stub
for PIL/ffmpeg is a one-function change on the executors.

Scale notes: media blobs ride the DataFrame as binary columns, so column
pruning keeps them out of any query that doesn't touch them; feature
extraction is embarrassingly parallel mapInPandas (no shuffle), and the
Arrow batch size bounds executor memory regardless of blob sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from eeecs485_p4_mapreduce_spark.catalog import (
    load_table,
    spread_small_source,
)
from eeecs485_p4_mapreduce_spark.registry import query

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("format", StringType(), True),  # e.g. png/wav/mp4
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("head_hex", StringType(), True),
        StructField("byte_histogram", ArrayType(LongType()), True),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an encoded image to a uint8 pixel array whose channel
    count follows the SOURCE format: (h, w, 3) RGB for BMP/GIF/color
    JPEG/PNG color types 2 and alpha-free palettes, (h, w) grey for
    grey JPEG/PNG color type 0 — but PNG color type 4 (grey+alpha)
    yields (h, w, 2), color type 6 (RGBA) and palettes carrying a tRNS
    chunk yield (h, w, 4). Callers that assume 3 channels must check
    ``arr.ndim``/``arr.shape[-1]`` and composite or strip alpha
    themselves (the registry's mm_* queries all do).

    REAL for every format the header parser knows: uncompressed 24-bpp
    BMP (pure byte layout — decode_bmp_pixels), 8-bit PNG including
    palettes and Adam7 interlace (the repo's own RFC 1951 inflate +
    all five scanline unfilters — decode_png_pixels), GIF87a/89a (variable-width LZW
    implemented from scratch — decode_gif_pixels), and baseline
    sequential JPEG with 4:2:2/4:2:0 subsampling and restart intervals
    (Huffman + IDCT — decode_jpeg_pixels). Unrecognized magic raises
    NotImplementedError; formats outside each codec's declared subset
    (progressive JPEG, 16-bit PNG, ...) raise ValueError from the codec
    itself."""
    if payload[:2] == b"BM":
        return decode_bmp_pixels(payload)
    if payload[:8] == PNG_SIG:
        return decode_png_pixels(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif_pixels(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg_pixels(payload)
    raise NotImplementedError(
        "unrecognized image container; decoding it requires an imaging"
        " library"
    )


def decode_audio(payload: bytes) -> "object":
    """Decode encoded audio to (sample_rate, int16 sample array).

    REAL for RIFF/WAVE carrying PCM-16 or the G.711 companded codecs
    (u-law / A-law, expanded with the standard's exact segment
    arithmetic — see decode_wav_samples). For MPEG-1 Layer I the
    BITSTREAM decode is real down to sample-code requantization
    (parse_mpeg1_layer1_frames: header tables, slot math, allocations,
    scalefactors, MSB-first sample codes); only the float polyphase
    synthesis to PCM remains declared (mpeg1_layer1_synthesize), so
    this entry point still raises for it. Layer III/AAC/Opus
    perceptual decode stays a declared stub."""
    if payload[:4] == b"RIFF":
        return decode_wav_samples(payload)
    raise NotImplementedError(
        "compressed-audio decoding requires an audio library"
    )


def fake_feature_extract(payload: bytes, n_bins: int = 8) -> list[int]:
    """Deterministic stand-in for a real feature extractor: a byte-value
    histogram with ``n_bins`` buckets, vectorized (a per-byte Python loop
    dominates the batch otherwise). Exercises the exact same data path
    (bytes in, fixed-length vector out) a real decoder would."""
    import numpy as np

    b = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(b.astype(np.int64) * n_bins // 256, minlength=n_bins).tolist()


def extract_features(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over a binary `payload` column.

    mapInPandas streams Arrow batches through Python; memory is bounded by
    batch size, not partition size — the pattern for any real decoder.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(len),
                    "head_hex": payloads.map(lambda b: b[:4].hex().upper()),
                    "byte_histogram": payloads.map(fake_feature_extract),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: materialize the documents table as a media table (UTF-8
    payload bytes) so the binary pipeline has real data to chew on."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("utf8").alias("format"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


@query(
    "mm_payload_stats",
    oracle="""
    SELECT doc_id AS media_id,
           octet_length(encode(text)) AS n_bytes,
           upper(hex(encode(substr(text, 1, 4)))) AS head_hex
    FROM documents
    """,
)
def mm_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column round trip with an oracle: encode text → binary,
    pass through the Arrow mapInPandas feature path, return byte stats
    that SQL can recompute from the source column."""
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", "head_hex")


# DuckDB positional byte scan over the ASCII corpus (byte == code point),
# the same LATERAL range+substr pattern mm_frame_sample's oracle uses.
_DUCK_BYTE_POS = """
      FROM documents,
           LATERAL (SELECT unnest(range(octet_length(encode(text)))) AS i) i
"""
_HIST_BINS = ",\n               ".join(
    f"CAST(sum(CASE WHEN bin = {b} THEN 1 ELSE 0 END) AS BIGINT)"
    for b in range(8)
)


@query(
    "mm_byte_histogram",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, ascii(substr(text, CAST(i.i + 1 AS INT), 1)) * 8 // 256 AS bin
      {_DUCK_BYTE_POS}
    ),
    h AS (
      SELECT doc_id,
             concat_ws(',',
               {_HIST_BINS}) AS hist_csv
      FROM pos GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           coalesce(h.hist_csv, '0,0,0,0,0,0,0,0') AS hist_csv
    FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
    """,
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full fake-feature path including the fixed-length vector output —
    the shape a real image/audio embedding would have. The 8-bin histogram
    is serialized to CSV so the driver's pandas canonicalizer (which can't
    sort list cells) and the DuckDB oracle both see a plain string."""
    media = documents_as_media(spark, sf_dir)
    feats = extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        F.expr(
            "array_join(transform(byte_histogram, x -> cast(x as string)), ',')"
        ).alias("hist_csv"),
    )


THUMB_STRIDE = 16  # keep every 16th byte — the "resize" decimation factor
FRAME_BYTES = 32  # fake fixed-size frame for the video path
FRAME_STRIDE = 4  # sample every 4th frame

THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("thumb", BinaryType(), True),
        StructField("thumb_hex", StringType(), True),
    ]
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Resize an encoded image to (width, height), returning re-encoded
    bytes. REAL for uncompressed 24-bpp BMP: decode pixels, nearest-
    neighbor resample, re-encode (see mm_bmp_thumbnail). Compressed
    formats still need an imaging library (declared stub); the
    deterministic byte decimation below stands in for those paths."""
    if payload[:2] == b"BM":
        return encode_bmp(resize_pixels(decode_bmp_pixels(payload), width, height))
    raise NotImplementedError(
        "compressed-image resizing requires an imaging library"
    )


def fake_thumbnail(payload: bytes, stride: int = THUMB_STRIDE) -> bytes:
    """Deterministic 'resize': keep every stride-th byte. Binary in,
    (smaller) binary out — the exact dataflow shape of a real resize."""
    return payload[::stride]


def make_thumbnails(df: DataFrame) -> DataFrame:
    """mapInPandas binary→binary transform (the resize slot)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = pdf["payload"].map(fake_thumbnail)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "thumb": thumbs,
                    "thumb_hex": thumbs.map(lambda b: b.hex().upper()),
                }
            )

    return df.mapInPandas(run, schema=THUMB_SCHEMA)


@query(
    "mm_thumbnail",
    oracle=f"""
    WITH samp AS (
      SELECT doc_id,
             upper(string_agg(substr(hex(encode(text)),
                                     2 * i * {THUMB_STRIDE} + 1, 2),
                              '' ORDER BY i)) AS thumb_hex
      FROM documents,
           (SELECT unnest(range(0, 1024)) AS i)
      WHERE i * {THUMB_STRIDE} < octet_length(encode(text))
      GROUP BY doc_id
    )
    -- LEFT JOIN keeps zero-byte payloads: the engine emits a row with
    -- an empty thumb for them (adversarial-corpus sweep, r12)
    SELECT d.doc_id AS media_id,
           octet_length(encode(d.text)) AS n_bytes,
           octet_length(encode(d.text)) // {THUMB_STRIDE}
             + CASE WHEN octet_length(encode(d.text)) % {THUMB_STRIDE} > 0
                    THEN 1 ELSE 0 END AS thumb_bytes,
           coalesce(s.thumb_hex, '') AS thumb_hex
    FROM documents d LEFT JOIN samp s ON d.doc_id = s.doc_id
    """,
)
def mm_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize slot, end to end: binary payload → mapInPandas
    decimation → smaller binary + its hex, oracle-recomputed in SQL from
    the source text. (Docs are < 16 KB so the oracle's 1024-sample bound
    is exact.)"""
    media = documents_as_media(spark, sf_dir)
    return make_thumbnails(media).select(
        "media_id",
        "n_bytes",
        F.expr("octet_length(thumb)").cast("bigint").alias("thumb_bytes"),
        "thumb_hex",
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_sampled", LongType(), False),
        StructField("frame_hashes", ArrayType(StringType()), True),
    ]
)


def sample_frames(payload: bytes, frame_bytes: int = FRAME_BYTES,
                  stride: int = FRAME_STRIDE) -> list[bytes]:
    """Deterministic frame sampler: treat the payload as fixed-size
    frames, keep every stride-th (a real video path would decode, then
    sample by timestamp — same batch shape)."""
    frames = [
        payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)
    ]
    return frames[::stride]


def extract_frame_samples(df: DataFrame) -> DataFrame:
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sampled = pdf["payload"].map(sample_frames)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": pdf["payload"].map(
                        lambda b: (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                    ),
                    "n_sampled": sampled.map(len),
                    "frame_hashes": sampled.map(
                        lambda fs: [hashlib.md5(f).hexdigest() for f in fs]
                    ),
                }
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH samp AS (
      SELECT doc_id, count(*) AS n_sampled,
             string_agg(md5(substr(text, i * {FRAME_BYTES} + 1,
                                   {FRAME_BYTES})), ',' ORDER BY i)
               AS hashes_csv
      FROM documents,
           (SELECT unnest(range(0, 1024)) AS i)
      WHERE i % {FRAME_STRIDE} = 0
        AND i * {FRAME_BYTES} < octet_length(encode(text))
      GROUP BY doc_id
    )
    -- LEFT JOIN keeps zero-byte payloads: the engine emits a row with
    -- 0 frames and '' hashes for them (adversarial-corpus sweep, r12)
    SELECT d.doc_id AS media_id,
           (octet_length(encode(d.text)) + {FRAME_BYTES - 1})
             // {FRAME_BYTES} AS n_frames,
           CAST(coalesce(s.n_sampled, 0) AS BIGINT) AS n_sampled,
           coalesce(s.hashes_csv, '') AS hashes_csv
    FROM documents d LEFT JOIN samp s ON d.doc_id = s.doc_id
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The video frame-sample slot: payload → fixed-size fake frames →
    stride sampling → per-frame md5, oracle-recomputed from the source
    text (ASCII corpus: byte offsets == char offsets)."""
    media = documents_as_media(spark, sf_dir)
    return extract_frame_samples(media).select(
        "media_id",
        "n_frames",
        "n_sampled",
        F.array_join("frame_hashes", ",").alias("hashes_csv"),
    )


# --- audio-style windowed frame energy -------------------------------------
ENERGY_FRAME_BYTES = 256

ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("total_energy", LongType(), False),
        StructField("max_frame_energy", LongType(), False),
    ]
)


def frame_energy(payload: bytes, frame_bytes: int = ENERGY_FRAME_BYTES):
    """Per-frame energy of a payload read as unsigned 8-bit PCM centered
    at 128: sum((sample-128)^2) per frame. Integer math — deterministic
    and engine-portable. Vectorized; the tail frame keeps its short
    length (same convention as sample_frames)."""
    import numpy as np

    if not payload:
        return []
    s = np.frombuffer(payload, dtype=np.uint8).astype(np.int64) - 128
    sq = s * s
    return [
        int(sq[i : i + frame_bytes].sum())
        for i in range(0, len(sq), frame_bytes)
    ]


def extract_frame_energy(df: DataFrame, batch_size: int = 1024) -> DataFrame:
    """Arrow-batched windowed energy over binary payloads — the audio
    analytics shape (VAD thresholds, loudness normalization) with the
    decoder stubbed to raw bytes. No shuffle; blobs never leave their
    partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            energies = pdf["payload"].map(
                lambda p: frame_energy(p) if p is not None else []
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": energies.map(len),
                    "total_energy": energies.map(sum),
                    "max_frame_energy": energies.map(
                        lambda e: max(e) if e else 0
                    ),
                }
            )

    cols = df.select("media_id", "payload")
    return cols.mapInPandas(run, schema=ENERGY_SCHEMA)


@query(
    "mm_audio_energy",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i.i // {ENERGY_FRAME_BYTES} AS frame,
             ascii(substr(text, CAST(i.i + 1 AS INT), 1)) - 128 AS v
      {_DUCK_BYTE_POS}
    ),
    fr AS (
      SELECT doc_id, frame, CAST(sum(v * v) AS BIGINT) AS fe
      FROM pos GROUP BY doc_id, frame
    ),
    a AS (
      SELECT doc_id, count(*) AS nf, sum(fe) AS tot, max(fe) AS mx
      FROM fr GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CAST(coalesce(a.nf, 0) AS BIGINT) AS n_frames,
           CAST(coalesce(a.tot, 0) AS BIGINT) AS total_energy,
           CAST(coalesce(a.mx, 0) AS BIGINT) AS max_frame_energy
    FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
    """,
)
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed frame-energy stats per media payload (audio-pipeline
    shape): integer (byte-128)^2 sums per 256-byte frame,
    recomputed positionally in the DuckDB oracle over the ASCII corpus."""
    return extract_frame_energy(documents_as_media(spark, sf_dir))


# --- video-style scene-cut detection ---------------------------------------
SCENE_FRAME_BYTES = 128

SCENE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_cuts", LongType(), False),
        StructField("max_diff_energy", LongType(), False),
        StructField("cut_positions", ArrayType(LongType()), False),
    ]
)


def scene_cuts(payload: bytes, frame_bytes: int = SCENE_FRAME_BYTES):
    """Scene-cut detection on fake frames: diff energy between consecutive
    frames (sum of squared byte deltas over their common prefix); a cut is
    a boundary whose diff energy exceeds 1.5x the mean diff energy. Integer
    math throughout — deterministic and partition-order-free. Returns
    (n_frames, cut_positions, max_diff)."""
    import numpy as np

    if not payload:
        return 0, [], 0
    frames = [
        np.frombuffer(payload[i : i + frame_bytes], dtype=np.uint8).astype(np.int64)
        for i in range(0, len(payload), frame_bytes)
    ]
    if len(frames) < 2:
        return len(frames), [], 0
    diffs = []
    for j in range(len(frames) - 1):
        a, b = frames[j], frames[j + 1]
        m = min(len(a), len(b))
        d = a[:m] - b[:m]
        diffs.append(int((d * d).sum()))
    # 1.5x-mean threshold in exact integer form: 2 * diff * n > 3 * sum
    total = sum(diffs)
    n = len(diffs)
    cuts = [j + 1 for j, d in enumerate(diffs) if 2 * d * n > 3 * total]
    return len(frames), cuts, max(diffs)


def extract_scene_cuts(df: DataFrame) -> DataFrame:
    """mapInPandas scene-cut pass — same no-shuffle, Arrow-batched shape
    as the other media extractors; a real video path swaps the byte-frame
    stub for decoded luma planes, the Spark side is unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = pdf["payload"].map(
                lambda p: scene_cuts(p) if p is not None else (0, [], 0)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_frames": res.map(lambda r: r[0]),
                    "n_cuts": res.map(lambda r: len(r[1])),
                    "max_diff_energy": res.map(lambda r: r[2]),
                    "cut_positions": res.map(lambda r: r[1]),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, schema=SCENE_SCHEMA)


@query(
    "mm_scene_cuts",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, i.i AS i,
             ascii(substr(text, CAST(i.i + 1 AS INT), 1)) AS v
      {_DUCK_BYTE_POS}
    ),
    dif AS (
      -- squared byte deltas between frame j and j+1 over their common
      -- prefix: position i in frame j pairs with i + frame_bytes, and the
      -- join keeps exactly the positions both frames have.
      SELECT a.doc_id, a.i // {SCENE_FRAME_BYTES} AS j,
             CAST(sum((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.i = a.i + {SCENE_FRAME_BYTES}
      GROUP BY a.doc_id, a.i // {SCENE_FRAME_BYTES}
    ),
    agg AS (
      SELECT doc_id, count(*) AS n, sum(d) AS total, max(d) AS maxd
      FROM dif GROUP BY doc_id
    ),
    cut AS (
      SELECT dif.doc_id,
             count(*) AS n_cuts,
             string_agg(CAST(dif.j + 1 AS VARCHAR), ',' ORDER BY dif.j) AS csv
      FROM dif JOIN agg ON dif.doc_id = agg.doc_id
      WHERE 2 * dif.d * agg.n > 3 * agg.total
      GROUP BY dif.doc_id
    )
    SELECT d.doc_id AS media_id,
           CAST(CASE WHEN octet_length(encode(d.text)) = 0 THEN 0
                ELSE (octet_length(encode(d.text)) + {SCENE_FRAME_BYTES - 1})
                     // {SCENE_FRAME_BYTES} END AS BIGINT) AS n_frames,
           CAST(coalesce(cut.n_cuts, 0) AS BIGINT) AS n_cuts,
           CAST(coalesce(agg.maxd, 0) AS BIGINT) AS max_diff_energy,
           coalesce(cut.csv, '') AS cuts_csv
    FROM documents d
    LEFT JOIN agg ON d.doc_id = agg.doc_id
    LEFT JOIN cut ON d.doc_id = cut.doc_id
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut boundaries per media payload (video-pipeline shape:
    keyframe selection for caption/embedding extraction). The cut list is
    serialized to CSV — the driver's pandas canonicalizer can't sort list
    cells — and the whole integer computation (frame diffs over common
    prefixes, exact 1.5x-mean threshold) is mirrored in the DuckDB oracle
    as a positional self-join offset by the frame width."""
    return extract_scene_cuts(documents_as_media(spark, sf_dir)).select(
        "media_id",
        "n_frames",
        "n_cuts",
        "max_diff_energy",
        F.expr(
            "array_join(transform(cut_positions, x -> cast(x as string)), ',')"
        ).alias("cuts_csv"),
    )


PHASH_BYTES = 32  # leading payload bytes hashed (32 bits fit BIGINT shifts)
PHASH_MAX_HAMMING = 4

# Average-hash over the first PHASH_BYTES payload bytes: bit i set iff
# byte_i * n > sum(bytes) — the mean comparison in EXACT integer math, so
# both engines derive identical bits (a float mean could round differently).
# Staged as three projections (byte array → sum → bits) so the window sum
# is computed once per row, not re-aggregated inside every bit's lambda
# (the inline form was O(PHASH_BYTES^2) substring walks per row and
# dominated the query's wall time).
_PHASH_BYTES_EXPR = (
    f"transform(sequence(1, least({PHASH_BYTES}, length(text))),"
    " i -> cast(ascii(substring(text, i, 1)) as bigint))"
)
_PHASH_FROM_ARR = """
  CASE WHEN size(barr) = 0 THEN 0L ELSE
    aggregate(sequence(1, size(barr)), 0L,
      (acc, i) -> acc + CASE WHEN element_at(barr, i) * size(barr) > bsum
        THEN shiftleft(1L, i - 1) ELSE 0L END)
  END
"""



@query(
    "mm_phash_pairs",
    oracle=f"""
    WITH b AS (
      SELECT doc_id AS media_id,
             least({PHASH_BYTES}, length(text)) AS n,
             list_transform(range(1, least({PHASH_BYTES}, length(text)) + 1),
                            i -> ascii(substr(text, CAST(i AS INT), 1))) AS bytes
      FROM documents
    ),
    h AS (
      SELECT media_id,
             CASE WHEN n = 0 THEN 0 ELSE CAST(list_sum(
               list_transform(range(1, n + 1), i ->
                 CASE WHEN bytes[i] * n > list_sum(bytes)
                      THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END))
             AS BIGINT) END AS phash
      FROM b
    ),
    cand AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             a.phash AS ha, b.phash AS hb
      FROM h a JOIN h b
        ON (a.phash // 65536) = (b.phash // 65536)
       AND a.media_id < b.media_id
      UNION
      SELECT a.media_id, b.media_id, a.phash, b.phash
      FROM h a JOIN h b
        ON (a.phash % 65536) = (b.phash % 65536)
       AND a.media_id < b.media_id
    )
    SELECT media_a, media_b,
           bit_count(CAST(xor(ha, hb) AS BIGINT)) AS hamming
    FROM cand
    WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= {PHASH_MAX_HAMMING}
    """,
)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate MEDIA pairs: a 32-bit average-hash
    over the leading payload bytes (bit i = byte_i above the window
    mean — on a real image this runs over decoded luma pixels; here the
    deterministic byte stand-in exercises the identical plumbing), then
    candidate pairs from 2-table Hamming LSH (16-bit high/low halves)
    and an exact Hamming cut. This is image near-dup dedup as production
    pipelines run it (aHash/pHash + banded Hamming search).

    Scale: the hash is one row-local pass over PHASH_BYTES bytes; the
    pair search shuffles only (16-bit half, media_id, phash) tuples and
    explodes strictly in-bucket — the byte payloads never join. The mean
    comparison is exact integer math so both engines derive identical
    bits. The (media_id, phash) index — ~16 bytes per media, the thing a
    production image-dedup job stores — is materialized ONCE and probed
    by both half-joins (inline it is re-derived four times, the payload
    scanned with it), and the exact Hamming cut runs BEFORE the
    cross-half distinct so the dedup shuffle carries only near-dup
    pairs, not every bucket collision."""
    docs = load_table(spark, sf_dir, "documents")
    h = (
        docs.selectExpr("doc_id AS media_id", f"{_PHASH_BYTES_EXPR} AS barr")
        .selectExpr(
            "media_id",
            "barr",
            "aggregate(barr, 0L, (a2, x) -> a2 + x) AS bsum",
        )
        .selectExpr("media_id", f"({_PHASH_FROM_ARR}) AS phash")
    )
    hi = (F.col("phash") / 65536).cast("bigint")
    lo = F.pmod(F.col("phash"), F.lit(65536))
    a = h.select(
        "media_id", "phash", hi.alias("hb_hi"), lo.alias("hb_lo")
    ).localCheckpoint(eager=False)
    pairs = None
    for half in ("hb_hi", "hb_lo"):
        left = a.select(
            F.col("media_id").alias("media_a"),
            F.col("phash").alias("ha"),
            F.col(half).alias("bucket"),
        )
        right = a.select(
            F.col("media_id").alias("media_b"),
            F.col("phash").alias("hb"),
            F.col(half).alias("bucket"),
        )
        p = left.join(right, "bucket").filter(
            F.col("media_a") < F.col("media_b")
        ).select("media_a", "media_b", "ha", "hb")
        pairs = p if pairs is None else pairs.unionByName(p)
    ham = F.expr("bit_count(ha ^ hb)")
    return (
        pairs.filter(ham <= PHASH_MAX_HAMMING)
        .distinct()
        .select("media_a", "media_b", ham.alias("hamming"))
    )


def sniff_formats(media: DataFrame) -> DataFrame:
    """Classify a media DataFrame (binary `payload` column) by magic
    bytes and roll up count + bytes per format. See mm_format_sniff."""
    head_hex = F.upper(F.hex(F.expr("substring(payload, 1, 4)")))
    head_str = F.expr("cast(substring(payload, 1, 5) as string)")
    fmt = (
        F.when(head_hex.startswith("89504E47"), "png")
        .when(head_hex.startswith("FFD8FF"), "jpeg")
        .when(head_str.startswith("RIFF"), "riff")
        .when(head_str.startswith("GIF8"), "gif")
        .when(head_str.startswith("%PDF-"), "pdf")
        .otherwise("unknown/text")
    )
    return (
        media.select(fmt.alias("fmt"), F.length("payload").alias("n_bytes"))
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )


@query(
    "mm_format_sniff",
    oracle="""
    SELECT fmt, count(*) AS n_media,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM (
      SELECT CASE
               WHEN substr(upper(hex(encode(substr(text, 1, 4)))), 1, 8)
                    = '89504E47' THEN 'png'
               WHEN substr(upper(hex(encode(substr(text, 1, 3)))), 1, 6)
                    = 'FFD8FF' THEN 'jpeg'
               WHEN substr(text, 1, 4) = 'RIFF' THEN 'riff'
               WHEN substr(text, 1, 4) = 'GIF8' THEN 'gif'
               WHEN substr(text, 1, 5) = '%PDF-' THEN 'pdf'
               ELSE 'unknown/text' END AS fmt,
             text
      FROM documents
    )
    GROUP BY fmt
    """,
)
def mm_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte format sniffing over the payload column — the first
    gate of any multimodal ingest (files lie about extensions; the
    leading bytes don't): classify by PNG/JPEG/RIFF/GIF/PDF signatures
    and roll up count + bytes per detected format. Pure map-side prefix
    inspection — the classifier reads 5 bytes per record regardless of
    payload size, so at 100 TB this is metadata-rate, not data-rate,
    when parquet column statistics let the scan skip full payloads.
    The UTF-8 stand-in corpus classifies as unknown/text (correct for
    text payloads); the pytest constructs real magic-byte payloads to
    prove the positive paths."""
    return sniff_formats(documents_as_media(spark, sf_dir))


# ---------------------------------------------------------------------------
# Real header-level image decode — the first NON-stub decoder in this
# family. Pixel decode still needs an imaging library (decode_image stays
# a declared stub), but container headers are pure byte layout, specified
# publicly (JPEG: ITU-T T.81 §B.2, PNG: RFC 2083 §12, GIF: GIF89a spec,
# BMP: BITMAPINFOHEADER), and parsing them is what a 100 TB ingest
# actually does first: validate + extract dimensions WITHOUT decoding
# pixels, at metadata rate. parse_image_header is grounded against
# real-world fixture bytes in tests/test_multimodal.py, not just the
# builder round-trip.
# ---------------------------------------------------------------------------

_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0-15 minus DHT/JPG/DAC (T.81 table B.1)


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """Parse (format, width, height) from real image container bytes.

    - JPEG: walk the marker stream (skipping APPn/COM/anything with a
      big-endian length) to the first SOF frame header; height/width are
      bytes 3-6 of the segment (ITU-T T.81 §B.2.2).
    - PNG: the IHDR chunk is mandatory-first; width/height are the two
      big-endian u32 at offsets 16/20 (RFC 2083 §12.2).
    - GIF: logical screen descriptor at offset 6, little-endian u16.
    - BMP: BITMAPINFOHEADER at offset 14, little-endian i32.

    Returns None for anything unrecognized or truncated (never raises:
    at ingest scale, malformed blobs are data, not exceptions).
    """
    if len(payload) < 14:
        return None
    if payload[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None  # desynchronized marker stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding is legal
                i += 1
                continue
            if marker in _SOF_MARKERS:
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            if 0xD0 <= marker <= 0xD9:  # RSTn/SOI/EOI: no length field
                i += 2
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            i += 2 + seg_len
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        if payload[12:16] != b"IHDR":
            return None
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        return ("gif", w, h)
    if payload[:2] == b"BM" and len(payload) >= 26:
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        return ("bmp", w, abs(h))  # negative height = top-down rows
    return None


def build_image_payload(fmt: str, width: int, height: int) -> bytes:
    """Emit spec-conformant header bytes for ``fmt`` (+ a short opaque
    body) so the synthetic corpus carries REAL container layouts. The
    JPEG path deliberately places APP0 and COM segments before SOF0 so a
    parser must actually walk the marker stream."""
    if fmt == "jpeg":
        app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
        com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"p4sgn"
        sof0 = (
            b"\xff\xc0"
            + (11).to_bytes(2, "big")
            + b"\x08"
            + height.to_bytes(2, "big")
            + width.to_bytes(2, "big")
            + b"\x01"  # Nf = 1 component
            + b"\x01\x11\x00"  # component: id, H/V sampling, quant table
        )
        return b"\xff\xd8" + app0 + com + sof0 + b"\xff\xd9"
    if fmt == "png":
        ihdr = width.to_bytes(4, "big") + height.to_bytes(4, "big") + b"\x08\x00\x00\x00\x00"
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + b"\x00\x00\x00\x00"  # CRC slot (not validated header-side)
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + width.to_bytes(2, "little")
            + height.to_bytes(2, "little")
            + b"\x00\x00\x00\x00;"
        )
    if fmt == "bmp":
        dib = (
            (40).to_bytes(4, "little")
            + width.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + bytes(24)
        )
        header = b"BM" + (14 + 40).to_bytes(4, "little") + bytes(4) + (54).to_bytes(4, "little")
        return header + dib
    raise ValueError(f"unknown format {fmt!r}")


# ---------------------------------------------------------------------------
# Real PIXEL decode — uncompressed 24-bpp BMP, pure byte layout (no entropy
# coding), publicly specified (Windows BITMAPINFOHEADER). This is the one
# container whose pixels a pure-Python executor can decode end-to-end:
# encode_bmp/decode_bmp_pixels implement the actual file format (54-byte
# header, BGR triples, rows padded to 4-byte multiples, bottom-up row order,
# negative-height top-down variant), and mm_bmp_thumbnail runs REAL pixel
# math (decode → nearest-neighbor resize → channel sums) over those bytes.
# PNG pixel decode is also real (the repo's own inflate + scanline
# unfilters), as are GIF (from-scratch LZW) and baseline JPEG (Huffman +
# IDCT) — see decode_image's dispatch; only perceptual audio
# (MP3/AAC/Opus sample decode) remains a declared stub.
# ---------------------------------------------------------------------------


def encode_bmp(pixels) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as an uncompressed 24-bpp BMP
    (BITMAPINFOHEADER, bottom-up rows, rows padded to 4-byte multiples)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    stride = (w * 3 + 3) & ~3
    # BGR byte order, bottom row first, zero row padding
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)
    body = rows.tobytes()
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + len(body).to_bytes(4, "little")
        + bytes(16)  # ppm resolutions + palette counts: unused
    )
    header = (
        b"BM"
        + (54 + len(body)).to_bytes(4, "little")
        + bytes(4)
        + (54).to_bytes(4, "little")  # pixel-data offset
    )
    return header + dib + body


MAX_DECODE_PIXELS = 16_000_000  # ~16 MP decompression-bomb guard


def _check_decode_dims(w: int, h: int) -> None:
    """Dimension sanity shared by every pixel decoder: corrupted or
    hostile headers can declare absurd sizes whose result-buffer
    allocation alone is a denial of service (a single flipped bit in a
    JPEG SOF dimension asks for a ~30 GB zero plane — found by the
    mutation fuzzer). Real decoders bound dimensions BEFORE allocating;
    so do these."""
    if w <= 0 or h <= 0 or w * h > MAX_DECODE_PIXELS:
        raise ValueError(
            f"implausible image dimensions {w}x{h} (max"
            f" {MAX_DECODE_PIXELS} pixels)"
        )


def decode_bmp_pixels(payload: bytes):
    """Decode an uncompressed 24-bpp BMP to an (h, w, 3) uint8 RGB array.

    Real parser: honors the header's pixel-data offset (extra DIB/palette
    bytes are skipped, not assumed absent), the 4-byte row stride padding,
    bottom-up row order, and the negative-height top-down variant.
    Raises ValueError on non-BMP/compressed/paletted inputs — pixel decode
    is an explicit operation, unlike parse_image_header's never-raise
    ingest classification."""
    import numpy as np

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    pix_off = int.from_bytes(payload[10:14], "little")
    dib_size = int.from_bytes(payload[14:18], "little")
    if dib_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h_raw = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bpp supported (bpp={bpp})")
    h = abs(h_raw)
    _check_decode_dims(w, h)
    stride = (w * 3 + 3) & ~3
    end = pix_off + stride * h
    if w <= 0 or h == 0 or len(payload) < end:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(payload[pix_off:end], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if h_raw > 0:  # bottom-up storage → flip to top-down
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR → RGB


def resize_pixels(px, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, 3) array to (height, width):
    target (x, y) reads source (x·w_src // width, y·h_src // height)."""
    import numpy as np

    src_h, src_w = px.shape[0], px.shape[1]
    sy = (np.arange(height) * src_h) // height
    sx = (np.arange(width) * src_w) // width
    return px[sy][:, sx]


THUMB_W = 8
THUMB_H = 8

BMP_THUMB_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_w", LongType(), False),
        StructField("src_h", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
    ]
)


@query(
    "mm_bmp_thumbnail",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             16 + (doc_id * 5) % 48 AS w,
             16 + (doc_id * 3) % 32 AS h
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h,
             (t.i % {THUMB_W}) * w // {THUMB_W} AS sx,
             (t.i // {THUMB_W}) * h // {THUMB_H} AS sy
      FROM dims, LATERAL (SELECT unnest(range({THUMB_W * THUMB_H})) AS i) t
    )
    SELECT doc_id AS media_id,
           CAST(w AS BIGINT) AS src_w,
           CAST(h AS BIGINT) AS src_h,
           CAST(sum((11 * sx + sy + 3 * doc_id) % 256) AS BIGINT) AS sum_r,
           CAST(sum((3 * sx + 5 * sy + 2 * doc_id) % 256) AS BIGINT) AS sum_g,
           CAST(sum((7 * sx + 13 * sy + doc_id) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY doc_id, w, h
    """,
)
def mm_bmp_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode end-to-end: per document, synthesize an
    uncompressed 24-bpp BMP whose pixel channels are arithmetic functions
    of (x, y, doc_id), then recover the pixels by PARSING THE BYTES with
    decode_bmp_pixels (offset/stride/bottom-up handling — no stand-ins),
    nearest-neighbor resize to 8x8 with resize_pixels, and emit exact
    integer channel sums over the thumbnail. The oracle recomputes the
    sums arithmetically from the same (x, y, doc_id) formulas, so a hash
    match proves the encode→decode→resample pipeline is byte-exact on
    real container layouts — the pixel-path twin of mm_image_dimensions'
    header proof. One mapInPandas pass, no shuffle: at 100 TB each blob
    is decoded exactly once inside its partition and only 6 small columns
    leave the executor."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in BMP_THUMB_SCHEMA.fieldNames()}
            for d in pdf["doc_id"]:
                d = int(d)
                w = 16 + (d * 5) % 48
                h = 16 + (d * 3) % 32
                y, x = np.mgrid[0:h, 0:w]
                src = np.stack(
                    [
                        (11 * x + y + 3 * d) % 256,
                        (3 * x + 5 * y + 2 * d) % 256,
                        (7 * x + 13 * y + d) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                # the real codec round trip IS the computation under test:
                # everything downstream reads the decoded bytes, not `src`
                thumb = resize_pixels(
                    decode_bmp_pixels(encode_bmp(src)), THUMB_W, THUMB_H
                )
                sums = thumb.astype(np.int64).sum(axis=(0, 1))
                out["media_id"].append(d)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return spread_small_source(docs.select("doc_id")).mapInPandas(run, BMP_THUMB_SCHEMA)


# ---------------------------------------------------------------------------
# Real AUDIO decode — RIFF/WAVE PCM-16, the audio twin of the BMP pixel
# path: the container is pure byte structure (RIFF chunk stream, fmt
# descriptor, little-endian int16 frames; see the WAVE spec / RIFF 1991),
# so a pure-Python executor can decode actual samples end-to-end.
# encode_wav deliberately inserts a LIST chunk between fmt and data so a
# parser must genuinely walk the chunk stream rather than assume fixed
# offsets. Compressed codecs stay behind the declared decode_audio stub.
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int, codec: str = "pcm16") -> bytes:
    """Encode an int16 mono sample array as a RIFF/WAVE file — PCM-16
    (fmt 1), G.711 u-law (fmt 7), or A-law (fmt 6) — including a
    LIST(INFO) chunk between fmt and data (legal and common in real
    files; forces chunk-walking on decode)."""
    import numpy as np

    if codec == "pcm16":
        audio_fmt, bits, bytes_per = 1, 16, 2
        pcm = np.asarray(samples, dtype="<i2").tobytes()
    elif codec in ("ulaw", "alaw"):
        audio_fmt, bits, bytes_per = (7 if codec == "ulaw" else 6), 8, 1
        pcm = g711_encode(samples, codec)
    else:
        raise ValueError(f"unknown WAV codec {codec!r}")
    fmt = (
        b"fmt "
        + (16).to_bytes(4, "little")
        + audio_fmt.to_bytes(2, "little")
        + (1).to_bytes(2, "little")  # mono
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * bytes_per).to_bytes(4, "little")  # byte rate
        + bytes_per.to_bytes(2, "little")  # block align
        + bits.to_bytes(2, "little")  # bits per sample
    )
    info = b"INFOISFT" + (6).to_bytes(4, "little") + b"p4sgn\x00"
    lst = b"LIST" + len(info).to_bytes(4, "little") + info
    data = b"data" + len(pcm).to_bytes(4, "little") + pcm
    if len(pcm) % 2:  # RIFF chunks are word-aligned
        data += b"\x00"
    body = b"WAVE" + fmt + lst + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav_samples(payload: bytes):
    """Decode a mono RIFF/WAVE payload to (sample_rate, int16 array) —
    PCM-16 (fmt 1) plus the G.711 companded codecs u-law (fmt 7) and
    A-law (fmt 6), expanded through the standard's exact segment
    arithmetic. Real parser: walks the chunk stream (id, little-endian
    u32 size, word-aligned payloads), reads the format from the fmt
    chunk, and slices samples at the data chunk's own offset — unknown
    chunks (LIST, fact, cue) are skipped, not assumed absent. Raises
    ValueError on non-WAVE/multichannel/perceptual-codec layouts."""
    import numpy as np

    if payload[:4] != b"RIFF" or len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_info, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if channels != 1 or (audio_fmt, bits) not in (
                (1, 16),
                (6, 8),
                (7, 8),
            ):
                raise ValueError(
                    f"only mono PCM-16 / G.711 supported (fmt={audio_fmt},"
                    f" ch={channels}, bits={bits})"
                )
            fmt_info = (rate, audio_fmt)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt_info is None or data is None:
        raise ValueError("missing fmt or data chunk")
    rate, audio_fmt = fmt_info
    if audio_fmt == 1:
        return rate, np.frombuffer(data[: len(data) // 2 * 2], dtype="<i2")
    return rate, g711_decode(data, "alaw" if audio_fmt == 6 else "ulaw")


WAV_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sum_sq", LongType(), False),
        StructField("max_abs", LongType(), False),
    ]
)


@query(
    "mm_wav_energy",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             64 + (doc_id * 7) % 192 AS n,
             CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS rate
      FROM documents
    ),
    smp AS (
      SELECT doc_id, n, rate,
             (doc_id * 31 + 13 * t.i * t.i) % 65536 - 32768 AS v
      FROM dims, LATERAL (SELECT unnest(range(n)) AS i) t
    )
    SELECT doc_id AS media_id,
           rate AS sample_rate,
           CAST(n AS BIGINT) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS sum_sq,
           CAST(max(abs(v)) AS BIGINT) AS max_abs
    FROM smp GROUP BY doc_id, n, rate
    """,
)
def mm_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: per document, synthesize a PCM-16
    RIFF/WAVE payload whose samples are an arithmetic function of
    (doc_id, i), then recover rate + samples by PARSING THE BYTES with
    decode_wav_samples (chunk walk past an interposed LIST chunk — no
    stand-ins), and emit exact integer energy stats over the decoded
    samples. The oracle recomputes the stats from the same formulas, so
    a hash match proves the encode→chunk-walk→PCM-decode pipeline
    byte-exact — the audio twin of mm_bmp_thumbnail's pixel proof. One
    mapInPandas pass, no shuffle; at 100 TB this is the
    loudness/VAD-feature step of an audio ingest, each blob decoded once
    inside its partition."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in WAV_ENERGY_SCHEMA.fieldNames()}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 64 + (d * 7) % 192
                rate = 8000 + (d % 4) * 4000
                i = np.arange(n, dtype=np.int64)
                synth = ((d * 31 + 13 * i * i) % 65536 - 32768).astype(
                    "<i2"
                )
                # the codec round trip IS the computation under test:
                # stats read the decoded samples, not `synth`
                got_rate, s = decode_wav_samples(encode_wav(synth, rate))
                s64 = s.astype(np.int64)
                out["media_id"].append(d)
                out["sample_rate"].append(got_rate)
                out["n_samples"].append(len(s))
                out["sum_sq"].append(int((s64 * s64).sum()))
                out["max_abs"].append(int(np.abs(s64).max()))
            yield pd.DataFrame(out)

    return spread_small_source(docs.select("doc_id")).mapInPandas(run, WAV_ENERGY_SCHEMA)


DIM_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fmt", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)

_DIM_FMTS = ("jpeg", "png", "gif", "bmp")


def decode_image_dimensions(media: DataFrame) -> DataFrame:
    """Header-decode every payload to (fmt, width, height) — one
    Arrow-batched zero-shuffle pass; unparseable payloads yield nulls."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "fmt": [t[0] if t else None for t in parsed],
                    "width": [t[1] if t else None for t in parsed],
                    "height": [t[2] if t else None for t in parsed],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, DIM_SCHEMA)


@query(
    "mm_image_dimensions",
    oracle="""
    SELECT doc_id AS media_id,
           ['jpeg', 'png', 'gif', 'bmp'][CAST(doc_id % 4 AS INT) + 1] AS fmt,
           CAST(16 + (doc_id * 7) % 317 AS BIGINT) AS width,
           CAST(16 + n_chars % 211 AS BIGINT) AS height,
           CAST(CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 44 WHEN 1 THEN 33 WHEN 2 THEN 15 ELSE 54 END
             AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def mm_image_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end REAL decode: build spec-conformant JPEG/PNG/GIF/BMP
    headers with dimensions derived from document columns, then recover
    format + dimensions by parsing the BYTES with parse_image_header
    (marker walk / IHDR / LSD / DIB — no stand-ins on this path). The
    oracle recomputes the expected dimensions arithmetically, so a hash
    match proves encode→parse round-trips the real container layouts
    byte-exactly. One mapInPandas pass, no shuffle; at 100 TB this is
    the validate-and-index step of a media ingest, reading headers at
    metadata rate."""
    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_image_payload(
                    _DIM_FMTS[int(d) % 4],
                    16 + (int(d) * 7) % 317,
                    16 + int(n) % 211,
                )
                for d, n in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            parsed = [parse_image_header(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "fmt": [t[0] if t else None for t in parsed],
                    "width": [t[1] if t else None for t in parsed],
                    "height": [t[2] if t else None for t in parsed],
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return docs.select("doc_id", "n_chars").mapInPandas(run, DIM_SCHEMA)


VAD_FRAME = 32  # samples per VAD frame (aligned with the synth blocks)
VAD_THRESHOLD = 10_000_000  # frame sum-of-squares split: loud >> T >> quiet

VAD_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("n_active", LongType(), False),
        StructField("n_segments", LongType(), False),
        StructField("longest_segment", LongType(), False),
    ]
)


@query(
    "mm_audio_vad",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, 64 + (doc_id * 7) % 192 AS n
      FROM documents
    ),
    smp AS (
      SELECT doc_id, t.i // {VAD_FRAME} AS frame,
             CASE WHEN (t.i // {VAD_FRAME} + doc_id) % 3 = 0
                  THEN (doc_id * 31 + 13 * t.i * t.i) % 65536 - 32768
                  ELSE (doc_id * 7 + t.i) % 256 - 128 END AS v
      FROM dims, LATERAL (SELECT unnest(range(n)) AS i) t
    ),
    fr AS (
      SELECT doc_id, frame, sum(v * v) AS e
      FROM smp GROUP BY doc_id, frame
    ),
    act AS (SELECT doc_id, frame FROM fr WHERE e > {VAD_THRESHOLD}),
    seg AS (
      SELECT doc_id,
             frame - row_number() OVER (PARTITION BY doc_id
                                        ORDER BY frame) AS grp
      FROM act
    ),
    runs AS (
      SELECT doc_id, grp, count(*) AS run_len
      FROM seg GROUP BY doc_id, grp
    ),
    agg AS (
      SELECT doc_id, CAST(sum(run_len) AS BIGINT) AS n_active,
             count(*) AS n_segments,
             CAST(max(run_len) AS BIGINT) AS longest_segment
      FROM runs GROUP BY doc_id
    )
    SELECT d.doc_id AS media_id,
           CAST((dm.n + {VAD_FRAME - 1}) // {VAD_FRAME} AS BIGINT) AS n_frames,
           coalesce(agg.n_active, 0) AS n_active,
           CAST(coalesce(agg.n_segments, 0) AS BIGINT) AS n_segments,
           coalesce(agg.longest_segment, 0) AS longest_segment
    FROM documents d
    JOIN dims dm ON d.doc_id = dm.doc_id
    LEFT JOIN agg ON d.doc_id = agg.doc_id
    """,
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over REAL decoded audio: synthesize a
    PCM-16 WAV per document whose 32-sample blocks alternate loud
    (full-range quadratic chirp) and quiet (sub-128 amplitude) by an
    arithmetic schedule, DECODE THE BYTES with decode_wav_samples, then
    classify frames by exact integer sum-of-squares against a fixed
    threshold and segment consecutive active frames (gaps-and-islands —
    the same gauge a speech pipeline uses to cut utterances for ASR).
    The oracle recomputes frame energies and run-lengths from the same
    formulas in SQL, so a hash match proves frame alignment, the
    decode round trip, and the segmentation logic together. Row-local
    mapInPandas; blobs never shuffle — the second production consumer
    of the real WAV decode path (mm_wav_energy proves the codec, this
    proves decoded-sample ANALYTICS)."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in VAD_SCHEMA.fieldNames()}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 64 + (d * 7) % 192
                i = np.arange(n, dtype=np.int64)
                loud = (d * 31 + 13 * i * i) % 65536 - 32768
                quiet = (d * 7 + i) % 256 - 128
                synth = np.where(
                    (i // VAD_FRAME + d) % 3 == 0, loud, quiet
                ).astype("<i2")
                _, s = decode_wav_samples(encode_wav(synth, 16000))
                s64 = s.astype(np.int64)
                n_frames = (len(s64) + VAD_FRAME - 1) // VAD_FRAME
                energies = np.array(
                    [
                        int((s64[f * VAD_FRAME : (f + 1) * VAD_FRAME] ** 2).sum())
                        for f in range(n_frames)
                    ]
                )
                active = energies > VAD_THRESHOLD
                # run-length encode the active mask
                runs, cur = [], 0
                for a in active:
                    if a:
                        cur += 1
                    elif cur:
                        runs.append(cur)
                        cur = 0
                if cur:
                    runs.append(cur)
                out["media_id"].append(d)
                out["n_frames"].append(n_frames)
                out["n_active"].append(int(active.sum()))
                out["n_segments"].append(len(runs))
                out["longest_segment"].append(max(runs) if runs else 0)
            yield pd.DataFrame(out)

    return spread_small_source(docs.select("doc_id")).mapInPandas(run, VAD_SCHEMA)


# ---------------------------------------------------------------------------
# Real COMPRESSED pixel decode — PNG (RFC 2083), pure Python end-to-end:
# the DEFLATE entropy coding is the repo's OWN RFC 1950/1951 inflate
# (inflate_zlib, below — zlib remains only on fixture/encode paths), and
# the scanline prediction layer — all five PNG filter types (None/Sub/Up/
# Average/Paeth) — is implemented here. Unlike BMP (raw byte layout),
# this is a genuinely compressed codec: decode_png_pixels walks the chunk
# stream (verifying each CRC32), inflates the concatenated IDAT stream,
# and inverts the per-row filters. encode_png is the matching encoder
# (any fixed filter type or per-row mix), which the property tests use to
# prove every filter's inverse over generated image shapes. 8-bit only:
# greyscale (0), truecolor (2), palette (3, with optional tRNS alpha),
# grey+alpha (4), RGBA (6), both non-interlaced and Adam7-interlaced —
# the layouts real-world PNGs actually use; 16-bit raises ValueError.
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + zlib.crc32(tag + body).to_bytes(4, "big")
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"

# Adam7 interlace passes as (x0, y0, dx, dy) — each pass is an
# independently-filtered sub-image of every dy-th row / dx-th column,
# read off the spec's canonical 8x8 pass-number matrix.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_filter_rows(rows, bpp: int, ftypes) -> bytearray:
    """Apply PNG scanline filters to an (h, stride) int16 row block,
    returning filter-byte-prefixed residual scanlines."""
    import numpy as np

    h, stride = rows.shape
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        raw = rows[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), raw[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int16), prior[:-bpp]])
        ft = ftypes[y]
        if ft == 0:
            res = raw
        elif ft == 1:
            res = raw - left
        elif ft == 2:
            res = raw - prior
        elif ft == 3:
            res = raw - (left + prior) // 2
        elif ft == 4:
            pae = np.array(
                [_paeth(int(a), int(b), int(c))
                 for a, b, c in zip(left, prior, ul)],
                dtype=np.int16,
            )
            res = raw - pae
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out.append(ft)
        out.extend((res % 256).astype(np.uint8).tobytes())
        prior = raw
    return out


def encode_png(
    pixels, filters=0, interlace: bool = False, palette=None, trans=None
) -> bytes:
    """Encode an 8-bit PNG. ``pixels`` is (h, w, 3) RGB or (h, w)
    greyscale — or, with ``palette`` (a [(r, g, b), ...] list), an
    (h, w) index array stored as color type 3 with a PLTE chunk (and a
    tRNS chunk when ``trans`` gives per-entry alpha). ``filters`` is a
    PNG filter type 0-4 applied to every row, or a list of per-row
    types — the encoder APPLIES the filter (stores the residuals), so
    round-tripping through decode_png_pixels proves the decoder's
    inverse for that type. ``interlace`` stores the Adam7 7-pass
    layout, each pass independently filtered per the spec."""
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    if palette is not None:
        if px.ndim != 2:
            raise ValueError("palette PNG takes an (h, w) index array")
        if not 1 <= len(palette) <= 256:
            raise ValueError("palette must have 1-256 entries")
        bpp, colortype = 1, 3
    elif px.ndim == 2:
        bpp, colortype = 1, 0
    else:
        bpp, colortype = 3, 2
    rows = px.reshape(h, w * bpp).astype(np.int16)
    if not interlace:
        ftypes = (
            [int(filters)] * h if isinstance(filters, int) else list(filters)
        )
        if len(ftypes) != h:
            raise ValueError(
                "per-row filter list must have one entry per row"
            )
        out = _png_filter_rows(rows, bpp, ftypes)
    else:
        if not isinstance(filters, int):
            raise ValueError("interlaced encode takes a single filter type")
        grid = px.reshape(h, w, bpp)
        out = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = grid[y0::dy, x0::dx]
            ph, pw = sub.shape[0], sub.shape[1]
            if ph == 0 or pw == 0:
                continue
            out += _png_filter_rows(
                sub.reshape(ph, pw * bpp).astype(np.int16),
                bpp,
                [int(filters)] * ph,
            )
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, colortype, 0, 0, int(interlace)])
    )
    plte = b""
    if palette is not None:
        plte = _png_chunk(
            b"PLTE", b"".join(bytes(rgb[:3]) for rgb in palette)
        )
        if trans is not None:
            plte += _png_chunk(b"tRNS", bytes(trans))
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + plte
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def _png_defilter(raw: bytes, h: int, stride: int, bpp: int):
    """Invert the five PNG scanline filters over one filtered sub-image
    (h scanlines of 1 filter byte + stride data bytes)."""
    import numpy as np

    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    recon = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int16)
        prior = recon[y - 1].astype(np.int16) if y else np.zeros(
            stride, dtype=np.int16
        )
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = line + prior
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential within the row
            rec = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (int(a) + int(b)) // 2
                else:
                    pred = _paeth(int(a), int(b), int(c))
                rec[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        recon[y] = (rec % 256).astype(np.uint8)
    return recon


def decode_png_pixels(payload: bytes):
    """Decode an 8-bit PNG — greyscale, RGB, palette, grey+alpha, or
    RGBA (color types 0/2/3/4/6), non-interlaced or Adam7 — to an
    (h, w[, channels]) uint8 array; palette images map through PLTE to
    RGB, or to RGBA when a tRNS chunk supplies per-entry alpha. Real
    decoder: chunk walk with CRC32 verification, multi-IDAT
    concatenation, the repo's own RFC 1950/1951 inflate (inflate_zlib
    — no zlib involvement anywhere on the read side; the CRC check is
    the table-driven _crc32_py), and the inverse of all five scanline
    filters per sub-image. Raises ValueError on anything outside the
    supported subset (16-bit) or on corrupt data — like
    decode_bmp_pixels, pixel decode is an explicit operation that must
    not silently guess."""
    import numpy as np

    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    colortype = -1
    interlace = 0
    plte = None
    trns = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if len(body) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = int.from_bytes(payload[pos + 8 + ln:pos + 12 + ln], "big")
        if _crc32_py(tag + body) != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, colortype, comp, filt, interlace = body[8:13]
            if depth != 8 or comp != 0 or filt != 0 or interlace > 1:
                raise ValueError("only 8-bit PNG supported")
            if colortype not in (0, 2, 3, 4, 6):
                raise ValueError(
                    f"unsupported PNG color type {colortype}"
                )
            _check_decode_dims(w, h)
        elif tag == b"PLTE":
            if ln == 0 or ln % 3 or ln > 768:
                raise ValueError("invalid PNG PLTE length")
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    bpp = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    raw, _zinfo = inflate_zlib(bytes(idat))
    if interlace == 0:
        if len(raw) != h * (w * bpp + 1):
            raise ValueError("PNG pixel data length mismatch")
        recon = _png_defilter(raw, h, w * bpp, bpp)
        img = recon if bpp == 1 else recon.reshape(h, w, bpp)
    else:
        img = np.zeros((h, w) if bpp == 1 else (h, w, bpp), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            need = ph * (pw * bpp + 1)
            block = raw[off:off + need]
            if len(block) != need:
                raise ValueError("PNG pixel data length mismatch")
            off += need
            rec = _png_defilter(block, ph, pw * bpp, bpp)
            img[y0::dy, x0::dx] = (
                rec if bpp == 1 else rec.reshape(ph, pw, bpp)
            )
        if off != len(raw):
            raise ValueError("PNG pixel data length mismatch")
    if colortype != 3:
        return img.copy()
    if plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    if int(img.max(initial=0)) >= len(plte):
        raise ValueError("PNG pixel index outside palette")
    rgb = plte[img]
    if trns is None:
        return rgb.copy()
    alpha = np.full(len(plte), 255, dtype=np.uint8)
    alpha[: min(len(trns), len(plte))] = trns[: len(plte)]
    return np.concatenate([rgb, alpha[img][..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Real COMPRESSED pixel decode #2 — GIF (GIF87a/89a), pure Python: the
# entropy coding is variable-width LSB-first LZW (GIF's one compression
# scheme), self-contained enough to implement directly — no library
# needed at all. decode_gif_pixels walks the logical screen descriptor,
# global/local color tables, extension blocks, and the first image
# descriptor; inflates the LZW stream (dynamic code table, clear/EOI
# codes, width growth at 2^n, the deferred-clear rule); de-interlaces
# the four-pass row order when flagged; and maps indices through the
# palette to RGB. encode_gif is the matching encoder with a REAL LZW
# compressor (so round-trips exercise multi-character table codes, not
# just literal emission). First frame only; JPEG remains the one
# declared decode stub.
# ---------------------------------------------------------------------------


def _lzw_compress(indices, min_code: int) -> bytes:
    """GIF-flavor LZW: variable width, LSB-first bit packing, leading
    CLEAR, trailing EOI, table reset at 4096."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    table = {(i,): i for i in range(1 << min_code)}
    next_code = eoi + 1
    width = min_code + 1
    emit(clear, width)
    seq: tuple = ()
    for idx in indices:
        cand = seq + (int(idx),)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code <= 4095:
            table[cand] = next_code
            next_code += 1
            # giflib early-change rule (mirrored in the decoder): widen
            # as soon as the next code to assign no longer fits
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            # table full: clear and restart rather than defer
            emit(clear, width)
            table = {(i,): i for i in range(1 << min_code)}
            next_code = eoi + 1
            width = min_code + 1
        seq = (int(idx),)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code: int, n_pixels: int) -> list[int]:
    if not 2 <= min_code <= 8:
        # Spec range (GIF89a appendix F). Unvalidated, a corrupt byte here
        # asks for a 2**min_code-entry initial table — up to 2**255 —
        # which is a decompression bomb, not a decode.
        raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    table: list[tuple] = [(i,) for i in range(1 << min_code)] + [(), ()]
    # next_code counts a PENDING slot for every non-control code read
    # (giflib semantics) — that keeps the width counter in lockstep with
    # the encoder even though the pending entry's suffix is only known
    # (and appended to `table`) one read later.
    next_code = eoi + 1
    width = min_code + 1
    acc = n_bits = pos = 0
    out: list[int] = []
    prev: tuple | None = None
    while len(out) < n_pixels:
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = [(i,) for i in range(1 << min_code)] + [(), ()]
            next_code = eoi + 1
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case (pending slot)
        else:
            raise ValueError("corrupt GIF LZW code")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
        if next_code <= 4095:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data ended early")
    return out[:n_pixels]


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # Adam-style 4-pass interlace


def encode_gif(indices, palette, interlace: bool = False) -> bytes:
    """Encode an (h, w) uint8 index array + [(r, g, b), ...] palette as a
    single-frame GIF89a with a global color table and real LZW
    compression. ``interlace`` stores rows in the GIF 4-pass order."""
    import numpy as np

    px = np.asarray(indices, dtype=np.uint8)
    h, w = px.shape
    pal = list(palette)
    bits = max(1, (len(pal) - 1).bit_length())
    pal_size = 1 << bits
    gct = bytearray()
    for i in range(pal_size):
        r, g, b = pal[i] if i < len(pal) else (0, 0, 0)
        gct += bytes((r, g, b))
    if interlace:
        order = [y for start, step in _GIF_PASSES for y in range(start, h, step)]
        px = px[order]
    min_code = max(2, bits)
    lzw = _lzw_compress(px.reshape(-1), min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)
    return (
        b"GIF89a"
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg, aspect
        + bytes(gct)
        + b"\x2c" + bytes(4)  # image descriptor at (0, 0)
        + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0x40 if interlace else 0])
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )


def _gif_frame_indices(payload: bytes, pos: int, gct):
    """Parse ONE image descriptor at payload[pos] (== 0x2C): LZW inflate
    + de-interlace + palette mapping setup. Returns
    (index_array, left, top, palette_array, next_pos)."""
    import numpy as np

    if pos + 10 > len(payload):
        raise ValueError("truncated GIF image descriptor")
    left = int.from_bytes(payload[pos + 1:pos + 3], "little")
    top = int.from_bytes(payload[pos + 3:pos + 5], "little")
    w = int.from_bytes(payload[pos + 5:pos + 7], "little")
    h = int.from_bytes(payload[pos + 7:pos + 9], "little")
    _check_decode_dims(w, h)
    iflags = payload[pos + 9]
    pos += 10
    pal = gct
    if iflags & 0x80:  # local color table
        n = 2 << (iflags & 0x07)
        pal = payload[pos:pos + 3 * n]
        pos += 3 * n
    if pal is None:
        raise ValueError("GIF frame has no color table")
    if pos >= len(payload):
        raise ValueError("truncated GIF before LZW data")
    min_code = payload[pos]
    pos += 1
    lzw = bytearray()
    while pos < len(payload) and payload[pos] != 0:
        ln = payload[pos]
        lzw += payload[pos + 1:pos + 1 + ln]
        pos += 1 + ln
    if pos < len(payload):
        pos += 1  # block terminator
    idx = np.array(
        _lzw_decompress(bytes(lzw), min_code, w * h), dtype=np.int64
    ).reshape(h, w)
    if iflags & 0x40:  # de-interlace
        order = [
            y for start, step in _GIF_PASSES for y in range(start, h, step)
        ]
        deint = np.zeros_like(idx)
        deint[order] = idx
        idx = deint
    palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    if int(idx.max(initial=0)) >= len(palette):
        raise ValueError("GIF pixel index outside color table")
    return idx, left, top, palette, pos


def encode_gif_animation(
    frames,
    palette,
    delays=None,
    disposals=None,
    transparent=None,
    offsets=None,
    screen=None,
) -> bytes:
    """Encode an animated GIF89a: ``frames`` is a list of (h, w) uint8
    index arrays (shapes may differ per frame), ``palette`` one global
    [(r, g, b), ...] table, ``delays`` per-frame centiseconds,
    ``disposals`` per-frame disposal methods (0-3), ``transparent`` a
    per-frame transparency index (or None), ``offsets`` per-frame
    (left, top) canvas positions, ``screen`` an explicit (W, H) logical
    screen. Each frame gets a graphic-control extension; pixel data is
    the same from-scratch LZW as encode_gif."""
    import numpy as np

    n = len(frames)
    if n == 0:
        raise ValueError("animation needs at least one frame")
    delays = list(delays) if delays is not None else [0] * n
    disposals = list(disposals) if disposals is not None else [0] * n
    transparent = list(transparent) if transparent is not None else [None] * n
    offsets = list(offsets) if offsets is not None else [(0, 0)] * n
    if not (len(delays) == len(disposals) == len(transparent)
            == len(offsets) == n):
        raise ValueError("per-frame lists must match the frame count")
    pal = list(palette)
    bits = max(1, (len(pal) - 1).bit_length())
    pal_size = 1 << bits
    gct = bytearray()
    for i in range(pal_size):
        r, g, b = pal[i] if i < len(pal) else (0, 0, 0)
        gct += bytes((r, g, b))
    if screen is None:
        sw = max(off[0] + np.asarray(f).shape[1]
                 for off, f in zip(offsets, frames))
        sh = max(off[1] + np.asarray(f).shape[0]
                 for off, f in zip(offsets, frames))
    else:
        sw, sh = screen
    min_code = max(2, bits)
    out = bytearray(
        b"GIF89a"
        + sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
        + bytes([0x80 | (bits - 1), 0, 0])
        + bytes(gct)
    )
    for f, delay, disp, tidx, (left, top) in zip(
        frames, delays, disposals, transparent, offsets
    ):
        px = np.asarray(f, dtype=np.uint8)
        h, w = px.shape
        if left + w > sw or top + h > sh:
            raise ValueError("frame rect outside the logical screen")
        packed = ((disp & 0x07) << 2) | (0x01 if tidx is not None else 0)
        out += bytes(
            [0x21, 0xF9, 4, packed]
        ) + int(delay).to_bytes(2, "little") + bytes(
            [tidx if tidx is not None else 0, 0]
        )
        out += (
            b"\x2c"
            + left.to_bytes(2, "little") + top.to_bytes(2, "little")
            + w.to_bytes(2, "little") + h.to_bytes(2, "little")
            + bytes([0, min_code])
        )
        lzw = _lzw_compress(px.reshape(-1), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_pixels(payload: bytes):
    """Decode the FIRST frame of a GIF87a/89a to an (h, w, 3) uint8 RGB
    array: real LZW inflate (variable code width, clear/EOI, KwKwK),
    global/local color tables, extension-block skipping, and 4-pass
    de-interlacing. Raises ValueError on malformed streams — explicit
    decode, like the BMP/PNG codecs. (decode_gif_frames composes ALL
    frames of an animation on the logical-screen canvas.)"""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            idx, _left, _top, palette, pos = _gif_frame_indices(
                payload, pos, gct
            )
            return palette[idx].copy()
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image frame")


def decode_gif_frames(payload: bytes):
    """Decode ALL frames of a (possibly animated) GIF87a/89a, composed
    on the logical-screen canvas per the spec's graphic-control
    semantics: per-frame sub-rectangles at (left, top), transparency
    index masking, and disposal methods 0/1 (keep), 2 (restore to
    background color) and 3 (restore to previous canvas). Returns
    (frames, delays_cs): a list of (H, W, 3) uint8 RGB canvases — one
    per rendered frame — and the per-frame GCE delays in centiseconds.
    This is the repo's real video-style container decode: frame
    iteration over a compressed stream, the shape mm_frame_sample's
    sampling logic consumes."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        raise ValueError("not a GIF payload")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    _check_decode_dims(sw, sh)
    flags = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    bg_rgb = (
        tuple(gct[3 * bg_idx:3 * bg_idx + 3])
        if gct is not None and 3 * bg_idx + 3 <= len(gct)
        else (0, 0, 0)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_rgb
    frames: list = []
    delays: list[int] = []
    gce = None  # (disposal, transparent_index | None, delay_cs)
    max_frames = 4096  # bound a corrupt stream's frame fan-out
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            label = payload[pos + 1] if pos + 1 < len(payload) else -1
            if (
                label == 0xF9
                and pos + 7 < len(payload)
                and payload[pos + 2] == 4
            ):
                packed = payload[pos + 3]
                delay = int.from_bytes(payload[pos + 4:pos + 6], "little")
                tidx = payload[pos + 6] if packed & 0x01 else None
                gce = ((packed >> 2) & 0x07, tidx, delay)
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:
            idx, left, top, palette, pos = _gif_frame_indices(
                payload, pos, gct
            )
            fh, fw = idx.shape
            if top + fh > sh or left + fw > sw:
                raise ValueError("GIF frame rect outside logical screen")
            if len(frames) >= max_frames:
                raise ValueError("GIF frame count exceeds decoder bound")
            disposal, tidx, delay = gce if gce is not None else (0, None, 0)
            prev = canvas.copy() if disposal == 3 else None
            region = canvas[top:top + fh, left:left + fw]
            rgb = palette[idx]
            if tidx is None:
                region[:] = rgb
            else:
                mask = idx != tidx
                region[mask] = rgb[mask]
            frames.append(canvas.copy())
            delays.append(delay)
            if disposal == 2:
                # "Restore to background" paints the GCT background
                # color — unless the frame's GCE marks that very index
                # transparent (or there is no GCT), in which case
                # conformant renderers restore to TRANSPARENCY; on this
                # RGB-only canvas that means leaving the prior composite
                # in place rather than flooding it with bg_rgb.
                if gct is not None and tidx != bg_idx:
                    canvas[top:top + fh, left:left + fw] = bg_rgb
            elif disposal == 3 and prev is not None:
                canvas = prev
            gce = None
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x}")
    if not frames:
        raise ValueError("GIF contains no image frame")
    return frames, delays


# ---------------------------------------------------------------------------
# Real COMPRESSED pixel decode #3 — baseline JPEG (ITU-T T.81 sequential
# DCT), pure Python + numpy: the last image format the header parser
# knows whose pixels previously had no decoder. decode_jpeg_pixels
# implements the full baseline pipeline — marker walk, DQT/DHT table
# parsing (general: tables come FROM THE STREAM, so any baseline file's
# canonical Huffman tables work, not just our encoder's), byte-unstuffed
# entropy-decoding of DC-difference categories + AC run/size pairs with
# EXTEND sign recovery, dequantization through the zigzag order
# (generated algorithmically, not transcribed), 8x8 inverse DCT, and
# JFIF YCbCr→RGB. Subset: 8-bit baseline, 1 or 3 components, sampling
# factors 1-2 per axis (4:4:4 / 4:2:2 / 4:2:0 interleaved MCUs, chroma
# replicate-upsampled) and DRI/RSTn restart intervals — the layouts real
# camera files use; progressive (SOF2) raises ValueError.
# encode_jpeg is the matching encoder (orthonormal DCT, flat
# quantization by default = near-lossless, canonical fixed-length
# Huffman tables written into DHT) so tests can bound the decode error
# arithmetically; JPEG being lossy, round-trips assert closeness, not
# identity.
# ---------------------------------------------------------------------------


def _zigzag_order():
    """The 64-entry zigzag scan, generated (not transcribed): walk the
    anti-diagonals of an 8x8 grid, alternating direction."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(diag)
    return [y * 8 + x for y, x in order]


_ZIGZAG = _zigzag_order()


def _dct_matrix():
    import numpy as np

    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5  # orthonormal: M @ block @ M.T is the 2-D DCT


def _bit_category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _JpegBitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, width: int) -> None:
        # MSB-first bit packing with 0xFF byte stuffing
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def _pad_to_byte(self) -> None:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1-bits per spec
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0

    def restart(self, i: int) -> None:
        """Pad to a byte boundary and emit RST(i % 8) — the entropy-coded
        segment boundary written every DRI interval."""
        self._pad_to_byte()
        self.out += bytes([0xFF, 0xD0 | (i & 7)])

    def flush(self) -> bytes:
        self._pad_to_byte()
        return bytes(self.out)


class _JpegBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError("unexpected marker in entropy stream")
                self.pos += 1  # skip stuffed 0x00
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, width: int) -> int:
        v = 0
        for _ in range(width):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self, i: int) -> None:
        """Discard fill bits and consume the expected RST(i % 8) marker."""
        self.n = 0
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != (0xD0 | (i & 7))
        ):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2


def _huffman_from_dht(counts, symbols):
    """(code, length) -> symbol map from DHT's BITS/HUFFVAL canonical
    construction (T.81 annex C)."""
    table = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(code, length)] = symbols[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _huffman_fixed(symbols, length: int):
    """Canonical table giving every symbol the SAME code length (valid
    while count < 2^length; simple, and written verbatim into DHT so any
    conformant decoder reads it back)."""
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    enc = {}
    code = 0
    for s in symbols:
        enc[s] = (code, length)
        code += 1
    return counts, enc


def _extend(extra: int, size: int) -> int:
    if size == 0:
        return 0
    return extra if extra >= (1 << (size - 1)) else extra - (1 << size) + 1


def _rgb_to_ycbcr(px):
    import numpy as np

    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc):
    import numpy as np

    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255)


def _box_downsample(plane, fx: int, fy: int):
    """Average fx-wide x fy-tall pixel boxes (edge-replicating odd
    dimensions first) — the standard chroma downsample for 4:2:2/4:2:0."""
    import numpy as np

    h, w = plane.shape
    ph, pw = -(-h // fy) * fy, -(-w // fx) * fx
    ys = np.minimum(np.arange(ph), h - 1)
    xs = np.minimum(np.arange(pw), w - 1)
    p = plane[np.ix_(ys, xs)]
    return p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))


def encode_jpeg(
    pixels,
    quant: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) greyscale uint8 array as a
    baseline sequential JPEG (SOF0, tables embedded). ``quant`` scales a
    flat quantization table — 1 is near-lossless, larger values coarser.
    ``subsampling`` picks the chroma layout: "444" stores full-resolution
    chroma in 8x8 MCUs; "422"/"420" box-downsample Cb/Cr and interleave
    16x8 / 16x16 MCUs (2 or 4 Y blocks then Cb, Cr), the layout camera
    and phone JPEGs actually use. ``restart_interval`` > 0 writes a DRI
    segment and an RSTn marker every that many MCUs (the error-resilience
    feature real encoders emit; DC predictors reset at each marker)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    grey = px.ndim == 2
    h, w = px.shape[0], px.shape[1]
    if grey:
        planes = [px.astype(np.float64)]
        factors = [(1, 1)]
    else:
        y, cb, cr = np.moveaxis(_rgb_to_ycbcr(px), -1, 0)
        sub = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}.get(subsampling)
        if sub is None:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        sh, sv = sub
        if (sh, sv) == (1, 1):
            planes = [y, cb, cr]
        else:
            planes = [
                y,
                _box_downsample(cb, sh, sv),
                _box_downsample(cr, sh, sv),
            ]
        factors = [(sh, sv), (1, 1), (1, 1)]
    ncomp = len(planes)
    max_h = max(hc for hc, _ in factors)
    max_v = max(vc for _, vc in factors)
    qtab = np.full(64, max(1, int(quant)), dtype=np.int32)
    m = _dct_matrix()

    # entropy-code all blocks, collecting with fixed-length tables
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    dc_counts, dc_enc = _huffman_fixed(dc_syms, 8)
    ac_counts, ac_enc = _huffman_fixed(ac_syms, 9)
    bw = _JpegBitWriter()
    prev_dc = [0] * ncomp

    def put_block(ci: int, plane, by: int, bx: int) -> None:
        ph, pw = plane.shape
        ys = np.minimum(by * 8 + np.arange(8), ph - 1)
        xs = np.minimum(bx * 8 + np.arange(8), pw - 1)
        coef = m @ (plane[np.ix_(ys, xs)] - 128.0) @ m.T
        q = np.round(coef.reshape(-1) / qtab).astype(np.int64)
        zz = q[_ZIGZAG]
        diff = int(zz[0]) - prev_dc[ci]
        prev_dc[ci] = int(zz[0])
        size = _bit_category(diff)
        code, ln = dc_enc[size]
        bw.write(code, ln)
        if size:
            bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                bw.write(code, ln)
                run -= 16
            size = _bit_category(v)
            code, ln = ac_enc[(run << 4) | size]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << size) - 1, size)
            run = 0
        if run:
            code, ln = ac_enc[0x00]
            bw.write(code, ln)

    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    for mi in range(mcuy * mcux):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.restart((mi // restart_interval - 1) % 8)
            prev_dc[:] = [0] * ncomp
        my, mx = divmod(mi, mcux)
        for ci, (plane, (hc, vc)) in enumerate(zip(planes, factors)):
            for iy in range(vc):
                for ix in range(hc):
                    put_block(ci, plane, my * vc + iy, mx * hc + ix)
    entropy = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    dqt = seg(0xDB, bytes([0]) + bytes(int(qtab[_ZIGZAG[i]]) for i in range(64)))
    sof_comps = b"".join(
        bytes([cid + 1, (factors[cid][0] << 4) | factors[cid][1], 0])
        for cid in range(ncomp)
    )
    sof = seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([ncomp]) + sof_comps,
    )
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms)) + seg(
        0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms)
    )
    dri = (
        seg(0xDD, int(restart_interval).to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    sos_comps = b"".join(bytes([cid + 1, 0x00]) for cid in range(ncomp))
    sos = seg(0xDA, bytes([ncomp]) + sos_comps + bytes([0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy + b"\xff\xd9"
    )


def decode_jpeg_pixels(payload: bytes):
    """Decode a baseline sequential JPEG (SOF0, 8-bit, 1 or 3 components)
    to an (h, w, 3) RGB or (h, w) grey uint8 array. Tables are read from
    the stream's DQT/DHT segments (canonical Huffman per T.81 annex C),
    and the entropy decoder handles interleaved MCUs with sampling
    factors 1-2 per axis (4:4:4, 4:2:2, 4:2:0 — subsampled chroma is
    upsampled by pixel replication) plus DRI/RSTn restart intervals, so
    camera-style files from real encoders decode; progressive (SOF2) or
    arithmetic-coded files raise ValueError."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    restart = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF
        # fill bytes; real encoders emit them between segments.
        while pos + 2 <= len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        ln = int.from_bytes(payload[pos + 2:pos + 4], "big")
        body = payload[pos + 4:pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1:p + 65], dtype=np.uint8)
                tab = np.empty(64, dtype=np.int64)
                tab[_ZIGZAG] = zz
                qtabs[tid] = tab
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1:p + 17])
                n = sum(counts)
                symbols = list(body[p + 17:p + 17 + n])
                if len(counts) < 16 or len(symbols) < n:
                    raise ValueError("truncated JPEG DHT segment")
                htabs[(cls, tid)] = _huffman_from_dht(counts, symbols)
                p += 17 + n
        elif marker == 0xC0:
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF0 segment")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            _check_decode_dims(w, h)
            ncomp = body[5]
            if len(body) < 6 + 3 * ncomp:
                raise ValueError("truncated JPEG SOF0 segment")
            comps = []
            for c in range(ncomp):
                cid, hv, qid = body[6 + 3 * c:9 + 3 * c]
                hc, vc = hv >> 4, hv & 0x0F
                if not (1 <= hc <= 2 and 1 <= vc <= 2):
                    raise ValueError(
                        f"unsupported JPEG sampling factors {hc}x{vc}"
                    )
                comps.append((cid, hc, vc, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            if len(body) < 2:
                raise ValueError("truncated JPEG DRI segment")
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            ns = body[0]
            scan = [
                (body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 0x0F)
                for c in range(ns)
            ]
            pos += 2 + ln
            break  # entropy data follows
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if len(scan) != len(comps) or len(scan) not in (1, 3):
        raise ValueError("JPEG scan must cover 1 or 3 frame components")
    comp_info = {cid: (hc, vc, qid) for cid, hc, vc, qid in comps}
    if len(comp_info) != len(comps):
        raise ValueError("duplicate JPEG component id")
    if len(scan) == 1:
        # Non-interleaved single-component scan: the MCU is ONE data unit
        # and the component is coded at full frame resolution (T.81
        # A.2.2), whatever sampling factors the SOF declares.
        sf = [(1, 1)]
    else:
        sf = []
        for cid, _dct, _act in scan:
            if cid not in comp_info:
                raise ValueError("JPEG scan references unknown component")
            sf.append(comp_info[cid][:2])
    max_h = max(hc for hc, _ in sf)
    max_v = max(vc for _, vc in sf)
    m = _dct_matrix()
    reader = _JpegBitReader(payload[pos:])

    def read_symbol(table: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (code, length) in table:
                return table[(code, length)]
        raise ValueError("invalid JPEG Huffman code")

    mcux = -(-w // (8 * max_h))
    mcuy = -(-h // (8 * max_v))
    planes = [
        np.zeros((mcuy * vc * 8, mcux * hc * 8)) for hc, vc in sf
    ]
    prev_dc = [0] * len(scan)
    for mi in range(mcuy * mcux):
        if restart and mi and mi % restart == 0:
            reader.expect_restart((mi // restart - 1) % 8)
            prev_dc = [0] * len(scan)
        my, mx = divmod(mi, mcux)
        for ci, (cid, dct, act) in enumerate(scan):
            hc, vc = sf[ci]
            dc_tab = htabs.get((0, dct))
            ac_tab = htabs.get((1, act))
            qtab = qtabs.get(comp_info[cid][2] if cid in comp_info else None)
            if dc_tab is None or ac_tab is None or qtab is None:
                raise ValueError("JPEG references undefined table")
            for iy in range(vc):
                for ix in range(hc):
                    zz = np.zeros(64, dtype=np.int64)
                    size = read_symbol(dc_tab)
                    if size > 15:
                        # DC size categories are <= 11 for 8-bit baseline;
                        # a corrupt DHT can map a code to any byte, and
                        # read_bits(255) would build an int that overflows
                        # the int64 coefficient array.
                        raise ValueError("invalid JPEG DC size category")
                    diff = _extend(reader.read_bits(size), size)
                    prev_dc[ci] += diff
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        sym = read_symbol(ac_tab)
                        if sym == 0x00:
                            break
                        if sym == 0xF0:
                            k += 16
                            continue
                        run, size = sym >> 4, sym & 0x0F
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    coef = np.empty(64, dtype=np.float64)
                    coef[_ZIGZAG] = zz * qtab[_ZIGZAG]
                    block = m.T @ coef.reshape(8, 8) @ m + 128.0
                    by, bx = my * vc + iy, mx * hc + ix
                    planes[ci][
                        by * 8:by * 8 + 8, bx * 8:bx * 8 + 8
                    ] = block
    full = []
    for (hc, vc), p in zip(sf, planes):
        if hc != max_h or vc != max_v:
            # replicate-upsample subsampled chroma back to frame grid
            p = np.repeat(
                np.repeat(p, max_v // vc, axis=0), max_h // hc, axis=1
            )
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    ycc = np.stack(full, axis=-1)
    return _ycbcr_to_rgb(ycc).astype(np.uint8)


# ---------------------------------------------------------------------------
# Real COMPRESSED audio decode — ITU-T G.711 companding (u-law fmt 7,
# A-law fmt 6 inside RIFF/WAVE): logarithmic 2:1 compression, expanded
# with the exact segment arithmetic of the standard (the decoder is the
# conformance-critical side; the encoder picks the nearest code by
# exhaustive search over the 256-entry expansion table, which is optimal
# companding by construction). decode_wav_samples dispatches on the fmt
# tag, so G.711 WAV files from real telephony tooling decode end-to-end.
# Perceptual codecs (MP3/AAC/Opus) remain the declared stub.
# ---------------------------------------------------------------------------


def ulaw_to_linear(code: int) -> int:
    """Expand one G.711 u-law byte to a linear int16 sample."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    return 0x84 - t if (u & 0x80) else t - 0x84


def alaw_to_linear(code: int) -> int:
    """Expand one G.711 A-law byte to a linear int16 sample."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _g711_tables():
    import numpy as np

    ulaw = np.array([ulaw_to_linear(b) for b in range(256)], dtype=np.int32)
    alaw = np.array([alaw_to_linear(b) for b in range(256)], dtype=np.int32)
    return ulaw, alaw


def g711_encode(samples, law: str) -> bytes:
    """Compress linear int16 samples to G.711 bytes by nearest-code
    search over the expansion table (ties -> lowest byte value)."""
    import numpy as np

    ulaw, alaw = _g711_tables()
    table = ulaw if law == "ulaw" else alaw
    s = np.asarray(samples, dtype=np.int32)
    out = np.empty(len(s), dtype=np.uint8)
    for i in range(0, len(s), 4096):  # chunk the 256-wide argmin
        chunk = s[i:i + 4096]
        out[i:i + 4096] = np.abs(
            table[None, :] - chunk[:, None]
        ).argmin(axis=1)
    return out.tobytes()


def g711_decode(data: bytes, law: str):
    import numpy as np

    ulaw, alaw = _g711_tables()
    table = ulaw if law == "ulaw" else alaw
    return table[np.frombuffer(data, dtype=np.uint8)].astype(np.int16)


# ---------------------------------------------------------------------------
# mm_codec_verify: the COMPRESSED codecs (PNG / GIF / JPEG), graded
# end-to-end. Per document a small RGB (or 16-color palette) image is
# synthesized from closed-form (x, y, doc_id) arithmetic, really
# encoded and really decoded ON THE EXECUTORS with this module's pure-
# Python codecs, and verified: for the lossless codecs the hash-checked
# channel sums are computed FROM THE DECODED PIXELS (a single wrong
# byte anywhere in DEFLATE/LZW handling flips the driver hash); for
# lossy JPEG the sums come from the source formula and the decode is
# bound-checked into the decode_ok boolean (max channel error <= 3 at
# flat-1 quantization — the q26 sketch-verification pattern). The
# oracle recomputes the same sums arithmetically in SQL. One
# mapInPandas pass, zero shuffles; 7 small columns leave the executor.
# ---------------------------------------------------------------------------
CODEC_VERIFY_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("fmt", StringType(), False),
        StructField("src_w", LongType(), False),
        StructField("src_h", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
        StructField("decode_ok", BooleanType(), False),
    ]
)


@query(
    "mm_codec_verify",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             8 + (doc_id * 5) % 25 AS w,
             8 + (doc_id * 3) % 17 AS h,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                  ELSE 'jpeg' END AS fmt
      FROM documents
    ),
    px AS (
      SELECT doc_id, w, h, fmt, t.i % w AS x, t.i // w AS y
      FROM dims, LATERAL (SELECT unnest(range(w * h)) AS i) t
    ),
    chan AS (
      SELECT doc_id, w, h, fmt,
             CASE WHEN fmt = 'gif' THEN 17 * ((x + 2 * y + doc_id) % 16)
                  ELSE (11 * x + y + 3 * doc_id) % 256 END AS r,
             CASE WHEN fmt = 'gif' THEN 255 - 13 * ((x + 2 * y + doc_id) % 16)
                  ELSE (3 * x + 5 * y + 2 * doc_id) % 256 END AS g,
             CASE WHEN fmt = 'gif' THEN 7 * ((x + 2 * y + doc_id) % 16)
                  ELSE (7 * x + 13 * y + doc_id) % 256 END AS b
      FROM px
    )
    SELECT doc_id AS media_id, fmt,
           CAST(w AS BIGINT) AS src_w, CAST(h AS BIGINT) AS src_h,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           TRUE AS decode_ok
    FROM chan GROUP BY doc_id, fmt, w, h
    """,
)
def mm_codec_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")
    palette = [(17 * i, 255 - 13 * i, 7 * i) for i in range(16)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pal = np.array(palette, dtype=np.uint8)
        for pdf in batches:
            out = {k: [] for k in CODEC_VERIFY_SCHEMA.fieldNames()}
            for d in pdf["doc_id"]:
                d = int(d)
                w = 8 + (d * 5) % 25
                h = 8 + (d * 3) % 17
                y, x = np.mgrid[0:h, 0:w]
                fmt = ("png", "gif", "jpeg")[d % 3]
                if fmt == "gif":
                    idx = ((x + 2 * y + d) % 16).astype(np.uint8)
                    src = pal[idx]
                    decoded = decode_gif_pixels(
                        encode_gif(idx, palette, interlace=bool(d % 2))
                    )
                else:
                    src = np.stack(
                        [
                            (11 * x + y + 3 * d) % 256,
                            (3 * x + 5 * y + 2 * d) % 256,
                            (7 * x + 13 * y + d) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    if fmt == "png":
                        # per-row filter mix drives all five unfilters
                        # through the graded path
                        decoded = decode_png_pixels(
                            encode_png(src, [r % 5 for r in range(h)])
                        )
                    else:
                        decoded = decode_jpeg_pixels(encode_jpeg(src, quant=1))
                if fmt == "jpeg":
                    ok = bool(
                        np.abs(
                            decoded.astype(np.int64) - src.astype(np.int64)
                        ).max()
                        <= 3
                    )
                    sums = src.astype(np.int64).sum(axis=(0, 1))
                else:
                    ok = bool(np.array_equal(decoded, src))
                    # lossless: the hash-checked sums READ THE DECODED
                    # BYTES — equality with the oracle's formula sums is
                    # the decode proof itself
                    sums = decoded.astype(np.int64).sum(axis=(0, 1))
                out["media_id"].append(d)
                out["fmt"].append(fmt)
                out["src_w"].append(w)
                out["src_h"].append(h)
                out["sum_r"].append(int(sums[0]))
                out["sum_g"].append(int(sums[1]))
                out["sum_b"].append(int(sums[2]))
                out["decode_ok"].append(ok)
            yield pd.DataFrame(out)

    # The verify work is pure CPU per row, but sf-scale documents.parquet
    # is a single split → one task. Spreading the 8-byte doc_id column
    # across the cores costs a trivial shuffle and buys full parallelism
    # (measured 12.9s → ~1s at sf0.1 on local[32]); at warehouse scale
    # the source has real splits and the repartition coalesces away.
    return spread_small_source(docs.select("doc_id")).mapInPandas(
        run, CODEC_VERIFY_SCHEMA
    )


# ---------------------------------------------------------------------------
# Animated-GIF composition, graded end-to-end: mm_codec_verify proves the
# single-frame codecs; this query proves the ANIMATION semantics — GCE
# delays, full-frame + offset sub-rectangle frames, and the disposal-2 /
# transparent-background interaction (the canvas must keep the prior
# composite when the background index is declared transparent, not flood
# with the background color). Each document synthesizes a 2-frame GIF89a,
# round-trips it through encode_gif_animation -> decode_gif_frames on the
# executors, and emits exact integer canvas sums the oracle recomputes in
# closed form from the same (doc_id) arithmetic.
# ---------------------------------------------------------------------------
GIF_ANIM_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_frames", LongType(), False),
        StructField("total_delay_cs", LongType(), False),
        StructField("canvas_h", LongType(), False),
        StructField("canvas_w", LongType(), False),
        StructField("last_frame_sum", LongType(), False),
        StructField("all_frames_sum", LongType(), False),
    ]
)

# palette entry i contributes 30*i + 6 to a per-pixel RGB channel sum
_GIF_ANIM_PAL = [(10 * i + 1, 10 * i + 2, 10 * i + 3) for i in range(8)]


@query(
    "mm_gif_animation_stats",
    oracle="""
    WITH params AS (
      SELECT doc_id,
             4 + doc_id % 3 AS h,
             5 + doc_id % 4 AS w,
             1 + doc_id % 7 AS a,
             1 + (doc_id * 3 + 1) % 7 AS b,
             3 + doc_id % 5 AS d0,
             3 + (doc_id + 1) % 5 AS d1
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(2 AS BIGINT) AS n_frames,
           CAST(d0 + d1 AS BIGINT) AS total_delay_cs,
           CAST(h AS BIGINT) AS canvas_h,
           CAST(w AS BIGINT) AS canvas_w,
           CAST((h * w - 4) * (30 * a + 6) + 4 * (30 * b + 6) AS BIGINT)
             AS last_frame_sum,
           CAST((2 * h * w - 4) * (30 * a + 6) + 4 * (30 * b + 6)
                AS BIGINT) AS all_frames_sum
    FROM params
    """,
)
def mm_gif_animation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per document: build a 2-frame animated GIF89a — frame 0 fills the
    (h, w) canvas with palette index a, carries disposal method 2 AND
    declares the background index (0) transparent; frame 1 paints a 2x2
    patch of index b at offset (1, 1) — decode it with the real LZW
    decoder + graphic-control compositor, and emit integer channel sums
    of the composed canvases. Because frame 0's disposal is
    restore-to-background with a TRANSPARENT background, the spec-
    conformant canvas keeps frame 0's pixels under frame 1 (flooding
    with the background color instead would subtract
    (h*w-4)*(30a+6) from last_frame_sum — a hash mismatch), so the
    oracle pins exactly the disposal semantics that real-world animation
    renderers rely on. Same scale shape as every mm_* query: one
    zero-shuffle Arrow mapInPandas pass, 7 small columns out."""
    import numpy as np

    docs = load_table(spark, sf_dir, "documents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in GIF_ANIM_SCHEMA.fieldNames()}
            for d in pdf["doc_id"]:
                d = int(d)
                h, w = 4 + d % 3, 5 + d % 4
                a, b = 1 + d % 7, 1 + (d * 3 + 1) % 7
                d0, d1 = 3 + d % 5, 3 + (d + 1) % 5
                f0 = np.full((h, w), a, np.uint8)
                f1 = np.full((2, 2), b, np.uint8)
                payload = encode_gif_animation(
                    [f0, f1],
                    _GIF_ANIM_PAL,
                    delays=[d0, d1],
                    disposals=[2, 0],
                    transparent=[0, None],
                    offsets=[(0, 0), (1, 1)],
                    screen=(w, h),
                )
                # the real decode IS the computation: sums come from the
                # decoded canvases, never from f0/f1
                frames, delays = decode_gif_frames(payload)
                out["media_id"].append(d)
                out["n_frames"].append(len(frames))
                out["total_delay_cs"].append(int(sum(delays)))
                out["canvas_h"].append(int(frames[0].shape[0]))
                out["canvas_w"].append(int(frames[0].shape[1]))
                out["last_frame_sum"].append(
                    int(frames[-1].astype(np.int64).sum())
                )
                out["all_frames_sum"].append(
                    int(sum(f.astype(np.int64).sum() for f in frames))
                )
            yield pd.DataFrame(out)

    return spread_small_source(docs.select("doc_id")).mapInPandas(run, GIF_ANIM_SCHEMA)


# ---------------------------------------------------------------------------
# RIFF AVI container with MJPEG video — the VIDEO-container story, built
# the same way as the WAV path: AVI is pure RIFF byte structure (chunk
# stream with LIST nesting, per the Microsoft AVI RIFF spec), and MJPEG
# frames are plain baseline JPEGs, which this module already encodes and
# decodes for real. encode_avi_mjpeg writes hdrl(avih + strl(strh,strf))
# + movi with '00dc' compressed-frame chunks (odd sizes padded, as the
# spec requires); decode_avi_frames walks the chunk stream — skipping
# unknown chunks/LISTs rather than assuming fixed offsets — validates
# the 'vids'/'MJPG' stream declaration, and decodes every frame with
# decode_jpeg_pixels. Explicit decode: malformed streams raise
# ValueError, like every other codec here.
# ---------------------------------------------------------------------------


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + len(body).to_bytes(4, "little") + body + pad


def encode_avi_mjpeg(
    jpeg_frames: list, width: int, height: int, usec_per_frame: int
) -> bytes:
    """Encode pre-compressed JPEG frames as an AVI/MJPG file."""
    n = len(jpeg_frames)
    if n == 0:
        raise ValueError("AVI needs at least one frame")
    avih = (
        int(usec_per_frame).to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # max bytes/sec (advisory)
        + (0).to_bytes(4, "little")  # padding granularity
        + (0).to_bytes(4, "little")  # dwFlags: no AVIF_HASINDEX — we emit no idx1 chunk, and a set flag would promise one
        + n.to_bytes(4, "little")
        + (0).to_bytes(4, "little")  # initial frames
        + (1).to_bytes(4, "little")  # streams
        + (0).to_bytes(4, "little")  # suggested buffer
        + int(width).to_bytes(4, "little")
        + int(height).to_bytes(4, "little")
        + b"\x00" * 16  # reserved
    )
    strh = (
        b"vids" + b"MJPG"
        + (0).to_bytes(4, "little")  # flags
        + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")  # prio/lang
        + (0).to_bytes(4, "little")  # initial frames
        + (usec_per_frame).to_bytes(4, "little")  # scale
        + (1_000_000).to_bytes(4, "little")  # rate (frames/sec = rate/scale)
        + (0).to_bytes(4, "little")  # start
        + n.to_bytes(4, "little")  # length
        + (0).to_bytes(4, "little")  # suggested buffer
        + (0xFFFFFFFF).to_bytes(4, "little")  # quality
        + (0).to_bytes(4, "little")  # sample size
        + (0).to_bytes(2, "little") * 4  # rcFrame
    )
    strf = (
        (40).to_bytes(4, "little")
        + int(width).to_bytes(4, "little", signed=False)
        + int(height).to_bytes(4, "little", signed=False)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + (width * height * 3).to_bytes(4, "little")
        + b"\x00" * 16
    )
    strl = _riff_chunk(
        b"LIST", b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
    )
    hdrl = _riff_chunk(b"LIST", b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = b"movi" + b"".join(
        _riff_chunk(b"00dc", bytes(f)) for f in jpeg_frames
    )
    movi = _riff_chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_avi_frames(payload: bytes):
    """Decode an AVI/MJPG payload: returns (frames, meta) where frames
    is a list of decoded pixel arrays (one per '00dc' chunk, via the
    real JPEG codec) and meta carries the avih/strh header facts
    {usec_per_frame, total_frames, width, height, handler}."""
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF payload")
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF form is not AVI")
    total = int.from_bytes(payload[4:8], "little")
    if total + 8 > len(payload) + 1:  # +1: odd-size final pad tolerance
        raise ValueError("truncated AVI payload")
    meta = {}
    frames = []
    max_frames = 4096
    max_depth = 32  # AVI nests hdrl/strl/movi ~3 deep; bound crafted
    # LIST-in-LIST towers so corrupt payloads raise ValueError, never
    # RecursionError (the codec fuzz contract)

    def walk(pos: int, end: int, depth: int = 0) -> None:
        if depth > max_depth:
            raise ValueError("AVI LIST nesting exceeds decoder bound")
        while pos + 8 <= end:
            tag = payload[pos:pos + 4]
            ln = int.from_bytes(payload[pos + 4:pos + 8], "little")
            body_start = pos + 8
            body_end = body_start + ln
            if body_end > end:
                raise ValueError("AVI chunk overruns its parent")
            if tag == b"LIST":
                if ln < 4:
                    raise ValueError("AVI LIST too short")
                walk(body_start + 4, body_end, depth + 1)
            elif tag == b"avih":
                if ln < 40:
                    raise ValueError("truncated avih header")
                b = payload[body_start:body_end]
                meta["usec_per_frame"] = int.from_bytes(b[0:4], "little")
                meta["total_frames"] = int.from_bytes(b[16:20], "little")
                meta["width"] = int.from_bytes(b[32:36], "little")
                meta["height"] = int.from_bytes(b[36:40], "little")
            elif tag == b"strh":
                if ln < 8:
                    raise ValueError("truncated strh header")
                if payload[body_start:body_start + 4] == b"vids":
                    meta["handler"] = payload[
                        body_start + 4:body_start + 8
                    ].decode("ascii", "replace")
            elif tag[2:4] == b"dc":  # compressed video frame (e.g. 00dc)
                if len(frames) >= max_frames:
                    raise ValueError("AVI frame count exceeds decoder bound")
                frames.append(
                    decode_jpeg_pixels(payload[body_start:body_end])
                )
            # other chunks (strf, idx1, JUNK, ...) are skipped by size
            pos = body_end + (body_end & 1)  # chunks are word-aligned

    walk(12, min(len(payload), 8 + total))
    if "width" not in meta:
        raise ValueError("AVI missing avih header")
    if meta.get("handler") != "MJPG":
        raise ValueError("AVI video stream is not MJPG")
    if not frames:
        raise ValueError("AVI contains no video frames")
    return frames, meta


# ---------------------------------------------------------------------------
# SubRip (SRT) subtitles — the caption/transcript side of a video
# pipeline (subtitle tracks are training text with TIMING, the alignment
# signal audio/video curation needs). SRT is a plain-text block format:
# cue index line, "HH:MM:SS,mmm --> HH:MM:SS,mmm" timing line, 1+ text
# lines, blank-line terminator. encode_srt/parse_srt implement it for
# real (strict timecode grammar, multi-line cues, CRLF tolerance);
# malformed payloads raise ValueError like every codec here.
# ---------------------------------------------------------------------------


def _srt_timecode(ms: int) -> str:
    if ms < 0:
        raise ValueError("negative SRT timecode")
    h, rem = divmod(ms, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{milli:03d}"


def encode_srt(cues) -> str:
    """Encode [(start_ms, end_ms, [line, ...]), ...] as SRT text."""
    if not cues:
        raise ValueError("SRT needs at least one cue")
    blocks = []
    for i, (start_ms, end_ms, lines) in enumerate(cues, start=1):
        if end_ms <= start_ms:
            raise ValueError("SRT cue must end after it starts")
        if not lines:
            raise ValueError("SRT cue needs at least one text line")
        blocks.append(
            f"{i}\n{_srt_timecode(int(start_ms))} --> "
            f"{_srt_timecode(int(end_ms))}\n" + "\n".join(lines)
        )
    return "\n\n".join(blocks) + "\n"


def _parse_srt_timecode(tc: str) -> int:
    import re

    m = re.fullmatch(r"(\d{2,}):([0-5]\d):([0-5]\d),(\d{3})", tc)
    if not m:
        raise ValueError(f"bad SRT timecode {tc!r}")
    h, mi, s, ms = (int(g) for g in m.groups())
    return ((h * 60 + mi) * 60 + s) * 1000 + ms


def parse_srt(text) -> list:
    """Parse SRT text into [(index, start_ms, end_ms, [line, ...]), ...].
    Accepts CRLF or LF and a UTF-8 BOM; raises ValueError on malformed
    blocks (non-numeric index, bad timecode grammar, start >= end,
    missing text)."""
    if isinstance(text, (bytes, bytearray)):
        text = bytes(text).decode("utf-8", errors="strict")
    text = text.lstrip("﻿").replace("\r\n", "\n").replace("\r", "\n")
    cues = []
    blocks = [b for b in text.split("\n\n") if b.strip("\n ")]
    for block in blocks:
        lines = [ln for ln in block.split("\n") if ln != ""]
        if len(lines) < 3:
            raise ValueError("SRT block needs index, timing, and text")
        if not lines[0].strip().isdigit():
            raise ValueError(f"bad SRT cue index {lines[0]!r}")
        timing = lines[1].split(" --> ")
        if len(timing) != 2:
            raise ValueError(f"bad SRT timing line {lines[1]!r}")
        start_ms = _parse_srt_timecode(timing[0].strip())
        end_ms = _parse_srt_timecode(timing[1].strip())
        if end_ms <= start_ms:
            raise ValueError("SRT cue must end after it starts")
        cues.append((int(lines[0]), start_ms, end_ms, lines[2:]))
    if not cues:
        raise ValueError("SRT contains no cues")
    return cues


# ---------------------------------------------------------------------------
# ISO BMFF (MP4) box structure — the container every video pipeline
# opens first. Boxes are [size:u32be][type:4cc][payload]; size == 1
# switches to a 64-bit largesize after the type (the form >4 GiB mdat
# boxes use), and container boxes (moov/trak/mdia/minf/stbl/edts) nest
# children in their payload. encode_mp4 builds a minimal but
# spec-shaped ftyp/moov(mvhd, trak(tkhd, mdia(mdhd, hdlr)))/free/mdat
# tree; parse_mp4_boxes re-walks it strictly (bounds checks, 4cc
# sanity, version-aware mvhd/mdhd/tkhd field offsets) and raises
# ValueError on any malformed byte — never a silent partial parse.
# ---------------------------------------------------------------------------
_MP4_CONTAINERS = frozenset(
    (b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts")
)
MP4_MAX_DEPTH = 16


def _mp4_box(btype: bytes, payload: bytes, large: bool = False) -> bytes:
    import struct

    if large:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(payload)
        ) + payload
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mp4(
    duration_ms: int, track_dims, mdat_len: int, large_mdat: bool = False
) -> bytes:
    """Build a minimal MP4: ftyp + moov(mvhd + one trak per (w, h) in
    track_dims) + free + mdat of mdat_len filler bytes (largesize form
    when large_mdat). Timescale is 1000, so mvhd/mdhd durations are
    milliseconds."""
    import struct

    if duration_ms < 0 or mdat_len < 0 or not track_dims:
        raise ValueError("bad MP4 parameters")
    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"mp41")
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0, flags 0
        + struct.pack(">IIII", 0, 0, 1000, duration_ms)
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">hH", 0x0100, 0)  # volume 1.0, reserved
        + b"\x00" * 8
        + struct.pack(
            ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24
        + struct.pack(">I", len(track_dims) + 1),
    )
    traks = b""
    for tid, (w, h) in enumerate(track_dims, start=1):
        tkhd = _mp4_box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIIII", 0, 0, tid, 0, duration_ms)
            + b"\x00" * 8
            + struct.pack(">hhhH", 0, 0, 0x0100, 0)
            + struct.pack(
                ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", w << 16, h << 16),
        )
        mdhd = _mp4_box(
            b"mdhd",
            struct.pack(">B3x", 0)
            + struct.pack(">IIII", 0, 0, 1000, duration_ms)
            + struct.pack(">HH", 0x55C4, 0),  # language 'und'
        )
        hdlr = _mp4_box(
            b"hdlr",
            struct.pack(">B3x", 0)
            + b"\x00" * 4
            + b"vide"
            + b"\x00" * 12
            + b"\x00",
        )
        traks += _mp4_box(b"trak", tkhd + _mp4_box(b"mdia", mdhd + hdlr))
    moov = _mp4_box(b"moov", mvhd + traks)
    free = _mp4_box(b"free", b"\x00" * 8)
    body = bytes((7 * i + 13) % 251 for i in range(mdat_len))
    mdat = _mp4_box(b"mdat", body, large=large_mdat)
    return ftyp + moov + free + mdat


def parse_mp4_boxes(payload: bytes):
    """Strictly walk an ISO BMFF box tree. Returns (boxes, info):
    boxes = [(type_str, total_size, depth), ...] in traversal order;
    info = dict(n_boxes, max_depth, duration_ms, n_tracks, mdat_bytes)
    where duration_ms is taken from mvhd normalized by its timescale.
    Raises ValueError on truncated boxes, sizes < header size, non
    printable 4ccs, or nesting beyond MP4_MAX_DEPTH."""
    import struct

    data = bytes(payload)
    boxes: list = []
    info = {
        "duration_ms": None,
        "n_tracks": 0,
        "mdat_bytes": 0,
        "max_depth": 0,
    }

    def walk(lo: int, hi: int, depth: int) -> None:
        if depth > MP4_MAX_DEPTH:
            raise ValueError("MP4 box nesting too deep")
        pos = lo
        while pos < hi:
            if pos + 8 > hi:
                raise ValueError("truncated MP4 box header")
            (size,) = struct.unpack_from(">I", data, pos)
            btype = data[pos + 4 : pos + 8]
            if not all(0x20 <= b < 0x7F for b in btype):
                raise ValueError(f"bad MP4 box type {btype!r}")
            header = 8
            if size == 1:
                if pos + 16 > hi:
                    raise ValueError("truncated MP4 largesize")
                (size,) = struct.unpack_from(">Q", data, pos + 8)
                header = 16
            elif size == 0:  # box runs to end of enclosing scope
                size = hi - pos
            if size < header or pos + size > hi:
                raise ValueError(f"bad MP4 box size {size} for {btype!r}")
            boxes.append((btype.decode("ascii"), size, depth))
            info["max_depth"] = max(info["max_depth"], depth)
            body_lo, body_hi = pos + header, pos + size
            if btype == b"mvhd":
                ver = data[body_lo]
                off = body_lo + 4 + (16 if ver == 1 else 8)
                if ver == 1:
                    timescale, = struct.unpack_from(">I", data, off)
                    duration, = struct.unpack_from(">Q", data, off + 4)
                elif ver == 0:
                    timescale, duration = struct.unpack_from(
                        ">II", data, off
                    )
                else:
                    raise ValueError(f"bad mvhd version {ver}")
                if timescale == 0:
                    raise ValueError("mvhd timescale 0")
                info["duration_ms"] = duration * 1000 // timescale
            elif btype == b"trak":
                info["n_tracks"] += 1
            elif btype == b"mdat":
                info["mdat_bytes"] += body_hi - body_lo
            if btype in _MP4_CONTAINERS:
                walk(body_lo, body_hi, depth + 1)
            pos += size

    walk(0, len(data), 1)
    if not boxes:
        raise ValueError("empty MP4")
    info["n_boxes"] = len(boxes)
    return boxes, info


# ---------------------------------------------------------------------------
# MPEG-1 Layer III (MP3) frame headers — the audio twin of the MP4
# walk: an ID3v2 tag (syncsafe 28-bit size) followed by back-to-back
# frames, each [FF FB | bitrate/samplerate/padding byte | mode byte]
# with length floor(144 * bitrate / samplerate) + padding. VBR streams
# vary the bitrate index per frame, so duration/average bitrate REQUIRE
# the walk (the header-math every audio ingest pipeline runs before
# deciding to decode). parse_mp3_frames validates sync bits, reserved
# bitrate/samplerate indices, and exact frame boundaries; any slack
# byte raises ValueError.
# ---------------------------------------------------------------------------
MP3_BITRATES_KBPS = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
)
MP3_SAMPLE_RATES = (44100, 48000, 32000)
MP3_SAMPLES_PER_FRAME = 1152


def encode_id3v2(payload_len: int) -> bytes:
    """An ID3v2.3 tag header + payload_len zero bytes (syncsafe size)."""
    if not 0 <= payload_len < (1 << 28):
        raise ValueError("ID3v2 payload too large")
    size = bytes(
        (payload_len >> s) & 0x7F for s in (21, 14, 7, 0)
    )
    return b"ID3" + bytes((3, 0, 0)) + size + b"\x00" * payload_len


def mp3_frame_len(bitrate_idx: int, sr_idx: int, padding: bool) -> int:
    br = MP3_BITRATES_KBPS[bitrate_idx]
    if br is None:
        raise ValueError("free-format bitrate not supported")
    return 144 * br * 1000 // MP3_SAMPLE_RATES[sr_idx] + (1 if padding else 0)


def encode_mp3_stream(frames, id3_len: int = 0) -> bytes:
    """Build an MP3 stream: optional ID3v2 tag + one MPEG-1 Layer III
    frame per (bitrate_idx, padding) in frames (sample rate 44100)."""
    out = bytearray(encode_id3v2(id3_len) if id3_len > 0 else b"")
    for bitrate_idx, padding in frames:
        if not 1 <= bitrate_idx <= 14:
            raise ValueError(f"bad MP3 bitrate index {bitrate_idx}")
        flen = mp3_frame_len(bitrate_idx, 0, padding)
        hdr = bytes(
            (
                0xFF,
                0xFB,  # MPEG-1, Layer III, no CRC
                (bitrate_idx << 4) | (0 << 2) | (2 if padding else 0),
                0x00,  # stereo
            )
        )
        out += hdr + bytes((11 * i + 5) % 0xFE for i in range(flen - 4))
    return bytes(out)


def parse_mp3_frames(payload: bytes):
    """Walk an MP3 stream (optional ID3v2 tag + MPEG-1 Layer III
    frames). Returns dict(n_frames, n_padded, sum_bitrate_kbps,
    frame_bytes, id3_bytes, duration_us). Strict: bad sync, reserved
    bitrate/samplerate indices, non-MPEG-1/Layer-III headers, syncsafe
    violations, and trailing slack all raise ValueError."""
    data = bytes(payload)
    pos = 0
    id3_bytes = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("truncated ID3v2 header")
        size_bytes = data[6:10]
        if any(b & 0x80 for b in size_bytes):
            raise ValueError("ID3v2 size bytes must be syncsafe")
        tag_len = 0
        for b in size_bytes:
            tag_len = (tag_len << 7) | b
        id3_bytes = 10 + tag_len
        if id3_bytes > len(data):
            raise ValueError("ID3v2 tag longer than payload")
        pos = id3_bytes
    n_frames = n_padded = sum_br = frame_bytes = duration_us = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, _b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"bad MP3 sync at byte {pos}")
        if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
            raise ValueError("only MPEG-1 Layer III supported")
        bitrate_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0x3
        if bitrate_idx in (0, 15):
            raise ValueError(f"reserved MP3 bitrate index {bitrate_idx}")
        if sr_idx == 3:
            raise ValueError("reserved MP3 sample-rate index")
        padding = bool(b2 & 0x2)
        flen = mp3_frame_len(bitrate_idx, sr_idx, padding)
        if pos + flen > len(data):
            raise ValueError("truncated MP3 frame body")
        n_frames += 1
        n_padded += int(padding)
        sum_br += MP3_BITRATES_KBPS[bitrate_idx]
        frame_bytes += flen
        # per-frame accumulation: frames may legally mix 44.1/48/32 kHz
        duration_us += (
            MP3_SAMPLES_PER_FRAME * 1_000_000 // MP3_SAMPLE_RATES[sr_idx]
        )
        pos += flen
    if n_frames == 0:
        raise ValueError("MP3 stream contains no frames")
    return {
        "n_frames": n_frames,
        "n_padded": n_padded,
        "sum_bitrate_kbps": sum_br,
        "frame_bytes": frame_bytes,
        "id3_bytes": id3_bytes,
        "duration_us": duration_us,
    }


# ---------------------------------------------------------------------------
# MPEG-1 Audio Layer I (ISO/IEC 11172-3) — the subband-coded sibling of
# the Layer III frame walker above, implemented at the BITSTREAM level:
# encode_mpeg1_layer1 packs real mono Layer I frames (32-bit header with
# the Layer I bitrate/sample-rate tables, 4-bit subband allocations,
# 6-bit scalefactor indices, 12 granules of MSB-first sample codes,
# zero-padded to the spec slot length N = floor(12 * bitrate / fs) * 4
# bytes), and parse_mpeg1_layer1_frames walks it all back strictly.
# This narrows the perceptual-audio stub in decode_audio: header,
# bit allocation, scalefactors and sample-code requantization (the
# integer part of the spec's dequantization) are REAL; only the float
# synthesis polyphase filterbank (the perceptual playback stage) stays
# behind the declared NotImplementedError boundary — the same split the
# PNG/DEFLATE work used to close formats stage by stage.
# ---------------------------------------------------------------------------
MPEG1_L1_BITRATES_KBPS = (
    0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448,
)
MPEG1_SAMPLE_RATES = (44100, 48000, 32000)
_L1_SUBBANDS = 32
_L1_GRANULES = 12


class _MsbBitWriter:
    """MSB-first bit packer (no byte stuffing — MPEG audio is raw)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, width: int) -> None:
        if value < 0 or value >> width:
            raise ValueError(f"value {value} overflows {width} bits")
        for i in range(width - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def pad_to(self, nbytes: int) -> bytes:
        while self.n:
            self.write(0, 1)
        if len(self.out) > nbytes:
            raise ValueError(
                f"layer1 frame body {len(self.out)} exceeds slot length"
                f" {nbytes}"
            )
        self.out += bytes(nbytes - len(self.out))
        return bytes(self.out)


class _MsbBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, width: int) -> int:
        if self.bitpos + width > len(self.data) * 8:
            raise ValueError("truncated layer1 bitstream")
        v = 0
        for _ in range(width):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v


def mpeg1_layer1_frame_bytes(bitrate_idx: int, sr_idx: int) -> int:
    """Spec slot math: Layer I frames are slot-aligned, one slot = 4
    bytes, N_slots = floor(12 * bitrate / fs) (+ padding, unused
    here)."""
    if not 1 <= bitrate_idx <= 14:
        raise ValueError(f"reserved layer1 bitrate index {bitrate_idx}")
    if not 0 <= sr_idx <= 2:
        raise ValueError("reserved layer1 sample-rate index")
    br = MPEG1_L1_BITRATES_KBPS[bitrate_idx] * 1000
    return (12 * br // MPEG1_SAMPLE_RATES[sr_idx]) * 4


def encode_mpeg1_layer1(
    sr_idx: int, bitrate_idx: int, frames
) -> bytes:
    """Pack mono Layer I frames. ``frames`` is a list of
    (alloc, scf, samples): alloc = 32 ints (0 = silent subband, 1..14
    -> sample width alloc+1 bits), scf = scalefactor index per
    ACTIVE subband (0..62), samples = 12 granules x active subbands
    sample codes in granule-major order (the spec's transmission
    order)."""
    flen = mpeg1_layer1_frame_bytes(bitrate_idx, sr_idx)
    out = bytearray()
    for alloc, scf, samples in frames:
        if len(alloc) != _L1_SUBBANDS:
            raise ValueError("layer1 allocation must cover 32 subbands")
        if any(a == 15 or a < 0 for a in alloc):
            raise ValueError("layer1 allocation 15 is forbidden")
        active = [i for i in range(_L1_SUBBANDS) if alloc[i]]
        if len(scf) != len(active):
            raise ValueError("one scalefactor per active subband")
        if len(samples) != _L1_GRANULES * len(active):
            raise ValueError("12 sample codes per active subband")
        w = _MsbBitWriter()
        w.write(0xFFF, 12)  # sync
        w.write(1, 1)  # ID: MPEG-1
        w.write(0b11, 2)  # layer I
        w.write(1, 1)  # protection_bit: no CRC
        w.write(bitrate_idx, 4)
        w.write(sr_idx, 2)
        w.write(0, 1)  # padding
        w.write(0, 1)  # private
        w.write(0b11, 2)  # mode: single_channel
        w.write(0, 2)  # mode_extension
        w.write(0, 1)  # copyright
        w.write(1, 1)  # original
        w.write(0, 2)  # emphasis: none
        for a in alloc:
            w.write(a, 4)
        for s in scf:
            if not 0 <= s <= 62:
                raise ValueError("layer1 scalefactor index out of range")
            w.write(s, 6)
        k = 0
        for _g in range(_L1_GRANULES):
            for i, sb in enumerate(active):
                nb = alloc[sb] + 1
                w.write(samples[k], nb)
                k += 1
        out += w.pad_to(flen)
    return bytes(out)


def parse_mpeg1_layer1_frames(payload: bytes):
    """Strictly decode a mono MPEG-1 Layer I stream back to per-frame
    (sr_idx, bitrate_idx, alloc, scf, samples) plus stream totals.
    Raises ValueError on bad sync, reserved table indices, non-Layer-I
    or non-mono headers, allocation 15, scalefactor overflow, or
    trailing slack — the walker contract of parse_mp3_frames, one
    layer down into the audio data itself."""
    data = bytes(payload)
    if not data:
        raise ValueError("empty layer1 stream")
    pos = 0
    frames = []
    code_sum = 0
    dq_ppm_sum = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated layer1 frame header")
        hdr = _MsbBitReader(data[pos : pos + 4])
        if hdr.read(12) != 0xFFF:
            raise ValueError(f"bad layer1 sync at byte {pos}")
        if hdr.read(1) != 1:
            raise ValueError("only MPEG-1 supported")
        if hdr.read(2) != 0b11:
            raise ValueError("not a Layer I frame")
        hdr.read(1)  # protection
        bitrate_idx = hdr.read(4)
        sr_idx = hdr.read(2)
        if hdr.read(1):
            raise ValueError("padded layer1 frames not supported")
        hdr.read(1)  # private
        if hdr.read(2) != 0b11:
            raise ValueError("only single_channel layer1 supported")
        flen = mpeg1_layer1_frame_bytes(bitrate_idx, sr_idx)
        if pos + flen > len(data):
            raise ValueError("truncated layer1 frame body")
        br = _MsbBitReader(data[pos : pos + flen])
        br.read(32)  # header re-skip
        alloc = [br.read(4) for _ in range(_L1_SUBBANDS)]
        if any(a == 15 for a in alloc):
            raise ValueError("layer1 allocation 15 is forbidden")
        active = [i for i in range(_L1_SUBBANDS) if alloc[i]]
        scf = [br.read(6) for _ in active]
        if any(s > 62 for s in scf):
            raise ValueError("layer1 scalefactor index out of range")
        samples = []
        for _g in range(_L1_GRANULES):
            for sb in active:
                nb = alloc[sb] + 1
                code = br.read(nb)
                samples.append(code)
                code_sum += code
                # integer part of the spec requantization: the code's
                # position in [0, 1) as exact ppm (nonnegative, so
                # Spark div == DuckDB // holds in the oracles)
                dq_ppm_sum += code * 1_000_000 // ((1 << nb) - 1)
        # everything after the last sample must be zero pad
        tail_bits = flen * 8 - br.bitpos
        if tail_bits and br.read(tail_bits) != 0:
            raise ValueError("layer1 frame pad bits must be zero")
        frames.append(
            {
                "sr_idx": sr_idx,
                "bitrate_idx": bitrate_idx,
                "alloc": alloc,
                "scf": scf,
                "samples": samples,
            }
        )
        pos += flen
    return {
        "frames": frames,
        "n_frames": len(frames),
        "code_sum": code_sum,
        "dq_ppm_sum": dq_ppm_sum,
    }


def mpeg1_layer1_synthesize(frames) -> "object":
    """Polyphase synthesis filterbank (the perceptual playback stage)
    — the one remaining DECLARED stub in the audio family, and a
    permanent one by nature of its boundary: everything algorithmic
    about Layer I is implemented (parse_mpeg1_layer1_frames decodes
    the full bitstream down to sample-code requantization), but
    spec-conformant synthesis additionally requires the standard's
    512-coefficient prototype window (ISO 11172-3 Table 3-B.3). That
    table is numerically-designed DATA, not a derivable algorithm —
    unlike every closed codec in this family (DEFLATE/LZ4/PNG/JPEG
    tables are all constructible from the spec's rules), there is
    nothing to implement from first principles without embedding the
    table itself, and a substitute window would not be Layer I
    decoding. The boundary is therefore data availability, not
    implementation effort; kept as a loud raise."""
    raise NotImplementedError(
        "layer1 polyphase synthesis requires the spec's 512-coefficient"
        " prototype window table (numeric data, not derivable);"
        " bitstream decode is parse_mpeg1_layer1_frames"
    )


# ---------------------------------------------------------------------------
# POSIX ustar (tar) archives — the shard container WebDataset-style
# training pipelines use (N samples per .tar member, sequential read).
# encode_tar writes strict POSIX.1-1988 ustar: 512-byte headers with
# NUL-terminated octal numerics, the checksum computed over the header
# with the chksum field blanked to spaces, member data padded to the
# 512-byte block, and the two terminating zero blocks. parse_tar_members
# re-walks the archive independently: it validates the ustar magic,
# recomputes every checksum, requires zeroed padding and a proper
# end-of-archive marker, and returns per-member (name, size) plus the
# archive totals an ingest pipeline budgets by.
# ---------------------------------------------------------------------------
TAR_BLOCK = 512


def _tar_octal(value: int, width: int) -> bytes:
    """NUL-terminated, zero-padded octal field (POSIX numeric form)."""
    if value < 0 or value >= 8 ** (width - 1):
        raise ValueError(f"tar numeric {value} overflows {width}-byte field")
    return (f"{value:0{width - 1}o}").encode("ascii") + b"\x00"


def encode_tar(members) -> bytes:
    """Build a ustar archive from (name, payload_bytes) pairs."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode("ascii")
        if not 0 < len(nb) <= 100:
            raise ValueError(f"tar member name length {len(nb)}")
        hdr = bytearray(TAR_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = _tar_octal(0o644, 8)          # mode
        hdr[108:116] = _tar_octal(0, 8)              # uid
        hdr[116:124] = _tar_octal(0, 8)              # gid
        hdr[124:136] = _tar_octal(len(payload), 12)  # size
        hdr[136:148] = _tar_octal(0, 12)             # mtime (epoch: determinism)
        hdr[148:156] = b" " * 8                      # chksum blank for the sum
        hdr[156] = ord("0")                          # typeflag: regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chksum = sum(hdr)
        hdr[148:156] = f"{chksum:06o}".encode("ascii") + b"\x00 "
        out += hdr + payload
        pad = (-len(payload)) % TAR_BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * TAR_BLOCK)
    return bytes(out)


def parse_tar_members(payload: bytes):
    """Strictly walk a ustar archive. Returns (members, info): members =
    [(name, size), ...]; info = dict(n_members, payload_bytes,
    archive_bytes, n_checksum_ok). Raises ValueError on bad magic, bad
    checksum, non-octal numerics, nonzero padding, truncation, or a
    missing end-of-archive marker."""
    data = bytes(payload)
    if len(data) % TAR_BLOCK:
        raise ValueError("tar length is not block-aligned")
    members: list = []
    n_ok = 0
    payload_bytes = 0
    pos = 0
    while True:
        if pos + TAR_BLOCK > len(data):
            raise ValueError("tar truncated before end-of-archive marker")
        hdr = data[pos : pos + TAR_BLOCK]
        if hdr == b"\x00" * TAR_BLOCK:  # first of the two end blocks
            if data[pos + TAR_BLOCK : pos + 2 * TAR_BLOCK] != b"\x00" * TAR_BLOCK:
                raise ValueError("tar end-of-archive marker incomplete")
            break
        if hdr[257:263] != b"ustar\x00":
            raise ValueError(f"bad ustar magic at block {pos // TAR_BLOCK}")
        name = hdr[: hdr.index(b"\x00", 0, 100) if b"\x00" in hdr[:100] else 100]
        size_field = hdr[124:136].rstrip(b"\x00 ")
        if not size_field or any(c not in b"01234567" for c in size_field):
            raise ValueError(f"bad tar size field {size_field!r}")
        size = int(size_field, 8)
        stored = int(hdr[148:156].rstrip(b"\x00 "), 8)
        blanked = hdr[:148] + b" " * 8 + hdr[156:]
        if sum(blanked) != stored:
            raise ValueError(f"tar checksum mismatch for {name!r}")
        n_ok += 1
        body_end = pos + TAR_BLOCK + size
        pad = (-size) % TAR_BLOCK
        if body_end + pad > len(data):
            raise ValueError(f"tar member {name!r} body truncated")
        if any(data[body_end : body_end + pad]):
            raise ValueError(f"tar member {name!r} padding not zeroed")
        try:
            name_s = name.decode("ascii")
        except UnicodeDecodeError as exc:  # fuzz contract: ValueError only
            raise ValueError(f"non-ascii tar member name {name!r}") from exc
        members.append((name_s, size))
        payload_bytes += size
        pos = body_end + pad
    if not members:
        raise ValueError("tar archive has no members")
    return members, {
        "n_members": len(members),
        "payload_bytes": payload_bytes,
        "archive_bytes": pos + 2 * TAR_BLOCK,
        "n_checksum_ok": n_ok,
    }


# ---------------------------------------------------------------------------
# TIFF IFD walk — the metadata layout every EXIF/GeoTIFF ingest parses.
# encode_tiff writes a strict baseline TIFF in EITHER byte order
# ('II'*42 little-endian / 'MM'*42 big-endian): one IFD per page with 8
# inline-valued entries (width/height LONG, bits-per-sample +
# compression + photometric SHORT left-justified in the 4-byte value
# field per the TIFF 6.0 rule, strip offset/rows-per-strip/byte-count
# LONG), IFDs chained through the next-IFD pointer, strip data after
# the IFD chain. parse_tiff_ifds re-walks the chain from the header,
# decoding every entry under the declared byte order, and sums the
# strip bytes it actually reads — a one-byte offset error changes the
# strip checksum and fails the oracle hash.
# ---------------------------------------------------------------------------
TIFF_TYPE_SHORT = 3
TIFF_TYPE_LONG = 4
_TIFF_IFD_ENTRIES = 8
_TIFF_IFD_SIZE = 2 + _TIFF_IFD_ENTRIES * 12 + 4


def encode_tiff(
    pages, big_endian: bool = False, seed: int = 0, strips=None
) -> bytes:
    """Build a multi-page baseline TIFF from (width, height) pairs.
    By default page p's strip is w*h bytes of the constant
    (seed*7 + p*13) % 251, so a reader that finds the strips proves
    every offset; pass ``strips`` (one bytes object per page, length
    w*h) to carry real pixel data instead (mm_tiff_strip_decode)."""
    import struct

    if not pages:
        raise ValueError("TIFF needs at least one page")
    if strips is not None:
        if len(strips) != len(pages):
            raise ValueError("strips count != pages count")
        for (w, h), s in zip(pages, strips):
            if len(s) != w * h:
                raise ValueError("strip length != width*height")
    e = ">" if big_endian else "<"
    n = len(pages)
    ifd_base = 8
    strip_base = ifd_base + n * _TIFF_IFD_SIZE
    offs, acc = [], strip_base
    for w, h in pages:
        if w <= 0 or h <= 0:
            raise ValueError("bad TIFF page dims")
        offs.append(acc)
        acc += w * h
    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(e + "HI", 42, ifd_base)
    for p, (w, h) in enumerate(pages):
        entries = [
            (256, TIFF_TYPE_LONG, 1, w),
            (257, TIFF_TYPE_LONG, 1, h),
            (258, TIFF_TYPE_SHORT, 1, 8),
            (259, TIFF_TYPE_SHORT, 1, 1),   # uncompressed
            (262, TIFF_TYPE_SHORT, 1, 1),   # BlackIsZero
            (273, TIFF_TYPE_LONG, 1, offs[p]),
            (278, TIFF_TYPE_LONG, 1, h),
            (279, TIFF_TYPE_LONG, 1, w * h),
        ]
        out += struct.pack(e + "H", len(entries))
        for tag, typ, cnt, val in entries:
            out += struct.pack(e + "HHI", tag, typ, cnt)
            if typ == TIFF_TYPE_SHORT:
                # left-justified in the 4-byte value field (TIFF 6.0)
                out += struct.pack(e + "H", val) + b"\x00\x00"
            else:
                out += struct.pack(e + "I", val)
        nxt = ifd_base + (p + 1) * _TIFF_IFD_SIZE if p + 1 < n else 0
        out += struct.pack(e + "I", nxt)
    for p, (w, h) in enumerate(pages):
        if strips is not None:
            out += strips[p]
        else:
            out += bytes([(seed * 7 + p * 13) % 251]) * (w * h)
    return bytes(out)


def parse_tiff_ifds(payload: bytes):
    """Strictly walk a TIFF IFD chain. Returns dict(big_endian, n_ifds,
    n_tags, width0, height0, strip_bytes, strip_sum) where strip_sum is
    the integer sum of every strip byte actually read via the
    StripOffsets/StripByteCounts entries. Raises ValueError on bad
    magic, out-of-bounds IFDs/strips, unknown entry types, or an IFD
    chain longer than 64 links (cycle guard)."""
    import struct

    data = bytes(payload)
    if len(data) < 8:
        raise ValueError("TIFF too short for header")
    if data[:2] == b"II":
        e, big = "<", False
    elif data[:2] == b"MM":
        e, big = ">", True
    else:
        raise ValueError(f"bad TIFF byte-order mark {data[:2]!r}")
    magic, ifd_off = struct.unpack_from(e + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    n_ifds = n_tags = strip_bytes = strip_sum = 0
    width0 = height0 = None
    seen = set()
    while ifd_off:
        if ifd_off in seen or len(seen) >= 64:
            raise ValueError("TIFF IFD chain cycle")
        seen.add(ifd_off)
        if ifd_off + 2 > len(data):
            raise ValueError("TIFF IFD offset out of bounds")
        (count,) = struct.unpack_from(e + "H", data, ifd_off)
        end = ifd_off + 2 + count * 12 + 4
        if end > len(data):
            raise ValueError("TIFF IFD overruns payload")
        n_ifds += 1
        n_tags += count
        tags = {}
        for i in range(count):
            off = ifd_off + 2 + i * 12
            tag, typ, cnt = struct.unpack_from(e + "HHI", data, off)
            if typ == TIFF_TYPE_SHORT and cnt == 1:
                (val,) = struct.unpack_from(e + "H", data, off + 8)
            elif typ == TIFF_TYPE_LONG and cnt == 1:
                (val,) = struct.unpack_from(e + "I", data, off + 8)
            else:
                raise ValueError(f"unsupported TIFF entry type {typ}/{cnt}")
            tags[tag] = val
        if n_ifds == 1:
            width0, height0 = tags.get(256), tags.get(257)
            if width0 is None or height0 is None:
                raise ValueError("first TIFF IFD missing dimensions")
        if 273 in tags or 279 in tags:
            so, sb = tags.get(273), tags.get(279)
            if so is None or sb is None:
                raise ValueError("TIFF strip offset/count must pair")
            if so + sb > len(data):
                raise ValueError("TIFF strip out of bounds")
            strip_bytes += sb
            strip_sum += sum(data[so : so + sb])
        (ifd_off,) = struct.unpack_from(e + "I", data, end - 4)
    if n_ifds == 0:
        raise ValueError("TIFF has no IFDs")
    return {
        "big_endian": big,
        "n_ifds": n_ifds,
        "n_tags": n_tags,
        "width0": width0,
        "height0": height0,
        "strip_bytes": strip_bytes,
        "strip_sum": strip_sum,
    }


# ---------------------------------------------------------------------------
# ZIP archives (stored entries) — the other shard container training
# pipelines ingest (and the one with the trap tar lacks: the TRUTH
# lives in the central directory at the END of the file, so a correct
# reader walks backwards from the end-of-central-directory record and
# then cross-checks each entry's local header). encode_zip writes
# store-method (no compression) entries with real CRC-32s; the parser
# locates the EOCD, walks the central directory, verifies every local
# header against its central entry field-for-field, and recomputes
# every CRC over the actual data bytes.
# ---------------------------------------------------------------------------
_ZIP_LOCAL_SIG = 0x04034B50
_ZIP_CENTRAL_SIG = 0x02014B50
_ZIP_EOCD_SIG = 0x06054B50


def encode_zip(members) -> bytes:
    """Build a stored-entry ZIP from (name, payload_bytes) pairs."""
    import struct
    import zlib

    locals_blob = bytearray()
    central = bytearray()
    offsets = []
    for name, payload in members:
        nb = name.encode("ascii")
        if not 0 < len(nb) < 0xFFFF:
            raise ValueError(f"zip member name length {len(nb)}")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        offsets.append(len(locals_blob))
        locals_blob += struct.pack(
            "<IHHHHHIIIHH",
            _ZIP_LOCAL_SIG, 20, 0, 0, 0, 0x21,
            crc, len(payload), len(payload), len(nb), 0,
        ) + nb + payload
    for (name, payload), off in zip(members, offsets):
        nb = name.encode("ascii")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII",
            _ZIP_CENTRAL_SIG, 20, 20, 0, 0, 0, 0x21,
            crc, len(payload), len(payload), len(nb), 0, 0, 0, 0, 0, off,
        ) + nb
    eocd = struct.pack(
        "<IHHHHIIH",
        _ZIP_EOCD_SIG, 0, 0, len(members), len(members),
        len(central), len(locals_blob), 0,
    )
    return bytes(locals_blob) + bytes(central) + eocd


def parse_zip_entries(payload: bytes):
    """Strictly walk a ZIP from the EOCD backwards. Returns (members,
    info): members = [(name, size), ...] in central-directory order;
    info = dict(n_members, payload_bytes, central_dir_bytes,
    archive_bytes, n_crc_ok). Raises ValueError on a missing/short
    EOCD, signature mismatches, central/local disagreement, non-stored
    entries, or out-of-bounds offsets. CRCs are recomputed over the
    data; a mismatch counts the entry out of n_crc_ok (truncation-
    tolerant ingest wants the census, not an abort)."""
    import struct
    import zlib

    data = bytes(payload)
    if len(data) < 22:
        raise ValueError("zip too short for EOCD")
    eocd = data[-22:]
    (sig, _dk, _cdk, n_disk, n_total, cd_size, cd_off, clen) = struct.unpack(
        "<IHHHHIIH", eocd
    )
    if sig != _ZIP_EOCD_SIG or clen != 0:
        raise ValueError("zip EOCD not found at end of archive")
    if n_disk != n_total:
        raise ValueError("multi-disk zip not supported")
    if cd_off + cd_size != len(data) - 22:
        raise ValueError("zip central directory mis-sized")
    members: list = []
    payload_bytes = 0
    n_crc_ok = 0
    pos = cd_off
    for _ in range(n_total):
        if pos + 46 > cd_off + cd_size:
            raise ValueError("zip central directory truncated")
        (csig, _vm, _vn, _fl, method, _t, _d, crc, csize, usize,
         nlen, xlen, cmlen, _dks, _ia, _ea, loff) = struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", data, pos
        )
        if csig != _ZIP_CENTRAL_SIG:
            raise ValueError(f"bad zip central signature at {pos}")
        if method != 0 or csize != usize:
            raise ValueError("only stored zip entries supported")
        try:
            name = data[pos + 46 : pos + 46 + nlen].decode("ascii")
        except UnicodeDecodeError as exc:  # fuzz contract: ValueError only
            raise ValueError("non-ascii zip entry name") from exc
        pos += 46 + nlen + xlen + cmlen
        if loff + 30 + nlen + usize > cd_off:
            raise ValueError(f"zip local entry {name!r} out of bounds")
        (lsig, _lv, _lf, lmethod, _lt, _ld, lcrc, lcsize, lusize,
         lnlen, lxlen) = struct.unpack_from("<IHHHHHIIIHH", data, loff)
        if lsig != _ZIP_LOCAL_SIG:
            raise ValueError(f"bad zip local signature for {name!r}")
        if (lmethod, lcrc, lcsize, lusize, lnlen) != (
            method, crc, csize, usize, nlen
        ):
            raise ValueError(f"zip central/local mismatch for {name!r}")
        lname = data[loff + 30 : loff + 30 + lnlen].decode(
            "ascii", errors="replace"
        )  # a non-ascii local name simply fails the equality below
        if lname != name:
            raise ValueError(f"zip name mismatch {lname!r} != {name!r}")
        # re-check with the LOCAL extra-field length: the first bounds
        # check cannot see lxlen, and a crafted extra field could push
        # the body slice past the central directory otherwise
        if loff + 30 + lnlen + lxlen + usize > cd_off:
            raise ValueError(f"zip local entry {name!r} out of bounds")
        body = data[loff + 30 + lnlen + lxlen : loff + 30 + lnlen + lxlen + usize]
        if (zlib.crc32(body) & 0xFFFFFFFF) == crc:
            n_crc_ok += 1
        members.append((name, usize))
        payload_bytes += usize
    if pos != cd_off + cd_size:
        raise ValueError("zip central directory has trailing slack")
    if not members:
        raise ValueError("zip archive has no entries")
    return members, {
        "n_members": len(members),
        "payload_bytes": payload_bytes,
        "central_dir_bytes": cd_size,
        "archive_bytes": len(data),
        "n_crc_ok": n_crc_ok,
    }


# ---------------------------------------------------------------------------
# ZIP64 (PKWARE APPNOTE 4.5+) — the large-archive extension every
# >4 GiB training shard actually ships with: classic EOCD fields
# saturate to 0xFFFF/0xFFFFFFFF sentinels, the real numbers move to an
# EOCD64 record found via the EOCD64 locator, and per-entry sizes/
# offsets move to the 0x0001 "ZIP64 extended information" extra field.
# encode_zip64 writes the full structure (sentinels everywhere, so the
# parser MUST follow the indirection to read anything); parse_zip64
# walks it back strictly from the end — locator, EOCD64, central
# entries with extra-field override in the spec's fixed field order
# (usize, csize, offset — present exactly for the sentineled fields).
# ---------------------------------------------------------------------------
_ZIP64_EOCD_SIG = 0x06064B50
_ZIP64_LOCATOR_SIG = 0x07064B50
_ZIP64_EXTRA_TAG = 0x0001


def encode_zip64(members) -> bytes:
    """Build a stored-entry ZIP64 archive from (name, payload) pairs:
    every size/offset field saturated to its sentinel with the real
    value in ZIP64 structures, the way archivers write archives that
    exceed (or may exceed) the classic 32-bit limits."""
    import struct
    import zlib

    locals_blob = bytearray()
    central = bytearray()
    offsets = []
    for name, payload in members:
        nb = name.encode("ascii")
        if not 0 < len(nb) < 0xFFFF:
            raise ValueError(f"zip member name length {len(nb)}")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        offsets.append(len(locals_blob))
        extra = struct.pack(
            "<HHQQ", _ZIP64_EXTRA_TAG, 16, len(payload), len(payload)
        )
        locals_blob += (
            struct.pack(
                "<IHHHHHIIIHH",
                _ZIP_LOCAL_SIG, 45, 0, 0, 0, 0x21,
                crc, 0xFFFFFFFF, 0xFFFFFFFF, len(nb), len(extra),
            )
            + nb
            + extra
            + payload
        )
    for (name, payload), off in zip(members, offsets):
        nb = name.encode("ascii")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        extra = struct.pack(
            "<HHQQQ",
            _ZIP64_EXTRA_TAG, 24, len(payload), len(payload), off,
        )
        central += (
            struct.pack(
                "<IHHHHHHIIIHHHHHII",
                _ZIP_CENTRAL_SIG, 45, 45, 0, 0, 0, 0x21,
                crc, 0xFFFFFFFF, 0xFFFFFFFF,
                len(nb), len(extra), 0, 0, 0, 0, 0xFFFFFFFF,
            )
            + nb
            + extra
        )
    cd_off = len(locals_blob)
    eocd64_off = cd_off + len(central)
    eocd64 = struct.pack(
        "<IQHHIIQQQQ",
        _ZIP64_EOCD_SIG, 44, 45, 45, 0, 0,
        len(members), len(members), len(central), cd_off,
    )
    locator = struct.pack(
        "<IIQI", _ZIP64_LOCATOR_SIG, 0, eocd64_off, 1
    )
    eocd = struct.pack(
        "<IHHHHIIH",
        _ZIP_EOCD_SIG, 0, 0, 0xFFFF, 0xFFFF,
        0xFFFFFFFF, 0xFFFFFFFF, 0,
    )
    return bytes(locals_blob) + bytes(central) + eocd64 + locator + eocd


def _zip64_extra(data: bytes, pos: int, xlen: int, wanted: int):
    """Walk an extra-field block, returning the ``wanted`` 8-byte
    values from the 0x0001 ZIP64 extended-information field (spec
    order). Raises ValueError if the block overruns the archive or
    the field is missing or short — a forged xlen must not surface as
    struct.error (the walker contract is ValueError-only)."""
    import struct

    end = pos + xlen
    if end > len(data):
        raise ValueError("zip64 extra block out of bounds")
    while pos + 4 <= end:
        tag, size = struct.unpack_from("<HH", data, pos)
        pos += 4
        if pos + size > end:
            raise ValueError("zip64 extra field overruns extra block")
        if tag == _ZIP64_EXTRA_TAG:
            if size < 8 * wanted:
                raise ValueError(
                    f"zip64 extra field holds {size} bytes,"
                    f" {8 * wanted} needed"
                )
            return struct.unpack_from(f"<{wanted}Q", data, pos)
        pos += size
    raise ValueError("sentineled zip field without a zip64 extra field")


def parse_zip64_entries(payload: bytes):
    """Strictly walk a ZIP64 archive from the end: classic EOCD (all
    counts sentineled), EOCD64 locator, EOCD64 record, then the
    central directory with 0x0001 extra-field overrides; local headers
    re-validated with their own zip64 extras, CRCs recomputed.
    Returns (members, info) like parse_zip_entries, plus
    eocd64_offset. Raises ValueError on any structural violation."""
    import struct
    import zlib

    data = bytes(payload)
    if len(data) < 22 + 20 + 56:
        raise ValueError("zip64 too short for EOCD + locator + EOCD64")
    (sig, _dk, _cdk, n_disk, n_total, cd_size32, cd_off32, clen) = (
        struct.unpack("<IHHHHIIH", data[-22:])
    )
    if sig != _ZIP_EOCD_SIG or clen != 0:
        raise ValueError("zip EOCD not found at end of archive")
    if (n_disk, n_total, cd_size32, cd_off32) != (
        0xFFFF, 0xFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
    ):
        raise ValueError("classic EOCD fields not zip64-sentineled")
    (lsig, ldisk, eocd64_off, ndisks) = struct.unpack(
        "<IIQI", data[-42:-22]
    )
    if lsig != _ZIP64_LOCATOR_SIG:
        raise ValueError("zip64 EOCD locator missing")
    if ldisk != 0 or ndisks != 1:
        raise ValueError("multi-disk zip64 not supported")
    if eocd64_off + 56 > len(data) - 42:
        raise ValueError("zip64 EOCD record out of bounds")
    (esig, esize, _vm, _vn, d1, d2, n_ent, n_ent_total, cd_size,
     cd_off) = struct.unpack_from("<IQHHIIQQQQ", data, eocd64_off)
    if esig != _ZIP64_EOCD_SIG:
        raise ValueError("bad zip64 EOCD signature")
    if esize != 44:
        raise ValueError("unexpected zip64 EOCD record size")
    if d1 != 0 or d2 != 0 or n_ent != n_ent_total:
        raise ValueError("multi-disk zip64 not supported")
    if cd_off + cd_size != eocd64_off:
        raise ValueError("zip64 central directory mis-sized")
    members: list = []
    payload_bytes = 0
    n_crc_ok = 0
    pos = cd_off
    for _ in range(n_ent):
        if pos + 46 > cd_off + cd_size:
            raise ValueError("zip64 central directory truncated")
        (csig, _vm2, _vn2, _fl, method, _t, _d, crc, csize, usize,
         nlen, xlen, cmlen, _dks, _ia, _ea, loff32) = struct.unpack_from(
            "<IHHHHHHIIIHHHHHII", data, pos
        )
        if csig != _ZIP_CENTRAL_SIG:
            raise ValueError(f"bad zip central signature at {pos}")
        if method != 0:
            raise ValueError("only stored zip64 entries supported")
        if (csize, usize, loff32) != (
            0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
        ):
            raise ValueError("zip64 central fields not sentineled")
        if pos + 46 + nlen + xlen + cmlen > cd_off + cd_size:
            raise ValueError("zip64 central entry overruns directory")
        try:
            name = data[pos + 46 : pos + 46 + nlen].decode("ascii")
        except UnicodeDecodeError as exc:
            raise ValueError("non-ascii zip entry name") from exc
        usize64, csize64, loff = _zip64_extra(
            data, pos + 46 + nlen, xlen, 3
        )
        if usize64 != csize64:
            raise ValueError("only stored zip64 entries supported")
        pos += 46 + nlen + xlen + cmlen
        if loff + 30 > cd_off:
            raise ValueError(f"zip64 local entry {name!r} out of bounds")
        (lsig2, _lv, _lf, lmethod, _lt, _ld, lcrc, lcsize, lusize,
         lnlen, lxlen) = struct.unpack_from("<IHHHHHIIIHH", data, loff)
        if lsig2 != _ZIP_LOCAL_SIG:
            raise ValueError(f"bad zip local signature for {name!r}")
        if (lcsize, lusize) != (0xFFFFFFFF, 0xFFFFFFFF):
            raise ValueError("zip64 local sizes not sentineled")
        if lmethod != method or lcrc != crc or lnlen != nlen:
            raise ValueError(f"zip central/local mismatch for {name!r}")
        lname = data[loff + 30 : loff + 30 + lnlen].decode(
            "ascii", errors="replace"
        )
        if lname != name:
            raise ValueError(f"zip name mismatch {lname!r} != {name!r}")
        if loff + 30 + lnlen + lxlen > cd_off:
            raise ValueError(f"zip64 local entry {name!r} out of bounds")
        lusize64, lcsize64 = _zip64_extra(
            data, loff + 30 + lnlen, lxlen, 2
        )
        if (lusize64, lcsize64) != (usize64, csize64):
            raise ValueError(f"zip64 size mismatch for {name!r}")
        body_at = loff + 30 + lnlen + lxlen
        if body_at + usize64 > cd_off:
            raise ValueError(f"zip64 local entry {name!r} out of bounds")
        body = data[body_at : body_at + usize64]
        if (zlib.crc32(body) & 0xFFFFFFFF) == crc:
            n_crc_ok += 1
        members.append((name, usize64))
        payload_bytes += usize64
    if pos != cd_off + cd_size:
        raise ValueError("zip64 central directory has trailing slack")
    if not members:
        raise ValueError("zip64 archive has no entries")
    return members, {
        "n_members": len(members),
        "payload_bytes": payload_bytes,
        "central_dir_bytes": cd_size,
        "archive_bytes": len(data),
        "n_crc_ok": n_crc_ok,
        "eocd64_offset": eocd64_off,
    }


# ---------------------------------------------------------------------------
# FLAC metadata — the audio ingest header walk with a real-world trap:
# metadata BLOCK headers and STREAMINFO are big-endian bit-packed
# (sample rate is a 20-BIT field crossing byte boundaries, total
# samples a 36-bit one), while the VORBIS_COMMENT block inside the
# same file is LITTLE-endian length-prefixed. encode_flac/
# parse_flac_stream implement both faithfully; every emitted number
# requires the bit arithmetic to be exactly right.
# ---------------------------------------------------------------------------
def encode_flac(
    sample_rate: int,
    channels: int,
    bits: int,
    total_samples: int,
    comments=(),
    padding_len: int = 0,
) -> bytes:
    """Build a FLAC metadata stream: fLaC magic + STREAMINFO +
    optional VORBIS_COMMENT + optional last-flagged PADDING."""
    import struct

    if not 1 <= sample_rate < (1 << 20):
        raise ValueError("FLAC sample rate out of 20-bit range")
    if not 1 <= channels <= 8 or not 4 <= bits <= 32:
        raise ValueError("bad FLAC channels/bits")
    if not 0 <= total_samples < (1 << 36):
        raise ValueError("FLAC total_samples out of 36-bit range")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | total_samples
    )
    streaminfo = (
        struct.pack(">HH", 4096, 4096)
        + (1 << 16).to_bytes(3, "big") * 2          # min/max framesize
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                               # unset MD5
    )
    blocks = [(0, streaminfo)]
    if comments:
        vc = struct.pack("<I", 4) + b"ref0"
        vc += struct.pack("<I", len(comments))
        for k, v in comments:
            kv = f"{k}={v}".encode("utf-8")
            vc += struct.pack("<I", len(kv)) + kv
        blocks.append((4, vc))
    if padding_len:
        blocks.append((1, b"\x00" * padding_len))
    out = bytearray(b"fLaC")
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out += bytes([last | btype]) + len(body).to_bytes(3, "big") + body
    return bytes(out)


def parse_flac_stream(payload: bytes):
    """Strictly walk FLAC metadata blocks. Returns dict(sample_rate,
    channels, bits, total_samples, duration_us, n_blocks,
    padding_bytes, n_comments). Raises ValueError on bad magic, a
    missing/short STREAMINFO, a block that overruns the payload, a
    missing last-block flag, or malformed vorbis comment lengths."""
    import struct

    data = bytes(payload)
    if data[:4] != b"fLaC":
        raise ValueError(f"bad FLAC magic {data[:4]!r}")
    pos = 4
    info = None
    n_blocks = padding_bytes = n_comments = 0
    saw_last = False
    while pos < len(data):
        if saw_last:
            raise ValueError("FLAC data after the last-flagged block")
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC block header")
        flags = data[pos]
        btype = flags & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if len(body) != length:
            raise ValueError("FLAC block overruns payload")
        saw_last = bool(flags & 0x80)
        n_blocks += 1
        if btype == 0:
            if length != 34:
                raise ValueError(f"STREAMINFO must be 34 bytes, got {length}")
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "sample_rate": packed >> 44,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & ((1 << 36) - 1),
            }
            if info["sample_rate"] == 0:
                raise ValueError("FLAC sample rate 0")
        elif btype == 1:
            padding_bytes += length
            if any(body):
                raise ValueError("FLAC padding must be zeroed")
        elif btype == 4:
            def _u32(buf: bytes, off: int) -> int:
                if off + 4 > len(buf):
                    raise ValueError("FLAC vorbis field overruns block")
                return int.from_bytes(buf[off : off + 4], "little")

            vlen = _u32(body, 0)
            off = 4 + vlen
            n = _u32(body, off)
            off += 4
            for _ in range(n):
                clen = _u32(body, off)
                off += 4 + clen
                if off > length:
                    raise ValueError("FLAC vorbis comment overruns block")
            n_comments += n
        pos += 4 + length
    if not saw_last:
        raise ValueError("FLAC stream missing last-block flag")
    if info is None:
        raise ValueError("FLAC stream has no STREAMINFO")
    info["duration_us"] = (
        info["total_samples"] * 1_000_000 // info["sample_rate"]
    )
    info["n_blocks"] = n_blocks
    info["padding_bytes"] = padding_bytes
    info["n_comments"] = n_comments
    return info


# ---------------------------------------------------------------------------
# Ogg container pages — the streaming-media framing every audio ingest
# walks before touching a codec. Pages carry packets via SEGMENT
# LACING: a packet of length L becomes floor(L/255) lacing bytes of 255
# plus one terminator byte of L % 255 (a multiple-of-255 packet ends
# with an explicit 0), so packet boundaries are recovered purely from
# the lacing run-lengths. Ogg's page CRC is deliberately NOT the zlib
# CRC: polynomial 0x04C11DB7, zero init, MSB-first, no final xor,
# computed with the CRC field zeroed. encode_ogg/parse_ogg_pages
# implement both faithfully.
# ---------------------------------------------------------------------------
_OGG_CRC_TABLE = None


def _ogg_crc(data: bytes) -> int:
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        table = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
                r &= 0xFFFFFFFF
            table.append(r)
        _OGG_CRC_TABLE = table
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[
            ((crc >> 24) & 0xFF) ^ b
        ]
    return crc


def encode_ogg(pages, serial: int = 1) -> bytes:
    """Build an Ogg stream: ``pages`` is a list of (granule,
    [packet_len, ...]); packet j of page p is filled with byte
    (serial + p + j) % 251. First page is flagged BOS, last EOS."""
    import struct

    if not pages:
        raise ValueError("Ogg stream needs at least one page")
    out = bytearray()
    for p, (granule, packet_lens) in enumerate(pages):
        if not packet_lens:
            raise ValueError("Ogg page needs at least one packet")
        lacing = bytearray()
        body = bytearray()
        for j, plen in enumerate(packet_lens):
            if plen < 0:
                raise ValueError("negative Ogg packet length")
            lacing += b"\xff" * (plen // 255) + bytes([plen % 255])
            body += bytes([(serial + p + j) % 251]) * plen
        if len(lacing) > 255:
            raise ValueError("too many Ogg segments for one page")
        htype = (0x02 if p == 0 else 0) | (
            0x04 if p == len(pages) - 1 else 0
        )
        hdr = (
            b"OggS"
            + bytes([0, htype])
            + struct.pack("<q", granule)
            + struct.pack("<II", serial, p)
            + b"\x00\x00\x00\x00"  # crc placeholder
            + bytes([len(lacing)])
            + bytes(lacing)
        )
        page = bytearray(hdr + body)
        crc = _ogg_crc(bytes(page))
        page[22:26] = struct.pack("<I", crc)
        out += page
    return bytes(out)


def parse_ogg_pages(payload: bytes):
    """Strictly walk Ogg pages. Returns dict(n_pages, n_packets,
    payload_bytes, archive_bytes, last_granule, n_crc_ok). Raises
    ValueError on a bad capture pattern/version, truncation, a
    non-monotone page sequence, a missing BOS/EOS flag, or a lacing
    run that never terminates (a packet spanning past the last page)."""
    import struct

    data = bytes(payload)
    pos = 0
    n_pages = n_packets = payload_bytes = n_crc_ok = 0
    last_granule = None
    open_packet = False
    last_htype = 0
    while pos < len(data):
        if pos + 27 > len(data):
            raise ValueError("truncated Ogg page header")
        if data[pos : pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at byte {pos}")
        if data[pos + 4] != 0:
            raise ValueError(f"unsupported Ogg version {data[pos + 4]}")
        htype = data[pos + 5]
        (granule,) = struct.unpack_from("<q", data, pos + 6)
        (_serial, seq) = struct.unpack_from("<II", data, pos + 14)
        (stored_crc,) = struct.unpack_from("<I", data, pos + 22)
        nseg = data[pos + 26]
        lace_end = pos + 27 + nseg
        if lace_end > len(data):
            raise ValueError("truncated Ogg lacing table")
        lacing = data[pos + 27 : lace_end]
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page body")
        if seq != n_pages:
            raise ValueError(f"Ogg page sequence jump {n_pages} -> {seq}")
        if n_pages == 0 and not htype & 0x02:
            raise ValueError("first Ogg page missing BOS flag")
        zeroed = bytearray(data[pos:page_end])
        zeroed[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(zeroed)) == stored_crc:
            n_crc_ok += 1
        for v in lacing:
            if v < 255:
                n_packets += 1
                open_packet = False
            else:
                open_packet = True
        payload_bytes += body_len
        last_granule = granule
        n_pages += 1
        last_htype = htype
        pos = page_end
        if htype & 0x04 and pos < len(data):
            raise ValueError("data after the EOS-flagged Ogg page")
    if n_pages == 0:
        raise ValueError("empty Ogg stream")
    if not last_htype & 0x04:
        # truncation at a page boundary must not pass as a shorter
        # stream — the final page carries the EOS flag or the walk fails
        raise ValueError("Ogg stream missing EOS flag")
    if open_packet:
        raise ValueError("Ogg packet left unterminated at EOS")
    return {
        "n_pages": n_pages,
        "n_packets": n_packets,
        "payload_bytes": payload_bytes,
        "archive_bytes": pos,
        "last_granule": last_granule,
        "n_crc_ok": n_crc_ok,
    }


# ---------------------------------------------------------------------------
# PDF cross-reference tables — the document-ingest walk: a PDF is read
# from the TAIL (startxref), the fixed-width xref table maps object
# numbers to byte offsets, and each offset must land exactly on its
# "N 0 obj" header. encode_pdf writes a minimal single-section PDF
# (catalog + pages + filler dictionaries); parse_pdf_xref re-walks it
# strictly: 20-byte xref entries, offset verification, trailer /Size.
# ---------------------------------------------------------------------------
def encode_pdf(n_filler: int, seed: int = 0) -> bytes:
    """A minimal PDF: catalog, empty pages tree, and n_filler data
    dictionaries whose padded length varies with ``seed``."""
    if n_filler < 0:
        raise ValueError("negative filler-object count")
    header = b"%PDF-1.4\n"
    bodies = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [] /Count 0 >>",
    ]
    for i in range(n_filler):
        pad = b"x" * (10 + (seed * 13 + i * 7) % 40)
        bodies.append(
            b"<< /Type /Filler /N " + str(i).encode() + b" /Data ("
            + pad + b") >>"
        )
    out = bytearray(header)
    offsets = []
    for num, body in enumerate(bodies, start=1):
        offsets.append(len(out))
        out += (
            str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        )
    xref_off = len(out)
    out += b"xref\n0 " + str(len(bodies) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        b"trailer\n<< /Size " + str(len(bodies) + 1).encode()
        + b" /Root 1 0 R >>\nstartxref\n" + str(xref_off).encode()
        + b"\n%%EOF\n"
    )
    return bytes(out)


def parse_pdf_xref(payload: bytes):
    """Strictly walk a PDF xref table from startxref. Returns
    dict(n_objects, n_verified, xref_offset, trailer_size, file_bytes).
    Raises ValueError on a missing header/startxref/%%EOF, malformed
    20-byte entries, offsets not landing on "N 0 obj", or a trailer
    /Size disagreeing with the table."""
    data = bytes(payload)
    if not data.startswith(b"%PDF-"):
        raise ValueError("missing %PDF header")
    tail = data[-200:]
    sx = tail.rfind(b"startxref")
    if sx == -1 or b"%%EOF" not in tail:
        raise ValueError("missing startxref/%%EOF tail")
    try:
        xref_off = int(tail[sx + 9 :].split()[0])
    except (ValueError, IndexError) as exc:
        raise ValueError("malformed startxref offset") from exc
    if not 0 <= xref_off < len(data) or not data[xref_off:].startswith(
        b"xref"
    ):
        raise ValueError(f"startxref {xref_off} does not point at xref")
    pos = xref_off + 5  # past "xref\n"
    line_end = data.find(b"\n", pos)
    if line_end == -1:
        raise ValueError("truncated xref subsection header")
    try:
        first, count = (int(x) for x in data[pos:line_end].split())
    except ValueError as exc:
        raise ValueError("malformed xref subsection header") from exc
    if first != 0 or count < 1:
        raise ValueError("xref table must start at object 0")
    pos = line_end + 1
    n_verified = 0
    for num in range(count):
        entry = data[pos : pos + 20]
        if len(entry) != 20 or entry[17:18] not in (b"f", b"n"):
            raise ValueError(f"malformed xref entry for object {num}")
        try:
            off = int(entry[:10])
        except ValueError as exc:
            raise ValueError(f"non-numeric xref offset, object {num}") from exc
        if entry[17:18] == b"n":
            want = str(num).encode() + b" 0 obj"
            if not data[off : off + len(want)] == want:
                raise ValueError(
                    f"xref offset {off} does not land on object {num}"
                )
            n_verified += 1
        pos += 20
    trailer = data.find(b"trailer", pos)
    if trailer == -1:
        raise ValueError("missing trailer")
    import re

    m = re.search(rb"/Size\s+(\d+)", data[trailer : trailer + 200])
    if not m:
        raise ValueError("trailer missing /Size")
    trailer_size = int(m.group(1))
    if trailer_size != count:
        raise ValueError(
            f"trailer /Size {trailer_size} != xref count {count}"
        )
    return {
        "n_objects": count - 1,  # entry 0 is the free-list head
        "n_verified": n_verified,
        "xref_offset": xref_off,
        "trailer_size": trailer_size,
        "file_bytes": len(data),
    }


def media_walk_query(
    spark: SparkSession, sf_dir: str, fields, per_doc
) -> DataFrame:
    """Shared scaffold for the per-document container-walk queries
    (tar/TIFF/ZIP/FLAC/Ogg/PDF): ``per_doc(doc_id)`` synthesizes a
    payload, re-parses it with the real walker, and returns a dict
    holding every name in ``fields[1:]``; fields[0] is the id column.
    One Arrow mapInPandas over doc_id — the plan shape every walker
    shares, defined once. The id column is explicitly repartitioned to
    core width first: the per-doc codec work is the entire cost of
    these queries, and the single-file documents.parquet otherwise
    hands mapInPandas ONE partition, serializing every decode on one
    core (r09 A/B on the heaviest walker: 6.1 s -> well under the
    census bar; the shuffle moves only 8-byte ids). An explicit width
    is used because AQE would coalesce a plain shuffle of a few
    thousand ids back to one partition."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [StructField(n, LongType(), False) for n in fields]
    )
    docs = spread_small_source(load_table(spark, sf_dir, "documents"))

    def run(batches):
        for pdf in batches:
            out = {k: [] for k in fields}
            for d in pdf["doc_id"]:
                d = int(d)
                info = per_doc(d)
                out[fields[0]].append(d)
                for k in fields[1:]:
                    out[k].append(info[k])
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# WebP (VP8L lossless) headers — RIFF framing around a little-endian
# BITSTREAM: the VP8L payload packs width-1 and height-1 as 14-bit
# fields (plus alpha-hint and version bits) starting at bit 0 of the
# byte after the 0x2F signature, so correct parsing requires real
# sub-byte bit extraction, not struct unpacking. encode_webp_vp8l
# writes the RIFF/WEBP/VP8L framing with a deterministic filler body;
# parse_webp_vp8l re-walks RIFF sizes and unpacks the bit fields.
# ---------------------------------------------------------------------------
def _vp8l_pack(width: int, height: int, alpha: bool = False) -> bytes:
    """The VP8L 5-byte header (signature + LSB-first 14-bit dims +
    alpha hint + version 0) — ONE definition shared by every WebP
    builder in this module."""
    import struct

    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("VP8L dims out of 14-bit range")
    bits = (width - 1) | ((height - 1) << 14) | ((1 if alpha else 0) << 28)
    return b"\x2f" + struct.pack("<I", bits)


def _vp8l_unpack(body: bytes) -> dict:
    """Decode a VP8L chunk body's 5-byte header (strict signature +
    reserved-version checks) — the single shared inverse of
    _vp8l_pack."""
    import struct

    if len(body) < 5:
        raise ValueError("VP8L chunk too short for the header bits")
    if body[0] != 0x2F:
        raise ValueError(f"bad VP8L signature byte {body[0]:#x}")
    (bits,) = struct.unpack_from("<I", body, 1)
    version = (bits >> 29) & 0x7
    if version != 0:
        raise ValueError(f"reserved VP8L version {version}")
    return {
        "width": (bits & 0x3FFF) + 1,
        "height": ((bits >> 14) & 0x3FFF) + 1,
        "alpha": (bits >> 28) & 1,
        "version": version,
    }


def encode_webp_vp8l(
    width: int, height: int, alpha: bool = False, body_len: int = 16
) -> bytes:
    import struct

    payload = _vp8l_pack(width, height, alpha) + bytes(
        (i * 7 + 3) % 251 for i in range(body_len)
    )
    # RIFF rule: the declared size is the UNPADDED payload; a single
    # pad byte follows odd-sized chunks but is not counted
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff_body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_webp_vp8l(payload: bytes):
    """Strictly parse a RIFF/WEBP/VP8L header. Returns dict(width,
    height, alpha, version, chunk_bytes, file_bytes). Raises ValueError
    on bad RIFF/WEBP/VP8L framing, a mis-sized RIFF length, a bad VP8L
    signature byte, or a reserved version."""
    import struct

    data = bytes(payload)
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP file")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    if riff_len + 8 != len(data):
        raise ValueError(f"RIFF length {riff_len} != file size - 8")
    if data[12:16] != b"VP8L":
        raise ValueError(f"unsupported WebP chunk {data[12:16]!r}")
    (chunk_len,) = struct.unpack_from("<I", data, 16)
    if 20 + chunk_len + (chunk_len % 2) > len(data):
        raise ValueError("VP8L chunk overruns file")
    hdr = _vp8l_unpack(data[20 : 20 + min(chunk_len, 5)])
    return {
        **hdr,
        "chunk_bytes": chunk_len,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# RLE8-compressed BMP (BI_RLE8) — the real run-length branch of the BMP
# spec: encoded mode (count, palette-index) pairs, absolute mode
# (0x00, n>=3, n indices, word-aligned pad), and the 0x00 0x00 /
# 0x00 0x01 end-of-line / end-of-bitmap escapes, over a bottom-up
# 8-bit paletted image. encode_bmp_rle8 produces a spec-faithful file
# (BITMAPINFOHEADER, biCompression=1, 256-entry BGRX palette);
# decode_bmp_rle8_pixels re-expands it strictly — runs past the row
# end, missing EOB, or palette overruns all raise ValueError.
# ---------------------------------------------------------------------------
def encode_bmp_rle8(indices, palette) -> bytes:
    """Encode an (h, w) uint8 palette-index array as a BI_RLE8 BMP with
    the given [(r, g, b), ...] palette (<= 256 entries)."""
    import numpy as np

    idx = np.asarray(indices, dtype=np.uint8)
    if idx.ndim != 2:
        raise ValueError("RLE8 indices must be 2-D")
    if not 0 < len(palette) <= 256:
        raise ValueError("palette must have 1..256 entries")
    h, w = idx.shape
    out = bytearray()
    for row in idx[::-1]:  # bottom-up
        j = 0
        while j < w:
            run = 1
            while (
                j + run < w and row[j + run] == row[j] and run < 255
            ):
                run += 1
            out += bytes((run, int(row[j])))
            j += run
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    body = bytes(out)
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((b, g, r, 0))
    pal += b"\x00" * (4 * (256 - len(palette)))
    offset = 14 + 40 + len(pal)
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (1).to_bytes(4, "little")  # BI_RLE8
        + len(body).to_bytes(4, "little")
        + bytes(8)
        + (256).to_bytes(4, "little")  # palette entries
        + bytes(4)
    )
    header = (
        b"BM"
        + (offset + len(body)).to_bytes(4, "little")
        + bytes(4)
        + offset.to_bytes(4, "little")
    )
    return header + dib + bytes(pal) + body


def decode_bmp_rle8_pixels(payload: bytes):
    """Strictly decode a BI_RLE8 BMP to an (h, w, 3) uint8 RGB array.
    Raises ValueError on bad magic/header, a non-RLE8 compression tag,
    runs or absolute packets overrunning a row, deltas (unsupported —
    they leave undefined pixels), truncation, or a missing
    end-of-bitmap escape."""
    import numpy as np

    data = bytes(payload)
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = int.from_bytes(data[10:14], "little")
    dib_size = int.from_bytes(data[14:18], "little")
    if dib_size < 40:
        raise ValueError("BMP header too small")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 1 or bpp != 8:
        raise ValueError(f"not an RLE8 BMP (bpp={bpp}, comp={comp})")
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError(f"bad RLE8 dims {w}x{h}")
    _check_decode_dims(w, h)
    pal_off = 14 + dib_size
    if pal_off + 4 * 256 > offset or offset > len(data):
        raise ValueError("RLE8 palette/offset out of bounds")
    pal = np.frombuffer(data[pal_off : pal_off + 1024], dtype=np.uint8)
    pal = pal.reshape(256, 4)[:, [2, 1, 0]]  # BGRX -> RGB
    idx = np.zeros((h, w), dtype=np.uint8)
    pos = offset
    row, col = 0, 0  # row 0 = bottom
    done = False
    while pos + 2 <= len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            if row >= h or col + n > w:
                raise ValueError("RLE8 run overruns row")
            idx[row, col : col + n] = v
            col += n
        elif v == 0:  # end of line
            row += 1
            col = 0
            if row > h:
                raise ValueError("RLE8 EOL past image height")
        elif v == 1:  # end of bitmap
            done = True
            break
        elif v == 2:
            raise ValueError("RLE8 delta escapes unsupported")
        else:  # absolute mode: v literal indices, word-aligned
            if row >= h or col + v > w:
                raise ValueError("RLE8 absolute packet overruns row")
            end = pos + v
            if end + (v & 1) > len(data):
                raise ValueError("RLE8 absolute packet truncated")
            idx[row, col : col + v] = np.frombuffer(
                data[pos:end], dtype=np.uint8
            )
            col += v
            pos = end + (v & 1)
    if not done:
        raise ValueError("RLE8 stream missing end-of-bitmap")
    return pal[idx[::-1]]  # bottom-up -> top-down, palette lookup


# ---------------------------------------------------------------------------
# ICO icon container — the multi-resolution icon directory every asset
# pipeline meets: a 6-byte ICONDIR, 16-byte ICONDIRENTRY records (with
# the 0-means-256 width/height byte rule), and per-entry payloads that
# are EITHER a complete embedded PNG (Vista+ style) or a raw DIB
# (BITMAPINFOHEADER with doubled height for the XOR+AND mask planes).
# encode_ico builds the container; parse_ico re-walks it strictly,
# cross-checking each entry's declared dimensions against the payload's
# own header (PNG IHDR / DIB header) so a lying directory raises.
# ---------------------------------------------------------------------------
def encode_ico(entries) -> bytes:
    """Build an ICO file. ``entries`` is a list of (width, height, bpp,
    fmt, body) with fmt 'png' (body = a complete PNG whose IHDR dims
    match) or 'dib' (body ignored — a deterministic uncompressed
    32-bpp DIB with AND mask is generated)."""
    import struct

    import numpy as np

    dir_bytes = bytearray(struct.pack("<HHH", 0, 1, len(entries)))
    bodies = []
    offset = 6 + 16 * len(entries)
    for w, h, bpp, fmt, body in entries:
        if w not in (16, 32, 64, 256) or h not in (16, 32, 64, 256):
            raise ValueError("unsupported ICO dimensions")
        if fmt == "dib":
            if bpp != 32:
                raise ValueError("generated DIB payloads are 32-bpp only")
            and_row = ((w + 31) // 32) * 4
            xor = (
                (
                    np.arange(w)[None, :, None] * 7
                    + np.arange(h)[:, None, None] * 13
                    + np.arange(4)[None, None, :]
                )
                % 256
            ).astype(np.uint8).tobytes()
            body = (
                struct.pack(
                    "<IiiHHIIiiII",
                    40, w, 2 * h, 1, bpp, 0,
                    w * h * 4 + and_row * h, 0, 0, 0, 0,
                )
                + xor
                + b"\x00" * (and_row * h)
            )
        elif fmt != "png":
            raise ValueError(f"unknown ICO entry format {fmt!r}")
        dir_bytes += struct.pack(
            "<BBBBHHII",
            w % 256, h % 256, 0, 0, 1, bpp, len(body), offset,
        )
        bodies.append(body)
        offset += len(body)
    return bytes(dir_bytes) + b"".join(bodies)


def parse_ico(payload: bytes):
    """Strictly walk an ICO container. Returns dict(n_icons, n_png,
    n_dib, sum_width, sum_height, max_bpp, image_bytes, file_bytes).
    Raises ValueError on a bad ICONDIR, an entry whose payload overruns
    the file, an unrecognized payload magic, or a payload whose own
    header contradicts the directory's dimensions."""
    import struct

    data = bytes(payload)
    if len(data) < 6:
        raise ValueError("truncated ICONDIR")
    reserved, ico_type, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or ico_type != 1:
        raise ValueError(f"bad ICONDIR header ({reserved}, {ico_type})")
    if len(data) < 6 + 16 * count:
        raise ValueError("ICONDIR entries overrun file")
    n_png = n_dib = sum_w = sum_h = max_bpp = image_bytes = 0
    for i in range(count):
        off = 6 + 16 * i
        wb, hb, _pal, res, _planes, bpp, size, img_off = struct.unpack(
            "<BBBBHHII", data[off : off + 16]
        )
        if res != 0:
            raise ValueError("nonzero ICONDIRENTRY reserved byte")
        w, h = wb or 256, hb or 256
        if img_off + size > len(data) or img_off < 6 + 16 * count:
            raise ValueError("ICO image payload out of bounds")
        body = data[img_off : img_off + size]
        if body[:8] == b"\x89PNG\r\n\x1a\n":
            if len(body) < 24:
                raise ValueError("embedded PNG too short for IHDR")
            pw = int.from_bytes(body[16:20], "big")
            ph = int.from_bytes(body[20:24], "big")
            if (pw, ph) != (w, h):
                raise ValueError(
                    f"PNG dims {pw}x{ph} contradict entry {w}x{h}"
                )
            n_png += 1
        elif len(body) >= 40 and int.from_bytes(body[:4], "little") == 40:
            bw = int.from_bytes(body[4:8], "little", signed=True)
            bh = int.from_bytes(body[8:12], "little", signed=True)
            if bw != w or bh != 2 * h:
                raise ValueError(
                    f"DIB dims {bw}x{bh} contradict entry {w}x{h}"
                )
            dib_bpp = int.from_bytes(body[14:16], "little")
            if dib_bpp != bpp:
                raise ValueError(
                    f"DIB bit depth {dib_bpp} contradicts entry {bpp}"
                )
            n_dib += 1
        else:
            raise ValueError("unrecognized ICO payload magic")
        sum_w += w
        sum_h += h
        max_bpp = max(max_bpp, bpp)
        image_bytes += size
    return {
        "n_icons": count,
        "n_png": n_png,
        "n_dib": n_dib,
        "sum_width": sum_w,
        "sum_height": sum_h,
        "max_bpp": max_bpp,
        "image_bytes": image_bytes,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# ID3v2.3 tag — the metadata block at the head of most MP3s. The
# mm_mp3_frames walker SKIPS it via the syncsafe total size; this codec
# PARSES it: 10-byte header ("ID3", version 3.0, syncsafe 28-bit size),
# then v2.3 frames (4-char id, 32-bit BIG-endian size — deliberately
# NOT syncsafe in v2.3, a classic implementation trap — 2 flag bytes,
# then an encoding byte + text for T*** frames), then zero padding.
# ---------------------------------------------------------------------------
def encode_id3v2_tag(frames, padding: int = 0) -> bytes:
    """Build an ID3v2.3 tag from [(frame_id, text), ...] using
    ISO-8859-1 text encoding (encoding byte 0x00)."""
    body = bytearray()
    for fid, text in frames:
        raw = b"\x00" + text.encode("latin-1")
        body += fid.encode("ascii") + len(raw).to_bytes(4, "big") + b"\x00\x00"
        body += raw
    body += b"\x00" * padding
    size = len(body)
    if size >= 1 << 28:
        raise ValueError("ID3v2 tag too large for syncsafe size")
    syncsafe = bytes(
        (size >> shift) & 0x7F for shift in (21, 14, 7, 0)
    )
    return b"ID3\x03\x00\x00" + syncsafe + bytes(body)


def parse_id3v2(payload: bytes):
    """Strictly parse an ID3v2.3 tag. Returns dict(n_frames, tag_bytes,
    frame_bytes, padding_bytes, title_len, artist_len, track_no).
    Raises ValueError on bad magic/version, a non-syncsafe size byte,
    a frame overrunning the tag, a malformed frame id, or nonzero
    bytes inside the padding run."""
    data = bytes(payload)
    if data[:3] != b"ID3":
        raise ValueError(f"bad ID3 magic {data[:3]!r}")
    if data[3:5] != b"\x03\x00":
        raise ValueError("only ID3v2.3 supported")
    if len(data) < 10:
        raise ValueError("truncated ID3 header")
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("non-syncsafe ID3 size byte")
    size = 0
    for b in data[6:10]:
        size = (size << 7) | b
    if 10 + size > len(data):
        raise ValueError("ID3 tag overruns payload")
    pos, end = 10, 10 + size
    n_frames = frame_bytes = 0
    texts: dict = {}
    while pos < end:
        if data[pos] == 0:
            pad = data[pos:end]
            if any(pad):
                raise ValueError("nonzero byte inside ID3 padding")
            break
        if pos + 10 > end:
            raise ValueError("truncated ID3 frame header")
        fid = data[pos : pos + 4]
        if not all(0x30 <= c <= 0x39 or 0x41 <= c <= 0x5A for c in fid):
            raise ValueError(f"malformed ID3 frame id {fid!r}")
        flen = int.from_bytes(data[pos + 4 : pos + 8], "big")
        if pos + 10 + flen > end:
            raise ValueError("ID3 frame overruns tag")
        raw = data[pos + 10 : pos + 10 + flen]
        if fid[:1] == b"T":
            if not raw or raw[0] != 0:
                raise ValueError("unsupported ID3 text encoding")
            texts[fid.decode("ascii")] = raw[1:].decode("latin-1")
        n_frames += 1
        frame_bytes += 10 + flen
        pos += 10 + flen
    padding_bytes = end - pos if pos < end else 0
    track_raw = texts.get("TRCK", "0")
    if not track_raw.isdigit():
        raise ValueError(f"non-numeric TRCK {track_raw!r}")
    return {
        "n_frames": n_frames,
        "tag_bytes": 10 + size,
        "frame_bytes": frame_bytes,
        "padding_bytes": padding_bytes,
        "title_len": len(texts.get("TIT2", "")),
        "artist_len": len(texts.get("TPE1", "")),
        "track_no": int(track_raw),
    }


# ---------------------------------------------------------------------------
# PNG ancillary metadata — the tEXt/pHYs/gAMA chunks image pipelines
# read without decoding pixels. inject_png_chunks splices extra chunks
# (with REAL CRC-32s) into an existing PNG right after IHDR;
# parse_png_metadata re-walks the whole chunk stream, VERIFYING every
# chunk CRC and the IHDR-first / IEND-last framing, and returns the
# metadata facts. A corrupted CRC raises — the walk is a real parse.
# ---------------------------------------------------------------------------
def png_chunk(ctype: bytes, body: bytes) -> bytes:
    """One PNG chunk with its real CRC-32 (over type + body)."""
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def inject_png_chunks(png: bytes, chunks) -> bytes:
    """Splice ``chunks`` ([(type4: bytes, body: bytes), ...]) into
    ``png`` immediately after IHDR."""
    if png[:8] != b"\x89PNG\r\n\x1a\n" or png[12:16] != b"IHDR":
        raise ValueError("not a PNG with leading IHDR")
    ihdr_len = int.from_bytes(png[8:12], "big")
    cut = 8 + 12 + ihdr_len
    extra = b"".join(png_chunk(t, b) for t, b in chunks)
    return png[:cut] + extra + png[cut:]


def parse_png_metadata(payload: bytes):
    """Strictly walk a PNG chunk stream. Returns dict(n_chunks, n_text,
    title_len, author_len, phys_ppu, gamma_e5, file_bytes). Raises
    ValueError on bad signature, a chunk overrunning the payload, ANY
    CRC mismatch, IHDR not first, or a missing IEND terminator."""
    import zlib

    data = bytes(payload)
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("bad PNG signature")
    pos = 8
    n_chunks = n_text = title_len = author_len = 0
    phys_ppu = gamma_e5 = 0
    first = True
    saw_iend = False
    while pos < len(data):
        if saw_iend:
            raise ValueError("PNG data after IEND")
        if pos + 8 > len(data):
            raise ValueError("truncated PNG chunk header")
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(data):
            raise ValueError("PNG chunk overruns payload")
        body = data[pos + 8 : end]
        crc = int.from_bytes(data[end : end + 4], "big")
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if first and ctype != b"IHDR":
            raise ValueError("PNG IHDR must be the first chunk")
        first = False
        n_chunks += 1
        if ctype == b"tEXt":
            if b"\x00" not in body:
                raise ValueError("tEXt chunk missing keyword separator")
            key, _, text = body.partition(b"\x00")
            n_text += 1
            if key == b"Title":
                title_len = len(text)
            elif key == b"Author":
                author_len = len(text)
        elif ctype == b"pHYs":
            if length != 9:
                raise ValueError("pHYs chunk must be 9 bytes")
            phys_ppu = int.from_bytes(body[0:4], "big")
            if int.from_bytes(body[4:8], "big") != phys_ppu:
                raise ValueError("non-square pHYs resolution unsupported")
        elif ctype == b"gAMA":
            if length != 4:
                raise ValueError("gAMA chunk must be 4 bytes")
            gamma_e5 = int.from_bytes(body, "big")
        elif ctype == b"IEND":
            saw_iend = True
        pos = end + 4
    if not saw_iend:
        raise ValueError("PNG stream missing IEND")
    return {
        "n_chunks": n_chunks,
        "n_text": n_text,
        "title_len": title_len,
        "author_len": author_len,
        "phys_ppu": phys_ppu,
        "gamma_e5": gamma_e5,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# JPEG APP1 / EXIF — the camera-metadata modality: a TIFF IFD embedded
# inside a JPEG APP1 segment behind the "Exif\\0\\0" header, in EITHER
# byte order. encode_jpeg_exif builds a minimal JPEG shell (SOI + APP1
# + EOI) around a spec-layout TIFF block (header, one IFD with
# ascending tag ids, inline SHORT values, out-of-line ASCII values
# with their NULs); parse_jpeg_exif walks the JPEG marker stream by
# length fields, locates the Exif APP1, and strictly parses the IFD —
# tag order, value offsets, and string termination all verified.
# ---------------------------------------------------------------------------
def encode_jpeg_exif(
    orientation: int, make: str, software: str, big_endian: bool = False
) -> bytes:
    """Minimal JPEG carrying an EXIF APP1: Make (0x010F), Orientation
    (0x0112), Software (0x0131)."""
    import struct

    if not 1 <= orientation <= 8:
        raise ValueError("EXIF orientation must be 1..8")
    e = ">" if big_endian else "<"
    mk = make.encode("ascii") + b"\x00"
    sw = software.encode("ascii") + b"\x00"
    # header(8) + count(2) + 3 entries(36) + next(4) = 50; data follows
    mk_off, sw_off = 50, 50 + len(mk)
    ifd = struct.pack(e + "H", 3)
    ifd += struct.pack(e + "HHII", 0x010F, 2, len(mk), mk_off)
    # SHORT value sits in the FIRST TWO BYTES of the 4-byte value slot
    ori = struct.pack(e + "H", orientation) + b"\x00\x00"
    ifd += struct.pack(e + "HHI", 0x0112, 3, 1) + ori
    ifd += struct.pack(e + "HHII", 0x0131, 2, len(sw), sw_off)
    ifd += struct.pack(e + "I", 0)
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "HI", 42, 8)
        + ifd
        + mk
        + sw
    )
    app1 = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", len(app1) + 2)
        + app1
        + b"\xff\xd9"
    )


def parse_jpeg_exif(payload: bytes):
    """Strictly parse the EXIF APP1 out of a JPEG marker stream.
    Returns dict(n_tags, orientation, make_len, software_len,
    exif_bytes, big_endian, file_bytes). Raises ValueError on a bad
    SOI, a marker segment overrunning the file, a missing Exif APP1,
    a bad TIFF header, non-ascending tag ids, an out-of-bounds value
    offset, or an unterminated ASCII value."""
    data = bytes(payload)
    if data[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG SOI")
    pos, exif = 2, None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = data[pos + 1]
        if marker == 0xD9:
            break
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if seg_len < 2 or pos + 2 + seg_len > len(data):
            raise ValueError("JPEG segment overruns file")
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            exif = data[pos + 10 : pos + 2 + seg_len]
        pos += 2 + seg_len
    if exif is None:
        raise ValueError("no Exif APP1 segment")
    if len(exif) < 14:
        raise ValueError("EXIF block too short")
    if exif[:2] == b"II":
        order = "little"
    elif exif[:2] == b"MM":
        order = "big"
    else:
        raise ValueError(f"bad TIFF byte order {exif[:2]!r}")

    def u(off: int, n: int) -> int:
        if off + n > len(exif):
            raise ValueError("TIFF read out of bounds")
        return int.from_bytes(exif[off : off + n], order)

    if u(2, 2) != 42:
        raise ValueError("bad TIFF magic")
    ifd = u(4, 4)
    n_tags = u(ifd, 2)
    orientation = make_len = software_len = 0
    prev_tag = -1
    for i in range(n_tags):
        at = ifd + 2 + 12 * i
        tag, typ, cnt = u(at, 2), u(at + 2, 2), u(at + 4, 4)
        if tag <= prev_tag:
            raise ValueError("TIFF tags must be ascending")
        prev_tag = tag
        if typ == 3:  # SHORT, inline
            val = u(at + 8, 2)
            if tag == 0x0112:
                if not 1 <= val <= 8:
                    raise ValueError(f"bad orientation {val}")
                orientation = val
        elif typ == 2:  # ASCII, out of line
            off = u(at + 8, 4)
            if off + cnt > len(exif):
                raise ValueError("ASCII value overruns EXIF block")
            raw = exif[off : off + cnt]
            if not raw.endswith(b"\x00"):
                raise ValueError("unterminated ASCII EXIF value")
            if tag == 0x010F:
                make_len = cnt - 1
            elif tag == 0x0131:
                software_len = cnt - 1
    return {
        "n_tags": n_tags,
        "orientation": orientation,
        "make_len": make_len,
        "software_len": software_len,
        "exif_bytes": len(exif) + 6,
        "big_endian": 1 if order == "big" else 0,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# AIFF — the BIG-endian sibling of RIFF/WAV (IFF FORM container). The
# COMM chunk stores the sample rate as an 80-bit IEEE 754 EXTENDED
# float (1 sign + 15 exponent + 64 explicit-integer-bit mantissa) — a
# format struct cannot unpack, so parsing it is a real codec exercise.
# encode_aiff builds FORM/AIFF + COMM + SSND; parse_aiff_comm re-walks
# the chunk stream (big-endian sizes, odd-size pad bytes) and decodes
# the extended float exactly for the integer rates audio uses.
# ---------------------------------------------------------------------------
def _f80_encode(value: int) -> bytes:
    """80-bit extended float of a positive integer (exact for < 2^63)."""
    if not 1 <= value < (1 << 63):
        raise ValueError("f80 encoder handles positive integers < 2^63")
    e = value.bit_length() - 1
    mant = value << (63 - e)  # explicit leading 1 in bit 63
    return (16383 + e).to_bytes(2, "big") + mant.to_bytes(8, "big")


def _f80_decode(raw: bytes) -> int:
    """Decode an 80-bit extended float known to hold a positive
    integer; raises on NaN/inf/negative/fractional values."""
    if len(raw) != 10:
        raise ValueError("extended float must be 10 bytes")
    se = int.from_bytes(raw[:2], "big")
    mant = int.from_bytes(raw[2:], "big")
    if se & 0x8000:
        raise ValueError("negative AIFF sample rate")
    exp = se - 16383
    if se == 0x7FFF:
        raise ValueError("NaN/inf AIFF sample rate")
    if not 0 <= exp <= 62:
        raise ValueError(f"AIFF sample rate exponent {exp} out of range")
    shift = 63 - exp
    if mant & ((1 << shift) - 1):
        raise ValueError("non-integer AIFF sample rate")
    return mant >> shift


def encode_aiff(
    sample_rate: int, channels: int, bits: int, n_frames: int
) -> bytes:
    """FORM/AIFF with a COMM chunk and a deterministic SSND chunk."""
    import struct

    comm = (
        struct.pack(">hIh", channels, n_frames, bits)
        + _f80_encode(sample_rate)
    )
    ssnd_body = struct.pack(">II", 0, 0) + bytes(
        (i * 31) % 256 for i in range(n_frames * channels * (bits // 8))
    )
    chunks = b""
    for cid, body in ((b"COMM", comm), (b"SSND", ssnd_body)):
        chunks += cid + struct.pack(">I", len(body)) + body
        if len(body) % 2:
            chunks += b"\x00"  # IFF pad byte
    return b"FORM" + struct.pack(">I", 4 + len(chunks)) + b"AIFF" + chunks


def parse_aiff_comm(payload: bytes):
    """Strictly walk an AIFF FORM. Returns dict(sample_rate, channels,
    bits, n_frames, duration_us, n_chunks, ssnd_bytes, file_bytes).
    Raises ValueError on bad magic, a FORM size that disagrees with the
    payload, a chunk overrun, a missing COMM, or a malformed 80-bit
    sample rate."""
    data = bytes(payload)
    if data[:4] != b"FORM":
        raise ValueError(f"bad IFF magic {data[:4]!r}")
    if len(data) < 12 or data[8:12] != b"AIFF":
        raise ValueError("not an AIFF FORM")
    form_len = int.from_bytes(data[4:8], "big")
    if 8 + form_len != len(data):
        raise ValueError("FORM size disagrees with payload")
    pos = 12
    comm = None
    n_chunks = ssnd_bytes = 0
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated AIFF chunk header")
        cid = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "big")
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("AIFF chunk overruns payload")
        n_chunks += 1
        if cid == b"COMM":
            if clen != 18:
                raise ValueError("COMM chunk must be 18 bytes")
            comm = body
        elif cid == b"SSND":
            ssnd_bytes = clen
        pos += 8 + clen + (clen % 2)  # odd chunks carry a pad byte
    if comm is None:
        raise ValueError("AIFF missing COMM chunk")
    channels = int.from_bytes(comm[0:2], "big", signed=True)
    n_frames = int.from_bytes(comm[2:6], "big")
    bits = int.from_bytes(comm[6:8], "big", signed=True)
    rate = _f80_decode(comm[8:18])
    if channels < 1 or bits < 1:
        raise ValueError("bad AIFF channels/bits")
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_us": n_frames * 1_000_000 // rate,
        "n_chunks": n_chunks,
        "ssnd_bytes": ssnd_bytes,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# EBML / Matroska (RFC 8794 + the public Matroska element registry):
# every element is (VINT id, VINT size, payload), where a VINT's length
# is announced by its own leading zero bits — one bit of structure per
# byte of width, the container equivalent of a UTF-8 walk. encode_mkv
# writes an EBML header (DocType "matroska") and a Segment holding an
# Info (TimestampScale) plus Cluster elements of Timestamp +
# SimpleBlock children; parse_mkv_ebml re-walks it with a real VINT
# reader, recursing into master elements and validating that every
# declared size consumes exactly. Pairs with mm_mp4_boxes (length-
# prefixed boxes) and mm_ogg_pages (lacing runs) as the third framing
# discipline a media pipeline meets in the wild.
# ---------------------------------------------------------------------------
def _ebml_size(n: int) -> bytes:
    """Encode ``n`` as an EBML size VINT of minimal width (marker bit
    in the first byte; all-ones 'unknown size' is never produced)."""
    if n < 0:
        raise ValueError("negative EBML size")
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            bits = n | (1 << (7 * length))
            return bits.to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _ebml_el(eid: bytes, payload: bytes) -> bytes:
    """One EBML element: raw id bytes (marker embedded, per the
    Matroska registry) + size VINT + payload."""
    return eid + _ebml_size(len(payload)) + payload


def encode_mkv(timescale: int, clusters) -> bytes:
    """Minimal-but-real Matroska: EBML header (EBMLVersion=1, DocType
    "matroska"), then a Segment with Info/TimestampScale and one
    Cluster per (cluster_ts, [frame_len, ...]) entry; block j of a
    cluster is a SimpleBlock (track 1, relative timestamp 40*j,
    keyframe flag) filled with byte (cluster_ts + j) % 251."""
    if not (0 < timescale < (1 << 24)):
        raise ValueError("timescale must fit 3 bytes")
    header = _ebml_el(
        b"\x1a\x45\xdf\xa3",
        _ebml_el(b"\x42\x86", b"\x01")
        + _ebml_el(b"\x42\x82", b"matroska"),
    )
    info = _ebml_el(
        b"\x15\x49\xa9\x66",
        _ebml_el(b"\x2a\xd7\xb1", timescale.to_bytes(3, "big")),
    )
    cl_payloads = []
    for cluster_ts, frame_lens in clusters:
        if not (0 <= cluster_ts < (1 << 16)):
            raise ValueError("cluster timestamp must fit 2 bytes")
        body = _ebml_el(b"\xe7", cluster_ts.to_bytes(2, "big"))
        for j, flen in enumerate(frame_lens):
            if flen < 0:
                raise ValueError("negative frame length")
            block = (
                b"\x81"  # track number 1 as a VINT
                + (40 * j).to_bytes(2, "big")  # relative timestamp
                + b"\x80"  # flags: keyframe
                + bytes([(cluster_ts + j) % 251]) * flen
            )
            body += _ebml_el(b"\xa3", block)
        cl_payloads.append(_ebml_el(b"\x1f\x43\xb6\x75", body))
    segment = _ebml_el(b"\x18\x53\x80\x67", info + b"".join(cl_payloads))
    return header + segment


_EBML_MASTERS = {0x1A45DFA3, 0x18538067, 0x1549A966, 0x1F43B675}
_EBML_KNOWN = _EBML_MASTERS | {0x4286, 0x4282, 0x2AD7B1, 0xE7, 0xA3}


def _ebml_read_vint(data: bytes, pos: int, keep_marker: bool):
    """Read one VINT at ``pos``; returns (value, width). IDs keep the
    marker bit (registry convention), sizes strip it."""
    if pos >= len(data):
        raise ValueError("truncated EBML VINT")
    first = data[pos]
    if first == 0:
        raise ValueError("EBML VINT wider than 8 bytes")
    width = 9 - first.bit_length()
    if pos + width > len(data):
        raise ValueError("truncated EBML VINT body")
    value = int.from_bytes(data[pos : pos + width], "big")
    if not keep_marker:
        value -= 1 << (7 * width)
    return value, width


def parse_mkv_ebml(payload: bytes):
    """Strictly walk an EBML/Matroska stream. Returns dict(n_elements,
    n_clusters, n_blocks, frame_bytes, file_bytes, timestamp_scale,
    last_cluster_ts). Raises ValueError on an unknown element id, a
    size overrunning its parent, a non-"matroska" DocType, a block on
    a track other than 1, or trailing garbage."""
    data = bytes(payload)
    stats = {
        "n_elements": 0,
        "n_clusters": 0,
        "n_blocks": 0,
        "frame_bytes": 0,
        "timestamp_scale": 0,
        "last_cluster_ts": 0,
    }

    def walk(start: int, end: int) -> None:
        pos = start
        while pos < end:
            eid, w = _ebml_read_vint(data, pos, keep_marker=True)
            pos += w
            size, w = _ebml_read_vint(data, pos, keep_marker=False)
            pos += w
            if pos + size > end:
                raise ValueError(f"EBML element 0x{eid:x} overruns parent")
            if eid not in _EBML_KNOWN:
                raise ValueError(f"unknown EBML id 0x{eid:x}")
            stats["n_elements"] += 1
            body = data[pos : pos + size]
            if eid in _EBML_MASTERS:
                if eid == 0x1F43B675:
                    stats["n_clusters"] += 1
                walk(pos, pos + size)
            elif eid == 0x4282:
                if body != b"matroska":
                    raise ValueError(f"unexpected DocType {body!r}")
            elif eid == 0x2AD7B1:
                stats["timestamp_scale"] = int.from_bytes(body, "big")
            elif eid == 0xE7:
                stats["last_cluster_ts"] = int.from_bytes(body, "big")
            elif eid == 0xA3:
                track, tw = _ebml_read_vint(body, 0, keep_marker=False)
                if track != 1:
                    raise ValueError(f"unexpected track {track}")
                if len(body) < tw + 3:
                    raise ValueError("truncated SimpleBlock header")
                stats["n_blocks"] += 1
                stats["frame_bytes"] += len(body) - tw - 3
            pos += size

    walk(0, len(data))
    stats["file_bytes"] = len(data)
    return stats


# ---------------------------------------------------------------------------
# QOI ("Quite OK Image", qoiformat.org — public single-page spec): the
# byte-level image CODEC that complements the container walkers above:
# where MP4/EBML/Ogg test framing disciplines, QOI tests a stateful
# pixel codec — a running 64-entry color index (hash r*3+g*5+b*7+a*11
# mod 64), delta ops against the previous pixel, and run-length ops,
# all in one flat pixel stream with no row structure. encode_qoi is a
# real spec-complete encoder (op priority run > index > diff > luma >
# rgb/rgba, runs capped at 62 because 63/64 collide with the RGB/RGBA
# tags); parse_qoi is a strict decoder that re-derives the pixels and
# fails loudly on bad magic, bad tags, overruns, or a wrong end marker.
# ---------------------------------------------------------------------------


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(width: int, height: int, pixels) -> bytes:
    """Spec-complete QOI encode of an RGB pixel iterable (r, g, b
    tuples, row-major, alpha fixed 255 / channels=3)."""
    out = bytearray(b"qoif")
    out += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    out += bytes((3, 0))  # channels=3, colorspace=sRGB+linear-alpha
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    run = 0
    for r, g, b in pixels:
        px = (r, g, b, 255)
        if px == prev:
            run += 1
            if run == 62:  # 63/64 would collide with the RGB/RGBA tags
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        h = _qoi_hash(*px)
        if index[h] == px:
            out.append(h)  # QOI_OP_INDEX (00xxxxxx)
        else:
            index[h] = px
            dr = (r - prev[0] + 128) % 256 - 128
            dg = (g - prev[1] + 128) % 256 - 128
            db = (b - prev[2] + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                # QOI_OP_DIFF (01xxxxxx), biased +2
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                # QOI_OP_LUMA (10xxxxxx + 1 byte), biases +32/+8
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))  # QOI_OP_RGB
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += b"\x00" * 7 + b"\x01"  # end marker
    return bytes(out)


def parse_qoi(data: bytes) -> dict:
    """Strict QOI decode: walks every chunk, re-derives the pixel
    stream, and returns chunk-census stats plus a pixel checksum. Any
    malformed byte raises — same strictness contract as the other
    walkers (parse_mkv_ebml, parse_ogg_pages)."""
    if len(data) < 22 or data[:4] != b"qoif":
        raise ValueError("bad QOI magic")
    width = int.from_bytes(data[4:8], "big")
    height = int.from_bytes(data[8:12], "big")
    channels, colorspace = data[12], data[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(f"bad QOI header ({channels=}, {colorspace=})")
    if data[-8:] != b"\x00" * 7 + b"\x01":
        raise ValueError("bad QOI end marker")
    n_pixels = width * height
    index = [(0, 0, 0, 0)] * 64
    px = (0, 0, 0, 255)
    decoded = 0
    checksum = 0  # sum of r+g+b over the decoded stream
    stats = {
        "n_rgb": 0,
        "n_rgba": 0,
        "n_index": 0,
        "n_diff": 0,
        "n_luma": 0,
        "n_run": 0,
    }
    pos = 14
    end = len(data) - 8
    while decoded < n_pixels:
        if pos >= end:
            raise ValueError("QOI chunk stream truncated")
        tag = data[pos]
        if tag == 0xFE:  # RGB
            px = (data[pos + 1], data[pos + 2], data[pos + 3], px[3])
            pos += 4
            stats["n_rgb"] += 1
        elif tag == 0xFF:  # RGBA
            px = tuple(data[pos + 1 : pos + 5])
            pos += 5
            stats["n_rgba"] += 1
        elif tag >> 6 == 0b00:  # INDEX
            px = index[tag]
            pos += 1
            stats["n_index"] += 1
        elif tag >> 6 == 0b01:  # DIFF
            px = (
                (px[0] + ((tag >> 4) & 3) - 2) % 256,
                (px[1] + ((tag >> 2) & 3) - 2) % 256,
                (px[2] + (tag & 3) - 2) % 256,
                px[3],
            )
            pos += 1
            stats["n_diff"] += 1
        elif tag >> 6 == 0b10:  # LUMA
            dg = (tag & 0x3F) - 32
            second = data[pos + 1]
            px = (
                (px[0] + dg + (second >> 4) - 8) % 256,
                (px[1] + dg) % 256,
                (px[2] + dg + (second & 0x0F) - 8) % 256,
                px[3],
            )
            pos += 2
            stats["n_luma"] += 1
        else:  # RUN (11xxxxxx), bias -1; 62 max by construction
            run = (tag & 0x3F) + 1
            if run > 62:
                raise ValueError(f"QOI run tag collides with RGB/RGBA: {run}")
            if decoded + run > n_pixels:
                raise ValueError("QOI run overruns the pixel count")
            checksum += (run - 1) * (px[0] + px[1] + px[2])
            decoded += run - 1
            pos += 1
            stats["n_run"] += 1
            # the tag ALSO repeats the current pixel once more below
        index[_qoi_hash(*px)] = px
        checksum += px[0] + px[1] + px[2]
        decoded += 1
    if pos != end:
        raise ValueError("trailing bytes after the pixel stream")
    return {
        "width": width,
        "height": height,
        "n_pixels": n_pixels,
        "n_chunks": sum(stats.values()),
        "pixel_checksum": checksum,
        "file_bytes": len(data),
        **stats,
    }


# ---------------------------------------------------------------------------
# gzip (RFC 1952): the MULTI-MEMBER stream framing discipline — a
# .gz file is one or more complete members back-to-back (the rule that
# makes `cat a.gz b.gz | gunzip` legal, and the on-disk shape of
# block-gzipped corpus shards). encode_gzip_members writes real
# members: 10-byte header (magic 1f 8b, CM=8 deflate, FLG, MTIME, XFL,
# OS), optional zero-terminated FNAME, a STORED-mode deflate stream
# (BTYPE=00 blocks — hand-assembled so the byte layout is closed-form:
# 1 header byte + LEN + NLEN + raw payload per block), and the CRC32 +
# ISIZE trailer. parse_gzip_members walks members strictly — real
# zlib raw-deflate inflation via decompressobj(-15) with unused_data
# chaining, CRC32 and ISIZE VERIFIED per member, reserved FLG bits
# rejected — so Python's own gzip module can serve as an independent
# decoder in tests.
# ---------------------------------------------------------------------------


def _deflate_stored(payload: bytes) -> bytes:
    """Raw DEFLATE stream of STORED (BTYPE=00) blocks only."""
    out = bytearray()
    pos = 0
    while True:
        chunk = payload[pos : pos + 65535]
        pos += len(chunk)
        final = 1 if pos >= len(payload) else 0
        out.append(final)  # 3 header bits (BFINAL + BTYPE=00) + pad
        out += len(chunk).to_bytes(2, "little")
        out += (len(chunk) ^ 0xFFFF).to_bytes(2, "little")
        out += chunk
        if final:
            return bytes(out)


def encode_gzip_members(members) -> bytes:
    """Concatenated RFC 1952 members; each item is (payload_bytes,
    fname_or_None, mtime)."""
    import zlib

    out = bytearray()
    for payload, fname, mtime in members:
        flg = 0x08 if fname is not None else 0x00
        out += bytes((0x1F, 0x8B, 0x08, flg))
        # RFC 1952: MTIME is seconds mod 2^32 (replica-shifted doc ids
        # exceed 4 bytes at the x100 probe without the mask)
        out += (int(mtime) % (1 << 32)).to_bytes(4, "little")
        out += bytes((0x00, 0xFF))  # XFL, OS=unknown
        if fname is not None:
            out += fname.encode("latin-1") + b"\x00"
        out += _deflate_stored(payload)
        out += (zlib.crc32(payload) & 0xFFFFFFFF).to_bytes(4, "little")
        out += (len(payload) % (1 << 32)).to_bytes(4, "little")
    return bytes(out)


def parse_gzip_members(data: bytes) -> dict:
    """Strict multi-member gzip walk (see section comment)."""
    import zlib

    pos = 0
    stats = {
        "n_members": 0,
        "n_named": 0,
        "payload_bytes": 0,
        "name_bytes": 0,
    }
    while pos < len(data):
        if len(data) - pos < 18:  # header + empty deflate + trailer
            raise ValueError("truncated gzip member")
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad gzip magic")
        if data[pos + 2] != 0x08:
            raise ValueError(f"unknown compression method {data[pos + 2]}")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError(f"reserved FLG bits set: {flg:#x}")
        hdr_end = pos + 10
        if flg & 0x04:  # FEXTRA (not emitted by the encoder, but legal)
            xlen = int.from_bytes(data[hdr_end : hdr_end + 2], "little")
            hdr_end += 2 + xlen
        if flg & 0x08:  # FNAME
            z = data.index(b"\x00", hdr_end)
            stats["n_named"] += 1
            stats["name_bytes"] += z - hdr_end
            hdr_end = z + 1
        if flg & 0x10:  # FCOMMENT
            hdr_end = data.index(b"\x00", hdr_end) + 1
        if flg & 0x02:  # FHCRC
            hdr_end += 2
        d = zlib.decompressobj(-15)
        payload = d.decompress(data[hdr_end:])
        if not d.eof:
            raise ValueError("truncated deflate stream")
        rest = d.unused_data
        if len(rest) < 8:
            raise ValueError("missing gzip trailer")
        crc = int.from_bytes(rest[:4], "little")
        isize = int.from_bytes(rest[4:8], "little")
        if crc != (zlib.crc32(payload) & 0xFFFFFFFF):
            raise ValueError("gzip CRC32 mismatch")
        if isize != len(payload) % (1 << 32):
            raise ValueError("gzip ISIZE mismatch")
        stats["n_members"] += 1
        stats["payload_bytes"] += len(payload)
        pos = len(data) - len(rest) + 8
    stats["file_bytes"] = len(data)
    return stats


# ---------------------------------------------------------------------------
# MessagePack (msgpack.org spec): the TAG-DISPATCH serialization
# discipline — every value leads with one format byte that selects the
# decoder (fix ranges embedded in the tag, or explicit width tags) —
# complementing the varint trilogy (Avro zigzag, EBML width-bit VINTs,
# protobuf LEB128) where sizes are encoded arithmetically instead.
# encode_msgpack covers the integer promotion ladder exactly at the
# spec boundaries (positive fixint ≤ 0x7f, uint8/16/32/64; negative
# fixint ≥ -32, int8/16), fixstr/str8, bin8, fixarray/array16,
# fixmap, nil, bool. parse_msgpack is a strict decoder: unknown tags,
# truncation, and trailing bytes raise; it returns a type census plus
# a deep checksum so fixtures can be verified relationally.
# ---------------------------------------------------------------------------


def encode_msgpack(obj) -> bytes:
    out = bytearray()

    def enc(v) -> None:
        if v is None:
            out.append(0xC0)
        elif isinstance(v, bool):
            out.append(0xC3 if v else 0xC2)
        elif isinstance(v, int):
            if 0 <= v <= 0x7F:
                out.append(v)
            elif -32 <= v < 0:
                out.append(v & 0xFF)
            elif 0 <= v <= 0xFF:
                out.extend(bytes((0xCC, v)))
            elif 0 <= v <= 0xFFFF:
                out.append(0xCD)
                out.extend(v.to_bytes(2, "big"))
            elif 0 <= v <= 0xFFFFFFFF:
                out.append(0xCE)
                out.extend(v.to_bytes(4, "big"))
            elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
                out.append(0xCF)
                out.extend(v.to_bytes(8, "big"))
            elif -128 <= v < 0:
                out.append(0xD0)
                out.extend(v.to_bytes(1, "big", signed=True))
            elif -32768 <= v < 0:
                out.append(0xD1)
                out.extend(v.to_bytes(2, "big", signed=True))
            else:
                raise ValueError(f"int out of implemented range: {v}")
        elif isinstance(v, str):
            b = v.encode("utf-8")
            if len(b) <= 31:
                out.append(0xA0 | len(b))
            elif len(b) <= 0xFF:
                out.extend(bytes((0xD9, len(b))))
            else:
                raise ValueError("str too long for this encoder")
            out.extend(b)
        elif isinstance(v, bytes):
            if len(v) > 0xFF:
                raise ValueError("bin too long for this encoder")
            out.extend(bytes((0xC4, len(v))))
            out.extend(v)
        elif isinstance(v, list):
            if len(v) <= 15:
                out.append(0x90 | len(v))
            elif len(v) <= 0xFFFF:
                out.append(0xDC)
                out.extend(len(v).to_bytes(2, "big"))
            else:
                raise ValueError("array too long for this encoder")
            for item in v:
                enc(item)
        elif isinstance(v, dict):
            if len(v) > 15:
                raise ValueError("map too long for this encoder")
            out.append(0x80 | len(v))
            for k, item in v.items():
                enc(k)
                enc(item)
        else:
            raise TypeError(f"unsupported type {type(v)}")

    enc(obj)
    return bytes(out)


def parse_msgpack(data: bytes) -> dict:
    """Strict decode; returns the type census + deep checksum (see
    section comment). ``sum_ints`` is the signed sum of every integer,
    ``str_bytes``/``bin_bytes`` the total payload lengths."""
    stats = {
        "n_ints": 0,
        "sum_ints": 0,
        "n_strs": 0,
        "str_bytes": 0,
        "n_bins": 0,
        "bin_bytes": 0,
        "n_arrays": 0,
        "n_maps": 0,
        "n_nil": 0,
        "n_bool": 0,
    }

    def need(pos: int, n: int) -> None:
        if pos + n > len(data):
            raise ValueError("msgpack payload truncated")

    def dec(pos: int):
        need(pos, 1)
        tag = data[pos]
        if tag <= 0x7F:  # positive fixint
            stats["n_ints"] += 1
            stats["sum_ints"] += tag
            return tag, pos + 1
        if tag >= 0xE0:  # negative fixint
            v = tag - 256
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 1
        if 0xA0 <= tag <= 0xBF:  # fixstr
            n = tag & 0x1F
            need(pos + 1, n)
            stats["n_strs"] += 1
            stats["str_bytes"] += n
            return data[pos + 1 : pos + 1 + n].decode("utf-8"), pos + 1 + n
        if 0x90 <= tag <= 0x9F:  # fixarray
            n = tag & 0x0F
            stats["n_arrays"] += 1
            items, p = [], pos + 1
            for _ in range(n):
                v, p = dec(p)
                items.append(v)
            return items, p
        if 0x80 <= tag <= 0x8F:  # fixmap
            n = tag & 0x0F
            stats["n_maps"] += 1
            d, p = {}, pos + 1
            for _ in range(n):
                k, p = dec(p)
                v, p = dec(p)
                d[k] = v
            return d, p
        if tag == 0xC0:
            stats["n_nil"] += 1
            return None, pos + 1
        if tag in (0xC2, 0xC3):
            stats["n_bool"] += 1
            return tag == 0xC3, pos + 1
        if tag == 0xC4:  # bin8
            need(pos, 2)
            n = data[pos + 1]
            need(pos + 2, n)
            stats["n_bins"] += 1
            stats["bin_bytes"] += n
            return data[pos + 2 : pos + 2 + n], pos + 2 + n
        if tag == 0xC9 or tag in (0xC1,):
            raise ValueError(f"reserved/unsupported msgpack tag {tag:#x}")
        if tag == 0xCC:
            need(pos, 2)
            v = data[pos + 1]
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 2
        if tag == 0xCD:
            need(pos, 3)
            v = int.from_bytes(data[pos + 1 : pos + 3], "big")
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 3
        if tag == 0xCE:
            need(pos, 5)
            v = int.from_bytes(data[pos + 1 : pos + 5], "big")
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 5
        if tag == 0xCF:
            need(pos, 9)
            v = int.from_bytes(data[pos + 1 : pos + 9], "big")
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 9
        if tag == 0xD0:
            need(pos, 2)
            v = int.from_bytes(data[pos + 1 : pos + 2], "big", signed=True)
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 2
        if tag == 0xD1:
            need(pos, 3)
            v = int.from_bytes(data[pos + 1 : pos + 3], "big", signed=True)
            stats["n_ints"] += 1
            stats["sum_ints"] += v
            return v, pos + 3
        if tag == 0xD9:  # str8
            need(pos, 2)
            n = data[pos + 1]
            need(pos + 2, n)
            stats["n_strs"] += 1
            stats["str_bytes"] += n
            return data[pos + 2 : pos + 2 + n].decode("utf-8"), pos + 2 + n
        if tag == 0xDC:  # array16
            need(pos, 3)
            n = int.from_bytes(data[pos + 1 : pos + 3], "big")
            stats["n_arrays"] += 1
            items, p = [], pos + 3
            for _ in range(n):
                v, p = dec(p)
                items.append(v)
            return items, p
        raise ValueError(f"unimplemented msgpack tag {tag:#x}")

    value, end = dec(0)
    if end != len(data):
        raise ValueError("trailing bytes after msgpack value")
    stats["file_bytes"] = len(data)
    stats["value"] = value
    return stats


# ---------------------------------------------------------------------------
# ORC file tail (https://orc.apache.org/specification/ORCv1/): the
# READ-BACKWARDS length-prefixed footer discipline — the one container
# shape the walker family didn't cover yet (tar/zip walk forward, EBML
# announces widths inline, RIFF/mp4 carry sizes up front). An ORC
# reader starts at the LAST byte (the postscript length), walks back
# through the postscript (an uncompressed protobuf that says how long
# the footer is), then back again through the footer (a protobuf
# holding stripe directory + row counts) — three hops of trust, each
# length-prefixed by the previous one. The codec below writes a
# faithful subset (compression NONE; postscript fields footerLength/
# compression/compressionBlockSize/writerVersion/magic, footer fields
# headerLength/contentLength/repeated StripeInformation/numberOfRows/
# rowIndexStride, both strict LEB128 protobuf) and the parser verifies
# every cross-reference: both magics, stripe offsets monotonic from
# byte 3, contentLength == Σ stripe sizes, numberOfRows == Σ stripe
# rows, and total reconstructed size == len(file).
# ---------------------------------------------------------------------------
def _orc_varint(n: int) -> bytes:
    """Unsigned LEB128 (protobuf wire varint)."""
    if n < 0:
        raise ValueError("orc varint is unsigned here")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _orc_read_varint(buf: bytes, pos: int):
    val, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated orc varint")
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return val, pos
        if shift > 63:
            raise ValueError("orc varint too long")


_ORC_MAGIC_TAG = 8000 << 3 | 2  # postscript `magic` field, len-delim


def encode_orc_tail(stripes, writer_version: int) -> bytes:
    """stripes: iterable of (index_len, data_len, sfooter_len, rows).
    Returns the whole fake-ORC file: magic + stripe payload filler +
    footer + postscript + 1-byte postscript length."""
    out = bytearray(b"ORC")
    stripe_meta = []
    for index_len, data_len, sfooter_len, rows in stripes:
        offset = len(out)
        total = index_len + data_len + sfooter_len
        out += bytes((offset + i) % 251 for i in range(total))
        stripe_meta.append((offset, index_len, data_len, sfooter_len, rows))
    content_len = len(out) - 3
    footer = bytearray()
    footer += _orc_varint(1 << 3 | 0) + _orc_varint(3)  # headerLength
    footer += _orc_varint(2 << 3 | 0) + _orc_varint(content_len)
    total_rows = 0
    for offset, index_len, data_len, sfooter_len, rows in stripe_meta:
        body = (
            _orc_varint(1 << 3 | 0) + _orc_varint(offset)
            + _orc_varint(2 << 3 | 0) + _orc_varint(index_len)
            + _orc_varint(3 << 3 | 0) + _orc_varint(data_len)
            + _orc_varint(4 << 3 | 0) + _orc_varint(sfooter_len)
            + _orc_varint(5 << 3 | 0) + _orc_varint(rows)
        )
        footer += _orc_varint(3 << 3 | 2) + _orc_varint(len(body)) + body
        total_rows += rows
    footer += _orc_varint(6 << 3 | 0) + _orc_varint(total_rows)
    footer += _orc_varint(7 << 3 | 0) + _orc_varint(10_000)
    ps = bytearray()
    ps += _orc_varint(1 << 3 | 0) + _orc_varint(len(footer))
    ps += _orc_varint(2 << 3 | 0) + _orc_varint(0)  # compression NONE
    ps += _orc_varint(3 << 3 | 0) + _orc_varint(8192)
    ps += _orc_varint(6 << 3 | 0) + _orc_varint(writer_version)
    ps += _orc_varint(_ORC_MAGIC_TAG) + _orc_varint(3) + b"ORC"
    if len(ps) > 255:
        raise ValueError("postscript over 255 bytes")
    out += footer + ps + bytes([len(ps)])
    return bytes(out)


def _orc_parse_msg(buf: bytes, fields_varint, fields_lendelim):
    """Strict flat protobuf decode: known fields only, no trailing
    bytes; repeated fields accumulate into lists."""
    out: dict = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _orc_read_varint(buf, pos)
        fnum, wt = tag >> 3, tag & 7
        if fnum in fields_varint:
            if wt != 0:
                raise ValueError(f"orc field {fnum}: expected varint")
            v, pos = _orc_read_varint(buf, pos)
            out.setdefault(fnum, []).append(v)
        elif fnum in fields_lendelim:
            if wt != 2:
                raise ValueError(f"orc field {fnum}: expected len-delim")
            ln, pos = _orc_read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("orc len-delim field overruns")
            out.setdefault(fnum, []).append(buf[pos : pos + ln])
            pos += ln
        else:
            raise ValueError(f"orc unknown field {fnum}")
    return out


def parse_orc_tail(data: bytes) -> dict:
    """Walk the tail backwards exactly as an ORC reader does; raises
    ValueError on any malformation or cross-reference mismatch."""
    if len(data) < 5 or data[:3] != b"ORC":
        raise ValueError("missing ORC header magic")
    ps_len = data[-1]
    if 1 + ps_len + 3 > len(data):
        raise ValueError("postscript overruns file")
    ps = _orc_parse_msg(
        data[len(data) - 1 - ps_len : len(data) - 1],
        fields_varint={1, 2, 3, 6},
        fields_lendelim={8000},
    )
    for req in (1, 2, 3, 6, 8000):
        if req not in ps:
            raise ValueError(f"postscript missing field {req}")
    if ps[8000][0] != b"ORC":
        raise ValueError("postscript magic mismatch")
    if ps[2][0] != 0:
        raise ValueError("only compression NONE supported")
    footer_len = ps[1][0]
    f_end = len(data) - 1 - ps_len
    if footer_len > f_end - 3:
        raise ValueError("footer overruns file")
    footer = _orc_parse_msg(
        data[f_end - footer_len : f_end],
        fields_varint={1, 2, 6, 7},
        fields_lendelim={3},
    )
    for req in (1, 2, 6, 7):
        if req not in footer:
            raise ValueError(f"footer missing field {req}")
    if footer[1][0] != 3:
        raise ValueError("headerLength must be 3 (magic)")
    content_len = footer[2][0]
    stripes = []
    expect_offset = 3
    rows_sum = 0
    for raw in footer.get(3, []):
        st = _orc_parse_msg(
            raw, fields_varint={1, 2, 3, 4, 5}, fields_lendelim=set()
        )
        for req in (1, 2, 3, 4, 5):
            if req not in st:
                raise ValueError(f"stripe missing field {req}")
        offset, index_len, data_len, sf_len, rows = (
            st[1][0], st[2][0], st[3][0], st[4][0], st[5][0]
        )
        if offset != expect_offset:
            raise ValueError("stripe offsets not contiguous")
        expect_offset += index_len + data_len + sf_len
        rows_sum += rows
        stripes.append((offset, index_len, data_len, sf_len, rows))
    if expect_offset - 3 != content_len:
        raise ValueError("contentLength != sum of stripe sizes")
    if rows_sum != footer[6][0]:
        raise ValueError("numberOfRows != sum of stripe rows")
    if 3 + content_len + footer_len + ps_len + 1 != len(data):
        raise ValueError("reconstructed size != file size")
    return {
        "n_stripes": len(stripes),
        "total_rows": rows_sum,
        "content_bytes": content_len,
        "footer_bytes": footer_len,
        "postscript_bytes": ps_len,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# Arrow IPC stream framing (https://arrow.apache.org/docs/format/
# Columnar.html#serialization-and-interprocess-communication): each
# encapsulated message is <0xFFFFFFFF continuation> <int32 LE metadata
# size> <metadata, zero-padded to 8> <body, zero-padded to 8>, every
# message starting on an 8-byte boundary, the stream closed by a
# continuation marker with metadata size 0 (EOS). The metadata is a
# flatbuffer in real Arrow — a DECLARED boundary here: the fake
# metadata packs (msg_type u8, body_len u32 LE) into its first five
# bytes standing in for the flatbuffer's version/header/bodyLength
# fields, then deterministic filler. The ENVELOPE walk — continuation
# markers, 8-alignment, padded lengths, EOS placement, trailing-byte
# rejection — is the real length-prefixed streaming discipline this
# walker exercises (the complement of ORC's read-backwards tail).
# ---------------------------------------------------------------------------
def _pad8(n: int) -> int:
    return (n + 7) // 8 * 8


def encode_arrow_ipc(messages) -> bytes:
    """messages: iterable of (msg_type, meta_raw_len, body_len) with
    meta_raw_len >= 5. Emits the framed stream + EOS marker."""
    import struct

    out = bytearray()
    for msg_type, meta_raw, body_len in messages:
        if meta_raw < 5:
            raise ValueError("metadata too short for the fake header")
        meta = bytearray()
        meta.append(msg_type)
        meta += struct.pack("<I", body_len)
        meta += bytes((msg_type + i) % 251 for i in range(meta_raw - 5))
        meta_pad = _pad8(len(meta))
        meta += bytes(meta_pad - len(meta))
        out += b"\xff\xff\xff\xff" + struct.pack("<I", meta_pad) + meta
        body_pad = _pad8(body_len)
        out += bytes((body_len + i) % 251 for i in range(body_len))
        out += bytes(body_pad - body_len)
    out += b"\xff\xff\xff\xff" + b"\x00\x00\x00\x00"  # EOS
    return bytes(out)


def parse_arrow_ipc(data: bytes) -> dict:
    """Strict envelope walk; raises ValueError on any framing fault."""
    import struct

    pos = 0
    n_schema = n_batches = 0
    meta_bytes = body_bytes = 0
    saw_eos = False
    while pos < len(data):
        if pos % 8:
            raise ValueError("message not 8-byte aligned")
        if pos + 8 > len(data):
            raise ValueError("truncated message prefix")
        if data[pos : pos + 4] != b"\xff\xff\xff\xff":
            raise ValueError("missing continuation marker")
        (meta_len,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        pos += 8
        if meta_len == 0:
            saw_eos = True
            break
        if meta_len % 8:
            raise ValueError("metadata length not padded to 8")
        if pos + meta_len > len(data):
            raise ValueError("metadata overruns stream")
        meta = data[pos : pos + meta_len]
        pos += meta_len
        msg_type = meta[0]
        (body_len,) = struct.unpack("<I", meta[1:5])
        body_pad = _pad8(body_len)
        if pos + body_pad > len(data):
            raise ValueError("body overruns stream")
        if any(data[pos + body_len : pos + body_pad]):
            raise ValueError("body padding not zeroed")
        pos += body_pad
        if msg_type == 1:
            if n_schema or n_batches:
                raise ValueError("schema message must come first, once")
            n_schema += 1
        elif msg_type == 3:
            if not n_schema:
                raise ValueError("record batch before schema")
            n_batches += 1
        else:
            raise ValueError(f"unknown message type {msg_type}")
        meta_bytes += meta_len
        body_bytes += body_pad
    if not saw_eos:
        raise ValueError("stream missing EOS marker")
    if pos != len(data):
        raise ValueError("trailing bytes after EOS")
    if not n_schema:
        raise ValueError("stream has no schema message")
    return {
        "n_batches": n_batches,
        "meta_bytes": meta_bytes,
        "body_bytes": body_bytes,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# Parquet file tail (https://parquet.apache.org/docs/file-format/):
# "PAR1" magic at BOTH ends, and before the trailing magic a 4-byte
# little-endian footer length pointing back at a THRIFT COMPACT
# PROTOCOL FileMetaData blob — the fourth varint discipline in the
# walker family (protobuf LEB128 tags, EBML width-announcing VINTs,
# msgpack dispatch tags, and now thrift compact's delta-encoded field
# headers with zigzag varint ints). The codec writes a faithful
# FileMetaData subset using the REAL thrift ids (1 version, 3
# num_rows, 4 row_groups[RowGroup{2 total_byte_size, 3 num_rows}],
# 6 created_by) with short-form field headers ((delta << 4) | type),
# short-form list headers ((size << 4) | elem_type), zigzag i32/i64,
# and struct STOP bytes; the strict parser verifies both magics, the
# footer length, every field header, and num_rows == sum of row-group
# rows. The row-group body bytes are real (the file contains exactly
# the bytes the metadata claims), so file size reconstructs exactly.
# ---------------------------------------------------------------------------
def _thrift_zz_varint(v: int) -> bytes:
    """Zigzag + unsigned LEB128 (thrift compact int encoding)."""
    z = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _thrift_read_zz(buf: bytes, pos: int):
    z, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated thrift varint")
        b = buf[pos]
        pos += 1
        z |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return (z >> 1) ^ -(z & 1), pos
        if shift > 70:
            raise ValueError("thrift varint too long")


def encode_parquet_footer(row_groups, created_by: str) -> bytes:
    """row_groups: iterable of (total_byte_size, num_rows). Returns the
    whole file: magic + real row-group byte runs + thrift compact
    footer + LE32 footer length + magic."""
    import struct

    rgs = list(row_groups)  # may be a generator; consumed three ways
    if len(rgs) >= 15:
        raise ValueError("short-form list header only (size < 15)")
    out = bytearray(b"PAR1")
    for size, _rows in rgs:
        out += bytes((len(out) + i) % 251 for i in range(size))
    ft = bytearray()
    ft += bytes([1 << 4 | 5]) + _thrift_zz_varint(2)  # 1: version i32
    total_rows = sum(r for _s, r in rgs)
    ft += bytes([2 << 4 | 6]) + _thrift_zz_varint(total_rows)  # 3: i64
    ft += bytes([1 << 4 | 9])  # 4: row_groups, list type
    ft += bytes([len(rgs) << 4 | 12])  # size + struct elem type
    for size, rows in rgs:
        ft += bytes([2 << 4 | 6]) + _thrift_zz_varint(size)
        ft += bytes([1 << 4 | 6]) + _thrift_zz_varint(rows)
        ft.append(0x00)  # struct STOP
    cb = created_by.encode("utf-8")
    # thrift compact binary length is an UNSIGNED varint, not zigzag —
    # exactly the LEB128 the ORC codec already defines; reuse it
    ft += bytes([2 << 4 | 8]) + _orc_varint(len(cb)) + cb
    ft.append(0x00)  # FileMetaData STOP
    out += ft
    out += struct.pack("<I", len(ft)) + b"PAR1"
    return bytes(out)


def parse_parquet_footer(data: bytes) -> dict:
    """Strict tail walk; ValueError on any malformation."""
    import struct

    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("missing PAR1 magic")
    (flen,) = struct.unpack("<I", data[-8:-4])
    if flen + 12 > len(data):
        raise ValueError("footer overruns file")
    ft = data[len(data) - 8 - flen : len(data) - 8]
    pos = 0
    fid = 0
    version = num_rows = created_len = None
    rgs = []
    while True:
        if pos >= len(ft):
            raise ValueError("footer missing STOP")
        hdr = ft[pos]
        pos += 1
        if hdr == 0x00:
            break
        delta, ftype = hdr >> 4, hdr & 0x0F
        if delta == 0:
            raise ValueError("long-form field headers unsupported")
        fid += delta
        if fid == 1 and ftype == 5:
            version, pos = _thrift_read_zz(ft, pos)
        elif fid == 3 and ftype == 6:
            num_rows, pos = _thrift_read_zz(ft, pos)
        elif fid == 4 and ftype == 9:
            if pos >= len(ft):
                raise ValueError("truncated list header")
            lh = ft[pos]
            pos += 1
            size, etype = lh >> 4, lh & 0x0F
            if etype != 12 or size == 0x0F:
                raise ValueError("row_groups must be a short struct list")
            for _ in range(size):
                sfid = 0
                size_b = rows_b = None
                while True:
                    if pos >= len(ft):
                        raise ValueError("row group missing STOP")
                    sh = ft[pos]
                    pos += 1
                    if sh == 0x00:
                        break
                    sdelta, stype = sh >> 4, sh & 0x0F
                    if sdelta == 0 or stype != 6:
                        raise ValueError("unexpected row-group field")
                    sfid += sdelta
                    v, pos = _thrift_read_zz(ft, pos)
                    if sfid == 2:
                        size_b = v
                    elif sfid == 3:
                        rows_b = v
                    else:
                        raise ValueError(f"unknown row-group field {sfid}")
                if size_b is None or rows_b is None:
                    raise ValueError("row group missing mandatory fields")
                rgs.append((size_b, rows_b))
        elif fid == 6 and ftype == 8:
            n, pos = _orc_read_varint(ft, pos)
            if pos + n > len(ft):
                raise ValueError("created_by overruns footer")
            created_len = n
            pos += n
        else:
            raise ValueError(f"unknown field {fid} type {ftype}")
    if pos != len(ft):
        raise ValueError("trailing bytes after FileMetaData STOP")
    if version is None or num_rows is None or created_len is None:
        raise ValueError("missing mandatory FileMetaData fields")
    if num_rows != sum(r for _s, r in rgs):
        raise ValueError("num_rows != sum of row-group rows")
    body = sum(s for s, _r in rgs)
    if 4 + body + flen + 8 != len(data):
        raise ValueError("reconstructed size != file size")
    return {
        "n_rowgroups": len(rgs),
        "total_rows": num_rows,
        "body_bytes": body,
        "footer_bytes": flen,
        "created_len": created_len,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# Zstandard frame format (RFC 8878 §3): the MIXED-FRAME streaming
# discipline — a .zst is a sequence of data frames (magic 0xFD2FB528
# LE, frame-header descriptor byte, optional window descriptor,
# frame-content-size field, then 3-byte-little-endian block headers:
# bit0 last, bits1-2 type, bits3+ size) interleaved with SKIPPABLE
# frames (magic 0x184D2A50..5F + LE32 size + opaque payload) that
# decoders must step over. Raw (type 0) and RLE (type 1) blocks are
# fully walkable without entropy decoding, so the codec emits only
# those — the framing, flag bits, and FCS cross-check (frame content
# size must equal the sum of block decoded sizes) are exactly the
# spec's. Single-segment frames with content < 256 keep the FCS field
# at 1 byte.
# ---------------------------------------------------------------------------
_ZSTD_MAGIC = 0xFD2FB528
_ZSTD_SKIP_BASE = 0x184D2A50


def encode_zstd_frames(items) -> bytes:
    """items: sequence of ("skip", nibble, payload_len) or
    ("frame", [(block_type, decoded_size), ...]) with every frame's
    total decoded size < 256 (1-byte FCS). Deterministic filler."""
    import struct

    out = bytearray()
    for item in items:
        if item[0] == "skip":
            _tag, nibble, n = item
            out += struct.pack("<I", _ZSTD_SKIP_BASE | (nibble & 0xF))
            out += struct.pack("<I", n)
            out += bytes((nibble + i) % 251 for i in range(n))
            continue
        _tag, blocks = item
        if not blocks:
            raise ValueError("a data frame needs at least one block")
        total = sum(sz for _t, sz in blocks)
        if total > 255:
            raise ValueError("1-byte FCS frames only (content < 256)")
        out += struct.pack("<I", _ZSTD_MAGIC)
        out.append(0x20)  # FHD: single_segment=1, FCS code 0 -> 1 byte
        out.append(total)  # frame content size
        for i, (btype, sz) in enumerate(blocks):
            if btype not in (0, 1):
                raise ValueError("raw/RLE blocks only")
            last = 1 if i == len(blocks) - 1 else 0
            hdr = last | (btype << 1) | (sz << 3)
            out += hdr.to_bytes(3, "little")
            if btype == 0:
                out += bytes((sz + i + j) % 251 for j in range(sz))
            else:
                out.append((sz + i) % 251)
    return bytes(out)


def parse_zstd_frames(data: bytes) -> dict:
    """Strict mixed-frame walk; ValueError on any framing fault."""
    import struct

    pos = 0
    n_frames = n_skippable = n_blocks = 0
    raw_bytes = rle_bytes = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise ValueError("truncated frame magic")
        (magic,) = struct.unpack("<I", data[pos : pos + 4])
        pos += 4
        if magic & 0xFFFFFFF0 == _ZSTD_SKIP_BASE:
            if pos + 4 > len(data):
                raise ValueError("truncated skippable size")
            (n,) = struct.unpack("<I", data[pos : pos + 4])
            pos += 4
            if pos + n > len(data):
                raise ValueError("skippable payload overruns")
            pos += n
            n_skippable += 1
            continue
        if magic != _ZSTD_MAGIC:
            raise ValueError(f"bad frame magic {magic:#x}")
        if pos >= len(data):
            raise ValueError("truncated frame header descriptor")
        fhd = data[pos]
        pos += 1
        if fhd & 0x08:
            raise ValueError("reserved FHD bit set")
        if not fhd & 0x20:
            raise ValueError("only single-segment frames supported")
        if fhd & 0xC0 or fhd & 0x03 or fhd & 0x04:
            raise ValueError("only 1-byte FCS, no dict, no checksum")
        if pos >= len(data):
            raise ValueError("truncated frame content size")
        fcs = data[pos]
        pos += 1
        decoded = 0
        last = False
        while not last:
            if pos + 3 > len(data):
                raise ValueError("truncated block header")
            hdr = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bool(hdr & 1)
            btype = (hdr >> 1) & 3
            sz = hdr >> 3
            if btype == 0:
                if pos + sz > len(data):
                    raise ValueError("raw block overruns")
                pos += sz
                raw_bytes += sz
            elif btype == 1:
                if pos + 1 > len(data):
                    raise ValueError("RLE block overruns")
                pos += 1
                rle_bytes += sz
            else:
                raise ValueError(f"unsupported block type {btype}")
            decoded += sz
            n_blocks += 1
        if decoded != fcs:
            raise ValueError("frame content size != sum of block sizes")
        n_frames += 1
    if not n_frames:
        raise ValueError("no data frames in stream")
    return {
        "n_frames": n_frames,
        "n_skippable": n_skippable,
        "n_blocks": n_blocks,
        "raw_bytes": raw_bytes,
        "rle_bytes": rle_bytes,
        "content_bytes": raw_bytes + rle_bytes,
        "file_bytes": len(data),
    }


# ---------------------------------------------------------------------------
# Real parquet DATA-PAGE decode (mm_parquet_datapage): where
# encode/parse_parquet_footer above walk a synthetic closed-form tail,
# this decoder reads files another writer produced — full thrift
# compact FileMetaData (schema + row groups + column chunks), v1 page
# headers, PLAIN INT64 values, and the RLE/bit-packed hybrid dictionary
# indices behind RLE_DICTIONARY byte-array columns (parquet
# format spec: Encodings.md). Strict: unknown compression, optional
# fields (definition levels), or v2 pages raise rather than guess.
# The generic skip-capable thrift reader is what the closed-form
# walkers never needed: writers emit fields (statistics, key-value
# metadata, offsets) a reader must skip BY TYPE to stay aligned —
# note thrift compact I16 (type 4) is a zigzag varint, not fixed
# bytes, an easy desync.
# ---------------------------------------------------------------------------
class _ThriftCompact:
    """Positioned reader over thrift compact protocol bytes."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("truncated thrift stream")
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def uvarint(self) -> int:
        r, s = 0, 0
        while True:
            b = self.u8()
            r |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                return r
            if s > 70:
                raise ValueError("thrift varint too long")

    def zigzag(self) -> int:
        v = self.uvarint()
        return (v >> 1) ^ -(v & 1)

    def binary(self) -> bytes:
        n = self.uvarint()
        if self.pos + n > len(self.buf):
            raise ValueError("thrift binary overruns")
        v = self.buf[self.pos : self.pos + n]
        self.pos += n
        return v

    def fields(self):
        """Yield (field_id, wire_type) until struct STOP; the caller
        must consume each value (or call skip(wire_type))."""
        last = 0
        while True:
            h = self.u8()
            if h == 0:
                return
            delta, t = h >> 4, h & 0x0F
            last = last + delta if delta else self.zigzag()
            yield last, t

    def skip(self, t: int, in_container: bool = False) -> None:
        if t in (1, 2):  # BOOL
            # Zero-width ONLY as a struct field (the value is packed in
            # the field header). As a list/set/map ELEMENT each bool
            # occupies one byte (0x01/0x02) — not consuming it would
            # silently desync the reader for every subsequent field.
            if in_container:
                self.u8()
            return
        if t == 3:
            self.u8()
        elif t in (4, 5, 6):  # I16/I32/I64: all zigzag varints
            self.zigzag()
        elif t == 7:  # DOUBLE: 8 fixed bytes
            self.pos += 8
        elif t == 8:
            self.binary()
        elif t in (9, 10):  # LIST / SET
            h = self.u8()
            n, et = h >> 4, h & 0x0F
            if n == 15:
                n = self.uvarint()
            for _ in range(n):
                self.skip(et, in_container=True)
        elif t == 11:  # MAP
            n = self.uvarint()
            if n:
                kt_vt = self.u8()
                for _ in range(n):
                    self.skip(kt_vt >> 4, in_container=True)
                    self.skip(kt_vt & 0x0F, in_container=True)
        elif t == 12:
            for _fid, ft in self.fields():
                self.skip(ft)
        else:
            raise ValueError(f"unknown thrift type {t}")

    def list_header(self, want_type: int) -> int:
        h = self.u8()
        n, et = h >> 4, h & 0x0F
        if n == 15:
            n = self.uvarint()
        if et != want_type:
            raise ValueError(f"list elem type {et}, wanted {want_type}")
        return n


def _pq_file_meta(tc: _ThriftCompact) -> dict:
    """FileMetaData subset: num_rows, leaf schema (name, repetition),
    row groups with per-chunk (path, codec, num_values, encodings,
    data/dictionary page offsets)."""
    meta = {"schema": [], "row_groups": [], "num_rows": None}
    for fid, t in tc.fields():
        if fid == 2 and t == 9:  # schema: list<SchemaElement>
            for _ in range(tc.list_header(12)):
                el = {"repetition": None, "num_children": 0}
                for f2, t2 in tc.fields():
                    if f2 == 1 and t2 == 5:
                        el["type"] = tc.zigzag()
                    elif f2 == 3 and t2 == 5:
                        el["repetition"] = tc.zigzag()
                    elif f2 == 4 and t2 == 8:
                        el["name"] = tc.binary().decode("utf-8")
                    elif f2 == 5 and t2 == 5:
                        el["num_children"] = tc.zigzag()
                    else:
                        tc.skip(t2)
                meta["schema"].append(el)
        elif fid == 3 and t == 6:
            meta["num_rows"] = tc.zigzag()
        elif fid == 4 and t == 9:  # row_groups: list<RowGroup>
            for _ in range(tc.list_header(12)):
                rg = {"columns": [], "num_rows": None}
                for f2, t2 in tc.fields():
                    if f2 == 1 and t2 == 9:  # columns: list<ColumnChunk>
                        for _c in range(tc.list_header(12)):
                            cc = {}
                            for f3, t3 in tc.fields():
                                if f3 == 3 and t3 == 12:  # ColumnMetaData
                                    for f4, t4 in tc.fields():
                                        if f4 == 1 and t4 == 5:
                                            cc["type"] = tc.zigzag()
                                        elif f4 == 3 and t4 == 9:
                                            cc["path"] = tuple(
                                                tc.binary().decode("utf-8")
                                                for _p in range(
                                                    tc.list_header(8)
                                                )
                                            )
                                        elif f4 == 4 and t4 == 5:
                                            cc["codec"] = tc.zigzag()
                                        elif f4 == 5 and t4 == 6:
                                            cc["num_values"] = tc.zigzag()
                                        elif f4 == 9 and t4 == 6:
                                            cc["data_off"] = tc.zigzag()
                                        elif f4 == 11 and t4 == 6:
                                            cc["dict_off"] = tc.zigzag()
                                        else:
                                            tc.skip(t4)
                                else:
                                    tc.skip(t3)
                            rg["columns"].append(cc)
                    elif f2 == 3 and t2 == 6:
                        rg["num_rows"] = tc.zigzag()
                    else:
                        tc.skip(t2)
                meta["row_groups"].append(rg)
        else:
            tc.skip(t)
    return meta


def _pq_page_header(tc: _ThriftCompact) -> dict:
    ph = {}
    for fid, t in tc.fields():
        if fid == 1 and t == 5:
            ph["type"] = tc.zigzag()
        elif fid == 2 and t == 5:
            ph["uncompressed"] = tc.zigzag()
        elif fid == 3 and t == 5:
            ph["compressed"] = tc.zigzag()
        elif fid == 5 and t == 12:  # DataPageHeader (v1)
            d = {}
            for f2, t2 in tc.fields():
                if f2 == 1 and t2 == 5:
                    d["num_values"] = tc.zigzag()
                elif f2 == 2 and t2 == 5:
                    d["encoding"] = tc.zigzag()
                else:
                    tc.skip(t2)
            ph["data"] = d
        elif fid == 7 and t == 12:  # DictionaryPageHeader
            d = {}
            for f2, t2 in tc.fields():
                if f2 == 1 and t2 == 5:
                    d["num_values"] = tc.zigzag()
                elif f2 == 2 and t2 == 5:
                    d["encoding"] = tc.zigzag()
                else:
                    tc.skip(t2)
            ph["dict"] = d
        elif fid == 8 and t == 12:  # DataPageHeaderV2
            d = {}
            for f2, t2 in tc.fields():
                if f2 == 1 and t2 == 5:
                    d["num_values"] = tc.zigzag()
                elif f2 == 2 and t2 == 5:
                    d["num_nulls"] = tc.zigzag()
                elif f2 == 3 and t2 == 5:
                    d["num_rows"] = tc.zigzag()
                elif f2 == 4 and t2 == 5:
                    d["encoding"] = tc.zigzag()
                elif f2 == 5 and t2 == 5:
                    d["def_len"] = tc.zigzag()
                elif f2 == 6 and t2 == 5:
                    d["rep_len"] = tc.zigzag()
                elif f2 == 7 and t2 in (1, 2):
                    d["is_compressed"] = t2 == 1  # header-packed bool
                else:
                    tc.skip(t2)
            ph["data2"] = d
        else:
            tc.skip(t)
    return ph


def _rle_bp_hybrid(buf: bytes, pos: int, bit_width: int, n: int):
    """Decode ``n`` values from parquet's RLE/bit-packed hybrid
    (Encodings.md): LEB128 run header, LSB bit-packing in groups of
    8, RLE literal padded to ceil(bw/8) bytes."""
    out: list[int] = []
    mask = (1 << bit_width) - 1
    while len(out) < n:
        tc = _ThriftCompact(buf, pos)
        header = tc.uvarint()
        pos = tc.pos
        if header & 1:  # bit-packed run of (header >> 1) groups of 8
            groups = header >> 1
            if groups == 0:
                raise ValueError("zero-length bit-packed run")
            nbytes = groups * bit_width
            if pos + nbytes > len(buf):
                raise ValueError("bit-packed run overruns page")
            bits = int.from_bytes(buf[pos : pos + nbytes], "little")
            out.extend(
                (bits >> (i * bit_width)) & mask
                for i in range(groups * 8)
            )
            pos += nbytes
        else:  # RLE run
            count = header >> 1
            if count == 0:
                raise ValueError("zero-length RLE run")
            w = (bit_width + 7) // 8
            if pos + w > len(buf):
                raise ValueError("RLE literal overruns page")
            out.extend([int.from_bytes(buf[pos : pos + w], "little")] * count)
            pos += w
    return out[:n], pos


def decode_parquet_int64_string(
    data: bytes, int_col: str, str_col: str
) -> list:
    """Hand-decode a 2-column parquet file — REQUIRED INT64 (PLAIN) +
    REQUIRED BYTE_ARRAY (RLE_DICTIONARY or PLAIN), uncompressed, v1
    data pages — straight from the bytes, no parquet library. Returns
    one dict per row: {int_col, str_col, rg_ordinal, rg_rows}. Strict:
    wrong magic, compression, OPTIONAL fields (definition levels), v2
    pages, or cross-check failures (chunk num_values != row-group
    rows, decoded totals != footer num_rows) raise ValueError."""
    import struct

    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("missing PAR1 magic")
    (flen,) = struct.unpack("<I", data[-8:-4])
    if flen + 12 > len(data):
        raise ValueError("footer overruns file")
    meta = _pq_file_meta(_ThriftCompact(data, len(data) - 8 - flen))
    leaves = {
        el["name"]: el
        for el in meta["schema"]
        if not el["num_children"]
    }
    for name in (int_col, str_col):
        if name not in leaves:
            raise ValueError(f"column {name} not in schema")
        if leaves[name]["repetition"] != 0:  # REQUIRED
            raise ValueError(f"column {name} is not REQUIRED")

    rows: list = []
    total = 0
    for ordinal, rg in enumerate(meta["row_groups"]):
        cols: dict = {}
        for cc in rg["columns"]:
            if cc.get("codec", 0) != 0:
                raise ValueError("compressed chunk; decoder is strict")
            if cc["num_values"] != rg["num_rows"]:
                raise ValueError("chunk num_values != row-group rows")
            name = cc["path"][0]
            want = cc["num_values"]
            dict_vals: list | None = None
            vals: list = []
            pos = cc.get("dict_off", cc["data_off"])
            while len(vals) < want:
                tc = _ThriftCompact(data, pos)
                ph = _pq_page_header(tc)
                body = tc.pos
                if ph.get("compressed") != ph.get("uncompressed"):
                    raise ValueError("page sizes differ: compressed?")
                if ph["type"] == 2:  # dictionary page (PLAIN values)
                    if ph["dict"]["encoding"] not in (0, 2):
                        raise ValueError("non-PLAIN dictionary page")
                    nd = ph["dict"]["num_values"]
                    p = body
                    if cc["type"] == 2:  # INT64 dict
                        dict_vals = list(
                            struct.unpack(f"<{nd}q", data[p : p + 8 * nd])
                        )
                    elif cc["type"] == 6:  # BYTE_ARRAY dict
                        d = []
                        for _ in range(nd):
                            (ln,) = struct.unpack("<I", data[p : p + 4])
                            d.append(
                                data[p + 4 : p + 4 + ln].decode("utf-8")
                            )
                            p += 4 + ln
                        dict_vals = d
                    else:
                        raise ValueError(
                            f"dict for physical type {cc['type']}"
                        )
                elif ph["type"] == 0:  # data page v1
                    n = ph["data"]["num_values"]
                    enc = ph["data"]["encoding"]
                    p = body
                    if enc == 0 and name == int_col:
                        vals.extend(
                            struct.unpack(f"<{n}q", data[p : p + 8 * n])
                        )
                    elif enc == 0 and name == str_col:
                        for _ in range(n):
                            (ln,) = struct.unpack("<I", data[p : p + 4])
                            vals.append(
                                data[p + 4 : p + 4 + ln].decode("utf-8")
                            )
                            p += 4 + ln
                    elif enc in (2, 8):
                        if dict_vals is None:
                            raise ValueError("dict page missing")
                        bw = data[p]
                        idxs, _end = _rle_bp_hybrid(data, p + 1, bw, n)
                        if idxs and max(idxs) >= len(dict_vals):
                            raise ValueError("dict index out of range")
                        vals.extend(dict_vals[i] for i in idxs)
                    else:
                        raise ValueError(
                            f"encoding {enc} for {name} unsupported"
                        )
                else:
                    raise ValueError(f"page type {ph['type']} (v2?)")
                pos = body + ph["compressed"]
            if len(vals) != want:
                raise ValueError("page overshoot inside chunk")
            cols[name] = vals
        for iv, sv in zip(cols[int_col], cols[str_col]):
            rows.append(
                {
                    int_col: iv,
                    str_col: sv,
                    "rg_ordinal": ordinal,
                    "rg_rows": rg["num_rows"],
                }
            )
        total += rg["num_rows"]
    if total != meta["num_rows"]:
        raise ValueError("row groups don't sum to footer num_rows")
    return rows


# ---------------------------------------------------------------------------
# zlib/DEFLATE decode (mm_deflate_fixed_huffman /
# mm_deflate_dynamic_huffman): RFC 1950 wrapper + the full RFC 1951
# block-type set — stored, FIXED-HUFFMAN, and DYNAMIC-HUFFMAN (the
# HLIT/HDIST/HCLEN header, the 19-symbol code-length code with
# repeat symbols 16/17/18, and per-block canonical tables) — decoded
# bit-by-bit with canonical code tables built from the spec's code
# lengths (3.2.2/3.2.6/3.2.7); no zlib involvement on the read side.
# Strict: header check bits, FDICT, LEN/NLEN complements,
# back-reference bounds, over-long codes, over-subscribed code
# lengths (Kraft), code-length-run overflow, a zero-length
# end-of-block symbol, and the Adler-32 trailer are all verified.
# ---------------------------------------------------------------------------
class _BitReader:
    """LSB-first bit reader; Huffman codes accumulate bit-by-bit (the
    spec packs code MSBs first, so (length, code) lookup works)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.pos = pos
        self.bit = 0

    def take(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.pos >= len(self.d):
                raise ValueError("truncated deflate stream")
            v |= ((self.d[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _canonical_table(lengths: list) -> dict:
    """(length, code) -> symbol, RFC 1951 3.2.2's canonical assignment.
    Rejects over-subscribed length sets (Kraft sum > 1); incomplete
    sets are legal (zlib emits a one-entry distance code)."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    if max_len and sum(
        n << (max_len - ln) for ln, n in enumerate(bl_count) if ln
    ) > (1 << max_len):
        raise ValueError("over-subscribed Huffman code lengths")
    next_code = [0] * (max_len + 1)
    code = 0
    for bits in range(1, max_len + 1):
        code = (code + bl_count[bits - 1]) << 1
        next_code[bits] = code
    table = {}
    for sym, ln in enumerate(lengths):
        if ln:
            table[(ln, next_code[ln])] = sym
            next_code[ln] += 1
    return table


_FIXED_LIT = _canonical_table([8] * 144 + [9] * 112 + [7] * 24 + [8] * 8)
_FIXED_DIST = _canonical_table([5] * 30)
_LEN_BASE = (3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35,
             43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258)
_LEN_EXTRA = (0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3,
              4, 4, 4, 4, 5, 5, 5, 5, 0)
_DIST_BASE = (1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
              257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
              8193, 12289, 16385, 24577)
_DIST_EXTRA = (0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8,
               9, 9, 10, 10, 11, 11, 12, 12, 13, 13)


def _read_code(br: _BitReader, table: dict) -> int:
    code = length = 0
    while True:
        code = (code << 1) | br.take(1)
        length += 1
        if length > 15:
            raise ValueError("Huffman code longer than 15 bits")
        sym = table.get((length, code))
        if sym is not None:
            return sym


_CL_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14,
             1, 15)


def _dynamic_tables(br: _BitReader) -> tuple:
    """RFC 1951 3.2.7: read HLIT/HDIST/HCLEN, decode the code-length
    code, expand repeat symbols 16/17/18, build both block tables."""
    hlit = br.take(5) + 257
    hdist = br.take(5) + 1
    hclen = br.take(4) + 4
    cl_lengths = [0] * 19
    for i in range(hclen):
        cl_lengths[_CL_ORDER[i]] = br.take(3)
    if not any(cl_lengths):
        raise ValueError("empty code-length code")
    cl_table = _canonical_table(cl_lengths)
    lengths: list = []
    while len(lengths) < hlit + hdist:
        sym = _read_code(br, cl_table)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("length-repeat with no previous length")
            lengths.extend([lengths[-1]] * (3 + br.take(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + br.take(3)))
        else:
            lengths.extend([0] * (11 + br.take(7)))
    if len(lengths) > hlit + hdist:
        raise ValueError("code-length run overflows HLIT+HDIST")
    lit_lengths, dist_lengths = lengths[:hlit], lengths[hlit:]
    if not lit_lengths[256]:
        raise ValueError("end-of-block symbol has zero length")
    return _canonical_table(lit_lengths), _canonical_table(dist_lengths)


# Deflate's max compression ratio is ~1032:1, so a few KiB of crafted
# input can legally expand to MiB — without a ceiling a malicious
# stream expands without bound (decompression bomb). 64 MiB is orders
# of magnitude above any fixture/spool payload this repo decodes while
# still bounding a single executor task's memory; decoders that know
# the expected payload size may pass a tighter ``max_output``.
_MAX_INFLATE_OUTPUT = 1 << 26


def _inflate_huffman_block(
    br: _BitReader,
    out: bytearray,
    lit_table: dict,
    dist_table: dict,
    max_output: int = _MAX_INFLATE_OUTPUT,
) -> None:
    """Decode one Huffman-coded block body (shared by fixed/dynamic)."""
    while True:
        sym = _read_code(br, lit_table)
        if sym == 256:
            return
        if sym < 256:
            if len(out) >= max_output:
                raise ValueError(
                    "inflate output exceeds max_output "
                    "(decompression bomb?)"
                )
            out.append(sym)
        else:
            li = sym - 257
            if li >= len(_LEN_BASE):
                raise ValueError(f"bad length code {sym}")
            ln = _LEN_BASE[li] + br.take(_LEN_EXTRA[li])
            dsym = _read_code(br, dist_table)
            if dsym >= len(_DIST_BASE):
                raise ValueError(f"bad distance code {dsym}")
            dist = _DIST_BASE[dsym] + br.take(_DIST_EXTRA[dsym])
            if dist > len(out):
                raise ValueError("back-reference before start")
            if len(out) + ln > max_output:
                raise ValueError(
                    "inflate output exceeds max_output "
                    "(decompression bomb?)"
                )
            for _ in range(ln):
                out.append(out[-dist])


def _adler32(data: bytes) -> int:
    s1, s2 = 1, 0
    for b in data:
        s1 = (s1 + b) % 65521
        s2 = (s2 + s1) % 65521
    return (s2 << 16) | s1


def _inflate_raw(br: _BitReader, max_output: int = _MAX_INFLATE_OUTPUT):
    """Decode one complete raw-deflate stream (through its BFINAL
    block) from the reader's position; leaves the reader byte-aligned
    just past the stream. Shared by the zlib (RFC 1950) and gzip
    (RFC 1952) wrappers. Output larger than ``max_output`` raises
    ValueError (decompression-bomb guard, matching the decoder
    family's strict-on-malformed discipline)."""
    data = br.d
    out = bytearray()
    n_blocks = n_stored = n_fixed = n_dynamic = 0
    while True:
        bfinal = br.take(1)
        btype = br.take(2)
        n_blocks += 1
        if btype == 0:  # stored
            br.align()
            if br.pos + 4 > len(data):
                raise ValueError("truncated stored header")
            ln = data[br.pos] | data[br.pos + 1] << 8
            nln = data[br.pos + 2] | data[br.pos + 3] << 8
            if ln ^ nln != 0xFFFF:
                raise ValueError("stored LEN/NLEN mismatch")
            br.pos += 4
            if br.pos + ln > len(data):
                raise ValueError("stored block overruns stream")
            if len(out) + ln > max_output:
                raise ValueError(
                    "inflate output exceeds max_output "
                    "(decompression bomb?)"
                )
            out += data[br.pos : br.pos + ln]
            br.pos += ln
            n_stored += 1
        elif btype == 1:  # fixed Huffman
            n_fixed += 1
            _inflate_huffman_block(
                br, out, _FIXED_LIT, _FIXED_DIST, max_output
            )
        elif btype == 2:  # dynamic Huffman
            n_dynamic += 1
            lit_table, dist_table = _dynamic_tables(br)
            _inflate_huffman_block(
                br, out, lit_table, dist_table, max_output
            )
        else:
            raise ValueError("reserved BTYPE")
        if bfinal:
            break
    br.align()
    return bytes(out), {
        "n_blocks": n_blocks,
        "n_stored": n_stored,
        "n_fixed": n_fixed,
        "n_dynamic": n_dynamic,
    }


def inflate_zlib(data: bytes, max_output: int = _MAX_INFLATE_OUTPUT):
    """Decode a zlib stream — all three RFC 1951 block types (stored,
    fixed-Huffman, dynamic-Huffman). Returns (payload_bytes, info
    dict with per-type block counts). ValueError on any
    malformation — including output beyond ``max_output`` (bomb
    guard); see the section comment for the checked set."""
    if len(data) < 6:
        raise ValueError("truncated zlib stream")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("CM != 8 (not deflate)")
    if (cmf * 256 + flg) % 31 != 0:
        raise ValueError("zlib header check failed")
    if flg & 0x20:
        raise ValueError("FDICT unsupported")
    br = _BitReader(data, 2)
    out, counts = _inflate_raw(br, max_output)
    if br.pos + 4 > len(data):
        raise ValueError("missing adler32 trailer")
    trailer = int.from_bytes(data[br.pos : br.pos + 4], "big")
    if trailer != _adler32(out):
        raise ValueError("adler32 mismatch")
    return out, {
        **counts,
        "adler32": trailer,
        "comp_bytes": br.pos + 4,
    }


# ---------------------------------------------------------------------------
# gzip decode (mm_gzip_inflate): RFC 1952 members over the same
# library-free _inflate_raw core — full header feature set (FEXTRA
# with its length-prefixed subfields, FNAME/FCOMMENT latin-1
# zero-terminated strings, FHCRC verified against a hand CRC-32's
# low 16 bits), multi-member concatenation, and the CRC32 + ISIZE
# trailer both checked with the table-driven CRC below. This is the
# COMPRESSED-body sibling of parse_gzip_members (staged_r20), whose
# stored-mode walk leans on zlib; here nothing on the read side does.
# ---------------------------------------------------------------------------
def _build_crc32_table() -> tuple:
    table = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ 0xEDB88320 if c & 1 else c >> 1
        table.append(c)
    return tuple(table)


# Built at import: a lazy module-global init would race under the
# executor's thread pool (a second thread could index a half-built
# list). 256 entries, trivial import cost.
_CRC32_TABLE = _build_crc32_table()


def _crc32_py(data: bytes, crc: int = 0) -> int:
    """Reflected CRC-32 (poly 0xEDB88320), table-driven."""
    crc ^= 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC32_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def inflate_gzip_members(data: bytes):
    """Decode a (possibly multi-member) gzip stream by hand. Returns
    (concatenated_payload, info dict with member/header-feature
    counts and per-block-type totals). ValueError on any
    malformation: bad magic/CM, reserved FLG bits, FHCRC mismatch,
    truncated headers or trailers (including an empty input), CRC32/
    ISIZE mismatch, and every raw-deflate error _inflate_raw raises."""
    if not data:
        raise ValueError("empty gzip stream")
    pos = 0
    payload = bytearray()
    info = {
        "n_members": 0,
        "n_named": 0,
        "n_extra": 0,
        "n_fhcrc": 0,
        "n_dynamic": 0,
        "n_fixed": 0,
        "n_stored": 0,
    }
    while pos < len(data):
        if len(data) - pos < 18:
            raise ValueError("truncated gzip member")
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError("bad gzip magic")
        if data[pos + 2] != 8:
            raise ValueError(f"unknown compression method {data[pos + 2]}")
        flg = data[pos + 3]
        if flg & 0xE0:
            raise ValueError(f"reserved FLG bits set: {flg:#x}")
        hdr_end = pos + 10
        if flg & 0x04:  # FEXTRA
            if hdr_end + 2 > len(data):
                raise ValueError("truncated FEXTRA length")
            xlen = int.from_bytes(data[hdr_end : hdr_end + 2], "little")
            hdr_end += 2
            if hdr_end + xlen > len(data):
                raise ValueError("FEXTRA overruns stream")
            sub = hdr_end
            while sub < hdr_end + xlen:  # SI1 SI2 LEN data
                if sub + 4 > hdr_end + xlen:
                    raise ValueError("truncated FEXTRA subfield")
                sub += 4 + int.from_bytes(data[sub + 2 : sub + 4], "little")
            if sub != hdr_end + xlen:
                raise ValueError("FEXTRA subfields overrun XLEN")
            hdr_end += xlen
            info["n_extra"] += 1
        for flag, key in ((0x08, "n_named"), (0x10, None)):
            if flg & flag:  # FNAME / FCOMMENT: latin-1, zero-terminated
                z = data.find(b"\x00", hdr_end)
                if z < 0:
                    raise ValueError("unterminated gzip header string")
                hdr_end = z + 1
                if key:
                    info[key] += 1
        if flg & 0x02:  # FHCRC: CRC-32 low 16 bits over the header
            if hdr_end + 2 > len(data):
                raise ValueError("truncated FHCRC")
            want = int.from_bytes(data[hdr_end : hdr_end + 2], "little")
            if _crc32_py(data[pos:hdr_end]) & 0xFFFF != want:
                raise ValueError("FHCRC mismatch")
            hdr_end += 2
            info["n_fhcrc"] += 1
        br = _BitReader(data, hdr_end)
        member, counts = _inflate_raw(br)
        for k in ("n_dynamic", "n_fixed", "n_stored"):
            info[k] += counts[k]
        if br.pos + 8 > len(data):
            raise ValueError("missing gzip trailer")
        crc = int.from_bytes(data[br.pos : br.pos + 4], "little")
        isize = int.from_bytes(data[br.pos + 4 : br.pos + 8], "little")
        if crc != _crc32_py(member):
            raise ValueError("gzip CRC32 mismatch")
        if isize != len(member) % (1 << 32):
            raise ValueError("gzip ISIZE mismatch")
        payload += member
        info["n_members"] += 1
        pos = br.pos + 8
    info["comp_bytes"] = pos
    return bytes(payload), info


# ---------------------------------------------------------------------------
# LZ4 block format (mm_lz4_block_decode): the frame-less block codec
# (lz4_Block_format.md) — token byte with literal-length / match-length
# nibbles, 255-extension bytes, 2-byte little-endian match offsets,
# overlapping back-copies (offset < match length is legal and common).
# Both directions are hand-rolled: the compressor is the FIXTURE side
# (greedy 4-byte hash-chain matcher honoring the spec's end-of-block
# rules: last sequence is literals-only, matches must not reach into
# the final 5 bytes), the decompressor is the engine side with the
# decoder family's strictness — zero offsets, out-of-range
# back-references, truncated extensions, and output beyond max_output
# all raise ValueError. No lz4 library exists in this environment, so
# round-trip + hand-built golden vectors + mutation fuzz stand in for
# an interop check (tests/test_staged_r24.py).
# ---------------------------------------------------------------------------
_LZ4_MIN_MATCH = 4
_LZ4_LAST_LITERALS = 5
_LZ4_MFLIMIT = 12  # spec: matches must start >= 12 bytes before end


def lz4_block_compress(data: bytes) -> bytes:
    """Greedy LZ4 block compressor (fixture side). Valid output for
    ANY input: positions hash into a 4-byte-prefix table, matches
    extend forward, and the trailing _LZ4_LAST_LITERALS bytes are
    always emitted as the final literals-only sequence."""
    n = len(data)
    out = bytearray()
    table: dict = {}
    anchor = 0
    i = 0
    limit = n - _LZ4_MFLIMIT

    def emit(lit_len: int, lit_start: int, match_len: int, offset: int):
        tok_lit = min(lit_len, 15)
        tok_match = min(match_len - _LZ4_MIN_MATCH, 15) if offset else 0
        out.append((tok_lit << 4) | tok_match)
        rest = lit_len - 15
        while rest >= 0:
            out.append(min(rest, 255))
            if rest < 255:
                break
            rest -= 255
        out.extend(data[lit_start : lit_start + lit_len])
        if offset:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            rest = match_len - _LZ4_MIN_MATCH - 15
            while rest >= 0:
                out.append(min(rest, 255))
                if rest < 255:
                    break
                rest -= 255

    while i < limit:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is None or i - j > 0xFFFF or data[j : j + 4] != key:
            i += 1
            continue
        # extend the match forward, but never into the last 5 bytes
        end = n - _LZ4_LAST_LITERALS
        m = i + 4
        while m < end and data[m] == data[m - (i - j)]:
            m += 1
        emit(i - anchor, anchor, m - i, i - j)
        i = m
        anchor = m
    emit(n - anchor, anchor, 0, 0)
    return bytes(out)


def lz4_block_decompress(
    data: bytes, max_output: int = _MAX_INFLATE_OUTPUT
) -> tuple:
    """Decode one LZ4 block. Returns (payload_bytes, info dict with
    n_sequences / n_matches / match_bytes). Strict ValueError on every
    malformation class: truncation anywhere, zero offset,
    back-reference before start, missing literals-only terminator,
    output beyond max_output."""
    out = bytearray()
    pos = 0
    n = len(data)
    n_seq = n_match = match_bytes = 0
    if n == 0:
        raise ValueError("empty lz4 block")
    while True:
        if pos >= n:
            raise ValueError("truncated lz4 block (no terminator)")
        token = data[pos]
        pos += 1
        n_seq += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated literal-length bytes")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("literals overrun block")
        if len(out) + lit_len > max_output:
            raise ValueError(
                "lz4 output exceeds max_output (decompression bomb?)"
            )
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos == n:  # last sequence: literals only, no offset
            break
        if pos + 2 > n:
            raise ValueError("truncated match offset")
        offset = data[pos] | (data[pos + 1] << 8)
        pos += 2
        if offset == 0:
            raise ValueError("zero lz4 match offset")
        if offset > len(out):
            raise ValueError("lz4 back-reference before start")
        match_len = (token & 0x0F) + _LZ4_MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("truncated match-length bytes")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if len(out) + match_len > max_output:
            raise ValueError(
                "lz4 output exceeds max_output (decompression bomb?)"
            )
        # byte-at-a-time honors overlapping copies (offset < length)
        for _ in range(match_len):
            out.append(out[-offset])
        n_match += 1
        match_bytes += match_len
    return bytes(out), {
        "n_sequences": n_seq,
        "n_matches": n_match,
        "match_bytes": match_bytes,
    }


# ---------------------------------------------------------------------------
# RIFF / WebP-lossless header walk (mm_riff_webp): the generic RIFF
# chunk walk (fourcc, little-endian size, even-byte padding) that WAV
# already exercises, applied to the WebP container — plus the VP8L
# ("lossless") 5-byte header decode: 0x2f signature then width-1 /
# height-1 as LSB-first 14-bit fields. The builder writes a container
# whose VP8L payload is header-only (the query never claims pixel
# decode — dimensions and chunk geometry are the spec-checkable
# surface) plus trailing metadata chunks to force multi-chunk walks
# and odd-size padding.
# ---------------------------------------------------------------------------
def build_webp_vp8l(width: int, height: int, extra: bytes) -> bytes:
    """RIFF/WEBP container: a 5-byte VP8L header chunk (dimensions
    only) followed by a META chunk carrying ``extra`` (odd sizes get
    the spec pad byte)."""
    vp8l = _vp8l_pack(width, height)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + len(body).to_bytes(4, "little") + body + pad

    body = b"WEBP" + chunk(b"VP8L", vp8l) + chunk(b"META", extra)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def walk_riff_webp(data: bytes) -> dict:
    """Walk a RIFF/WEBP container and decode the VP8L dimensions.
    Returns {riff_size, n_chunks, width, height, meta_bytes}. Strict
    on magic, chunk bounds, padding, and the VP8L signature."""
    if len(data) < 12 or data[:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    riff_size = int.from_bytes(data[4:8], "little")
    if 8 + riff_size != len(data):
        raise ValueError("RIFF size != file size")
    if data[8:12] != b"WEBP":
        raise ValueError("not a WEBP form")
    pos = 12
    n_chunks = 0
    width = height = meta_bytes = None
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated RIFF chunk header")
        fourcc = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("RIFF chunk overruns file")
        if fourcc == b"VP8L":
            hdr = _vp8l_unpack(body)
            width, height = hdr["width"], hdr["height"]
        elif fourcc == b"META":
            meta_bytes = size
        n_chunks += 1
        pos += 8 + size
        if size % 2:
            if pos >= len(data) or data[pos] != 0:
                raise ValueError("missing RIFF pad byte")
            pos += 1
    if width is None:
        raise ValueError("no VP8L chunk")
    if meta_bytes is None:
        raise ValueError("no META chunk")
    return {
        "riff_size": riff_size,
        "n_chunks": n_chunks,
        "width": width,
        "height": height,
        "meta_bytes": meta_bytes,
    }


# ---------------------------------------------------------------------------
# Parquet DataPageV2 + DELTA decode (mm_parquet_datapage_v2): extends
# the v1 decoder above with the modern write path — DataPageHeaderV2
# (levels OUTSIDE the values section), DELTA_BINARY_PACKED int64
# (Encodings.md: uleb128 block geometry, zigzag first value, per-block
# zigzag min-delta + per-miniblock bit widths, LSB bit-packing) and
# DELTA_LENGTH_BYTE_ARRAY strings (a DELTA_BINARY_PACKED length column
# followed by the concatenated bytes). Same strictness discipline as
# every decoder here: geometry, bounds, and cross-checks all raise.
# ---------------------------------------------------------------------------
# Hard ceiling on values any single parquet page may claim. The page
# header's num_values and the delta run's own total are BOTH attacker
# bytes in a crafted file, so capping one with the other is circular —
# this constant is the non-derived bound (4M values/page is ~3 orders
# above the 512-byte-page spools this repo decodes, while bounding the
# worst-case Python list at tens of MB, not the 2^40 a forged header
# can demand with zero-bit-width miniblocks).
_MAX_PQ_PAGE_VALUES = 1 << 22


def _delta_binary_packed(buf: bytes, pos: int, max_values: int | None = None):
    """Decode one DELTA_BINARY_PACKED run from ``buf[pos:]``; returns
    (values, end_pos). The total count is in the run's own header —
    and a bit-width-0 miniblock consumes NO input bytes while still
    yielding values, so a crafted header could otherwise demand 2^40
    values from a 20-byte stream (the inflate/lz4 bomb class);
    ``max_values`` caps what the header may claim (callers know the
    page's num_values)."""
    tc = _ThriftCompact(buf, pos)
    block_size = tc.uvarint()
    n_mini = tc.uvarint()
    total = tc.uvarint()
    first = tc.zigzag()
    pos = tc.pos
    if total > _MAX_PQ_PAGE_VALUES or (
        max_values is not None and total > max_values
    ):
        raise ValueError(
            "delta run claims more values than the page holds"
            " (decompression bomb?)"
        )
    if n_mini == 0 or block_size % n_mini:
        raise ValueError("bad delta-binary-packed geometry")
    mb = block_size // n_mini
    if mb % 8:
        raise ValueError("miniblock size not a multiple of 8")
    if total == 0:
        return [], pos
    vals = [first]
    while len(vals) < total:
        tc = _ThriftCompact(buf, pos)
        min_delta = tc.zigzag()
        pos = tc.pos
        if pos + n_mini > len(buf):
            raise ValueError("delta bit-width bytes overrun page")
        bws = buf[pos : pos + n_mini]
        pos += n_mini
        for bw in bws:
            if len(vals) >= total:
                # unneeded trailing miniblocks carry bw=0 and no data;
                # validate a forged nonzero bw like the consumed path
                # so the error names the bit width, not a misleading
                # downstream overrun
                if bw > 64:
                    raise ValueError("delta bit width > 64")
                if bw:
                    pos += mb * bw // 8
                continue
            if bw > 64:
                raise ValueError("delta bit width > 64")
            take = min(mb, total - len(vals))
            nbytes = mb * bw // 8
            if pos + nbytes > len(buf):
                raise ValueError("delta miniblock overruns page")
            bits = int.from_bytes(buf[pos : pos + nbytes], "little")
            mask = (1 << bw) - 1
            prev = vals[-1]
            for i in range(take):
                prev += min_delta + ((bits >> (i * bw)) & mask)
                vals.append(prev)
            pos += nbytes
    return vals, pos


def _delta_length_byte_array(
    buf: bytes, pos: int, end: int, max_values: int | None = None
):
    """Decode one DELTA_LENGTH_BYTE_ARRAY values section spanning
    ``buf[pos:end]``: the length run then the concatenated bytes."""
    lengths, p = _delta_binary_packed(buf, pos, max_values)
    out = []
    for ln in lengths:
        if ln < 0 or p + ln > end:
            raise ValueError("delta-length string overruns section")
        out.append(buf[p : p + ln].decode("utf-8"))
        p += ln
    if p != end:
        raise ValueError("trailing bytes after delta-length strings")
    return out


def decode_parquet_v2_delta(
    data: bytes, int_col: str, str_col: str
) -> list:
    """Hand-decode a 2-column parquet file written with DataPageV2
    pages — REQUIRED INT64 (DELTA_BINARY_PACKED) + REQUIRED
    BYTE_ARRAY (DELTA_LENGTH_BYTE_ARRAY), uncompressed — straight
    from the bytes. Returns one dict per row: {int_col, str_col,
    rg_ordinal, rg_rows}. Strict: v1 data pages, levels bytes on
    REQUIRED columns, unexpected encodings, and every cross-check
    (chunk counts vs row-group rows, totals vs footer num_rows)
    raise ValueError."""
    import struct as _struct

    if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ValueError("missing PAR1 magic")
    (flen,) = _struct.unpack("<I", data[-8:-4])
    if flen + 12 > len(data):
        raise ValueError("footer overruns file")
    meta = _pq_file_meta(_ThriftCompact(data, len(data) - 8 - flen))
    leaves = {
        el["name"]: el for el in meta["schema"] if not el["num_children"]
    }
    for name in (int_col, str_col):
        if name not in leaves:
            raise ValueError(f"column {name} not in schema")
        if leaves[name]["repetition"] != 0:  # REQUIRED
            raise ValueError(f"column {name} is not REQUIRED")

    rows: list = []
    total = 0
    for ordinal, rg in enumerate(meta["row_groups"]):
        cols: dict = {}
        for cc in rg["columns"]:
            if cc.get("codec", 0) != 0:
                raise ValueError("compressed chunk; decoder is strict")
            if cc["num_values"] != rg["num_rows"]:
                raise ValueError("chunk num_values != row-group rows")
            name = cc["path"][0]
            want = cc["num_values"]
            vals: list = []
            pos = cc["data_off"]
            while len(vals) < want:
                tc = _ThriftCompact(data, pos)
                ph = _pq_page_header(tc)
                body = tc.pos
                if ph.get("compressed") != ph.get("uncompressed"):
                    raise ValueError("page sizes differ: compressed?")
                if ph["type"] != 3 or "data2" not in ph:
                    raise ValueError(
                        f"page type {ph['type']}: not DataPageV2"
                    )
                d2 = ph["data2"]
                if d2.get("num_nulls", 0):
                    raise ValueError("nulls on a REQUIRED column")
                if d2.get("rep_len", 0) or d2.get("def_len", 0):
                    raise ValueError(
                        "level bytes on a REQUIRED column"
                    )
                n = d2["num_values"]
                if n > _MAX_PQ_PAGE_VALUES:
                    raise ValueError(
                        "page num_values beyond the per-page ceiling"
                        " (decompression bomb?)"
                    )
                enc = d2["encoding"]
                vstart = body
                vend = body + ph["compressed"]
                if vend > len(data):
                    raise ValueError("page body overruns file")
                if enc == 5 and name == int_col:
                    got, endp = _delta_binary_packed(data, vstart, n)
                    if len(got) != n:
                        raise ValueError("delta run count != page rows")
                    if endp > vend:
                        raise ValueError("delta run overruns page")
                    vals.extend(got)
                elif enc == 6 and name == str_col:
                    got_s = _delta_length_byte_array(
                        data, vstart, vend, n
                    )
                    if len(got_s) != n:
                        raise ValueError(
                            "delta-length run count != page rows"
                        )
                    vals.extend(got_s)
                else:
                    raise ValueError(
                        f"encoding {enc} for {name} unsupported"
                    )
                pos = vend
            if len(vals) != want:
                raise ValueError("page overshoot inside chunk")
            cols[name] = vals
        for iv, sv in zip(cols[int_col], cols[str_col]):
            rows.append(
                {
                    int_col: iv,
                    str_col: sv,
                    "rg_ordinal": ordinal,
                    "rg_rows": rg["num_rows"],
                }
            )
        total += rg["num_rows"]
    if total != meta["num_rows"]:
        raise ValueError("row groups don't sum to footer num_rows")
    return rows
