"""Multimodal-column operators (SURVEY.md §2.2, north star
BASELINE.json:6): joining text-derived, vector-derived and relational
columns, plus the binary-payload plumbing for image/audio/video-style
data.

The container has no image/audio codec libs, so most *decode* steps
are clearly-marked deterministic fakes behind ``mapInPandas`` — but
the Spark-side plumbing (binary column, typed metadata struct schema,
Arrow batch shape, partition-preserving narrow execution) is real and
tested (tests/test_llm_ops.py). The exception is
``multimodal_png_codec``: PNG needs only stdlib zlib+struct, so that
op pushes REAL image bytes through a REAL spec-conformant decoder
(operators/png_codec.py) and hash-checks the round trip against the
pixel-generator oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from e2e_data_pipeline_spark.catalog import load_table
from e2e_data_pipeline_spark.operators.llm_similarity import sq_norm
from e2e_data_pipeline_spark.operators.registry import register


@register(
    "multimodal_cols",
    oracle="""
    WITH joined AS (
        SELECT d.lang,
               e.label,
               len(string_split(d.text, ' ')) AS n_tok,
               d.n_chars,
               round(sqrt(list_sum(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2
        FROM documents d
        JOIN embeddings e ON e.vec_id = d.doc_id
    )
    SELECT lang,
           label,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           round(CAST(SUM(CAST(l2 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
               AS avg_l2_norm
    FROM joined
    GROUP BY lang, label
    """,
)
def multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ⋈ embeddings (doc_id = vec_id, inner — the id ranges
    diverge at sf0.1 per FIXTURES.md) combining text stats with vector
    norms per (lang, label).

    Norms are rounded per-row then DECIMAL-summed for the average —
    exact parity despite float input."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.round(F.sqrt(sq_norm(F.col("embedding"))), 6)
    joined = docs.join(emb, docs.doc_id == emb.vec_id).select(
        "lang",
        "label",
        F.size(F.split("text", " ")).alias("n_tok"),
        "n_chars",
        norm.alias("l2"),
    )
    return joined.groupBy("lang", "label").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.round(
            F.sum(F.col("l2").cast("decimal(18,6)")).cast("double") / F.count("*"), 6
        ).alias("avg_l2_norm"),
    )


# ---------------------------------------------------------------------------
# Binary-payload pipeline (decode stubbed, plumbing real)
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
    ]
)


def _decode_media_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' of binary payloads.

    REAL decode (PIL/ffmpeg) is unavailable in this container — the
    dimensions below are a deterministic fake derived from the payload
    bytes. The mapInPandas mechanics (iterator-of-batches in/out,
    schema contract, no driver involvement) are exactly what a real
    decoder would use; swap the body, keep the plumbing.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        checksum = payloads.map(
            lambda b: int.from_bytes(b[:8].ljust(8, b"\0"), "little") % (1 << 62)
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": n_bytes.astype("int32"),
                # deterministic fake "decode": dimensions from content
                "width": (checksum % 1920 + 1).astype("int32"),
                "height": (checksum % 1080 + 1).astype("int32"),
                "n_frames": (n_bytes % 300 + 1).astype("int32"),
                "checksum": checksum.astype("int64"),
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """Decode/feature-extract a binary media column via mapInPandas.

    Input contract: columns (doc_id long, media_type string,
    payload binary). Narrow op: partitioning is preserved, batches
    stream through Arrow without materializing a partition.
    """
    return df.mapInPandas(_decode_media_batches, schema=MEDIA_META_SCHEMA)


@register("multimodal_binary")  # binary plumbing demo → rows-only check
def multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary pipeline on synthesized payloads: documents'
    text encoded as binary 'media' → mapInPandas decode → metadata
    aggregation. Proves schema/Arrow/batch plumbing without codecs."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    meta = decode_media(media)
    return meta.groupBy("media_type").agg(
        F.count("*").alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("scale", T.DoubleType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def resize_media(df: DataFrame, target: int = 256) -> DataFrame:
    """Resize decoded media to fit a ``target`` bounding box,
    preserving aspect ratio.

    Stub note: with no codec in the container only the dimension
    arithmetic is real; a real implementation would transform pixel
    buffers in the same Arrow batches. Narrow op — no shuffle, one
    row in → one row out.

    Input contract: the MEDIA_META_SCHEMA columns (decode_media
    output).
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            longest = pdf[["width", "height"]].max(axis=1)
            scale = (target / longest).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": (pdf["width"] * scale).round().clip(lower=1).astype("int32"),
                    "height": (pdf["height"] * scale).round().clip(lower=1).astype("int32"),
                    "n_frames": pdf["n_frames"],
                    "checksum": pdf["checksum"],
                    "scale": scale.astype("float64"),
                }
            )

    return df.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Sample every ``every_n``-th frame of each video row — the
    one-row→many-rows expansion a video pipeline needs, done inside
    the Arrow batch (no explode of a materialized array, no shuffle).

    Frame 'content' is a deterministic function of (checksum,
    frame_idx) standing in for the absent codec; row-expansion shape,
    schema contract, and batch streaming are the real thing.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_sum = [], [], []
            for doc_id, n_frames, checksum in zip(
                pdf["doc_id"], pdf["n_frames"], pdf["checksum"]
            ):
                for idx in range(0, int(n_frames), every_n):
                    out_doc.append(doc_id)
                    out_idx.append(idx)
                    out_sum.append((int(checksum) * 31 + idx) % (1 << 62))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_checksum": pd.Series(out_sum, dtype="int64"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


@register("multimodal_pipeline")  # stubbed decode → rows-only check
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full media pipeline: synthesize binary payloads → decode →
    aspect-preserving resize → frame sampling (video only) → per-type
    stats. Three chained mapInPandas stages stay in one narrow
    whole-stage pipeline — at 100 TB each partition streams its
    batches through all three without a shuffle or a driver hop."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    )
    resized = resize_media(decode_media(media))
    frames = sample_frames(resized.where(F.col("media_type") == "video"))
    frame_stats = frames.groupBy("doc_id").agg(
        F.count("*").alias("n_sampled_frames")
    )
    return (
        resized.join(frame_stats, "doc_id", "left")
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n_media"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
            F.sum(F.coalesce("n_sampled_frames", F.lit(0))).alias("total_frames"),
        )
    )


@register(
    "multimodal_manifest",
    oracle="""
    WITH blobs AS (
        SELECT doc_id,
               md5(text) AS fingerprint,
               unhex(repeat(md5(text), 1 + CAST(doc_id % 5 AS INT))) AS payload
        FROM documents
    ),
    manifest AS (
        SELECT doc_id, fingerprint,
               CAST(concat('0x', substr(md5(concat('shard:', fingerprint)), 1, 8))
                    AS BIGINT) % 16 AS shard,
               CAST(octet_length(payload) AS BIGINT) AS n_bytes
        FROM blobs
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           min(concat('blobs/', CAST(shard AS VARCHAR), '/', fingerprint, '.bin'))
               AS first_path
    FROM manifest
    GROUP BY shard
    """,
)
def multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed blob manifest: opaque binary payloads hashed
    into a fixed shard layout with per-shard size accounting — how a
    multimodal pipeline plans its blob-store layout (images/audio
    land at ``blobs/<shard>/<fingerprint>.bin``; the table keeps only
    the pointer + metadata, never the bytes, in the hot path).

    Payloads are deterministic fake media (md5-derived bytes of
    varying length — no codecs in the container), but the binary
    column, byte-length accounting, and portable shard hash (seeded
    md5-prefix, same as agg_countmin_freq) are the real plumbing. The
    aggregate is 16 rows regardless of corpus size; at 100 TB the
    manifest write is a partitionBy(shard) sink and stays balanced
    because the shard key is a uniform hash, never a skewed natural
    key.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.col("text").cast("binary"))
    payload = F.unhex(F.repeat(fp, (F.lit(1) + F.col("doc_id") % 5).cast("int")))
    blobs = docs.select(
        "doc_id", fp.alias("fingerprint"), payload.alias("payload")
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("shard:"), F.col("fingerprint")).cast("binary")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 16
    )
    manifest = blobs.select(
        "doc_id",
        "fingerprint",
        shard.alias("shard"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    return manifest.groupBy("shard").agg(
        F.count("*").alias("n_blobs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.min(
            F.concat(
                F.lit("blobs/"),
                F.col("shard").cast("string"),
                F.lit("/"),
                F.col("fingerprint"),
                F.lit(".bin"),
            )
        ).alias("first_path"),
    )


@register(
    "multimodal_dedup_phash",
    oracle="""
    WITH ph AS (
        SELECT doc_id,
               md5(array_to_string(string_split(lower(text), ' ')[1:30], ' '))
                   AS phash
        FROM documents
    ),
    grp AS (
        SELECT phash,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
               CAST(MAX(doc_id) AS BIGINT) AS last_dup_id
        FROM ph GROUP BY phash
    )
    SELECT phash, n_copies, keeper_id, last_dup_id
    FROM grp WHERE n_copies > 1
    """,
)
def multimodal_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash dedup over binary media payloads — the
    image/audio analogue of exact text dedup: hash a CANONICALIZED
    rendering of the payload so near-variants (here: copies differing
    only in embedded numbers — timestamps, ids) collide into one
    group, pick the lowest id as keeper.

    The payload travels as a real BINARY column (utf-8 bytes round-
    tripped through encode/decode — the multimodal plumbing contract);
    the canonicalization is a deterministic stand-in for a real pHash
    (image decode libs are absent in this environment, the documented
    multimodal stub policy — a production swap drops in
    imagehash.phash over the decoded frame with the SAME grouping
    plan). Hash-groupBy is linear, the bucket join shape identical to
    dedup_exact; md5 is bit-identical across engines so the whole op
    is hash-checkable despite the binary leg.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    canonical = F.concat_ws(
        " ", F.slice(F.split(F.lower(F.decode("payload", "utf-8")), " "), 1, 30)
    )
    ph = docs.select("doc_id", F.md5(canonical).alias("phash"))
    grp = ph.groupBy("phash").agg(
        F.count("*").alias("n_copies"),
        F.min("doc_id").alias("keeper_id"),
        F.max("doc_id").alias("last_dup_id"),
    )
    return grp.where(F.col("n_copies") > 1)


@register(
    "multimodal_magic_sniff",
    oracle="""
    WITH blobs AS (
        SELECT doc_id,
               unhex(
                   CASE doc_id % 4
                     WHEN 0 THEN 'ffd8ffe0'
                     WHEN 1 THEN '89504e47'
                     WHEN 2 THEN '47494638'
                     ELSE '00000020'
                   END || md5(text)) AS payload
        FROM documents
    ),
    sniffed AS (
        SELECT doc_id, payload,
               CASE
                 WHEN upper(substr(hex(payload), 1, 6)) = 'FFD8FF'
                     THEN 'image/jpeg'
                 WHEN upper(substr(hex(payload), 1, 8)) = '89504E47'
                     THEN 'image/png'
                 WHEN upper(substr(hex(payload), 1, 6)) = '474946'
                     THEN 'image/gif'
                 ELSE 'application/octet-stream'
               END AS mime
        FROM blobs
    )
    SELECT mime,
           CAST(COUNT(*) AS BIGINT) AS n_blobs,
           CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM sniffed GROUP BY mime
    """,
)
def multimodal_magic_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type sniffing from magic bytes — trust-the-bytes, not
    the extension: classify each binary payload by its leading
    signature (JPEG FFD8FF, PNG 89504E47, GIF 474946) via hex-prefix
    comparison, entirely JVM-side (hex + substr + CASE — no codec,
    no UDF). Payloads are synthesized deterministically with REAL
    magic prefixes (the sandbox has no image libs; the sniffing
    plumbing — binary column in, typed verdict out — is the real
    contract, per multimodal_manifest). At 100 TB this is the
    first gate of any media ingest: quarantine
    application/octet-stream before wasting decode compute.
    """
    docs = load_table(spark, sf_dir, "documents")
    magic = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("ffd8ffe0"))
        .when(F.col("doc_id") % 4 == 1, F.lit("89504e47"))
        .when(F.col("doc_id") % 4 == 2, F.lit("47494638"))
        .otherwise(F.lit("00000020"))
    )
    blobs = docs.select(
        "doc_id",
        F.unhex(F.concat(magic, F.md5("text"))).alias("payload"),
    )
    hx = F.upper(F.hex("payload"))
    sniffed = blobs.select(
        "doc_id",
        "payload",
        F.when(F.substring(hx, 1, 6) == "FFD8FF", F.lit("image/jpeg"))
        .when(F.substring(hx, 1, 8) == "89504E47", F.lit("image/png"))
        .when(F.substring(hx, 1, 6) == "474946", F.lit("image/gif"))
        .otherwise(F.lit("application/octet-stream"))
        .alias("mime"),
    )
    return sniffed.groupBy("mime").agg(
        F.count("*").alias("n_blobs"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "multimodal_tile_grid",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(256 + (doc_id * 37) % 1280 AS BIGINT) AS width,
               CAST(256 + (doc_id * 53) % 720 AS BIGINT) AS height
        FROM documents WHERE doc_id < 400
    )
    SELECT doc_id, width, height,
           CAST((width + 511) // 512 AS BIGINT) AS tiles_x,
           CAST((height + 511) // 512 AS BIGINT) AS tiles_y,
           CAST(((width + 511) // 512) * ((height + 511) // 512)
                AS BIGINT) AS n_tiles,
           CAST(((width + 511) // 512) * ((height + 511) // 512) * 85
                + 170 AS BIGINT) AS est_tokens
    FROM dims
    """,
)
def multimodal_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-model tile accounting: ceil-divide each image's
    (width, height) into 512px tiles and estimate the token bill
    (85/tile + 170 base — the arithmetic every multimodal batch
    planner runs before submitting). Dimensions are synthesized
    deterministically (no image libs in-sandbox; the real pipeline
    reads them from decoded headers via the multimodal_pipeline
    plumbing). Ceil division as (w + 511) // 512 — positive
    integers, portable. Shuffle-free projection: the token budget
    for a 100 TB image corpus is one scan.
    """
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") < 400
    )
    dims = docs.select(
        "doc_id",
        (F.lit(256) + (F.col("doc_id") * 37) % 1280)
        .cast("long")
        .alias("width"),
        (F.lit(256) + (F.col("doc_id") * 53) % 720)
        .cast("long")
        .alias("height"),
    )
    tx = F.expr("(width + 511) div 512")
    ty = F.expr("(height + 511) div 512")
    return dims.select(
        "doc_id",
        "width",
        "height",
        tx.cast("long").alias("tiles_x"),
        ty.cast("long").alias("tiles_y"),
        (tx * ty).cast("long").alias("n_tiles"),
        (tx * ty * 85 + 170).cast("long").alias("est_tokens"),
    )


@register(
    "multimodal_aspect_bucket",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(256 + (doc_id * 37) % 1024 AS BIGINT) AS w,
               CAST(256 + (doc_id * 53) % 1024 AS BIGINT) AS h
        FROM documents
    ),
    bucketed AS (
        SELECT doc_id, w, h,
               CASE WHEN w * 3 >= h * 4 THEN 'landscape'
                    WHEN h * 3 >= w * 4 THEN 'portrait'
                    ELSE 'square' END AS bucket,
               CAST(w // 64 * 64 AS BIGINT) AS bw,
               CAST(h // 64 * 64 AS BIGINT) AS bh
        FROM dims
    )
    SELECT bucket, bw, bh,
           CAST(COUNT(*) AS BIGINT) AS n_images,
           CAST(SUM(w * h) AS BIGINT) AS native_px,
           CAST(SUM(bw * bh) AS BIGINT) AS batch_px,
           CAST(SUM(w * h) - SUM(bw * bh) AS BIGINT) AS crop_px
    FROM bucketed
    GROUP BY bucket, bw, bh
    ORDER BY bucket, bw, bh
    """,
)
def multimodal_aspect_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing for image-batch training (the SDXL-style
    bucketing pass): deterministic fake dimensions per blob (the
    container has no codecs — TESTDATA gives no real images — so w,h
    derive from doc_id; the bucketing plumbing is the real thing),
    orientation classes via INTEGER cross-multiplication against the
    4:3 threshold (no float ratios), and batch shapes floored to the
    /64 grid ViTs and UNets require.  The /64 floor crops rather than pads, and the
    crop-pixel accounting stays int64.

    Scale: pure projection + small-cardinality groupBy; the bucket
    key is what a 100 TB image pipeline would partitionBy for
    shape-homogeneous batches.
    """
    docs = load_table(spark, sf_dir, "documents")
    dims = docs.select(
        "doc_id",
        (256 + (F.col("doc_id") * 37) % 1024).cast("long").alias("w"),
        (256 + (F.col("doc_id") * 53) % 1024).cast("long").alias("h"),
    )
    w, h = F.col("w"), F.col("h")
    bucketed = dims.select(
        "doc_id",
        "w",
        "h",
        F.when(w * 3 >= h * 4, "landscape")
        .when(h * 3 >= w * 4, "portrait")
        .otherwise("square")
        .alias("bucket"),
        F.expr("CAST(w div 64 * 64 AS BIGINT)").alias("bw"),
        F.expr("CAST(h div 64 * 64 AS BIGINT)").alias("bh"),
    )
    return (
        bucketed.groupBy("bucket", "bw", "bh")
        .agg(
            F.count("*").alias("n_images"),
            F.sum(w * h).cast("long").alias("native_px"),
            F.sum(F.col("bw") * F.col("bh")).cast("long").alias("batch_px"),
            (F.sum(w * h) - F.sum(F.col("bw") * F.col("bh")))
            .cast("long")
            .alias("crop_px"),
        )
        .orderBy("bucket", "bw", "bh")
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH vids AS (
        SELECT doc_id,
               CAST(5 + (doc_id * 31) % 116 AS BIGINT) AS duration_s,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 30 ELSE 24 END AS BIGINT)
                   AS fps
        FROM documents WHERE doc_id % 7 = 0
    ),
    plan_ AS (
        SELECT doc_id, duration_s, fps,
               LEAST(duration_s, 32) AS n_frames,
               CASE WHEN duration_s <= 32 THEN 1
                    ELSE duration_s // 32 END AS stride_s
        FROM vids
    ),
    frames AS (
        SELECT doc_id, duration_s, fps, n_frames,
               unnest(range(0, n_frames)) AS k,
               stride_s
        FROM plan_
    )
    SELECT doc_id,
           CAST(k AS BIGINT) AS frame_no,
           CAST(k * stride_s * fps AS BIGINT) AS frame_index,
           CAST(k * stride_s AS BIGINT) AS t_offset_s,
           n_frames
    FROM frames
    WHERE k * stride_s < duration_s
    ORDER BY doc_id, frame_no
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling manifest — the planning half of a
    vision-language ingest: each (fake) video gets ≤32 uniformly
    strided sample points, exploded into one manifest row per frame
    with the exact frame index (k·stride·fps) a decoder would seek
    to.  Durations/fps are deterministic functions of doc_id (no
    codecs in this container — TESTDATA has no real video — but the
    schema, explode shape, and budget math are the real plumbing;
    the decode step itself is the Pandas-UDF stub documented in
    llm_multimodal's module docstring).  Pure integer arithmetic.

    Scale: explode fan-out is bounded at 32 rows per asset; the
    manifest is what a 100 TB video pipeline shuffles INSTEAD of
    bytes — frames are fetched by (asset, frame_index) on the
    executor that processes them.
    """
    docs = load_table(spark, sf_dir, "documents")
    vids = docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        (5 + (F.col("doc_id") * 31) % 116).cast("long").alias("duration_s"),
        F.when(F.col("doc_id") % 3 == 0, 30)
        .otherwise(24)
        .cast("long")
        .alias("fps"),
    )
    plan_ = vids.select(
        "doc_id",
        "duration_s",
        "fps",
        F.least(F.col("duration_s"), F.lit(32)).alias("n_frames"),
        F.when(F.col("duration_s") <= 32, F.lit(1))
        .otherwise(F.expr("duration_s div 32"))
        .alias("stride_s"),
    )
    frames = plan_.select(
        "doc_id",
        "duration_s",
        "fps",
        "n_frames",
        "stride_s",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("k"),
    )
    return (
        frames.where(F.col("k") * F.col("stride_s") < F.col("duration_s"))
        .select(
            "doc_id",
            F.col("k").cast("long").alias("frame_no"),
            (F.col("k") * F.col("stride_s") * F.col("fps"))
            .cast("long")
            .alias("frame_index"),
            (F.col("k") * F.col("stride_s")).cast("long").alias("t_offset_s"),
            "n_frames",
        )
        .orderBy("doc_id", "frame_no")
    )


@register(
    "multimodal_audio_frames",
    oracle="""
    WITH synth AS (
        -- deterministic fake PCM: 320 samples of 16 kHz mono s16le
        -- per source character (no audio codecs in-container; the
        -- frame accounting below is the real pipeline math)
        SELECT doc_id, n_chars * 320 AS n_samples
        FROM documents WHERE n_chars >= 1
    )
    SELECT doc_id,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(n_samples * 2 AS BIGINT) AS n_bytes,
           CAST(n_samples * 1000 AS BIGINT) // 16000 AS duration_ms,
           CASE WHEN n_samples >= 400
                THEN CAST((n_samples - 400) - (n_samples - 400) % 160
                          AS BIGINT) // 160 + 1
                ELSE 0 END AS n_frames_25ms,
           CASE WHEN n_samples >= 400
                THEN CAST(400 + (((n_samples - 400) - (n_samples - 400)
                          % 160) // 160) * 160 AS BIGINT)
                ELSE 0 END AS last_frame_end
    FROM synth
    ORDER BY doc_id
    """,
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-frame accounting for a speech-features pipeline: 25 ms
    windows at 10 ms hop over 16 kHz mono s16le PCM (400-sample
    frames, 160-sample hop — the fbank/MFCC standard). Sample counts
    are synthesized deterministically from document length (no audio
    codecs in this container — the STFT itself would be a pandas_udf
    over the binary column); the frame-count closed form
    (n−400)//160+1, byte sizing, and duration math are the real
    Spark-side plumbing a 100 TB audio corpus needs for shard
    planning and GPU batch sizing.

    Scale: shuffle-free integer projection.
    """
    docs = load_table(spark, sf_dir, "documents")
    synth = docs.where(F.col("n_chars") >= 1).select(
        "doc_id", (F.col("n_chars") * 320).alias("n_samples")
    )
    ns = F.col("n_samples")
    tail = ns - 400
    full_hops = (tail - tail % 160) / 160
    return synth.select(
        "doc_id",
        ns.cast("long").alias("n_samples"),
        (ns * 2).cast("long").alias("n_bytes"),
        ((ns * 1000 - (ns * 1000) % 16000) / 16000)
        .cast("long")
        .alias("duration_ms"),
        F.when(ns >= 400, (full_hops + 1).cast("long"))
        .otherwise(F.lit(0))
        .alias("n_frames_25ms"),
        F.when(ns >= 400, (400 + full_hops * 160).cast("long"))
        .otherwise(F.lit(0))
        .alias("last_frame_end"),
    ).orderBy("doc_id")


@register(
    "multimodal_png_codec",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(4 + doc_id % 13 AS BIGINT) AS w,
               CAST(4 + doc_id % 11 AS BIGINT) AS h
        FROM documents WHERE doc_id < 192
    ),
    expanded AS (
        SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM imgs
    ),
    pix AS (
        SELECT doc_id, w, h,
               CAST(('0x' || substr(md5('px:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT) AS v
        FROM expanded
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max,
           CAST(MIN(h) * (MIN(w) + 1) AS BIGINT) AS idat_raw_len
    FROM pix GROUP BY doc_id
    """,
)
def multimodal_png_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image bytes through a REAL decoder — the multimodal
    family's genuine codec proof (no codec libs needed: PNG is zlib +
    struct, both stdlib). Per document, a deterministic grayscale
    image (pixel p = first md5 byte of ``px:{doc_id}:{p}`` — the
    portable-hash trick, so DuckDB can regenerate the exact pixels in
    SQL) is ENCODED into a spec-conformant PNG (signature, IHDR,
    CRC-32 per chunk, zlib IDAT, scanline filter y%5 so all five PNG
    filters are exercised), then a SEPARATE stdlib decoder parses the
    chunks, verifies every CRC, inflates, and reverses the filters.
    The output rows are pixel statistics of the DECODED image; the
    oracle computes the same statistics from the generator formula
    directly — a hash match therefore proves the whole
    encode→filter→deflate→inflate→unfilter chain is lossless. Any
    codec bug (wrong Paeth predictor, off-by-one stride, bad CRC)
    breaks the hash.

    Both codec steps are Arrow-batched ``mapInPandas`` kernels over a
    ``binary`` column — the real Spark plumbing for image corpora
    (schema, batch shape, narrow partition-preserving execution). At
    100 TB the decode stage is embarrassingly parallel and
    shuffle-free; the 192-image cap here is fixture sizing, not a
    design limit (drop the WHERE and every document row carries its
    image).

    Round-trip on random images is property-tested in
    tests/test_png_codec.py (reference: operators/png_codec.py).
    """
    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 192)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            pngs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 13, 4 + i % 11
                px = bytes(
                    int(
                        hashlib.md5(f"px:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                pngs.append(encode_png_gray(px, w, h))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "png": pngs})

    imgs = docs.mapInPandas(mint, "doc_id long, png binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, png in zip(pdf["doc_id"], pdf["png"]):
                w, h, px = decode_png_gray(bytes(png))
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        sum(px),
                        min(px),
                        max(px),
                        h * (w + 1),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_sum",
                    "px_min",
                    "px_max",
                    "idat_raw_len",
                ],
            )

    return imgs.mapInPandas(
        decode,
        "doc_id long, width long, height long, px_sum long,"
        " px_min long, px_max long, idat_raw_len long",
    )


@register(
    "multimodal_png_quarantine",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(4 + doc_id % 13 AS BIGINT) AS w,
               CAST(4 + doc_id % 11 AS BIGINT) AS h,
               CASE WHEN doc_id % 7 = 3 THEN 'crc_mismatch'
                    WHEN doc_id % 7 = 5 THEN 'truncated'
                    ELSE 'ok' END AS status
        FROM documents WHERE doc_id < 192
    ),
    expanded AS (
        SELECT doc_id, w, h, status, unnest(range(0, w * h)) AS p
        FROM imgs WHERE status = 'ok'
    ),
    stats AS (
        SELECT doc_id,
               CAST(SUM(CAST(('0x' || substr(md5('pq:'
                    || CAST(doc_id AS VARCHAR) || ':'
                    || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT))
                    AS BIGINT) AS px_sum
        FROM expanded GROUP BY doc_id
    )
    SELECT i.doc_id, i.status,
           CASE WHEN i.status = 'ok' THEN i.w END AS width,
           CASE WHEN i.status = 'ok' THEN i.h END AS height,
           s.px_sum
    FROM imgs i LEFT JOIN stats s ON s.doc_id = i.doc_id
    """,
)
def multimodal_png_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload quarantine — scan_csv_quarantine's posture for
    IMAGE feeds: a corrupted blob must be classified and set aside,
    never crash the decode stage or silently pass. The fixture mints
    real PNGs, then deterministically damages two classes (doc_id%7==3:
    one IDAT payload byte XOR-flipped — caught by the decoder's
    per-chunk CRC-32 check; doc_id%7==5: the file truncated to half —
    caught as a short chunk read). The decode kernel catches and
    classifies instead of failing the task, because at 100 TB a feed
    WILL contain torn uploads and bit rot, and one bad blob must not
    kill a 10-hour job. Good images emit their decoded pixel stats;
    quarantined rows carry NULL stats + the reject reason.

    The oracle predicts the classification from the corruption
    schedule and the stats from the pixel-generator formula — a hash
    match proves the decoder rejects EXACTLY the damaged blobs, with
    the right reason, and decodes everything else losslessly (a
    too-lax decoder passes a flipped byte; a too-strict one rejects a
    good image; both break the hash). Classification determinism for
    every id is unit-pinned in tests/test_png_codec.py.
    """
    import struct as _struct
    import zlib as _zlib

    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 192)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            pngs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 13, 4 + i % 11
                px = bytes(
                    int(
                        hashlib.md5(f"pq:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                png = encode_png_gray(px, w, h)
                if i % 7 == 3:  # bit rot inside the IDAT payload
                    b = bytearray(png)
                    b[len(png) // 2] ^= 0xFF
                    png = bytes(b)
                elif i % 7 == 5:  # torn upload
                    png = png[: len(png) // 2]
                pngs.append(png)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "png": pngs})

    imgs = docs.mapInPandas(mint, "doc_id long, png binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, png in zip(pdf["doc_id"], pdf["png"]):
                try:
                    w, h, px = decode_png_gray(bytes(png))
                    rows.append((int(doc_id), "ok", w, h, sum(px)))
                except ValueError as e:
                    reason = (
                        "crc_mismatch" if "CRC" in str(e) else "truncated"
                    )
                    rows.append((int(doc_id), reason, None, None, None))
                except (_struct.error, _zlib.error, IndexError):
                    # short read / corrupt deflate stream ONLY — a
                    # broad Exception here would reclassify real codec
                    # bugs (TypeError etc.) as 'truncated' data
                    rows.append((int(doc_id), "truncated", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "status", "width", "height", "px_sum"],
            )

    return imgs.mapInPandas(
        decode,
        "doc_id long, status string, width long, height long, px_sum long",
    )


@register(
    "multimodal_png_phash",
    oracle="""
    WITH base AS (
        SELECT doc_id FROM documents WHERE doc_id < 256
    ),
    pix AS (
        SELECT b.doc_id,
               p.p,
               CASE WHEN b.doc_id < 128
                    THEN CAST(('0x' || substr(md5('ah:'
                         || CAST(b.doc_id AS VARCHAR) || ':'
                         || CAST(p.p AS VARCHAR)), 1, 2)) AS BIGINT)
                    ELSE LEAST(255,
                         CAST(('0x' || substr(md5('ah:'
                         || CAST(b.doc_id - 128 AS VARCHAR) || ':'
                         || CAST(p.p AS VARCHAR)), 1, 2)) AS BIGINT) + 3)
               END AS v
        FROM base b, (SELECT unnest(range(0, 64)) AS p) p
    ),
    sums AS (
        SELECT doc_id, CAST(SUM(v) AS BIGINT) AS s FROM pix GROUP BY doc_id
    ),
    bits AS (
        SELECT p.doc_id, p.p,
               CASE WHEN 64 * p.v > s.s THEN 1 ELSE 0 END AS b
        FROM pix p JOIN sums s ON s.doc_id = p.doc_id
    ),
    hashes AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN p < 32
                    THEN b * (CAST(1 AS BIGINT) << (31 - p))
                    ELSE 0 END) AS BIGINT) AS hi,
               CAST(SUM(CASE WHEN p >= 32
                    THEN b * (CAST(1 AS BIGINT) << (63 - p))
                    ELSE 0 END) AS BIGINT) AS lo
        FROM bits GROUP BY doc_id
    ),
    keyed AS (
        SELECT doc_id,
               upper(lpad(hex(hi), 8, '0'))
                   || upper(lpad(hex(lo), 8, '0')) AS ahash
        FROM hashes
    )
    SELECT ahash,
           CAST(COUNT(*) AS BIGINT) AS n_imgs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM keyed GROUP BY ahash
    """,
)
def multimodal_png_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL perceptual-hash dedup over DECODED pixels — the image
    near-dup detector every multimodal training corpus needs, now fed
    by the genuine PNG decoder instead of a hash stand-in
    (multimodal_dedup_phash's documented limitation). 256 images: 128
    bases (8×8 gray, md5-formula pixels) and 128 brightness-shifted
    variants (+3, clipped at 255 — a re-encode/levels-tweak
    lookalike). Each is encoded to real PNG bytes, decoded back, and
    aHashed: bit p = pixel > image mean, computed as the integer
    cross-multiply ``64·px > Σpx`` so there is NO division anywhere —
    bit-exact on both engines. An unclipped brightness shift provably
    preserves every bit (64(px+3) > S+192 ⟺ 64px > S), so base and
    variant collide into one cluster UNLESS a pixel ≥253 clips — the
    oracle replays the same LEAST(255, v+3), so even the near-misses
    hash-check exactly.

    Scale: decode + aHash is a narrow Arrow-batched pass; the
    near-dup join is an equi-join on the 64-bit hash (band the hash
    for Hamming-tolerant matching — dedup_simhash's construction —
    when exact-collision recall is not enough).
    """
    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 256)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            pngs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                base = i - 128 if i >= 128 else i
                px = [
                    int(
                        hashlib.md5(f"ah:{base}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(64)
                ]
                if i >= 128:
                    px = [min(255, v + 3) for v in px]
                pngs.append(encode_png_gray(bytes(px), 8, 8))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "png": pngs})

    imgs = docs.mapInPandas(mint, "doc_id long, png binary")

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, png in zip(pdf["doc_id"], pdf["png"]):
                w, h, px = decode_png_gray(bytes(png))
                s = sum(px)
                bits = 0
                for p in range(64):
                    if 64 * px[p] > s:
                        bits |= 1 << (63 - p)
                rows.append((int(doc_id), f"{bits:016X}"))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    hashed = imgs.mapInPandas(ahash, "doc_id long, ahash string")
    return hashed.groupBy("ahash").agg(
        F.count("*").cast("long").alias("n_imgs"),
        F.min("doc_id").cast("long").alias("min_doc"),
        F.max("doc_id").cast("long").alias("max_doc"),
    )


@register(
    "multimodal_gif_codec",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(4 + doc_id % 12 AS BIGINT) AS w,
               CAST(4 + doc_id % 9 AS BIGINT) AS h
        FROM documents WHERE doc_id < 192
    ),
    expanded AS (
        SELECT doc_id, w, h, unnest(range(0, w * h)) AS p FROM imgs
    ),
    pix AS (
        SELECT doc_id, w, h,
               CAST(('0x' || substr(md5('gx:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT) AS v
        FROM expanded
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(MIN(v) AS BIGINT) AS px_min,
           CAST(MAX(v) AS BIGINT) AS px_max,
           CAST(COUNT(*) AS BIGINT) AS n_pixels
    FROM pix GROUP BY doc_id
    """,
)
def multimodal_gif_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal family's SECOND real codec (VERDICT r6 item 5):
    GIF87a with a genuine hand-rolled LZW on both paths — variable
    9→12-bit codes, LSB-first packing, CLEAR/EOI, dictionary reset at
    4096, 255-byte sub-block framing, 256-gray global palette
    (operators/gif_codec.py, stdlib struct only). Per document, the
    deterministic grayscale image (pixel p = first md5 byte of
    ``gx:{doc_id}:{p}`` — regenerable in SQL on both engines) is
    ENCODED into a spec-conformant GIF, then a SEPARATE decoder
    parses the screen descriptor, palette, image descriptor and the
    full LZW stream back to pixels. Output rows are statistics of the
    DECODED image; the oracle computes the same statistics from the
    generator formula, so a hash match proves the whole LZW
    encode→pack→unpack→decode chain is lossless (a wrong code-width
    growth step, a missed cScSc case, or a bad reset breaks it).

    Both codec steps are Arrow-batched ``mapInPandas`` kernels over a
    ``binary`` column — identical plumbing to multimodal_png_codec,
    shuffle-free and embarrassingly parallel at 100 TB (the 192-image
    cap is fixture sizing). Round-trip (incl. dict-reset-sized
    images) and PNG↔GIF cross-codec agreement are property-tested in
    tests/test_gif_codec.py.
    """
    from e2e_data_pipeline_spark.operators.gif_codec import (
        decode_gif_gray,
        encode_gif_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 192)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            gifs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 12, 4 + i % 9
                px = bytes(
                    int(
                        hashlib.md5(f"gx:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                gifs.append(encode_gif_gray(px, w, h))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "gif": gifs})

    imgs = docs.mapInPandas(mint, "doc_id long, gif binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, gif in zip(pdf["doc_id"], pdf["gif"]):
                w, h, px = decode_gif_gray(bytes(gif))
                rows.append(
                    (int(doc_id), w, h, sum(px), min(px), max(px), w * h)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_sum",
                    "px_min",
                    "px_max",
                    "n_pixels",
                ],
            )

    return imgs.mapInPandas(
        decode,
        "doc_id long, width long, height long, px_sum long,"
        " px_min long, px_max long, n_pixels long",
    )


@register(
    "multimodal_gif_quarantine",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(4 + doc_id % 12 AS BIGINT) AS w,
               CAST(4 + doc_id % 9 AS BIGINT) AS h,
               CASE WHEN doc_id % 7 = 3 THEN 'not_gray'
                    WHEN doc_id % 7 = 5 THEN 'truncated'
                    ELSE 'ok' END AS status
        FROM documents WHERE doc_id < 192
    ),
    expanded AS (
        SELECT doc_id, w, h, status, unnest(range(0, w * h)) AS p
        FROM imgs WHERE status = 'ok'
    ),
    stats AS (
        SELECT doc_id,
               CAST(SUM(CAST(('0x' || substr(md5('gq:'
                    || CAST(doc_id AS VARCHAR) || ':'
                    || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT))
                    AS BIGINT) AS px_sum
        FROM expanded GROUP BY doc_id
    )
    SELECT i.doc_id, i.status,
           CASE WHEN i.status = 'ok' THEN i.w END AS width,
           CASE WHEN i.status = 'ok' THEN i.h END AS height,
           s.px_sum
    FROM imgs i LEFT JOIN stats s ON s.doc_id = i.doc_id
    """,
)
def multimodal_gif_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimodal_png_quarantine's posture for the GIF decoder — with
    a format-specific twist: GIF carries NO integrity check (no CRC),
    so a flipped payload byte can decode to silently-wrong pixels.
    The corruption schedule therefore uses damage GIF *can* detect
    deterministically: a non-gray palette entry (doc_id%7==3 — a
    palette byte is overwritten, the gray-palette contract check
    rejects it) and a torn upload (doc_id%7==5 — the byte stream is
    cut mid-sub-block). The oracle predicts both the classification
    and the decoded stats of the clean images; determinism of every
    id's classification is unit-pinned in tests/test_gif_codec.py.

    Scale: same shuffle-free Arrow-batched decode pass as the codec
    key; quarantined rows carry NULL stats + the reject reason so one
    bad blob never kills a 10-hour job.
    """
    import struct as _struct
    import zlib as _zlib

    from e2e_data_pipeline_spark.operators.gif_codec import (
        decode_gif_gray,
        encode_gif_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 192)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            gifs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 12, 4 + i % 9
                px = bytes(
                    int(
                        hashlib.md5(f"gq:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                gif = encode_gif_gray(px, w, h)
                if i % 7 == 3:  # corrupt one palette entry's G channel
                    b = bytearray(gif)
                    b[13 + 3 * 7 + 1] ^= 0xFF
                    gif = bytes(b)
                elif i % 7 == 5:  # torn upload
                    gif = gif[: len(gif) // 2]
                gifs.append(gif)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "gif": gifs})

    imgs = docs.mapInPandas(mint, "doc_id long, gif binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, gif in zip(pdf["doc_id"], pdf["gif"]):
                try:
                    w, h, px = decode_gif_gray(bytes(gif))
                    rows.append((int(doc_id), "ok", w, h, sum(px)))
                except ValueError as e:
                    reason = (
                        "not_gray"
                        if "not grayscale" in str(e)
                        else "truncated"
                    )
                    rows.append((int(doc_id), reason, None, None, None))
                except (_struct.error, _zlib.error, IndexError):
                    rows.append((int(doc_id), "truncated", None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "status", "width", "height", "px_sum"],
            )

    return imgs.mapInPandas(
        decode,
        "doc_id long, status string, width long, height long, px_sum long",
    )


@register(
    "multimodal_wav_codec",
    oracle="""
    WITH auds AS (
        SELECT doc_id,
               CAST(200 + (doc_id % 11) * 37 AS BIGINT) AS n,
               CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                    ELSE 44100 END AS BIGINT) AS rate
        FROM documents WHERE doc_id < 192
    ),
    expanded AS (
        SELECT doc_id, n, rate, unnest(range(0, n)) AS p FROM auds
    ),
    smp AS (
        SELECT doc_id, n, rate,
               CAST(('0x' || substr(md5('au:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(p AS VARCHAR)), 1, 4)) AS BIGINT)
                    - 32768 AS s
        FROM expanded
    )
    SELECT doc_id,
           CAST(MIN(rate) AS BIGINT) AS sample_rate,
           CAST(MIN(n) AS BIGINT) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS s_sum,
           CAST(MIN(s) AS BIGINT) AS s_min,
           CAST(MAX(s) AS BIGINT) AS s_max,
           CAST(SUM(s * s) AS BIGINT) AS energy,
           CAST(MIN(n) * 1000000 // MIN(rate) AS BIGINT) AS duration_us
    FROM smp GROUP BY doc_id
    """,
)
def multimodal_wav_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio bytes through a REAL RIFF decoder — the WAV twin of
    ``multimodal_png_codec`` (VERDICT r7 item 3: audio was the one
    mandated modality without a genuine codec). Per document a
    deterministic 16-bit mono PCM clip is minted (sample p = first
    two md5 bytes of ``au:{doc_id}:{p}`` minus 32768 — the portable-
    hash trick, so DuckDB regenerates the exact waveform in SQL) at a
    per-doc sample rate (8/16/44.1 kHz), ENCODED through the stdlib
    ``wave`` writer, then a SEPARATE hand-rolled RIFF chunk walker
    (operators/wav_codec.py) validates the signature, alignment and
    fmt fields and slices the PCM back out. Output rows are statistics
    of the DECODED samples plus header-derived fields; the oracle
    computes the same from the generator formula — a hash match proves
    the whole encode→container→parse→decode chain is lossless AND the
    header survived (wrong byte order, stride, or rate breaks it).

    Both steps are Arrow-batched ``mapInPandas`` kernels over a
    ``binary`` column — shuffle-free, embarrassingly parallel at
    100 TB; the 192-clip cap is fixture sizing, not a design limit.

    Round-trip on random PCM (and chunk-walking past LIST metadata) is
    property-tested in tests/test_wav_codec.py.
    """
    from e2e_data_pipeline_spark.operators.wav_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 192)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            wavs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 200 + (i % 11) * 37
                rate = (8000, 16000, 44100)[i % 3]
                samples = [
                    int(
                        hashlib.md5(f"au:{i}:{p}".encode()).hexdigest()[:4],
                        16,
                    )
                    - 32768
                    for p in range(n)
                ]
                wavs.append(encode_wav_pcm16(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": wavs})

    clips = docs.mapInPandas(mint, "doc_id long, wav binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, wav in zip(pdf["doc_id"], pdf["wav"]):
                rate, s = decode_wav_pcm16(bytes(wav))
                rows.append(
                    (
                        int(doc_id),
                        rate,
                        len(s),
                        sum(s),
                        min(s),
                        max(s),
                        sum(v * v for v in s),
                        len(s) * 1000000 // rate,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "s_sum",
                    "s_min",
                    "s_max",
                    "energy",
                    "duration_us",
                ],
            )

    return clips.mapInPandas(
        decode,
        "doc_id long, sample_rate long, n_samples long, s_sum long,"
        " s_min long, s_max long, energy long, duration_us long",
    )


@register(
    "multimodal_wav_frames",
    oracle="""
    WITH auds AS (
        SELECT doc_id,
               CAST(200 + (doc_id % 11) * 37 AS BIGINT) AS n
        FROM documents WHERE doc_id < 192
    ),
    expanded AS (
        SELECT doc_id, n, unnest(range(0, n)) AS p FROM auds
    ),
    smp AS (
        SELECT doc_id, p // 50 AS frame,
               CAST(('0x' || substr(md5('au:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(p AS VARCHAR)), 1, 4)) AS BIGINT)
                    - 32768 AS s
        FROM expanded
    ),
    frames AS (
        SELECT doc_id, CAST(frame AS BIGINT) AS frame,
               CAST(SUM(abs(s)) AS BIGINT) AS fe
        FROM smp GROUP BY doc_id, frame
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(MIN(STRUCT_PACK(a := -fe, b := frame)).b AS BIGINT)
               AS peak_frame,
           CAST(MAX(fe) AS BIGINT) AS peak_energy,
           CAST(SUM(fe) AS BIGINT) AS total_energy
    FROM frames GROUP BY doc_id
    """,
)
def multimodal_wav_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level analysis over genuinely DECODED audio — the
    voice-activity / loudest-segment primitive of a training-data
    audio pipeline. The minted clips of ``multimodal_wav_codec`` are
    decoded by the independent RIFF parser, split into 50-sample
    frames, and reduced to per-clip frame accounting: frame count,
    the peak-|amplitude| frame (lowest index wins ties — the portable
    struct-argmin, Spark ``F.min(F.struct(-energy, frame))`` ≡ DuckDB
    ``MIN(STRUCT_PACK(...))``), its energy, and total energy. The
    oracle regenerates every sample from the hash formula and
    replays the same frame math in SQL — hash-exact, so a stride or
    off-by-one in the frame slicing breaks it.

    Framing happens INSIDE the decode kernel (no explode of samples
    into rows): at 100 TB the per-clip sample vectors stay in Arrow
    batches and only the O(clips) frame summary crosses the engine.
    """
    from e2e_data_pipeline_spark.operators.wav_codec import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 192)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            wavs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 200 + (i % 11) * 37
                rate = (8000, 16000, 44100)[i % 3]
                samples = [
                    int(
                        hashlib.md5(f"au:{i}:{p}".encode()).hexdigest()[:4],
                        16,
                    )
                    - 32768
                    for p in range(n)
                ]
                wavs.append(encode_wav_pcm16(samples, rate))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "wav": wavs})

    clips = docs.mapInPandas(mint, "doc_id long, wav binary")

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, wav in zip(pdf["doc_id"], pdf["wav"]):
                _rate, s = decode_wav_pcm16(bytes(wav))
                fe = [
                    sum(abs(v) for v in s[f : f + 50])
                    for f in range(0, len(s), 50)
                ]
                peak = min(range(len(fe)), key=lambda j: (-fe[j], j))
                rows.append(
                    (int(doc_id), len(fe), peak, fe[peak], sum(fe))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "peak_frame",
                    "peak_energy",
                    "total_energy",
                ],
            )

    return clips.mapInPandas(
        frames,
        "doc_id long, n_frames long, peak_frame long, peak_energy long,"
        " total_energy long",
    )


def walk_video_container(data: bytes) -> tuple:
    """VID0 container walk used by multimodal_video_codec's decode
    kernel: validates magic, per-frame length prefixes and exact
    container length, decodes every stride-2-sampled frame through the
    real PNG decoder. Module-level so the corruption negative pin
    (tests/test_video_codec.py) can seed faults against the SAME code
    the operator runs. Returns (n_frames, n_sampled, w, h, px_sum)."""
    import struct as _struct

    from e2e_data_pipeline_spark.operators.png_codec import decode_png_gray

    if data[:4] != b"VID0":
        raise ValueError("bad container magic")
    (nf,) = _struct.unpack_from(">I", data, 4)
    pos = 8
    w = h = None
    n_sampled = 0
    px_sum = 0
    for f in range(nf):
        (ln,) = _struct.unpack_from(">I", data, pos)
        frame = data[pos + 4 : pos + 4 + ln]
        if len(frame) != ln:
            raise ValueError("truncated frame")
        pos += 4 + ln
        if f % 2 == 0:  # stride-2 frame sampling
            fw, fh, px = decode_png_gray(frame)
            w, h = fw, fh
            n_sampled += 1
            px_sum += sum(px)
    if pos != len(data):
        raise ValueError("trailing bytes in container")
    return nf, n_sampled, w, h, px_sum


@register(
    "multimodal_video_codec",
    oracle="""
    WITH vids AS (
        SELECT doc_id,
               CAST(2 + doc_id % 4 AS BIGINT) AS nf,
               CAST(4 + doc_id % 9 AS BIGINT) AS w,
               CAST(4 + doc_id % 7 AS BIGINT) AS h
        FROM documents WHERE doc_id < 144
    ),
    sampled AS (
        SELECT doc_id, nf, w, h, unnest(range(0, nf)) AS f FROM vids
    ),
    keep AS (SELECT * FROM sampled WHERE f % 2 = 0),
    px AS (
        SELECT doc_id, nf, w, h, f, unnest(range(0, w * h)) AS p
        FROM keep
    ),
    vals AS (
        SELECT doc_id, nf, w, h, f,
               CAST(('0x' || substr(md5('vf:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(f AS VARCHAR)
                    || ':' || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT) AS v
        FROM px
    )
    SELECT doc_id,
           CAST(MIN(nf) AS BIGINT) AS n_frames,
           CAST(COUNT(DISTINCT f) AS BIGINT) AS n_sampled,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(SUM(v) AS BIGINT) AS sampled_px_sum,
           CAST(MIN(nf) * MIN(h) * (MIN(w) + 1) AS BIGINT)
               AS total_raw_bytes
    FROM vals GROUP BY doc_id
    """,
)
def multimodal_video_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO through a real decode chain — the third modality made
    concrete: per document a short CLIP is minted as a length-prefixed
    multi-frame container (magic 'VID0', u32 frame count, u32-length-
    prefixed spec-conformant PNG per frame — pixel p of frame f from
    the md5 generator formula, so SQL can regenerate every sampled
    pixel), then decoded by walking the container INDEPENDENTLY
    (magic/bounds validation) and pushing every KEPT frame (stride-2
    sampling — the standard training-data frame-sampling step,
    applied inside the decode kernel) through the real PNG decoder.
    Output rows are per-clip frame accounting + sampled-pixel stats;
    a hash match proves container framing, per-frame codec round trip
    AND the sampling pattern all at once (an off-by-one in the frame
    index or a wrong stride shifts sampled_px_sum).

    Scale: clips stay inside Arrow batches end to end (no frame
    explode); decode+sample is shuffle-free and embarrassingly
    parallel — the 144-clip cap is fixture sizing.
    """
    import struct as _struct

    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 144)
    )

    def mint(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            blobs = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                nf, w, h = 2 + i % 4, 4 + i % 9, 4 + i % 7
                parts = [b"VID0", _struct.pack(">I", nf)]
                for f in range(nf):
                    px = bytes(
                        int(
                            hashlib.md5(
                                f"vf:{i}:{f}:{p}".encode()
                            ).hexdigest()[:2],
                            16,
                        )
                        for p in range(w * h)
                    )
                    png = encode_png_gray(px, w, h)
                    parts.append(_struct.pack(">I", len(png)))
                    parts.append(png)
                blobs.append(b"".join(parts))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "clip": blobs})

    clips = docs.mapInPandas(mint, "doc_id long, clip binary")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["clip"]):
                nf, n_sampled, w, h, px_sum = walk_video_container(
                    bytes(blob)
                )
                rows.append(
                    (
                        int(doc_id),
                        nf,
                        n_sampled,
                        w,
                        h,
                        px_sum,
                        nf * h * (w + 1),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_sampled",
                    "width",
                    "height",
                    "sampled_px_sum",
                    "total_raw_bytes",
                ],
            )

    return clips.mapInPandas(
        decode,
        "doc_id long, n_frames long, n_sampled long, width long,"
        " height long, sampled_px_sum long, total_raw_bytes long",
    )


def resize_gray_nn(px: bytes, w: int, h: int, rw: int, rh: int) -> bytes:
    """Nearest-neighbor grayscale resample (floor index map sx =
    dx*w // rw, sy = dy*h // rh) — the standard training-data
    thumbnail step, module-level so tests can fault/replay it against
    the SAME kernel multimodal_png_resize ships to workers."""
    return bytes(
        px[(dy * h // rh) * w + (dx * w // rw)]
        for dy in range(rh)
        for dx in range(rw)
    )


@register(
    "multimodal_png_resize",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(4 + doc_id % 9 AS BIGINT) AS w,
               CAST(4 + doc_id % 7 AS BIGINT) AS h,
               CAST(3 + doc_id % 4 AS BIGINT) AS rw,
               CAST(3 + doc_id % 3 AS BIGINT) AS rh
        FROM documents WHERE doc_id < 160
    ),
    expanded AS (
        SELECT doc_id, w, h, rw, rh, unnest(range(0, rw * rh)) AS q
        FROM imgs
    ),
    mapped AS (
        SELECT doc_id, w, h, rw, rh, q,
               ((q // rw) * h // rh) * w + ((q % rw) * w // rw) AS src
        FROM expanded
    ),
    pix AS (
        SELECT doc_id, w, h, rw, rh, q,
               CAST(('0x' || substr(md5('rz:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(src AS VARCHAR)), 1, 2)) AS BIGINT) AS v
        FROM mapped
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS src_w,
           CAST(MIN(h) AS BIGINT) AS src_h,
           CAST(MIN(rw) AS BIGINT) AS dst_w,
           CAST(MIN(rh) AS BIGINT) AS dst_h,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(SUM(v * (q + 1)) AS BIGINT) AS px_wsum,
           CAST(MIN(CASE WHEN q = 0 THEN v END) AS BIGINT) AS px_tl,
           CAST(MIN(CASE WHEN q = rw * rh - 1 THEN v END) AS BIGINT)
               AS px_br
    FROM pix GROUP BY doc_id
    """,
)
def multimodal_png_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level image resize through the REAL codec — the
    training-data thumbnail step made concrete (the pipeline stub
    `resize_media` only rescales dimensions; this op decodes actual
    PNG bytes and resamples actual pixels). Per document a grayscale
    PNG is minted from the md5 generator formula, round-tripped
    through encode/decode, then NEAREST-NEIGHBOR resampled with the
    exact floor index map sx = dx·w div rw (the map SQL can replay,
    so the oracle regenerates every RESIZED pixel directly from the
    formula). The position-weighted checksum px_wsum pins the output
    ORDER (a transposed or flipped resample matches px_sum but never
    the weighted sum); corner pixels pin the index map's ends.

    Scale: mint→decode→resize streams inside one Arrow batch per
    partition — no shuffle until the final per-doc aggregate, and
    that aggregate is the mapInPandas output itself (one row per
    image). The 160-doc cap is fixture sizing only.
    """
    import hashlib

    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 160)
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 9, 4 + i % 7
                rw, rh = 3 + i % 4, 3 + i % 3
                px = bytes(
                    int(
                        hashlib.md5(f"rz:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                # real encode -> real decode -> real pixel resample
                dw, dh, decoded = decode_png_gray(encode_png_gray(px, w, h))
                assert (dw, dh) == (w, h)
                rz = resize_gray_nn(decoded, w, h, rw, rh)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        rw,
                        rh,
                        sum(rz),
                        sum(v * (q + 1) for q, v in enumerate(rz)),
                        rz[0],
                        rz[-1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_w",
                    "src_h",
                    "dst_w",
                    "dst_h",
                    "px_sum",
                    "px_wsum",
                    "px_tl",
                    "px_br",
                ],
            )

    return docs.mapInPandas(
        work,
        "doc_id long, src_w long, src_h long, dst_w long, dst_h long,"
        " px_sum long, px_wsum long, px_tl long, px_br long",
    )


def sobel_g2_interior(px: bytes, w: int, h: int) -> list:
    """Sobel gradient-magnitude² at every interior pixel (3×3 Gx/Gy
    integer kernels) — module-level so the replay/fault tests hit the
    SAME kernel multimodal_sobel_edges ships to workers. Returns g2
    values in row-major interior order."""
    out = []
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            def v(dx, dy):
                return px[(y + dy) * w + (x + dx)]

            gx = (
                v(1, -1) + 2 * v(1, 0) + v(1, 1)
                - v(-1, -1) - 2 * v(-1, 0) - v(-1, 1)
            )
            gy = (
                v(-1, 1) + 2 * v(0, 1) + v(1, 1)
                - v(-1, -1) - 2 * v(0, -1) - v(1, -1)
            )
            out.append(gx * gx + gy * gy)
    return out


@register(
    "multimodal_sobel_edges",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(5 + doc_id % 8 AS BIGINT) AS w,
               CAST(5 + doc_id % 6 AS BIGINT) AS h
        FROM documents WHERE doc_id < 144
    ),
    interior AS (
        SELECT doc_id, w, h, unnest(range(0, (w - 2) * (h - 2))) AS q
        FROM imgs
    ),
    coords AS (
        SELECT doc_id, w, h, q,
               1 + q % (w - 2) AS x,
               1 + q // (w - 2) AS y
        FROM interior
    ),
    grad AS (
        SELECT doc_id, w, h, q,
               ((CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y-1)*w + x+1 AS VARCHAR)), 1, 2)) AS BIGINT))
                + 2 * (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST(y*w + x+1 AS VARCHAR)), 1, 2)) AS BIGINT))
                + (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y+1)*w + x+1 AS VARCHAR)), 1, 2)) AS BIGINT))
                - (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y-1)*w + x-1 AS VARCHAR)), 1, 2)) AS BIGINT))
                - 2 * (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST(y*w + x-1 AS VARCHAR)), 1, 2)) AS BIGINT))
                - (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y+1)*w + x-1 AS VARCHAR)), 1, 2)) AS BIGINT))) AS gx,
               ((CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y+1)*w + x-1 AS VARCHAR)), 1, 2)) AS BIGINT))
                + 2 * (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y+1)*w + x AS VARCHAR)), 1, 2)) AS BIGINT))
                + (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y+1)*w + x+1 AS VARCHAR)), 1, 2)) AS BIGINT))
                - (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y-1)*w + x-1 AS VARCHAR)), 1, 2)) AS BIGINT))
                - 2 * (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y-1)*w + x AS VARCHAR)), 1, 2)) AS BIGINT))
                - (CAST(('0x' || substr(md5('sb:' || CAST(doc_id AS VARCHAR) || ':' || CAST((y-1)*w + x+1 AS VARCHAR)), 1, 2)) AS BIGINT))) AS gy
        FROM coords
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS width,
           CAST(MIN(h) AS BIGINT) AS height,
           CAST(COUNT(*) AS BIGINT) AS n_interior,
           CAST(SUM(gx * gx + gy * gy) AS BIGINT) AS g2_sum,
           CAST(MAX(gx * gx + gy * gy) AS BIGINT) AS g2_max,
           CAST(SUM(CASE WHEN gx * gx + gy * gy > 65536 THEN 1 ELSE 0 END)
                AS BIGINT) AS edge_px,
           CAST(SUM((gx * gx + gy * gy) * (q + 1)) AS BIGINT) AS g2_wsum
    FROM grad GROUP BY doc_id
    """,
)
def multimodal_sobel_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL edge-feature extraction over genuinely decoded pixels —
    the multimodal family's feature-extract step (brief: decode /
    feature-extract / resize / frame-sample): a 3×3 integer Sobel
    convolution over every interior pixel of the md5-minted PNG after
    a real encode→decode round trip, reporting gradient-energy stats,
    an edge-pixel count at the g² > 256² threshold, and a
    position-weighted checksum that pins the convolution's spatial
    orientation (a transposed kernel matches g2_sum but never
    g2_wsum). The oracle regenerates all nine taps per interior pixel
    straight from the generator formula — a hash match proves codec,
    neighborhood indexing and kernel arithmetic at once.

    Scale: convolution runs inside the Arrow batch per partition
    (shuffle-free, one output row per image); the 144-doc cap is
    fixture sizing. Integer-exact: |gx| ≤ 1020 so g² sums stay far
    inside int64 at any image count.
    """
    import hashlib

    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 144)
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 5 + i % 8, 5 + i % 6
                px = bytes(
                    int(
                        hashlib.md5(f"sb:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                dw, dh, decoded = decode_png_gray(encode_png_gray(px, w, h))
                assert (dw, dh) == (w, h)
                g2 = sobel_g2_interior(decoded, w, h)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        len(g2),
                        sum(g2),
                        max(g2),
                        sum(1 for v in g2 if v > 65536),
                        sum(v * (q + 1) for q, v in enumerate(g2)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "n_interior",
                    "g2_sum",
                    "g2_max",
                    "edge_px",
                    "g2_wsum",
                ],
            )

    return docs.mapInPandas(
        work,
        "doc_id long, width long, height long, n_interior long,"
        " g2_sum long, g2_max long, edge_px long, g2_wsum long",
    )


def histogram_equalize(px: bytes) -> bytes:
    """Classic histogram equalization (floor variant of the OpenCV
    formula): new = (cdf(v) − cdf_min) * 255 // (n − cdf_min).
    Module-level so tests replay the SAME kernel the operator ships."""
    n = len(px)
    hist = [0] * 256
    for v in px:
        hist[v] += 1
    cdf = []
    run = 0
    for c in hist:
        run += c
        cdf.append(run)
    cdf_min = min(cdf[v] for v in px)
    if n == cdf_min:  # constant image: equalization is identity-flat
        return bytes(255 for _ in px)
    return bytes((cdf[v] - cdf_min) * 255 // (n - cdf_min) for v in px)


@register(
    "multimodal_histogram_eq",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(4 + doc_id % 10 AS BIGINT) AS w,
               CAST(4 + doc_id % 8 AS BIGINT) AS h
        FROM documents WHERE doc_id < 144
    ),
    pix AS (
        SELECT doc_id, w * h AS n, unnest(range(0, w * h)) AS p
        FROM imgs
    ),
    vals AS (
        SELECT doc_id, n, p,
               CAST(('0x' || substr(md5('he:' || CAST(doc_id AS VARCHAR)
                    || ':' || CAST(p AS VARCHAR)), 1, 2)) AS BIGINT) AS v
        FROM pix
    ),
    cdf AS (
        SELECT doc_id, n, p, v,
               SUM(1) OVER (PARTITION BY doc_id ORDER BY v
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cd
        FROM vals
    ),
    eq AS (
        SELECT doc_id, n, p,
               (cd - MIN(cd) OVER (PARTITION BY doc_id)) * 255
                   // (n - MIN(cd) OVER (PARTITION BY doc_id)) AS e
        FROM cdf
    )
    SELECT doc_id,
           CAST(MIN(n) AS BIGINT) AS n_px,
           CAST(SUM(e) AS BIGINT) AS eq_sum,
           CAST(SUM(e * (p + 1)) AS BIGINT) AS eq_wsum,
           CAST(MIN(e) AS BIGINT) AS eq_min,
           CAST(MAX(e) AS BIGINT) AS eq_max
    FROM eq GROUP BY doc_id
    """,
)
def multimodal_histogram_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTOGRAM EQUALIZATION over genuinely decoded pixels — the
    contrast-normalization preprocessing step (the floor variant of
    the OpenCV cdf formula, integer-exact so SQL can replay it):
    per image a real PNG encode→decode round trip, a 256-bin
    histogram, and the cdf remap new = (cdf(v)−cdf_min)·255 //
    (n−cdf_min). The oracle rebuilds the cdf RELATIONALLY (a RANGE
    window counts ties ≤ v — the set-based twin of the kernel's
    array walk) and regenerates every remapped pixel; the
    position-weighted checksum pins the per-pixel mapping, min/max
    pin the contract that equalized output spans [0, 255].

    Scale: per-image kernel inside the Arrow batch, one output row
    per image, shuffle-free; the oracle's per-image window is bounded
    by the ≤112-pixel fixture grids (never data-scaled).
    """
    import hashlib

    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 144)
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 10, 4 + i % 8
                px = bytes(
                    int(
                        hashlib.md5(f"he:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                dw, dh, decoded = decode_png_gray(encode_png_gray(px, w, h))
                assert (dw, dh) == (w, h)
                eq = histogram_equalize(decoded)
                rows.append(
                    (
                        i,
                        len(eq),
                        sum(eq),
                        sum(v * (p + 1) for p, v in enumerate(eq)),
                        min(eq),
                        max(eq),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_px",
                    "eq_sum",
                    "eq_wsum",
                    "eq_min",
                    "eq_max",
                ],
            )

    return docs.mapInPandas(
        work,
        "doc_id long, n_px long, eq_sum long, eq_wsum long,"
        " eq_min long, eq_max long",
    )


def bilinear_resize_gray(
    px: bytes, w: int, h: int, rw: int, rh: int
) -> bytes:
    """Fixed-point BILINEAR grayscale resample (8.8 weights, floor
    rounding): sx256 = dx*(w-1)*256 // (rw-1), x0 = sx256 div 256,
    fx = sx256 mod 256, out = (v00*(256-fx)*(256-fy) + v10*fx*(256-fy)
    + v01*(256-fx)*fy + v11*fx*fy) // 65536 — pure integers, so SQL
    can replay every output pixel exactly. Module-level so tests
    replay the SAME kernel multimodal_bilinear_resize ships."""
    out = bytearray()
    for dy in range(rh):
        sy = dy * (h - 1) * 256 // (rh - 1) if rh > 1 else 0
        y0, fy = sy >> 8, sy & 255
        y1 = min(y0 + 1, h - 1)
        for dx in range(rw):
            sx = dx * (w - 1) * 256 // (rw - 1) if rw > 1 else 0
            x0, fx = sx >> 8, sx & 255
            x1 = min(x0 + 1, w - 1)
            v00, v10 = px[y0 * w + x0], px[y0 * w + x1]
            v01, v11 = px[y1 * w + x0], px[y1 * w + x1]
            out.append(
                (
                    v00 * (256 - fx) * (256 - fy)
                    + v10 * fx * (256 - fy)
                    + v01 * (256 - fx) * fy
                    + v11 * fx * fy
                )
                // 65536
            )
    return bytes(out)


_BILINEAR_PX = (
    "CAST(('0x' || substr(md5('bl:' || CAST(doc_id AS VARCHAR) || ':'"
    " || CAST({pos} AS VARCHAR)), 1, 2)) AS BIGINT)"
)


@register(
    "multimodal_bilinear_resize",
    oracle="""
    WITH imgs AS (
        SELECT doc_id,
               CAST(5 + doc_id % 6 AS BIGINT) AS w,
               CAST(5 + doc_id % 5 AS BIGINT) AS h,
               CAST(3 + doc_id % 5 AS BIGINT) AS rw,
               CAST(3 + doc_id % 4 AS BIGINT) AS rh
        FROM documents WHERE doc_id < 150
    ),
    expanded AS (
        SELECT doc_id, w, h, rw, rh, unnest(range(0, rw * rh)) AS q
        FROM imgs
    ),
    mapped AS (
        SELECT doc_id, w, h, rw, rh, q,
               ((q % rw) * (w - 1) * 256) // (rw - 1) AS sx,
               ((q // rw) * (h - 1) * 256) // (rh - 1) AS sy
        FROM expanded
    ),
    corners AS (
        SELECT doc_id, w, h, rw, rh, q,
               sx // 256 AS x0, sx % 256 AS fx,
               LEAST(sx // 256 + 1, w - 1) AS x1,
               sy // 256 AS y0, sy % 256 AS fy,
               LEAST(sy // 256 + 1, h - 1) AS y1
        FROM mapped
    ),
    pix AS (
        SELECT doc_id, w, h, rw, rh, q,
               ("""
    + _BILINEAR_PX.format(pos="y0 * w + x0")
    + """ * (256 - fx) * (256 - fy)
                + """
    + _BILINEAR_PX.format(pos="y0 * w + x1")
    + """ * fx * (256 - fy)
                + """
    + _BILINEAR_PX.format(pos="y1 * w + x0")
    + """ * (256 - fx) * fy
                + """
    + _BILINEAR_PX.format(pos="y1 * w + x1")
    + """ * fx * fy) // 65536 AS v
        FROM corners
    )
    SELECT doc_id,
           CAST(MIN(w) AS BIGINT) AS src_w,
           CAST(MIN(h) AS BIGINT) AS src_h,
           CAST(MIN(rw) AS BIGINT) AS dst_w,
           CAST(MIN(rh) AS BIGINT) AS dst_h,
           CAST(SUM(v) AS BIGINT) AS px_sum,
           CAST(SUM(v * (q + 1)) AS BIGINT) AS px_wsum,
           CAST(MIN(CASE WHEN q = 0 THEN v END) AS BIGINT) AS px_tl,
           CAST(MIN(CASE WHEN q = rw * rh - 1 THEN v END) AS BIGINT)
               AS px_br
    FROM pix GROUP BY doc_id
    """,
)
def multimodal_bilinear_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BILINEAR image resize through the real PNG codec — the
    quality step up from `multimodal_png_resize`'s nearest-neighbor
    (the thumbnail path most training-data pipelines actually ship):
    8.8 fixed-point source coordinates and weights keep every output
    pixel EXACTLY integer-determined, so the oracle regenerates the
    full resampled image straight from the md5 generator formula —
    a hash match proves codec round-trip, coordinate mapping, corner
    clamping and the 4-tap weight arithmetic at once. Corners map
    exactly to source corners (fx=fy=0 at both ends of the map),
    px_wsum pins output ORDER (a transposed resample can't match it).

    Scale: mint->decode->resample streams inside one Arrow batch per
    partition, one output row per image (shuffle-free until the
    per-doc aggregate, which IS the mapInPandas output). The 150-doc
    cap is fixture sizing only. Known-answer pinned (hand-computed
    2x2->3x3 centers + identity map) in test_cross_consistency.py.
    """
    import hashlib

    from e2e_data_pipeline_spark.operators.png_codec import (
        decode_png_gray,
        encode_png_gray,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") < 150)
    )

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 5 + i % 6, 5 + i % 5
                rw, rh = 3 + i % 5, 3 + i % 4
                px = bytes(
                    int(
                        hashlib.md5(f"bl:{i}:{p}".encode()).hexdigest()[:2],
                        16,
                    )
                    for p in range(w * h)
                )
                dw, dh, decoded = decode_png_gray(encode_png_gray(px, w, h))
                assert (dw, dh) == (w, h)
                rz = bilinear_resize_gray(decoded, w, h, rw, rh)
                rows.append(
                    (
                        i,
                        w,
                        h,
                        rw,
                        rh,
                        sum(rz),
                        sum(v * (q + 1) for q, v in enumerate(rz)),
                        rz[0],
                        rz[-1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "src_w",
                    "src_h",
                    "dst_w",
                    "dst_h",
                    "px_sum",
                    "px_wsum",
                    "px_tl",
                    "px_br",
                ],
            )

    return docs.mapInPandas(
        work,
        "doc_id long, src_w long, src_h long, dst_w long, dst_h long,"
        " px_sum long, px_wsum long, px_tl long, px_br long",
    )
