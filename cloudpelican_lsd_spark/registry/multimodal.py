"""North-star multimodal binary columns: real BMP/WAV/FVID codecs behind Arrow mapInPandas plumbing."""

from __future__ import annotations

from cloudpelican_lsd_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cloudpelican_lsd_spark.checkpoint import materialize

from cloudpelican_lsd_spark.registry._core import (
    register,
)


# ===========================================================================
# north-star: multimodal binary columns (decode stubbed; plumbing real)
# ===========================================================================

from cloudpelican_lsd_spark.multimodal import binary as mm_ops  # noqa: E402


@register(
    "multimodal_content_hash",
    """SELECT doc_id AS media_id,
       (['image','audio','video'])[(doc_id % 3) + 1] AS modality,
       sha256(text) AS content_sha256,
       octet_length(encode(text)) AS n_bytes
FROM documents""",
)
def q_mm_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path, oracle-checked on its deterministic
    hash/metadata columns (the float feature column is rows-only below)."""
    media = mm_ops.synthesize_media(load_table(spark, "documents", sf_dir))
    return mm_ops.extract_features(media).select(
        "media_id", "modality", "content_sha256", "n_bytes"
    )


from cloudpelican_lsd_spark.multimodal import codecs as mm_codecs  # noqa: E402

#: the synthetic media generator writes value (media_id + i) % 256 at unit
#: index i, so decoded statistics have the closed form
#: sum_{i<n} (s+i)%256 = T(s+n) - T(s), T(m) = (m//256)*32640 + r(r-1)/2.
#: The oracle therefore verifies the REAL parsers (BMP stride/bottom-up,
#: RIFF chunk walk, FVID seek) without decoding a single byte itself.
_MM_REAL_CTE = """m AS (
  SELECT doc_id AS media_id, doc_id % 3 AS kind,
         CAST(16 + (doc_id % 40) * 4 AS BIGINT) AS w,
         CAST(16 + (doc_id % 23) * 4 AS BIGINT) AS h,
         CAST(length(text) * 10 AS BIGINT) AS dur
  FROM documents
)"""


@register(
    "multimodal_features",
    f"""WITH {_MM_REAL_CTE},
p AS (
  SELECT media_id,
         CASE kind WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
         CASE kind WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'fvid' END AS fmt,
         CASE WHEN kind = 0 THEN w * h ELSE dur END AS n_units,
         media_id % 256 AS s,
         CASE WHEN kind = 0 THEN h ELSE dur END AS cnt,
         CASE WHEN kind = 0 THEN 3 * w ELSE 1 END AS mult
  FROM m
)
SELECT media_id, modality, fmt, CAST(n_units AS BIGINT) AS n_units,
  CAST(mult * ( ((s+cnt)//256)*32640 + ((s+cnt)%256)*(((s+cnt)%256)-1)//2
                - s*(s-1)//2 ) AS BIGINT) AS unit_sum,
  CAST(CASE WHEN cnt = 0 THEN NULL WHEN s + cnt <= 256 THEN s ELSE 0 END AS BIGINT) AS unit_min,
  CAST(CASE WHEN cnt = 0 THEN NULL WHEN s + cnt <= 256 THEN s + cnt - 1 ELSE 255 END AS BIGINT) AS unit_max
FROM p""",
)
def q_mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL media decode through Arrow mapInPandas: BMP (stride +
    bottom-up row order), WAV (RIFF chunk walk), FVID frame stream —
    gate-checked on integer decode statistics whose closed form the
    oracle computes from the generator parameters (multimodal/codecs.py).
    The float feature vector stays API-side (driver-hashable columns
    only)."""
    media = mm_codecs.synthesize_real_media(load_table(spark, "documents", sf_dir))
    return mm_codecs.decode_features(media).select(
        "media_id", "modality", "fmt", "n_units", "unit_sum", "unit_min", "unit_max"
    )


@register(
    "multimodal_frame_sample",
    f"""WITH {_MM_REAL_CTE}
SELECT media_id, CAST(f AS BIGINT) AS frame_ms,
       CAST(CASE WHEN f < dur THEN (media_id + f) % 256 END AS BIGINT) AS frame_val
FROM m, unnest(generate_series(0, CAST(greatest(dur - 1, 0) AS BIGINT), 500)) AS t(f)
WHERE kind = 2 AND dur > 0""",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling by REAL seek into the decoded video stream (offsets
    from pure column math; only video rows cross the Arrow boundary)."""
    media = mm_codecs.synthesize_real_media(load_table(spark, "documents", sf_dir))
    return mm_codecs.frame_sample_real(media, every_ms=500)


@register(
    "multimodal_resize_dims",
    """WITH media AS (
  SELECT doc_id AS media_id,
         CAST(32 + (doc_id % 40) * 16 AS INT) AS width,
         CAST(32 + (doc_id % 23) * 16 AS INT) AS height
  FROM documents
)
SELECT media_id, width AS orig_w, height AS orig_h,
  CAST(CASE WHEN width <= 256 AND height <= 192 THEN width
            WHEN width * 192 >= height * 256 THEN 256
            ELSE GREATEST(width * 192 // height, 1) END AS INT) AS new_w,
  CAST(CASE WHEN width <= 256 AND height <= 192 THEN height
            WHEN width * 192 >= height * 256
              THEN GREATEST(height * 256 // width, 1)
            ELSE 192 END AS INT) AS new_h
FROM media""",
)
def q_mm_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize targets as pure relational integer math
    on the prunable metadata (multimodal/binary.py resize_dims) — the
    blob column is never read."""
    media = mm_ops.synthesize_media(load_table(spark, "documents", sf_dir))
    return mm_ops.resize_dims(media, max_w=256, max_h=192).select(
        "media_id",
        F.col("width").alias("orig_w"),
        F.col("height").alias("orig_h"),
        "new_w",
        "new_h",
    )


@register(
    "multimodal_resize",
    f"""WITH {_MM_REAL_CTE},
d AS (
  SELECT media_id, w, h,
    CASE WHEN w <= 64 AND h <= 48 THEN w
         WHEN w * 48 >= h * 64 THEN 64
         ELSE GREATEST(w * 48 // h, 1) END AS new_w,
    CASE WHEN w <= 64 AND h <= 48 THEN h
         WHEN w * 48 >= h * 64 THEN GREATEST(h * 64 // w, 1)
         ELSE 48 END AS new_h
  FROM m WHERE kind = 0
),
shr AS (SELECT * FROM d WHERE new_w < w OR new_h < h),
sums AS (
  SELECT media_id, SUM((media_id + (y * h // new_h)) % 256) AS rowsum
  FROM shr, unnest(generate_series(0, new_h - 1)) AS t(y)
  GROUP BY media_id
)
SELECT s.media_id, 'image' AS modality, CAST(s.new_w AS INT) AS width,
       CAST(s.new_h AS INT) AS height, TRUE AS resized,
       CAST(3 * s.new_w * su.rowsum AS BIGINT) AS px_sum
FROM shr s JOIN sums su USING (media_id)
UNION ALL
SELECT media_id, 'image', CAST(w AS INT), CAST(h AS INT), FALSE, NULL
FROM d WHERE NOT (new_w < w OR new_h < h)
UNION ALL
SELECT media_id, CASE kind WHEN 1 THEN 'audio' ELSE 'video' END,
       NULL, NULL, FALSE, NULL
FROM m WHERE kind <> 0""",
)
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize: decode BMP → nearest-neighbor resample →
    re-encode → decode the artifact back for the gate statistic, so the
    oracle pins the whole round-trip.  Within-bounds images and all
    audio/video rows bypass Python entirely (their blob never crosses
    Arrow — px_sum NULL for exactly those rows).  The synthesized media
    fixture is localCheckpoint-ed because resize's two branches
    (passthrough / shrink) are separate consumers — without it the
    expensive mapInPandas ENCODER would run twice (two-consumer trap);
    a real parquet-backed media table doesn't need this (a double scan
    is cheap and pruned)."""
    media = mm_codecs.synthesize_real_media(
        load_table(spark, "documents", sf_dir)
    ).transform(materialize, eager=False)
    return mm_codecs.resize_real(media, max_w=64, max_h=48).drop("content")


def _mm_tri(m: str) -> str:
    """Closed-form ``sum_{i<m} i % 256`` (the codecs.py generator ramp):
    ``T(m) = (m//256)*32640 + r*(r-1)//2, r = m%256``."""
    return f"((({m})//256)*32640 + (({m})%256)*((({m})%256)-1)//2)"


#: Per-band aHash bits in closed form.  The generator paints every channel
#: byte of top-down row r with (media_id + r) % 256, so a grid cell's mean
#: depends only on its row band and the cross-multiplied aHash bit
#: condition  cell_sum * total_area > total_sum * cell_area  reduces
#: (column and channel factors cancel exactly) to
#: rowsum(band) * h > rowsum(all) * band_rows — which the oracle evaluates
#: from triangular sums without decoding a byte, pinning the REAL
#: decode → 8x8 box-mean → bit-pack path end-to-end.
_MM_PHASH_CTE = f"""{_MM_REAL_CTE},
img AS (SELECT media_id, media_id % 256 AS s, h FROM m WHERE kind = 0),
bands AS (
  SELECT media_id, t.gy, s, h, t.gy*h//8 AS lo, (t.gy+1)*h//8 AS hi
  FROM img, unnest(generate_series(0, 7)) AS t(gy)
),
bits AS (
  SELECT media_id, gy,
    CASE WHEN ({_mm_tri('s+hi')} - {_mm_tri('s+lo')}) * h
            > ({_mm_tri('s+h')} - {_mm_tri('s')}) * (hi - lo)
         THEN 1 ELSE 0 END AS bit
  FROM bands
),
hashes AS (
  SELECT media_id,
    string_agg(CASE WHEN bit = 1 THEN 'ff' ELSE '00' END, '' ORDER BY gy) AS phash_hex,
    CAST(SUM(CASE WHEN gy = 0 THEN bit*65280 WHEN gy = 1 THEN bit*255 ELSE 0 END) AS INT) AS blk0,
    CAST(SUM(CASE WHEN gy = 2 THEN bit*65280 WHEN gy = 3 THEN bit*255 ELSE 0 END) AS INT) AS blk1,
    CAST(SUM(CASE WHEN gy = 4 THEN bit*65280 WHEN gy = 5 THEN bit*255 ELSE 0 END) AS INT) AS blk2,
    CAST(SUM(CASE WHEN gy = 6 THEN bit*65280 WHEN gy = 7 THEN bit*255 ELSE 0 END) AS INT) AS blk3
  FROM bits GROUP BY media_id
)"""


@register(
    "multimodal_phash_groups",
    f"""WITH {_MM_PHASH_CTE}
SELECT phash_hex, blk0, blk1, blk2, blk3,
       CAST(COUNT(*) AS BIGINT) AS n_images
FROM hashes GROUP BY 1, 2, 3, 4, 5""",
)
def q_mm_phash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual-hash (aHash) duplicate groups through the REAL BMP
    decode: images sharing an identical 64-bit 8x8 average hash — the
    image-side analog of dedup_exact_groups, the first stage of
    LAION-style image dedup.  Integer-exact bits (cross-multiplied mean
    comparison in codecs.ahash_64); one hash agg on the fingerprint."""
    media = mm_codecs.synthesize_real_media(load_table(spark, "documents", sf_dir))
    return mm_codecs.phash_groups(media)


@register(
    "multimodal_phash_near_pairs",
    f"""WITH {_MM_PHASH_CTE},
groups AS (
  SELECT phash_hex, blk0, blk1, blk2, blk3, COUNT(*) AS n_images
  FROM hashes GROUP BY 1, 2, 3, 4, 5
),
blocks AS (
  SELECT g.*, t.i,
         CASE t.i WHEN 0 THEN blk0 WHEN 1 THEN blk1
                  WHEN 2 THEN blk2 ELSE blk3 END AS blk
  FROM groups g, unnest(generate_series(0, 3)) AS t(i)
),
cand AS (
  SELECT DISTINCT a.phash_hex AS hash_a, b.phash_hex AS hash_b,
           bit_count(xor(a.blk0, b.blk0)) + bit_count(xor(a.blk1, b.blk1))
         + bit_count(xor(a.blk2, b.blk2)) + bit_count(xor(a.blk3, b.blk3)) AS hamming,
         a.n_images AS docs_a, b.n_images AS docs_b
  FROM blocks a JOIN blocks b
    ON a.i = b.i AND a.blk = b.blk AND a.phash_hex < b.phash_hex
)
SELECT hash_a, hash_b, CAST(hamming AS INT) AS hamming,
       CAST(docs_a AS BIGINT) AS docs_a, CAST(docs_b AS BIGINT) AS docs_b
FROM cand WHERE hamming BETWEEN 1 AND 24""",
)
def q_mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate image pairs: distinct perceptual hashes bucketed on
    their 4 16-bit blocks (pigeonhole recall, simhash lesson: pair the
    DISTINCT fingerprints, never doc x doc), verified by exact popcount
    Hamming <= 24.  Sides report image counts, so output stays
    |hash-pairs|-sized no matter how many images collide per hash."""
    media = mm_codecs.synthesize_real_media(load_table(spark, "documents", sf_dir))
    return mm_codecs.phash_near_pairs(media, max_hamming=24)


