"""Multimodal column plumbing: image/audio/video as opaque binary columns.

North-star extension.  The Spark-side machinery is real and tested —
typed schema, Arrow-batched `mapInPandas` transforms, partition-size
guidance — while the actual media decoding is STUBBED (the image/audio
libraries are not available in this container): `decode_stub=True` swaps
in a deterministic fake decoder; `decode_stub=False` raises
NotImplementedError at the exact point a real `PIL.Image.open` /
`soundfile.read` call would go.

Scale notes:
- binary payloads dominate row size → keep
  ``spark.sql.files.maxPartitionBytes`` small enough that a partition of
  rows fits in executor memory, and never collect() media rows;
- metadata-only operations (filtering by width/duration/mime) must touch
  only the typed metadata columns so parquet column pruning skips the
  binary blob entirely — the schema below keeps metadata top-level for
  exactly that reason;
- `mapInPandas` streams Arrow record batches: peak memory is one batch,
  not one partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: typed multimodal record: metadata top-level (prunable), payload opaque
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table from `documents` (test fixture):
    content = UTF-8 bytes of text, modality round-robins by doc_id."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        # dims vary by id so resize targets exercise every branch
        (F.lit(32) + (F.col("doc_id") % 40) * 16).cast("int").alias("width"),
        (F.lit(32) + (F.col("doc_id") % 23) * 16).cast("int").alias("height"),
        (F.length("text") * 10).cast("long").alias("duration_ms"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real encoder: sha256 → dim floats."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize each media row via Arrow-batched mapInPandas.

    With ``decode_stub`` the "decoder" is a deterministic hash-projection;
    without it this raises NotImplementedError where the real media
    library call belongs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/soundfile/av; "
                    "install and replace _fake_feature with the decoder"
                )
            # content is nullable BINARY — bytes(None) raises and would
            # kill the whole task on a single bad row; NULL payloads get
            # NULL-ish outputs instead
            payloads = [None if b is None else bytes(b) for b in pdf["content"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content_sha256": [
                        None if b is None else hashlib.sha256(b).hexdigest()
                        for b in payloads
                    ],
                    "n_bytes": [0 if b is None else len(b) for b in payloads],
                    "feature": [
                        None if b is None else _fake_feature(b) for b in payloads
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset.

    The offsets come from pure column math (`sequence`) and stay an ARRAY
    until inside the Python boundary, so each video blob crosses Arrow
    ONCE however many frames are sampled (exploding first would ship one
    full copy of the blob per frame — 60× transfer for a minute of video
    at 1 fps; frame_sample_real established this shape).  A zero-duration
    video has no frames: its offsets array is empty and it contributes no
    rows (the old `sequence(0, greatest(dur-1, 0))` emitted a phantom
    frame at offset 0).
    """
    vids = media.where(F.col("modality") == "video").select(
        "media_id",
        "content",
        F.expr(
            f"CASE WHEN duration_ms > 0 THEN "
            f"sequence(0, duration_ms - 1, {int(every_ms)}) "
            f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
        ).alias("offsets"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, offs, shas = [], [], []
            for mid, blob, offsets in zip(
                pdf["media_id"], pdf["content"], pdf["offsets"]
            ):
                payload = None if blob is None else bytes(blob)
                for ms in offsets:
                    ms = int(ms)
                    mids.append(int(mid))
                    offs.append(ms)
                    # stub: real impl seeks to frame_ms and decodes
                    shas.append(
                        None
                        if payload is None
                        else hashlib.sha256(
                            payload + ms.to_bytes(8, "big")
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": mids, "frame_ms": offs, "frame_sha256": shas}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ms", T.LongType(), False),
            T.StructField("frame_sha256", T.StringType(), True),
        ]
    )
    return vids.mapInPandas(decode, schema)


def resize_dims(
    media: DataFrame, max_w: int = 256, max_h: int = 192
) -> DataFrame:
    """Adds aspect-preserving target dims ``(new_w, new_h)`` — pure
    integer column math on the prunable metadata, no Python, no blob
    read.

    The binding side is chosen by cross-multiplication
    (``w*max_h >= h*max_w`` ⇔ width's scale factor is the smaller), and
    the scaled dimension is exact integer ``div`` — both reproducible
    bit-for-bit in the DuckDB oracle, unlike float scale factors.  The
    scaled side is clamped to ≥1 (an extreme aspect ratio like 1×10000
    would otherwise floor-divide to a zero-width target, which no real
    resizer emits)."""
    w, h = F.col("width"), F.col("height")
    fits = (w <= max_w) & (h <= max_h)
    width_binds = w * max_h >= h * max_w
    return media.withColumn(
        "new_w",
        F.when(fits, w)
        .when(width_binds, F.lit(max_w))
        .otherwise(
            F.greatest(F.expr(f"width * {max_h} div height"), F.lit(1))
        )
        .cast("int"),
    ).withColumn(
        "new_h",
        F.when(fits, h)
        .when(
            width_binds,
            F.greatest(F.expr(f"height * {max_w} div width"), F.lit(1)),
        )
        .otherwise(F.lit(max_h))
        .cast("int"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("resized", T.BooleanType(), False),
    ]
)


def resize(
    media: DataFrame,
    max_w: int = 256,
    max_h: int = 192,
    decode_stub: bool = True,
) -> DataFrame:
    """Bound media to ``max_w × max_h`` preserving aspect ratio.

    Spark-first split: target dims come from `resize_dims` (relational,
    metadata-only), and rows already within bounds BYPASS the Python
    boundary entirely — their blobs are never shipped through Arrow.
    Only genuinely-shrinking rows enter the ``mapInPandas`` resample,
    which is the stubbed decode point (real impl: decode → resample to
    (new_w, new_h) → re-encode; fake: sha256(content + dims) digest
    bytes, deterministic).  Rows with NULL dims can't be resized and
    pass through unchanged.

    The two branches are separate consumers of ``media`` — if the input
    is itself an expensive computed DataFrame (a synthesizer, a decode
    pass), localCheckpoint/persist it first or that subtree evaluates
    twice; a parquet-backed table needs nothing (double scan, pruned)."""
    dims = resize_dims(media, max_w, max_h)
    needs = (F.col("new_w") < F.col("width")) | (
        F.col("new_h") < F.col("height")
    )
    passthrough = dims.where(~F.coalesce(needs, F.lit(False))).select(
        "media_id",
        "modality",
        "width",
        "height",
        "content",
        F.lit(False).alias("resized"),
    )

    def resample(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if not decode_stub:
                raise NotImplementedError(
                    "real resample requires PIL/av; replace the fake "
                    "re-encode below with decode→resize→encode"
                )
            out_content = [
                None
                if c is None
                else hashlib.sha256(
                    bytes(c)
                    + int(nw).to_bytes(4, "big")
                    + int(nh).to_bytes(4, "big")
                ).digest()
                for c, nw, nh in zip(pdf["content"], pdf["new_w"], pdf["new_h"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "width": pdf["new_w"],
                    "height": pdf["new_h"],
                    "content": out_content,
                    "resized": [True] * len(pdf),
                }
            )

    shrunk = dims.where(F.coalesce(needs, F.lit(False))).mapInPandas(
        resample, RESIZE_SCHEMA
    )
    return passthrough.unionByName(shrunk)


def metadata_only_scan(media: DataFrame) -> DataFrame:
    """Filter/inspect by typed metadata without touching the binary column
    (parquet column pruning skips `content` entirely — check ReadSchema)."""
    return (
        media.where((F.col("modality") == "image") & (F.col("width") >= 32))
        .groupBy("modality", "mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(F.col("width").cast("double")).alias("avg_width"),
        )
    )
