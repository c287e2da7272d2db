"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The driver testdata has no image/audio files, and this container ships no
codec libraries, so payloads are synthesized deterministically from
``documents.text`` (UTF-8 bytes) — but the Spark-side plumbing is the
real thing a 100 TB multimodal corpus needs:

* a manifest projection (modality, byte length, content hash, fake
  width/height/sample-rate metadata) that stays fully declarative —
  oracle-checked against DuckDB;
* a decode / feature-extract stage as an Arrow-batched ``mapInPandas``
  operator with an explicit output schema and bounded batch size — the
  exact shape a real decoder (PIL/ffmpeg/torchcodec) would plug into.
  Real decoding is stubbed behind ``NotImplementedError``; the
  deterministic fake path computes byte-level statistics so the operator
  is testable end-to-end.

Scale notes: payload bytes never pass through a shuffle — the manifest
carries only metadata; decode is a narrow per-partition map whose
parallelism is the scan's split count (``spark.sql.files.maxPartitionBytes``),
and ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds decoder
memory per Arrow batch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

MODALITIES = ("image", "audio", "video")


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def multimodal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, modality, payload: binary, meta struct).

    Deterministic synthesis: payload = UTF-8 bytes of text, modality by
    doc_id mod 3, metadata derived from md5 of the doc id.
    """
    docs = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    seed = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            (seed % 1280 + 64).cast("int").alias("width"),
            (seed % 720 + 64).cast("int").alias("height"),
            (seed % 3 + 1).cast("int").alias("channels"),
            (seed % 32000 + 8000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


@register(
    "q_multimodal_manifest",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
               AS modality,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           md5(text) AS content_hash,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                % 1280 + 64 AS INT) AS width,
           CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)
                % 720 + 64 AS INT) AS height
    FROM documents
    """,
)
def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest over binary payloads: metadata only — no payload shuffle."""
    mm = multimodal_table(spark, sf_dir)
    return mm.select(
        "doc_id",
        "modality",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# ---------------------------------------------------------------------------
# Decode / feature extraction (Pandas-UDF slow path, deliberately)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = (
    "doc_id long, modality string, n_bytes long, "
    "mean_byte double, max_byte int, byte_entropy_bp long"
)


def decode_payload(payload: bytes, modality: str) -> dict:
    """REAL decode stub.  In production this dispatches to the codec
    (PIL for image, soundfile/ffmpeg for audio/video); those libraries
    are not available in this environment.
    """
    raise NotImplementedError(
        f"real {modality} decoding requires codec libraries not present here; "
        "use fake_decode_stats (deterministic) for plumbing tests"
    )


def fake_decode_stats(payload: bytes) -> tuple[float, int, int]:
    """Deterministic stand-in for decode+feature-extract: byte stats.

    mean byte value, max byte, and a Shannon-entropy proxy in basis
    points (integer, so results are engine/platform exact).
    """
    import math

    if not payload:
        return 0.0, 0, 0
    counts: dict[int, int] = {}
    total = 0
    max_b = 0
    for b in payload:
        counts[b] = counts.get(b, 0) + 1
        total += b
        max_b = max(max_b, b)
    n = len(payload)
    entropy = -sum((c / n) * math.log2(c / n) for c in counts.values())
    return total / n, max_b, int(entropy * 10000)


def decode_features(mm: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched decode stage: mapInPandas over (payload, modality).

    Batch shape: each pandas DataFrame chunk is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; one decoder context
    per partition would be initialized here (mirroring the sink's
    client-per-partition pattern).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len),
            }
            if use_real_decoder:
                for p, m in zip(pdf["payload"], pdf["modality"]):
                    decode_payload(bytes(p), m)  # raises NotImplementedError
            stats = [fake_decode_stats(bytes(p)) for p in pdf["payload"]]
            out["mean_byte"] = [s[0] for s in stats]
            out["max_byte"] = [s[1] for s in stats]
            out["byte_entropy_bp"] = [s[2] for s in stats]
            yield pd.DataFrame(out)

    return mm.mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, n_out_bytes long"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"

TARGET_W, TARGET_H = 224, 224
FRAME_STRIDE = 256  # bytes per fake "frame"
MAX_FRAMES = 4


def resize_images(mm: DataFrame) -> DataFrame:
    """Resize stage (image modality): mapInPandas with the production
    shape — per-batch decode→resize→re-encode; the pixel work is faked
    as byte truncation/padding to the target raster size since no codec
    library ships here, but schema, filtering, and batching are real."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = TARGET_W * TARGET_H
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "image"]
            if pdf.empty:
                continue
            n_out = pdf["payload"].map(lambda p: min(len(p), target))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": TARGET_W,
                    "out_h": TARGET_H,
                    "n_out_bytes": n_out,
                }
            )

    return mm.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(mm: DataFrame) -> DataFrame:
    """Frame-sampling stage (video modality): emits up to MAX_FRAMES
    "frames" per payload (1→N), each fingerprinted — the UDTF-shaped
    mapInPandas pattern a real ffmpeg keyframe sampler plugs into."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["modality"] == "video"]
            if pdf.empty:
                continue
            doc_ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = min(MAX_FRAMES, max(1, len(raw) // FRAME_STRIDE))
                for i in range(n_frames):
                    chunk = raw[i * FRAME_STRIDE : (i + 1) * FRAME_STRIDE]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": doc_ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return mm.mapInPandas(run, schema=FRAME_SCHEMA)


@register(
    "q_multimodal_frame_sample",
    # documents.text is ASCII in the fixtures, so character substr equals
    # the byte slicing the pandas stage performs on the UTF-8 payload.
    oracle=f"""
    SELECT doc_id,
           CAST(i - 1 AS INT) AS frame_idx,
           md5(substr(text, ({FRAME_STRIDE} * (i - 1)) + 1, {FRAME_STRIDE}))
               AS frame_hash
    FROM (SELECT doc_id, text,
                 least({MAX_FRAMES},
                       greatest(1, length(text) // {FRAME_STRIDE})) AS n_frames
          FROM documents
          WHERE doc_id % 3 = 2),
         LATERAL (SELECT unnest(range(1, n_frames + 1)) AS i)
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video payloads; oracle reproduces the byte
    slicing + md5 per frame in SQL, proving the 1→N mapInPandas stage."""
    return sample_frames(multimodal_table(spark, sf_dir))


@register("q_multimodal_decode_stats")
def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stage feature extraction (fake decoder) aggregated per
    modality.  No SQL oracle (Pandas-UDF pipeline) — driver records the
    rows-only check; unit tests assert the per-row stats directly.
    """
    mm = multimodal_table(spark, sf_dir)
    feats = decode_features(mm)
    return (
        feats.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("mean_byte"), 2).alias("avg_mean_byte"),
            F.max("max_byte").alias("max_byte"),
            F.round(F.avg("byte_entropy_bp"), 0).cast("bigint").alias("avg_entropy_bp"),
        )
    )
