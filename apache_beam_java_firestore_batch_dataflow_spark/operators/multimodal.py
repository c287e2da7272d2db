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
  The **image** modality is decoded for real: payloads are genuine
  binary P6 PPM images and ``decode_ppm`` is a full pure-python parser
  (header tokenization, comments, maxval, raster bounds), oracle-checked
  byte-for-byte.  Audio/video stay stubbed behind ``NotImplementedError``
  (no codec libraries in this environment); the deterministic fake path
  computes byte-level statistics so that plumbing is testable too.

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
    """Real decode dispatch.  Images are decoded for real (P6 PPM — a
    pure-python parser, no codec library needed).  Audio/video would
    dispatch to soundfile/ffmpeg in production; those libraries are not
    available in this environment, so they stay stubbed.
    """
    if modality == "image":
        w, h, raster_sum, r_sum, max_byte = decode_ppm(payload)
        return {
            "width": w,
            "height": h,
            "raster_sum": raster_sum,
            "r_sum": r_sum,
            "max_byte": max_byte,
        }
    raise NotImplementedError(
        f"real {modality} decoding requires codec libraries not present here; "
        "use fake_decode_stats (deterministic) for plumbing tests"
    )


# ---------------------------------------------------------------------------
# Real image decode: binary P6 PPM (pure python, no codec dependency)
# ---------------------------------------------------------------------------


def decode_ppm(payload: bytes) -> tuple[int, int, int, int, int]:
    """Parse a binary P6 PPM image; returns
    ``(width, height, raster_sum, r_sum, max_byte)``.

    A real decoder, not a fake: magic check, whitespace- and
    comment-tolerant header tokenization, maxval validation, raster
    length check.  The extracted features are integer-exact (sum of all
    raster bytes, sum of the R channel, max byte) so the query built on
    top is DuckDB-oracle-checkable with no float hazards.
    """
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6 magic missing)")
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # exactly one whitespace byte separates maxval from the raster
    width, height, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval} (only 8-bit supported)")
    n_raster = 3 * width * height
    raster = payload[i : i + n_raster]
    if len(raster) < n_raster:
        raise ValueError(f"truncated raster: {len(raster)} < {n_raster}")
    return width, height, sum(raster), sum(raster[0::3]), max(raster)


def ppm_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload): a REAL binary P6 PPM image per document.

    Dimensions derive from doc_id (w = doc_id%13+4, h = doc_id%7+4); the
    raster is ``documents.text`` (pure ASCII in the fixtures) cycled to
    3·w·h bytes.  Synthesis is fully declarative (repeat + substring), so
    the DuckDB oracle can reproduce every raster byte positionally.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "CAST(doc_id % 13 + 4 AS INT) AS w",
        "CAST(doc_id % 7 + 4 AS INT) AS h",
        "text",
    ).selectExpr(
        "doc_id",
        r"""encode(concat('P6\n', CAST(w AS STRING), ' ', CAST(h AS STRING),
                         '\n255\n',
                         substring(repeat(text,
                                          CAST(ceil((3*w*h) / length(text)) AS INT)),
                                   1, 3*w*h)),
                  'UTF-8') AS payload""",
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


DECODE_PPM_SCHEMA = (
    "doc_id long, width int, height int, "
    "raster_sum long, r_sum long, max_byte int"
)


@register(
    "q_multimodal_decode_stats",
    # Reproduces the decoder's view positionally: raster byte p is the
    # text byte at index p % len(text) (documents.text is pure ASCII in the
    # fixtures, so unicode(char) == byte).  All stats integer → exact.
    oracle="""
    WITH params AS (
      SELECT doc_id, text,
             doc_id % 13 + 4 AS w, doc_id % 7 + 4 AS h,
             length(text) AS n
      FROM documents
    ),
    bytes AS (
      SELECT doc_id, w, h, p,
             unicode(substr(text, CAST(p % n AS INT) + 1, 1)) AS b
      FROM params, LATERAL (SELECT unnest(range(0, 3*w*h)) AS p)
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(sum(b) AS BIGINT) AS raster_sum,
           CAST(sum(b) FILTER (p % 3 = 0) AS BIGINT) AS r_sum,
           CAST(max(b) AS INT) AS max_byte
    FROM bytes
    GROUP BY doc_id, w, h
    """,
)
def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode: synthesize a binary P6 PPM per document, parse it back
    with the pure-python decoder inside ``mapInPandas``, emit per-image
    integer-exact features.  The payload (header + raster) round-trips
    through a genuine parser — magic, header tokenization, maxval,
    raster bounds — and the DuckDB oracle recomputes the same features
    from first principles, so the decode stage is value-checked, not
    rows-only.  Payload bytes never shuffle; decode parallelism is the
    scan's split count."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_ppm(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "raster_sum": [d[2] for d in decoded],
                    "r_sum": [d[3] for d in decoded],
                    "max_byte": [d[4] for d in decoded],
                }
            )

    return ppm_table(spark, sf_dir).mapInPandas(run, schema=DECODE_PPM_SCHEMA)
