"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB:
- payloads ride as `binary` columns next to typed metadata structs;
- decode / feature-extract / resize run as Arrow-batched Pandas UDFs
  over mapInPandas (one Python worker round-trip per batch, never per
  row);
- real codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
  decode kernel is stubbed: `decode_image_batch` raises
  NotImplementedError unless the deterministic fake decoder is
  requested. The Spark-side plumbing — schema, batch iteration,
  partition sizing — is real and tested.

The `documents.text` column stands in for a payload source: we encode
it to bytes so the binary-column path is exercised end-to-end on real
data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datamodel import load_table

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, checksum long"
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach a binary payload column + typed metadata struct."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_image_batch(payloads: pd.Series, *, fake: bool = False) -> pd.DataFrame:
    """Decode a batch of image payloads → (width, height, checksum).

    Real codec deliberately unavailable in this environment; the fake
    path is deterministic (derived from byte lengths/sums) so the
    distributed plumbing can be tested byte-for-byte.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    n_bytes = payloads.map(len)
    checksum = payloads.map(lambda b: sum(b) % 1_000_003)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int32"),
            "fake_width": (n_bytes % 640 + 1).astype("int32"),
            "fake_height": (checksum % 480 + 1).astype("int32"),
            "checksum": checksum.astype("int64"),
        }
    )


def decode_stub(docs_with_payload: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas decode pass: Arrow batches in, typed rows out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = decode_image_batch(pdf["payload"], fake=fake)
            decoded.insert(0, "doc_id", pdf["doc_id"].values)
            yield decoded

    return docs_with_payload.mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes int, frame_checksum long"
FRAME_SIZE = 64          # bytes per fake "frame"
AUDIO_WINDOW = 32        # bytes per fake "audio window"


def frame_sample(
    docs_with_payload: DataFrame, every_n: int = 4
) -> DataFrame:
    """Video-style frame sampling: one input payload fans out to one
    row per kept frame (1→N inside the Pandas batch — the shape real
    frame extraction has). Frames are fixed-size byte slices; a real
    deployment swaps the slicer for an ffmpeg keyframe reader with the
    SAME signature and schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // FRAME_SIZE)
                for idx in range(0, n_frames, every_n):
                    chunk = payload[idx * FRAME_SIZE : (idx + 1) * FRAME_SIZE]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_checksum"].append(sum(chunk) % 1_000_003)
            yield pd.DataFrame(out)

    return docs_with_payload.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_stub(decoded: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """'Resize' pass over decoded image rows — pure column math on the
    fake dimensions (a real resize is another mapInPandas kernel; the
    pipeline position and schema contract are what this pins down)."""
    return decoded.select(
        "doc_id",
        F.lit(target_w).alias("width"),
        F.lit(target_h).alias("height"),
        (F.col("checksum") * target_w * target_h % 1_000_003).alias("checksum"),
    )


def audio_energy(docs_with_payload: DataFrame) -> DataFrame:
    """Audio-style feature extraction: windowed byte-sum 'energy'
    profile as an array<double> column per payload — the vector-per-
    asset output shape an embedding/feature extractor produces."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            energies = [
                [
                    float(sum(p[i : i + AUDIO_WINDOW]))
                    for i in range(0, max(len(p), 1), AUDIO_WINDOW)
                ]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_windows": [len(e) for e in energies],
                    "energy": energies,
                }
            )

    return docs_with_payload.mapInPandas(
        run, schema="doc_id long, n_windows int, energy array<double>"
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM metadata extraction over the binary payload column
    (no Python worker): byte length + md5 prefix as a checksum id."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
    )


def q_multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pandas-UDF decode path with the deterministic fake codec.
    [rows-only in the driver compare — Python-side kernel, no SQL twin]
    """
    docs = load_table(spark, sf_dir, "documents")
    return decode_stub(with_binary_payload(docs), fake=True)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling path (rows-only: Pandas kernel, no SQL twin)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(with_binary_payload(docs))


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode_stub": q_multimodal_decode_stub,
    "multimodal_frame_sample": q_multimodal_frame_sample,
}

ORACLES = {
    "multimodal_meta": """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents""",
    # multimodal_decode_stub intentionally has no oracle: the decode
    # kernel is a Pandas UDF (rows-only check by design).
}
