"""Multimodal (binary-payload) column operators.

Training-data pipelines carry image/audio/video as opaque ``binary``
columns plus typed metadata, and run decode / feature-extraction /
frame-sampling as Arrow-batched pandas stages. This module implements
that surface with the Spark-side plumbing fully real — explicit binary
schema, deterministic media-type assignment, ``mapInPandas`` with
iterator-of-batches signatures, per-frame chunking — while the codec
step itself is STUBBED: the container ships no image/audio libraries,
so :func:`decode_media` raises ``NotImplementedError`` unless the
caller opts into the deterministic fake decoder used by tests.

Scale shape: every operator is one narrow ``mapInPandas`` pass (Arrow
batches, no shuffle) or pure built-ins; frame sampling fans out ~one
row per ``FRAME_BYTES`` chunk, bounded by ``sample_every``. Nothing
touches the driver.

The fixture corpus has no real media files, so payloads are synthesized
from ``documents.text`` (UTF-8 bytes — the corpus is ASCII, which keeps
byte offsets == char offsets and lets the DuckDB oracle verify frame
hashes with string ``substring``/``md5``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:
    import pandas as pd

#: Bytes per synthetic "frame" of a video payload.
FRAME_BYTES = 256
#: Keep every k-th frame when sampling.
FRAME_SAMPLE_EVERY = 4

MEDIA_TYPES = ("image", "audio", "video")

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, media_type string, payload_len long, payload_md5 string, byte_sum long"
)
FRAME_SAMPLE_SCHEMA = "doc_id long, frame_no long, frame_md5 string, frame_len long"
DECODE_SCHEMA = "doc_id long, media_type string, width int, height int, n_channels int"


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize the media table: (doc_id, media_type, payload, meta).

    ``payload`` is the UTF-8 bytes of the text (binary column — the
    engine treats it as opaque from here on); ``media_type`` cycles
    deterministically over image/audio/video by ``doc_id % 3``; ``meta``
    is a typed struct of fake-but-deterministic codec parameters.
    """
    mt = (
        F.when(F.col("doc_id") % 3 == 0, MEDIA_TYPES[0])
        .when(F.col("doc_id") % 3 == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )
    # Spread by doc_id before the pandas stages: decode/feature work is
    # CPU-bound per asset, so partition count — not input bytes — sets
    # the parallelism; a few big parquet files would otherwise serialize
    # every downstream mapInPandas batch on a handful of cores.
    spark = documents.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return documents.repartition(n, "doc_id").select(
        "doc_id",
        mt.alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (F.lit(16) + (F.col("doc_id") % 64)).cast("int").alias("width"),
            (F.lit(16) + (F.col("doc_id") % 48)).cast("int").alias("height"),
            (F.lit(8000) + (F.col("doc_id") % 4) * 4000).cast("int").alias("sample_rate"),
            F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def media_manifest(media: DataFrame) -> DataFrame:
    """Per-asset manifest (pure built-ins — no Python in the plan):
    payload length, frame count, metadata projection."""
    plen = F.length("payload").cast("long")
    return media.select(
        "doc_id",
        "media_type",
        plen.alias("payload_len"),
        F.ceil(plen / F.lit(FRAME_BYTES)).cast("long").alias("n_frames"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
    )


def media_feature_extract(media: DataFrame) -> DataFrame:
    """Byte-level feature extraction over Arrow batches (mapInPandas).

    Computes per-payload length, md5, and byte sum in pandas — the slot
    where a real pipeline decodes and embeds; here the features are
    deterministic so the DuckDB oracle can verify the full plumbing
    (schema, batching, null/empty handling) end-to-end.
    """
    import numpy as np

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = [bytes(b) if b is not None else b"" for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_len": [len(b) for b in payloads],
                    "payload_md5": [hashlib.md5(b).hexdigest() for b in payloads],
                    "byte_sum": [
                        int(np.frombuffer(b, dtype=np.uint8).sum()) for b in payloads
                    ],
                }
            )

    # consumed columns only — the unused meta struct should not ride
    # the Arrow exchange (same rationale as the stateful streams)
    return media.select("doc_id", "media_type", "payload").mapInPandas(
        extract, MEDIA_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    sample_every: int = FRAME_SAMPLE_EVERY,
) -> DataFrame:
    """Chunk video payloads into frames and keep every k-th (mapInPandas).

    One output row per sampled frame: (doc_id, frame_no, frame_md5,
    frame_len). The chunk/sample loop is the stand-in for a real
    keyframe extractor; fan-out is payload_len / (frame_bytes ×
    sample_every) rows per asset.
    """

    def frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple[int, int, str, int]] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for frame_no in range(0, -(-len(b) // frame_bytes), sample_every):
                    chunk = b[frame_no * frame_bytes : (frame_no + 1) * frame_bytes]
                    rows.append(
                        (doc_id, frame_no, hashlib.md5(chunk).hexdigest(), len(chunk))
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_md5", "frame_len"])

    return (
        media.filter(F.col("media_type") == "video")
        .select("doc_id", "payload")
        .mapInPandas(frames, FRAME_SAMPLE_SCHEMA)
    )


def decode_media(media: DataFrame, *, deterministic_fake: bool = False) -> DataFrame:
    """Decode payloads to pixel/sample dimensions.

    Dispatch: with ``deterministic_fake=True`` the fake decoder derives
    width/height/channels from payload bytes so the mapInPandas
    plumbing (batch shape, schema, partition independence) is
    exercised exactly as a real decoder would be. Otherwise the REAL
    path runs — PIL decodes each payload inside the same Arrow-batched
    stage (undecodable payloads yield NULL dims rather than failing
    the task, the quarantine-not-crash rule for dirty corpora) — and
    only if PIL is absent from the environment does the call raise
    ``NotImplementedError`` (the container-forced stub case).
    """
    if not deterministic_fake:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "media decode requires codec libraries (PIL/soundfile/ffmpeg) "
                "not present in this environment; pass deterministic_fake=True "
                "for the test decoder"
            ) from exc

        def pil_decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            from io import BytesIO

            import pandas as pd
            from PIL import Image

            for pdf in batches:
                rows: list[tuple] = []
                for doc_id, media_type, payload in zip(
                    pdf["doc_id"], pdf["media_type"], pdf["payload"]
                ):
                    b = bytes(payload) if payload is not None else b""
                    try:
                        with Image.open(BytesIO(b)) as img:
                            w, h = img.size
                            rows.append((doc_id, media_type, w, h, len(img.getbands())))
                    except Exception:
                        rows.append((doc_id, media_type, None, None, None))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media_type", "width", "height", "n_channels"]
                )

        return media.select("doc_id", "media_type", "payload").mapInPandas(
            pil_decode, DECODE_SCHEMA
        )

    def fake_decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, media_type, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(b).digest()
                out.append(
                    (
                        doc_id,
                        media_type,
                        16 + digest[0] % 240,
                        16 + digest[1] % 240,
                        1 + digest[2] % 4,
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "media_type", "width", "height", "n_channels"]
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        fake_decode, DECODE_SCHEMA
    )
