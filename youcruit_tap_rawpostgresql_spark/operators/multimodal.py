"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted via Arrow-batched ``mapInPandas``.

Image/audio/video decode libraries are not in this container, so the decode
step is a DETERMINISTIC STUB (clearly marked below); everything around it —
schema, batch iteration, partitioning, column pruning — is the real Spark
plumbing a production decode would use.

Scale: ``mapInPandas`` streams Arrow batches through the Python worker, so
memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (not
partition size); binary payloads never pass through the driver. For real
media, pair with ``spark.read.format("binaryFile")`` (see sources/binary.py)
and keep payload columns out of shuffles (extract features first, drop the
bytes before any wide transform).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width bigint, fake_height bigint, "
    "checksum string"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: payload as ``binary`` + typed metadata.

    (The fixtures have no real media, so the payload is the UTF-8 encoding
    of the text column — an opaque byte blob as far as the pipeline cares.)
    """
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.length(F.col(text_col)).alias("n_chars"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB DECODER — deterministic fake in place of e.g. PIL/ffmpeg.

    A real implementation would do ``Image.open(io.BytesIO(payload))`` per
    row here; the Arrow batch shape, output schema, and per-batch memory
    profile are identical. Raising ``NotImplementedError`` for genuinely
    unsupported codecs is the intended pattern for partial decoders.
    """
    import hashlib

    for pdf in batches:
        n_bytes = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                # fake "dimensions" derived deterministically from size
                "fake_width": n_bytes % 640,
                "fake_height": n_bytes % 480,
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
        )


def decode_payloads(binary_df: DataFrame) -> DataFrame:
    """Run the (stub) decoder over Arrow batches."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=DECODED_SCHEMA
    )
