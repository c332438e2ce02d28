"""Binary-file source: ingest opaque media files as rows (multimodal scan).

``spark.read.format("binaryFile")`` yields (path, modificationTime, length,
content) — the standard way to get image/audio/video bytes into a DataFrame.
Scale: one task per file (or per split for large files via
``maxPartitionBytes``); pair with ``pathGlobFilter`` to prune by extension
at the listing stage, long before any bytes are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
