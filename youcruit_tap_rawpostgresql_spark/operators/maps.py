"""Stream maps: config-driven per-record transforms (reference R1).

The reference inherits Singer SDK stream maps (capability ``tap.py:256``,
settings ``README.md:35-36``): add/derive columns from expressions, rename,
drop/keep columns, filter records, and hash/mask PII. Columnar equivalents
are withColumn/drop/filter; masking uses SHA-256 (``F.sha2``). All transforms
stay inside whole-stage codegen — no per-record Python.

Map config shape (a pragmatic subset of Singer's stream_maps):

    {
      "derive":  {"new_col": "<spark SQL expr>"},
      "rename":  {"old": "new"},
      "keep":    ["col", ...],          # keep-only (applied after derive)
      "drop":    ["col", ...],          # mutually exclusive with keep
      "mask":    ["col", ...],          # sha256-hash in place
      "filter":  "<spark SQL boolean expr>"
    }

Stream-level forms (Singer SDK parity, resolved by ``SparkTap``):
a map value of ``None`` SUPPRESSES the stream from sync; a map under a
NEW stream name with ``{"__source__": "existing", ...transforms}``
DUPLICATES/ALIASES the source stream under that name. ``__``-prefixed
keys are directives, ignored here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_stream_map(df: DataFrame, map_config: dict) -> DataFrame:
    """Apply one stream's map config to its DataFrame (``__`` directives
    like ``__source__`` are stream-level, handled by the tap)."""
    out = df
    for name, expr in (map_config.get("derive") or {}).items():
        out = out.withColumn(name, F.expr(expr))
    if map_config.get("filter"):
        out = out.filter(F.expr(map_config["filter"]))
    for col in map_config.get("mask") or []:
        out = out.withColumn(col, F.sha2(F.col(col).cast("string"), 256))
    for old, new in (map_config.get("rename") or {}).items():
        out = out.withColumnRenamed(old, new)
    keep = map_config.get("keep")
    if keep:
        out = out.select(*keep)
    else:
        for col in map_config.get("drop") or []:
            out = out.drop(col)
    return out
