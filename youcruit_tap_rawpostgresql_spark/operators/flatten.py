"""Schema flattening (reference R2): nested structs → flat ``a__b`` columns.

The reference inherits the Singer SDK flattening capability
(``tap.py:257``, ``README.md:37-38``): nested properties expand to flat
columns named with ``__`` separators up to ``flattening_max_depth``.
Columnar equivalent: a recursive projection of StructType fields — pure
metadata work for Catalyst, zero row-level cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flatten_fields(
    schema: T.StructType, prefix_path: list[str], depth_left: int | None
) -> list[tuple[str, Column]]:
    out: list[tuple[str, Column]] = []
    for field in schema.fields:
        path = prefix_path + [field.name]
        if isinstance(field.dataType, T.StructType) and (
            depth_left is None or depth_left > 0
        ):
            out.extend(
                _flatten_fields(
                    field.dataType,
                    path,
                    None if depth_left is None else depth_left - 1,
                )
            )
        else:
            out.append(("__".join(path), F.col(".".join(path))))
    return out


def flatten_struct_columns(df: DataFrame, max_depth: int | None = None) -> DataFrame:
    """Flatten all struct columns to ``parent__child`` flat columns.

    ``max_depth=None`` flattens fully; ``max_depth=N`` stops after N levels
    (deeper structs stay as struct-typed columns, matching the SDK's
    ``flattening_max_depth``).
    """
    pairs = _flatten_fields(df.schema, [], max_depth)
    return df.select(*[col.alias(name) for name, col in pairs])
