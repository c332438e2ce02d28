"""PG jsonb mutators (``jsonb_set`` / ``jsonb_insert`` /
``jsonb_strip_nulls``) over the engine's string-json model.

Spark's SQL surface has no json *mutation* builtins — ``to_json`` /
``from_json`` need a fixed schema and json path functions are
read-only — so these were named errors through round 10. The reference
surface is all of PG (``client.py:300-304`` ships user SQL verbatim),
and jsonb mutators are among the most-hit PG json functions, so they
are implemented here as an Arrow-batched pandas UDF over Python's json
module: the one place the engine deliberately leaves the JVM, because
the semantics (arbitrary-depth path walk over unknown-schema documents)
are not expressible as a Catalyst expression. The plain-Python cores
are separately importable and unit-pinned against PG 16 outputs.

Semantics follow PG's jsonfuncs.c setPath contract:

- all three are STRICT (any NULL argument → NULL result);
- paths are PG text[] literals (``'{a,b,2}'``, double-quoted segments
  honored); array indexes count from 0, negative from the end;
- **jsonb_set(target, path, new, create_missing=true)**: replaces the
  item at ``path``; if the LAST step is absent and ``create_missing``,
  the item is added (arrays: out-of-range index prepends/appends). All
  EARLIER steps must exist, or the target is returned unchanged.
  Setting through a scalar raises, like PG.
- **jsonb_insert(target, path, new, insert_after=false)**: arrays
  insert before (after) the index; object keys insert only when absent
  (PG raises ``cannot replace an existing object key``).
- **jsonb_strip_nulls(target)**: recursively removes object fields
  with null values; array elements are kept (PG docs §9.16).
- **operator family (round-12)**: ``jsonb_concat`` (``||`` — object
  merge, else one-element-array concatenation), ``jsonb_delete_key`` /
  ``jsonb_delete_index`` / ``jsonb_delete_path`` (``- text``,
  ``- int``, ``#-``), ``jsonb_contains`` (``@>``/``<@`` with PG's
  top-level array-contains-scalar exception and json-type-exact
  scalar equality).

Documented rendering deltas (module-header convention, same as the
json-construction family): output is COMPACT (no spaces after ``,`` /
``:``) where PG prints one space, and key order is INSERTION order
where PG's jsonb storage sorts keys by length-then-bytes. Values and
structure are exact.
"""

from __future__ import annotations

import decimal as _decimal
import json
from typing import Any

__all__ = [
    "jsonb_set_value",
    "jsonb_insert_value",
    "jsonb_strip_nulls_value",
    "jsonb_concat_value",
    "jsonb_delete_key_value",
    "jsonb_delete_index_value",
    "jsonb_delete_path_value",
    "jsonb_contains_value",
    "parse_pg_text_array",
    "register_jsonb_mutators",
]


def parse_pg_text_array(lit: str) -> list[str]:
    """Parse a PG text[] literal (``{a,b,2}``, ``{"a b",c}``) into its
    segments. Raises ValueError on malformed input, like PG's
    array_in."""
    s = lit.strip()
    if not (s.startswith("{") and s.endswith("}")):
        raise ValueError(f'malformed array literal: "{lit}"')
    body = s[1:-1]
    segs: list[str] = []
    i, n = 0, len(body)
    while i < n:
        while i < n and body[i] in " \t":
            i += 1
        if i >= n:
            if segs:
                raise ValueError(f'malformed array literal: "{lit}"')
            break
        if body[i] == '"':
            i += 1
            out = []
            while i < n and body[i] != '"':
                if body[i] == "\\" and i + 1 < n:
                    i += 1
                out.append(body[i])
                i += 1
            if i >= n:
                raise ValueError(f'malformed array literal: "{lit}"')
            i += 1  # closing quote
            segs.append("".join(out))
        else:
            start = i
            while i < n and body[i] != ",":
                i += 1
            segs.append(body[start:i].strip())
        while i < n and body[i] in " \t":
            i += 1
        if i < n:
            if body[i] != ",":
                raise ValueError(f'malformed array literal: "{lit}"')
            i += 1
            if i >= n:  # trailing comma
                raise ValueError(f'malformed array literal: "{lit}"')
    return segs


# PG jsonb stores numerics EXACTLY (numeric type); float-based
# json.loads would round past 17 significant digits, making distinct
# numerics compare equal in @>/<@ and re-serialize rounded through ||
# (round-12 advisor). Fractions parse to Decimal; ints are exact in
# Python natively. PG's jsonb rendering canonicalizes exponents away
# but KEEPS the input's fractional scale ('1.50' stays 1.50, '1e5'
# prints 100000) — format(d, 'f') is exactly that.


def _loads(s: str) -> Any:
    return json.loads(s, parse_float=_decimal.Decimal)


def _tag_in(node: Any, tag: str) -> bool:
    if isinstance(node, str):
        return tag in node
    if isinstance(node, dict):
        return any(
            _tag_in(k, tag) or _tag_in(v, tag) for k, v in node.items()
        )
    if isinstance(node, list):
        return any(_tag_in(v, tag) for v in node)
    return False


def _dumps(doc: Any) -> str:
    # Decimals serialize through a string placeholder (json.dumps has
    # no raw-token hook), then the quoted placeholders are spliced back
    # as bare numerics. The NUL-based tag is grown until no real string
    # in the document contains it, so data can never collide with a
    # placeholder.
    tag = "\x00jd"
    while _tag_in(doc, tag):
        tag += "\x00"
    toks: list[str] = []

    def enc(o: Any) -> str:
        if isinstance(o, _decimal.Decimal):
            toks.append(format(o, "f"))
            return f"{tag}{len(toks) - 1}{tag}"
        raise TypeError(type(o).__name__)

    s = json.dumps(
        doc, ensure_ascii=False, separators=(",", ":"), default=enc
    )
    # json.dumps escapes the tag's NUL chars inside the
    # quoted placeholder — match that rendering when splicing
    esc = tag.replace("\x00", "\\u0000")
    for i, t in enumerate(toks):
        s = s.replace(f'"{esc}{i}{esc}"', t)
    return s


def _array_index(seg: str) -> int:
    try:
        return int(seg)
    except ValueError:
        raise ValueError(
            f"path element is not an integer: {seg!r} "
            "(cannot index a json array with a text key, like PG)"
        )


def _set_path(node: Any, segs: list[str], val: Any, create: bool) -> Any:
    seg = segs[0]
    last = len(segs) == 1
    if isinstance(node, dict):
        if last:
            if seg in node or create:
                node = dict(node)
                node[seg] = val
            return node
        if seg not in node:
            return node  # earlier step absent → target unchanged (PG)
        node = dict(node)
        node[seg] = _set_path(node[seg], segs[1:], val, create)
        return node
    if isinstance(node, list):
        idx = _array_index(seg)
        pos = idx if idx >= 0 else len(node) + idx
        if last:
            node = list(node)
            if 0 <= pos < len(node):
                node[pos] = val
            elif create:
                if pos < 0:
                    node.insert(0, val)  # PG: below range → prepend
                else:
                    node.append(val)  # PG: beyond range → append
            return node
        if not (0 <= pos < len(node)):
            return node
        node = list(node)
        node[pos] = _set_path(node[pos], segs[1:], val, create)
        return node
    raise ValueError("cannot set path in scalar (PG jsonfuncs.c)")


def _insert_path(node: Any, segs: list[str], val: Any, after: bool) -> Any:
    seg = segs[0]
    last = len(segs) == 1
    if isinstance(node, dict):
        if last:
            if seg in node:
                raise ValueError(
                    "cannot replace existing key (PG jsonb_insert: use "
                    "jsonb_set to replace)"
                )
            node = dict(node)
            node[seg] = val
            return node
        if seg not in node:
            return node
        node = dict(node)
        node[seg] = _insert_path(node[seg], segs[1:], val, after)
        return node
    if isinstance(node, list):
        idx = _array_index(seg)
        pos = idx if idx >= 0 else len(node) + idx
        if last:
            if after:
                pos += 1
            pos = max(0, min(pos, len(node)))
            node = list(node)
            node.insert(pos, val)
            return node
        if not (0 <= pos < len(node)):
            return node
        node = list(node)
        node[pos] = _insert_path(node[pos], segs[1:], val, after)
        return node
    raise ValueError("cannot set path in scalar (PG jsonfuncs.c)")


def _strip_nulls(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _strip_nulls(v) for k, v in node.items() if v is not None}
    if isinstance(node, list):
        return [_strip_nulls(v) for v in node]
    return node


def jsonb_set_value(
    target: str | None,
    path: str | None,
    new_value: str | None,
    create_missing: bool | None = True,
) -> str | None:
    if target is None or path is None or new_value is None or create_missing is None:
        return None
    doc = _loads(target)
    segs = parse_pg_text_array(path)
    if not segs:
        return _dumps(doc)
    return _dumps(_set_path(doc, segs, _loads(new_value), bool(create_missing)))


def jsonb_insert_value(
    target: str | None,
    path: str | None,
    new_value: str | None,
    insert_after: bool | None = False,
) -> str | None:
    if target is None or path is None or new_value is None or insert_after is None:
        return None
    doc = _loads(target)
    segs = parse_pg_text_array(path)
    if not segs:
        return _dumps(doc)
    return _dumps(_insert_path(doc, segs, _loads(new_value), bool(insert_after)))


def jsonb_strip_nulls_value(target: str | None) -> str | None:
    if target is None:
        return None
    return _dumps(_strip_nulls(_loads(target)))


def jsonb_concat_value(a: str | None, b: str | None) -> str | None:
    """PG ``jsonb || jsonb`` (jsonfuncs.c jsonb_concat): two objects
    MERGE (right wins on duplicate keys); otherwise each non-array
    operand becomes a one-element array and the arrays concatenate
    (``'{"a":1}' || '[1]'`` → ``[{"a":1},1]``, scalars included)."""
    if a is None or b is None:
        return None
    da, db = _loads(a), _loads(b)
    if isinstance(da, dict) and isinstance(db, dict):
        return _dumps({**da, **db})
    la = da if isinstance(da, list) else [da]
    lb = db if isinstance(db, list) else [db]
    return _dumps(la + lb)


def jsonb_delete_key_value(j: str | None, key: str | None) -> str | None:
    """PG ``jsonb - text``: from an object, drop the key (absent key is
    a no-op); from an array, drop STRING elements equal to the text;
    scalar targets raise, like PG."""
    if j is None or key is None:
        return None
    d = _loads(j)
    if isinstance(d, dict):
        d.pop(key, None)
        return _dumps(d)
    if isinstance(d, list):
        return _dumps(
            [x for x in d if not (isinstance(x, str) and x == key)]
        )
    raise ValueError("cannot delete from scalar (PG jsonfuncs.c)")


def jsonb_delete_index_value(j: str | None, idx: int | None) -> str | None:
    """PG ``jsonb - integer``: delete the array element at the index
    (negative counts from the end; out of range is a no-op); objects
    and scalars raise, like PG."""
    if j is None or idx is None:
        return None
    d = _loads(j)
    if isinstance(d, dict):
        raise ValueError(
            "cannot delete from object using integer index (PG "
            "jsonfuncs.c)"
        )
    if not isinstance(d, list):
        raise ValueError("cannot delete from scalar (PG jsonfuncs.c)")
    pos = idx if idx >= 0 else len(d) + idx
    if 0 <= pos < len(d):
        d = d[:pos] + d[pos + 1 :]
    return _dumps(d)


def _delete_path(node: Any, segs: list[str]) -> Any:
    seg = segs[0]
    last = len(segs) == 1
    if isinstance(node, dict):
        if seg not in node:
            return node
        node = dict(node)
        if last:
            del node[seg]
        else:
            node[seg] = _delete_path(node[seg], segs[1:])
        return node
    if isinstance(node, list):
        idx = _array_index(seg)
        pos = idx if idx >= 0 else len(node) + idx
        if not (0 <= pos < len(node)):
            return node
        if last:
            return node[:pos] + node[pos + 1 :]
        node = list(node)
        node[pos] = _delete_path(node[pos], segs[1:])
        return node
    raise ValueError("cannot delete path in scalar (PG jsonfuncs.c)")


def jsonb_delete_path_value(j: str | None, path: str | None) -> str | None:
    """PG ``jsonb #- text[]``: delete the item at the path (missing
    steps and out-of-range indexes are no-ops; negative indexes count
    from the end)."""
    if j is None or path is None:
        return None
    segs = parse_pg_text_array(path)
    doc = _loads(j)
    if not segs:
        return _dumps(doc)
    return _dumps(_delete_path(doc, segs))


def _jsonb_contains(x: Any, y: Any, top: bool) -> bool:
    if isinstance(y, dict):
        return isinstance(x, dict) and all(
            k in x and _jsonb_contains(x[k], v, False)
            for k, v in y.items()
        )
    if isinstance(y, list):
        return isinstance(x, list) and all(
            any(_jsonb_contains(xe, ye, False) for xe in x) for ye in y
        )
    # scalar y; PG's documented top-level exception: an array contains
    # a bare scalar ('[1,2]' @> '1'), but only at the top level
    if isinstance(x, list):
        return top and any(
            not isinstance(xe, (dict, list))
            and not (isinstance(xe, bool) != isinstance(y, bool))
            and xe == y
            for xe in x
        )
    if isinstance(x, dict):
        return False
    if isinstance(x, bool) != isinstance(y, bool):
        return False
    return x == y


def jsonb_contains_value(a: str | None, b: str | None) -> bool | None:
    """PG ``jsonb @> jsonb`` containment (jsonb_containment semantics:
    objects need every key/value of the right side; arrays are
    order-insensitive multiset-style element containment; scalars
    compare json-type-exactly)."""
    if a is None or b is None:
        return None
    return _jsonb_contains(_loads(a), _loads(b), True)


def jsonb_each_entries_value(
    j: str | None, text_mode: bool, jsonb_order: bool
) -> list | None:
    """``json[b]_each[_text]`` deconstruction (PG jsonfuncs.c
    each_worker): one (key, value) entry per top-level object key.
    ``jsonb_order`` sorts keys the way jsonb storage does — byte length
    first, then bytewise — while the json variants keep input order
    (this string-modeled json collapses DUPLICATE keys to the last, the
    module-wide delta; PG's json_each would emit both). ``text_mode``
    unquotes string values and maps json null → SQL NULL; otherwise
    values re-serialize as json text with exact numerics. NULL input →
    NULL (zero rows after the inline/posexplode the dialect emits);
    non-object input raises like PG."""
    if j is None:
        return None
    doc = _loads(j)
    if not isinstance(doc, dict):
        raise ValueError(
            "cannot deconstruct a non-object with json_each/jsonb_each "
            "(PG raises the same error)"
        )
    items = list(doc.items())
    if jsonb_order:
        items.sort(key=lambda kv: (len(kv[0].encode()), kv[0].encode()))
    out = []
    for k, v in items:
        if text_mode:
            if v is None:
                out.append({"key": k, "value": None})
            elif isinstance(v, str):
                out.append({"key": k, "value": v})
            else:
                out.append({"key": k, "value": _dumps(v)})
        else:
            out.append({"key": k, "value": _dumps(v)})
    return out


def register_jsonb_mutators(spark) -> None:
    """Register the three mutators as session-scoped SQL functions.
    Arrow-batched pandas UDFs (never row-at-a-time ``udf()``): the
    per-element Python loop runs inside each Arrow batch, which is the
    engine's standard fallback where Catalyst has no expression. The
    dialect layer normalizes PG's optional 4th argument, so the SQL
    arity here is fixed."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _jsonb_set(t, p, v, c):
        return pd.Series(
            [
                jsonb_set_value(a, b, x, None if y is None else bool(y))
                for a, b, x, y in zip(t, p, v, c)
            ],
            dtype="object",
        )

    def _jsonb_insert(t, p, v, c):
        return pd.Series(
            [
                jsonb_insert_value(a, b, x, None if y is None else bool(y))
                for a, b, x, y in zip(t, p, v, c)
            ],
            dtype="object",
        )

    def _jsonb_strip_nulls(t):
        return pd.Series(
            [jsonb_strip_nulls_value(a) for a in t], dtype="object"
        )

    # real annotation OBJECTS (module uses postponed annotations, whose
    # strings pandas_udf's type-hint inference cannot resolve here)
    for fn, nargs in ((_jsonb_set, 4), (_jsonb_insert, 4), (_jsonb_strip_nulls, 1)):
        names = ["t", "p", "v", "c"][:nargs]
        fn.__annotations__ = {n: pd.Series for n in names}
        fn.__annotations__["return"] = pd.Series

    def _jsonb_concat(a, b):
        return pd.Series(
            [jsonb_concat_value(x, y) for x, y in zip(a, b)],
            dtype="object",
        )

    def _jsonb_delete_key(a, b):
        return pd.Series(
            [jsonb_delete_key_value(x, y) for x, y in zip(a, b)],
            dtype="object",
        )

    def _jsonb_delete_index(a, b):
        return pd.Series(
            [
                jsonb_delete_index_value(x, None if y is None else int(y))
                for x, y in zip(a, b)
            ],
            dtype="object",
        )

    def _jsonb_delete_path(a, b):
        return pd.Series(
            [jsonb_delete_path_value(x, y) for x, y in zip(a, b)],
            dtype="object",
        )

    def _jsonb_contains(a, b):
        return pd.Series(
            [jsonb_contains_value(x, y) for x, y in zip(a, b)],
            dtype="object",
        )

    for fn in (
        _jsonb_concat,
        _jsonb_delete_key,
        _jsonb_delete_index,
        _jsonb_delete_path,
        _jsonb_contains,
    ):
        fn.__annotations__ = {"a": pd.Series, "b": pd.Series,
                              "return": pd.Series}

    spark.udf.register("jsonb_set", pandas_udf(_jsonb_set, "string"))
    spark.udf.register("jsonb_insert", pandas_udf(_jsonb_insert, "string"))
    spark.udf.register(
        "jsonb_strip_nulls", pandas_udf(_jsonb_strip_nulls, "string")
    )
    # the jsonb OPERATOR family (round-12): || delete-key/index/path @>
    spark.udf.register("jsonb_concat", pandas_udf(_jsonb_concat, "string"))
    spark.udf.register(
        "jsonb_delete_key", pandas_udf(_jsonb_delete_key, "string")
    )
    spark.udf.register(
        "jsonb_delete_index", pandas_udf(_jsonb_delete_index, "string")
    )
    spark.udf.register(
        "jsonb_delete_path", pandas_udf(_jsonb_delete_path, "string")
    )
    spark.udf.register(
        "jsonb_contains", pandas_udf(_jsonb_contains, "boolean")
    )

    # json[b]_each[_text] entry arrays (round-13): the dialect layer
    # explodes these with inline()/posexplode — key order is jsonb's
    # (length, bytes) for the b-variants, input order for json_
    def _make_each(text_mode: bool, jsonb_order: bool):
        def _each(a):
            return pd.Series(
                [
                    jsonb_each_entries_value(x, text_mode, jsonb_order)
                    for x in a
                ],
                dtype="object",
            )

        _each.__annotations__ = {"a": pd.Series, "return": pd.Series}
        return _each

    each_type = "array<struct<key: string, value: string>>"
    spark.udf.register(
        "json_each_entries", pandas_udf(_make_each(False, False), each_type)
    )
    spark.udf.register(
        "json_each_text_entries",
        pandas_udf(_make_each(True, False), each_type),
    )
    spark.udf.register(
        "jsonb_each_entries", pandas_udf(_make_each(False, True), each_type)
    )
    spark.udf.register(
        "jsonb_each_text_entries",
        pandas_udf(_make_each(True, True), each_type),
    )
