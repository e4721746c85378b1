"""Vectorized wire-format encoders shared by the streaming sink
(``stages.sinks``) and the JSONL adapter (``sources.jsonl``).

JSON is a text format, so the classic implementation is a Python loop over
rows (the reference serializes per record, ``src/tasks/export/nats.py:11-29``
/ ``src/clients/rpc_client.py:60-117``). These helpers keep the hot columns
on Arrow kernels instead:

  * ``hex_utf8`` — binary → lowercase-hex utf8 with ONE ``binascii.hexlify``
    call over the column's value buffer and pure offset arithmetic (the
    output StringArray is assembled with ``Array.from_buffers``; no per-row
    Python objects exist at any point).
  * ``iso_utf8`` — naive timestamp → ISO-8601 strings matching
    ``datetime.isoformat()`` byte-for-byte (microseconds printed only when
    non-zero), via two vectorized ``np.datetime_as_string`` passes.
  * ``json_fragments`` — one column → JSON value literals (utf8 array,
    nulls → ``"null"``), vectorized for string/binary/int/bool/timestamp
    columns; returns None for types that need the per-value fallback
    (floats — Arrow's shortest-repr differs from Python's, e.g. ``1`` vs
    ``1.0`` — tz-aware timestamps, nested types, strings that contain
    JSON-escapable characters).
"""

from __future__ import annotations

import binascii
import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# exactly the characters json.dumps(ensure_ascii=False) escapes
_JSON_ESCAPE_RE = '["\\\\\\x00-\\x1f]'


def _plain(col) -> pa.Array:
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def hex_utf8(col) -> pa.Array:
    """Binary column → utf8 hex (as ``bytes.hex()``), zero Python loops.

    Null slots come back as empty strings and must be masked by the caller
    (their value range is empty, so the hex buffer stays consistent)."""
    arr = _plain(col)
    width = np.int32 if pa.types.is_binary(arr.type) else np.int64
    offs = np.frombuffer(arr.buffers()[1], dtype=width)[
        arr.offset:arr.offset + len(arr) + 1]
    data = arr.buffers()[2]
    raw = (memoryview(data)[offs[0]:offs[-1]]
           if data is not None and offs[-1] > offs[0] else b"")
    hexed = binascii.hexlify(raw)
    new_offs = ((offs - offs[0]) * 2).astype(width)
    typ = pa.utf8() if width is np.int32 else pa.large_utf8()
    return pa.Array.from_buffers(
        typ, len(arr),
        [None, pa.py_buffer(new_offs.tobytes()), pa.py_buffer(bytes(hexed))])


def iso_utf8(col) -> pa.Array:
    """Naive timestamp column → ISO-8601 utf8, byte-identical to
    ``datetime.isoformat()`` (no fractional part when microseconds == 0,
    six digits otherwise). Nulls stay null."""
    arr = _plain(col)
    valid = pc.is_valid(arr)
    np_us = arr.cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
    full = np.datetime_as_string(np_us, unit="us")
    secs = np.datetime_as_string(np_us, unit="s")
    out = np.where(np.char.endswith(full, ".000000"), secs, full)
    return pc.if_else(valid, pa.array(out, pa.string()),
                      pa.scalar(None, pa.string())).combine_chunks() \
        if isinstance(valid, pa.ChunkedArray) else \
        pc.if_else(valid, pa.array(out, pa.string()), pa.scalar(None, pa.string()))


def json_value_fallback(v) -> str:
    """Per-value fallback rendering one JSON value literal — the same
    conversions the row-loop serializer applies (bytes → hex string,
    date/time → isoformat), nested dict keys sorted like
    ``json.dumps(sort_keys=True)``."""
    if isinstance(v, bytes):
        return json.dumps(v.hex(), ensure_ascii=False)
    if hasattr(v, "isoformat"):
        return json.dumps(v.isoformat(), ensure_ascii=False)
    return json.dumps(v, sort_keys=True, ensure_ascii=False)


def json_fragments(col) -> pa.Array | None:
    """JSON value literals for one column (utf8 array, nulls → ``null``),
    or None when the column type needs ``json_value_fallback``."""
    col = _plain(col)
    # normalize large_* widths: binary_join_element_wise has no kernel for
    # mixed (string, large_string, ...) inputs, and Ray blocks sometimes
    # carry large_string columns
    if pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.string())
    elif pa.types.is_large_binary(col.type):
        col = pc.cast(col, pa.binary())
    typ = col.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        if len(col) and pc.any(pc.match_substring_regex(
                col, _JSON_ESCAPE_RE)).as_py():
            return None  # rare: a value needs escaping → per-value fallback
        out = pc.binary_join_element_wise('"', col, '"', "")
    elif pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        quoted = pc.binary_join_element_wise('"', hex_utf8(col), '"', "")
        out = pc.if_else(pc.is_valid(col), quoted, pa.scalar(None, pa.string()))
    elif pa.types.is_integer(typ):
        out = pc.cast(col, pa.string())
    elif pa.types.is_boolean(typ):
        out = pc.if_else(col, pa.scalar("true"), pa.scalar("false"))
    elif pa.types.is_timestamp(typ) and typ.tz is None:
        quoted_iso = pc.binary_join_element_wise('"', iso_utf8(col), '"', "")
        out = quoted_iso
    else:
        return None  # floats (repr mismatch), nested, tz-aware, date, ...
    return pc.coalesce(out, pa.scalar("null"))


def json_lines(batch: pa.Table) -> pa.Array:
    """One JSON object per row (keys sorted, separators and escaping
    byte-identical to ``json.dumps(row, sort_keys=True,
    ensure_ascii=False)``), as a utf8 array — the columns are assembled with
    Arrow kernels; only escape-needing strings, floats and nested values
    drop to a per-value loop."""
    names = sorted(batch.column_names)
    if not names:
        return pa.array(["{}"] * batch.num_rows, pa.string())
    frags = []
    for name in names:
        col = batch.column(name)
        val = json_fragments(col)
        if val is None:
            val = pa.array(
                ["null" if v is None else json_value_fallback(v)
                 for v in col.to_pylist()], pa.string())
        frags.append(pc.binary_join_element_wise(
            json.dumps(name, ensure_ascii=False) + ": ", val, ""))
    body = frags[0] if len(frags) == 1 else \
        pc.binary_join_element_wise(*frags, ", ")
    return _plain(pc.binary_join_element_wise("{", body, "}", ""))
