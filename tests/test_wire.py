"""Vectorized wire encoders (functions.wire) — byte-identity against the
per-row reference serializer and the stdlib conversions they replace."""

import datetime
import json

import pyarrow as pa
import pytest

from ethereum_etl_ray.functions.wire import hex_utf8, iso_utf8, json_lines
from ethereum_etl_ray.stages.sinks import _serialize, _serialize_rows


def _gnarly_table() -> pa.Table:
    ts = [datetime.datetime(2026, 1, 1, 0, 0, 0),
          datetime.datetime(2026, 1, 1, 0, 0, 0, 120000),
          None,
          datetime.datetime(1999, 12, 31, 23, 59, 59, 1)]
    return pa.table({
        "url": ["https://a/1", "plain", None, "中文/ünïcode"],
        "quoted": ['say "hi"', "back\\slash", "tab\there", "nl\nline"],
        "payload": pa.array([b"\x00\xff", None, b"", b"abc"], pa.binary()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "n": pa.array([1, -5, None, 2**60], pa.int64()),
        "small": pa.array([1, None, 3, 4], pa.int16()),
        "flag": pa.array([True, False, None, True]),
        "score": pa.array([1.0, 0.1, None, -2.5e10], pa.float64()),
        "tags": pa.array([["a", "b"], [], None, ["c"]],
                         pa.list_(pa.string())),
    })


def test_serialize_byte_identical_to_row_loop():
    t = _gnarly_table()
    assert _serialize(t) == _serialize_rows(t)


def test_serialize_byte_identical_on_slices():
    t = _gnarly_table()
    for off, ln in [(0, 2), (1, 3), (2, 1), (3, 1)]:
        piece = t.slice(off, ln)
        assert _serialize(piece) == _serialize_rows(piece), (off, ln)


def test_serialize_empty_and_single_column():
    one = pa.table({"k": pa.array([7, None], pa.int64())})
    assert _serialize(one) == _serialize_rows(one)


def test_hex_utf8_matches_bytes_hex():
    vals = [bytes([i % 256]) * (i % 7) for i in range(300)]
    vals[5] = None
    arr = pa.array(vals, pa.binary())
    out = hex_utf8(arr).to_pylist()
    for v, h in zip(vals, out):
        if v is not None:
            assert h == v.hex()
    # sliced input (non-zero offset) must stay correct
    sl = arr.slice(100, 50)
    assert hex_utf8(sl).to_pylist() == [
        v.hex() if v is not None else "" for v in vals[100:150]]


def test_iso_utf8_matches_isoformat():
    vals = [datetime.datetime(2026, 2, 3, 4, 5, 6),
            datetime.datetime(2026, 2, 3, 4, 5, 6, 700000),
            datetime.datetime(2026, 2, 3, 4, 5, 6, 1),
            None]
    arr = pa.array(vals, pa.timestamp("us"))
    out = iso_utf8(arr).to_pylist()
    assert out == [v.isoformat() if v is not None else None for v in vals]


def test_json_lines_match_dumps():
    t = _gnarly_table()
    lines = json_lines(t).to_pylist()
    for line, row in zip(lines, t.to_pylist()):
        conv = {k: (v.hex() if isinstance(v, bytes) else
                    v.isoformat() if hasattr(v, "isoformat") else v)
                for k, v in row.items()}
        assert line == json.dumps(conv, sort_keys=True, ensure_ascii=False)
        # and every line parses back
        assert json.loads(line) == json.loads(
            json.dumps(conv, sort_keys=True, ensure_ascii=False))


@pytest.mark.parametrize("n", [0, 1])
def test_serialize_degenerate_row_counts(n):
    t = pa.table({"a": pa.array(list(range(n)), pa.int64())})
    assert _serialize(t) == _serialize_rows(t)


# ---------------------------------------------------------------------------
# property-based byte-identity: arbitrary rows through the vectorized
# serializer must match the row-loop reference exactly

from hypothesis import given, settings
from hypothesis import strategies as st

_texts = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40)
_cells = {
    "s": st.one_of(st.none(), _texts),
    "b": st.one_of(st.none(), st.binary(max_size=24)),
    "i": st.one_of(st.none(), st.integers(-2**62, 2**62)),
    "f": st.one_of(st.none(),
                   st.floats(allow_nan=False, allow_infinity=False)),
    "t": st.one_of(st.none(), st.datetimes(
        min_value=datetime.datetime(1700, 1, 1),
        max_value=datetime.datetime(2200, 1, 1))),
    "flag": st.one_of(st.none(), st.booleans()),
}


@settings(max_examples=60, deadline=None)
@given(st.lists(st.fixed_dictionaries(_cells), min_size=0, max_size=8))
def test_serialize_property_byte_identity(rows):
    t = pa.table({
        "s": pa.array([r["s"] for r in rows], pa.string()),
        "b": pa.array([r["b"] for r in rows], pa.binary()),
        "i": pa.array([r["i"] for r in rows], pa.int64()),
        "f": pa.array([r["f"] for r in rows], pa.float64()),
        "t": pa.array([r["t"] for r in rows], pa.timestamp("us")),
        "flag": pa.array([r["flag"] for r in rows], pa.bool_()),
    })
    assert _serialize(t) == _serialize_rows(t)


def test_json_lines_large_string_column():
    # Ray blocks sometimes carry large_string/large_binary columns; the
    # kernels must normalize widths instead of crashing
    import json as _json

    from ethereum_etl_ray.functions.wire import json_lines

    t = pa.table({
        "a": pa.array(["x", None, "y"], pa.large_string()),
        "b": pa.array([b"\x01", b"\x02", None], pa.large_binary()),
    })
    lines = [None if v is None else _json.loads(v)
             for v in json_lines(t).to_pylist()]
    assert lines[0] == {"a": "x", "b": "01"}
    assert lines[1] == {"a": None, "b": "02"}
    assert lines[2] == {"a": "y", "b": None}
