"""Schema-evolution conform stage tests (stages.conform)."""

import pyarrow as pa
import pytest

from ethereum_etl_ray.schemas import (
    EVENTS_SCHEMA_V1,
    EVENTS_SCHEMA_V2,
    SchemaEvolutionError,
)
from ethereum_etl_ray.stages.conform import conform_table


def _v1_table():
    return pa.table({
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["insert", "delete"]),
        "url": pa.array(["u1", "u2"]),
        "warc_ts": pa.array([0, 1], pa.timestamp("us")),
        "html": pa.array([b"a", None], pa.binary()),
        "lang": pa.array(["en", None], pa.string()),
        "content_len": pa.array([1, 0], pa.int32()),
    }, schema=EVENTS_SCHEMA_V1)


def test_conform_v1_to_v2_adds_and_widens():
    out = conform_table(_v1_table(), EVENTS_SCHEMA_V2)
    assert out.schema.equals(EVENTS_SCHEMA_V2)
    assert out["fetch_status"].null_count == 2          # added column → nulls
    assert out["content_len"].type == pa.int64()        # widened
    assert out["lang"].type == pa.large_string()        # widened
    assert out["lang"].to_pylist() == ["en", None]


def test_conform_identity_on_latest():
    v1 = _v1_table()
    out = conform_table(v1, EVENTS_SCHEMA_V1)
    assert out.equals(v1)


def test_conform_rejects_narrowing():
    t = pa.table({"seq": pa.array([1], pa.int64())})
    target = pa.schema([pa.field("seq", pa.int32())])
    with pytest.raises(SchemaEvolutionError):
        conform_table(t, target)


def test_conform_rejects_undeclared_extra_columns():
    t = pa.table({"seq": pa.array([1], pa.int64()), "rogue": pa.array([1])})
    target = pa.schema([pa.field("seq", pa.int64())])
    with pytest.raises(SchemaEvolutionError):
        conform_table(t, target)
    out = conform_table(t, target, allow_extra=True)
    assert out.column_names == ["seq"]


def test_conform_incompatible_type_raises():
    t = pa.table({"seq": pa.array(["not-an-int"])})
    target = pa.schema([pa.field("seq", pa.int64())])
    with pytest.raises(SchemaEvolutionError):
        conform_table(t, target)
