"""Deterministic-shuffle rank tests (stages/shuffle.py). The driver query
`shuffle_rank` carries the DuckDB row_number oracle; these pin determinism
across partitionings and the 2-byte bucket route."""

import hashlib

import pyarrow as pa
import ray.data

from ethereum_etl_ray.stages.shuffle import deterministic_shuffle


def _ds(ids, npart=1):
    t = pa.table({"doc_id": pa.array(ids, pa.int64())})
    ds = ray.data.from_arrow(t)
    return ds.repartition(npart) if npart > 1 else ds


def _expected(ids):
    return {i: r + 1 for r, i in enumerate(
        sorted(ids, key=lambda i: hashlib.md5(str(i).encode()).hexdigest()))}


def test_rank_is_total_permutation(ray_session):
    ids = list(range(200))
    out = deterministic_shuffle(_ds(ids, npart=5)).to_pandas()
    assert sorted(out.pos) == list(range(1, 201))
    want = _expected(ids)
    assert all(want[r.doc_id] == r.pos for r in out.itertuples())


def test_rank_stable_across_partitionings(ray_session):
    ids = list(range(0, 1000, 3))
    a = deterministic_shuffle(_ds(ids, npart=1)).to_pandas().set_index("doc_id").pos
    b = deterministic_shuffle(_ds(ids, npart=7)).to_pandas().set_index("doc_id").pos
    assert a.sort_index().equals(b.sort_index())


def test_two_byte_bucket_route_matches(ray_session):
    ids = list(range(500))
    a = deterministic_shuffle(_ds(ids, 4), prefix_bytes=1).to_pandas()
    b = deterministic_shuffle(_ds(ids, 4), prefix_bytes=2).to_pandas()
    assert a.set_index("doc_id").pos.sort_index().equals(
        b.set_index("doc_id").pos.sort_index())


def test_extra_columns_carried(ray_session):
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "lang": ["en", "de", "fr"]})
    out = deterministic_shuffle(ray.data.from_arrow(t)).to_pandas()
    assert set(out.columns) == {"doc_id", "lang", "pos"}
    assert set(out.lang) == {"en", "de", "fr"}
