"""Skew handling: salted two-stage reduce ≡ direct LWW; skewed replay ≡ oracle."""

import datetime as dt
import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ethereum_etl_ray.config import EngineConfig
from ethereum_etl_ray.pipelines.replay import load_lake, replay
from ethereum_etl_ray.sources.synth import ensure_corpus
from ethereum_etl_ray.stages.merge import MERGE_SCHEMA, lww_pick, salted_reduce
from ethereum_etl_ray.state.oracle import sequential_replay


def _frame(n_hot=500, n_cold=50):
    rows = []
    for i in range(n_hot):
        rows.append(("hot-url", dt.datetime(2024, 3, 1) + dt.timedelta(seconds=i), i,
                     "update", b"h%d" % i, "en", None))
    for i in range(n_cold):
        rows.append((f"cold-{i}", dt.datetime(2024, 3, 1), n_hot + i,
                     "insert", b"c%d" % i, "en", None))
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "op": pa.array([r[3] for r in rows]),
            "html": pa.array([r[4] for r in rows], pa.binary()),
            "lang": pa.array([r[5] for r in rows], pa.large_string()),
            "text": pa.array([r[6] for r in rows], pa.string()),
            "fetch_status": pa.nulls(len(rows), pa.int32()),
        },
        schema=MERGE_SCHEMA,
    )


def test_salted_reduce_equals_direct_pick():
    t = _frame()
    ds = ray.data.from_arrow(t)
    salted = salted_reduce(ds, num_salts=4).to_pandas().sort_values("url")
    direct = lww_pick(t).to_pandas().sort_values("url")
    for col in ("url", "seq", "html"):
        assert salted[col].tolist() == direct[col].tolist()
    assert salted[salted.url == "hot-url"].seq.iloc[0] == 499


@pytest.fixture(scope="module")
def skewed_corpus(sf_dir):
    # extreme Zipf: a handful of urls dominate → exercises the hot path
    return ensure_corpus(sf_dir, events_per_doc=8.0, zipf_s=2.5)


def test_skewed_replay_with_detection_matches_oracle(skewed_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("skewlake"))
    cfg = EngineConfig(num_partitions=8, skew_detect=True,
                       skew_sample_fraction=0.5, skew_hot_threshold=0.02)
    replay(skewed_corpus, out, cfg)
    events = [pq.read_table(f) for d in skewed_corpus.event_dirs
              for f in sorted(glob.glob(d + "/*.parquet"))]
    snap = pq.read_table(glob.glob(skewed_corpus.snapshot_dir + "/*.parquet")[0])
    oracle = sequential_replay(events, snap)
    df = load_lake(out).to_pandas()
    assert dict(zip(df.url, df.text)) == {u: o["text"] for u, o in oracle.items()}
