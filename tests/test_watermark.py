"""Watermark late-event discard: distributed two-phase prefix max must equal
the literal sequential streaming semantics on adversarial disorder."""

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.watermark import (
    sequential_watermark_oracle,
    watermark_filter,
)


def _disordered(n=20_000, seed=3) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = np.arange(n, dtype=np.int64) * 1_000_000  # 1 event/sec
    # 5% of events are 10min-2h late; a few are early outliers that
    # advance the hwm far ahead and doom everything behind them
    late = rng.random(n) < 0.05
    base[late] -= rng.integers(600, 7200, late.sum()) * 1_000_000
    jump = rng.random(n) < 0.001
    base[jump] += 3600 * 1_000_000
    return pd.DataFrame({"eid": np.arange(n, dtype=np.int64),
                         "etime_us": base,
                         "payload": rng.integers(0, 100, n)})


LATENESS = 30 * 60 * 1_000_000  # 30 min


def _run(df, bucket_width, parts=9):
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=7)
                              ).repartition(parts)
    out = watermark_filter(ds, order_col="eid", time_us_col="etime_us",
                           allowed_lateness_us=LATENESS,
                           bucket_width=bucket_width).to_pandas()
    return out.sort_values("eid").reset_index(drop=True)


def test_matches_sequential_oracle():
    df = _disordered()
    want = sequential_watermark_oracle(df, order_col="eid",
                                       time_us_col="etime_us",
                                       allowed_lateness_us=LATENESS)
    got = _run(df, bucket_width=1024)
    pd.testing.assert_frame_equal(got[["eid", "etime_us", "payload"]],
                                  want[["eid", "etime_us", "payload"]])
    assert 0 < len(got) < len(df)  # some, not all, events dropped


def test_bucket_width_invariance():
    df = _disordered(8000, seed=11)
    a = _run(df, bucket_width=256, parts=3)
    b = _run(df, bucket_width=8192, parts=12)
    pd.testing.assert_frame_equal(a, b)


def test_monotone_stream_keeps_everything():
    n = 5000
    df = pd.DataFrame({"eid": np.arange(n, dtype=np.int64),
                       "etime_us": np.arange(n, dtype=np.int64) * 1_000_000,
                       "payload": 0})
    got = _run(df, bucket_width=512)
    assert len(got) == n


def test_cross_bucket_carry():
    # one early spike in bucket 0 must doom late events in LATER buckets
    df = pd.DataFrame({
        "eid": np.arange(6, dtype=np.int64),
        "etime_us": np.asarray(
            [0, 10_000_000_000, 1_000_000, 2_000_000,
             10_000_000_001, 3_000_000], np.int64),
        "payload": 0})
    want = sequential_watermark_oracle(df, order_col="eid",
                                       time_us_col="etime_us",
                                       allowed_lateness_us=LATENESS)
    got = _run(df, bucket_width=2, parts=2)
    assert got.eid.tolist() == want.eid.tolist() == [0, 1, 4]


def test_negative_order_values():
    """Floor division (not truncation) must keep bucket order monotone in
    the arrival order when order ids span negative values — truncation
    folded -width..width-1 into bucket 0 and corrupted the prefix carry."""
    df = _disordered(n=8_000)
    df["eid"] = df["eid"] - 4_000  # arrival ids -4000..3999
    got = _run(df, bucket_width=512)
    want = sequential_watermark_oracle(
        df, order_col="eid", time_us_col="etime_us",
        allowed_lateness_us=LATENESS)
    pd.testing.assert_frame_equal(
        got, want.sort_values("eid").reset_index(drop=True))
