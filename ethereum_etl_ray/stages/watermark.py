"""Watermark semantics for bounded-disorder event streams.

Streaming engines discard (or route to a side output) events that arrive
more than ``allowed_lateness`` behind the high-water mark — the running
maximum event time in ARRIVAL order. The reference has no watermark at all
(SURVEY §2.8: ordering comes solely from block numbers); a webtext CDC
stream needs one wherever windowed aggregates must seal.

The running max over a total arrival order is inherently sequential, so it
distributes with the two-phase prefix pattern (cf. the distributed prefix
sum in ``stages/packing.py``):

  phase A  one streaming pass emits per-(arrival-range bucket) max event
           time — O(buckets) rows; the driver prefix-maxes the sorted
           bucket summaries into an exclusive carry-in per bucket
           (O(buckets) driver state, ``ray.put`` once);
  phase B  one ``groupby(bucket).map_groups``: sort the bucket by arrival
           id, vectorized cummax fused with the carry-in → per-event hwm →
           keep ``etime >= hwm - allowed_lateness``.

The hwm includes the current event (a row can never be late against
itself), matching ``max(...) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)``
— the SQL-oracle formulation. Exact integer microseconds end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Max


def watermark_filter(ds: ray.data.Dataset, *, order_col: str,
                     time_us_col: str, allowed_lateness_us: int,
                     bucket_width: int = 65_536) -> ray.data.Dataset:
    """Drop events later than ``allowed_lateness_us`` behind the high-water
    mark taken in ``order_col`` arrival order. Returns kept rows with their
    original columns. ``order_col`` must be unique, non-null integers
    (arrival sequence); ``time_us_col`` int64 event time."""

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.divide(pc.cast(t.column(order_col), pa.int64()),
                      pa.scalar(bucket_width, pa.int64()))
        return t.append_column("__wm_bucket", pc.cast(b, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # phase A: per-bucket max event time (combiner → tiny hash agg), then
    # an exclusive prefix max on the driver — O(buckets) rows only
    summaries = (bucketed
                 .groupby("__wm_bucket")
                 .aggregate(Max(time_us_col, alias_name="bmax"))
                 .to_pandas().sort_values("__wm_bucket"))
    bmax = summaries.bmax.to_numpy(dtype=np.int64)
    carry_vals = np.concatenate(
        ([np.iinfo(np.int64).min], np.maximum.accumulate(bmax)[:-1]))
    carry_ref = ray.put(dict(zip(
        summaries["__wm_bucket"].astype(np.int64), carry_vals)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        carry = ray.get(carry_ref)
        g = g.sort_values(order_col, kind="stable")
        et = g[time_us_col].to_numpy(dtype=np.int64)
        hwm = np.maximum.accumulate(et)
        c = carry[int(g["__wm_bucket"].iat[0])]
        np.maximum(hwm, c, out=hwm)
        keep = et >= hwm - allowed_lateness_us
        return g.loc[keep].drop(columns="__wm_bucket")

    return bucketed.groupby("__wm_bucket").map_groups(
        per_bucket, batch_format="pandas")


def sequential_watermark_oracle(df: pd.DataFrame, *, order_col: str,
                                time_us_col: str,
                                allowed_lateness_us: int) -> pd.DataFrame:
    """Single-process reference: the literal streaming semantics."""
    df = df.sort_values(order_col, kind="stable").reset_index(drop=True)
    et = df[time_us_col].to_numpy(dtype=np.int64)
    hwm = np.maximum.accumulate(et)
    return df.loc[et >= hwm - allowed_lateness_us].reset_index(drop=True)
