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
                     bucket_width: int = 65_536, keep: bool = True,
                     carry_in_us: int | None = None) -> ray.data.Dataset:
    """Drop events later than ``allowed_lateness_us`` behind the high-water
    mark taken in ``order_col`` arrival order. Returns kept rows with their
    original columns. ``order_col`` must be unique, non-null integers
    (arrival sequence); ``time_us_col`` int64 event time.

    ``keep=False`` returns the complement — the LATE rows — for side-output
    routing (CDC tail dead-letter analogue). ``carry_in_us`` seeds the
    running high-water mark so a tailer can continue the stream across
    bounded windows: pass the max event time of all PRIOR windows (the hwm
    advances on every arrival, late or not)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        # numpy floor division, NOT Arrow divide: Arrow truncates toward
        # zero, which would fold negative order values into bucket 0 with
        # 0..width-1 and break the arrival-order prefix-max carry; floor
        # division is monotone in the order value for any sign (ADVICE r4)
        o = pc.cast(t.column(order_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        b = np.floor_divide(o, np.int64(bucket_width))
        return t.append_column("__wm_bucket", pa.array(b, pa.int64()))

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # phase A: per-bucket max event time (combiner → tiny hash agg), then
    # an exclusive prefix max on the driver — O(buckets) rows only
    summaries = (bucketed
                 .groupby("__wm_bucket")
                 .aggregate(Max(time_us_col, alias_name="bmax"))
                 .to_pandas().sort_values("__wm_bucket"))
    bmax = summaries.bmax.to_numpy(dtype=np.int64)
    carry0 = np.iinfo(np.int64).min if carry_in_us is None else int(carry_in_us)
    carry_vals = np.concatenate(
        ([carry0], np.maximum.accumulate(bmax)[:-1]))
    if carry_in_us is not None:
        np.maximum(carry_vals, carry0, out=carry_vals)
    carry_ref = ray.put(dict(zip(
        summaries["__wm_bucket"].astype(np.int64), carry_vals)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        carry = ray.get(carry_ref)
        g = g.sort_values(order_col, kind="stable")
        et = g[time_us_col].to_numpy(dtype=np.int64)
        hwm = np.maximum.accumulate(et)
        c = carry[int(g["__wm_bucket"].iat[0])]
        np.maximum(hwm, c, out=hwm)
        mask = et >= hwm - allowed_lateness_us
        return g.loc[mask if keep else ~mask].drop(columns="__wm_bucket")

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
