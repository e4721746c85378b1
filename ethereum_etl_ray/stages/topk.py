"""Global top-k without a global sort.

``Dataset.sort().limit(k)`` is an all-to-all shuffle of the whole table for a
handful of rows. This operator keeps it map-side: every batch keeps only its
local top-k (one Arrow ``sort_by`` + slice), so the driver reduce sees at
most ``#batches × k`` rows — O(k · N / batch_size) instead of O(N) moved.

The same partial-top-k shape as ``stages.ann._PartialTopK`` (scores) —
generalized to arbitrary sort columns. Absent in the reference (SURVEY §2.8);
standard top-k-at-scale pattern.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data


def topk(
    ds: ray.data.Dataset,
    cols: list[str],
    k: int,
    descending: list[bool] | bool = True,
) -> pd.DataFrame:
    """Exact global top-k rows of ``ds`` ordered by ``cols``."""
    if isinstance(descending, bool):
        descending = [descending] * len(cols)
    keys = [(c, "descending" if d else "ascending")
            for c, d in zip(cols, descending)]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows > k:
            t = t.sort_by(keys).slice(0, k)
        return t

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    ascending = [not d for d in descending]
    return (parts.sort_values(cols, ascending=ascending, kind="stable")
            .head(k).reset_index(drop=True))
