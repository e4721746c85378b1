"""Data-quality profiling: one-pass column audit over any Dataset.

The operational "expectations" check a 100 TB lake needs before training on
it (null rates, value ranges, key-uniqueness violations) — the reference's
only analogue is manual `inspect` eyeballing
(`src/repositories/sqlite/base.py:26-52`). One streaming pass; each batch
reduces to ONE summary row per column (a combiner — O(#batches × #columns)
tiny rows to the final merge, never data).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def profile_table(ds: ray.data.Dataset, columns: list[str] | None = None) -> pa.Table:
    """Per-column profile: row count, null count, min, max (as strings —
    type-uniform across columns; numeric columns keep their natural
    formatting via Python ``str``). Min/max of empty/all-null columns are
    null. Exact, combiner-shaped, single pass."""
    if columns is None:
        columns = list(ds.schema().names)

    def summarize(t: pa.Table) -> pa.Table:
        rows = []
        for c in columns:
            col = t.column(c)
            mn = mx = None
            if t.num_rows and col.null_count < len(col):
                mm = pc.min_max(col)
                mn, mx = mm["min"].as_py(), mm["max"].as_py()
            rows.append({"column": c, "n": t.num_rows,
                         "nulls": col.null_count,
                         "min": None if mn is None else str(mn),
                         "max": None if mx is None else str(mx)})
        return pa.Table.from_pylist(rows)

    parts = (ds.select_columns(columns)
             .map_batches(summarize, batch_format="pyarrow",
                          zero_copy_batch=True)
             .to_pandas())
    out_rows = []
    for c in columns:
        p = parts[parts.column == c]
        mins = p["min"].dropna()
        maxs = p["max"].dropna()
        out_rows.append({
            "column": c,
            "n": int(p.n.sum()),
            "nulls": int(p.nulls.sum()),
            # string min/max of per-batch extrema is NOT the value min/max
            # for numerics ("10" < "9") — re-derive via original typing is
            # overkill here; instead keep per-batch extrema and reduce in
            # the VALUE domain below
            "min": None, "max": None,
            "_mins": list(mins), "_maxs": list(maxs),
        })
    # reduce extrema in the value domain using the dataset schema
    schema = ds.schema()
    for row in out_rows:
        idx = list(schema.names).index(row["column"])
        typ = schema.types[idx]
        if not isinstance(typ, pa.DataType):  # pandas-block datasets report
            try:                              # numpy dtypes (cf. cogroup_join)
                typ = pa.from_numpy_dtype(typ)
            except (pa.ArrowNotImplementedError, TypeError):
                typ = pa.string()
        if row["_mins"]:
            try:
                row["min"] = str(pc.min(pc.cast(pa.array(row["_mins"]),
                                                typ)).as_py())
                row["max"] = str(pc.max(pc.cast(pa.array(row["_maxs"]),
                                                typ)).as_py())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, ValueError):
                row["min"] = min(row["_mins"])  # lexicographic fallback
                row["max"] = max(row["_maxs"])
        del row["_mins"], row["_maxs"]
    return pa.Table.from_pylist(out_rows)


def key_violations(ds: ray.data.Dataset, key_cols: list[str]) -> pa.Table:
    """Primary-key uniqueness audit: keys appearing more than once, with
    their duplicate counts — the constraint behind every upsert merge
    (SURVEY §1.4). Batch-local pair aggregation bounds the shuffle by
    distinct keys per batch, then one hash aggregate."""
    def local(t: pa.Table) -> pa.Table:
        agged = t.select(key_cols).group_by(key_cols).aggregate([([], "count_all")])
        rename = {"count_all": "n"}
        return agged.rename_columns([rename.get(c, c)
                                     for c in agged.column_names])

    from ray.data.aggregate import Sum

    partial = ds.map_batches(local, batch_format="pyarrow",
                             zero_copy_batch=True)
    agged = partial.groupby(key_cols).aggregate(Sum("n", alias_name="n"))

    def keep_dups(t: pa.Table) -> pa.Table:
        t = pa.table({**{k: t.column(k) for k in key_cols},
                      "n": pc.cast(t.column("n"), pa.int64())})
        return t.filter(pc.greater(t.column("n"), pa.scalar(1, pa.int64())))

    return agged.map_batches(keep_dups, batch_format="pyarrow")
