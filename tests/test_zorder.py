"""Z-order layout: box queries must be exact AND touch far fewer files than
the file count (the data-skipping claim), on skewed and uniform data."""

import shutil

import numpy as np
import pandas as pd
import ray.data

from ethereum_etl_ray.stages.zorder import zorder_read, zorder_write

OUT = "/tmp/webcdc_zorder_test"


def _df(n=60_000, seed=2) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "x": rng.uniform(0, 1000, n),
        "y": rng.lognormal(3.0, 1.0, n),  # skewed — equi-depth must absorb it
        "payload": np.arange(n, dtype=np.int64),
    })


def test_box_query_exact_and_pruned():
    df = _df()
    shutil.rmtree(OUT, ignore_errors=True)
    ds = ray.data.from_pandas(df).repartition(8)
    n_files = zorder_write(ds, OUT, ["x", "y"], bits=8, num_files=64)
    assert n_files >= 32

    box = {"x": (100.0, 200.0), "y": (10.0, 30.0)}
    out, kept, total = zorder_read(OUT, box)
    got = out.to_pandas().sort_values("payload").reset_index(drop=True)
    want = df[(df.x >= 100) & (df.x <= 200) & (df.y >= 10) & (df.y <= 30)]
    want = want.sort_values("payload").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["x", "y", "payload"]], want[["x", "y", "payload"]])
    # the point of the layout: a ~10%x~25% box touches a minority of files
    assert kept < total / 2, (kept, total)
    assert total == n_files


def test_single_column_predicate_also_prunes():
    df = _df(30_000, seed=5)
    shutil.rmtree(OUT, ignore_errors=True)
    zorder_write(ray.data.from_pandas(df), OUT, ["x", "y"], bits=8,
                 num_files=64)
    out, kept, total = zorder_read(OUT, {"x": (0.0, 50.0)})
    got = out.to_pandas()
    assert len(got) == (df.x <= 50.0).sum()
    assert kept < total  # even one clustered column prunes


def test_empty_box():
    df = _df(5_000, seed=8)
    shutil.rmtree(OUT, ignore_errors=True)
    zorder_write(ray.data.from_pandas(df), OUT, ["x", "y"], bits=6,
                 num_files=16)
    out, kept, total = zorder_read(OUT, {"x": (2000.0, 3000.0)})
    assert kept == 0 and out.count() == 0


def test_zorder_write_guards():
    """bits*cols > 64 and non-power-of-two num_files must fail loudly
    instead of silently corrupting the z key / under-using file ids."""
    import pytest
    import ray.data

    from ethereum_etl_ray.stages.zorder import zorder_write

    ds = ray.data.range(10)
    cols9 = [f"c{i}" for i in range(9)]
    with pytest.raises(ValueError, match="64-bit z key"):
        zorder_write(ds, "/tmp/zg1", cols9, bits=8)
    with pytest.raises(ValueError, match="power of two"):
        zorder_write(ds, "/tmp/zg2", ["id"], bits=8, num_files=48)
