import pytest
import ray
import ray.data


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def tiny_corpus(sf_dir):
    from ethereum_etl_ray.sources.synth import ensure_corpus

    return ensure_corpus(sf_dir, events_per_doc=6.0)


@pytest.fixture(scope="session")
def tiny_oracle(tiny_corpus):
    """Sequential-replay oracle state for the tiny corpus."""
    import glob

    import pyarrow.parquet as pq

    from ethereum_etl_ray.state.oracle import sequential_replay

    events = [pq.read_table(f) for d in tiny_corpus.event_dirs
              for f in sorted(glob.glob(d + "/*.parquet"))]
    snap = pq.read_table(glob.glob(tiny_corpus.snapshot_dir + "/*.parquet")[0])
    return sequential_replay(events, snap)
