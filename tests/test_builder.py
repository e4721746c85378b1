"""Pipeline builder / extension-surface tests (pipelines.builder ↔ SURVEY §2.7)."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ethereum_etl_ray.pipelines.builder import (
    DECODERS,
    SINKS,
    Pipeline,
    dispatch_stage,
    register_decoder,
    register_sink,
)


def _events():
    return ray.data.from_arrow(pa.table({
        "op": pa.array(["mint", "burn", "mint", "other"]),
        "amount": pa.array([10, 3, 5, 99], pa.int64()),
    }))


def test_pipeline_chains_stages():
    def double(t: pa.Table) -> pa.Table:
        return t.set_column(1, "amount", pc.multiply(t.column("amount"), 2))

    def only_mint(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("op"), pa.scalar("mint")))

    out = Pipeline().then(double).then(only_mint).build(_events()).to_pandas()
    assert sorted(out.amount) == [10, 20]


def test_stateful_stage_uses_actor_pool():
    class AddTag:
        def __init__(self):
            self.tag = "decoded"  # once per actor

        def __call__(self, t: pa.Table) -> pa.Table:
            return t.append_column("tag", pa.array([self.tag] * t.num_rows))

    out = Pipeline().then(AddTag, stateful=True, concurrency=2).build(_events()).to_pandas()
    assert (out.tag == "decoded").all()


def test_decoder_dispatch_registry():
    @register_decoder("mint")
    def decode_mint(t: pa.Table) -> pa.Table:
        return t.set_column(1, "amount", pc.negate(t.column("amount")))

    try:
        out = _events().map_batches(dispatch_stage("op"),
                                    batch_format="pyarrow").to_pandas()
        mint = out[out.op == "mint"]
        assert sorted(mint.amount) == [-10, -5]       # decoded
        assert out[out.op == "other"].amount.iloc[0] == 99  # pass-through
    finally:
        DECODERS.pop("mint", None)


def test_sink_registry(tmp_path):
    captured = {}
    register_sink("memory", lambda ds, dest: captured.setdefault(dest, ds.count()))
    try:
        SINKS["memory"](_events(), "slot")
        assert captured["slot"] == 4
        SINKS["csv"](_events(), str(tmp_path / "csvout"))
        assert list((tmp_path / "csvout").glob("*.csv"))
    finally:
        SINKS.pop("memory", None)


def test_text_stage_registry_composes(ray_session):
    """Corpus-prep stages compose by NAME through Pipeline — the per-entity
    function-table extension surface applied to the webtext operators."""
    import pyarrow as pa
    import ray.data

    from ethereum_etl_ray.pipelines.builder import Pipeline, text_stage

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": ["The  CAT sat", "reach me at a@b.co now"],
    }))
    out = (Pipeline()
           .then(text_stage("normalize"))
           .then(text_stage("pii_redact"))
           .then(text_stage("rep_stats"))
           .build(ds)
           .to_pandas().sort_values("doc_id"))
    assert list(out.norm) == ["the cat sat", "reach me at a@b.co now"]
    assert out.clean.iloc[1] == "reach me at <EMAIL> now"
    assert {"n_tokens", "dup_ppm", "top_tok_ppm"} <= set(out.columns)
    # every registered stage is loadable
    for name in ["quality", "lang_id", "fingerprint", "winnow", "chunk"]:
        assert callable(text_stage(name))
