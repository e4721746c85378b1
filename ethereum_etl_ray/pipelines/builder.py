"""Pluggable pipeline builder — the user-extension surface (SURVEY §2.7).

The reference's extension points are dicts of functions: a new exporter is an
``{entity: async fn}`` entry (``src/tasks/dag.py:78-81``), a new entity/step
is an ``entity_func``/``func_func`` registration (``src/tasks/dag.py:32-76``),
and new DEX decoders are ABI entries (``src/abis/event.py:4-115``). Here the
same capability is a ``Stage`` protocol composed over a ``ray.data.Dataset``:

  * a Stage is a batch-level transform — a plain function (stateless tasks) or
    a callable class (actor pool; state built once per actor in __init__);
  * ``Pipeline`` chains stages (each becomes one ``map_batches``, fusing with
    neighbors where Ray allows);
  * ``DECODERS`` is the op-dispatch registry (the topic0-dispatch analogue,
    ``src/tasks/extract/uniswap_v2_event.py:20-32``): register a decoder per
    op kind, and ``dispatch_stage`` routes rows by a key column;
  * ``SINKS`` registers terminal writers by name (the exporter registry
    analogue).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa
import ray.data

from ethereum_etl_ray.util import pool_size


@dataclass
class Stage:
    """One batch-level transform.

    ``fn``: callable batch→batch, or a class (actor pool when ``stateful``).
    """

    fn: Any
    name: str = ""
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    stateful: bool = False
    concurrency: int | None = None
    num_cpus: float | None = None

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        kwargs: dict[str, Any] = {"batch_format": self.batch_format}
        if self.batch_format == "pyarrow":
            kwargs["zero_copy_batch"] = True
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.stateful:
            kwargs["concurrency"] = pool_size(self.concurrency)
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        return ds.map_batches(self.fn, **kwargs)


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)

    def then(self, fn, **kw) -> "Pipeline":
        self.stages.append(Stage(fn=fn, name=kw.pop("name", getattr(fn, "__name__", "stage")),
                                 **kw))
        return self

    def build(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        for stage in self.stages:
            ds = stage.apply(ds)
        return ds


# --- op-dispatch decoder registry (topic0-dispatch analogue) ---------------

DECODERS: dict[str, Callable[[pa.Table], pa.Table]] = {}


def register_decoder(kind: str):
    def deco(fn):
        DECODERS[kind] = fn
        return fn

    return deco


def dispatch_stage(key_col: str, registry: dict[str, Callable] | None = None):
    """Route each batch's rows to the decoder registered for their ``key_col``
    value; unregistered kinds pass through untouched. Vectorized per kind
    (one filter + one decoder call per distinct kind in the batch)."""
    reg = DECODERS if registry is None else registry

    def dispatch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        kinds = pc.unique(batch.column(key_col)).to_pylist()
        outs = []
        for kind in kinds:
            sub = batch.filter(pc.equal(batch.column(key_col), pa.scalar(kind)))
            outs.append(reg[kind](sub) if kind in reg else sub)
        return pa.concat_tables(outs, promote_options="default")

    return dispatch


# --- sink registry (exporter registry analogue) ----------------------------

SINKS: dict[str, Callable[[ray.data.Dataset, str], Any]] = {
    "parquet": lambda ds, dest: ds.write_parquet(dest),
    "csv": lambda ds, dest: ds.write_csv(dest),
    "json": lambda ds, dest: ds.write_json(dest),
}


def register_sink(name: str, fn: Callable[[ray.data.Dataset, str], Any]) -> None:
    SINKS[name] = fn


# --- named text-stage registry (corpus-prep building blocks) ----------------
# The webtext analogue of the reference's per-entity extract function table
# (src/tasks/dag.py:32-76): every corpus-preparation operator is registered
# under a stable name so user pipelines compose them without imports, e.g.
#   Pipeline().then(TEXT_STAGES["normalize"]).then(TEXT_STAGES["pii_redact"])
def _text_stages() -> dict[str, Callable[[pa.Table], pa.Table]]:
    from ethereum_etl_ray.functions.redact import (
        normalize_text_batch,
        redact_pii_batch,
    )
    from ethereum_etl_ray.functions.textstats import (
        chunk_docs_batch,
        lang_scores_batch,
        md5_fingerprint_batch,
        quality_batch,
        rep_stats_batch,
        rolling_fingerprint_batch,
    )

    return {
        "normalize": lambda t: normalize_text_batch(t, "text", "norm"),
        "pii_redact": lambda t: redact_pii_batch(t, text_col="text",
                                                 out_col="clean"),
        "rep_stats": rep_stats_batch,
        "quality": quality_batch,
        "lang_id": lang_scores_batch,
        "fingerprint": md5_fingerprint_batch,
        "winnow": rolling_fingerprint_batch,
        "chunk": chunk_docs_batch,
    }


TEXT_STAGES: dict[str, Callable[[pa.Table], pa.Table]] = {}


def text_stage(name: str) -> Callable[[pa.Table], pa.Table]:
    """Fetch a registered corpus-prep stage by name (loads lazily)."""
    if not TEXT_STAGES:
        TEXT_STAGES.update(_text_stages())
    return TEXT_STAGES[name]
