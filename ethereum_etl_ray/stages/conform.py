"""Schema-evolution conform stage: rewrite Arrow batches in-flight.

The engine's replacement for the reference's ad-hoc schema drift handling —
``item.get(...)`` for fork-dependent columns (``src/tasks/extract/block.py:29-34``)
and declared-ahead enrich column groups (``src/schemas/sql/event.py:19-30``).
Old-generation batches are unified to the latest registry schema by
  * adding missing columns as typed nulls, and
  * applying *safe widening* casts (int32→int64, string→large_string, …).
Any other change (narrowing, incompatible type, unknown extra column kept
only if ``allow_extra``) raises ``SchemaEvolutionError`` — evolution must be
declared in the registry, never silent.

Used as a plain ``map_batches(fn, batch_format="pyarrow")`` stage (stateless;
zero-copy for columns already at the target type).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ethereum_etl_ray.schemas import SchemaEvolutionError, is_safe_widening


def conform_table(t: pa.Table, target: pa.Schema, *, allow_extra: bool = False) -> pa.Table:
    """Rewrite ``t`` to exactly ``target`` (column order included).

    Zero-copy fast path: a batch already at the target schema (the common
    case — only old-generation shards need rewriting) passes through
    untouched; otherwise only genuinely-widened columns are cast, the rest
    are referenced as-is (no ``combine_chunks`` copies — that cost ~0.8 µs/row
    of pure memcpy of the html payload at the 3M-event bench)."""
    if t.schema.equals(target):
        return t
    n = t.num_rows
    cols = {}
    for f in target:
        if f.name in t.column_names:
            c = t.column(f.name)
            if not c.type.equals(f.type):
                if not is_safe_widening(c.type, f.type):
                    raise SchemaEvolutionError(
                        f"column {f.name!r}: {c.type} → {f.type} is not a declared safe widening"
                    )
                c = pc.cast(c, f.type)
            cols[f.name] = c
        else:
            cols[f.name] = pa.nulls(n, f.type)
    if not allow_extra:
        extra = set(t.column_names) - set(target.names)
        if extra:
            raise SchemaEvolutionError(f"undeclared extra columns {sorted(extra)}")
    return pa.table(cols, schema=target)


def make_conformer(target: pa.Schema, *, allow_extra: bool = False):
    """Batch-fn factory for ``map_batches`` (captures the target schema)."""

    def conform(batch: pa.Table) -> pa.Table:
        return conform_table(batch, target, allow_extra=allow_extra)

    return conform
