"""End-to-end verify for ethereum_etl_ray (recreated from .claude/skills/verify).

Drives: replay vs sequential-replay oracle (byte-identity), two-process
resume, idempotence, sharded-winner route, file-bucket shuffle, retention
exactness, error paths, generation history + restore, corpus dedup queries.
"""
import glob
import os
import shutil
import subprocess
import sys

import ray

os.chdir("/root/repo")
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
import ray.data  # noqa: E402

ray.data.DataContext.get_current().enable_progress_bars = False

import pyarrow.parquet as pq  # noqa: E402

from ethereum_etl_ray.config import EngineConfig  # noqa: E402
from ethereum_etl_ray.pipelines.replay import load_events, load_lake, replay  # noqa: E402
from ethereum_etl_ray.sources.synth import ensure_corpus  # noqa: E402
from ethereum_etl_ray.state.oracle import sequential_replay  # noqa: E402

SF = "/root/testdata/sf0.001"
c = ensure_corpus(SF, events_per_doc=10)
evs = [pq.read_table(f) for d in c.event_dirs for f in sorted(glob.glob(d + "/*.parquet"))]
snap = pq.read_table(glob.glob(c.snapshot_dir + "/*.parquet")[0])
oracle = sequential_replay(evs, snap)
otext = {u: o["text"] for u, o in oracle.items()}


def check_lake(lake, tag):
    df = load_lake(lake).to_pandas()
    got = dict(zip(df.url, df.text))
    assert got == otext, f"{tag}: lake != oracle ({len(got)} vs {len(otext)} rows)"
    print(f"OK {tag}: {len(got)} urls byte-identical")


L1 = "/tmp/vr3_lake1"
shutil.rmtree(L1, ignore_errors=True)
r = replay(c, L1, EngineConfig(num_partitions=16))
check_lake(L1, "basic replay")

# idempotence: same watermark re-run merges nothing
r2 = replay(c, L1, EngineConfig(num_partitions=16))
assert r2.merged_partitions == 0, r2.merged_partitions
print("OK idempotent re-run: merged_partitions == 0")

# two-process resume
L2 = "/tmp/vr3_lake2"
shutil.rmtree(L2, ignore_errors=True)
replay(c, L2, EngineConfig(num_partitions=16), watermark=c.watermark // 2)
code = (
    "import ray, os; os.chdir('/root/repo');"
    "ray.init(address='local', num_cpus=8, include_dashboard=False, logging_level='ERROR');"
    "import ray.data; ray.data.DataContext.get_current().enable_progress_bars=False;"
    "from ethereum_etl_ray.sources.synth import ensure_corpus;"
    "from ethereum_etl_ray.pipelines.replay import replay;"
    "from ethereum_etl_ray.config import EngineConfig;"
    f"c = ensure_corpus('{SF}', events_per_doc=10);"
    f"replay(c, '{L2}', EngineConfig(num_partitions=16))"
)
subprocess.run([sys.executable, "-c", code], check=True,
               env={**os.environ, "PYTHONPATH": "/root/repo"})
check_lake(L2, "two-process resume")

# sharded winner route
L3 = "/tmp/vr3_lake3"
shutil.rmtree(L3, ignore_errors=True)
r3 = replay(c, L3, EngineConfig(num_partitions=16, winner_exact_threshold=0))
assert r3.manifest.metrics["winner_filter"] == "sharded_bloom", r3.manifest.metrics
check_lake(L3, "sharded winner route")

# file-bucket shuffle route
L4 = "/tmp/vr3_lake4"
shutil.rmtree(L4, ignore_errors=True)
replay(c, L4, EngineConfig(num_partitions=16, shuffle="file"))
check_lake(L4, "file-bucket shuffle")

# retention exactness + generation restore
from ethereum_etl_ray.pipelines.retention import apply_retention  # noqa: E402

n_before = load_lake(L1).count()
apply_retention(L1, keep_ratio=0.97)
n_after = load_lake(L1).count()
assert n_before - n_after == int(n_before * 0.03), (n_before, n_after)
print(f"OK retention: evicted exactly {n_before - n_after} of {n_before}")

gens = sorted(glob.glob(L1 + "/manifest-g*.json"))
assert len(gens) >= 2, gens
gen_num = int(os.path.basename(gens[-2]).split("-g")[1].split(".")[0])
out = subprocess.run(
    [sys.executable, "-m", "ethereum_etl_ray.cli", "restore", "--out", L1,
     "--generation", str(gen_num)],
    capture_output=True, text=True, env={**os.environ, "PYTHONPATH": "/root/repo"})
assert out.returncode == 0, out.stderr
assert load_lake(L1).count() == n_before, "restore did not resurrect evicted rows"
check_lake(L1, "generation restore")

# error paths
for fn, arg in [(load_events, ["/bad/dir"]), (load_lake, "/no/manifest")]:
    try:
        fn(arg)
        raise AssertionError(f"{fn.__name__} did not raise")
    except FileNotFoundError:
        pass
print("OK error paths raise FileNotFoundError")

# corpus dedup end-to-end
from ethereum_etl_ray.pipelines.queries import QUERIES  # noqa: E402

def _n(res):
    return res.count() if isinstance(res, ray.data.Dataset) else len(res)


for q in ["near_dedup_keep", "connected_components"]:
    res = QUERIES[q](SF)
    n = _n(res)
    assert n > 0, q
    print(f"OK {q}: {n} rows")

# round-3 additions this session: new text operators
for q in ["pii_redact", "normalize_part", "rep_stats", "pack_sequences",
          "lake_diff", "incremental_lang_counts", "chunk_docs", "lm_score", "ann_quantized_topk"]:
    res = QUERIES[q](SF)
    n = _n(res)
    assert n > 0, q
    print(f"OK {q}: {n} rows")

# curate CLI end-to-end (round 3, session 2)
import tempfile
dest = tempfile.mkdtemp(prefix="vr3_curated_")
out = subprocess.run(
    [sys.executable, "-m", "ethereum_etl_ray.cli", "curate",
     "--docs", SF + "/documents.parquet", "--dest", dest, "--langs", "en,fr"],
    capture_output=True, text=True, env={**os.environ, "PYTHONPATH": "/root/repo"})
assert out.returncode == 0, out.stderr[-2000:]
import json as _json
rep = _json.loads(out.stdout.strip().splitlines()[-1])
assert rep["stages"]["output"] > 0, rep
print(f"OK cli curate: {rep['stages']}")

# predicate delete + restore (round 3, session 2)
from ethereum_etl_ray.pipelines.retention import delete_where
from ethereum_etl_ray.state.manifest import load_manifest as _lm

n0 = load_lake(L4).count()
g0 = _lm(L4).generation
dstats = delete_where(L4, "lang", "==", load_lake(L4).take(1)[0]["lang"])
assert dstats["deleted"] > 0
assert load_lake(L4).count() == n0 - dstats["deleted"]
from ethereum_etl_ray.state.manifest import restore_generation as _rg
_rg(L4, generation=g0)
assert load_lake(L4).count() == n0
check_lake(L4, "delete_where + restore")

# round-3 additions this session (session 3): grouped ops, reshape, sketches,
# point lookup, time travel
for q in ["topn_per_key", "grouped_median", "window_lag_cumsum",
          "rollup_counts", "cube_counts", "unpivot_metrics", "intersect_keys",
          "outer_join_activity", "weighted_sample", "compression_ratio",
          "approx_distinct_users", "count_distinct_by_key", "argmax_by_type",
          "pivot_event_types", "value_histogram", "corr_qty_discount",
          "percentiles", "range_join", "bm25_scores",
          "string_agg_types", "grouped_mad", "robust_outliers",
          "multikey_join_group_stats", "user_value_profile",
          "hourly_distinct_users", "type_share", "pagerank_keys"]:
    res = QUERIES[q](SF)
    n = _n(res)
    assert n > 0, q
    print(f"OK {q}: {n} rows")

# point-read by url + time-travel (session 3)
from ethereum_etl_ray.pipelines.replay import lookup_urls
df_l4 = load_lake(L4).to_pandas()
some = sorted(df_l4.url)[:5]
pt = lookup_urls(L4, some + ["url://missing"]).to_pandas()
assert set(pt.url) == set(some)
full = df_l4.set_index("url")
assert all(r.text == full.loc[r.url].text for r in pt.itertuples())
print(f"OK lookup_urls: {len(pt)}/5 point reads byte-identical")
gen_now = _lm(L4).generation
old_view = load_lake(L4, generation=gen_now).to_pandas()
assert len(old_view) == len(df_l4)
print("OK time-travel read at live generation")

# session-4 operators: spot-check a few of the new DuckDB-oracled queries
# via the driver-style harness (full list in COVERAGE.md)
import subprocess, sys
r = subprocess.run(
    [sys.executable, "scripts/check_oracles.py", "/root/testdata/sf0.001",
     "fuzzy_name_pairs", "dup_span_strip", "sparse_cosine_pairs",
     "rank_metrics_by_user", "weighted_median", "burst_pairs"],
    cwd="/root/repo", capture_output=True, text=True, timeout=500)
assert "0 fail" in r.stdout, r.stdout[-2000:]
print("OK session-4 oracle spot-check:", r.stdout.strip().splitlines()[-1])

# training-shard endpoint: build + idempotent restart (session 4)
import shutil
from ethereum_etl_ray.pipelines.curate import make_training_shards
import ray.data as rd
sh_dir = "/tmp/verify_shards"
shutil.rmtree(sh_dir, ignore_errors=True)
docs4 = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text"])
m1 = make_training_shards(docs4, sh_dir, shards=4, tokens_per_seq=256)
m2 = make_training_shards(docs4, sh_dir, shards=4, tokens_per_seq=256)
assert m1 == m2 and m1["docs"] > 0 and len(m1["per_shard"]) == 4
print(f"OK training shards: {m1['docs']} docs, {m1['sequences']} sequences, idempotent restart")

# leader→follower replication (round 5): full sync then checksum-skipped
# incremental re-run; follower must match the leader byte-identically
from ethereum_etl_ray.pipelines.replicate import replica_verify, replicate
R1 = "/tmp/verify_replica"
shutil.rmtree(R1, ignore_errors=True)
rr = replicate(L1, R1)
assert rr.copied > 0 and replica_verify(L1, R1, deep=True)["in_sync"]
rr2 = replicate(L1, R1)                      # no leader change → no reads
assert rr2.copied == 0
check_lake(R1, "replica of L1")
print(f"OK replication: {rr.copied} partitions shipped, idempotent re-sync")

# merge-on-read ingest (round 5): two delta windows (no base rewrite), the
# scan-time-merged view must equal the copy-on-write oracle byte-identically,
# base-rewriting ops must refuse while deltas are pending, and a compaction
# folds them in with the view unchanged
from ethereum_etl_ray.pipelines.mor import compact_deltas, ingest_delta
from ethereum_etl_ray.state.manifest import load_manifest
M1 = "/tmp/verify_mor"
shutil.rmtree(M1, ignore_errors=True)
ingest_delta(c, M1, EngineConfig(num_partitions=16), watermark=c.watermark // 2)
try:
    # advancing the watermark copy-on-write over pending deltas must refuse
    # (replay at or below the committed watermark is an idempotent no-op)
    replay(c, M1, EngineConfig(num_partitions=16))
    raise AssertionError("COW replay over pending deltas must refuse")
except ValueError as e:
    assert "compact" in str(e)
ingest_delta(c, M1, EngineConfig(num_partitions=16))
assert load_manifest(M1).has_deltas()
check_lake(M1, "merge-on-read scan-time merge (deltas pending)")
comp = compact_deltas(M1)
assert comp["compacted_partitions"] > 0 and not load_manifest(M1).has_deltas()
check_lake(M1, "merge-on-read after delta compaction")
print(f"OK merge-on-read: {comp['compacted_partitions']} partitions compacted")

print("VERIFY PASS")
ray.shutdown()

