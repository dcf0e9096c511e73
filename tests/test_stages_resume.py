"""Decode/resize/media stages + crash-resume of the crawl loop."""

import glob
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

from weaver_ray.config import CrawlConfig
from weaver_ray.functions.imaging import png_decode
from weaver_ray.pipelines.crawl import crawl
from weaver_ray.sources.corpus import read_corpus
from weaver_ray.stages.decode import (
    AudioFeatureStage,
    DecodeImageStage,
    ResizeImageStage,
    VideoFrameSampleStage,
)


def test_decode_stage_phash_roundtrip(small_corpus):
    from weaver_ray.functions.imaging import hamming64

    ds = read_corpus(small_corpus).limit(64)
    out = ds.map_batches(DecodeImageStage, batch_format="pyarrow",
                         batch_size=32, concurrency=1).to_pandas()
    assert out["decode_ok"].all()
    png = out[out["fmt"] == "png"]
    jpg = out[out["fmt"] == "jpeg"]
    assert len(png) and len(jpg)  # both codecs exercised
    # lossless rows: perceptual hash is bit-exact
    assert (png["phash_decoded"] == png["phash_stored"]).all()
    # lossy rows: q=98 jpeg may flip a borderline phash bit; stay perceptually
    # identical (hamming <= 2 of 64)
    ham = hamming64(jpg["phash_decoded"].to_numpy(), jpg["phash_stored"].to_numpy())
    assert (ham <= 2).all()
    assert out[["mean_r", "mean_g", "mean_b"]].min().min() >= 0
    assert out[["mean_r", "mean_g", "mean_b"]].max().max() <= 255


def test_resize_stage(small_corpus):
    ds = read_corpus(small_corpus).limit(16)
    out = ds.map_batches(ResizeImageStage, batch_format="pyarrow",
                         fn_constructor_kwargs={"out_w": 8, "out_h": 8},
                         batch_size=8, concurrency=1).to_pandas()
    assert out["resize_ok"].all()
    px = png_decode(out["bytes"].iloc[0])
    assert px.shape == (8, 8, 3)


def test_media_stubs_raise_without_fake():
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(deterministic_fake=False)
    with pytest.raises(NotImplementedError):
        VideoFrameSampleStage(deterministic_fake=False)


def test_media_stub_schema_plumbing():
    import ray.data as rd

    media = rd.from_items([{"media_id": f"m{i}"} for i in range(4)])
    def run_once():
        # sort by key before comparing: per-row content is deterministic in
        # (media_id, frame_idx); Dataset BLOCK order across runs is not part
        # of the contract (from_items blocks can surface in any order)
        return (media.map_batches(VideoFrameSampleStage, batch_format="pyarrow",
                                  fn_constructor_kwargs={"deterministic_fake": True,
                                                         "n_frames": 2},
                                  concurrency=1).to_pandas()
                .sort_values(["media_id", "frame_idx"]).reset_index(drop=True))

    frames = run_once()
    assert len(frames) == 8
    px = png_decode(frames["frame_png"].iloc[0])
    assert px.shape == (8, 8, 3)
    # deterministic across runs
    frames2 = run_once()
    assert (frames["frame_png"] == frames2["frame_png"]).all()


CFG = CrawlConfig(corpus_size=1000, max_rounds=4, num_seen_shards=2,
                  num_politeness_shards=2, fetch_concurrency=2)


def test_crash_resume_identical(small_corpus):
    """Kill after round k (marker deleted), rerun -> identical seen set and
    records (SURVEY.md §5 resume test)."""
    out = "/tmp/test_resume"
    shutil.rmtree(out, ignore_errors=True)
    full = crawl(CFG, out, corpus_path=small_corpus)

    # simulate dying during round 3: remove its commit + partial outputs
    os.remove(out + "/ckpt/COMMIT_3.json")
    shutil.rmtree(out + "/records/round=3")
    resumed = crawl(CFG, out, corpus_path=small_corpus, resume=True)

    assert resumed.urls_fetched == full.urls_fetched
    assert resumed.urls_seen == full.urls_seen
    assert set(resumed.seen_table.column("url_hash").to_pylist()) == set(
        full.seen_table.column("url_hash").to_pylist()
    )
    files = sorted(glob.glob(out + "/records/round=3/part-*.parquet"))
    assert files
    n = sum(pq.read_table(f).num_rows for f in files)
    assert n == full.per_round[3]["dedup_survivors"]


@pytest.mark.parametrize("distributed", [False, True])
def test_crawl_level_transient_failures_exactly_once(small_corpus, tmp_path,
                                                     distributed):
    """End-to-end through crawl() (not just the stage), in BOTH execution
    modes: every fetch batch of every round fails once with an injected
    transient error; the finished crawl must equal a clean run in counts,
    seen set and per-partition record files (distributed mode additionally
    proves the sidecar count manifests are exactly-once under retries)."""
    import dataclasses

    from ray.data import DataContext

    base = dataclasses.replace(CFG, distributed=distributed, max_rounds=3)
    clean = crawl(base, f"/tmp/test_crawl_retry_clean_{distributed}",
                  corpus_path=small_corpus)

    marker_dir = tmp_path / "crawl_markers"
    marker_dir.mkdir()
    ctx = DataContext.get_current()
    prev = ctx.actor_task_retry_on_errors
    ctx.actor_task_retry_on_errors = [RuntimeError]  # crawl() keeps a preset value
    try:
        cfg = dataclasses.replace(base, extra={"fail_marker_dir": str(marker_dir)})
        failed = crawl(cfg, f"/tmp/test_crawl_retry_failed_{distributed}",
                       corpus_path=small_corpus)
    finally:
        ctx.actor_task_retry_on_errors = prev

    assert len(list(marker_dir.iterdir())) > 0  # failures actually fired
    assert failed.urls_fetched == clean.urls_fetched
    assert failed.urls_seen == clean.urls_seen
    assert set(failed.seen_table.column("url_hash").to_pylist()) == set(
        clean.seen_table.column("url_hash").to_pylist()
    )
    for e, o in zip(failed.per_round, clean.per_round):
        assert e["fetched_ok"] == o["fetched_ok"], (e, o)
        assert e["dedup_survivors"] == o["dedup_survivors"]

    # lineage is exactly-once too: a retried batch REPLACES its earlier
    # row (task_attempt > 1) instead of double-counting (review r4)
    from weaver_ray.state.checkpoint import CheckpointManager

    lf = CheckpointManager(
        f"/tmp/test_crawl_retry_failed_{distributed}/ckpt"
    ).lineage_table().to_pandas()
    lc = CheckpointManager(
        f"/tmp/test_crawl_retry_clean_{distributed}/ckpt"
    ).lineage_table().to_pandas()
    for stage in ("dedup", "fetch"):
        for col in ("rows_in", "rows_out"):
            got = lf[lf["stage"] == stage].groupby("round")[col].sum()
            want = lc[lc["stage"] == stage].groupby("round")[col].sum()
            assert got.equals(want), (stage, col, got, want)


def test_lineage_recorded(small_corpus):
    out = "/tmp/test_lineage"
    shutil.rmtree(out, ignore_errors=True)
    crawl(CFG, out, corpus_path=small_corpus)
    from weaver_ray.state.checkpoint import CheckpointManager

    lt = CheckpointManager(out + "/ckpt").lineage_table()
    assert lt is not None
    df = lt.to_pandas()
    assert {"round", "stage", "rows_in", "rows_out", "partition"} <= set(df.columns)
    assert (df["stage"].isin(["dedup", "fetch"])).all()
    # per-round conservation: fetch rows_in == dedup rows_out
    for r in sorted(df["round"].unique()):
        d = df[(df["round"] == r) & (df["stage"] == "dedup")]["rows_out"].sum()
        f = df[(df["round"] == r) & (df["stage"] == "fetch")]["rows_in"].sum()
        assert d == f, (r, d, f)


def test_transient_fetch_failure_retries_exactly_once(small_corpus, tmp_path):
    """Every fetch task fails once (injected), Ray retries it, and the
    crawl output is EXACTLY the same as an unfailed run: the round-aware
    seen-set keeps retried rows as survivors and record writes are
    idempotent (reference analog: visibility-timeout redelivery; here
    upgraded from at-least-once to exactly-once)."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data as rd

    from weaver_ray.pipelines.crawl import _make_dedup_fn
    from weaver_ray.stages.fetch import FetchStage, split_union
    from weaver_ray.stages.parse import partition_for_fetch, seed_frontier
    from weaver_ray.state.politeness import PolitenessPool
    from weaver_ray.state.seen import SeenSet

    frontier = seed_frontier(20)
    marker_dir = tmp_path / "markers"
    marker_dir.mkdir()
    records_dir = tmp_path / "records"

    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.actor_task_retry_on_errors
    ctx.actor_task_retry_on_errors = [RuntimeError]  # set BEFORE dataset creation:
    # each Dataset snapshots the context at construction time

    seen = SeenSet(num_shards=2, capacity_per_shard=4096, exact=True)
    politeness = PolitenessPool(num_shards=2)
    parts = partition_for_fetch(frontier, 4)
    ds = rd.from_arrow(parts)
    ds = ds.map_batches(_make_dedup_fn(seen.task_view(), None),
                        batch_size=None, batch_format="pyarrow")
    ds = ds.map_batches(
        FetchStage,
        fn_constructor_kwargs={
            "corpus_path": small_corpus,
            "politeness_view": politeness.task_view(),
            "records_dir": str(records_dir),
            "emit_children": True,
            "n_hosts": 64,
            "fail_marker_dir": str(marker_dir),
        },
        batch_size=None, batch_format="pyarrow", concurrency=2, num_cpus=1,
    )
    try:
        narrow, children = split_union(ray.get(ds.materialize().to_arrow_refs()))
    finally:
        ctx.actor_task_retry_on_errors = prev

    # every batch failed once...
    assert len(list(marker_dir.iterdir())) == len(parts)
    # ...yet every frontier row appears exactly once in the output
    assert narrow.num_rows == frontier.num_rows
    assert sorted(narrow.column("url_canon").to_pylist()) == sorted(
        frontier.column("url_canon").to_pylist()
    )
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(str(records_dir) + "/round=0/part-*.parquet")
    total = sum(pq.read_table(f).num_rows for f in files)
    assert total == frontier.num_rows


def test_checkpoint_clear_preserves_unrelated_files(tmp_path):
    """A fresh run's CheckpointManager.clear() deletes only the KNOWN
    artifact filename shapes — a user-supplied checkpoint dir holding
    unrelated files must survive (ADVICE r3: wholesale rmtree)."""
    from weaver_ray.state.checkpoint import CheckpointManager

    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "COMMIT_3.json").write_text("{}")
    (d / "seen_shard_0_round_3.npz").write_text("x")
    (d / "politeness_round_3.json").write_text("{}")
    fr = d / "frontier_after_round_3"
    fr.mkdir()
    (fr / "part-00000.parquet").write_text("p")
    keep = d / "user_notes.txt"
    keep.write_text("precious")
    keepdir = d / "unrelated_dir"
    keepdir.mkdir()
    (keepdir / "f").write_text("y")

    CheckpointManager(str(d)).clear()
    assert keep.read_text() == "precious"
    assert (keepdir / "f").read_text() == "y"
    for gone in ("COMMIT_3.json", "seen_shard_0_round_3.npz",
                 "politeness_round_3.json", "frontier_after_round_3"):
        assert not (d / gone).exists()


def test_lineage_actor_retry_replaces_row(ray_session):
    """A re-presented (round, stage, batch_key) REPLACES the earlier
    lineage row with task_attempt incremented — never a second row."""
    import ray as _ray

    from weaver_ray.state.checkpoint import LineageActor

    lin = LineageActor.remote()
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=7,
                               rows_in=10, rows_out=9))
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=21,
                               rows_in=5, rows_out=5))
    # Ray retry re-presents batch 7 (same key, possibly updated counts)
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=7,
                               rows_in=10, rows_out=9))
    rows = _ray.get(lin.drain.remote())
    assert len(rows) == 2
    b7 = [r for r in rows if r["rows_in"] == 10]
    assert len(b7) == 1 and b7[0]["task_attempt"] == 2
    assert b7[0]["partition"] == 0  # keeps its original partition id
    # after a drain (round barrier) the key space resets
    _ray.get(lin.record.remote(stage="fetch", round=1, batch_key=7,
                               rows_in=3, rows_out=3))
    rows = _ray.get(lin.drain.remote())
    assert len(rows) == 1 and rows[0]["task_attempt"] == 1


def test_lineage_actor_post_drain_retry_dropped(ray_session):
    """ADVICE r5: a task retried AFTER the round-barrier drain (Ray
    object-lineage reconstruction of a lost block in a later round)
    re-presents its batch_key with no _by_key entry left — it must be
    DROPPED via the drain tombstones, not appended as a fresh row that
    double-counts the round's lineage.  Tombstones are bounded to the
    last two drains."""
    import ray as _ray

    from weaver_ray.state.checkpoint import LineageActor

    lin = LineageActor.remote()
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=7,
                               rows_in=10, rows_out=9))
    assert len(_ray.get(lin.drain.remote())) == 1
    # post-drain retry of the SAME (round, stage, batch_key): dropped
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=7,
                               rows_in=10, rows_out=9))
    # a genuinely NEW key in that round still records normally
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=8,
                               rows_in=4, rows_out=4))
    rows = _ray.get(lin.drain.remote())
    assert len(rows) == 1 and rows[0]["rows_in"] == 4
    # tombstone survives exactly two drains: key 7 is still blocked now
    # (drained two barriers ago)...
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=7,
                               rows_in=1, rows_out=1))
    assert len(_ray.get(lin.drain.remote())) == 0
    # ...that drain refreshed nothing for key 7 (it recorded no row), and
    # after one more empty drain the window has passed — a re-presented
    # key 7 appends again (the documented bound: reconstruction never
    # reaches back more than the current and previous round)
    assert len(_ray.get(lin.drain.remote())) == 0
    _ray.get(lin.record.remote(stage="fetch", round=0, batch_key=7,
                               rows_in=2, rows_out=2))
    assert len(_ray.get(lin.drain.remote())) == 1


def test_crash_resume_partial_round_and_stray_tmp(small_corpus):
    """Realistic crash shape: the dying round committed SOME record parts
    (atomic renames that happened before the kill) and left a stray .tmp
    from an in-flight write — not the clean whole-directory wipe the other
    resume tests simulate.  Resume must re-run the round, overwrite every
    part deterministically (same frontier -> same (round, first-seq) file
    names), ignore the .tmp, and end bit-equal on seen set / fetch counts /
    round-3 record rows."""
    out = "/tmp/test_resume_partial"
    shutil.rmtree(out, ignore_errors=True)
    full = crawl(CFG, out, corpus_path=small_corpus)

    os.remove(out + "/ckpt/COMMIT_3.json")
    parts = sorted(glob.glob(out + "/records/round=3/part-*.parquet"))
    assert len(parts) >= 2, "fixture needs a multi-part round"
    for p in parts[1::2]:  # kill every other part: committed/missing mix
        os.remove(p)
    # in-flight write at kill time: must be ignored by every reader and
    # harmlessly overwritten (or left) by the resume
    stray = out + "/records/round=3/part-s9999999999.parquet.tmp"
    with open(stray, "wb") as fh:
        fh.write(b"torn bytes, not parquet")

    resumed = crawl(CFG, out, corpus_path=small_corpus, resume=True)

    assert resumed.urls_fetched == full.urls_fetched
    assert resumed.urls_seen == full.urls_seen
    assert set(resumed.seen_table.column("url_hash").to_pylist()) == set(
        full.seen_table.column("url_hash").to_pylist())
    files = sorted(glob.glob(out + "/records/round=3/part-*.parquet"))
    assert files == parts  # deterministic names: full overwrite, no strays
    n = sum(pq.read_table(f).num_rows for f in files)
    assert n == full.per_round[3]["dedup_survivors"]


def test_randomized_crash_resume_sweep(small_corpus):
    """Crash-point x config sweep: kill after a RANDOM round (commit + that
    round's records + frontier checkpoint removed), resume, and require the
    final state equal to an uninterrupted run AND to the independent
    simulator — across distributed/barrier mode, budgets, host quotas and
    shard counts.  The pinned resume tests cover one crash point in one
    config each; divergence bugs live in the corners (cf. the block-10
    seed-budget find)."""
    import shutil as _shutil

    from weaver_ray.oracle import simulate

    rng = np.random.default_rng(909)
    for trial in range(3):
        cfg = CrawlConfig(
            corpus_size=1000,
            n_seeds=int(rng.integers(5, 30)),
            max_rounds=int(rng.integers(3, 5)),
            max_urls=[None, 200, None][trial],
            max_pages_per_host=[None, None, 9][trial],
            num_seen_shards=int(rng.integers(1, 4)),
            num_politeness_shards=int(rng.integers(1, 3)),
            fetch_concurrency=2,
            use_bloom=bool(rng.integers(0, 2)),
            distributed=trial % 2 == 0,
        )
        out = f"/tmp/crawl_crash_sweep_{trial}"
        _shutil.rmtree(out, ignore_errors=True)
        full = crawl(cfg, out, corpus_path=small_corpus)
        if full.rounds < 2:
            continue
        k = int(rng.integers(1, full.rounds))  # crash DURING round k: rounds
        # >= k left no commits, records or frontier checkpoints (a real kill
        # cannot leave a gap in the commit sequence — later rounds never ran)
        for j in range(k, full.rounds):
            os.remove(out + f"/ckpt/COMMIT_{j}.json")
            _shutil.rmtree(out + f"/records/round={j}", ignore_errors=True)
            _shutil.rmtree(out + f"/ckpt/frontier_after_round_{j}",
                           ignore_errors=True)
        resumed = crawl(cfg, out, corpus_path=small_corpus, resume=True)
        assert resumed.urls_fetched == full.urls_fetched, (trial, k)
        assert set(resumed.seen_table.column("url_canon").to_pylist()) == set(
            full.seen_table.column("url_canon").to_pylist()), (trial, k)
        ora = simulate(cfg)
        assert resumed.urls_fetched == ora.urls_fetched, (trial, k)
        assert set(resumed.seen_table.column("url_canon").to_pylist()) == {
            c for c, _, _ in ora.seen}, (trial, k)


def test_resume_refuses_commit_marker_gap(small_corpus):
    """COMMIT_2 deleted while COMMIT_3 survives is a state no crash can
    produce (commits are strictly ordered) — resuming from the latest
    marker would silently skip re-running round 2 and leave a hole in the
    records.  The engine must refuse loudly instead."""
    out = "/tmp/test_resume_gap"
    shutil.rmtree(out, ignore_errors=True)
    crawl(CFG, out, corpus_path=small_corpus)
    os.remove(out + "/ckpt/COMMIT_2.json")
    with pytest.raises(ValueError, match="not contiguous"):
        crawl(CFG, out, corpus_path=small_corpus, resume=True)
