"""Resumable partitioned parquet sink: determinism, resume-skip, crash
semantics (torn writes invisible to readers)."""

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from weaver_ray.pipelines.sinks import (read_partitioned, write_partitioned)


@pytest.fixture(scope="module")
def dup_docs_dir(tmp_path_factory):
    """Tiny documents table with planted near-duplicates (sink integration)."""
    d = tmp_path_factory.mktemp("sinkdocs")
    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    for i in range(30):
        base = " ".join(rng.choice(words, 30))
        texts.append(base)
        ids.append(2 * i)
        if i < 8:
            toks = base.split()
            toks[5] = "CHANGED"
            texts.append(" ".join(toks))
            ids.append(2 * i + 1)
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(ids)),
                  "source": pa.array(["s"] * len(ids)),
                  "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        d / "documents.parquet",
    )
    return str(d)


def _frame(n=1000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "cluster_id": rng.integers(0, 50, n).astype(np.int64),
        "score": rng.random(n).round(6),
    })


def _canon(df):
    return (df.sort_values(["doc_id"]).reset_index(drop=True)
            [["doc_id", "cluster_id", "score"]])


def test_sink_roundtrip_and_resume(tmp_path):
    df = _frame()
    out = str(tmp_path / "sink")

    stats = write_partitioned(rd.from_pandas(df), out, key="doc_id",
                              num_partitions=8)
    assert stats["rows"].sum() == len(df)
    assert not stats["skipped"].any()
    back = read_partitioned(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(back), _canon(df))

    # byte determinism: re-run with resume=False must produce identical files
    sizes1 = {f: os.path.getsize(os.path.join(out, f))
              for f in os.listdir(out) if f.endswith(".parquet")}
    bytes1 = {f: open(os.path.join(out, f), "rb").read() for f in sizes1}
    write_partitioned(rd.from_pandas(df.sample(frac=1.0, random_state=1)),
                      out, key="doc_id", num_partitions=8, resume=False)
    for f, b in bytes1.items():
        assert open(os.path.join(out, f), "rb").read() == b

    # crash one partition: drop its marker + data, re-run -> only it rewrites
    victim = stats["partition"].iloc[3]
    os.remove(os.path.join(out, f"part-{victim:05d}.done"))
    os.remove(os.path.join(out, f"part-{victim:05d}.parquet"))
    stats2 = write_partitioned(rd.from_pandas(df), out, key="doc_id",
                               num_partitions=8)
    rewritten = stats2[~stats2["skipped"]]
    assert list(rewritten["partition"]) == [victim]
    assert stats2["rows"].sum() == len(df)
    back2 = read_partitioned(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(back2), _canon(df))


def test_sink_ignores_torn_writes(tmp_path):
    df = _frame(200)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_pandas(df), out, key="doc_id", num_partitions=4)
    # a torn write = data file without its marker: reader must not see it
    torn = os.path.join(out, "part-00099.parquet")
    df.head(5).to_parquet(torn, index=False)
    back = read_partitioned(out).to_pandas()
    assert len(back) == len(df)


def test_sink_torn_write_resume_byte_equal(tmp_path):
    """r5 hunt wave: realistic torn-write crash shapes, injected between
    the sink's commit points, must leave a resumable directory whose
    final bytes are IDENTICAL to a clean run's.

    (a) crash AFTER the fsynced data rename but BEFORE the marker commit
        (data present and current, marker absent, stray marker .tmp);
    (b) a TORN data file (truncated mid-write) with no marker.
    Both partitions must be rewritten on resume; committed partitions
    must be skipped, not rewritten."""
    df = _frame(300)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_pandas(df), out, key="doc_id", num_partitions=6)
    clean = {f: open(os.path.join(out, f), "rb").read()
             for f in os.listdir(out) if f.endswith(".parquet")}

    # (a) marker gone + stray marker tmp, data intact
    a = int(sorted(clean)[0].split("-")[1].split(".")[0])
    os.remove(os.path.join(out, f"part-{a:05d}.done"))
    with open(os.path.join(out, f"part-{a:05d}.done.tmp"), "w") as fh:
        fh.write("{")  # torn json
    # (b) torn data file, marker gone
    b = int(sorted(clean)[1].split("-")[1].split(".")[0])
    os.remove(os.path.join(out, f"part-{b:05d}.done"))
    data_b = os.path.join(out, f"part-{b:05d}.parquet")
    blob = open(data_b, "rb").read()
    with open(data_b, "wb") as fh:
        fh.write(blob[: len(blob) // 2])

    # reader must not surface either uncommitted partition
    back = read_partitioned(out).to_pandas()
    assert len(back) < len(df)

    stats = write_partitioned(rd.from_pandas(df), out, key="doc_id",
                              num_partitions=6)
    rewritten = sorted(stats.loc[~stats["skipped"], "partition"])
    assert rewritten == sorted([a, b])
    for f, want in clean.items():
        assert open(os.path.join(out, f), "rb").read() == want, f
    pd.testing.assert_frame_equal(_canon(read_partitioned(out).to_pandas()),
                                  _canon(df))


def test_sink_refuses_marker_without_data(tmp_path):
    """A committed .done marker whose data file is missing cannot come
    from a crash (marker commits strictly after the fsynced data rename)
    — the reader must refuse loudly, not FileNotFoundError deep in a
    read task (r5 hunt wave)."""
    df = _frame(100)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_pandas(df), out, key="doc_id", num_partitions=4)
    victim = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))[0]
    os.remove(os.path.join(out, victim))
    with pytest.raises(ValueError, match="out-of-band"):
        read_partitioned(out)


def test_sink_empty_input_and_empty_read(tmp_path):
    """An empty Dataset must write cleanly (no KeyError on the column-less
    stats frame) and a dir with zero committed partitions must read back as
    an empty Dataset, not a read_parquet([]) crash."""
    out = str(tmp_path / "sink")
    empty = rd.from_pandas(_frame(0))
    stats = write_partitioned(empty, out, key="doc_id", num_partitions=4)
    assert len(stats) == 0
    assert list(stats.columns) == ["partition", "rows", "skipped"]
    assert read_partitioned(out).count() == 0


def test_sink_stale_wider_layout(tmp_path):
    """A prior run with MORE partitions must not leak committed stale
    partitions into a narrower re-run: resume=True refuses loudly,
    resume=False clears every part-* artifact."""
    df = _frame(200)
    out = str(tmp_path / "sink")
    write_partitioned(rd.from_pandas(df), out, key="doc_id", num_partitions=8)
    with pytest.raises(ValueError, match="num_partitions"):
        write_partitioned(rd.from_pandas(df.head(50)), out, key="doc_id",
                          num_partitions=4)
    write_partitioned(rd.from_pandas(df.head(50)), out, key="doc_id",
                      num_partitions=4, resume=False)
    back = read_partitioned(out).to_pandas()
    pd.testing.assert_frame_equal(_canon(back), _canon(df.head(50)))


def test_sink_carries_neardup_output(tmp_path, dup_docs_dir):
    """Integration: the cluster pipeline's Dataset output flows straight
    into the sink (the 100-TB output path VERDICT r2 asked for)."""
    from weaver_ray.pipelines.dedup import neardup_clusters, neardup_clusters_ds

    out = str(tmp_path / "clusters")
    write_partitioned(neardup_clusters_ds(dup_docs_dir), out,
                      key="doc_id", num_partitions=4)
    back = (read_partitioned(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    direct = neardup_clusters(dup_docs_dir)
    pd.testing.assert_frame_equal(
        back[["doc_id", "cluster_id"]].astype(np.int64),
        direct[["doc_id", "cluster_id"]].astype(np.int64))


def test_events_csv_roundtrip_lossless(ray_session, tmp_path):
    """The CSV export memoizes (second call rewrites nothing) and the
    round-tripped rows equal the parquet rows column-for-column."""
    import shutil

    import pandas as pd
    import pyarrow.csv as pc
    import pyarrow.parquet as pq

    from weaver_ray.sources.csvstore import export_events_csv

    src = "/root/testdata/sf0.001"
    root = str(tmp_path / "csvroot")
    d = export_events_csv(src, root=root)
    files = sorted(Path(d).glob("*.csv"))
    assert files, "CSV export produced no part files"
    stamps = [f.stat().st_mtime_ns for f in files]
    assert export_events_csv(src, root=root) == d  # memoized: no rewrite
    assert [f.stat().st_mtime_ns for f in sorted(Path(d).glob("*.csv"))] \
        == stamps

    a = (pq.read_table(src + "/events.parquet").to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (pd.concat([pc.read_csv(str(f)).to_pandas() for f in files])
         .sort_values("event_id").reset_index(drop=True))
    b["ts"] = b["ts"].astype(a["ts"].dtype)
    pd.testing.assert_frame_equal(a, b[a.columns], check_exact=True)
    shutil.rmtree(root)
