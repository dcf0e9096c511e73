"""Checkpoint/resume + lineage for the crawl loop.

The reference loses its frontier when a queue node dies — accepted by design
(docs/Report.md:184-188).  The north rule upgrades that: after every round
the engine persists (a) the next frontier, (b) every seen-shard's state,
(c) politeness shard summaries, (d) per-partition lineage rows, then writes
an atomic ``COMMIT_{r}`` marker.  A restarted job scans markers, reloads the
shard actors and re-enters the loop at the first uncommitted round; the
round's record output directory is rewritten from scratch, so output stays
exactly-once per round (SURVEY.md §4 checkpoint row).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote(num_cpus=0)
class LineageActor:
    """Queryable per-partition lineage/metrics counters (reference analog:
    log lines; SURVEY.md §7.2 metrics row)."""

    def __init__(self):
        self.rows: list[dict] = []
        self._next_partition: dict[tuple, int] = {}
        # (round, stage, batch_key) -> rows index: the lineage analog of
        # the record sink's deterministic (round, first_seq) file name —
        # a Ray-RETRIED task re-presents the same batch_key and REPLACES
        # its earlier row (task_attempt incremented) instead of appending
        # a second one, so per-round lineage counters stay exactly-once
        self._by_key: dict[tuple, int] = {}
        # tombstones of keys that already LEFT in a drain: a task retried
        # AFTER the round-barrier drain (Ray object-lineage reconstruction
        # of a lost block) re-presents its batch_key, finds no _by_key
        # entry, and would otherwise APPEND a fresh row into the NEXT
        # drain — double-counting the round's counters.  Bounded: only
        # the last two drains' key sets are retained (reconstruction can
        # only re-run tasks whose outputs are still referenced, i.e. the
        # current and previous round; older rounds are checkpointed and
        # their blocks released).
        self._drained_recent: list[set] = [set(), set()]

    def record(self, **kw) -> None:
        key = (kw.get("round", -1), kw.get("stage", "?"))
        bk = kw.pop("batch_key", None)
        if bk is not None:
            if any(key + (bk,) in s for s in self._drained_recent):
                # retried across a drain: its first attempt's row already
                # left with that drain — drop, keeping exactly-once
                return
            idx = self._by_key.get(key + (bk,))
            if idx is not None:
                old = self.rows[idx]
                kw["partition"] = old.get("partition")
                kw["task_attempt"] = old.get("task_attempt", 1) + 1
                self.rows[idx] = kw
                return
        part = self._next_partition.get(key, 0)
        self._next_partition[key] = part + 1
        kw.setdefault("partition", part)
        kw.setdefault("task_attempt", 1)
        if bk is not None:
            self._by_key[key + (bk,)] = len(self.rows)
        self.rows.append(kw)

    def drain(self) -> list[dict]:
        out, self.rows = self.rows, []
        self._drained_recent = [set(self._by_key), self._drained_recent[0]]
        self._by_key = {}
        return out

    def all_rows(self) -> list[dict]:
        return list(self.rows)


class CheckpointManager:
    def __init__(self, ckpt_dir: str):
        self.dir = Path(ckpt_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _commit_path(self, r: int) -> Path:
        return self.dir / f"COMMIT_{r}.json"

    def latest_committed_round(self) -> int | None:
        rounds = sorted(
            int(p.stem.split("_")[1]) for p in self.dir.glob("COMMIT_*.json")
        )
        if not rounds:
            return None
        # commits are written strictly in round order, so a kill at any point
        # leaves a contiguous prefix 0..latest — a GAP can only come from
        # manual tampering, and resuming from the latest marker would then
        # silently skip re-running the missing round (its records stay
        # whatever state the tampering left).  Fail loudly instead.
        if rounds != list(range(rounds[-1] + 1)):
            raise ValueError(
                f"checkpoint commit markers are not contiguous: {rounds} — "
                "a crash cannot skip rounds, so this directory was altered "
                "out-of-band; refusing to resume (remove ALL COMMIT_*.json "
                "to rerun from scratch, or restore the missing rounds)")
        return rounds[-1]

    def save_round(
        self,
        r: int,
        next_frontier,  # pa.Table (driver barrier) or ray.data.Dataset (distributed)
        seen_states: list[dict],
        politeness_states: list[dict],
        lineage_rows: list[dict],
        summary: dict,
    ) -> None:
        # clear BOTH storage forms for this round first: a crashed save from
        # a run in the other execution mode must never leave a stale artifact
        # that load_round would prefer over the fresh one
        f_file = self.dir / f"frontier_after_round_{r}.parquet"
        f_dir = self.dir / f"frontier_after_round_{r}"
        if f_file.exists():
            f_file.unlink()
        if f_dir.exists():
            shutil.rmtree(f_dir)
        if isinstance(next_frontier, pa.Table):
            pq.write_table(next_frontier, f_file)
        else:  # Dataset: distributed parquet write, no driver materialization
            if next_frontier is None:
                f_dir.mkdir()
            else:
                next_frontier.write_parquet(str(f_dir))
        for st in seen_states:
            i = st["shard_id"]
            victim = st["cuckoo"].get("victim")
            bloom = st.get("bloom")
            np.savez(
                self.dir / f"seen_shard_{i}_round_{r}.npz",
                exact=st["exact"] if st["exact"] is not None else np.zeros(0, np.uint64),
                exact_mode=np.array([st["exact_mode"]]),
                cuckoo_table=st["cuckoo"]["table"],
                cuckoo_meta=np.array(
                    [st["cuckoo"]["nb"], st["cuckoo"]["bucket_size"],
                     st["cuckoo"]["max_kicks"], st["cuckoo"]["count"]], np.int64
                ),
                # victim slot + failure counter (over-full observability)
                cuckoo_extra=np.array(
                    [victim[0] if victim else -1, victim[1] if victim else 0,
                     st["cuckoo"].get("insert_failures", 0)], np.int64
                ),
                # per-shard bloom bits: production-mode resumes restart with a
                # WARM pre-filter instead of falling back to shard RPCs
                bloom_bits=bloom["bits"] if bloom is not None else np.zeros(0, np.uint64),
                bloom_meta=np.array(
                    [bloom["m"], bloom["k"], bloom["count"]] if bloom is not None
                    else [0, 0, 0], np.int64
                ),
                counters=np.asarray(st["counters"], np.int64),
            )
        (self.dir / f"politeness_round_{r}.json").write_text(json.dumps(politeness_states))
        if lineage_rows:
            lt = pa.Table.from_pylist(lineage_rows)
            pq.write_table(lt, self.dir / f"lineage_round_{r}.parquet")
        # atomic commit marker LAST — its presence defines "round r done"
        tmp = self.dir / f".COMMIT_{r}.tmp"
        tmp.write_text(json.dumps(summary, default=str))
        tmp.rename(self._commit_path(r))

    def frontier_files(self, r: int) -> list[str]:
        """The frontier parquet part files for round r, in order — either
        the single driver-barrier file or the distributed write's parts.
        Lets a distributed resume load frontier blocks as Ray tasks instead
        of a driver read (the 10^10-URL path never materializes the
        frontier on the driver, resume included)."""
        f_file = self.dir / f"frontier_after_round_{r}.parquet"
        if f_file.exists():
            return [str(f_file)]
        f_dir = self.dir / f"frontier_after_round_{r}"
        return [str(p) for p in sorted(f_dir.glob("*.parquet"))]

    def load_round(self, r: int, load_frontier: bool = True) -> dict:
        frontier = None
        if load_frontier:
            parts = self.frontier_files(r)
            frontier = (
                pa.concat_tables([pq.read_table(p) for p in parts]) if parts
                else None
            )
        seen_states = []
        # numeric shard order, NOT lexicographic filename order: with >= 10
        # shards, sorted() puts shard_10 before shard_2 and a positional zip
        # in restore_shards would hand every actor the wrong slice's state
        shard_files = sorted(
            self.dir.glob(f"seen_shard_*_round_{r}.npz"),
            key=lambda p: int(p.stem.split("_")[2]),
        )
        for p in shard_files:
            z = np.load(p, allow_pickle=False)
            i = int(p.stem.split("_")[2])
            nb, bs, mk, cnt = map(int, z["cuckoo_meta"])
            cuckoo = {"nb": nb, "bucket_size": bs, "max_kicks": mk,
                      "count": cnt, "table": z["cuckoo_table"]}
            if "cuckoo_extra" in z:
                vi, vf, fails = map(int, z["cuckoo_extra"])
                cuckoo["victim"] = (vi, vf) if vi >= 0 else None
                cuckoo["insert_failures"] = fails
            bloom = None
            if "bloom_meta" in z and int(z["bloom_meta"][0]) > 0:
                bm, bk, bc = map(int, z["bloom_meta"])
                bloom = {"m": bm, "k": bk, "count": bc, "bits": z["bloom_bits"]}
            seen_states.append(
                {
                    "shard_id": i,
                    "exact_mode": bool(z["exact_mode"][0]),
                    "exact": z["exact"] if bool(z["exact_mode"][0]) else None,
                    "cuckoo": cuckoo,
                    "bloom": bloom,
                    "counters": tuple(map(int, z["counters"])),
                }
            )
        politeness_states = json.loads(
            (self.dir / f"politeness_round_{r}.json").read_text()
        )
        summary = json.loads(self._commit_path(r).read_text())
        return {
            "frontier": frontier,
            "seen_states": seen_states,
            "politeness_states": politeness_states,
            "summary": summary,
        }

    # filename shapes this manager owns — clear() deletes ONLY these
    _ARTIFACT_PATTERNS = (
        "COMMIT_*.json", ".COMMIT_*.tmp", "frontier_after_round_*",
        "seen_shard_*_round_*.npz", "politeness_round_*.json",
        "lineage_round_*.parquet",
    )

    def clear(self) -> None:
        """Remove this run's checkpoint artifacts for a FRESH start.

        Deletes only filenames matching the known artifact shapes — never
        the directory wholesale: a caller may point checkpoint_dir at a
        directory that also holds unrelated files, and a fresh run must not
        silently destroy them.  Unrecognized files are left in place (they
        can't be mistaken for checkpoints by load_round / commit scans).
        """
        if not self.dir.exists():
            self.dir.mkdir(parents=True, exist_ok=True)
            return
        seen: set[Path] = set()
        for pat in self._ARTIFACT_PATTERNS:
            for p in self.dir.glob(pat):
                if p in seen:
                    continue
                seen.add(p)
                if p.is_dir():
                    shutil.rmtree(p)
                else:
                    p.unlink()

    def clean_uncommitted_records(self, records_root: str, committed: int | None) -> None:
        """Delete record dirs for rounds after the last commit (partial
        writes from a crashed run) so a resume rewrites them exactly once."""
        root = Path(records_root)
        if not root.exists():
            return
        for p in root.glob("round=*"):
            r = int(p.name.split("=")[1])
            if committed is None or r > committed:
                shutil.rmtree(p)

    def lineage_table(self) -> pa.Table | None:
        parts = sorted(self.dir.glob("lineage_round_*.parquet"))
        if not parts:
            return None
        return pa.concat_tables([pq.read_table(p) for p in parts], promote_options="default")
