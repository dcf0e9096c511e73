"""Empty-input robustness sweep (STATUS item 26 / r4 verdict task 2).

Runs every non-media ``queries()`` entry against a ZERO-ROW copy of all
ten input tables and classifies the outcome:

- ``clean``    — returned a (necessarily empty) result
- ``designed`` — raised ValueError (EmptyTableError or one of the
  per-query loud guards): the documented failure contract
- ``OTHER``    — anything else (KeyError-class deaths from Ray's
  empty-block schema erasure): the bug class the load()-level
  EmptyTableError guard exists to eliminate.  The sweep exits nonzero
  if any remain.

Media-corpus queries (audio/video/image families) synthesize their own
deterministic corpora and never read the sf tables, so an empty sf dir
is not a meaningful input for them — excluded, as in the round-4 sweep.

Usage: python tools/empty_sweep.py [schema_sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

import pyarrow.parquet as pq

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()
MEDIA = re.compile(r"audio|video|media|avi|wav|mp3|image|jpeg|phash|pixel")


def make_empty_dir(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        pq.write_table(schema.empty_table(), os.path.join(dst, f"{t}.parquet"))


def main() -> None:
    import ray

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = "/tmp/sf_empty_sweep"
    make_empty_dir(src, dst)

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    q = entry.queries()
    names = [n for n in sorted(q) if not MEDIA.search(n)]
    counts = {"clean": 0, "designed": 0, "OTHER": 0}
    other = []
    for name in names:
        try:
            q[name](dst)
            verdict = "clean"
        except ValueError:
            verdict = "designed"
        except Exception as e:  # noqa: BLE001 — classification is the point
            verdict = "OTHER"
            other.append((name, repr(e)))
            traceback.print_exc(limit=1)
        counts[verdict] += 1
        print(f"{name:40s} {verdict}")
    print(f"\nswept {len(names)} non-media queries: {counts}")
    if other:
        print("OTHER (KeyError-class) failures:")
        for name, err in other:
            print(f"  {name}: {err[:160]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
