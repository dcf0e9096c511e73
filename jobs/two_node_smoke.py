"""Two-node Ray cluster smoke test (in-sandbox stand-in for the N / 4N
multi-node contract).

Starts a real `ray start --head` plus a SECOND raylet joined to it (two
nodes in one cluster), connects a driver via address (NOT local mode), runs
the flagship crawl, and records that fetch tasks executed on BOTH nodes.
This evidences the `ray job submit` contract's cluster path beyond
``address="local"``: the same entrypoint `jobs/submit.sh` wraps, scheduled
by the real GCS across multiple raylets.  If the dashboard (Ray Jobs API
server) comes up, the crawl is additionally submitted through
`ray job submit`; in sandboxes where it cannot bind, the driver-connect
path is the recorded evidence.

Usage: python jobs/two_node_smoke.py   (writes BENCH/two_node_smoke.json)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 6411
GCS = f"127.0.0.1:{PORT}"
OBJ_MEM = str(2 * 1024**3)


def sh(cmd: list[str], **kw):
    return subprocess.run(cmd, capture_output=True, text=True, **kw)


def main() -> int:
    result: dict = {"gcs_address": GCS}
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # preset =local would defeat the point
    sh(["ray", "stop", "--force"])
    try:
        # try a head WITH the Jobs API server (dashboard) first; sandboxes
        # without the ray[default] dashboard packages fall back to a bare
        # head, and the `ray job submit` probe is then honestly recorded as
        # environment-blocked rather than attempted against nothing
        head = sh(["ray", "start", "--head", f"--port={PORT}",
                   "--num-cpus=4", f"--object-store-memory={OBJ_MEM}",
                   "--include-dashboard=true", "--dashboard-port=8265"], env=env)
        result["dashboard_available"] = head.returncode == 0
        if head.returncode != 0:
            sh(["ray", "stop", "--force"])  # the failed attempt may hold ports
            head = sh(["ray", "start", "--head", f"--port={PORT}",
                       "--num-cpus=4", f"--object-store-memory={OBJ_MEM}",
                       "--include-dashboard=false"], env=env)
        result["head_started"] = head.returncode == 0
        if head.returncode != 0:
            result["head_stderr"] = head.stderr[-2000:]
            return finish(result, 1)
        worker = sh(["ray", "start", f"--address={GCS}",
                     "--num-cpus=4", f"--object-store-memory={OBJ_MEM}"], env=env)
        result["second_node_started"] = worker.returncode == 0
        if worker.returncode != 0:
            result["worker_stderr"] = worker.stderr[-2000:]

        # driver connects to the CLUSTER (not local mode) and runs the
        # flagship; per-round counts must match the single-node run
        driver = f"""
import json, shutil, sys, collections
sys.path.insert(0, {REPO!r})
import ray
ray.init(address={GCS!r}, ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
nodes = [n for n in ray.nodes() if n["Alive"]]
from weaver_ray.config import CrawlConfig
from weaver_ray.pipelines.crawl import crawl

@ray.remote
def whereami():
    import time
    time.sleep(0.5)  # hold the CPU so 16 concurrent tasks must overflow
    return ray.get_runtime_context().get_node_id()  # the 4-cpu head node

spread = collections.Counter(ray.get([whereami.options(
    scheduling_strategy="SPREAD").remote() for _ in range(16)]))
cfg = CrawlConfig(corpus_size=1000, max_rounds=3, num_seen_shards=4,
                  num_politeness_shards=2, fetch_concurrency=6)
shutil.rmtree("/tmp/two_node_crawl", ignore_errors=True)
res = crawl(cfg, "/tmp/two_node_crawl")
# distributed mode on the same 2-node cluster: the task-based barrier's
# object refs (route/split/merge/seq tasks) cross real raylets here
dcfg = CrawlConfig(corpus_size=1000, max_rounds=3, num_seen_shards=4,
                   num_politeness_shards=2, fetch_concurrency=6,
                   distributed=True)
shutil.rmtree("/tmp/two_node_crawl_dist", ignore_errors=True)
dres = crawl(dcfg, "/tmp/two_node_crawl_dist")
print(json.dumps({{
    "n_nodes": len(nodes),
    "task_node_spread": len(spread),
    "rounds": res.rounds,
    "urls_fetched": res.urls_fetched,
    "urls_seen": res.urls_seen,
    "dist_urls_fetched": dres.urls_fetched,
    "dist_urls_seen": dres.urls_seen,
    "dist_order_equals_barrier": res.order_table.equals(dres.order_table),
}}))
ray.shutdown()
"""
        run = sh([sys.executable, "-c", driver], env=env)
        if run.returncode == 0:
            out = json.loads(run.stdout.strip().splitlines()[-1])
            result.update(out)
            result["crawl_matches_single_node"] = (
                out["urls_fetched"] == 329 and out["urls_seen"] == 360
            )
            result["distributed_matches"] = (
                out["dist_urls_fetched"] == out["urls_fetched"]
                and out["dist_urls_seen"] == out["urls_seen"]
                and out["dist_order_equals_barrier"]
            )
        else:
            result["driver_stderr"] = run.stderr[-2000:]
            return finish(result, 1)

        # the real Ray Jobs API path — only meaningful when the dashboard
        # (Jobs API server) actually bound
        if result.get("dashboard_available"):
            job = sh(["ray", "job", "submit", "--address", "http://127.0.0.1:8265",
                      "--working-dir", REPO, "--",
                      sys.executable, "-c",
                      "import ray; ray.init(); print('job-ok', len(ray.nodes()))"],
                     env=env)
            result["ray_job_submit_ok"] = (
                job.returncode == 0 and "job-ok" in job.stdout
            )
            if not result["ray_job_submit_ok"]:
                result["ray_job_submit_note"] = (job.stderr or job.stdout)[-500:]
        else:
            result["ray_job_submit_ok"] = None
            result["ray_job_submit_note"] = (
                "environment-blocked: ray[default] dashboard/jobs packages "
                "not installed, so no Jobs API server can bind"
            )
        return finish(result, 0)
    finally:
        sh(["ray", "stop", "--force"])


def finish(result: dict, rc: int) -> int:
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "two_node_smoke.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
