#!/usr/bin/env bash
# Submit the flagship crawl to a Ray cluster (SURVEY.md §7.1 step 10).
#
# On a real multi-node cluster:
#   RAY_ADDRESS=http://<head>:8265 ./jobs/submit.sh --corpus-size 100000 --rounds 6
# In this sandbox (no cluster / no dashboard): falls back to a local driver
# run of the identical entrypoint, which is also what `ray job submit`
# would execute on the head node.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ARGS=${@:-"--corpus-size 20000 --rounds 4 --concurrency 16"}

if command -v ray >/dev/null && [[ "${RAY_ADDRESS:-local}" != "local" ]]; then
    exec ray job submit \
        --working-dir "$REPO" \
        --no-wait \
        -- python -m weaver_ray crawl $ARGS
fi
echo "[submit.sh] no remote RAY_ADDRESS; running the job entrypoint locally" >&2
exec env PYTHONPATH="$REPO" python -m weaver_ray crawl $ARGS
