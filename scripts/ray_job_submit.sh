#!/bin/bash
# Launch the KG-construction pipeline on a real Ray cluster via `ray job submit`
# (north-rule launch contract). In this sandbox there is no multi-node cluster,
# so the same entrypoint is exercised through `ray.init(address="local")` at two
# parallelism levels instead (bench.py --scaling); on a real deployment this
# script is the launch path, unchanged:
#
#   RAY_ADDRESS=http://<head-node>:8265 ./scripts/ray_job_submit.sh \
#       s3://bucket/transcripts/ s3://bucket/kg-out/
#
# The pipeline is resumable: resubmitting after a failure skips completed steps
# (per-step manifests) and completed table partitions (_SUCCESS stamps), so a
# job retry on a preempted cluster continues where it stopped. Scaling runs
# submit the IDENTICAL job to an N-node and a 4N-node cluster; the work
# decomposition is cluster-width-independent (bucket counts and chunk sizes
# derive from data volume, not CPU count), so both legs execute the same plan.
set -euo pipefail

SF_DIR="${1:?usage: ray_job_submit.sh <input-dir> <out-dir> [extra kg.py args...]}"
OUT_DIR="${2:?usage: ray_job_submit.sh <input-dir> <out-dir> [extra kg.py args...]}"
shift 2

exec ray job submit \
  --working-dir "$(dirname "$(dirname "$(readlink -f "$0")")")" \
  --no-wait \
  -- python -m r2s2_ray.pipelines.kg "$SF_DIR" "$OUT_DIR" "$@"
