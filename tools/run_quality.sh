#!/bin/bash
# Full-scale quality pipeline (VERDICT r2 #1): synthetic GT-mesh dataset →
# 12k-iter training → run_testing metrics → 200-frame mesh export → CD/EMD
# vs the exact GT surfaces.  Results land in output/quality_run/ and are
# summarized by hand into QUALITY.md.
#
# Run on the TPU (single-client tunnel: nothing else may hold it).
# Expected wall: dataset ~10min (48 frames x 800² TPU raster), training ~3-4h
# at grid 192, eval ~30min.
set -e
cd "$(dirname "$0")/.."

DS=${DS:-output/quality_ds}
RUN=${RUN:-output/quality_run}
CFG=${CFG:-configs/synthetic-quality-full.yaml}

if [ ! -f "$DS/transforms_train.json" ]; then
  python - <<PY
from dgmesh_tpu.data.synthetic_mesh import generate_mesh_dataset
generate_mesh_dataset("$DS", n_frames=40, width=800, height=800, n_test=8,
                      subdiv=5, n_eval_meshes=200)
PY
fi

# The axon tunnel is flaky on long runs (remote-compile truncation, worker
# restarts) — retry from the latest mid-run checkpoint instead of dying.
ATTEMPTS=${ATTEMPTS:-6}
ok=0
for i in $(seq 1 "$ATTEMPTS"); do
  RESUME=()
  if ls "$RUN"/checkpoint/state_*.msgpack >/dev/null 2>&1; then
    RESUME=(--start_checkpoint "$RUN")
  fi
  if python -m dgmesh_tpu.cli.train --config "$CFG" -s "$DS" -m "$RUN" \
      --pretrain_mesh_path "$DS/mesh" --pretrain_mesh_path_test "$DS/mesh_test" \
      --export_meshes 200 --log_images \
      --save_iterations 2000 4000 6000 8000 10000 "${RESUME[@]}"; then
    ok=1; break
  fi
  echo "train attempt $i failed; cooling down the TPU tunnel and resuming" >&2
  sleep 120
done
[ "$ok" = 1 ] || { echo "training failed after $ATTEMPTS attempts" >&2; exit 1; }

python -m dgmesh_tpu.cli.mesh_evaluation --gt_dir "$DS/gt_eval" \
    --pred_dir "$RUN/meshes" --transforms "$DS/transforms_train.json" \
    --out "$RUN/eval_results.txt"

echo "=== test_result.txt ==="; cat "$RUN/test_results/test_result.txt"
echo "=== eval_results tail ==="; tail -3 "$RUN/eval_results.txt"
