#!/bin/bash
# Round-3 cycle-contrast ablation: the promoted MultiMNIST settings
# (mm_cycle_rg) + cycle_contrast_weight in {1, 10, 100}. Each run
# trains from scratch, then writes quality.json (round trips + the new
# render_max_pixel / render_pixel_std contrast numbers). Idempotent:
# a run is skipped when its quality.json exists (relay-outage-safe).
set -ex
cd "$(dirname "$0")/.."
RUNS=${RUNS:-/tmp/mm_cc}
mkdir -p "$RUNS"

for name in mm_cc1 mm_cc10 mm_cc100 mm_cc1000; do
  if [ ! -f "$RUNS/$name/quality.json" ]; then
    python -m mmvae_tpu.cli train --config multimnist \
      --workdir "$RUNS/$name" --config-file "tools/$name.json"
    python tools/quality_check.py multimnist "$RUNS/$name"
  fi
done
echo ALL_CONTRAST_EXPERIMENTS_DONE
