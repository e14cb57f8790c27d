#!/bin/bash
# Round-3 MultiMNIST text->image experiment chain (queued behind the
# TPU relay outage; see docs/STATUS.md "Round 3 continued").
# Each run: train from scratch on the promoted MultiMNIST settings with
# one knob chain applied, then produce the quality report (ordered +
# multiset round trips) into the workdir.
set -ex
cd "$(dirname "$0")/.."
RUNS=${RUNS:-/tmp/mm_exp}
mkdir -p "$RUNS"

for name in mm_stopgrad mm_sg_align mm_align mm_cycle mm_factored_nocross; do
  if [ ! -f "$RUNS/$name/quality.json" ]; then
    python -m mmvae_tpu.cli train --config multimnist \
      --workdir "$RUNS/$name" --config-file "tools/$name.json"
    python tools/quality_check.py multimnist "$RUNS/$name"
  fi
done
echo ALL_EXPERIMENTS_DONE
