#!/bin/bash
# Round-4 VERDICT item #9: seed the MultiMNIST default-vs-"both"
# decision. The blocker was two SINGLE-RUN deltas (default better by
# ~2pt image->text exact and ~18 ELBO nats; "both" better on round trip
# + sharp renders). Train each variant at 3 seeds and tabulate.
# ckpt_every=10 on BOTH arms (amortizes the ~10 MB/s relay state
# fetch; cadence identical across arms so the comparison is fair).
set -ex
cd "$(dirname "$0")/.."
RUNS=${RUNS:-/tmp/mm_seeds}
mkdir -p "$RUNS"

for seed in 0 1 2; do
  for variant in default both; do
    name="mm_${variant}_s${seed}"
    if [ ! -f "$RUNS/$name/quality.json" ]; then
      if [ "$variant" = both ]; then
        python -m mmvae_tpu.cli train --config multimnist --seed "$seed" --ckpt-every 10 \
          --workdir "$RUNS/$name" --config-file tools/mm_bin_both.json
      else
        # "default" here means the PRE-round-4 default (no binarize):
        # round 4 promoted cycle_render_binarize="both" into the
        # multimnist config off this very matrix, so the no-binarize
        # arm now needs an explicit override or both arms would train
        # the same variant.
        python -m mmvae_tpu.cli train --config multimnist --seed "$seed" --ckpt-every 10 \
          --workdir "$RUNS/$name" --config-file tools/mm_nobin.json
      fi
      python tools/quality_check.py multimnist "$RUNS/$name"
    fi
  done
done
echo ALL_SEED_RUNS_DONE
