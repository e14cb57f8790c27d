#!/bin/bash
# Reproduce the BASELINE.md quality table end-to-end on the attached TPU.
# Each run trains from scratch on seeded synthetic data, then reports
# cross-modal metrics + grids into its workdir. Total ~2.5h wall
# (dominated by per-process remote compiles; see docs/DESIGN.md section 7).
#
# Round-2 recipe: the label/attr configs use --cross-recon for the
# quality rows (the reference-semantics variants remain the defaults and
# feed the parity metric; docs/DESIGN.md section 9), and MultiMNIST
# trains its full 80-epoch schedule for exact-match.
set -ex
cd "$(dirname "$0")/.."
RUNS=${RUNS:-/tmp/mmvae_runs}

python -m mmvae_tpu.cli train --config mnist --workdir $RUNS/mnist \
    --epochs 100 --train-size 20000 --cross-recon
python tools/quality_check.py mnist $RUNS/mnist

python -m mmvae_tpu.cli train --config fashionmnist \
    --workdir $RUNS/fashionmnist --epochs 60 --cross-recon
python tools/quality_check.py fashionmnist $RUNS/fashionmnist

python -m mmvae_tpu.cli train --config multimnist --workdir $RUNS/multimnist
python tools/quality_check.py multimnist $RUNS/multimnist

python -m mmvae_tpu.cli train --config celeba --workdir $RUNS/celeba \
    --epochs 40 --cross-recon
python tools/quality_check.py celeba $RUNS/celeba

python -m mmvae_tpu.cli train --config cub --workdir $RUNS/cub
python tools/quality_check.py cub $RUNS/cub

python bench.py  # emits BOTH metric lines (mnist + celeba) since round 5

# CUB at 128x128 (round 3): the largest configuration -- promoted
# capacity settings + 5-level conv stack + grad clipping (unclipped,
# the 128x128 run loss-spikes 20x by epoch 12).
python -m mmvae_tpu.cli train --config cub --workdir $RUNS/cub128 \
  --config-file tools/cub128.json
python tools/quality_check.py cub $RUNS/cub128
python -m mmvae_tpu.cli eval --config cub --workdir $RUNS/cub128 --iwae-k 64

# Objective-family comparison rows (round 3, BASELINE.md): the MMVAE
# and MoPoE mixture objectives on the mnist settings of the table's
# mvae+cross-recon row (no cross-recon flag -- the mixture objectives
# decode every modality from every component by construction), plus
# the MultiMNIST no-cycle comparison (does the mixture objective move
# the text->image round trip on its own?).
for OBJ in mmvae mopoe; do
  python -m mmvae_tpu.cli train --config mnist --workdir $RUNS/mnist_$OBJ \
      --epochs 100 --train-size 20000 --objective $OBJ
  python tools/quality_check.py mnist $RUNS/mnist_$OBJ
done
# MultiMNIST / CelebA / CUB objective-family rows (all three non-mvae
# objectives; the CLI clears the configs' mvae-only default knobs --
# n_random_subsets / cross_recon -- when the objective is not mvae).
for OBJ in mmvae mopoe mvtcae; do
  python -m mmvae_tpu.cli train --config multimnist \
      --workdir $RUNS/multimnist_$OBJ --config-file tools/mm_$OBJ.json
  python tools/quality_check.py multimnist $RUNS/multimnist_$OBJ
  python -m mmvae_tpu.cli train --config celeba \
      --workdir $RUNS/celeba_$OBJ --epochs 40 --objective $OBJ
  python tools/quality_check.py celeba $RUNS/celeba_$OBJ
  python -m mmvae_tpu.cli train --config cub \
      --workdir $RUNS/cub_$OBJ --config-file tools/cub_$OBJ.json
  python tools/quality_check.py cub $RUNS/cub_$OBJ
done
# Cross-family-comparable marginal LL (IWAE-64) on the mnist rows
# (the per-family "test objective value" column is NOT comparable):
python -m mmvae_tpu.cli train --config mnist --workdir $RUNS/mnist_xr \
    --epochs 100 --train-size 20000 --cross-recon
for W in $RUNS/mnist_xr $RUNS/mnist_mmvae $RUNS/mnist_mopoe $RUNS/mnist_mvtcae; do
  python -m mmvae_tpu.cli eval --config mnist --workdir $W --iwae-k 64
done

# MVTCAE objective row (round 3): same mnist settings as the table.
python -m mmvae_tpu.cli train --config mnist --workdir $RUNS/mnist_mvtcae \
    --epochs 100 --train-size 20000 --objective mvtcae
python tools/quality_check.py mnist $RUNS/mnist_mvtcae
