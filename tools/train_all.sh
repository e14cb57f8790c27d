#!/bin/bash
# Sequential quality runs for the remaining configs (background use).
set -x
cd /root/repo
python -m mmvae_tpu.cli train --config fashionmnist --workdir /tmp/runs/fashionmnist --epochs 60 --train-size 10000
python tools/quality_check.py fashionmnist /tmp/runs/fashionmnist
python -m mmvae_tpu.cli train --config multimnist --workdir /tmp/runs/multimnist --epochs 60 --train-size 10000
python -m mmvae_tpu.cli train --config celeba --workdir /tmp/runs/celeba --epochs 30 --train-size 10000
python tools/quality_check.py celeba /tmp/runs/celeba
python -m mmvae_tpu.cli train --config cub --workdir /tmp/runs/cub --epochs 40 --train-size 8000
