#!/usr/bin/env bash
# Train P2RNet. Data parallelism is automatic over all visible TPU chips
# (jax.sharding mesh — the reference's 4-GPU torch.distributed.launch recipe
# maps to a TPU slice with no launcher). Multi-host: start this script on
# every host with JAX coordinator env vars set (jax.distributed.initialize).
set -e
python main.py --config configs/config_files/p2rnet_train.yaml --mode train "$@"
