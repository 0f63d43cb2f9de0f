#!/bin/bash
# Train MeBT: bash scripts/train_config_log.sh CONFIG LOGDIR
# (reference scripts/train_config_log_gpus.sh — the GPU-count argument is
# obsolete: parallelism comes from the JAX device mesh; set
# exp.model_parallel / run under multi-host jax.distributed instead.)
set -e
python -m mebt_tpu.cli.train --base "$1" --logdir "$2" --max_steps 2000000 \
    exp.accumulate_grad_batches=1
