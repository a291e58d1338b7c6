#!/usr/bin/env bash
# Single-host launch (chips come from the data mesh; multi-host adds
# jax.distributed via cotnet_tpu.parallel.initialize_distributed)
cd "$(dirname "$0")/../.." && python -m cotnet_tpu.train_cli --folder "$(dirname "$0")"
