#!/bin/bash
# Executes the queued on-chip measurement sequence; run when the TPU returns.
set -x
cd /root/repo
L=/tmp/runbook.log
date >> $L
timeout 900 python -u -c 'import jax, jax.numpy as jnp, time
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
print("devices", jax.devices(), time.time() - t0, flush=True)
y = jax.jit(lambda a: (a @ a).sum())(x)
print("probe ok", float(y), time.time() - t0, flush=True)' >> $L 2>&1 || { echo "PROBE FAILED" >> $L; exit 1; }
echo "=== baseline ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py >> $L 2>&1
echo "=== BN_FUSED_BWD=1 ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py COTNET_BN_FUSED_BWD=1 >> $L 2>&1
echo "=== DENSE_GROUPED=1 ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py COTNET_DENSE_GROUPED=1 >> $L 2>&1
echo "=== both ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py COTNET_BN_FUSED_BWD=1 COTNET_DENSE_GROUPED=1 >> $L 2>&1
echo "=== all three ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py COTNET_BN_FUSED_BWD=1 COTNET_DENSE_GROUPED=1 COTNET_TILE_DOT=1 >> $L 2>&1
echo "=== TILE_DOT=1 ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py COTNET_TILE_DOT=1 >> $L 2>&1
echo "=== dx bench TILE_DOT 0/1 ===" >> $L
timeout 1800 python -u tools/dx_bench.py >> $L 2>&1
COTNET_TILE_DOT=1 timeout 1800 python -u tools/dx_bench.py >> $L 2>&1
echo "=== agg fwd TILE_DOT=1 ===" >> $L
COTNET_TILE_DOT=1 timeout 1800 python -u tools/agg_bench.py >> $L 2>&1
echo "=== flagship train baseline ===" >> $L
timeout 2400 python -u tools/train_ab_bench.py model=se_cotnetd_152 >> $L 2>&1 \
  || timeout 2400 python -u tools/train_ab_bench.py model=se_cotnetd_152 bs=64 >> $L 2>&1
echo "=== conv bwd breakdown ===" >> $L
timeout 2400 python -u tools/conv_bwd_bench.py >> $L 2>&1
echo "=== m-pack probe ===" >> $L
timeout 1800 python -u tools/m_pack_bench.py >> $L 2>&1
echo "RUNBOOK DONE" >> $L
date >> $L
