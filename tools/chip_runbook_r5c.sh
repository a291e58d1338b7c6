#!/bin/bash
# r5 chip queue, part 3: A/B the CHWN-resident-weights gate on the full
# train step, and the stage-1 CHWN H-strip prototype shootout.
set -x
cd /root/repo
L=${1:-/tmp/runbook_r5c.log}
date >> $L
timeout 900 python -u -c 'import jax, jax.numpy as jnp, numpy as np, time
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
y = np.asarray(jax.jit(lambda a: (a @ a).sum())(x))
print("probe ok", float(y), time.time() - t0, flush=True)' >> $L 2>&1 \
  || { echo "PROBE FAILED" >> $L; exit 1; }
echo "=== train A/B: baseline ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py >> $L 2>&1
echo "=== train A/B: COTNET_CHWN_W=1 ===" >> $L
timeout 1800 python -u tools/train_ab_bench.py COTNET_CHWN_W=1 >> $L 2>&1
echo "=== stage-1 CHWN strips hs=8 ===" >> $L
timeout 2400 python -u tools/chwn_bench.py s1 8 >> $L 2>&1
echo "=== stage-1 CHWN strips hs=14 ===" >> $L
timeout 2400 python -u tools/chwn_bench.py s1 14 >> $L 2>&1
echo "=== stage-1 CHWN strips hs=4 ===" >> $L
timeout 2400 python -u tools/chwn_bench.py s1 4 >> $L 2>&1
echo "RUNBOOK R5C DONE" >> $L
date >> $L
