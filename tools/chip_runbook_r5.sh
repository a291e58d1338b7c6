#!/bin/bash
# r5 on-chip measurement queue (VERDICT r4 #2/#3): the two unmeasured CHWN
# dispatch cells (10x10@320 map, bs64 forms incl. the packed-lane variant)
# plus the boundary-transpose isolation that prices block-level residency.
set -x
cd /root/repo
L=${1:-/tmp/runbook_r5.log}
date >> $L
timeout 900 python -u -c 'import jax, jax.numpy as jnp, numpy as np, time
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
y = np.asarray(jax.jit(lambda a: (a @ a).sum())(x))
print("probe ok", float(y), time.time() - t0, flush=True)' >> $L 2>&1 \
  || { echo "PROBE FAILED" >> $L; exit 1; }
echo "=== N128 flagship cells (20x20, 16x16, 10x10) ===" >> $L
timeout 2400 python -u tools/chwn_bench.py all 20 16 10 >> $L 2>&1
echo "=== N64 cells (plain chwn + packed) ===" >> $L
timeout 3000 python -u tools/chwn_bench.py all 28n64 14n64 >> $L 2>&1
timeout 3000 python -u tools/chwn_bench.py all 20n64 10n64 >> $L 2>&1
echo "=== boundary transpose isolation ===" >> $L
timeout 1800 python -u tools/chwn_bench.py trans 28 14 16 20 >> $L 2>&1
echo "RUNBOOK R5 DONE" >> $L
date >> $L
