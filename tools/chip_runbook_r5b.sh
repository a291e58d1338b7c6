#!/bin/bash
# r5 chip queue, part 2: re-baseline the roofline ledger at the shipped
# CHWN step (VERDICT r4 #3), refresh the flagship artifact with the fixed
# dispatch audit (#4), re-capture the on-chip E2E with convincing learning
# (#5), and the stretch flagship train trace (#8).
set -x
cd /root/repo
L=${1:-/tmp/runbook_r5b.log}
date >> $L
timeout 900 python -u -c 'import jax, jax.numpy as jnp, numpy as np, time
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
y = np.asarray(jax.jit(lambda a: (a @ a).sum())(x))
print("probe ok", float(y), time.time() - t0, flush=True)' >> $L 2>&1 \
  || { echo "PROBE FAILED" >> $L; exit 1; }
echo "=== train trace at HEAD (roofline re-baseline) ===" >> $L
timeout 2400 python -u tools/train_trace.py > /tmp/trace_path_r5.txt 2>> $L
cat /tmp/trace_path_r5.txt >> $L
TRACE=$(grep '^TRACE ' /tmp/trace_path_r5.txt | awk '{print $2}' | tail -1)
echo "trace: $TRACE" >> $L
python tools/train_attr.py "$TRACE" 8 >> $L 2>&1
echo "=== per-fusion roofline ===" >> $L
python tools/train_attr.py "$TRACE" 8 roofline >> $L 2>&1
echo "=== flagship bench (fixed dispatch audit) ===" >> $L
timeout 5400 python -u tools/flagship_bench.py FLAGSHIP_r05.json >> $L 2>&1
echo "=== bench.py (refresh cache at HEAD) ===" >> $L
timeout 1800 python bench.py >> $L 2>&1
echo "=== on-chip e2e real-data train (40 steps + masked eval) ===" >> $L
timeout 3600 python -u tools/e2e_chip_train.py 40 E2E_r05.json >> $L 2>&1
echo "RUNBOOK R5B DONE" >> $L
date >> $L
