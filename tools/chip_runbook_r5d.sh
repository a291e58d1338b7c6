#!/bin/bash
# r5 chip queue, part 4: roofline at the strips-HEAD step + the flagship
# (se_cotnetd_152) train-step attribution (VERDICT r4 #8 stretch).
set -x
cd /root/repo
L=${1:-/tmp/runbook_r5d.log}
date >> $L
timeout 900 python -u -c 'import jax, jax.numpy as jnp, numpy as np, time
t0 = time.time()
x = jnp.ones((256, 256), jnp.bfloat16)
y = np.asarray(jax.jit(lambda a: (a @ a).sum())(x))
print("probe ok", float(y), time.time() - t0, flush=True)' >> $L 2>&1 \
  || { echo "PROBE FAILED" >> $L; exit 1; }
echo "=== cotnet50 train trace at strips-HEAD ===" >> $L
timeout 2400 python -u tools/train_trace.py > /tmp/trace_r5d.txt 2>> $L
cat /tmp/trace_r5d.txt >> $L
TRACE=$(grep '^TRACE ' /tmp/trace_r5d.txt | awk '{print $2}' | tail -1)
python tools/train_attr.py "$TRACE" 8 >> $L 2>&1
python tools/train_attr.py "$TRACE" 8 roofline >> $L 2>&1
echo "=== se_cotnetd_152 train trace (flagship attribution) ===" >> $L
timeout 3600 python -u tools/train_trace.py model=se_cotnetd_152 \
  > /tmp/trace_r5d2.txt 2>> $L
cat /tmp/trace_r5d2.txt >> $L
TRACE2=$(grep '^TRACE ' /tmp/trace_r5d2.txt | awk '{print $2}' | tail -1)
python tools/train_attr.py "$TRACE2" 8 >> $L 2>&1
python tools/train_attr.py "$TRACE2" 8 roofline >> $L 2>&1
echo "RUNBOOK R5D DONE" >> $L
date >> $L
