"""Model complexity (reference utils/flops_counter.py:24-60).

TPU-native: instead of torch forward hooks per module, the FLOP count comes
from XLA's own cost analysis of the compiled forward — it covers every op,
including the local-aggregation kernel, with no per-layer hook code.  The
reference (and the paper table, README.md:43-52) reports MACs as "FLOPs";
``gmacs`` halves XLA's flop count for comparability.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_params(variables) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def get_model_complexity(model, input_size=(1, 224, 224, 3),
                         dtype=jnp.float32) -> Tuple[float, int]:
    """Returns (GMACs, params) for a forward pass at ``input_size``.

    Uses the XLA-oracle path for the aggregation op (impl under a compiled
    CPU lowering) — the arithmetic is identical to the kernel path.
    """
    x = jnp.zeros(input_size, dtype)
    shapes = jax.eval_shape(
        lambda r, x: model.init({"params": r}, x, training=False),
        jax.random.PRNGKey(0), x)
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    def fwd(v, x):
        return model.apply(v, x, training=False)

    compiled = jax.jit(fwd).lower(variables, x).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per device
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes["params"]))
    gmacs = flops / 2.0 / input_size[0] / 1e9
    return gmacs, n_params
