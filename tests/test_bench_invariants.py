"""Pins the XLA behaviors bench.py's published artifacts depend on.

bench.py --mfu derives FLOPs/step by lowering the SINGLE train step, not
by dividing the K-step fori_loop program's count by K — because HLO cost
analysis counts a while-loop body ONCE, not trip-count times.  If a JAX
upgrade ever changes that, the MFU artifact silently goes wrong K-fold;
this test turns that into a visible failure.
"""

import jax
import jax.numpy as jnp


def _flops(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax: one dict per device
        cost = cost[0]
    return float(cost["flops"])


def test_cost_analysis_counts_fori_loop_body_once():
    n, k = 64, 10
    one_matmul = 2 * n**3  # MACs counted as 2 flops

    def single(x):
        return x @ x

    def looped(x):
        return jax.lax.fori_loop(0, k, lambda i, x: x @ x, x)

    x = jnp.ones((n, n), jnp.float32)
    f_single = _flops(jax.jit(single).lower(x).compile())
    f_looped = _flops(jax.jit(looped).lower(x).compile())

    # The single-step program reports ~one matmul...
    assert 0.5 * one_matmul <= f_single <= 1.5 * one_matmul
    # ...and the K-step loop reports the BODY's flops (once), not K times:
    # bench.py must therefore NOT divide a loop program's count by K.
    assert f_looped < 2 * one_matmul, (
        f"XLA now multiplies loop-body flops by trip count "
        f"({f_looped} vs body {one_matmul}); update bench.py --mfu"
    )
