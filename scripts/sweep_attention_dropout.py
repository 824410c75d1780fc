"""Dropout-cost arm of the DC5 attention sweep (see sweep_attention_blocks).

The DC5 bench trains at reference dropout 0.1, where the in-kernel hash
keep-mask is regenerated in forward AND both backward kernels over
(BQ, S)-shaped tiles — at S=4200 that is ~17.6M hash evaluations per
layer per generation.  Measures fwd and fwd+bwd at the sweep's best
blocks with dropout 0.0 vs 0.1 to price the mask.

Usage: python scripts/sweep_attention_dropout.py [--bq 512] [--bs 1024]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=4200)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=32)
    ap.add_argument("--bq", type=int, default=512)
    ap.add_argument("--bs", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from detr_tpu.ops import pallas_attention as pa
    from detr_tpu.utils.chip_pause import request_chip_pause

    B, L, H, D = args.batch, args.seq, args.heads, args.head_dim
    K = args.k
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)
    mask = jnp.zeros((B, L), jnp.int32).at[1, int(L * 0.75):].set(1)

    def timeit(jitted, *fn_args):
        float(jitted(jnp.int32(0), *fn_args))
        ts = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            float(jitted(jnp.int32(1 + rep), *fn_args))
            ts.append((time.perf_counter() - t0) / K)
        ts.sort()
        return ts[len(ts) // 2]

    def perturb(x, i, seed):
        return x + (1e-6 * (i + seed)).astype(x.dtype)

    def train_loop(rate):
        @jax.jit
        def run(seed, q, k, v):
            def body(i, acc):
                def f(qq):
                    out = pa.pallas_masked_attention(
                        qq, k, v, mask,
                        jnp.reshape(seed + i, (1,)).astype(jnp.int32),
                        rate, args.bq,
                    )
                    return out.astype(jnp.float32).sum()
                val, g = jax.value_and_grad(f)(perturb(q, i, seed))
                return acc + val + g.astype(jnp.float32).sum()
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return run

    pa._DEF_BS = args.bs
    with request_chip_pause():
        for rate in (0.0, 0.1):
            try:
                t = timeit(train_loop(rate), q, k, v)
                print(f"fwd+bwd bq={args.bq} bs={args.bs} dropout={rate}: "
                      f"{t*1e3:.3f} ms", flush=True)
            except Exception as e:
                print(f"dropout={rate} FAILED: {type(e).__name__} "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
