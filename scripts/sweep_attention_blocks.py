"""Block-size sweep for the Pallas attention kernels at the DC5 shape.

Round-4 verdict #3: DC5 (S~4.2k encoder tokens) trains at 0.58x the
reference-derived baseline, and scripts/profile_dc5.py attributes 48% of
the 102 ms step to the 6 encoder layers' attention fwd+bwd (8.17 ms/layer
vs a ~2.6 ms roofline at head_dim 32's K=32 MXU-depth ceiling).  This
sweep times ``pallas_masked_attention`` fwd and fwd+bwd at the encoder's
DC5 shape across (block_q, block_s) and the single-vs-S-blocked backward
route, the tunnel-honest way (K-iteration fori_loop in ONE dispatch,
distinct seeds, float() materialization — see .claude/skills/verify).

Usage: python scripts/sweep_attention_blocks.py [--k 30] [--seq 4200]
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
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, L, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, L, H, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, L, H, D), jnp.bfloat16)
    # realistic DC5 batch: one full image, one ~75%-valid (padded) image
    mask = jnp.zeros((B, L), jnp.int32)
    mask = mask.at[1, int(L * 0.75):].set(1)

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

    def fwd_loop(block_q):
        @jax.jit
        def run(seed, q, k, v):
            def body(i, acc):
                out = pa.pallas_masked_attention(
                    perturb(q, i, seed), k, v, mask, None, 0.0, block_q
                )
                return acc + out.astype(jnp.float32).sum()
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return run

    def train_loop(block_q):
        @jax.jit
        def run(seed, q, k, v):
            def body(i, acc):
                def f(qq):
                    out = pa.pallas_masked_attention(
                        qq, k, v, mask, None, 0.0, block_q
                    )
                    return out.astype(jnp.float32).sum()
                val, g = jax.value_and_grad(f)(perturb(q, i, seed))
                return acc + val + g.astype(jnp.float32).sum()
            return lax.fori_loop(0, K, body, jnp.float32(0))
        return run

    results = []
    with request_chip_pause():
        for bq in (64, 128, 256, 512):
            try:
                t = timeit(fwd_loop(bq), q, k, v)
                print(f"fwd       bq={bq:4d}            {t*1e3:8.3f} ms", flush=True)
                results.append(("fwd", bq, None, t))
            except Exception as e:
                print(f"fwd       bq={bq:4d}  FAILED: {type(e).__name__} {str(e)[:120]}",
                      flush=True)

        # S-blocked backward route (default above _BWD_SINGLE_MAX_S=2048)
        for bq in (128, 256, 512):
            for bs in (512, 1024, 2048):
                old = pa._DEF_BS
                pa._DEF_BS = bs
                try:
                    t = timeit(train_loop(bq), q, k, v)
                    print(f"fwd+bwd   bq={bq:4d} bs={bs:5d}  {t*1e3:8.3f} ms",
                          flush=True)
                    results.append(("fwd+bwd", bq, bs, t))
                except Exception as e:
                    print(f"fwd+bwd   bq={bq:4d} bs={bs:5d}  FAILED: "
                          f"{type(e).__name__} {str(e)[:120]}", flush=True)
                finally:
                    pa._DEF_BS = old

        # single-kernel backward route forced at this S (auto-shrunk BQ)
        old_max = pa._BWD_SINGLE_MAX_S
        pa._BWD_SINGLE_MAX_S = 1 << 30
        try:
            t = timeit(train_loop(128), q, k, v)
            print(f"fwd+bwd   single-kernel     {t*1e3:8.3f} ms", flush=True)
            results.append(("fwd+bwd-single", 128, None, t))
        except Exception as e:
            print(f"fwd+bwd   single-kernel     FAILED: {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)
        finally:
            pa._BWD_SINGLE_MAX_S = old_max

    best_f = min((r for r in results if r[0] == "fwd"), key=lambda r: r[3],
                 default=None)
    best_t = min((r for r in results if r[0].startswith("fwd+bwd")),
                 key=lambda r: r[3], default=None)
    if best_f:
        print(f"best fwd: bq={best_f[1]} {best_f[3]*1e3:.3f} ms")
    if best_t:
        print(f"best fwd+bwd: {best_t[0]} bq={best_t[1]} bs={best_t[2]} "
              f"{best_t[3]*1e3:.3f} ms")


if __name__ == "__main__":
    main()
