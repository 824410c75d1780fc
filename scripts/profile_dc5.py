"""DC5 step-time breakdown (round-3/4 verdict: DC5 at 0.58x baseline).

BASELINE.json config #4 (DC5, batch 2, 800x1344 -> S = 50*84 = 4200
encoder tokens) measured 19.7 img/s in round 3 vs the reference's 34.
At ~1e12 train FLOPs/img that is ~10% MFU on a v5e — not roofline-bound,
so something is structurally slow.  This script attributes the ~100 ms
step to components with separately jitted timings:

  * full train step (parity with bench.py --config dc5)
  * backbone fwd / fwd+bwd           (dilated stride-16 R50)
  * encoder fwd / fwd+bwd            (6 layers at S=4200)
  * attention core fwd / fwd+bwd     (Pallas vs XLA, B=2 H=8 S=4200 D=32)
  * matcher + criterion
  * optimizer update

Usage: python scripts/profile_dc5.py [--k 20] [--batch 2]
Writes a markdown table to stdout; honest numbers need the chip quiet
(touch the chip-pause flag or stop the trainer first).
"""

from __future__ import annotations

import argparse
import functools
import time


def timeit(fn, *args, k=10, warmup=2):
    """Median wall-clock of fn(*args) fully materialized, k reps."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from detr_tpu.config import DETRConfig, TrainingConfig
    from detr_tpu.data import synthetic_batch
    from detr_tpu.losses.criterion import total_loss
    from detr_tpu.models import DETR
    from detr_tpu.models.transformer import Encoder
    from detr_tpu.ops.attention import scaled_dot_product_attention
    from detr_tpu.ops.pallas_attention import pallas_masked_attention
    from detr_tpu.train import create_train_state
    from detr_tpu.train.train_step import _targets_of_batch, build_criterion
    from detr_tpu.utils.chip_pause import request_chip_pause

    B, H, W = args.batch, args.height, args.width
    detr_config = DETRConfig(dtype="bfloat16", dilation=True)
    train_config = TrainingConfig(
        cumulative_train_batch_size=B, train_batch_size=B
    )
    model = DETR(detr_config)
    criterion = build_criterion(train_config, detr_config)

    batch = {
        k: jnp.asarray(v)
        for k, v in synthetic_batch(
            np.random.default_rng(0), batch_size=B, height=H, width=W, max_gt=25
        ).items()
    }
    tx = optax.chain(
        optax.clip_by_global_norm(0.1), optax.adamw(1e-4)
    )
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    params, frozen = state.params, state.frozen

    rows: list[tuple[str, float]] = []

    def add(name, secs):
        rows.append((name, secs))
        print(f"{name:42s} {secs * 1e3:9.2f} ms", flush=True)

    with request_chip_pause():
        # ---- full train step ----
        def loss_fn(p, b, rng_):
            out = model.apply(
                {"params": p, "frozen": frozen},
                b["image"], b["height"], b["width"], False,
                rngs={"dropout": rng_},
            )
            return total_loss(criterion(out, _targets_of_batch(b)))

        @jax.jit
        def train_step(s, b):
            rng_, drng = jax.random.split(s.rng)
            loss, grads = jax.value_and_grad(loss_fn)(s.params, b, drng)
            return s.apply_gradients(grads).replace(rng=rng_), loss

        t = timeit(lambda: train_step(state, batch)[1], k=args.k)
        add("full train step", t)
        step_total = t

        # ---- forward only (deterministic) ----
        @jax.jit
        def fwd(p, b):
            return model.apply(
                {"params": p, "frozen": frozen},
                b["image"], b["height"], b["width"], True,
            )

        t_fwd = timeit(lambda: fwd(params, batch), k=args.k)
        add("model forward (det)", t_fwd)

        # ---- backbone ----
        @jax.jit
        def bb_fwd(p, img):
            feats = model.apply(
                {"params": p, "frozen": frozen}, img,
                method=lambda mdl, x: mdl.backbone(x),
            )
            return jnp.sum(feats.astype(jnp.float32))

        t_bb = timeit(lambda: bb_fwd(params, batch["image"]), k=args.k)
        add("backbone fwd", t_bb)
        bb_grad = jax.jit(jax.grad(lambda p, img: bb_fwd(p, img)))
        t_bb_b = timeit(lambda: bb_grad(params, batch["image"]), k=args.k)
        add("backbone fwd+bwd", t_bb_b)

        # ---- encoder at S = H/16 * W/16 ----
        S = (H // 16) * (W // 16)
        d = detr_config.hidden_size
        enc = Encoder(detr_config)
        tokens = jnp.zeros((B, S, d), jnp.bfloat16)
        pos = jnp.zeros((B, S, d), jnp.bfloat16)
        mask = jnp.zeros((B, S), bool)
        enc_vars = enc.init(jax.random.PRNGKey(0), tokens, pos, mask, True)

        @jax.jit
        def enc_fwd(p, tkn):
            return jnp.sum(
                enc.apply(p, tkn, pos, mask, True).astype(jnp.float32)
            )

        t_enc = timeit(lambda: enc_fwd(enc_vars, tokens), k=args.k)
        add(f"encoder fwd (S={S})", t_enc)
        enc_grad = jax.jit(jax.grad(enc_fwd, argnums=1))
        t_enc_b = timeit(lambda: enc_grad(enc_vars, tokens), k=args.k)
        add("encoder fwd+bwd (d/dtokens)", t_enc_b)

        # ---- attention core A/B ----
        nh, hd = detr_config.num_attention_heads, d // detr_config.num_attention_heads
        q = jnp.zeros((B, S, nh, hd), jnp.bfloat16)
        kpm = jnp.zeros((B, S), bool)

        @jax.jit
        def pallas_fwd(q):
            return jnp.sum(
                pallas_masked_attention(q, q, q, kpm).astype(jnp.float32)
            )

        t = timeit(lambda: pallas_fwd(q), k=args.k)
        add("pallas attn fwd (1 layer)", t)
        pallas_g = jax.jit(jax.grad(pallas_fwd))
        t = timeit(lambda: pallas_g(q), k=args.k)
        add("pallas attn fwd+bwd", t)

        @jax.jit
        def xla_fwd(q):
            return jnp.sum(
                scaled_dot_product_attention(
                    q, q, q, key_padding_mask=kpm, deterministic=True
                ).astype(jnp.float32)
            )

        t = timeit(lambda: xla_fwd(q), k=args.k)
        add("xla attn fwd (1 layer)", t)
        xla_g = jax.jit(jax.grad(xla_fwd))
        t = timeit(lambda: xla_g(q), k=args.k)
        add("xla attn fwd+bwd", t)

        # ---- matcher + criterion ----
        out = fwd(params, batch)

        @jax.jit
        def crit(o, b):
            return total_loss(criterion(o, _targets_of_batch(b)))

        t = timeit(lambda: crit(out, batch), k=args.k)
        add("matcher + criterion", t)

        # ---- optimizer ----
        zeros_grads = jax.tree.map(jnp.zeros_like, params)

        @jax.jit
        def opt(s, g):
            return s.apply_gradients(g)

        t = timeit(lambda: opt(state, zeros_grads), k=args.k)
        add("optimizer update (adamw+clip)", t)

    print("\n| component | ms | % of step |")
    print("|---|---|---|")
    for name, secs in rows:
        print(f"| {name} | {secs * 1e3:.2f} | {100 * secs / step_total:.0f}% |")
    print(f"\nimg/s at full step: {args.batch / step_total:.1f}")


if __name__ == "__main__":
    main()
