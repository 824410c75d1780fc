"""DC5 step-time breakdown (round-3/4 verdict: DC5 at 0.58x baseline).

BASELINE.json config #4 (DC5, batch 2, 800x1344 -> S = 50*84 = 4200
encoder tokens) measured 19.7 img/s in round 3 vs the reference's 34.
At ~1e12 train FLOPs/img that is ~10% MFU on a v5e — not roofline-bound,
so something is structurally slow.  This script attributes the step to
components, each timed the tunnel-honest way (see .claude/skills/verify):

  * every timed quantity is ONE jitted dispatch containing a
    ``lax.fori_loop`` of K data-dependent iterations (per-dispatch
    latency through the axon relay is ~44 ms — single-step timings
    measure the tunnel, not the chip);
  * a scalar is materialized with ``float()`` before the timer is read
    (``block_until_ready`` does not force execution through the relay);
  * a distinct ``seed`` argument per measured dispatch defeats the
    relay's identical-program+input execution cache.

Components: full train step, backbone fwd / fwd+bwd (dilated stride-16
R50), encoder fwd / fwd+bwd at S=4200, attention core fwd / fwd+bwd
(Pallas vs XLA), matcher + criterion, optimizer update.

Usage: python scripts/profile_dc5.py [--k 20] [--batch 2]
Writes a markdown table to stdout; honest numbers need the chip quiet
(request_chip_pause is taken for the duration).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--k", type=int, default=20, help="fori_loop iterations per dispatch")
    ap.add_argument("--reps", type=int, default=3, help="measured dispatches (median)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1344)
    ap.add_argument("--xla-attention", action="store_true",
                    help="profile the model with XLA attention instead of Pallas")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

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
    K = args.k
    detr_config = DETRConfig(
        dtype="bfloat16", dilation=True,
        use_pallas_attention=not args.xla_attention,
    )
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

    def timeit_loop(jitted, *fn_args):
        """Median per-iteration seconds of a jitted (seed, *fn_args) ->
        scalar dispatch that loops K times internally."""
        float(jitted(jnp.int32(0), *fn_args))  # compile + warm
        ts = []
        for rep in range(args.reps):
            t0 = time.perf_counter()
            float(jitted(jnp.int32(1 + rep), *fn_args))
            ts.append((time.perf_counter() - t0) / K)
        ts.sort()
        return ts[len(ts) // 2]

    def add(name, secs):
        rows.append((name, secs))
        print(f"{name:42s} {secs * 1e3:9.2f} ms", flush=True)

    img = batch["image"]

    def perturb(x, i, seed):
        # dtype-preserving tiny input perturbation: keeps loop iterations
        # and dispatches distinct (relay execution cache) without
        # promoting bf16 tensors to f32.
        return x + (1e-6 * (i + seed)).astype(x.dtype)

    with request_chip_pause():
        # ---- full train step (parity with bench.py --config dc5) ----
        def loss_fn(p, b, rng_):
            out = model.apply(
                {"params": p, "frozen": frozen},
                b["image"], b["height"], b["width"], False,
                rngs={"dropout": rng_},
            )
            return total_loss(criterion(out, _targets_of_batch(b)))

        @jax.jit
        def steps_chained(seed, s, b):
            def body(i, carry):
                s, _ = carry
                bb = dict(b)
                bb["image"] = perturb(b["image"], i, seed)
                rng_, drng = jax.random.split(s.rng)
                loss, grads = jax.value_and_grad(loss_fn)(s.params, bb, drng)
                return s.apply_gradients(grads).replace(rng=rng_), loss
            _, loss = lax.fori_loop(0, K, body, (s, jnp.float32(0)))
            return loss

        t = timeit_loop(steps_chained, state, batch)
        add("full train step", t)
        step_total = t

        # ---- forward only (deterministic) ----
        @jax.jit
        def fwd_loop(seed, p, b):
            def body(i, acc):
                out = model.apply(
                    {"params": p, "frozen": frozen},
                    perturb(b["image"], i, seed),
                    b["height"], b["width"], True,
                )
                return acc + jnp.sum(out["pred_logits"].astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0))

        add("model forward (det)", timeit_loop(fwd_loop, params, batch))

        # ---- backbone (dilated stride-16 R50) ----
        def bb_scalar(p, x):
            feats = model.apply(
                {"params": p, "frozen": frozen}, x,
                method=lambda mdl, z: mdl.backbone(z),
            )
            return jnp.sum(feats.astype(jnp.float32))

        @jax.jit
        def bb_fwd_loop(seed, p, x):
            def body(i, acc):
                return acc + bb_scalar(p, perturb(x, i, seed))
            return lax.fori_loop(0, K, body, jnp.float32(0))

        add("backbone fwd", timeit_loop(bb_fwd_loop, params, img))

        @jax.jit
        def bb_bwd_loop(seed, p, x):
            def body(i, acc):
                g = jax.grad(bb_scalar, argnums=1)(p, perturb(x, i, seed))
                return acc + jnp.sum(g.astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0))

        add("backbone fwd+bwd (d/dimage)", timeit_loop(bb_bwd_loop, params, img))

        # ---- encoder at S = H/16 * W/16 ----
        S = (H // 16) * (W // 16)
        d = detr_config.hidden_size
        enc = Encoder(detr_config)
        tokens = jnp.ones((B, S, d), jnp.bfloat16)
        pos = jnp.zeros((B, S, d), jnp.bfloat16)
        mask = jnp.zeros((B, S), bool)
        enc_vars = enc.init(jax.random.PRNGKey(0), tokens, pos, mask, True)

        def enc_scalar(v, tkn):
            return jnp.sum(enc.apply(v, tkn, pos, mask, True).astype(jnp.float32))

        @jax.jit
        def enc_fwd_loop(seed, v, tkn):
            def body(i, acc):
                return acc + enc_scalar(v, perturb(tkn, i, seed))
            return lax.fori_loop(0, K, body, jnp.float32(0))

        add(f"encoder fwd (S={S})", timeit_loop(enc_fwd_loop, enc_vars, tokens))

        @jax.jit
        def enc_bwd_loop(seed, v, tkn):
            def body(i, acc):
                g = jax.grad(enc_scalar, argnums=1)(v, perturb(tkn, i, seed))
                return acc + jnp.sum(g.astype(jnp.float32))
            return lax.fori_loop(0, K, body, jnp.float32(0))

        add("encoder fwd+bwd (d/dtokens)",
            timeit_loop(enc_bwd_loop, enc_vars, tokens))

        # ---- attention core A/B (1 layer) ----
        nh = detr_config.num_attention_heads
        hd = d // nh
        q0 = jnp.ones((B, S, nh, hd), jnp.bfloat16)
        kpm = jnp.zeros((B, S), bool)

        def attn_pair(name, core):
            def scalar(q):
                return jnp.sum(core(q).astype(jnp.float32))

            @jax.jit
            def floop(seed, q):
                def body(i, acc):
                    return acc + scalar(perturb(q, i, seed))
                return lax.fori_loop(0, K, body, jnp.float32(0))

            add(f"{name} fwd (1 layer)", timeit_loop(floop, q0))

            @jax.jit
            def bloop(seed, q):
                def body(i, acc):
                    g = jax.grad(scalar)(perturb(q, i, seed))
                    return acc + jnp.sum(g.astype(jnp.float32))
                return lax.fori_loop(0, K, body, jnp.float32(0))

            add(f"{name} fwd+bwd", timeit_loop(bloop, q0))

        attn_pair("pallas attn", lambda q: pallas_masked_attention(q, q, q, kpm))
        attn_pair(
            "xla attn",
            lambda q: scaled_dot_product_attention(
                q, q, q, key_padding_mask=kpm, deterministic=True
            ),
        )

        # ---- matcher + criterion ----
        out0 = jax.jit(lambda p, b: model.apply(
            {"params": p, "frozen": frozen},
            b["image"], b["height"], b["width"], True,
        ))(params, batch)

        @jax.jit
        def crit_loop(seed, o, b):
            tgt = _targets_of_batch(b)

            def body(i, acc):
                oo = dict(o)
                oo["pred_logits"] = perturb(o["pred_logits"], i, seed)
                return acc + total_loss(criterion(oo, tgt))
            return lax.fori_loop(0, K, body, jnp.float32(0))

        add("matcher + criterion", timeit_loop(crit_loop, out0, batch))

        # ---- optimizer ----
        ones_grads = jax.tree.map(jnp.ones_like, params)

        @jax.jit
        def opt_loop(seed, s, g):
            def body(i, s):
                gg = jax.tree.map(
                    lambda x: x * (1.0 + 1e-6 * (i + seed)), g
                )
                return s.apply_gradients(gg)
            s = lax.fori_loop(0, K, body, s)
            return jnp.sum(
                jax.tree_util.tree_leaves(s.params)[0].astype(jnp.float32)
            )

        add("optimizer update (adamw+clip)", timeit_loop(opt_loop, state, ones_grads))

    print("\n| component | ms | % of step |")
    print("|---|---|---|")
    for name, secs in rows:
        print(f"| {name} | {secs * 1e3:.2f} | {100 * secs / step_total:.0f}% |")
    print(f"\nimg/s at full step: {args.batch / step_total:.1f}")


if __name__ == "__main__":
    main()
