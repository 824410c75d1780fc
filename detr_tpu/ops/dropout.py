"""Counter-hash dropout: threefry-free mask generation.

``nn.Dropout`` draws its keep-mask with ``jax.random.bernoulli`` — a
threefry-2x32 evaluation per element.  At DETR's training shapes (the FFN
alone holds (B, 625, 2048) activations, x6 encoder layers, plus residual
dropouts) the PRNG accounted for a measured ~7.5 ms of a 57.7 ms train step
(13%) on v5e.  This op instead spends ONE threefry call deriving a 32-bit
seed from the flax RNG stream and generates the mask with a murmur3-
finalizer hash over element indices — pure VPU elementwise work, fused by
XLA into the surrounding computation.

The hash is the same construction the Pallas attention kernel uses for its
in-kernel dropout (detr_tpu/ops/pallas_attention.py::_dropout_keep) — not
cryptographic, but a well-mixed high-period bijection, which is all dropout
needs (statistical keep-rate and independence tests in
tests/test_pallas_kernels.py / tests/test_model.py).

Reference semantics preserved (torch.nn.Dropout, used at reference
detr/model.py:344-354,409-423): keep with probability 1-rate, scale kept
activations by 1/(1-rate); distinct call sites draw distinct flax RNGs so
masks are independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _murmur_mix(h: Array) -> Array:
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    return h ^ (h >> 16)


def hash_dropout(x: Array, rate: float, rng: Array | None, deterministic: bool) -> Array:
    """Dropout with a hash-derived keep mask.

    Args:
      x: input activations (any shape).
      rate: drop probability in [0, 1).
      rng: flax RNG key (one ``make_rng`` call per site); unused when
        ``deterministic`` or ``rate == 0``.
      deterministic: inference mode — identity.
    """
    if deterministic or rate == 0.0:
        return x
    assert rng is not None, "hash_dropout needs an RNG in train mode"
    # One tiny threefry draw for the whole tensor.
    seed = jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32).astype(
        jnp.uint32
    )
    idx = jax.lax.iota(jnp.uint32, x.size).reshape(x.shape)
    h = _murmur_mix(seed * jnp.uint32(0x9E3779B9) + idx * jnp.uint32(0x27D4EB2F))
    thresh = jnp.uint32(int(rate * 4294967296.0) & 0xFFFFFFFF)
    keep = h >= thresh
    return jnp.where(keep, x * (1.0 / (1.0 - rate)), jnp.zeros((), x.dtype))
