"""hash_dropout: statistical + gradient properties (detr_tpu/ops/dropout.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from detr_tpu.ops.dropout import hash_dropout


def test_deterministic_is_identity():
    x = jnp.ones((4, 5))
    out = hash_dropout(x, 0.5, None, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.ones((4, 5)))
    out = hash_dropout(x, 0.0, None, deterministic=False)
    np.testing.assert_array_equal(np.asarray(out), np.ones((4, 5)))


def test_keep_rate_and_scaling():
    rate = 0.1
    x = jnp.ones((512, 2048))
    out = np.asarray(hash_dropout(x, rate, jax.random.PRNGKey(3), False))
    kept = out > 0
    # Binomial(n=1M, p=0.9): observed keep rate within 5 sigma.
    n = x.size
    sigma = (rate * (1 - rate) / n) ** 0.5
    assert abs(kept.mean() - (1 - rate)) < 5 * sigma
    np.testing.assert_allclose(out[kept], 1.0 / (1 - rate), rtol=1e-6)
    # Expectation preserved.
    assert abs(out.mean() - 1.0) < 0.01


def test_same_rng_same_mask_different_rng_different_mask():
    x = jnp.ones((64, 64))
    a = np.asarray(hash_dropout(x, 0.5, jax.random.PRNGKey(0), False))
    b = np.asarray(hash_dropout(x, 0.5, jax.random.PRNGKey(0), False))
    c = np.asarray(hash_dropout(x, 0.5, jax.random.PRNGKey(1), False))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_mask_rows_are_independent():
    """Adjacent rows/cols must not share mask structure (index hashing)."""
    x = jnp.ones((256, 256))
    m = np.asarray(hash_dropout(x, 0.5, jax.random.PRNGKey(5), False)) > 0
    row_corr = np.mean(m[:-1] == m[1:])
    col_corr = np.mean(m[:, :-1] == m[:, 1:])
    assert 0.45 < row_corr < 0.55
    assert 0.45 < col_corr < 0.55


def test_gradient_is_scaled_mask():
    x = jnp.arange(12.0).reshape(3, 4) + 1.0
    rng = jax.random.PRNGKey(7)
    f = lambda x: jnp.sum(hash_dropout(x, 0.25, rng, False))  # noqa: E731
    g = np.asarray(jax.grad(f)(x))
    out = np.asarray(hash_dropout(x, 0.25, rng, False))
    mask = out != 0
    np.testing.assert_allclose(g, np.where(mask, 1 / 0.75, 0.0), rtol=1e-6)


def test_works_under_jit_and_bf16():
    x = jnp.ones((32, 32), jnp.bfloat16)

    @jax.jit
    def run(x, rng):
        return hash_dropout(x, 0.5, rng, False)

    out = np.asarray(run(x, jax.random.PRNGKey(0)).astype(jnp.float32))
    assert out.dtype == np.float32 and ((out == 0) | (out == 2)).all()
