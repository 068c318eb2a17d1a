import jax
import jax.numpy as jnp
import numpy as np

from points2surf_tpu.ops.pallas.encoder_tail import fold_batchnorm, mlp_maxpool


def test_mlp_maxpool_matches_xla(rng):
    b, n, cin, cout = 16, 256, 128, 512
    x = jnp.asarray(rng.randn(b, n, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.randn(cout).astype(np.float32))
    got = mlp_maxpool(x, w, c, tb=8, tc=256, n_chunk=128, interpret=True)
    want = jnp.max(jnp.einsum("bnc,cd->bnd", x, w), axis=1) + c[None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_mlp_maxpool_fallback_odd_shapes(rng):
    b, n, cin, cout = 6, 100, 128, 512  # b % tb != 0 -> XLA fallback
    x = jnp.asarray(rng.randn(b, n, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1)
    c = jnp.asarray(rng.randn(cout).astype(np.float32))
    got = mlp_maxpool(x, w, c)
    want = jnp.max(jnp.einsum("bnc,cd->bnd", x, w), axis=1) + c[None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fold_batchnorm(rng):
    cin, cout = 32, 64
    w = jnp.asarray(rng.randn(cin, cout).astype(np.float32))
    scale = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(cout).astype(np.float32))
    mean = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)
    var = jnp.asarray(rng.rand(cout).astype(np.float32) + 0.1)
    x = jnp.asarray(rng.randn(10, cin).astype(np.float32))

    wf, c = fold_batchnorm(w, scale, bias, mean, var)
    got = x @ wf + c[None, :]
    y = x @ w
    want = (y - mean) / jnp.sqrt(var + 1e-5) * scale + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
