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


def test_chain3_maxpool_matches_xla(rng):
    from points2surf_tpu.ops.pallas.chain_kernel import chain3_maxpool

    b, n = 16, 256
    x = jnp.asarray(rng.randn(b, n, 64).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.randn(64, 64).astype(np.float32) * 0.2)
    c1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.2)
    c2 = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(128, 512).astype(np.float32) * 0.2)
    c3 = jnp.asarray(rng.randn(512).astype(np.float32) * 0.1)

    for relu_last in (False, True):
        got = chain3_maxpool(x, w1, c1, w2, c2, w3, c3,
                             relu_last=relu_last, interpret=True)
        h = jnp.maximum(jnp.einsum("bnc,cd->bnd", x, w1) + c1, 0.0)
        h = jnp.maximum(jnp.einsum("bnc,cd->bnd", h, w2) + c2, 0.0)
        y = jnp.einsum("bnc,cd->bnd", h, w3) + c3
        if relu_last:
            y = jnp.maximum(y, 0.0)
        want = jnp.max(y, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)


def test_chain3_fallback_odd_shapes(rng):
    from points2surf_tpu.ops.pallas.chain_kernel import chain3_maxpool

    b, n = 6, 100  # not tileable -> XLA fallback
    x = jnp.asarray(rng.randn(b, n, 3).astype(np.float32))
    w1 = jnp.asarray(rng.randn(3, 64).astype(np.float32) * 0.3)
    c1 = jnp.zeros(64)
    w2 = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 0.2)
    c2 = jnp.zeros(128)
    w3 = jnp.asarray(rng.randn(128, 256).astype(np.float32) * 0.2)
    c3 = jnp.zeros(256)
    got = chain3_maxpool(x, w1, c1, w2, c2, w3, c3)
    assert got.shape == (6, 256)
    assert np.isfinite(np.asarray(got)).all()


def test_train_tail_reductions_interpret(rng):
    """One-pass train-tail kernel vs the dense oracle: max/argmax,
    min/argmin, row sums, row sums-of-squares — including ragged point
    counts that need block-padding masks."""
    from points2surf_tpu.ops.pallas.train_tail import pooled_tail_reductions

    for b, n, cin, c in [(16, 300, 128, 256), (8, 130, 128, 128)]:
        x = rng.randn(b, n, cin).astype(np.float32)
        w = (rng.randn(cin, c) * 0.1).astype(np.float32)
        bias = rng.randn(c).astype(np.float32)
        cmax, amax, cmin, amin, rsum, rsq = (
            np.asarray(o) for o in pooled_tail_reductions(
                jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
                interpret=True, bf16_operands=False,
            )
        )
        dense = (x.reshape(b * n, cin) @ w + bias).reshape(b, n, c)
        np.testing.assert_allclose(cmax, dense.max(1), atol=2e-4)
        np.testing.assert_allclose(cmin, dense.min(1), atol=2e-4)
        np.testing.assert_allclose(rsum, dense.sum(1), rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(rsq, (dense * dense).sum(1),
                                   rtol=2e-4, atol=2e-2)
        # the VJP contract: the value AT the arg index equals the pooled
        # value (ties may pick a different valid index; values must match)
        bb = np.arange(b)[:, None]
        cc = np.arange(c)[None, :]
        np.testing.assert_allclose(dense[bb, amax, cc], cmax, atol=2e-4)
        np.testing.assert_allclose(dense[bb, amin, cc], cmin, atol=2e-4)


def test_train_tail_default_precision_oracle(rng):
    """The production default rounds matmul OPERANDS to bf16 with f32
    accumulation (XLA's default precision class — what the literal layer
    stack uses on TPU). Check against an operand-rounded dense oracle."""
    from points2surf_tpu.ops.pallas.train_tail import pooled_tail_reductions

    b, n, cin, c = 8, 130, 128, 128
    x = rng.randn(b, n, cin).astype(np.float32)
    w = (rng.randn(cin, c) * 0.1).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    cmax, amax, cmin, amin, rsum, rsq = (
        np.asarray(o) for o in pooled_tail_reductions(
            jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
            interpret=True, bf16_operands=True,
        )
    )
    xr = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)).astype(np.float32)
    wr = np.asarray(jnp.asarray(w).astype(jnp.bfloat16)).astype(np.float32)
    dense = (xr.reshape(b * n, cin) @ wr + bias).reshape(b, n, c)
    np.testing.assert_allclose(cmax, dense.max(1), atol=1e-5)
    np.testing.assert_allclose(cmin, dense.min(1), atol=1e-5)
    np.testing.assert_allclose(rsum, dense.sum(1), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(rsq, (dense * dense).sum(1),
                               rtol=1e-5, atol=1e-2)


def test_train_tail_fwd_glue_matches_xla(rng, monkeypatch):
    """The _lpr_fwd Pallas branch (interpret mode) must match the XLA
    branch end-to-end through a train-mode _pooled_tail: pooled values,
    BN statistics, AND gradients — for both sym ops. The suite runs on
    the virtual 8-device mesh, so this exercises the SHARDED
    custom_partitioning wrapper; a counter asserts the kernel branch
    actually ran (the gate is env-driven and read at trace time)."""
    import jax

    from points2surf_tpu.models import pointnet
    from points2surf_tpu.ops.pallas import train_tail

    x = jnp.asarray(rng.randn(8, 70, 128).astype(np.float32))
    w = jnp.asarray((rng.randn(128, 128) * 0.1).astype(np.float32))
    bias = jnp.asarray(rng.randn(128).astype(np.float32))

    calls = {"n": 0}
    orig = train_tail.pooled_tail_reductions

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(train_tail, "pooled_tail_reductions", counting)

    def run(sym):
        def f(xx, ww, bb):
            cmax, cmin, csum, mean, var = pointnet._linear_pool_reductions(
                xx, ww, bb, None, sym == "max", True
            )
            pooled = cmax + cmin if sym == "max" else csum
            return (
                jnp.sum(pooled * pooled) + jnp.sum(mean) + jnp.sum(var)
            )
        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(x, w, bias)
        return val, grads

    for sym in ("max", "sum"):
        monkeypatch.delenv("P2S_PALLAS_TAIL_INTERPRET", raising=False)
        monkeypatch.delenv("P2S_PALLAS_TAIL_SHARDED", raising=False)
        v_xla, g_xla = run(sym)
        assert calls["n"] == 0  # gate off: XLA branch
        monkeypatch.setenv("P2S_PALLAS_TAIL_INTERPRET", "1")
        monkeypatch.setenv("P2S_PALLAS_TAIL_SHARDED", "1")
        # CPU XLA does NOT round operands to bf16, so compare against the
        # kernel's exact-f32 mode (the default bf16-operand mode has its
        # own oracle test above)
        monkeypatch.setenv("P2S_PALLAS_TAIL_PREC", "highest")
        jax.clear_caches()  # the env gate is read at trace time
        v_k, g_k = run(sym)
        assert calls["n"] > 0, "kernel branch did not run"
        calls["n"] = 0
        monkeypatch.delenv("P2S_PALLAS_TAIL_INTERPRET", raising=False)
        monkeypatch.delenv("P2S_PALLAS_TAIL_SHARDED", raising=False)
        monkeypatch.delenv("P2S_PALLAS_TAIL_PREC", raising=False)
        jax.clear_caches()
        np.testing.assert_allclose(float(v_k), float(v_xla), rtol=1e-4)
        for a, b in zip(g_k, g_xla):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3
            )


def test_train_tail_sharded_explicit_mesh(rng, monkeypatch):
    """Kernel under an explicit 8-device data-parallel mesh: x sharded on
    batch, outputs batch-sharded, values match the dense oracle."""
    import jax

    monkeypatch.setenv("P2S_PALLAS_TAIL_PREC", "highest")
    jax.clear_caches()
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from points2surf_tpu.ops.pallas.train_tail import (
        pooled_tail_reductions_sharded,
    )

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    b, n, cin, c = 16, 70, 128, 128
    x = rng.randn(b, n, cin).astype(np.float32)
    w = (rng.randn(cin, c) * 0.1).astype(np.float32)
    bias = rng.randn(c).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    ws = jax.device_put(jnp.asarray(w), NamedSharding(mesh, P()))
    bs = jax.device_put(jnp.asarray(bias), NamedSharding(mesh, P()))

    out = jax.jit(
        lambda a, b_, c_: pooled_tail_reductions_sharded(
            a, b_, c_, interpret=True
        )
    )(xs, ws, bs)
    cmax, amax, cmin, amin, rsum, rsq = (np.asarray(o) for o in out)
    dense = (x.reshape(b * n, cin) @ w + bias).reshape(b, n, c)
    np.testing.assert_allclose(cmax, dense.max(1), atol=2e-4)
    np.testing.assert_allclose(cmin, dense.min(1), atol=2e-4)
    np.testing.assert_allclose(rsum, dense.sum(1), rtol=2e-4, atol=2e-3)
    # outputs stay batch-sharded (no gather onto one device)
    spec = out[0].sharding.spec
    assert len(spec) == 0 or spec[0] in ("data", None)


def test_chain_pool_interpret(rng):
    """Fused eval-chain kernel vs the literal oracle: ragged point axis,
    sub-sublane input channels (3 -> zero-pad 8), BN affines, both pools."""
    from points2surf_tpu.ops.pallas.chain_kernel import (
        _chain_literal,
        chain_pool,
    )

    for b, n, cin in [(16, 300, 3), (8, 130, 64)]:
        x = jnp.asarray((rng.randn(b, n, cin) * 0.5).astype(np.float32))
        layers, ci = [], cin
        for co in (64, 128, 256):
            layers.append((
                jnp.asarray((rng.randn(ci, co) * 0.2).astype(np.float32)),
                jnp.asarray((rng.rand(co) + 0.5).astype(np.float32)),
                jnp.asarray((rng.randn(co) * 0.1).astype(np.float32)),
            ))
            ci = co
        layers = tuple(layers)
        for sym in ("max", "sum"):
            got = chain_pool(x, layers, sym_op=sym, interpret=True,
                             bf16_operands=False)
            want = _chain_literal(x, layers, sym, False)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3
            )
        # bf16-operand mode (the TPU production default): same numerics
        # class as XLA default-precision dots — loose tolerance
        got = chain_pool(x, layers, sym_op="max", interpret=True,
                         bf16_operands=True)
        want = _chain_literal(x, layers, "max", False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2
        )


def test_chain_pool_sharded_explicit_mesh(rng):
    """Eval-chain kernel under an explicit 8-device data-parallel mesh:
    x sharded on batch, output batch-sharded, matches the oracle, and the
    partition rule actually lowered per-shard."""
    import jax
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from points2surf_tpu.ops.pallas import chain_kernel as ck

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    b, n = 16, 70
    x = (rng.randn(b, n, 64) * 0.5).astype(np.float32)
    layers, ci = [], 64
    for co in (64, 128, 256):
        layers.append((
            jnp.asarray((rng.randn(ci, co) * 0.2).astype(np.float32)),
            jnp.asarray((rng.rand(co) + 0.5).astype(np.float32)),
            jnp.asarray((rng.randn(co) * 0.1).astype(np.float32)),
        ))
        ci = co
    layers = tuple(layers)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("data")))
    ck.PARTITION_AXES_SEEN.clear()
    got = jax.jit(
        lambda a: ck.chain_pool_sharded(a, layers, sym_op="max",
                                        interpret=True)
    )(xs)
    # interpret-mode kernel on CPU runs exact f32 only when PREC=highest;
    # default bf16-operand rounding needs the loose tolerance
    want = ck._chain_literal(jnp.asarray(x), layers, "max", False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=3e-2)
    assert ck.PARTITION_AXES_SEEN, "partition rule never lowered"
    spec = got.sharding.spec
    assert len(spec) == 0 or spec[0] in ("data", None)


def test_eval_chain_model_equivalence(rng, monkeypatch):
    """P2S_EVAL_CHAIN=1 (interpret, exact f32) must reproduce the literal
    eval forward of the full dual-branch model — covering the BN folds,
    relu/pool commutes, the qstn cin=3 pad, and both encoder tails."""
    import jax

    from points2surf_tpu.models.p2s import PointsToSurfModel

    b = 16
    batch = {
        "patch_pts_ps": jnp.asarray(
            (rng.randn(b, 30, 3) * 0.3).astype(np.float32)),
        "pts_sub_sample_ms": jnp.asarray(
            (rng.randn(b, 50, 3) * 0.3).astype(np.float32)),
        "imp_surf_query_point_ms": jnp.asarray(
            (rng.randn(b, 3) * 0.1).astype(np.float32)),
    }
    m = PointsToSurfModel(net_size_max=256, output_dim=2,
                          use_point_stn=True, use_feat_stn=True,
                          shared_transformation=True)
    v = m.init(jax.random.key(0), batch, True)
    _, mut = m.apply(v, batch, True, mutable=["batch_stats"])
    v = {"params": v["params"], "batch_stats": mut["batch_stats"]}

    monkeypatch.delenv("P2S_EVAL_CHAIN", raising=False)
    want = m.apply(v, batch, False)
    monkeypatch.setenv("P2S_EVAL_CHAIN", "1")
    monkeypatch.setenv("P2S_EVAL_CHAIN_INTERPRET", "1")
    monkeypatch.setenv("P2S_EVAL_CHAIN_PREC", "highest")
    jax.clear_caches()  # env gates are read at trace time
    got = m.apply(v, batch, False)
    monkeypatch.delenv("P2S_EVAL_CHAIN", raising=False)
    monkeypatch.delenv("P2S_EVAL_CHAIN_INTERPRET", raising=False)
    monkeypatch.delenv("P2S_EVAL_CHAIN_PREC", raising=False)
    jax.clear_caches()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_chain_pool_inner_n_resident(rng):
    """The n-resident layout (``inner`` sub-chunking, single n-grid step)
    must agree with the literal oracle across ragged lengths and pools,
    including sub-chunks that are entirely padding."""
    from points2surf_tpu.ops.pallas.chain_kernel import (
        _chain_literal,
        chain_pool,
    )

    for b, n, cin in [(16, 300, 3), (8, 130, 64), (8, 1000, 64)]:
        x = jnp.asarray((rng.randn(b, n, cin) * 0.5).astype(np.float32))
        layers, ci = [], cin
        for co in (64, 128, 256):
            layers.append((
                jnp.asarray((rng.randn(ci, co) * 0.2).astype(np.float32)),
                jnp.asarray((rng.rand(co) + 0.5).astype(np.float32)),
                jnp.asarray((rng.randn(co) * 0.1).astype(np.float32)),
            ))
            ci = co
        layers = tuple(layers)
        for sym in ("max", "sum"):
            want = _chain_literal(x, layers, sym, False)
            for inner in (64, 128, 256):
                got = chain_pool(x, layers, sym_op=sym, inner=inner,
                                 interpret=True, bf16_operands=False)
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-3
                )
