"""8-bit blockwise Adam: convergence, parity with fp32 Adam, memory."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from quanta_tpu import optim as qoptim


def _quad_problem(n=1000, seed=0):
    target = jax.random.normal(jax.random.PRNGKey(seed), (n,))

    def loss(p):
        return jnp.sum((p["w"] - target) ** 2)

    params = {"w": jnp.zeros((n,))}
    return loss, params, target


def _run(tx, loss, params, steps=200):
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        g = jax.grad(loss)(params)
        upd, state = tx.update(g, state, params)
        return optax.apply_updates(params, upd), state

    for _ in range(steps):
        params, state = step(params, state)
    return params, state


def test_adam8bit_converges():
    loss, params, target = _quad_problem()
    tx = qoptim.adam8bit(learning_rate=0.05)
    params, _ = _run(tx, loss, params, steps=300)
    err = float(jnp.abs(params["w"] - target).mean())
    assert err < 0.05, err


def test_adam8bit_tracks_fp32_adam():
    loss, params, _ = _quad_problem(n=512, seed=1)
    p8, _ = _run(qoptim.adam8bit(1e-2), loss, dict(params), steps=100)
    p32, _ = _run(optax.adam(1e-2), loss, dict(params), steps=100)
    # trajectories diverge slightly from state quantization but stay close
    diff = float(jnp.abs(p8["w"] - p32["w"]).max())
    assert diff < 0.15, diff


def test_state_is_8bit():
    loss, params, _ = _quad_problem(n=4096)
    tx = qoptim.adam8bit(1e-3)
    state = tx.init(params)
    q = state.qstate["w"]
    assert q.m_codes.dtype == jnp.int8
    assert q.v_codes.dtype == jnp.uint8
    # ~2 bytes/param for codes + ~2*4/256 for scales
    bytes_per_param = qoptim.state_nbytes(state) / 4096
    assert bytes_per_param < 2.2, bytes_per_param


def test_adamw_decay():
    params = {"w": jnp.ones((256,))}
    tx = qoptim.adamw8bit(learning_rate=0.1, weight_decay=0.5)
    state = tx.init(params)
    g = {"w": jnp.zeros((256,))}
    upd, state = tx.update(g, state, params)
    # zero gradient: update is pure decay, -lr*wd*w
    np.testing.assert_allclose(np.asarray(upd["w"]), -0.05, rtol=1e-5)


def test_masked_for_lora():
    params = {"base": jnp.ones((64,)), "lora_a": jnp.ones((64,))}
    mask = {"base": False, "lora_a": True}
    tx = qoptim.adam8bit(0.1, mask=mask)
    state = tx.init(params)
    g = {"base": jnp.ones((64,)), "lora_a": jnp.ones((64,))}
    upd, _ = tx.update(g, state, params)
    assert float(jnp.abs(upd["base"]).max()) == 0.0
    assert float(jnp.abs(upd["lora_a"]).max()) > 0.0


def test_profiling_roofline_math():
    """Roofline accounting: bytes/flops bookkeeping and bound selection."""
    from quanta_tpu.profiling import _DEVICE_TABLE, matmul_roofline, device_spec

    v5e = _DEVICE_TABLE["v5e"]
    # decode shape, 4-bit weight: memory-bound (t_hbm > t_mxu)
    r4 = matmul_roofline(8, 2048, 2048, weight_bits=4, block_size=64,
                         device=v5e)
    assert r4.flops == 2 * 8 * 2048 * 2048
    expect_bytes = (8 * 2048 * 2 + 2048 * 2048 // 2
                    + (2048 // 64) * 2048 * 4 + 8 * 2048 * 2)
    assert r4.bytes == expect_bytes
    assert r4.t_roofline_s == r4.t_hbm_s > r4.t_mxu_s
    # same shape bf16 moves ~3.4x the bytes
    r16 = matmul_roofline(8, 2048, 2048, weight_bits=16, device=v5e)
    assert 3.0 < r16.bytes / r4.bytes < 4.0
    # huge-M prefill: compute-bound
    rc = matmul_roofline(4096, 4096, 4096, weight_bits=16, device=v5e)
    assert rc.t_roofline_s == rc.t_mxu_s
    # pct is monotone: slower measurement -> lower pct
    assert r4.pct(r4.t_roofline_s) == 100.0
    assert r4.pct(2 * r4.t_roofline_s) == 50.0
    assert device_spec().hbm_gbps > 0


def test_profiling_measure_cpu():
    """measure() returns a sane positive per-op time on CPU."""
    from quanta_tpu.profiling import measure

    x = jnp.ones((256, 256), jnp.float32)
    w = jnp.ones((256, 256), jnp.float32)
    t = measure(lambda a: a @ w, x, L0=4, L1=36, reps=2)
    assert 0 < t < 1.0


def test_adam8bit_kernel_parity():
    """Fused Pallas update (interpret) matches the XLA path bit-for-bit-ish."""
    from quanta_tpu import optim as qoptim

    params = {"w": jax.random.normal(jax.random.PRNGKey(0), (700,)),
              "b": jax.random.normal(jax.random.PRNGKey(1), (64, 40))}
    tx_x = qoptim.adam8bit(1e-2, use_kernel=False)
    tx_k = qoptim.adam8bit(1e-2, use_kernel=True, interpret=True)
    sx, sk = tx_x.init(params), tx_k.init(params)
    for i in range(4):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.PRNGKey(10 + i), p.shape),
            params)
        ux, sx = tx_x.update(g, sx, params)
        uk, sk = tx_k.update(g, sk, params)
        for a, b in zip(jax.tree_util.tree_leaves(ux),
                        jax.tree_util.tree_leaves(uk)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
        for a, b in zip(jax.tree_util.tree_leaves(sx.qstate),
                        jax.tree_util.tree_leaves(sk.qstate)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-6)


def test_adam8bit_kernel_converges():
    """Quadratic bowl converges through the fused kernel path."""
    from quanta_tpu import optim as qoptim

    target = jnp.linspace(-2, 2, 512)
    w = jnp.zeros((512,))
    tx = qoptim.adam8bit(5e-2, use_kernel=True, interpret=True)
    state = tx.init(w)

    @jax.jit
    def step(w, state):
        g = jax.grad(lambda w: jnp.mean((w - target) ** 2))(w)
        upd, state = tx.update(g, state, w)
        return w + upd, state

    for _ in range(200):
        w, state = step(w, state)
    assert float(jnp.mean((w - target) ** 2)) < 1e-2
