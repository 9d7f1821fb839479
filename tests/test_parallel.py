"""Sharding layer on the 8-virtual-device CPU mesh: TP/DP correctness.

The multi-device equivalence oracle: sharded execution must produce the
same numbers as single-device execution (GSPMD inserts the collectives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from quanta_tpu import nn as qnn, optim as qoptim, train
from quanta_tpu.models import llama
from quanta_tpu.parallel import (
    cache_specs,
    check_divisibility,
    llama_param_specs,
    make_mesh,
    shard_params,
)

CFG = llama.LlamaConfig(
    vocab_size=512, dim=256, n_layers=2, n_heads=8, n_kv_heads=4,
    hidden_dim=512, max_seq_len=64, dtype=jnp.float32,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, model=4)


@pytest.fixture(scope="module")
def setup():
    params = llama.init_params(jax.random.PRNGKey(0), CFG)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, CFG.vocab_size)
    return params, toks


def test_mesh_shape(mesh):
    assert mesh.shape == {"data": 2, "model": 4}


def test_check_divisibility():
    check_divisibility(CFG, tp=4)
    with pytest.raises(ValueError):
        check_divisibility(llama.LlamaConfig.tiny(), tp=64)


def test_dense_tp_equivalence(mesh, setup):
    params, toks = setup
    ref, _ = llama.forward(params, toks, CFG)
    sharded = shard_params(params, mesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_quantized_tp_equivalence(mesh, setup):
    """NF4 weights sharded (codes + block scales together) match unsharded."""
    params, toks = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    ref, _ = llama.forward(qparams, toks, CFG)
    sharded = shard_params(qparams, mesh, cfg=CFG)
    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sharded_cache_decode(mesh, setup):
    params, toks = setup
    sharded = shard_params(params, mesh, cfg=CFG)
    cache = llama.init_cache(CFG, 4, max_len=32)
    cache = jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        cache,
        cache_specs(CFG),
    )
    fwd = jax.jit(lambda p, t, c: llama.forward(p, t, CFG, cache=c))
    ref_full, _ = llama.forward(params, toks, CFG)
    lg, cache = fwd(sharded, toks[:, :8], cache)
    np.testing.assert_allclose(
        np.asarray(lg), np.asarray(ref_full[:, :8]), rtol=1e-4, atol=1e-4
    )
    lg1, cache = fwd(sharded, toks[:, 8:9], cache)
    np.testing.assert_allclose(
        np.asarray(lg1[:, 0]), np.asarray(ref_full[:, 8]), rtol=1e-3, atol=1e-4
    )


def test_qlora_train_step_sharded(mesh, setup):
    params, _ = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    qparams = train.add_lora(qparams, jax.random.PRNGKey(2), rank=4, dtype=jnp.float32)
    sharded = shard_params(qparams, mesh, cfg=CFG)

    adapters = train.extract_adapters(sharded)
    tx = qoptim.adam8bit(1e-3)
    opt_state = tx.init(adapters)
    batch = {
        "inputs": jax.device_put(
            jnp.zeros((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
        "targets": jax.device_put(
            jnp.ones((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
    }
    step = jax.jit(train.make_qlora_train_step(CFG, tx))
    a1, o1, loss1 = step(adapters, opt_state, sharded, batch)
    a2, _, loss2 = step(a1, o1, sharded, batch)
    assert jnp.isfinite(loss1) and jnp.isfinite(loss2)
    assert float(loss2) < float(loss1)  # one step of learning on a fixed batch


def test_specs_cover_all_params(setup):
    params, _ = setup
    specs = llama_param_specs(CFG, params)
    # same tree structure up to weight leaves
    jax.tree_util.tree_map(
        lambda s, p: None, specs, params,
        is_leaf=lambda x: isinstance(x, P),
    )


def test_fsdp_weight_sharding(mesh, setup):
    """FSDP specs: forward matches unsharded; per-device shard is 1/N."""
    from quanta_tpu.parallel import check_fsdp_divisibility, fsdp_param_specs

    params, toks = setup
    check_fsdp_divisibility(CFG, data=2, tp=4)
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    ref, _ = llama.forward(qparams, toks, CFG)
    specs = fsdp_param_specs(CFG, qparams)
    sharded = shard_params(qparams, mesh, specs=specs)

    # every device holds 1/8 of each quantized weight (codes AND scales)
    wq = sharded["layers"][0]["wq"]
    for arr in (wq.codes, wq.scale):
        shard_elems = arr.addressable_shards[0].data.size
        assert shard_elems * 8 == arr.size

    toks_s = jax.device_put(toks, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(lambda p, t: llama.forward(p, t, CFG))(sharded, toks_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_fsdp_pure_data_axis(setup):
    """tp=False variant shards on 'data' only (pure ZeRO-3)."""
    from quanta_tpu.parallel import fsdp_param_specs

    params, _ = setup
    mesh8 = make_mesh(data=8, model=1)
    specs = fsdp_param_specs(CFG, params, tp=False)
    sharded = shard_params(params, mesh8, specs=specs)
    wq = sharded["layers"][0]["wq"]
    assert wq.addressable_shards[0].data.shape[0] * 8 == wq.shape[0]


def test_fsdp_qlora_train_step(mesh, setup):
    """QLoRA train step over FSDP-sharded frozen base converges."""
    from quanta_tpu.parallel import fsdp_param_specs

    params, _ = setup
    qparams = qnn.quantize_params(params, mode="nf4", block_size=64, min_size=1024)
    qparams = train.add_lora(qparams, jax.random.PRNGKey(2), rank=4, dtype=jnp.float32)
    sharded = shard_params(qparams, mesh, specs=fsdp_param_specs(CFG, qparams))

    adapters = train.extract_adapters(sharded)
    tx = qoptim.adam8bit(1e-3)
    opt_state = tx.init(adapters)
    batch = {
        "inputs": jax.device_put(
            jnp.zeros((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
        "targets": jax.device_put(
            jnp.ones((4, 16), jnp.int32), NamedSharding(mesh, P("data", None))
        ),
    }
    step = jax.jit(train.make_qlora_train_step(CFG, tx))
    a1, o1, loss1 = step(adapters, opt_state, sharded, batch)
    _, _, loss2 = step(a1, o1, sharded, batch)
    assert jnp.isfinite(loss1) and float(loss2) < float(loss1)
