"""State registry, config precedence, serialization, precision conversion.

Test strategy per SURVEY.md §4: round-trip properties (dtype/range/allclose
per bit-width) + the reference's state/serialization behavior contract
(functional/state.py, utils/utils.py) — with defect 3 (per-channel scale
truncation in the .qtn loader) fixed, which we assert on directly.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quanta_tpu import state as qstate
from quanta_tpu import utils as qutils
from quanta_tpu.core import QuantizedTensor, dequantize, quantize


@pytest.fixture
def x():
    return jax.random.normal(jax.random.PRNGKey(0), (32, 48), jnp.float32)


# ------------------------------------------------------------ config tiers


def test_config_three_tier_precedence():
    tree = qstate.ConfigTree(qstate.QuantConfig(bits=8, scheme="symmetric"))
    tree.config_layer(r"attn", bits=4, scheme="codebook", codebook="nf4")
    tree.config_tensor("layers/0/attn/wq", block_size=128)

    assert tree.resolve("layers/3/mlp/up").bits == 8  # global
    c = tree.resolve("layers/3/attn/wk")  # layer rule
    assert (c.bits, c.codebook) == (4, "nf4")
    c = tree.resolve("layers/0/attn/wq")  # tensor override on top
    assert (c.bits, c.block_size) == (4, 128)


def test_config_json_round_trip():
    tree = qstate.ConfigTree().config_layer(r"mlp", bits=4, pack=True)
    tree2 = qstate.ConfigTree.from_json(tree.to_json())
    assert tree2.resolve("a/mlp/b").pack is True
    assert tree2.resolve("a/attn/b").bits == 8


def test_config_validation():
    with pytest.raises(ValueError):
        qstate.QuantConfig(bits=3)
    with pytest.raises(ValueError):
        qstate.QuantConfig(pack=True, bits=8)
    with pytest.raises(ValueError):
        qstate.ConfigTree().config_layer("x", nonsense=1)


# --------------------------------------------------------------- registry


def test_registry_quantize_dequantize_roundtrip(x):
    st = qstate.QuantizationState()
    st.config.config_layer(r"w4", bits=4, scheme="codebook", pack=True)
    st.quantize("w8", x)
    st.quantize("w4", x)

    assert st.get("w8").bits == 8 and st.get("w4").bits == 4
    assert st.get_tensor_params("w4")["packed"] == "nibbles"
    np.testing.assert_allclose(st.dequantize("w8"), x, atol=0.05)
    np.testing.assert_allclose(st.dequantize("w4"), x, atol=0.55)

    st.set_layer_params("layer0", calibrated=True, amax=3.5)
    assert st.get_layer_params("layer0")["amax"] == 3.5
    summary = json.loads(st.summary_json())
    assert summary["tensors"]["w8"]["bits"] == 8


def test_registry_json_snapshot_round_trip(tmp_path, x):
    st = qstate.QuantizationState()
    st.config.config_layer(r"w", bits=4, scheme="symmetric", pack=True)
    st.set_layer_params("l0", foo=1)
    p = str(tmp_path / "state.json")
    st.save_json(p)
    st2 = qstate.QuantizationState.load_json(p)
    assert st2.config.resolve("w").bits == 4
    assert st2.get_layer_params("l0") == {"foo": 1}


# ------------------------------------------------------------ .qtn / .npz


@pytest.mark.parametrize("ext", ["qtn", "npz"])
@pytest.mark.parametrize(
    "kw",
    [
        dict(bits=8, scheme="symmetric", block_size=64),
        dict(bits=8, scheme="affine", block_size=0),
        dict(bits=4, scheme="codebook", codebook="nf4", block_size=64, pack=True),
        dict(bits=4, scheme="symmetric", block_size=32),
    ],
)
def test_serialization_round_trip(tmp_path, x, ext, kw):
    qt = quantize(x, **kw)
    p = str(tmp_path / f"t.{ext}")
    qutils.save_quantized_tensor(qt, p)
    qt2 = qutils.load_quantized_tensor(p)
    assert isinstance(qt2, QuantizedTensor)
    assert (qt2.bits, qt2.scheme, qt2.shape) == (qt.bits, qt.scheme, qt.shape)
    np.testing.assert_array_equal(np.asarray(qt2.codes), np.asarray(qt.codes))
    np.testing.assert_array_equal(np.asarray(qt2.scale), np.asarray(qt.scale))
    np.testing.assert_allclose(dequantize(qt2), dequantize(qt))


def test_qtn_preserves_per_block_scales(tmp_path, x):
    # reference defect 3: loader assumed one scalar scale (utils.py:159-163)
    qt = quantize(x, bits=8, scheme="affine", block_size=64)
    assert qt.scale.shape[0] > 1
    p = str(tmp_path / "t.qtn")
    qutils.save_qtn(qt, p)
    qt2 = qutils.load_qtn(p)
    assert qt2.scale.shape == qt.scale.shape
    assert qt2.zero_point.shape == qt.zero_point.shape


def test_bad_extension_raises(tmp_path, x):
    with pytest.raises(ValueError):
        qutils.save_quantized_tensor(quantize(x), str(tmp_path / "t.bin"))


# ------------------------------------------------------- tree checkpoints


def test_checkpoint_tree_round_trip(tmp_path, x):
    tree = {
        "layers": {
            "0": {"wq": quantize(x, bits=4, scheme="codebook", pack=True),
                  "norm": jnp.ones((48,), jnp.float32)},
        },
        "embed": jnp.zeros((16, 48), jnp.bfloat16),
    }
    p = str(tmp_path / "ckpt.npz")
    qutils.save_checkpoint(tree, p)
    tree2 = qutils.load_checkpoint(p)
    assert isinstance(tree2["layers"]["0"]["wq"], QuantizedTensor)
    np.testing.assert_allclose(
        dequantize(tree2["layers"]["0"]["wq"]),
        dequantize(tree["layers"]["0"]["wq"]),
    )
    assert tree2["embed"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(tree2["layers"]["0"]["norm"], 1.0)


def test_checkpoint_digit_keyed_dict_stays_dict(tmp_path, x):
    # Regression: container kind is recorded in metadata, not guessed from
    # digit-shaped keys (round-1 _relist bug).
    tree = {"layers": {"0": {"w": jnp.ones((4,))}, "1": {"w": jnp.zeros((4,))}}}
    p = str(tmp_path / "ckpt.npz")
    qutils.save_checkpoint(tree, p)
    tree2 = qutils.load_checkpoint(p)
    assert isinstance(tree2["layers"], dict)
    np.testing.assert_array_equal(tree2["layers"]["0"]["w"], 1.0)
    np.testing.assert_array_equal(tree2["layers"]["1"]["w"], 0.0)


def test_checkpoint_list_tuple_and_empty_containers(tmp_path):
    tree = {
        "stack": [jnp.ones((2,)), jnp.zeros((2,))],
        "pair": (jnp.ones((1,)), {"inner": jnp.zeros((1,))}),
        "empty_d": {},
        "empty_l": [],
    }
    p = str(tmp_path / "ckpt.npz")
    qutils.save_checkpoint(tree, p)
    tree2 = qutils.load_checkpoint(p)
    assert isinstance(tree2["stack"], list) and len(tree2["stack"]) == 2
    assert isinstance(tree2["pair"], tuple)
    assert isinstance(tree2["pair"][1], dict)
    assert tree2["empty_d"] == {} and tree2["empty_l"] == []


def test_checkpoint_bare_leaf(tmp_path):
    p = str(tmp_path / "leaf.npz")
    qutils.save_checkpoint(jnp.arange(4.0), p)
    np.testing.assert_array_equal(qutils.load_checkpoint(p), jnp.arange(4.0))


def test_qtn_non_f32_scale_round_trip(tmp_path, x):
    # Regression: scale dtype is recorded in metadata (was hardcoded f32).
    qt = quantize(x, bits=8, scheme="symmetric", block_size=64)
    import dataclasses

    qt = dataclasses.replace(qt, scale=qt.scale.astype(jnp.bfloat16))
    p = str(tmp_path / "t.qtn")
    qutils.save_qtn(qt, p)
    qt2 = qutils.load_qtn(p)
    assert qt2.scale.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(qt2.scale, np.float32), np.asarray(qt.scale, np.float32)
    )


def test_config_later_rule_wins():
    # All matching layer rules merge in registration order; later wins.
    tree = qstate.ConfigTree()
    tree.config_layer(r"layers", bits=8, block_size=32)
    tree.config_layer(r"attn", bits=4, scheme="codebook", codebook="nf4")
    c = tree.resolve("layers/0/attn/wq")
    assert (c.bits, c.block_size, c.codebook) == (4, 32, "nf4")


# ---------------------------------------------------- precision conversion


def test_convert_precision_8_to_4_and_back(x):
    q8 = quantize(x, bits=8, scheme="symmetric", block_size=64)
    q4 = qutils.convert_8bit_to_4bit(q8, scheme="codebook", codebook="nf4")
    assert (q4.bits, q4.codebook) == (4, "nf4")
    np.testing.assert_allclose(dequantize(q4), x, atol=0.55)
    q8b = qutils.convert_4bit_to_8bit(q4)
    # codebook family is preserved across the bit change: nf4 -> nf8
    assert q8b.bits == 8 and q8b.codebook == "nf8"
    # 8-bit requant of a 4-bit tensor loses almost nothing further
    # (nf8 levels are not a superset of nf4 levels, so not exactly zero)
    np.testing.assert_allclose(dequantize(q8b), dequantize(q4), atol=0.05)


def test_convert_resets_codebook_on_bit_change(x):
    q4 = quantize(x, bits=4, scheme="codebook", codebook="nf4", block_size=64)
    q8 = qutils.convert_precision(q4, bits=8, scheme="symmetric")
    assert q8.codebook is None


def test_hardware_targets(x):
    qt = quantize(x, bits=8, scheme="symmetric", block_size=64)
    for target in qutils.HARDWARE_TARGETS:
        out = qutils.optimize_for_target_hardware(qt, target)
        cfg = qutils.HARDWARE_TARGETS[target]
        assert (out.bits, out.scheme) == (cfg.bits, cfg.scheme)
    with pytest.raises(ValueError):
        qutils.optimize_for_target_hardware(qt, "abacus")


def test_checkpoint_wrapper_weight_leaves(tmp_path, x):
    """Int8Weight / LoRAWeight / ActQuantWeight leaves round-trip through
    save_checkpoint (regression: they used to fall into np.asarray and get
    pickled as object arrays that load_checkpoint could never read)."""
    from quanta_tpu import calib
    from quanta_tpu.nn.lora import LoRAWeight
    from quanta_tpu.ops.int8mm import Int8Weight, quantize_int8_weight

    w = jnp.asarray(np.random.default_rng(0).normal(size=(64, 48)),
                    jnp.float32)
    i8 = quantize_int8_weight(w, outlier_capacity=4)
    lora = LoRAWeight(
        base=quantize(w, bits=4, scheme="codebook", pack=True),
        lora_a=jnp.ones((64, 2), jnp.bfloat16),
        lora_b=jnp.zeros((2, 48), jnp.bfloat16),
        alpha=8.0,
    )
    aq = calib.ActQuantWeight(
        w=i8, lo=jnp.float32(-1.5), hi=jnp.float32(2.5), bits=8
    )
    tree = {"wq": i8, "wk": lora, "wv": aq, "norm": jnp.ones((4,))}
    p = str(tmp_path / "ckpt.npz")
    qutils.save_checkpoint(tree, p)
    tree2 = qutils.load_checkpoint(p)

    got = tree2["wq"]
    assert isinstance(got, Int8Weight)
    np.testing.assert_array_equal(got.codes, i8.codes)
    np.testing.assert_array_equal(got.outlier_idx, i8.outlier_idx)
    assert got.w_outlier.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got.w_outlier, np.float32),
        np.asarray(i8.w_outlier, np.float32),
    )
    assert got.threshold == i8.threshold and got.shape == i8.shape

    got = tree2["wk"]
    assert isinstance(got, LoRAWeight) and got.alpha == 8.0
    assert isinstance(got.base, QuantizedTensor)
    np.testing.assert_allclose(dequantize(got.base), dequantize(lora.base))
    assert got.lora_a.dtype == jnp.bfloat16

    got = tree2["wv"]
    assert isinstance(got, calib.ActQuantWeight) and got.bits == 8
    assert float(got.lo) == -1.5 and float(got.hi) == 2.5
    assert isinstance(got.w, Int8Weight)


def test_checkpoint_unsupported_leaf_raises(tmp_path):
    class Weird:
        pass

    with pytest.raises(TypeError, match="unsupported type"):
        qutils.save_checkpoint({"w": Weird()}, str(tmp_path / "bad.npz"))


def test_transcode_codebook_nf4_to_nf4a():
    """Load-time transcode for imported QLoRA checkpoints: pure code
    remap, scales preserved, semantically identical to dequant->requant
    at the same block size (VERDICT r3 missing #4)."""
    import dataclasses

    from quanta_tpu import core
    from quanta_tpu.core import codecs
    from quanta_tpu.utils import transcode_codebook, transcode_params

    w = jax.random.normal(jax.random.PRNGKey(3), (256, 128), jnp.float32)
    qt = core.quantize_matmul_weight(w, fmt="nf4", block_size=64)
    tq = transcode_codebook(qt)
    assert tq.codebook == "nf4a"
    assert tq.codes.dtype == jnp.uint8 and tq.codes.shape == qt.codes.shape
    np.testing.assert_array_equal(np.asarray(tq.scale), np.asarray(qt.scale))

    # oracle: requantizing the dequantized nf4 values directly to nf4a
    d_nf4 = codecs.dequantize_matmul_weight(qt)
    rt = core.quantize_matmul_weight(d_nf4, fmt="nf4a", block_size=64)
    np.testing.assert_allclose(
        np.asarray(codecs.dequantize_matmul_weight(tq)),
        np.asarray(codecs.dequantize_matmul_weight(rt)),
        atol=1e-6,
    )

    # pytree version only touches nf4 leaves
    tree = {"a": qt, "b": jnp.ones((4,)),
            "c": core.quantize_matmul_weight(w, fmt="int4", block_size=64)}
    out = transcode_params(tree)
    assert out["a"].codebook == "nf4a"
    assert out["c"].codebook == "int4"

    # error cases
    import pytest as _pytest
    sym8 = core.quantize_matmul_weight(w, fmt="int8", block_size=64)
    qt8 = dataclasses.replace(sym8, codebook=None)
    with _pytest.raises(ValueError, match="codebook"):
        transcode_codebook(qt8)


def test_transcode_unpacked_8bit():
    """8-bit codebook tensors transcode through the plain-code path."""
    from quanta_tpu import core
    from quanta_tpu.utils import transcode_codebook

    w = jax.random.normal(jax.random.PRNGKey(4), (128, 64), jnp.float32)
    qt = core.quantize_matmul_weight(w, fmt="nf8", block_size=64)
    tq = transcode_codebook(qt, target="fp8")
    assert tq.codebook == "fp8" and tq.codes.shape == qt.codes.shape
