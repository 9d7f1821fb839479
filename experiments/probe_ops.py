"""Probe which Mosaic ops compile on this chip: dynamic_gather (lane + 256),
broadcast-reshape scale expansion, (1,tn) sublane row slice, pltpu.repeat."""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TK, TN = 256, 512


def run(name, kern, out_shape, *args):
    try:
        out = pl.pallas_call(kern, out_shape=out_shape)(*args)
        jax.block_until_ready(out)
        print(f"{name}: OK", flush=True)
        return out
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        return None


x_codes = jnp.asarray(np.random.randint(0, 16, (TK, TN)), jnp.int32)
x_bytes = jnp.asarray(np.random.randint(0, 256, (TK, TN)), jnp.int32)
tbl16 = jnp.asarray(np.tile(np.arange(16, dtype=np.float32), TN // 16))  # (TN,)
tbl256 = jnp.asarray(np.tile(np.arange(256, dtype=np.float32), TN // 256))
scales = jnp.asarray(np.random.rand(TK // 64, TN), jnp.float32)
f32 = functools.partial(jax.ShapeDtypeStruct, dtype=jnp.float32)


# 1. 16-entry lane gather
def k_gather16(c_ref, t_ref, o_ref):
    tbl = jnp.broadcast_to(t_ref[:].reshape(1, TN), (TK, TN))
    o_ref[:] = jnp.take_along_axis(tbl, c_ref[:], axis=1)


out = run("gather16", k_gather16, f32((TK, TN)), x_codes, tbl16)
if out is not None:
    ref = np.asarray(tbl16)[np.asarray(x_codes) % 16 + 0]  # idx<16 hits copy 0
    ref = np.asarray(tbl16)[np.asarray(x_codes)]
    ok = np.array_equal(np.asarray(out), ref)
    print("  gather16 parity:", ok, flush=True)


# 2. 256-entry lane gather (crosses vreg lane boundary)
def k_gather256(c_ref, t_ref, o_ref):
    tbl = jnp.broadcast_to(t_ref[:].reshape(1, TN), (TK, TN))
    o_ref[:] = jnp.take_along_axis(tbl, c_ref[:], axis=1)


out = run("gather256", k_gather256, f32((TK, TN)), x_bytes, tbl256)
if out is not None:
    ref = np.asarray(tbl256)[np.asarray(x_bytes)]
    print("  gather256 parity:", np.array_equal(np.asarray(out), ref), flush=True)


# 3. broadcast-reshape scale expansion (sb,tn) -> (sb*64, tn)
def k_expand(s_ref, o_ref):
    sb, tn = s_ref.shape
    o_ref[:] = jnp.broadcast_to(s_ref[:][:, None, :], (sb, 64, tn)).reshape(
        sb * 64, tn
    )


out = run("expand_bcast_reshape", k_expand, f32((TK, TN)), scales)
if out is not None:
    ref = np.repeat(np.asarray(scales), 64, axis=0)
    print("  expand parity:", np.array_equal(np.asarray(out), ref), flush=True)


# 4. pltpu.repeat
def k_repeat(s_ref, o_ref):
    o_ref[:] = pltpu.repeat(s_ref[:], 64, axis=0)


out = run("pltpu.repeat", k_repeat, f32((TK, TN)), scales)
if out is not None:
    ref_interleave = np.repeat(np.asarray(scales), 64, axis=0)
    ref_tile = np.tile(np.asarray(scales), (64, 1))
    print(
        "  repeat semantics: interleave" if np.array_equal(out, ref_interleave)
        else "  repeat semantics: tile" if np.array_equal(out, ref_tile)
        else "  repeat semantics: ???",
        flush=True,
    )


# 5. (1, tn) row slice at non-8-aligned sublane offset
def k_rowslice(s_ref, o_ref):
    o_ref[:] = jnp.broadcast_to(s_ref[1:2, :], (TK, TN)) + jnp.broadcast_to(
        s_ref[3:4, :], (TK, TN)
    )


run("row_slice_unaligned", k_rowslice, f32((TK, TN)), scales)


# 6. select-tree lookup for reference (always works, cost baseline)
def k_tree(c_ref, o_ref):
    c = c_ref[:]
    lv = np.arange(16, dtype=np.float32)
    out = jnp.full(c.shape, lv[0], jnp.float32)
    for i in range(1, 16):
        out = jnp.where(c == i, lv[i], out)
    o_ref[:] = out


run("select_chain", k_tree, f32((TK, TN)), x_codes)

# 7. int8 dot on MXU (for llm.int8 path later)
xi8 = jnp.asarray(np.random.randint(-127, 127, (128, 256)), jnp.int8)
wi8 = jnp.asarray(np.random.randint(-127, 127, (256, 256)), jnp.int8)


def k_int8dot(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


out = run("int8_dot", k_int8dot, jax.ShapeDtypeStruct((128, 256), jnp.int32), xi8, wi8)
if out is not None:
    ref = np.asarray(xi8, np.int32) @ np.asarray(wi8, np.int32)
    print("  int8 dot parity:", np.array_equal(np.asarray(out), ref), flush=True)

print("done", flush=True)
