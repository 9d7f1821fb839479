"""NF4 dequant-variant shootout at decode shapes on the real chip.

Variants of the in-kernel 16-level LUT for exact NF4:
  tree    - 4 bit masks + 15 selects (current production path)
  poly15  - single degree-15 Horner in t=(c-7.5)/7.5 (bf16-exact, no selects)
  blend7  - dual degree-7 with FMA coefficient blend on bit3 (f32-exact)
  take    - jnp.take into a 16-entry table (tests Mosaic dynamic-gather)
  nf4a    - arithmetic codebook (ceiling reference)
"""
import functools, math, time, sys
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from quanta_tpu.core import codebooks, codecs

NF4 = codebooks.NF4_LEVELS.astype(np.float64)

# exact interpolation coefficients (f64 fit, f32 eval)
t = (np.arange(16.0) - 7.5) / 7.5
C15 = np.polyfit(t, NF4, 15)
cl = np.arange(8.0)
CN7 = np.polyfit(cl, NF4[:8], 7)
CP7 = np.polyfit(cl, NF4[8:], 7)
CD7 = CP7 - CN7


def _tree(codes, levels=codebooks.NF4_LEVELS):
    b0 = (codes & 1) != 0
    b1 = (codes & 2) != 0
    b2 = (codes & 4) != 0
    b3 = (codes & 8) != 0
    lv = [float(v) for v in levels]
    tt = [jnp.where(b0, lv[2 * j + 1], lv[2 * j]) for j in range(8)]
    u = [jnp.where(b1, tt[2 * j + 1], tt[2 * j]) for j in range(4)]
    v = [jnp.where(b2, u[2 * j + 1], u[2 * j]) for j in range(2)]
    return jnp.where(b3, v[1], v[0])


def _poly15(codes):
    cf = codes.astype(jnp.float32) * np.float32(1.0 / 7.5) - np.float32(1.0)
    out = jnp.full(cf.shape, np.float32(C15[0]), jnp.float32)
    for a in C15[1:]:
        out = out * cf + np.float32(a)
    return out


def _blend7(codes):
    c7 = (codes & 7).astype(jnp.float32)
    b3 = (codes >> 3).astype(jnp.float32)
    out = np.float32(CN7[0]) + b3 * np.float32(CD7[0])
    for n, d in zip(CN7[1:], CD7[1:]):
        out = out * c7 + (np.float32(n) + b3 * np.float32(d))
    return out


def _take(codes):
    lv = jnp.asarray(codebooks.NF4_LEVELS)
    return lv[codes]


def _lgather(codes, lv_row):
    # lane gather: every row of the table tile holds the 16 levels in
    # lanes 0-15 (pattern repeats); idx<16 picks within the first 16 lanes
    tbl = jnp.broadcast_to(lv_row, codes.shape)
    return jnp.take_along_axis(tbl, codes, axis=1)


def _sgather(codes, lv_col):
    # sublane gather: every column holds the 16 levels in rows 0-15
    tbl = jnp.broadcast_to(lv_col, codes.shape)
    return jnp.take_along_axis(tbl, codes, axis=0)


def _nf4a(codes):
    cf = codes.astype(jnp.float32)
    out = jnp.full(cf.shape, np.float32(codebooks.POLY_COEFFS["nf4a"][0]),
                   jnp.float32)
    for a in codebooks.POLY_COEFFS["nf4a"][1:]:
        out = out * cf + np.float32(a)
    return out


DEQ = {"tree": _tree, "poly15": _poly15, "blend7": _blend7, "take": _take,
       "nf4a": _nf4a, "lgather": _lgather, "sgather": _sgather}


def _expand_scales(scale_tile, block):
    nb, tn = scale_tile.shape
    return jnp.broadcast_to(scale_tile[:, None, :], (nb, block, tn)).reshape(
        nb * block, tn)


def _kern(x_lo, x_hi, wp, s_lo, s_hi, *rest, variant, block,
          out_dtype):
    # rest = (*optional lv input, out_ref, acc_scratch)
    lv = rest[:-2]
    out = rest[-2]
    acc = rest[-1]
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    packed = wp[:].astype(jnp.int32)
    lo = packed & 0x0F
    hi = packed >> 4
    if variant == "lgather":
        deq = lambda c: _lgather(c, lv[0][:1, :])
    elif variant == "sgather":
        deq = lambda c: _sgather(c, lv[0][:, :1])
    else:
        deq = DEQ[variant]
    w_lo = deq(lo) * _expand_scales(s_lo[:], block)
    w_hi = deq(hi) * _expand_scales(s_hi[:], block)
    acc[:] += jnp.dot(x_lo[:], w_lo.astype(x_lo.dtype),
                      preferred_element_type=jnp.float32)
    acc[:] += jnp.dot(x_hi[:], w_hi.astype(x_hi.dtype),
                      preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out[:] = acc[:].astype(out_dtype)


def _round_up(x, m):
    return -(-x // m) * m


def _pick_tile_n(n, pref):
    for tn in pref:
        if n % tn == 0:
            return tn
    raise ValueError(n)


def _pick_tile_k(k_rows, unit, cap):
    best = unit
    tt = unit
    while tt <= min(cap, k_rows):
        if k_rows % tt == 0:
            best = tt
        tt += unit
    return best


@functools.partial(jax.jit, static_argnames=("variant", "block", "tnp", "kcap"))
def mm4(x, codes_packed, scales, *, variant, block=64, tnp=(512, 256, 128),
        kcap=0):
    m, k_dim = x.shape
    k2, n = codes_packed.shape
    if k_dim < 2 * k2:
        x = jnp.pad(x, ((0, 0), (0, 2 * k2 - k_dim)))
    out_dtype = x.dtype
    unit = 8 * block
    tm = min(256, _round_up(m, 16))
    tn = _pick_tile_n(n, tnp)
    cap = kcap // 2 if kcap else max(unit, (1 << 20) // (2 * tn) * 2)
    tkp = _pick_tile_k(k2, unit, cap)
    sb = tkp // block
    m_pad = _round_up(m, tm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // tm, n // tn, k2 // tkp)
    nk_half = k2 // tkp
    kernel = functools.partial(_kern, variant=variant, block=block,
                               out_dtype=out_dtype)
    in_specs = [
            pl.BlockSpec((tm, tkp), lambda i, j, k: (i, k)),
            pl.BlockSpec((tm, tkp), lambda i, j, k: (i, k + nk_half)),
            pl.BlockSpec((tkp, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, tn), lambda i, j, k: (k, j)),
            pl.BlockSpec((sb, tn), lambda i, j, k: (k + nk_half, j)),
    ]
    extra = ()
    if variant == "lgather":
        lv_row = np.zeros((8, tn), np.float32)
        lv_row[:, :16] = NF4.astype(np.float32)[None, :]
        extra = (jnp.asarray(lv_row),)
        in_specs.append(pl.BlockSpec((8, tn), lambda i, j, k: (0, 0)))
    elif variant == "sgather":
        lv_col = np.zeros((16, 128), np.float32)
        lv_col[:, :] = NF4.astype(np.float32)[:, None]
        extra = (jnp.asarray(lv_col),)
        in_specs.append(pl.BlockSpec((16, 128), lambda i, j, k: (0, 0)))
    out = pl.pallas_call(
        kernel, grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, x, codes_packed, scales, scales, *extra)
    return out[:m]


def slope_time(op, x, L0=16, L1=272, reps=4):
    tms = {}
    for L in (L0, L1):
        @jax.jit
        def loop(seed, L=L):
            def body(acc, _):
                xi = x + (acc * 1e-30).astype(x.dtype)
                o = op(xi)
                return o.astype(jnp.float32).sum() * 1e-30, None
            acc, _ = jax.lax.scan(body, seed, None, length=L)
            return acc
        np.asarray(loop(jnp.float32(0)))
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            np.asarray(loop(jnp.float32(r + 1)))
            best = min(best, time.perf_counter() - t0)
        tms[L] = best
    return max((tms[L1] - tms[L0]) / (L1 - L0), 1e-9)


def main():
    M = 8
    shapes = [("qkv", 2048, 2048), ("gateup", 2048, 5632),
              ("down", 5632, 2048), ("lm_head", 2048, 32000)]
    variants = sys.argv[1:] or ["tree", "poly15", "blend7", "nf4a"]
    for label, K, N in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        qt = codecs.quantize_matmul_weight(w, fmt="nf4", block_size=64)
        wb = w.astype(jnp.bfloat16)
        t_dense = slope_time(lambda a: a @ wb, x)
        row = [f"dense {t_dense*1e6:7.1f}us"]
        # correctness vs oracle
        ref = np.asarray(x @ codecs.dequantize_matmul_weight(qt).astype(jnp.bfloat16))[:, :N]
        for v in variants:
            try:
                out = np.asarray(mm4(x, qt.codes, qt.scale, variant=v))[:, :N]
                err = np.abs(out.astype(np.float32) - ref.astype(np.float32)).max()
                tt = slope_time(lambda a, v=v: mm4(a, qt.codes, qt.scale, variant=v), x)
                row.append(f"{v} {tt*1e6:7.1f}us ({t_dense/tt:4.2f}x, err {err:.1e})")
            except Exception as e:
                row.append(f"{v} FAIL {type(e).__name__}: {str(e)[:80]}")
        print(f"{label:8s} K{K} N{N} | " + " | ".join(row), flush=True)


if __name__ == "__main__":
    main()
