"""Tile sweep: decode (M=8) and prefill (M=128) x 4 shapes x formats x tn."""
import jax, jax.numpy as jnp, numpy as np, time
import _nf4var as V
from quanta_tpu.core import codecs
from quanta_tpu.ops import matmul as mm

shapes = [("qkv", 2048, 2048), ("gateup", 2048, 5632),
          ("down", 5632, 2048), ("lm_head", 2048, 32000)]
for M in (8, 128):
    for label, K, N in shapes:
        kx, kw = jax.random.split(jax.random.PRNGKey(K + N))
        x = jax.random.normal(kx, (M, K), jnp.bfloat16)
        w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
        wb = w.astype(jnp.bfloat16)
        td = V.slope_time(lambda a: a @ wb, x)
        print(f"M{M} {label:8s} dense {td*1e6:7.1f}us", flush=True)
        for fmt in ("nf4a", "nf4", "int4"):
            qt = codecs.quantize_matmul_weight(w, fmt=fmt, block_size=64)
            for tn in (128, 256, 512):
                if N % tn: continue
                try:
                    t = V.slope_time(lambda a: mm.matmul_quantized(a, qt, tn=tn), x)
                    print(f"M{M} {label:8s} {fmt:5s} tn{tn:3d} {t*1e6:7.1f}us ({td/t:4.2f}x)", flush=True)
                except Exception as e:
                    print(f"M{M} {label:8s} {fmt:5s} tn{tn:3d} FAIL {type(e).__name__}", flush=True)
        qt = codecs.quantize_matmul_weight(w, fmt="int8", block_size=64)
        for tn in (128, 256, 512):
            if N % tn: continue
            try:
                t = V.slope_time(lambda a: mm.matmul_quantized(a, qt, tn=tn), x)
                print(f"M{M} {label:8s} int8  tn{tn:3d} {t*1e6:7.1f}us ({td/t:4.2f}x)", flush=True)
            except Exception as e:
                print(f"M{M} {label:8s} int8  tn{tn:3d} FAIL {type(e).__name__}", flush=True)
