import jax, jax.numpy as jnp, numpy as np, time, sys
import _nf4var as V
from quanta_tpu.core import codecs
M, K, N = 8, 2048, 2048
kx, kw = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(kx, (M, K), jnp.bfloat16)
w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
qt = codecs.quantize_matmul_weight(w, fmt="nf4", block_size=64)
t0 = time.time()
out = np.asarray(V.mm4(x, qt.codes, qt.scale, variant="lgather", tnp=(128,)))[:, :N]
print("compile+run", round(time.time()-t0, 1), "s", flush=True)
ref = np.asarray(x @ codecs.dequantize_matmul_weight(qt).astype(jnp.bfloat16))[:, :N]
print("maxerr", np.abs(out.astype(np.float32)-ref.astype(np.float32)).max(), flush=True)
t = V.slope_time(lambda a: V.mm4(a, qt.codes, qt.scale, variant="lgather", tnp=(128,)), x)
td = V.slope_time(lambda a: a @ w.astype(jnp.bfloat16), x)
print(f"lgather(tn128) {t*1e6:.1f}us  dense {td*1e6:.1f}us ({td/t:.2f}x)", flush=True)
