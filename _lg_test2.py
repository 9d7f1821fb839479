import jax, jax.numpy as jnp, numpy as np, time
import _nf4var as V
from quanta_tpu.core import codecs
M, K, N = 8, 2048, 2048
kx, kw = jax.random.split(jax.random.PRNGKey(0))
x = jax.random.normal(kx, (M, K), jnp.bfloat16)
w = jax.random.normal(kw, (K, N), jnp.float32) * 0.02
qt = codecs.quantize_matmul_weight(w, fmt="nf4", block_size=64)
for v, tnp in (("nf4a", (128,)), ("nf4a", (512,)), ("tree", (128,)), ("lgather", (128,))):
    t = V.slope_time(lambda a: V.mm4(a, qt.codes, qt.scale, variant=v, tnp=tnp), x)
    print(f"{v}(tn{tnp[0]}) {t*1e6:6.1f}us", flush=True)
