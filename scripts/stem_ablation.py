import os, sys, time, json
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fast_srgan_tpu.utils import jax_cache
jax_cache.enable()
import jax, jax.numpy as jnp, numpy as np
from fast_srgan_tpu.models import Generator
from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail

rng = np.random.default_rng(0)
staged = [jax.device_put(rng.integers(0,256,(16,180,320,3),dtype=np.uint8)) for _ in range(4)]

def bench(n_layers):
    model = Generator(n_filters=64, n_layers=n_layers, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), jnp.zeros((1,24,24,3)))
    @jax.jit
    def fwd(p, x_u8):
        x = x_u8.astype(jnp.float32)/127.5 - 1.0
        y = generator_apply_lr_tail(model, p, x)
        u8 = ((y+1.0)*127.5).clip(0,255).astype(jnp.uint8)
        return jnp.sum(u8, dtype=jnp.int32)
    int(fwd(params, staged[0]))
    n = 20
    t0 = time.perf_counter()
    cks = []
    for i in range(n):
        cks.append(fwd(params, staged[i%4]))
        if len(cks) > 8: int(cks.pop(0))
    for c in cks: int(c)
    return (time.perf_counter()-t0)/n*1000

r = {f"n_layers_{n}": round(bench(n),2) for n in (8, 4, 0)}
r["stem_ms_8_blocks"] = round(r["n_layers_8"] - r["n_layers_0"], 2)
print(json.dumps(r))
