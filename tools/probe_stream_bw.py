"""Per-grid-step overhead probe: pure block-streaming pallas kernel at
several block heights; reports effective GB/s reading a 33.5 MB batch."""
import functools, sys
import numpy as np
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dbde_tpu.utils.profiling import measure_device_seconds

B, H, W4 = 8, 2048, 512  # 33.5 MB u32

def kern(x_ref, o_ref):
    x = x_ref[0]
    o_ref[...] = (x[0:8, 0:128] | x[-8:, -128:]).reshape(1, 8, 128)

def stream(R, x):
    nb = H // R
    return pl.pallas_call(
        kern,
        grid=(B, nb),
        in_specs=[pl.BlockSpec((1, R, W4), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, g: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.uint32),
    )(x)

x = jnp.asarray(np.random.randint(0, 2**31, (B, H, W4), dtype=np.int64).astype(np.uint32))
nbytes = B * H * W4 * 4
for R in (32, 64, 128, 256):
    fn = jax.jit(functools.partial(stream, R))
    t = measure_device_seconds(fn, x, reps=8)
    steps = B * (H // R)
    print(f"R={R:4d} blocks={steps:5d} t={t*1e3:7.3f} ms  {nbytes/t/1e9:7.1f} GB/s  {t/steps*1e6:6.2f} us/step")
