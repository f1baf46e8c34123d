import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
print("devices:", jax.devices(), "default:", jax.default_backend())

def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0

x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
print("pallas ok:", float(y.sum()))
