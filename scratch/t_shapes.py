import jax, jax.numpy as jnp
from flax import linen as nn

x = jnp.zeros((2, 2, 2, 8))
for pad in ["SAME", ((1,1),(1,1))]:
    y = nn.ConvTranspose(4, kernel_size=(4,4), strides=(2,2), padding=pad).init_with_output(jax.random.PRNGKey(0), x)[0]
    print("convT pad", pad, "->", y.shape)
x1 = jnp.zeros((2, 1, 1, 8))
for pad in ["SAME", ((1,1),(1,1))]:
    y = nn.ConvTranspose(4, kernel_size=(4,4), strides=(2,2), padding=pad).init_with_output(jax.random.PRNGKey(0), x1)[0]
    print("convT 1x1 pad", pad, "->", y.shape)
x2 = jnp.zeros((2, 2, 2, 8))
y = nn.Conv(4, kernel_size=(4,4), strides=(2,2), padding=((1,1),(1,1))).init_with_output(jax.random.PRNGKey(0), x2)[0]
print("conv 2x2 ->", y.shape)
