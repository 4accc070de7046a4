import numpy as np, jax, jax.numpy as jnp
from pwstablenet_tpu.config import ModelConfig, TrainConfig
from pwstablenet_tpu.data import make_train_batch
from pwstablenet_tpu.train import create_train_state, make_train_step
from pwstablenet_tpu.utils.timing import device_time
model_cfg = ModelConfig()
train_cfg = TrainConfig(batch_size=4)
state, (gen, disc, feat) = create_train_state(model_cfg, train_cfg, jax.random.PRNGKey(0))
t_step = jax.jit(make_train_step(model_cfg, train_cfg, gen, disc, feat))
batch = jax.tree_util.tree_map(jnp.asarray, make_train_batch(4, 256, 256, 7))
dts = device_time(lambda b: t_step(state, b)[1], (batch,), iters=6)
print(f"train step b4x2: {dts*1e3:.1f} ms (was 45.8)")
