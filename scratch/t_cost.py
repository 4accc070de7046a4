import dataclasses, jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator

def cost(name, cfg, B=8):
    model = CascadedGenerator(cfg)
    x = jnp.zeros((B, 256, 256, cfg.stack_channels), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    c = jax.jit(lambda p, x: model.apply(p, x)).lower(params, x).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list): ca = ca[0]
    print(f"{name}: {ca.get('flops',0)/1e9:.1f} GF, bytes {ca.get('bytes accessed',0)/1e9:.2f} GB, "
          f"transcendentals {ca.get('transcendentals',0)/1e6:.1f}M")

base = ModelConfig()
cost("both+instance", base)
cost("features+instance", dataclasses.replace(base, interstage="features"))
cost("both+group", dataclasses.replace(base, norm="group"))
