import re
import jax, jax.numpy as jnp, numpy as np
from pwstablenet_tpu.config import ModelConfig
from pwstablenet_tpu.models import CascadedGenerator

cfg = ModelConfig()
model = CascadedGenerator(cfg)
x = jnp.zeros((8, 256, 256, cfg.stack_channels), jnp.float32)
pshapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
params = jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), pshapes)
txt = jax.jit(model.apply).lower(params, x).compile().as_text()
open("/root/repo/scratch/gen_hlo.txt", "w").write(txt)
for name in ["fusion", "fusion.1", "fusion.2", "fusion.3", "fusion.4", "fusion.369"]:
    m = re.search(rf"%{re.escape(name)} = [^\n]+", txt)
    if m:
        print(name, "::", m.group(0)[:400])
        print()
print("DONE")
