"""Reliable on-device timing through the axon tunnel: N iterations
inside ONE jit (lax.scan), single dispatch + single sync.

The accumulator is returned so XLA cannot dead-code-eliminate the body,
and each iteration's input depends on the previous output so iterations
cannot be parallelized/hoisted.
"""
import time, jax, jax.numpy as jnp

def bench_device(fn, args, iters=20, warmup=True):
    """fn(*args) -> pytree. Returns seconds per iteration (device-side)."""
    @jax.jit
    def loop(args):
        def body(carry, _):
            acc, cur = carry
            out = fn(*cur)
            leaf = jax.tree_util.tree_leaves(out)[-1].astype(jnp.float32).mean()
            eps = (leaf * 1e-20).astype(cur[0].dtype)
            return ((acc + leaf, (cur[0] + eps,) + tuple(cur[1:])), ())
        (acc, _), _ = jax.lax.scan(body, (jnp.zeros(()), tuple(args)), None, length=iters)
        return acc
    if warmup:
        loop(args).block_until_ready()
    t0 = time.perf_counter()
    r = loop(args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters
