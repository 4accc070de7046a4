"""Can H2D and D2H overlap through the axon tunnel? (fresh buffers)"""
import time, threading
import numpy as np, jax, jax.numpy as jnp

a = np.random.default_rng(0).integers(0, 255, (14, 480, 832, 3), np.uint8)
add1 = jax.jit(lambda x, k: x + k)
base = jax.block_until_ready(jnp.asarray(a))
add1(base, np.uint8(1)).block_until_ready()  # warm compile

def fresh_dev(k):
    return jax.block_until_ready(add1(base, np.uint8(k)))

def h2d(k):
    x = jnp.asarray(a + np.uint8(k))  # distinct host buffer
    x.block_until_ready()

def d2h(dx):
    _ = np.asarray(dx)

h2d(9); d2h(fresh_dev(9))  # warm paths

d1 = fresh_dev(1)
t0 = time.perf_counter(); h2d(1); t_h = time.perf_counter() - t0
t0 = time.perf_counter(); d2h(d1); t_d = time.perf_counter() - t0
print(f"serial: h2d {t_h*1e3:.0f} ms, d2h {t_d*1e3:.0f} ms, sum {(t_h+t_d)*1e3:.0f}")

d2 = fresh_dev(2)
t0 = time.perf_counter()
th = threading.Thread(target=h2d, args=(2,))
td = threading.Thread(target=d2h, args=(d2,))
th.start(); td.start(); th.join(); td.join()
print(f"concurrent h2d+d2h: {(time.perf_counter()-t0)*1e3:.0f} ms")

d3, d4 = fresh_dev(3), fresh_dev(4)
t0 = time.perf_counter()
t1 = threading.Thread(target=d2h, args=(d3,))
t2 = threading.Thread(target=d2h, args=(d4,))
t1.start(); t2.start(); t1.join(); t2.join()
print(f"concurrent d2h x2: {(time.perf_counter()-t0)*1e3:.0f} ms")
d5, d6 = fresh_dev(5), fresh_dev(6)
t0 = time.perf_counter(); d2h(d5); d2h(d6)
print(f"serial d2h x2: {(time.perf_counter()-t0)*1e3:.0f} ms")
