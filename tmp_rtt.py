import time, jax, jax.numpy as jnp
f = jax.jit(lambda x: x + 1.0)
x = jnp.ones((8,))
jax.block_until_ready(f(x))
for _ in range(3):
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        y = jax.block_until_ready(f(x))
    print(f"sync dispatch RTT: {(time.perf_counter()-t0)/reps*1e3:.2f} ms")
# async chain of 5 then one sync (bench-style)
t0 = time.perf_counter()
for _ in range(5):
    y = f(x)
jax.block_until_ready(y)
print(f"5-deep async chain: {(time.perf_counter()-t0)/5*1e3:.2f} ms/call")
