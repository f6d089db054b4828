"""Measure the host<->device link: dispatch latency, upload/download
bandwidth, and sync cost.

The serving chip is reached through a tunnel (axon); per-dispatch latency
and transfer bandwidth — not FLOPs — bound the low-MFU pipeline stages
(bench MFU: css 0.45%). This probe pins the link numbers so stage
optimizations target the real resource.

    python tools/bench_tunnel.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    # dispatch latency: tiny jitted op, round-trip until value read
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 8), jnp.float32)
    jax.block_until_ready(f(x))
    lat = []
    for _ in range(20):
        t0 = time.time()
        np.asarray(f(x))
        lat.append(time.time() - t0)
    lat = np.array(lat) * 1e3
    print(f"dispatch+readback latency: p50 {np.percentile(lat, 50):.1f} ms "
          f"| p90 {np.percentile(lat, 90):.1f} ms | min {lat.min():.1f} ms",
          flush=True)

    # enqueue-only latency (no readback): how fast can dependent dispatches
    # be queued
    t0 = time.time()
    y = x
    for _ in range(100):
        y = f(y)
    jax.block_until_ready(y)
    print(f"100 chained dispatches: {(time.time() - t0) * 1e3:.0f} ms "
          f"({(time.time() - t0) * 10:.1f} ms/dispatch)", flush=True)

    # upload bandwidth
    for mb in (16, 128, 512):
        a = np.zeros(mb * 1 << 20, np.uint8)
        ts = []
        for _ in range(3):
            t0 = time.time()
            d = jax.device_put(a)
            jax.block_until_ready(d)
            ts.append(time.time() - t0)
            del d
        print(f"upload {mb} MB: {min(ts):.2f} s -> "
              f"{mb / min(ts):.0f} MB/s", flush=True)

    # download bandwidth: COMPUTED data (zeros can be elided) + subtract
    # the ~24 ms sync latency via two sizes
    for mb in (16, 128):
        d = jax.block_until_ready(
            jax.jit(lambda k: jax.random.uniform(k, (mb * (1 << 20) // 4,))
                    )(jax.random.PRNGKey(0)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(d)
            ts.append(time.time() - t0)
        print(f"download {mb} MB: {min(ts):.2f} s -> "
              f"{mb / min(ts):.0f} MB/s", flush=True)

    # sustained matmul throughput (MXU): loop INSIDE the program so the
    # ~24 ms sync round-trip amortizes over many matmuls
    n, iters = 8192, 32
    a = jnp.ones((n, n), jnp.bfloat16) * 0.001

    @jax.jit
    def g(a):
        def body(x, _):
            return x @ a, ()
        y, _ = jax.lax.scan(body, a, None, length=iters)
        return jnp.sum(y)

    np.asarray(g(a))
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(g(a))
        ts.append(time.time() - t0)
    fl = 2 * n ** 3 * iters / min(ts)
    print(f"bf16 {n}x{n} matmul x{iters}: {min(ts) * 1e3:.1f} ms -> "
          f"{fl / 1e12:.1f} TFLOP/s sustained", flush=True)

    # sustained HBM bandwidth: big elementwise op looped in-program
    m = 1 << 28   # 256M f32 = 1 GB
    v = jnp.ones((m,), jnp.float32)

    @jax.jit
    def h(v):
        def body(x, _):
            return x * 1.0000001 + 1e-9, ()
        y, _ = jax.lax.scan(body, v, None, length=8)
        return jnp.sum(y)

    np.asarray(h(v))
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(h(v))
        ts.append(time.time() - t0)
    gbps = 8 * 2 * m * 4 / min(ts) / 1e9
    print(f"elementwise 1GB x8 rounds: {min(ts) * 1e3:.1f} ms -> "
          f"{gbps:.0f} GB/s HBM (r+w)", flush=True)


if __name__ == "__main__":
    main()
