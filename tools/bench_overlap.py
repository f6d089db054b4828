"""Measure upload/dispatch interference vs upload piece size.

The tunnel serializes RPCs on one connection: while an ingest thread
uploads audio, the main thread's dispatch+sync rounds queue behind the
in-flight piece. This probe uploads ~200 MB in pieces of various sizes
while the main thread runs a fixed dispatch+sync loop, and reports the
loop's slowdown + the achieved upload time.

    python tools/bench_overlap.py
"""
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.RandomState(0)
    payload = rng.randint(-32768, 32767, 100 << 20).astype(np.int16)  # 200MB

    # main-thread work: a scan long enough to emulate a decode chunk
    a = jnp.ones((2048, 2048), jnp.bfloat16) * 0.01

    @jax.jit
    def work(a):
        def body(x, _):
            return x @ a, ()
        y, _ = jax.lax.scan(body, a, None, length=64)
        return jnp.sum(y)

    np.asarray(work(a))

    def loop_until(stop_evt):
        rounds = 0
        while not stop_evt.is_set():
            np.asarray(work(a))
            rounds += 1
        return rounds

    # baseline round time
    t0 = time.time()
    n0 = 0
    while time.time() - t0 < 5.0:
        np.asarray(work(a))
        n0 += 1
    base = (time.time() - t0) / n0
    print(f"baseline dispatch+sync round: {base * 1e3:.0f} ms", flush=True)

    for mb, throttle in ((8.0, False), (8.0, True), (2.0, True),
                         (16.0, True)):
        q = int(mb * (1 << 20) / 2)     # int16 elements per piece
        done = {}

        def upload():
            # jnp.asarray is async: unthrottled, the WHOLE payload enqueues
            # instantly and every later RPC waits behind the full backlog.
            # Throttled = block per piece -> at most one piece in flight.
            t0 = time.time()
            parts = []
            for i in range(0, payload.size, q):
                p = jnp.asarray(payload[i:i + q])
                if throttle:
                    jax.block_until_ready(p)
                parts.append(p)
            jax.block_until_ready(parts[-1])
            done["t"] = time.time() - t0
            done["n"] = len(parts)
            done["parts"] = parts      # keep alive

        evt = threading.Event()
        th = threading.Thread(target=upload)
        rounds = [0]

        def runner():
            rounds[0] = loop_until(evt)

        t0 = time.time()
        th.start()
        r = 0
        while th.is_alive():
            np.asarray(work(a))
            r += 1
        wall = time.time() - t0
        per = wall / max(r, 1)
        print(f"pieces {mb:.1f} MB throttle={throttle}: "
              f"upload {done['t']:.1f}s "
              f"({done['n']} pieces) | concurrent round {per * 1e3:.0f} ms "
              f"({per / base:.2f}x baseline)", flush=True)
        del done["parts"]


if __name__ == "__main__":
    main()
