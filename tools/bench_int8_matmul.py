"""Microbenchmark: weight-only int8 vs bf16 matmul at decode shapes.

Measures the op QuantDense (models/whisper.py) builds — a skinny
activation [B, D] against a resident weight [D, F] stored int8 with a
per-output-channel f32 scale, dequantized inside the matmul read — vs
the same matmul with a bf16-resident weight. At decode batch sizes the
op is weight-READ-bound, so the expected win is ~2x (half the HBM
bytes); this verifies XLA fuses the int8->bf16 convert into the dot's
operand read instead of materializing a bf16 copy (a materialization
would erase the win and show as bf16-parity timing).

Methodology notes (both pitfalls produced plausible-looking garbage on
the first attempt):
* each measured step must CONSUME every output column — a chain that
  carries only y[:, :D] forward lets XLA dead-code-eliminate the other
  F-D columns of the matmul (the "bf16 logits at 3.7 TB/s" artifact);
  here a max-reduce over D-sized column groups feeds the carry.
* iterations are serialized through a lax.scan carry and the total is
  read back to the host — on the tunneled TPU, per-dispatch timing is
  swamped by a ~25 ms round trip, which is subtracted once.

Measured on TPU v5e (2026-08): attn-proj 0.9x (dispatch-bound at 6 us),
mlp1 2.0x, mlp2 2.0x, logits 1.7x.

Run on the TPU: python tools/bench_int8_matmul.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

RTT = 0.025     # tunnel host<->device round trip, subtracted from totals
B = 12          # lockstep decode rows


def run(D, F, tag, iters):
    Fp = int(np.ceil(F / D) * D)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, D).astype(np.float32), dtype=jnp.bfloat16)
    w32 = rng.randn(D, F).astype(np.float32) / np.sqrt(D)
    s = np.abs(w32).max(axis=0) / 127.0
    wq = jnp.asarray(np.clip(np.round(w32 / s), -127, 127).astype(np.int8))
    sj = jnp.asarray(s, jnp.float32)
    wb = jnp.asarray(w32, jnp.bfloat16)

    def consume(y, c):
        # touch every output column, un-foldable into the matmul (a sum
        # would algebraically collapse to a matvec against w.sum(1))
        y = jnp.pad(y, ((0, 0), (0, Fp - F)), constant_values=-1e9)
        return jnp.tanh(y.reshape(B, Fp // D, D).max(axis=1) + 0.1 * c)

    @partial(jax.jit, static_argnums=2)
    def chain_b(x, w, iters):
        def step(c, _):
            return consume(c @ w, c), None
        return jax.lax.scan(step, x, None, length=iters)[0].sum()

    @partial(jax.jit, static_argnums=3)
    def chain_q(x, w, s, iters):
        def step(c, _):
            y = (c @ w.astype(jnp.bfloat16)) * s.astype(jnp.bfloat16)
            return consume(y, c), None
        return jax.lax.scan(step, x, None, length=iters)[0].sum()

    float(chain_b(x, wb, iters))                      # compile + warm
    float(chain_q(x, wq, sj, iters))
    t0 = time.perf_counter()
    float(chain_b(x, wb, iters))
    tb = (time.perf_counter() - t0 - RTT) / iters
    t0 = time.perf_counter()
    float(chain_q(x, wq, sj, iters))
    tq = (time.perf_counter() - t0 - RTT) / iters
    bb, bq = D * F * 2, D * F * 1 + F * 4
    print(f"{tag:10s} [{D}x{F}] bf16 {tb*1e6:7.1f}us "
          f"({bb/tb/1e9:6.0f} GB/s) | int8 {tq*1e6:7.1f}us "
          f"({bq/tq/1e9:6.0f} GB/s) | speedup {tb/tq:4.2f}x")


def main():
    # large-v3 decoder shapes: D=1280, mlp 1280<->5120, logits 1280->51866
    run(1280, 1280, "attn proj", 2000)
    run(1280, 5120, "mlp1", 1000)
    run(5120, 1280, "mlp2", 1000)
    run(1280, 51866, "logits", 300)


if __name__ == "__main__":
    main()
