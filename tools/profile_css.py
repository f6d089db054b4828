"""Locate the CSS-stage time on the real chip: sweep engine knobs and time
the fused program. Usage: python tools/profile_css.py [--seconds 120]
[--sessions 8] [--sweep]."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(seg_chunk, mc_mvdr, dtype_name, batch_sessions=8):
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.css.engine import CssCfg, CssEngine
    from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,
                                                 NnetConfig,
                                                 large_conformer_config)
    cfg = CssCfg(seg_chunk=seg_chunk, seg_bucket_multiple=16,
                 mc_mvdr=mc_mvdr, compute_dtype=dtype_name,
                 batch_sessions=batch_sessions)
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype_name]
    model = CssModel(ConformerCssConfig(
        nnet_conf=NnetConfig(conformer_conf=large_conformer_config())),
        dtype=dt)
    return CssEngine(model, model.init(jax.random.PRNGKey(0)), cfg)


def run_once(engine, mixes, fs, tag):
    import jax
    t0 = time.time()
    engine.separate_sessions_batch(mixes, fs)
    compile_t = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        engine.separate_sessions_batch(mixes, fs)
        times.append(time.time() - t0)
    best = min(times)
    total = len(mixes) * mixes[0].shape[1] / fs
    print(f"{tag}: compile+run {compile_t:.1f}s | steady {best:.2f}s "
          f"-> {total / best:.0f}x RT", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax

    fs = 16000
    rng = np.random.RandomState(0)
    mixes = [(rng.randn(1, int(args.seconds * fs), 7) * 0.1).astype(np.float32)
             for _ in range(args.sessions)]

    print(f"device: {jax.devices()[0]}", flush=True)

    variants = [
        ("baseline chunk=8 mvdr bf16", dict(seg_chunk=8, mc_mvdr=True,
                                            dtype_name="bfloat16")),
        ("no-mvdr chunk=8 bf16", dict(seg_chunk=8, mc_mvdr=False,
                                      dtype_name="bfloat16")),
        ("mvdr chunk=32 bf16", dict(seg_chunk=32, mc_mvdr=True,
                                    dtype_name="bfloat16")),
        ("mvdr chunk=80 bf16", dict(seg_chunk=80, mc_mvdr=True,
                                    dtype_name="bfloat16")),
        ("no-mvdr chunk=80 bf16", dict(seg_chunk=80, mc_mvdr=False,
                                       dtype_name="bfloat16")),
    ]
    results = {}
    for tag, kw in variants:
        eng = build_engine(**kw)
        results[tag] = run_once(eng, mixes, fs, tag)

    if args.trace:
        eng = build_engine(seg_chunk=8, mc_mvdr=True, dtype_name="bfloat16")
        eng.separate_sessions_batch(mixes, fs)
        with jax.profiler.trace("/tmp/css_trace"):
            eng.separate_sessions_batch(mixes, fs)
        print("trace written to /tmp/css_trace", flush=True)


if __name__ == "__main__":
    main()
