"""Time the REAL GreedyDecoder._decode_scan (model code, not idealized
einsums) at fixed step count, isolating decode from the rest of the
pipeline. Compares weight/cross-KV dtype configs on identical shapes.

    python tools/bench_decode_real.py [--batch 24] [--steps 80]
    python tools/bench_decode_real.py --configs int8 --ablate

--ablate additionally times, IN THE SAME PROCESS (the large-v3 param
init + upload is minutes over a narrow host link, so one process must
amortize it), the two decode-step decompositions:
  no_ts    — timestamp logit rules skipped (their share of the step)
  xa128    — cross-attention memory cut 1500 -> 128 frames (the
             cross-KV HBM stream's share; weights stream unchanged)
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--configs", default="int8,bf16")
    ap.add_argument("--without-timestamps", action="store_true",
                    help="skip the timestamp logit rules in every run")
    ap.add_argument("--xa-frames", type=int, default=1500,
                    help="cross-attention memory length (1500 = real)")
    ap.add_argument("--ablate", action="store_true",
                    help="also run the no_ts / xa128 variants per config")
    args = ap.parse_args()
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
    from notsofar_tpu.asr.tokenizer import load_tokenizer
    from notsofar_tpu.models.whisper import (WHISPER_DIMS, WhisperModel,
                                             quantize_whisper_decoder)

    dims = WHISPER_DIMS[args.model]
    tok = load_tokenizer(args.model, dims.n_vocab)
    print(f"device: {jax.devices()[0]}; B={args.batch} steps={args.steps}",
          flush=True)

    base = WhisperModel(dims, dtype=jnp.bfloat16)
    vars_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        base.init(jax.random.PRNGKey(1)))

    rng = np.random.RandomState(0)

    def make_xa(frames):
        return jnp.asarray(
            rng.randn(args.batch, frames, dims.n_audio_state)
            .astype(np.float32) * 0.1).astype(jnp.bfloat16)

    def run_one(tag, quant, variables, without_ts, xa_frames):
        model = WhisperModel(dims, dtype=jnp.bfloat16, quant_decoder=quant)
        xa = make_xa(xa_frames)
        dec = GreedyDecoder(model, tok, DecodeOptions(
            max_new_tokens=args.steps, cross_kv_quant=quant,
            without_timestamps=without_ts,
            max_rows_per_dispatch=args.batch))
        dec._eot = dims.n_vocab + 1    # fixed-step: never latch EOT
        initial = tok.sot_sequence
        prompt = jnp.asarray(np.tile(np.asarray(initial, np.int32),
                                     (args.batch, 1)))
        t0 = time.time()
        t, s = dec._decode_scan(variables, xa, len(initial), prompt,
                                None, 0.0)
        np.asarray(s)
        comp = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            t, s = dec._decode_scan(variables, xa, len(initial), prompt,
                                    None, 0.0)
            np.asarray(s)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{tag}: compile+first {comp:.0f}s | {dt:.2f}s for "
              f"{args.steps} steps -> {dt / args.steps * 1e3:.2f} ms/step",
              flush=True)
        return dt / args.steps * 1e3

    for cfgname in args.configs.split(","):
        quant = cfgname == "int8"
        variables = quantize_whisper_decoder(vars_bf16) if quant \
            else vars_bf16
        ms = run_one(cfgname, quant, variables, args.without_timestamps,
                     args.xa_frames)
        if args.ablate:
            ms_nots = run_one(f"{cfgname}/no_ts", quant, variables, True,
                              args.xa_frames)
            ms_xa = run_one(f"{cfgname}/xa128", quant, variables,
                            args.without_timestamps, 128)
            print(f"{cfgname} decomposition: timestamp rules "
                  f"{ms - ms_nots:+.2f} ms/step | cross-KV stream "
                  f"{ms - ms_xa:+.2f} ms/step | residual "
                  f"(weights+selfattn+logits+sampling) {ms_xa:.2f}",
                  flush=True)


if __name__ == "__main__":
    main()
