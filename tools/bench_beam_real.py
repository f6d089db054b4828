"""Time the REAL BeamDecoder._beam_scan (model code) at fixed step
count, A/B-ing the split prompt/generated cache against the unified
cache it replaces. Shapes mirror the parity recipe
(/root/reference/asr/asr.py:52-56): beam_size=5 and
condition_on_previous_text, whose accumulated prompts run ~224 tokens
mid-session — the regime where the unified cache's full-width per-step
reorder gather hurts most.

    python tools/bench_beam_real.py [--batch 8] [--steps 80] \
        [--prompt-len 224] [--paths split,unified]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=8,
                    help="streams; rows = batch * beam")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--prompt-len", type=int, default=224,
                    help="prompt tokens incl. sot sequence")
    ap.add_argument("--configs", default="int8")
    ap.add_argument("--paths", default="split,unified")
    ap.add_argument("--ablate", action="store_true",
                    help="also time the split path without timestamp "
                    "rules (their per-step share) and at K=1 (the "
                    "beam-expansion machinery's share)")
    args = ap.parse_args()
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.asr.beam import BeamDecoder
    from notsofar_tpu.asr.decoding import DecodeOptions
    from notsofar_tpu.asr.tokenizer import load_tokenizer
    from notsofar_tpu.models.whisper import (WHISPER_DIMS, WhisperModel,
                                             quantize_whisper_decoder)

    dims = WHISPER_DIMS[args.model]
    tok = load_tokenizer(args.model, dims.n_vocab)
    print(f"device: {jax.devices()[0]}; B={args.batch} K={args.beam} "
          f"steps={args.steps} P={args.prompt_len}", flush=True)

    base = WhisperModel(dims, dtype=jnp.bfloat16)
    vars_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        base.init(jax.random.PRNGKey(1)))

    rng = np.random.RandomState(0)
    xa = jnp.asarray(
        rng.randn(args.batch, 1500, dims.n_audio_state)
        .astype(np.float32) * 0.1).astype(jnp.bfloat16)
    body = rng.randint(300, 8000,
                       (args.batch, args.prompt_len
                        - len(tok.sot_sequence))).astype(np.int32)
    prompt = jnp.asarray(np.concatenate(
        [body, np.tile(np.asarray(tok.sot_sequence, np.int32),
                       (args.batch, 1))], axis=1))

    def run_one(tag, quant, variables, split, without_ts=False, beam=None):
        beam = beam or args.beam
        model = WhisperModel(dims, dtype=jnp.bfloat16, quant_decoder=quant)
        dec = BeamDecoder(model, tok, DecodeOptions(
            max_new_tokens=args.steps, cross_kv_quant=quant,
            without_timestamps=without_ts,
            max_rows_per_dispatch=args.batch * beam),
            beam_size=beam, split_cache=split)
        dec._eot = dims.n_vocab + 1    # fixed-step: never latch EOT
        t0 = time.time()
        t, s = dec._beam_scan(variables, xa, prompt.shape[1], prompt)
        np.asarray(s)
        comp = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.time()
            t, s = dec._beam_scan(variables, xa, prompt.shape[1], prompt)
            np.asarray(s)
            times.append(time.time() - t0)
        dt = min(times)
        print(f"{tag}: compile+first {comp:.0f}s | {dt:.2f}s for "
              f"{args.steps} steps -> {dt / args.steps * 1e3:.2f} ms/step",
              flush=True)
        return dt

    for cfgname in args.configs.split(","):
        quant = cfgname == "int8"
        variables = quantize_whisper_decoder(vars_bf16) if quant \
            else vars_bf16
        for path in args.paths.split(","):
            if path == "no_ts":
                run_one(f"{cfgname}/split/no_ts", quant, variables, True,
                        without_ts=True)
            elif path == "K1":
                run_one(f"{cfgname}/split/K1", quant, variables, True,
                        beam=1)
            else:
                run_one(f"{cfgname}/{path}", quant, variables,
                        path == "split")
        if args.ablate:
            run_one(f"{cfgname}/split/no_ts", quant, variables, True,
                    without_ts=True)
            run_one(f"{cfgname}/split/K1", quant, variables, True,
                    beam=1)


if __name__ == "__main__":
    main()
