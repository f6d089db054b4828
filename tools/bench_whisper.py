"""Whisper decode throughput benchmark (the README's ASR RTFx row).

Times the batched greedy decode loop on random weights of a named model —
identical FLOPs/memory traffic to serving a real checkpoint. Each
iteration processes B 30 s windows through the encoder plus a full
`max_new_tokens` decode scan (the worst case; real audio stops at EOT).

    python tools/bench_whisper.py [--model large-v3] [--batch 3]
           [--steps 224] [--dtype bfloat16] [--repeats 3]

Prints one JSON line {"metric": "whisper_decode_rtfx", ...} to stdout,
per-run timings to stderr.
"""
import argparse
import json
import sys
import time


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="large-v3")
    parser.add_argument("--batch", type=int, default=3,
                        help="streams per dispatch (3 = one CSS session)")
    parser.add_argument("--steps", type=int, default=224)
    parser.add_argument("--dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--repeats", type=int, default=3)
    args = parser.parse_args()

    sys.path.insert(0, ".")
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from notsofar_tpu.asr.decoding import DecodeOptions, GreedyDecoder
    from notsofar_tpu.asr.tokenizer import load_tokenizer
    from notsofar_tpu.models.whisper import WHISPER_DIMS, WhisperModel

    dims = WHISPER_DIMS[args.model]
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    print(f"device: {jax.devices()[0]}; {args.model} "
          f"({dims.n_text_layer}L/{dims.n_text_state}d), B={args.batch}, "
          f"{args.steps} steps, {args.dtype}", file=sys.stderr)
    model = WhisperModel(dims, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0))
    tok = load_tokenizer(args.model, dims.n_vocab)
    dec = GreedyDecoder(model, tok, DecodeOptions(max_new_tokens=args.steps))

    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(args.batch, dims.n_mels, 3000)
                      .astype(np.float32) * 0.1)
    audio_sec = args.batch * 30.0

    def run():
        xa = model.encode(variables, mel)
        res = dec.decode(variables, xa)
        jax.block_until_ready(res["avg_logprob"])

    t0 = time.time()
    run()
    print(f"warmup+compile: {time.time() - t0:.1f}s", file=sys.stderr)

    best = 0.0
    for i in range(args.repeats):
        t0 = time.time()
        run()
        dt = time.time() - t0
        rtfx = audio_sec / dt
        print(f"run: {dt:.2f}s -> {rtfx:.1f}x RT", file=sys.stderr)
        if i >= 1 and min(rtfx, best) > 0.95 * max(rtfx, best):
            best = max(best, rtfx)
            break
        best = max(best, rtfx)

    print(json.dumps({
        "metric": "whisper_decode_rtfx", "model": args.model,
        "batch": args.batch, "steps": args.steps, "dtype": args.dtype,
        "value": round(best, 2), "unit": "audio_sec/sec/chip"}))


if __name__ == "__main__":
    main()
