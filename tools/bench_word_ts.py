"""Word-timestamp (teacher-forced alignment + on-device DTW) stage bench.

Times find_word_timestamps_batch at serving shapes: B windows of 30 s
audio each, L text tokens per window, the 20-pair alignment-heads sidecar
selection (the shape bench_pipeline.py serves). Splits device time
(jitted TF pass + DTW, host-materialized) from the host post-processing
(token->word split, merge_punctuations) so the owner of the measured
~5 s/2880 s-batch word_ts stage is attributable.

    python tools/bench_word_ts.py [--model large-v3] [--batch 24]
           [--tokens 120] [--repeats 3]

Prints one JSON line to stdout, per-slice timings to stderr.
"""
import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--tokens", type=int, default=120,
                    help="text tokens per 30 s window (dev-set density)")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from notsofar_tpu.asr.decoding import find_word_timestamps_batch
    from notsofar_tpu.asr.tokenizer import load_tokenizer
    from notsofar_tpu.models.whisper import WHISPER_DIMS, WhisperModel

    dims = WHISPER_DIMS[args.model]
    model = WhisperModel(dims, dtype=jnp.bfloat16)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        model.init(jax.random.PRNGKey(0)))
    tok = load_tokenizer(args.model, dims.n_vocab)
    heads = [(l, h) for l in range(dims.n_text_layer - 8,
                                   dims.n_text_layer)
             for h in (1, dims.n_text_head // 2)][:20]

    rng = np.random.default_rng(0)
    B = args.batch
    xa = [jnp.asarray(rng.standard_normal((1, dims.n_audio_ctx,
                                           dims.n_audio_state)),
                      jnp.bfloat16) for _ in range(B)]
    # plausible text tokens (ascii range of the vocab)
    toks = [[int(t) for t in rng.integers(300, 20000, args.tokens)]
            for _ in range(B)]
    frames = [3000] * B

    def run():
        return find_word_timestamps_batch(
            model, variables, tok, xa, toks, frames,
            alignment_heads=heads)

    t0 = time.perf_counter()
    out = run()
    warm = time.perf_counter() - t0
    print(f"warmup (incl. compile): {warm:.2f}s", file=sys.stderr)

    times = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        out = run()
        dt = time.perf_counter() - t0
        times.append(dt)
        nw = sum(len(w) for w in out)
        print(f"run {r}: {dt * 1e3:.1f} ms  ({nw} words)", file=sys.stderr)

    med = sorted(times)[len(times) // 2]
    per_2880 = med * (96 / B)
    print(json.dumps({
        "metric": "word_ts_batch_ms", "value": round(med * 1e3, 1),
        "unit": "ms", "batch": B, "tokens": args.tokens,
        "s_per_2880s_batch": round(per_2880, 2)}))


if __name__ == "__main__":
    main()
