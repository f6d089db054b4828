"""Microbenchmark the word-diarization stage pieces on the real chip.

Times (a) the TitaNet multi-bucket embedding dispatch, (b) the batched
multi-scale affinity, (c) NMESC clustering — the same pieces
word_based_clustering_batch composes — on the bench pipeline's shapes
(8 sessions x 120 s x 3 streams, 2.4 words/s, 6 scales). Prints per-piece
seconds + achieved TFLOP/s for the embed so perf work targets the real
bound.

    python tools/bench_diar_stage.py [--sessions 8] [--seconds 120]
"""
import argparse
import math
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from notsofar_tpu.diarization.common import DiarizationCfg
    from notsofar_tpu.diarization.word_based import (
        collect_word_windows, extract_embeddings_bucketed,
        _cos_affinity_multiscale_device_batch)
    from notsofar_tpu.diarization.clustering import run_clustering_batch
    from notsofar_tpu.models.titanet import SpeakerEncoder, TitaNetConfig
    from notsofar_tpu.utils import flops as FL

    fs = 16000
    B, secs = args.sessions, args.seconds
    cfg = DiarizationCfg(method="word_nmesc",
                         min_embedding_windows=[3.0, 2.5, 2.0, 1.5, 1.0, 0.5])
    encoder = SpeakerEncoder(TitaNetConfig(), compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    words_per_sec = 2.4
    n_words = int(secs * words_per_sec)

    # one bank of 3 streams per session; same shapes as the pipeline
    all_words, all_windows = [], []
    banks = []
    ch_base = 0
    word_counts = []
    for si in range(B):
        rows = []
        step = secs / n_words
        for ci in range(3):
            wt = [[" a", round(t, 2), round(min(t + 0.3, secs), 2)]
                  for t in np.arange(0.0, secs, step)]
            rows.append(dict(word_timing=wt, wav_file_name_ind=ci))
        df = pd.DataFrame(rows)
        words, windows = collect_word_windows(
            df, secs, cfg.min_embedding_windows,
            cfg.max_allowed_word_duration)
        for w in words:
            w[3] += ch_base
        word_counts.append(len(words))
        all_words.extend(words)
        all_windows.extend(windows)
        banks.append((rng.randn(3, int(secs * fs)) * 0.1
                      ).astype(np.float32))
        ch_base += 3
    bank = jnp.asarray(np.concatenate(banks, axis=0))
    print(f"{len(all_words)} (word,scale-set) items, bank {bank.shape}",
          flush=True)

    scale_frames = [(-(-int((int(math.ceil(s * fs / 8192)) * 8192)
                            / 160 + 1) // 16)) * 16
                    for s in cfg.min_embedding_windows]
    emb_flops = len(all_words) * sum(FL.titanet_flops(f)
                                     for f in scale_frames)

    for it in range(args.repeats + 1):
        tag = "warmup" if it == 0 else f"run{it - 1}"
        t0 = time.time()
        emb = extract_embeddings_bucketed(encoder, bank, fs, all_words,
                                          all_windows)
        emb = jax.block_until_ready(emb)
        np.asarray(emb[0, 0, 0])     # force one readback through the tunnel
        t_embed = time.time() - t0

        t0 = time.time()
        groups = {}
        w0 = 0
        for si, n_w in enumerate(word_counts):
            groups.setdefault(n_w, []).append((si, w0))
            w0 += n_w
        affs = []
        for n_w, items in groups.items():
            stacked = jnp.stack([emb[w0:w0 + n_w] for _, w0 in items])
            batch_aff = _cos_affinity_multiscale_device_batch(stacked)
            for row in range(len(items)):
                affs.append(batch_aff[row])
        jax.block_until_ready(affs[-1])
        t_aff = time.time() - t0

        t0 = time.time()
        labels = run_clustering_batch(affs)
        t_clu = time.time() - t0
        n_spk = sorted(set(int(l) for lab in labels for l in lab))
        print(f"{tag}: embed {t_embed:.2f}s "
              f"({emb_flops / t_embed / 1e12:.1f} TFLOP/s) | "
              f"affinity {t_aff:.2f}s | cluster {t_clu:.2f}s | "
              f"labels {n_spk}", flush=True)


if __name__ == "__main__":
    main()
