"""Word-based ('word_nmesc') diarization: multi-scale speaker embeddings per
ASR word + NMESC spectral clustering.

Rebuild of /root/reference/diarization/word_based_diarization.py:58-189 with
TPU-friendly batching: word windows are length-bucketed and padded into
fixed-shape batches before the speaker encoder (the reference pads each
32-word batch to its own max length, causing per-batch recompilation on
XLA; buckets keep the compile count bounded).

Semantics preserved:
* per word, one embedding per scale window in cfg.min_embedding_windows
  ([3.0, 2.5, 2.0, 1.5, 1.0, 0.5] s in the shipped config); windows are
  centered on words shorter than the scale, clamped to the stream extent,
  and taken from the word's own CSS stream;
* words longer than max_allowed_word_duration are dropped entirely;
* per-scale cosine affinity matrices are averaged, then NMESC + spectral
  clustering labels each word;
* the DDP dummy-word machinery (word_based_diarization.py:192-224) is
  unnecessary — inference is single-controller here.
"""
import math
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from notsofar_tpu.diarization.clustering import (cos_affinity_matrix,
                                                 run_clustering)
from notsofar_tpu.diarization.common import (DiarizationCfg,
                                             prepare_diarized_data_frame)
from notsofar_tpu.utils.audio import read_wav
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("word_based_diarization")

_ENCODER_CACHE = {}


def resolve_speaker_encoder(cfg: DiarizationCfg):
    """Load the speaker embedding model: a NeMo checkpoint named by
    cfg.embedding_model_name under NOTSOFAR_MODELS_DIR (or an absolute
    path), else a randomly-initialized encoder (pipeline-smoke mode,
    clearly logged)."""
    import os
    import jax.numpy as jnp
    from notsofar_tpu.models.titanet import SpeakerEncoder
    name = cfg.embedding_model_name
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        getattr(cfg, "embedding_compute_dtype", "float32")]
    key = (name, str(dtype))
    if key in _ENCODER_CACHE:
        return _ENCODER_CACHE[key]
    candidates = []
    if os.path.isabs(name):
        candidates.append(name)
    root = os.environ.get("NOTSOFAR_MODELS_DIR")
    if root:
        candidates += [os.path.join(root, f"{name}.nemo"),
                       os.path.join(root, name)]
    for cand in candidates:
        if os.path.exists(cand):
            _LOG.info(f"loading speaker encoder from {cand}")
            enc = SpeakerEncoder.from_checkpoint(cand, compute_dtype=dtype)
            _ENCODER_CACHE[key] = enc
            return enc
    _LOG.warning(f"speaker model '{name}' not found (set NOTSOFAR_MODELS_DIR"
                 ") — using RANDOM weights; labels will be arbitrary")
    _ENCODER_CACHE[key] = SpeakerEncoder(compute_dtype=dtype)
    return _ENCODER_CACHE[key]


def collect_word_windows(segments_df: pd.DataFrame, wav_duration: float,
                         min_embedding_windows: List[float],
                         max_allowed_word_duration: float = 3.0
                         ) -> Tuple[List[list], List[List[Tuple[float, float]]]]:
    """Returns (words, per-word scale windows). Word entries are
    [text, start, end, channel_id]; windows are (t0, t1) per scale."""
    words, windows = [], []
    too_long = 0
    for _, seg in segments_df.iterrows():
        channel_id = seg.wav_file_name_ind
        for word in seg["word_timing"]:
            start, end = word[1], word[2]
            duration = end - start
            if duration > max_allowed_word_duration:
                _LOG.info(f"word '{word[0]}' has unreasonably long duration "
                          f"({start}s, {end}s). Skip it in diarization")
                too_long += 1
                continue
            center = 0.5 * (start + end)
            scales = []
            for win in min_embedding_windows:
                if duration < win:
                    t0 = max(0.0, center - win / 2)
                    t1 = min(wav_duration, center + win / 2)
                else:
                    t0, t1 = start, end
                scales.append((t0, t1))
            words.append([word[0], start, end, channel_id])
            windows.append(scales)
    if too_long:
        _LOG.info(f"dropped {too_long} over-long words")
    return words, windows


def extract_embeddings_bucketed(encoder, wavs: np.ndarray, sr: int,
                                words: List[list],
                                windows: List[List[Tuple[float, float]]],
                                batch_size: int = 256) -> np.ndarray:
    """Embed every (word, scale) window. Returns [n_words, n_scales, D].

    Windows are bucketed by padded length (powers-of-two samples) so the
    jitted encoder compiles once per bucket. The session audio is shipped
    to the device ONCE and windows are gathered there (embed_windows):
    host-assembling the ~6 overlapping scale windows per word would
    re-transfer each audio sample ~250x — GBs per hour of audio, which
    dominated the diarization stage over a device tunnel. Encoders without
    the embed_windows entry (test doubles) fall back to host assembly.
    """
    n_scales = len(windows[0]) if windows else 0
    tasks = []  # (word_idx, scale_idx, channel, start_sample, length)
    for wi, scales in enumerate(windows):
        ch = words[wi][3]
        for si, (t0, t1) in enumerate(scales):
            s0, s1 = int(t0 * sr), int(t1 * sr)
            s1 = min(s1, wavs.shape[1])
            tasks.append((wi, si, ch, s0, max(s1 - s0, 1)))

    # bucket to 0.512 s multiples: the shipped scales are 0.5-3.0 s, so
    # power-of-two sample buckets padded windows by up to ~60% (a 2.0 s
    # window paid 4.1 s of encoder frames); multiples keep the compile
    # count at one per scale with <=0.5 s padding
    def bucket_len(n):
        return int(math.ceil(max(n, 1) / 8192) * 8192)

    buckets = {}
    for t in tasks:
        buckets.setdefault(bucket_len(t[4]), []).append(t)

    device_gather = hasattr(encoder, "embed_windows")
    if device_gather:
        import jax
        import jax.numpy as jnp
        max_blen = max(buckets) if buckets else 256
        # pad the session length to a power-of-two bucket as well, so the
        # per-(session_len, blen) jit cache stays small across meetings
        L = wavs.shape[1]
        L_pad = 1 << max(int(math.ceil(math.log2(max(L, 1)))), 8)
        if isinstance(wavs, np.ndarray):
            sess = np.zeros((wavs.shape[0], L_pad + max_blen), np.float32)
            sess[:, :L] = wavs
            sess_dev = jax.device_put(sess)
        else:   # already device-resident (e.g. CSS outputs) — pad there
            sess_dev = jnp.pad(wavs.astype(jnp.float32),
                               ((0, 0), (0, L_pad + max_blen - L)))

    D = encoder.cfg.emb_dim if hasattr(encoder, "cfg") else None
    if device_gather:
        # embeddings accumulate ON DEVICE (one scatter at the end): the
        # clustering chain consumes them there, so no embedding matrix
        # crosses the host link. ONE dispatch per length bucket — the
        # chunk loop lives inside the jit (lax.map), because per-dispatch
        # latency over the host link dominated this stage
        specs, w_idx, s_idx, keep = [], [], [], []
        offset = 0
        for blen, items in sorted(buckets.items()):
            # chunk count rounds UP the {1, 1.5} x 2^k ladder: at most two
            # compiles per octave across sessions (the persistent cache
            # keeps them), and row padding <= 33% — the old power-of-two
            # rounding padded the embed load up to 2x (13776 real windows
            # ran as 24576 rows in the r3 bench)
            need = max(math.ceil(len(items) / batch_size), 1)
            n_chunks = 1
            while n_chunks < need:
                n_chunks *= 2
            if n_chunks > 2 and need <= 3 * n_chunks // 4:
                n_chunks = 3 * n_chunks // 4
            M = n_chunks * batch_size
            chans = np.zeros(M, np.int32)
            starts = np.zeros(M, np.int32)
            lengths = np.ones(M, np.int32)
            for j, (wi, si, ch, s0, ln) in enumerate(items):
                chans[j], starts[j] = ch, s0
                lengths[j] = min(ln, blen)
                w_idx.append(wi)
                s_idx.append(si)
            keep.extend(range(offset, offset + len(items)))
            offset += M
            specs.append((chans, starts, lengths, blen))
        if not specs:
            return np.zeros((0, n_scales, D or 192), np.float32)
        if hasattr(encoder, "embed_windows_multi"):
            # every bucket in ONE dispatch
            emb_all = encoder.embed_windows_multi(
                sess_dev, specs, inner_bs=batch_size)[np.asarray(keep)]
        else:
            parts = [encoder.embed_windows(sess_dev, c, s, b, ln,
                                           inner_bs=batch_size)
                     for c, s, ln, b in specs]
            emb_all = jnp.concatenate(parts, axis=0)[np.asarray(keep)]
        out = jnp.zeros((len(words), n_scales, emb_all.shape[-1]),
                        jnp.float32)
        return out.at[np.asarray(w_idx), np.asarray(s_idx)].set(emb_all)

    out = None
    for blen, items in sorted(buckets.items()):
        for i in range(0, len(items), batch_size):
            chunk = items[i:i + batch_size]
            batch = np.zeros((batch_size, blen), np.float32)
            lengths = np.ones(batch_size, np.int32)
            for j, (wi, si, ch, s0, ln) in enumerate(chunk):
                ln = min(ln, blen)
                batch[j, :ln] = wavs[ch, s0:s0 + ln]
                lengths[j] = ln
            emb = np.asarray(encoder.embed(batch, lengths))
            if out is None:
                D = emb.shape[-1]
                out = np.zeros((len(words), n_scales, D), np.float32)
            for j, (wi, si, ch, s0, ln) in enumerate(chunk):
                out[wi, si] = emb[j]
    if out is None:
        out = np.zeros((0, n_scales, D or 192), np.float32)
    return out


def word_based_clustering_batch(sessions: List[dict], cfg: DiarizationCfg,
                                encoder=None) -> List[pd.DataFrame]:
    """word_based_clustering over MANY sessions with ONE shared
    speaker-embedding pass.

    sessions: list of dicts with keys `wav_files` (list of paths),
    `segments_df`, and optionally `session_wavs` ([n_streams, L] np or
    device array) + `sr`. All sessions' (word, scale) windows merge into
    a combined channel bank, so the embedding stage costs a handful of
    bucket dispatches TOTAL instead of per session — per-dispatch latency
    on the host link made serial per-session embedding the diarization
    floor. Clustering then runs per session (NeMo semantics are strictly
    per-session). Returns the diarized dataframes in order."""
    import os
    import time
    dbg = os.environ.get("NOTSOFAR_DIAR_DEBUG")
    marks = [("start", time.time())]

    def mark(name, sync=None):
        if dbg and sync is not None:
            import jax
            jax.block_until_ready(sync)
        marks.append((name, time.time()))

    if encoder is None:
        encoder = resolve_speaker_encoder(cfg)
    srs = [s.get("sr", 16000) for s in sessions]
    assert len(set(srs)) <= 1, "mixed sample rates in one diar batch"
    sr = srs[0] if srs else 16000

    banks, metas = [], []
    ch_base = 0
    all_words: List[list] = []
    all_windows: List[List[Tuple[float, float]]] = []
    for sess in sessions:
        wavs = sess.get("session_wavs")
        if wavs is None:
            srs_wavs = [read_wav(f, normalize=True, return_rate=True)
                        for f in sess["wav_files"]]
            wav_list = [w if w.ndim == 1 else w[0] for _, w in srs_wavs]
            max_len = max(w.size for w in wav_list)
            wavs = np.stack([np.pad(w, (0, max_len - w.size))
                             for w in wav_list])
        dur = wavs.shape[1] / sr
        words, windows = collect_word_windows(
            sess["segments_df"], dur, cfg.min_embedding_windows,
            cfg.max_allowed_word_duration)
        for w in words:
            w[3] += ch_base
        metas.append((len(all_words), len(words), sess["segments_df"],
                      ch_base))
        all_words.extend(words)
        all_windows.extend(windows)
        banks.append(wavs)
        ch_base += wavs.shape[0]

    outs: List[Optional[pd.DataFrame]] = [None] * len(sessions)
    if not all_words:
        for i, (_, _, df, _) in enumerate(metas):
            out = df.copy()
            out["speaker_id"] = "spk0"
            outs[i] = out
        return outs

    L_max = max(b.shape[1] for b in banks)
    any_dev = any(not isinstance(b, np.ndarray) for b in banks)
    if any_dev:
        import jax.numpy as jnp
        rows = [b if isinstance(b, np.ndarray) is False else jnp.asarray(b)
                for b in banks]
        bank = jnp.concatenate(
            [jnp.pad(r.astype(jnp.float32),
                     ((0, 0), (0, L_max - r.shape[1]))) for r in rows],
            axis=0)
    else:
        bank = np.concatenate(
            [np.pad(b.astype(np.float32),
                    ((0, 0), (0, L_max - b.shape[1]))) for b in banks],
            axis=0)

    mark("collect+bank")
    emb = extract_embeddings_bucketed(encoder, bank, sr, all_words,
                                      all_windows)
    mark("embed", sync=emb)

    # affinities: sessions with equal word counts batch into ONE device
    # dispatch (per-dispatch latency on the host link made 8 per-session
    # calls cost ~10 s); the clustering batch then syncs ONCE for all
    # sessions' stats and once for all labels
    from notsofar_tpu.diarization.clustering import run_clustering_batch
    affs, aff_idx = [], []
    if not isinstance(emb, np.ndarray):
        groups: dict = {}
        for i, (w0, n_w, df, base) in enumerate(metas):
            if n_w:
                groups.setdefault(n_w, []).append((i, w0))
        import jax.numpy as jnp
        for n_w, items in groups.items():
            stacked = jnp.stack([emb[w0:w0 + n_w] for _, w0 in items])
            batch_aff = _cos_affinity_multiscale_device_batch(stacked)
            for row, (i, _) in enumerate(items):
                affs.append(batch_aff[row])
                aff_idx.append(i)
        order = np.argsort(aff_idx)
        affs = [affs[o] for o in order]
        aff_idx = [aff_idx[o] for o in order]
    else:
        for i, (w0, n_w, df, base) in enumerate(metas):
            if n_w == 0:
                continue
            n_scales = emb.shape[1]
            emb_s = emb[w0:w0 + n_w]
            affs.append(np.mean([cos_affinity_matrix(emb_s[:, s])
                                 for s in range(n_scales)], axis=0))
            aff_idx.append(i)
    mark("affinity", sync=affs[-1] if affs else None)
    all_labels = run_clustering_batch(affs)
    mark("cluster")
    labels_by_session = dict(zip(aff_idx, all_labels))

    for i, (w0, n_w, df, base) in enumerate(metas):
        if n_w == 0:
            out = df.copy()
            out["speaker_id"] = "spk0"
            outs[i] = out
            continue
        labels = labels_by_session[i]
        # undo the bank channel offset: the attributed frame indexes the
        # session's own wav_file_name categories
        sess_words = [[w[0], w[1], w[2], w[3] - base, f"spk{int(l)}"]
                      for w, l in zip(all_words[w0:w0 + n_w], labels)]
        outs[i] = prepare_diarized_data_frame(sess_words, df,
                                              cfg.apply_deduplication)
    mark("df")
    if dbg:
        import sys
        spans = {b: round(tb - ta, 2) for (_, ta), (b, tb)
                 in zip(marks, marks[1:])}
        print(f"diar batch phases: {spans}", file=sys.stderr, flush=True)
    return outs


def _cos_affinity_multiscale_device_batch(emb):
    """Batched _cos_affinity_multiscale_device: emb [B, N, S, D] ->
    [B, N, N] in one dispatch."""
    import jax

    @jax.jit
    def run(e):
        return jax.vmap(_affinity_core)(e)

    return run(emb)


def _affinity_core(e):
    """Traceable scale-averaged min-max cosine affinity: [N, S, D] ->
    [N, N], mirroring cos_affinity_matrix per scale."""
    import jax.numpy as jnp
    e = jnp.moveaxis(e, 1, 0)                       # [S, N, D]
    norm = jnp.linalg.norm(e, axis=2, keepdims=True) + 1e-12
    u = e / norm
    sim = jnp.einsum("snd,smd->snm", u, u)
    N = sim.shape[-1]
    eye = jnp.eye(N, dtype=sim.dtype)
    sim = sim * (1 - eye)[None] + eye[None]
    lo = sim.min(axis=(1, 2), keepdims=True)
    hi = sim.max(axis=(1, 2), keepdims=True)
    scaled = jnp.where(hi - lo < 1e-12, jnp.ones_like(sim),
                       (sim - lo) / jnp.maximum(hi - lo, 1e-12))
    return jnp.nan_to_num(scaled.mean(axis=0))


def _cos_affinity_multiscale_device(emb):
    """Scale-averaged min-max-scaled cosine affinity, mirroring
    cos_affinity_matrix per scale, on device (f32): emb [N, S, D] ->
    [N, N] (nan_to_num hygiene mirrors the host path: one NaN embedding
    would otherwise zero the whole graph). Feeds the device clustering
    chain without a host round trip."""
    import jax

    @jax.jit
    def run(e):
        return _affinity_core(e)

    return run(emb)


def word_based_clustering(audio_files: list, segments_df: pd.DataFrame,
                          cfg: DiarizationCfg,
                          encoder=None, session_wavs=None,
                          sr: int = 16000) -> pd.DataFrame:
    """ASR words -> speaker labels via multi-scale NMESC clustering.

    Contract parity with word_based_clustering
    (word_based_diarization.py:135-189).

    session_wavs: optional [n_streams, L] audio (np OR device jnp array,
    stream order matching wav_file_name_ind) — skips re-reading and
    re-uploading the CSS streams when the caller kept them resident
    (titanet embedding windows gather on device either way; absolute
    scale cancels in the per-feature mel normalization).
    """
    from notsofar_tpu.utils.profiling import StageTimer
    timer = StageTimer()
    word_based_clustering.last_phase_timer = timer
    with timer.stage("read_wav"):
        if session_wavs is not None:
            wavs = session_wavs
        else:
            srs_wavs = [read_wav(f, normalize=True, return_rate=True)
                        for f in audio_files]
            sr = srs_wavs[0][0]
            wav_list = [w if w.ndim == 1 else w[0] for _, w in srs_wavs]
            max_len = max(w.size for w in wav_list)
            wavs = np.stack([np.pad(w, (0, max_len - w.size))
                             for w in wav_list])

    if encoder is None:
        encoder = resolve_speaker_encoder(cfg)

    wav_duration = wavs.shape[1] / sr
    words, windows = collect_word_windows(
        segments_df, wav_duration, cfg.min_embedding_windows,
        cfg.max_allowed_word_duration)
    if not words:
        df = segments_df.copy()
        df["speaker_id"] = "spk0"
        return df

    with timer.stage("embed"):
        emb = extract_embeddings_bucketed(encoder, wavs, sr, words, windows)

    with timer.stage("affinity"):
        if isinstance(emb, np.ndarray):
            n_scales = emb.shape[1]
            affinity = np.mean([cos_affinity_matrix(emb[:, s])
                                for s in range(n_scales)], axis=0)
        else:   # device-resident embeddings -> device affinity
            affinity = _cos_affinity_multiscale_device(emb)
    with timer.stage("clustering"):
        labels = run_clustering(affinity)

    with timer.stage("df"):
        all_words = [w + [f"spk{int(l)}"] for w, l in zip(words, labels)]
        return prepare_diarized_data_frame(all_words, segments_df,
                                           cfg.apply_deduplication)
