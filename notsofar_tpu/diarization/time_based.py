"""Time-based ('nmesc') diarization: VAD + sliding-window speaker
clustering, without ASR word boundaries.

The reference shells out to NeMo's ClusteringDiarizer/NeuralDiarizer
recipes (time_based_diarization.py:20-117); this is a native equivalent
pipeline with the same outputs:

1. the CSS streams are concatenated on the time axis (the reference feeds
   NeMo one manifest per stream and concatenates the RTTM timeline);
2. speech regions come from an energy VAD (MarbleNet equivalent slot —
   pluggable `vad_fn`);
3. 1.5 s / 0.75 s sliding windows over speech are embedded with the
   speaker encoder and clustered with NMESC + spectral clustering;
4. the result becomes a per-channel frame-level speaker-VAD tensor
   [C, S, T] at 10 ms resolution — identical contract to
   run_nemo_diarization (time_based_diarization.py:80-117);
5. each ASR word is assigned the most active speaker in its span, with
   nearest-word fallback (parity with assign_words_to_speakers,
   time_based_diarization.py:120-160).
"""
from typing import Callable, List, Optional

import numpy as np
import pandas as pd

from notsofar_tpu.diarization.clustering import (cos_affinity_matrix,
                                                 run_clustering)
from notsofar_tpu.diarization.common import (DiarizationCfg,
                                             prepare_diarized_data_frame)
from notsofar_tpu.diarization.recipes import (DiarRecipe, binarize_vad_probs,
                                              resolve_recipe)
from notsofar_tpu.utils.audio import read_wav
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("time_based_diarization")

VAD_TIME_RESOLUTION = 0.01  # 10 ms frames, matching the reference

# Which VAD actually ran in the last diarize_streams call ('marblenet' or
# 'energy') — surfaced so e2e validators can report silent fallbacks
# (round-4 order: the energy-VAD substitution must be loud).
LAST_VAD_USED: dict = {"kind": None}


def energy_vad(wav: np.ndarray, sr: int, frame_sec: float = 0.01,
               threshold_db: float = -40.0) -> np.ndarray:
    """Boolean speech mask at 10 ms resolution (simple energy gate;
    stands in for MarbleNet)."""
    frame = int(frame_sec * sr)
    n = len(wav) // frame
    x = wav[:n * frame].reshape(n, frame)
    rms = np.sqrt((x ** 2).mean(axis=1) + 1e-12)
    peak = rms.max() + 1e-12
    db = 20 * np.log10(rms / peak + 1e-12)
    return db > threshold_db


# an explicitly passed energy_vad reports the same label as the implicit
# fallback (vad_fn=None), not "custom"
energy_vad.vad_kind = "energy"


def _embed_windows(concat: np.ndarray, sr: int, encoder,
                   starts: List[int], win: int) -> np.ndarray:
    """Batched speaker embeddings for fixed-length windows of `concat`."""
    batch = np.zeros((len(starts), win), np.float32)
    lengths = np.full(len(starts), win, np.int32)
    for i, s0 in enumerate(starts):
        seg = concat[s0:s0 + win]
        batch[i, :len(seg)] = seg
        lengths[i] = max(len(seg), 1)
    embs = []
    bs = 64
    for i in range(0, len(starts), bs):
        chunk = batch[i:i + bs]
        ln = lengths[i:i + bs]
        if len(chunk) < bs:
            chunk = np.pad(chunk, ((0, bs - len(chunk)), (0, 0)))
            ln = np.pad(ln, (0, bs - len(ln)), constant_values=1)
        embs.append(encoder.embed(chunk, ln)[:min(bs, len(starts) - i)])
    return np.concatenate(embs, axis=0)


# NeMo diar_msdd_telephonic multiscale setup (window, shift) in seconds.
# Kept as the no-recipe default; configs/inference/diarization/*.yaml
# carry the full ladders (telephonic.yaml mirrors these values).
MSDD_SCALES = [1.5, 1.25, 1.0, 0.75, 0.5]
MSDD_HOPS = [0.75, 0.625, 0.5, 0.375, 0.25]


def msdd_refine(concat: np.ndarray, sr: int, encoder, msdd,
                cluster_starts: List[int], cluster_labels: np.ndarray,
                vad: np.ndarray, n_spk: int,
                threshold: float = 0.7, chunk: int = 256,
                scales: Optional[List[float]] = None,
                hops: Optional[List[float]] = None,
                cluster_win_sec: float = 1.5) -> np.ndarray:
    """Overlap-aware refinement of a clustering initialization.

    Port of NeMo's NeuralDiarizer flow (time_based_diarization.py:20-117
    runs it via `diar_msdd_telephonic`): embed the session at K scales,
    map every base-scale (finest) segment to its nearest coarser-scale
    segment to build ms_emb_seq, average cluster embeddings per scale from
    the initial labels, score every speaker pair with the MSDD and average
    each speaker's sigmoid over its pairs. Returns a speaker-activity
    matrix [S, total_frames] at 10 ms resolution (multi-label: overlapped
    frames can be active for several speakers).
    """
    scales = scales if scales is not None else MSDD_SCALES
    hops = hops if hops is not None else MSDD_HOPS
    total = len(concat)
    scale_data = []   # (starts, centers, embs) per scale, base last
    for w_sec, h_sec in zip(scales, hops):
        win, hop = int(w_sec * sr), int(h_sec * sr)
        starts = []
        for s0 in range(0, max(total - win, 1), hop):
            f0 = int(s0 / sr / VAD_TIME_RESOLUTION)
            f1 = int((s0 + win) / sr / VAD_TIME_RESOLUTION)
            if vad[f0:f1].mean() > 0.3:
                starts.append(s0)
        if not starts:
            starts = [0]
        emb = _embed_windows(concat, sr, encoder, starts, win)
        centers = np.asarray(starts) + win / 2
        scale_data.append((starts, centers, emb))

    base_starts, base_centers, _ = scale_data[-1]
    T = len(base_starts)
    K = len(scales)
    D = scale_data[-1][2].shape[1]
    ms_emb_seq = np.zeros((T, K, D), np.float32)
    for k, (_, centers, emb) in enumerate(scale_data):
        idx = np.abs(base_centers[:, None] - centers[None, :]).argmin(axis=1)
        ms_emb_seq[:, k, :] = emb[idx]

    # initial label per base segment: nearest clustering window
    c_centers = np.asarray(cluster_starts) + int(cluster_win_sec * sr) / 2
    base_lab = cluster_labels[
        np.abs(base_centers[:, None] - c_centers[None, :]).argmin(axis=1)]

    ms_avg = np.zeros((K, D, n_spk), np.float32)
    for s in range(n_spk):
        sel = ms_emb_seq[base_lab == s]
        if len(sel):
            ms_avg[:, :, s] = sel.mean(axis=0)

    # score speaker pairs (NeMo runs S=2 pairs and averages per speaker)
    pair_probs = np.zeros((T, n_spk), np.float32)
    pair_counts = np.zeros(n_spk, np.float32)
    pairs = [(i, j) for i in range(n_spk) for j in range(i + 1, n_spk)]
    n_chunks = int(np.ceil(T / chunk))
    seq = np.zeros((n_chunks, chunk, K, D), np.float32)
    for ci in range(n_chunks):
        seg = ms_emb_seq[ci * chunk:(ci + 1) * chunk]
        seq[ci, :len(seg)] = seg
    for i, j in pairs:
        avg = np.repeat(ms_avg[None, :, :, [i, j]], n_chunks, axis=0)
        probs = msdd.refine(seq, avg)                   # [n_chunks, chunk, 2]
        probs = probs.reshape(n_chunks * chunk, 2)[:T]
        pair_probs[:, i] += probs[:, 0]
        pair_probs[:, j] += probs[:, 1]
        pair_counts[i] += 1
        pair_counts[j] += 1
    pair_probs /= np.maximum(pair_counts[None, :], 1)

    total_frames = int(np.ceil(total / sr / VAD_TIME_RESOLUTION))
    spk_vad = np.zeros((n_spk, total_frames))
    win_b = int(scales[-1] * sr)
    active = pair_probs > threshold
    # guarantee the argmax speaker stays active (NeMo keeps the clustering
    # speaker when the sigmoid is under threshold everywhere)
    active[np.arange(T), pair_probs.argmax(axis=1)] = True
    for t, s0 in enumerate(base_starts):
        f0 = int(round(s0 / sr / VAD_TIME_RESOLUTION))
        f1 = int(round((s0 + win_b) / sr / VAD_TIME_RESOLUTION))
        for s in range(n_spk):
            if active[t, s]:
                spk_vad[s, f0:f1] = 1
    spk_vad[:, :len(vad)] *= vad[None, :total_frames]
    return spk_vad


def _speech_window_starts(vad: np.ndarray, total: int, sr: int,
                          win: int, hop: int) -> List[int]:
    """Window start samples whose span is >30% speech (NeMo-style gating
    of embedding windows to VAD regions)."""
    starts = []
    for s0 in range(0, max(total - win, 1), hop):
        f0 = int(s0 / sr / VAD_TIME_RESOLUTION)
        f1 = int((s0 + win) / sr / VAD_TIME_RESOLUTION)
        if vad[f0:f1].mean() > 0.3:
            starts.append(s0)
    return starts or [0]


def diarize_streams(wavs: List[np.ndarray], sr: int, encoder,
                    window_sec: float = 1.5, hop_sec: float = 0.75,
                    vad_fn: Optional[Callable] = None,
                    max_num_speakers: int = 8,
                    msdd=None, msdd_threshold: Optional[float] = None,
                    recipe: Optional[DiarRecipe] = None) -> np.ndarray:
    """Concatenated-stream clustering -> [C, S, T] speaker-VAD tensor.

    msdd: optional OverlapDecoder — when given, the clustering
    initialization is refined into overlap-aware per-speaker activity
    (the reference's `nmesc_msdd` NeuralDiarizer mode).

    recipe: optional DiarRecipe (configs/inference/diarization/*.yaml).
    When given, the clustering affinity is the weighted multiscale average
    over the recipe's (window, shift) ladder with the finest scale as the
    labeled base segments — NeMo ClusteringDiarizer semantics
    (time_based_diarization.py:53-66 picks the recipe per method) — and
    clustering/MSDD hyperparameters come from the recipe. Without a recipe
    the legacy single-scale 1.5 s / 0.75 s behavior is kept.
    """
    # only make_recipe_vad-wrapped functions carry vad_kind="marblenet";
    # an explicitly passed custom vad must not masquerade as it (the
    # e2e validators key the loud-fallback report off this label)
    LAST_VAD_USED["kind"] = ("energy" if vad_fn is None
                             else getattr(vad_fn, "vad_kind", "custom"))
    vad_fn = vad_fn or energy_vad
    concat = np.concatenate(wavs)
    channel_len = max(len(w) for w in wavs)
    vad = np.concatenate([
        np.pad(vad_fn(w, sr), (0, max(0, int(len(w) / sr / VAD_TIME_RESOLUTION)
                                      - len(vad_fn(w, sr))))) for w in wavs])

    total = len(concat)
    if recipe is not None:
        max_num_speakers = recipe.clustering.max_num_speakers
        scale_wins = recipe.speaker_embeddings.window_length_in_sec
        scale_hops = recipe.speaker_embeddings.shift_length_in_sec
        weights = np.asarray(recipe.speaker_embeddings.multiscale_weights,
                             np.float64)
        # base scale (labeled units) = finest = last entry, as in NeMo
        base_win = int(scale_wins[-1] * sr)
        base_hop = int(scale_hops[-1] * sr)
        starts = _speech_window_starts(vad, total, sr, base_win, base_hop)
        base_centers = np.asarray(starts) + base_win / 2
        aff = None
        for k, (w_sec, h_sec) in enumerate(zip(scale_wins, scale_hops)):
            win_k, hop_k = int(w_sec * sr), int(h_sec * sr)
            if k == len(scale_wins) - 1:
                starts_k, emb_k = starts, _embed_windows(
                    concat, sr, encoder, starts, win_k)
            else:
                starts_k = _speech_window_starts(vad, total, sr, win_k, hop_k)
                emb_k = _embed_windows(concat, sr, encoder, starts_k, win_k)
            centers_k = np.asarray(starts_k) + win_k / 2
            idx = np.abs(base_centers[:, None]
                         - centers_k[None, :]).argmin(axis=1)
            aff_k = cos_affinity_matrix(emb_k[idx]) * weights[k]
            aff = aff_k if aff is None else aff + aff_k
        aff /= weights.sum()
        labels = run_clustering(
            aff, max_num_speakers=max_num_speakers,
            max_rp_threshold=recipe.clustering.max_rp_threshold,
            sparse_search_volume=recipe.clustering.sparse_search_volume)
        win = base_win
        if msdd_threshold is None:
            msdd_threshold = recipe.msdd.sigmoid_threshold[0]
    else:
        win = int(window_sec * sr)
        hop = int(hop_sec * sr)
        starts = _speech_window_starts(vad, total, sr, win, hop)
        emb = _embed_windows(concat, sr, encoder, starts, win)
        labels = run_clustering(cos_affinity_matrix(emb),
                                max_num_speakers=max_num_speakers)
    if msdd_threshold is None:
        msdd_threshold = 0.7
    n_spk = int(labels.max()) + 1 if len(labels) else 1

    total_frames = int(np.ceil(total / sr / VAD_TIME_RESOLUTION))
    if msdd is not None and n_spk >= 2:
        spk_vad = msdd_refine(
            concat, sr, encoder, msdd, starts, labels, vad, n_spk,
            threshold=msdd_threshold,
            scales=(recipe.speaker_embeddings.window_length_in_sec
                    if recipe is not None else None),
            hops=(recipe.speaker_embeddings.shift_length_in_sec
                  if recipe is not None else None),
            cluster_win_sec=win / sr)
    else:
        spk_vad = np.zeros((n_spk, total_frames))
        for s0, lab in zip(starts, labels):
            f0 = int(round(s0 / sr / VAD_TIME_RESOLUTION))
            f1 = int(round((s0 + win) / sr / VAD_TIME_RESOLUTION))
            spk_vad[int(lab), f0:f1] = 1
        # restrict to speech frames
        spk_vad[:, :len(vad)] *= vad[None, :total_frames]

    # split the global timeline back into per-channel tensors
    C = len(wavs)
    chan_frames = int(np.ceil(channel_len / sr / VAD_TIME_RESOLUTION))
    out = np.zeros((C, n_spk, chan_frames))
    offset = 0
    for c, w in enumerate(wavs):
        nf = int(np.ceil(len(w) / sr / VAD_TIME_RESOLUTION))
        seg = spk_vad[:, offset:offset + nf]
        out[c, :, :seg.shape[1]] = seg
        offset += nf
    return out


def assign_words_to_speakers(segments_df: pd.DataFrame, spk_vad: np.ndarray,
                             apply_deduplication: bool,
                             vad_time_resolution: float = VAD_TIME_RESOLUTION
                             ) -> pd.DataFrame:
    """Most-active-speaker-per-word assignment with nearest-word fallback.
    Parity with time_based_diarization.py:120-160."""
    has_unassigned = False
    all_words = []
    for _, seg in segments_df.iterrows():
        channel_id = seg.wav_file_name_ind
        for word in seg["word_timing"]:
            f0 = int(np.round(word[1] / vad_time_resolution))
            f1 = max(f0 + 1, int(np.round(word[2] / vad_time_resolution)))
            counts = spk_vad[channel_id][:, f0:f1]
            avg = counts.mean(axis=1) if counts.size else np.zeros(
                spk_vad.shape[1])
            if avg.sum() == 0:
                all_words.append(word + [channel_id, None])
                has_unassigned = True
            else:
                all_words.append(word + [channel_id, f"spk{int(np.argmax(avg))}"])

    if has_unassigned:
        mids = [np.mean(w[1:3]) for w in all_words if w[-1] is not None]
        spks = [w[-1] for w in all_words if w[-1] is not None]
        for w in all_words:
            if w[-1] is None:
                if not mids:
                    w[-1] = "spk0"
                    continue
                t = np.mean(w[1:3])
                j = int(np.argmin(np.abs(np.asarray(mids) - t)))
                w[-1] = spks[j]
    return prepare_diarized_data_frame(all_words, segments_df,
                                       apply_deduplication)


_VAD_CACHE: dict = {}


def resolve_frame_vad(cfg: DiarizationCfg) -> Optional[Callable]:
    """Load the MarbleNet frame VAD named by cfg.vad_model_name under
    NOTSOFAR_MODELS_DIR (or an absolute path). Returns None when no
    checkpoint is mounted — diarize_streams then falls back to the energy
    VAD (the reference's recipe loads NeMo's vad_multilingual_marblenet,
    time_based_diarization.py:20-117)."""
    import os
    name = cfg.vad_model_name
    if not name:
        return None
    if name in _VAD_CACHE:
        return _VAD_CACHE[name]
    candidates = []
    if os.path.isabs(name):
        candidates.append(name)
    root = os.environ.get("NOTSOFAR_MODELS_DIR")
    if root:
        candidates += [os.path.join(root, f"{name}.nemo"),
                       os.path.join(root, name)]
    for cand in candidates:
        if os.path.exists(cand):
            from notsofar_tpu.models.marblenet import FrameVAD
            _LOG.info(f"loading frame VAD from {cand}")
            _VAD_CACHE[name] = FrameVAD.from_checkpoint(cand)
            return _VAD_CACHE[name]
    _LOG.warning(
        f"VAD model '{name}' is NOT mounted — substituting the energy VAD. "
        "Diarization output will differ from the MarbleNet recipe; mount "
        f"{name}.nemo under NOTSOFAR_MODELS_DIR for parity "
        "(tools/validate_real_weights.py reports which VAD ran).")
    _VAD_CACHE[name] = None
    return None


def make_recipe_vad(frame_vad, recipe: DiarRecipe) -> Callable:
    """Wrap a FrameVAD so its frame probabilities go through the recipe's
    NeMo-parity binarization (onset/offset hysteresis, padding,
    min-duration filtering) instead of a plain threshold."""
    def vad(wav: np.ndarray, sr: int) -> np.ndarray:
        assert sr == 16000, "resample to 16 kHz before VAD"
        w = np.asarray(wav, np.float32)[None]
        probs = frame_vad.frame_probs(w, np.asarray([w.shape[1]]))[0]
        n = w.shape[1] // 160
        return binarize_vad_probs(probs[:n], recipe.vad)
    vad.vad_kind = "marblenet"
    return vad


_MSDD_CACHE: dict = {}


def resolve_overlap_decoder(cfg: DiarizationCfg):
    """Load the MSDD named by cfg.msdd_model_name under NOTSOFAR_MODELS_DIR
    (or an absolute path). Returns None when no checkpoint is mounted —
    `nmesc_msdd` then degrades to the plain clustering recipe with a log
    (the reference's NeuralDiarizer pulls diar_msdd_telephonic from NGC,
    time_based_diarization.py:20-117)."""
    import os
    name = cfg.msdd_model_name
    if not name:
        return None
    if name in _MSDD_CACHE:
        return _MSDD_CACHE[name]
    candidates = []
    if os.path.isabs(name):
        candidates.append(name)
    root = os.environ.get("NOTSOFAR_MODELS_DIR")
    if root:
        candidates += [os.path.join(root, f"{name}.nemo"),
                       os.path.join(root, name)]
    for cand in candidates:
        if os.path.exists(cand):
            from notsofar_tpu.models.msdd import OverlapDecoder
            _LOG.info(f"loading MSDD from {cand}")
            _MSDD_CACHE[name] = OverlapDecoder.from_checkpoint(cand)
            return _MSDD_CACHE[name]
    _LOG.info(f"MSDD model '{name}' not mounted — falling back to plain "
              "nmesc clustering")
    _MSDD_CACHE[name] = None
    return None


def time_based_diarization(wav_files_sorted, segments_df: pd.DataFrame,
                           output_dir: str, cfg: DiarizationCfg,
                           encoder=None, vad_fn=None,
                           msdd=None) -> pd.DataFrame:
    """Native equivalent of the NeMo nmesc / nmesc_msdd recipe dispatch
    (time_based_diarization.py:163-174)."""
    srs_wavs = [read_wav(f, normalize=True, return_rate=True)
                for f in wav_files_sorted]
    sr = srs_wavs[0][0]
    wavs = [w if w.ndim == 1 else w[0] for _, w in srs_wavs]
    recipe = resolve_recipe(cfg.method, cfg.recipe_name)
    if encoder is None:
        from notsofar_tpu.diarization.word_based import resolve_speaker_encoder
        encoder = resolve_speaker_encoder(cfg)
    if vad_fn is None:
        frame_vad = resolve_frame_vad(cfg)
        if frame_vad is not None:
            vad_fn = make_recipe_vad(frame_vad, recipe)
    if msdd is None and cfg.method == "nmesc_msdd":
        msdd = resolve_overlap_decoder(cfg)
    spk_vad = diarize_streams(wavs, sr, encoder, vad_fn=vad_fn, msdd=msdd,
                              recipe=recipe)
    return assign_words_to_speakers(segments_df, spk_vad,
                                    cfg.apply_deduplication)
