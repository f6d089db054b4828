"""Continuous speech separation engine — whole sessions on device.

TPU-native rebuild of separate_and_stitch (/root/reference/css/css.py:110-338).
The reference's design runs a Python loop over ~240 three-second windows,
each with a host->GPU transfer, a CPU NumPy MVDR, and a CPU scipy Hungarian
stitch. Here the whole session is one compiled program per padded
segment-count bucket:

* full-session STFT on device (HBM-resident; ~6 min MC ≈ 330 MB complex64),
* all windows gathered into a [num_seg, F, T, C] batch and pushed through
  the Conformer in fixed-size chunks via lax.map — large, static matmuls
  that keep the MXU busy instead of 240 tiny dispatches,
* MVDR fused on device right after the masks (ops/mvdr.py),
* PIT stitching as a lax.scan carrying the previously-aligned mask
  (brute-force 6-permutation argmin, no host Hungarian),
* trapezoid weighted overlap-add using the 2-slot reshape trick
  (segment length == 2 hops in the NOTSOFAR config),
* temporal activity gating with reduce_window morphology,
* iSTFT on device.

Per-step semantic parity notes are inline, citing css/css.py lines.
"""
import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.models.css_wrapper import CssModel
from notsofar_tpu.ops.mvdr import mvdr_beamform
from notsofar_tpu.ops.pit import (BASE_LOSSES, pairwise_loss_matrix,
                                  permute_sources, pit_loss)
from notsofar_tpu.utils.morphology import dilate_jax, erode_jax
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("css_engine")


@dataclass
class CssCfg:
    """Mirror of CssCfg (css/css.py:24-48); device fields dropped (JAX
    manages placement) but kept accepted for YAML compatibility."""
    segment_size_sec: float = 3.0
    hop_size_sec: float = 1.5
    normalize_segment_power: bool = False
    stitching_loss: str = "l1"          # 'l1' or 'mse'
    stitching_input: str = "mask"       # 'mask' or 'separation_result'
    seg_weight_m0_sec: float = 0.15
    seg_weight_m1_sec: float = 0.3
    activity_th: float = 0.4
    activity_dilation_sec: float = 0.4
    activity_erosion_sec: float = 0.2
    device: Optional[str] = None
    show_progressbar: bool = True
    checkpoint_sc: str = "notsofar/conformer1.0/sc"
    checkpoint_mc: str = "notsofar/conformer1.0/mc"
    device_id: int = 0
    num_spks: int = 3
    mc_mvdr: bool = True
    mc_mask_floor_db: float = 0.0
    sc_mask_floor_db: float = -math.inf
    pass_through_ch0: bool = False
    slice_audio_for_debug: bool = False
    # TPU-specific knobs (new):
    seg_chunk: int = 8          # windows per Conformer dispatch
    seg_bucket_multiple: int = 16  # num_segments padded to a multiple of this
    compute_dtype: str = "bfloat16"  # Conformer matmul dtype for serving
    #   ("float32" for strict parity runs; params stay float32 either way)


def calc_segment_weight(seg_frames: int, m0: int, m1: int,
                        is_first: bool = False, is_last: bool = False
                        ) -> np.ndarray:
    """Trapezoid OLA weight, parity with calc_segment_weight
    (css/css.py:341-390)."""
    assert seg_frames > 2 * m1, (
        "not enough frames to fit weighting window. try modifying hop_size, "
        "segment_size or m0, m1")
    wg = np.ones(seg_frames, dtype=np.float32)
    wg[:m0] = 0.0
    wg[seg_frames - m0:] = 0.0
    linear = np.linspace(0.1, 1.0, m1 - m0, dtype=np.float32)
    wg[m0:m1] = linear
    wg[seg_frames - m1:seg_frames - m0] = linear[::-1]
    if is_first:
        wg[:m0] = 0.1
    if is_last:
        wg[seg_frames - m0:] = 0.1
    return wg


def build_weight_matrix(num_seg_real: int, num_seg_bucket: int,
                        seg_frames: int, m0: int, m1: int) -> np.ndarray:
    """[num_seg_bucket, seg_frames] OLA weights; padding rows are zero."""
    wg = np.zeros((num_seg_bucket, seg_frames), dtype=np.float32)
    for i in range(num_seg_real):
        wg[i] = calc_segment_weight(seg_frames, m0, m1,
                                    is_first=(i == 0),
                                    is_last=(i == num_seg_real - 1))
    return wg


class CssEngine:
    """Binds a CssModel + variables + config into a session separator."""

    def __init__(self, model: CssModel, variables: Dict, cfg: CssCfg):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        stft = model.extractor.stft
        self.frame_len = stft.frame_len
        self.frame_hop = stft.frame_hop
        fs_ratio = cfg.hop_size_sec / cfg.segment_size_sec
        # frames-per-segment from the STFT geometry (css/css.py:144-152)
        self._seg_frames_cache: Dict[int, int] = {}

    # ---- geometry ------------------------------------------------------
    def seg_geometry(self, fs: int) -> Dict[str, int]:
        cfg = self.cfg
        seg_samples = int(cfg.segment_size_sec * fs)
        from notsofar_tpu.ops.stft import num_frames
        seg_frames = num_frames(seg_samples, self.frame_len, self.frame_hop)
        return dict(
            seg_frames=seg_frames,
            hop_frames=int(seg_frames * cfg.hop_size_sec / cfg.segment_size_sec),
            m0=int(seg_frames * cfg.seg_weight_m0_sec / cfg.segment_size_sec),
            m1=int(seg_frames * cfg.seg_weight_m1_sec / cfg.segment_size_sec),
            dilation=int(seg_frames * cfg.activity_dilation_sec / cfg.segment_size_sec),
            erosion=int(seg_frames * cfg.activity_erosion_sec / cfg.segment_size_sec),
        )

    # ---- the compiled core ----------------------------------------------
    @partial(jax.jit, static_argnames=("self", "num_seg", "seg_frames",
                                       "hop_frames", "dilation", "erosion",
                                       "want_side_info"))
    def _process_session(self, variables: Dict, wav_pad: jnp.ndarray,
                         wg: jnp.ndarray, valid_frames: jnp.ndarray,
                         num_seg: int, seg_frames: int, hop_frames: int,
                         dilation: int, erosion: int,
                         want_side_info: bool = True
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """wav_pad: [C, N_pad] float with N_pad yielding exactly
        Tpad=(num_seg-1)*hop+T STFT frames. One dispatch runs STFT ->
        separation -> MVDR -> stitch -> gating -> iSTFT; only the separated
        waveforms need to leave the device.
        Returns (wav_i16 [S, samples], scales [S], mask_stitched [F,Tpad,S],
        activity [Tpad,S])."""
        cfg = self.cfg
        # input arrives int16 (4x smaller host->device transfer; lossless
        # for int16-origin microphone audio) and is rescaled on device
        wav_f = wav_pad.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(
            self.model.extractor.stft.forward(wav_f), 0, 2)  # [F,Tpad,C]
        # zero frames beyond the real session extent — parity with the
        # reference's zero-padded final segment (css/css.py:186-190); frames
        # straddling the padded tail would otherwise leak audio energy.
        # NB: jnp.where (not multiply) so the padding is exactly +0+0j —
        # multiplying produces signed zeros whose atan2 phase is +-pi, which
        # the raw-IPD features are sensitive to.
        frame_valid = (jnp.arange(stft_pad.shape[1]) < valid_frames)
        stft_pad = jnp.where(frame_valid[None, :, None], stft_pad,
                             jnp.zeros((), stft_pad.dtype))
        F, Tpad, C = stft_pad.shape
        S = cfg.num_spks
        T = seg_frames

        # 1. gather windows -> [num_seg, F, T, C]  (css/css.py:182-193)
        starts = np.arange(num_seg) * hop_frames
        idx = starts[:, None] + np.arange(T)[None, :]      # [num_seg, T]
        segs = jnp.moveaxis(stft_pad[:, idx, :], 0, 1)      # [num_seg, F, T, C]

        # 2. chunked separation + MVDR (css/css.py:196-227, on device here)
        chunk = min(cfg.seg_chunk, num_seg)
        while num_seg % chunk:
            chunk -= 1
        n_chunks = num_seg // chunk
        segs_c = segs.reshape(n_chunks, chunk, F, T, C)

        mask_floor_db = cfg.mc_mask_floor_db if C > 1 else cfg.sc_mask_floor_db
        mask_floor = 10.0 ** (mask_floor_db / 20.0) if np.isfinite(mask_floor_db) else 0.0

        def sep_chunk(seg_chunk_c):
            model_in = seg_chunk_c if C > 1 else seg_chunk_c[..., 0]
            masks = self.model.separate(variables, model_in)
            spk_m, noi_m = masks["spk_masks"], masks["noise_masks"]
            if C > 1 and cfg.mc_mvdr:
                seg_for_masking = mvdr_beamform(spk_m, noi_m, seg_chunk_c)
            else:
                seg_for_masking = seg_chunk_c[..., 0:1]
            clipped = jnp.clip(spk_m, min=mask_floor)
            separated = seg_for_masking * clipped.astype(seg_for_masking.dtype)
            return separated, spk_m

        separated, spk_masks = jax.lax.map(sep_chunk, segs_c)
        separated = separated.reshape(num_seg, F, T, S)
        spk_masks = spk_masks.reshape(num_seg, F, T, S)

        # 3. PIT stitching (css/css.py:263-295): align each segment to the
        # previously-aligned one on the overlap region. Decomposed for TPU:
        # permuting the left operand only permutes ROWS of the pairwise loss
        # matrix, so all adjacent-pair loss matrices are computed in ONE
        # batched pass, and the sequential chain runs over tiny [S, S]
        # matrices (a ~µs-per-step scan instead of per-step full-tensor PIT).
        overlap = T - hop_frames
        if cfg.stitching_input == "mask":
            stitch_in = spk_masks
        elif cfg.stitching_input == "separation_result":
            stitch_in = jnp.abs(separated)
        else:
            raise ValueError(f"unexpected stitching_input: {cfg.stitching_input}")

        base_loss = BASE_LOSSES[cfg.stitching_loss]
        lm_all = pairwise_loss_matrix(
            stitch_in[:-1, :, -overlap:, :],   # left = segment i
            stitch_in[1:, :, :overlap, :],     # right = segment i+1
            base_loss)                          # [num_seg-1, S, S]
        all_perms = jnp.asarray(
            np.array(list(__import__("itertools").permutations(range(S))),
                     dtype=np.int32))           # [P, S]

        def chain_step(p_prev, lm):
            lm_eff = lm[p_prev, :]                       # rows permuted
            # totals[k] = sum_a lm_eff[a, all_perms[k, a]]
            gathered = jnp.take_along_axis(
                lm_eff[None].repeat(all_perms.shape[0], 0),
                all_perms[:, :, None], axis=2)[..., 0]
            totals = gathered.sum(axis=1)
            r = all_perms[jnp.argmin(totals)]
            return r, r

        p0 = jnp.arange(S, dtype=jnp.int32)
        _, perms_rest = jax.lax.scan(chain_step, p0, lm_all)
        perms = jnp.concatenate([p0[None], perms_rest], axis=0)
        separated = permute_sources(separated, perms)
        spk_masks = permute_sources(spk_masks, perms)

        # 4. weighted overlap-add via the two-slot reshape (T == 2*hop)
        stft_stitched, wsum = _weighted_ola(separated, wg, hop_frames, Tpad)
        mask_stitched, _ = _weighted_ola(spk_masks, wg, hop_frames, Tpad)
        wsafe = jnp.where(wsum > 1e-5, wsum, 1.0)
        stft_stitched = stft_stitched / wsafe[None, :, None]
        mask_stitched = mask_stitched / wsafe[None, :, None]

        # 5. temporal activity gating (css/css.py:301-312)
        activity = mask_stitched.mean(axis=0)                # [Tpad, S]
        activity_b = activity >= cfg.activity_th
        act = dilate_jax(activity_b, dilation, axis=0)
        act = erode_jax(act, erosion, axis=0)
        gated = stft_stitched * act[None].astype(stft_stitched.dtype)

        wavs = self.model.extractor.istft_op.inverse(
            jnp.moveaxis(gated, 2, 0))  # [S, samples]
        # quantize on device: the separated streams are written as wavs and
        # consumed by 16 kHz ASR — int16 is transparent (the microphones are
        # int16 sources) and cuts the device->host transfer 4x.
        peak = jnp.max(jnp.abs(wavs), axis=1, keepdims=True)
        scale = 32767.0 / jnp.maximum(peak, 1e-7)
        wav_i16 = jnp.round(wavs * scale).astype(jnp.int16)
        if not want_side_info:
            # let XLA drop the stitched-mask output buffer entirely
            mask_stitched = jnp.zeros((0,), jnp.float32)
        return wav_i16, scale[:, 0], mask_stitched, act

    # ---- host wrapper -----------------------------------------------------
    def separate_and_stitch(self, speech_mix: np.ndarray, fs: int,
                            return_side_info: bool = True
                            ) -> Tuple[List[np.ndarray], Dict]:
        """speech_mix: [Batch=1, Nsamples, Channels] float. Returns
        (list of num_spks separated wavs, side_info). Parity contract with
        css/css.py:110-338."""
        cfg = self.cfg
        assert speech_mix.ndim == 3, f"expecting 3 dims, got {speech_mix.shape}"
        assert speech_mix.shape[0] == 1, "assuming one session per call"
        if cfg.normalize_segment_power:
            raise NotImplementedError(
                "normalize_segment_power is off in every shipped config "
                "(css/css.py:28) and not yet implemented in the TPU engine")
        geo = self.seg_geometry(fs)
        T, hop = geo["seg_frames"], geo["hop_frames"]
        assert T == 2 * hop, (
            "the OLA fast path assumes segment == 2 hops (the NOTSOFAR "
            "3s/1.5s configuration); generalize _weighted_ola to change this")

        from notsofar_tpu.ops.stft import num_frames
        n_samples = speech_mix.shape[1]
        mix_frames = max(num_frames(n_samples, self.frame_len, self.frame_hop),
                         T)

        overlap = T - hop
        num_seg_real = int(np.ceil((mix_frames - overlap) / hop))
        bucket = cfg.seg_bucket_multiple
        num_seg = int(np.ceil(num_seg_real / bucket) * bucket)
        t_pad = (num_seg - 1) * hop + T
        # pad the waveform so the on-device STFT yields exactly t_pad frames;
        # quantize to int16 for the transfer (audio sources are int16; for
        # out-of-range float input, pre-scale to peak 1.0 first)
        n_pad = (t_pad - 1) * self.frame_hop + self.frame_len
        mix = speech_mix[0].T[:, :n_pad]
        peak = float(np.abs(mix).max()) if mix.size else 0.0
        scaled = mix * (32768.0 / peak if peak > 1.0 else 32768.0)
        # np.rint (SIMD) — np.round takes a slow path costing seconds on
        # multi-minute sessions
        q = np.rint(scaled, out=scaled)
        np.clip(q, -32768, 32767, out=q)
        wav_pad = np.zeros((speech_mix.shape[2], n_pad), np.int16)
        wav_pad[:, :min(n_samples, n_pad)] = q.astype(np.int16)

        wg = build_weight_matrix(num_seg_real, num_seg, T, geo["m0"], geo["m1"])
        # sanity: full coverage of the real region (css/css.py:297)
        cover = np.zeros(t_pad, np.float32)
        for i in range(num_seg_real):
            cover[i * hop:i * hop + T] += wg[i]
        assert (cover[:mix_frames] > 1e-5).all(), \
            "zero OLA weights found. check hop_size, segment_size or m0, m1"

        wav_i16, scales, mask_stitched, act = self._process_session(
            self.variables, jnp.asarray(wav_pad), jnp.asarray(wg),
            jnp.asarray(mix_frames, jnp.int32), num_seg, T, hop,
            geo["dilation"], geo["erosion"],
            want_side_info=return_side_info)

        n_real = (mix_frames - 1) * self.frame_hop + self.frame_len
        wavs = (np.asarray(wav_i16)[:, :n_real].astype(np.float32)
                / np.asarray(scales)[:, None])
        side_info = {"segment_frames": T, "num_segments": num_seg_real}
        if return_side_info:
            # device->host of ~50 MB per 6-min session; skipped on the
            # serving path (css/inference.py passes False)
            side_info["mask_stitched"] = np.asarray(mask_stitched)[:, :mix_frames]
            side_info["activity_final"] = np.asarray(act)[:mix_frames]
        return [wavs[i] for i in range(cfg.num_spks)], side_info


def _weighted_ola(segs: jnp.ndarray, wg: jnp.ndarray, hop: int, t_pad: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted overlap-add of per-segment tensors.

    segs: [num_seg, F, T, S] (complex or float) with T == 2*hop;
    wg: [num_seg, T] float. Returns (stitched [F, t_pad, S], wsum [t_pad]).
    Segment s covers frames [s*hop, s*hop + T): exactly two hop-wide slots,
    so OLA is two adds on a [num_seg+1, hop] slot grid — no scatter.
    """
    num_seg, F, T, S = segs.shape
    assert T == 2 * hop
    w = wg[:, None, :, None].astype(jnp.float32)
    contrib = segs * w.astype(segs.dtype)                 # [num_seg,F,T,S]
    first, second = contrib[:, :, :hop], contrib[:, :, hop:]
    slots = jnp.zeros((num_seg + 1, F, hop, S), segs.dtype)
    slots = slots.at[:-1].add(first)
    slots = slots.at[1:].add(second)
    stitched = jnp.moveaxis(slots, 0, 1).reshape(F, (num_seg + 1) * hop, S)
    stitched = stitched[:, :t_pad]

    wslots = jnp.zeros((num_seg + 1, hop), jnp.float32)
    wslots = wslots.at[:-1].add(wg[:, :hop])
    wslots = wslots.at[1:].add(wg[:, hop:])
    wsum = wslots.reshape(-1)[:t_pad]
    return stitched, wsum
