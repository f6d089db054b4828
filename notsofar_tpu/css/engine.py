"""Continuous speech separation engine — whole sessions on device.

TPU-native rebuild of separate_and_stitch (/root/reference/css/css.py:110-338).
The reference's design runs a Python loop over ~240 three-second windows,
each with a host->GPU transfer, a CPU NumPy MVDR, and a CPU scipy Hungarian
stitch. Here a *batch of sessions* is one compiled program per padded
segment-count bucket:

* int16 waveforms in, int16 separated streams out (4x smaller transfers;
  lossless for microphone audio); full-session STFT on device,
* every session's windows gathered lazily per chunk and pushed through the
  Conformer together via lax.map — large, static matmuls that keep the MXU
  busy instead of hundreds of tiny dispatches,
* MVDR fused on device right after the masks (ops/mvdr.py),
* PIT stitching decomposed: all adjacent-pair loss matrices in one batched
  pass, then a per-session scan over [S, S] matrices (brute-force
  6-permutation argmin, no host Hungarian),
* trapezoid weighted overlap-add using the 2-slot reshape trick
  (segment length == 2 hops in the NOTSOFAR config),
* temporal activity gating with reduce_window morphology, iSTFT on device.

Layout: big tensors keep [.., S, F, T] with time minor — leaving the
3-source axis minor-most makes XLA pad 3->128 lanes (44x memory).

Per-step semantic parity notes are inline, citing css/css.py lines.
Measured on one v5e chip: ~100x real-time for 4-session batches with the
bf16 Conformer-large + MVDR configuration (bench.py).
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
from notsofar_tpu.ops.pit import BASE_LOSSES, permute_sources
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
    seg_chunk: int = 32         # windows per Conformer lax.map step; the
    #   real-chip sweep (tools/profile_css.py: 15.7s at 8, 10.6s at 32,
    #   11.9s at 80 for 8x120s sessions) puts the knee at 32 — enough rows
    #   to fill the MXU without spilling the fused MVDR intermediates
    seg_bucket_multiple: int = 16  # num_segments padded to a multiple of this
    compute_dtype: str = "bfloat16"  # Conformer matmul dtype for serving
    use_pallas_scm: bool = False  # Pallas kernel for the masked-SCM op
    #   (ops/pallas_kernels.py); default is the XLA einsum — bench.py
    #   --pallas records the on-chip comparison
    #   ("float32" for strict parity runs; params stay float32 either way)
    batch_sessions: int = 4     # sessions separated per dispatch (the
    #   orchestrator groups same-mic-count sessions; 1 = reference-like)


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
    def _process_core(self, variables: Dict, wav_pad: jnp.ndarray,
                      wg: jnp.ndarray, valid_frames: jnp.ndarray,
                      num_seg: int, seg_frames: int, hop_frames: int,
                      dilation: int, erosion: int,
                      want_side_info: bool = True
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
        """Fused multi-session program.

        wav_pad: [Sb, C, N_pad] int16 with N_pad yielding exactly
        Tpad=(num_seg-1)*hop+T STFT frames; wg: [Sb, num_seg, T];
        valid_frames: [Sb]. Sessions sharing a segment bucket run as ONE
        dispatch: STFT -> separation (all sessions' windows chunked through
        the Conformer together) -> MVDR -> per-session PIT stitch ->
        weighted OLA -> activity gating -> iSTFT. Only the int16 waveforms
        leave the device.
        Returns (wav_i16 [Sb, S, samples], scales [Sb, S],
        mask_stitched [Sb, F, Tpad, S], activity [Sb, Tpad, S]).
        """
        cfg = self.cfg
        Sb, C, _ = wav_pad.shape
        # input arrives int16 (4x smaller host->device transfer; lossless
        # for int16-origin microphone audio) and is rescaled on device
        wav_f = wav_pad.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(
            self.model.extractor.stft.forward(wav_f), 1, 3)  # [Sb,F,Tpad,C]
        # zero frames beyond each session's real extent — parity with the
        # reference's zero-padded final segment (css/css.py:186-190); frames
        # straddling the padded tail would otherwise leak audio energy.
        # NB: jnp.where (not multiply) so the padding is exactly +0+0j —
        # multiplying produces signed zeros whose atan2 phase is +-pi, which
        # the raw-IPD features are sensitive to.
        frame_valid = (jnp.arange(stft_pad.shape[2])[None, :]
                       < valid_frames[:, None])                # [Sb, Tpad]
        stft_pad = jnp.where(frame_valid[:, None, :, None], stft_pad,
                             jnp.zeros((), stft_pad.dtype))
        F = stft_pad.shape[1]
        Tpad = stft_pad.shape[2]
        S = cfg.num_spks
        T = seg_frames

        # 1+2. windows are gathered lazily per chunk (a materialized
        # [Sb*num_seg, F, T, C] complex tensor is avoided) and pushed
        # through separation + MVDR (css/css.py:182-227, on device here).
        # Outputs use the [.., S, F, T] layout: keeping the 3-source axis
        # off the minor dimension avoids XLA's 3->128 lane padding (a 44x
        # memory expansion observed on the [.., T, S] layout).
        total_seg = Sb * num_seg
        chunk = min(cfg.seg_chunk, total_seg)
        while total_seg % chunk:
            chunk -= 1

        mask_floor_db = cfg.mc_mask_floor_db if C > 1 else cfg.sc_mask_floor_db
        mask_floor = 10.0 ** (mask_floor_db / 20.0) if np.isfinite(mask_floor_db) else 0.0

        # window gather: segments start at k*hop with T == 2*hop, so every
        # window is an adjacent PAIR of hop-wide slots — two block gathers
        # on a [Sb, F, num_seg+1, hop, C] slot grid. The previous
        # vmap(dynamic_slice) formulation lowered to a per-element gather
        # moving ~0.6 GB/s (tools/bench_gather.py) and dominated the
        # separation program.
        two_slot = (T == 2 * hop_frames and Tpad == (num_seg + 1) * hop_frames)
        if two_slot:
            slots = stft_pad.reshape(Sb, F, num_seg + 1, hop_frames, C)

        def gather_one(seg_id):
            b = seg_id // num_seg
            k = seg_id % num_seg
            sl = jax.lax.dynamic_slice(
                stft_pad, (b, 0, k * hop_frames, 0), (1, F, T, C))
            return sl[0]

        def sep_chunk(chunk_idx):
            seg_ids = chunk_idx * chunk + jnp.arange(chunk)
            if two_slot:
                b = seg_ids // num_seg
                k = seg_ids % num_seg
                left = slots[b, :, k]          # [chunk, F, hop, C]
                right = slots[b, :, k + 1]
                seg_chunk_c = jnp.concatenate([left, right], axis=2)
            else:
                seg_chunk_c = jax.vmap(gather_one)(seg_ids)  # [chunk,F,T,C]
            model_in = seg_chunk_c if C > 1 else seg_chunk_c[..., 0]
            masks = self.model.separate(variables, model_in)
            spk_m, noi_m = masks["spk_masks"], masks["noise_masks"]
            if C > 1 and cfg.mc_mvdr:
                seg_for_masking = mvdr_beamform(
                    spk_m, noi_m, seg_chunk_c,
                    use_pallas=cfg.use_pallas_scm)
            else:
                seg_for_masking = seg_chunk_c[..., 0:1]
            clipped = jnp.clip(spk_m, min=mask_floor)
            separated = seg_for_masking * clipped.astype(seg_for_masking.dtype)
            # -> [chunk, S, F, T]
            return (jnp.moveaxis(separated, 3, 1),
                    jnp.moveaxis(spk_m, 3, 1))

        separated, spk_masks = jax.lax.map(
            sep_chunk, jnp.arange(total_seg // chunk))
        separated = separated.reshape(Sb, num_seg, S, F, T)
        spk_masks = spk_masks.reshape(Sb, num_seg, S, F, T)

        # 3. PIT stitching (css/css.py:263-295): align each segment to the
        # previously-aligned one on the overlap region. Decomposed for TPU:
        # permuting the left operand only permutes ROWS of the pairwise loss
        # matrix, so all adjacent-pair loss matrices are computed in ONE
        # batched pass, and the sequential chain runs over tiny [Sb, S, S]
        # matrices (a ~µs-per-step scan instead of per-step full-tensor PIT).
        overlap = T - hop_frames
        if cfg.stitching_input == "mask":
            stitch_in = spk_masks
        elif cfg.stitching_input == "separation_result":
            stitch_in = jnp.abs(separated)
        else:
            raise ValueError(f"unexpected stitching_input: {cfg.stitching_input}")

        base_loss = BASE_LOSSES[cfg.stitching_loss]
        lm_elem = base_loss(
            stitch_in[:, :-1, :, None, :, -overlap:],   # left seg i, row a
            stitch_in[:, 1:, None, :, :, :overlap])     # right seg i+1, col b
        lm_all = lm_elem.mean(axis=(4, 5))              # [Sb, num_seg-1, S, S]
        all_perms = np.array(
            list(__import__("itertools").permutations(range(S))),
            dtype=np.int32)                              # [P, S]
        P = all_perms.shape[0]

        def chain_step(p_prev, lm):
            # p_prev: [Sb, S]; lm: [Sb, S, S]
            lm_eff = jnp.take_along_axis(lm, p_prev[:, :, None], axis=1)
            gathered = jnp.take_along_axis(
                jnp.broadcast_to(lm_eff[:, None], (Sb, P, S, S)),
                jnp.broadcast_to(all_perms[None, :, :, None], (Sb, P, S, 1)),
                axis=3)[..., 0]                          # [Sb, P, S]
            totals = gathered.sum(axis=-1)               # [Sb, P]
            r = jnp.asarray(all_perms)[jnp.argmin(totals, axis=-1)]  # [Sb,S]
            return r, r

        p0 = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (Sb, S))
        _, perms_rest = jax.lax.scan(chain_step, p0,
                                     jnp.moveaxis(lm_all, 1, 0))
        perms = jnp.concatenate([p0[None], perms_rest], axis=0)  # [nseg,Sb,S]
        perms = jnp.moveaxis(perms, 0, 1)                        # [Sb,nseg,S]

        def permute_axis2(arr):
            return jnp.take_along_axis(
                arr, perms[:, :, :, None, None], axis=2)

        separated = permute_axis2(separated)
        spk_masks = permute_axis2(spk_masks)

        # 4. weighted overlap-add via the two-slot reshape (T == 2*hop)
        ola = jax.vmap(lambda x, w: _weighted_ola_sft(x, w, hop_frames, Tpad))
        stft_stitched, wsum = ola(separated, wg)  # [Sb,S,F,Tpad], [Sb,Tpad]
        mask_stitched, _ = ola(spk_masks, wg)
        wsafe = jnp.where(wsum > 1e-5, wsum, 1.0)
        stft_stitched = stft_stitched / wsafe[:, None, None, :]
        mask_stitched = mask_stitched / wsafe[:, None, None, :]

        # 5. temporal activity gating (css/css.py:301-312)
        activity = mask_stitched.mean(axis=2)              # [Sb, S, Tpad]
        activity_b = activity >= cfg.activity_th
        act = dilate_jax(activity_b, dilation, axis=2)
        act = erode_jax(act, erosion, axis=2)
        gated = stft_stitched * act[:, :, None, :].astype(stft_stitched.dtype)

        wavs = self.model.extractor.istft_op.inverse(
            gated.reshape(Sb * S, F, Tpad))
        wavs = wavs.reshape(Sb, S, -1)
        # quantize on device: the separated streams are written as wavs and
        # consumed by 16 kHz ASR — int16 is transparent (the microphones are
        # int16 sources) and cuts the device->host transfer 4x.
        peak = jnp.max(jnp.abs(wavs), axis=2, keepdims=True)
        scale = 32767.0 / jnp.maximum(peak, 1e-7)
        wav_i16 = jnp.round(wavs * scale).astype(jnp.int16)
        if not want_side_info:
            # let XLA drop the stitched-mask output buffer entirely
            mask_stitched = jnp.zeros((0,), jnp.float32)
        return wav_i16, scale[..., 0], mask_stitched, act

    # ---- pipelined ingest: prepare (host) / upload (any thread) / run ---
    def prepare_sessions(self, speech_mixes: List[np.ndarray], fs: int
                         ) -> Dict:
        """Host-side batch prep: int16 quantization + padding + OLA weight
        matrices. Pure numpy — safe to run on an ingest thread so the NEXT
        batch's prep overlaps the current batch's device work (the host
        link moves ~30 MB/s; serving pipelines must hide it)."""
        cfg = self.cfg
        geo = self.seg_geometry(fs)
        T, hop = geo["seg_frames"], geo["hop_frames"]
        overlap = T - hop
        from notsofar_tpu.ops.stft import num_frames
        infos = []
        for mix in speech_mixes:
            mf = max(num_frames(mix.shape[1], self.frame_len,
                                self.frame_hop), T)
            infos.append(mf)
        num_seg_max = max(int(np.ceil((mf - overlap) / hop)) for mf in infos)
        bucket = cfg.seg_bucket_multiple
        num_seg = int(np.ceil(num_seg_max / bucket) * bucket)
        t_pad = (num_seg - 1) * hop + T
        n_pad = (t_pad - 1) * self.frame_hop + self.frame_len

        B = len(speech_mixes)
        C = speech_mixes[0].shape[2]
        wav_pad = np.zeros((B, C, n_pad), np.int16)
        wgs = np.zeros((B, num_seg, T), np.float32)
        valid = np.zeros(B, np.int32)
        for b, mix in enumerate(speech_mixes):
            m = mix[0].T[:, :n_pad]
            peak = float(np.abs(m).max()) if m.size else 0.0
            scaled = m * (32768.0 / peak if peak > 1.0 else 32768.0)
            q = np.rint(scaled, out=scaled)
            np.clip(q, -32768, 32767, out=q)
            wav_pad[b, :, :m.shape[1]] = q.astype(np.int16)
            mf = infos[b]
            valid[b] = mf
            nseg_real = int(np.ceil((mf - overlap) / hop))
            wgs[b] = build_weight_matrix(nseg_real, num_seg, T,
                                         geo["m0"], geo["m1"])
        n_reals = [(mf - 1) * self.frame_hop + self.frame_len
                   for mf in infos]
        return dict(wav_pad=wav_pad, wgs=wgs, valid=valid, num_seg=num_seg,
                    T=T, hop=hop, geo=geo, n_reals=n_reals)

    def upload_sessions(self, prep: Dict) -> Dict:
        """Start the host->device transfers for a prepared batch. Callable
        from an ingest thread: jax transfers are thread-safe and the
        returned handles can be consumed by separate_uploaded on the main
        thread, hiding the ~seconds-scale audio upload behind the previous
        batch's compute.

        The batch uploads as ~2 MB pieces (device-side concatenate at the
        end). `throttle` trades upload speed for politeness: device_put is
        async, so unthrottled pieces enqueue as one fast back-to-back
        backlog (~5 s for 215 MB) that delays any concurrent dispatch/sync
        by up to the backlog length, while throttle=True blocks per piece
        (at most one in flight — concurrent rounds stay near baseline,
        tools/bench_overlap.py) but the upload itself crawls 2-3x under
        pipeline load (measured 21-26 s vs 10 s). Serving schedules the
        UNTHROTTLED burst where the consumer tolerates it (the diarization
        window; bench_pipeline.py::run)."""
        throttle = prep.get("throttle", False)
        up = dict(prep)
        del up["wav_pad"], up["wgs"], up["valid"]
        wav_pad = prep["wav_pad"]
        B, C, N = wav_pad.shape
        flat = wav_pad.reshape(-1)
        q = 1 << 20                       # 2 MB int16 pieces (~70 ms each)
        parts = []
        for i in range(0, flat.size, q):
            p = jnp.asarray(flat[i:i + q])
            if throttle:
                jax.block_until_ready(p)  # at most one piece in flight
            parts.append(p)
        up["wav"] = jnp.concatenate(parts).reshape(B, C, N)
        up["wg"] = jnp.asarray(prep["wgs"])
        up["valid"] = jnp.asarray(prep["valid"])
        return up

    def separate_uploaded(self, up: Dict
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Run the fused separation program on uploaded handles. Returns
        (wav_i16 [Sb, S, N] device, scales [Sb, S] device)."""
        geo = up["geo"]
        wav_dev, scales_dev, _, _ = self._process_core(
            self.variables, up["wav"], up["wg"], up["valid"],
            up["num_seg"], up["T"], up["hop"],
            geo["dilation"], geo["erosion"], want_side_info=False)
        return wav_dev, scales_dev

    def separate_uploaded_lazy(self, up: Dict):
        """separate_uploaded + deferred host copy (see
        separate_sessions_batch defer_host): returns
        (lazy host wav lists, (wav_dev, scales_dev, n_reals)).

        The big wav download is NOT started here: the scales sync must not
        queue behind a ~100 MB host stream (measured +3.7 s on the CSS
        stage), and an eager async copy contends with the next batch's
        ingest upload during ASR (+3.5 s on mel). First host access —
        the diar stage's wav-writer thread — pulls it while diarization's
        device work runs, when the link is idle."""
        wav_dev, scales_dev = self.separate_uploaded(up)
        scales = np.asarray(scales_dev)   # sync: compute is done here
        out = _LazyHostWavs(wav_dev, scales, up["n_reals"],
                            self.cfg.num_spks)
        return out, (wav_dev, scales_dev, up["n_reals"])

    # ---- batched multi-session entry -----------------------------------
    def separate_sessions_batch(self, speech_mixes: List[np.ndarray], fs: int,
                                return_device: bool = False,
                                defer_host: bool = False):
        """Separate several sessions in one dispatch (same mic count; padded
        to a common segment bucket). Returns per-session stream lists.

        return_device=True additionally returns the raw on-device outputs
        (wav_i16 [Sb, S, N] jnp, scales [Sb, S], real sample counts) so
        downstream stages (ASR mel, diarization embedding windows) can
        consume the separated audio WITHOUT re-uploading it — over a
        narrow host<->device link the re-upload dominates the pipeline.

        defer_host=True (requires return_device) returns a LAZY host list:
        the ~tens-of-MB device->host stream happens on first index —
        consumers that only need the host wavs later (wav-file writes
        under the diar batch call) pull it when the link is otherwise
        idle instead of blocking the CSS stage on it. The call still
        blocks on the (tiny) scales array so the separation compute
        itself is fully accounted to this stage."""
        import os
        import time as _time
        dbg = os.environ.get("NOTSOFAR_CSS_DEBUG")
        marks = [("start", _time.time())]

        def mark(name):
            if dbg:
                marks.append((name, _time.time()))

        prep = self.prepare_sessions(speech_mixes, fs)
        mark("host-prep")
        up = self.upload_sessions(prep)
        jax.block_until_ready(up["wav"]) if dbg else None
        mark("upload")
        wav_dev, scales_dev = self.separate_uploaded(up)
        if dbg:
            import sys as _sys
            jax.block_until_ready(scales_dev)
            mark("dispatch+compute")
            spans = {b: round(tb - ta, 2) for (_, ta), (b, tb)
                     in zip(marks, marks[1:])}
            print(f"css batch phases: {spans}", file=_sys.stderr,
                  flush=True)
        cfg = self.cfg
        n_reals = prep["n_reals"]
        if defer_host and return_device:
            scales = np.asarray(scales_dev)   # sync: compute is done here
            out = _LazyHostWavs(wav_dev, scales, n_reals, cfg.num_spks)
            return out, (wav_dev, scales_dev, n_reals)
        wav_i16 = np.asarray(wav_dev)
        scales = np.asarray(scales_dev)
        out = []
        for b, mix in enumerate(speech_mixes):
            n_real = n_reals[b]
            wavs = wav_i16[b, :, :n_real].astype(np.float32) / scales[b][:, None]
            out.append([wavs[i] for i in range(cfg.num_spks)])
        if return_device:
            return out, (wav_dev, scales_dev, n_reals)
        return out

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

        wav_i16, scales, mask_stitched, act = self._process_core(
            self.variables, jnp.asarray(wav_pad[None]), jnp.asarray(wg[None]),
            jnp.asarray([mix_frames], jnp.int32), num_seg, T, hop,
            geo["dilation"], geo["erosion"],
            want_side_info=return_side_info)
        wav_i16, scales = wav_i16[0], scales[0]
        act = np.moveaxis(np.asarray(act[0]), 0, 1)        # -> [Tpad, S]
        if return_side_info:
            mask_stitched = np.moveaxis(np.asarray(mask_stitched[0]), 0, 2)

        n_real = (mix_frames - 1) * self.frame_hop + self.frame_len
        wavs = (np.asarray(wav_i16)[:, :n_real].astype(np.float32)
                / np.asarray(scales)[:, None])
        side_info = {"segment_frames": T, "num_segments": num_seg_real}
        if return_side_info:
            # device->host of ~50 MB per 6-min session; skipped on the
            # serving path (css/inference.py passes False)
            side_info["mask_stitched"] = mask_stitched[:, :mix_frames]
            side_info["activity_final"] = np.asarray(act)[:mix_frames]
        return [wavs[i] for i in range(cfg.num_spks)], side_info


class _LazyHostWavs:
    """Per-session separated-stream lists materialized on first access.

    Holds the device wav_i16 whose host stream was already issued with
    copy_to_host_async; indexing blocks only if the async copy has not
    finished yet (by design it drains behind the next stage's compute)."""

    def __init__(self, wav_dev, scales: np.ndarray, n_reals: List[int],
                 num_spks: int):
        self._wav_dev = wav_dev
        self._scales = scales
        self._n_reals = n_reals
        self._num_spks = num_spks
        self._host: Optional[list] = None

    def _materialize(self):
        if self._host is None:
            wav_i16 = np.asarray(self._wav_dev)
            self._host = [
                [(wav_i16[b, i, :n].astype(np.float32) / self._scales[b, i])
                 for i in range(self._num_spks)]
                for b, n in enumerate(self._n_reals)]
        return self._host

    def __getitem__(self, b):
        return self._materialize()[b]

    def __len__(self):
        return len(self._n_reals)

    def __iter__(self):
        return iter(self._materialize())


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


def _weighted_ola_sft(segs: jnp.ndarray, wg: jnp.ndarray, hop: int,
                      t_pad: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted overlap-add in the [num_seg, S, F, T] layout (T minor).

    Segment s covers frames [s*hop, s*hop + T) with T == 2*hop: exactly two
    hop-wide slots, so OLA is two adds on a [num_seg+1, hop] slot grid.
    Returns (stitched [S, F, t_pad], wsum [t_pad]).
    """
    num_seg, S, F, T = segs.shape
    assert T == 2 * hop
    w = wg[:, None, None, :].astype(jnp.float32)
    contrib = segs * w.astype(segs.dtype)               # [nseg,S,F,T]
    first, second = contrib[..., :hop], contrib[..., hop:]
    slots = jnp.zeros((num_seg + 1, S, F, hop), segs.dtype)
    slots = slots.at[:-1].add(first)
    slots = slots.at[1:].add(second)
    stitched = jnp.moveaxis(slots, 0, 2)                # [S,F,nseg+1,hop]
    stitched = stitched.reshape(S, F, (num_seg + 1) * hop)[..., :t_pad]

    wslots = jnp.zeros((num_seg + 1, hop), jnp.float32)
    wslots = wslots.at[:-1].add(wg[:, :hop])
    wslots = wslots.at[1:].add(wg[:, hop:])
    wsum = wslots.reshape(-1)[:t_pad]
    return stitched, wsum
