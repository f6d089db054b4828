"""Bisect the CSS fused program: upload / stft / separate+mvdr / stitch /
ola+istft. Replicates engine._process_core with a stage cutoff and times
cumulative prefixes on device-resident inputs — differences give the
per-stage device cost, and a separate upload timing splits transfer from
compute.

    python tools/bisect_css2.py [--sessions 8] [--seconds 120]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sessions", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=120.0)
    ap.add_argument("--seg-chunk", type=int, default=32)
    args = ap.parse_args()

    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from notsofar_tpu.css.engine import CssCfg, CssEngine, build_weight_matrix
    from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,
                                                 NnetConfig,
                                                 large_conformer_config)
    from notsofar_tpu.ops.mvdr import mvdr_beamform
    from notsofar_tpu.ops.stft import num_frames

    print(f"device: {jax.devices()[0]}", flush=True)
    fs = 16000
    cfg = CssCfg(seg_chunk=args.seg_chunk, seg_bucket_multiple=16)
    model = CssModel(ConformerCssConfig(
        nnet_conf=NnetConfig(conformer_conf=large_conformer_config())),
        dtype=jnp.bfloat16)
    engine = CssEngine(model, model.init(jax.random.PRNGKey(0)), cfg)
    geo = engine.seg_geometry(fs)
    T, hop = geo["seg_frames"], geo["hop_frames"]
    overlap = T - hop

    B = args.sessions
    rng = np.random.RandomState(0)
    n = int(args.seconds * fs)
    mf = max(num_frames(n, engine.frame_len, engine.frame_hop), T)
    num_seg_real = int(np.ceil((mf - overlap) / hop))
    num_seg = int(np.ceil(num_seg_real / 16) * 16)
    t_pad = (num_seg - 1) * hop + T
    n_pad = (t_pad - 1) * engine.frame_hop + engine.frame_len
    wav_pad = np.zeros((B, 7, n_pad), np.int16)
    wav_pad[:, :, :n] = (rng.randn(B, 7, n) * 3000).astype(np.int16)
    wgs = np.tile(build_weight_matrix(num_seg_real, num_seg, T, geo["m0"],
                                      geo["m1"])[None], (B, 1, 1))
    valid = np.full(B, mf, np.int32)

    # upload timing
    for _ in range(2):
        t0 = time.time()
        wav_dev = jax.device_put(wav_pad)
        jax.block_until_ready(wav_dev)
        t_up = time.time() - t0
    print(f"upload {wav_pad.nbytes >> 20} MB: {t_up:.2f}s", flush=True)
    wg_dev = jax.device_put(wgs.astype(np.float32))
    valid_dev = jax.device_put(valid)

    @partial(jax.jit, static_argnames=("cutoff",))
    def core(variables, wav_pad, wg, valid_frames, cutoff="full"):
        Sb, C, _ = wav_pad.shape
        wav_f = wav_pad.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(
            model.extractor.stft.forward(wav_f), 1, 3)
        frame_valid = (jnp.arange(stft_pad.shape[2])[None, :]
                       < valid_frames[:, None])
        stft_pad = jnp.where(frame_valid[:, None, :, None], stft_pad,
                             jnp.zeros((), stft_pad.dtype))
        F = stft_pad.shape[1]
        Tp = stft_pad.shape[2]
        S = cfg.num_spks
        if cutoff == "stft":
            return jnp.sum(jnp.abs(stft_pad))
        total_seg = Sb * num_seg
        chunk = min(cfg.seg_chunk, total_seg)
        while total_seg % chunk:
            chunk -= 1
        slots = stft_pad.reshape(Sb, F, num_seg + 1, hop, C)

        def sep_chunk(chunk_idx):
            seg_ids = chunk_idx * chunk + jnp.arange(chunk)
            b = seg_ids // num_seg
            k = seg_ids % num_seg
            left = slots[b, :, k]
            right = slots[b, :, k + 1]
            seg_chunk_c = jnp.concatenate([left, right], axis=2)
            masks = model.separate(variables, seg_chunk_c)
            spk_m, noi_m = masks["spk_masks"], masks["noise_masks"]
            if cutoff == "sep_only":
                sep = seg_chunk_c[..., 0:1] * spk_m.astype(seg_chunk_c.dtype)
            else:
                sep = mvdr_beamform(spk_m, noi_m, seg_chunk_c)
                sep = sep * jnp.clip(spk_m, min=1.0).astype(sep.dtype)
            return (jnp.moveaxis(sep, 3, 1), jnp.moveaxis(spk_m, 3, 1))

        separated, spk_masks = jax.lax.map(
            sep_chunk, jnp.arange(total_seg // chunk))
        if cutoff in ("sep_only", "sep_mvdr"):
            return jnp.sum(jnp.abs(separated).astype(jnp.float32))
        separated = separated.reshape(Sb, num_seg, S, F, T)
        spk_masks = spk_masks.reshape(Sb, num_seg, S, F, T)
        from notsofar_tpu.ops.pit import BASE_LOSSES
        import itertools
        base_loss = BASE_LOSSES[cfg.stitching_loss]
        lm_elem = base_loss(
            spk_masks[:, :-1, :, None, :, -overlap:],
            spk_masks[:, 1:, None, :, :, :overlap])
        lm_all = lm_elem.mean(axis=(4, 5))
        all_perms = np.array(list(itertools.permutations(range(S))),
                             dtype=np.int32)
        P = all_perms.shape[0]

        def chain_step(p_prev, lm):
            lm_eff = jnp.take_along_axis(lm, p_prev[:, :, None], axis=1)
            gathered = jnp.take_along_axis(
                jnp.broadcast_to(lm_eff[:, None], (Sb, P, S, S)),
                jnp.broadcast_to(all_perms[None, :, :, None],
                                 (Sb, P, S, 1)), axis=3)[..., 0]
            totals = gathered.sum(axis=-1)
            r = jnp.asarray(all_perms)[jnp.argmin(totals, axis=-1)]
            return r, r

        p0 = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (Sb, S))
        _, perms_rest = jax.lax.scan(chain_step, p0,
                                     jnp.moveaxis(lm_all, 1, 0))
        perms = jnp.concatenate([p0[None], perms_rest], axis=0)
        perms = jnp.moveaxis(perms, 0, 1)
        separated = jnp.take_along_axis(
            separated, perms[:, :, :, None, None], axis=2)
        spk_masks = jnp.take_along_axis(
            spk_masks, perms[:, :, :, None, None], axis=2)
        if cutoff == "stitch":
            return jnp.sum(jnp.abs(separated).astype(jnp.float32))
        from notsofar_tpu.css.engine import _weighted_ola_sft
        ola = jax.vmap(lambda x, w: _weighted_ola_sft(x, w, hop, Tp))
        stft_st, wsum = ola(separated, wg)
        mask_st, _ = ola(spk_masks, wg)
        wsafe = jnp.where(wsum > 1e-5, wsum, 1.0)
        stft_st = stft_st / wsafe[:, None, None, :]
        mask_st = mask_st / wsafe[:, None, None, :]
        from notsofar_tpu.utils.morphology import dilate_jax, erode_jax
        activity = mask_st.mean(axis=2)
        act = dilate_jax(activity >= cfg.activity_th, geo["dilation"],
                         axis=2)
        act = erode_jax(act, geo["erosion"], axis=2)
        gated = stft_st * act[:, :, None, :].astype(stft_st.dtype)
        wavs = model.extractor.istft_op.inverse(gated.reshape(Sb * S, F, Tp))
        wavs = wavs.reshape(Sb, S, -1)
        peak = jnp.max(jnp.abs(wavs), axis=2, keepdims=True)
        scale = 32767.0 / jnp.maximum(peak, 1e-7)
        wav_i16 = jnp.round(wavs * scale).astype(jnp.int16)
        return jnp.sum(wav_i16.astype(jnp.float32)[:, :, ::1000])

    for cutoff in ("stft", "sep_only", "sep_mvdr", "stitch", "full"):
        t0 = time.time()
        out = core(engine.variables, wav_dev, wg_dev, valid_dev,
                   cutoff=cutoff)
        np.asarray(out)
        comp = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            np.asarray(core(engine.variables, wav_dev, wg_dev, valid_dev,
                            cutoff=cutoff))
            best = min(best, time.time() - t0)
        print(f"{cutoff}: compile+first {comp:.1f}s | steady {best:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
