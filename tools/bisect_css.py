"""Bisect the CSS fused program: time progressively larger subsets of
_process_core to find where the 12.6 s goes (profile_css.py showed the
time is flat across MVDR on/off and chunk sizes)."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    import jax
    import jax.numpy as jnp
    from notsofar_tpu.css.engine import CssCfg, CssEngine
    from notsofar_tpu.models.css_wrapper import (ConformerCssConfig, CssModel,
                                                 NnetConfig,
                                                 large_conformer_config)
    from notsofar_tpu.ops.mvdr import mvdr_beamform

    fs = 16000
    secs, B = 120.0, 8
    rng = np.random.RandomState(0)
    cfg = CssCfg(seg_chunk=8, seg_bucket_multiple=16)
    model = CssModel(ConformerCssConfig(
        nnet_conf=NnetConfig(conformer_conf=large_conformer_config())),
        dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0))
    engine = CssEngine(model, variables, cfg)
    geo = engine.seg_geometry(fs)
    T, hop = geo["seg_frames"], geo["hop_frames"]
    num_seg = 80
    t_pad = (num_seg - 1) * hop + T
    n_pad = (t_pad - 1) * engine.frame_hop + engine.frame_len
    wav = jnp.asarray((rng.randn(B, 7, n_pad) * 2000).astype(np.int16))
    F = 257
    C = 7
    total_seg = B * num_seg
    chunk = 8

    def gather(stft_pad, seg_id):
        b = seg_id // num_seg
        k = seg_id % num_seg
        sl = jax.lax.dynamic_slice(
            stft_pad, (b, 0, k * hop, 0), (1, F, T, C))
        return sl[0]

    def prog_stft(variables, wav):
        wav_f = wav.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(model.extractor.stft.forward(wav_f), 1, 3)
        return jnp.sum(jnp.abs(stft_pad))

    def prog_gather(variables, wav):
        wav_f = wav.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(model.extractor.stft.forward(wav_f), 1, 3)

        def sep_chunk(ci):
            seg_ids = ci * chunk + jnp.arange(chunk)
            seg = jax.vmap(lambda s: gather(stft_pad, s))(seg_ids)
            return jnp.sum(jnp.abs(seg))

        return jax.lax.map(sep_chunk, jnp.arange(total_seg // chunk)).sum()

    def prog_model(variables, wav):
        wav_f = wav.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(model.extractor.stft.forward(wav_f), 1, 3)

        def sep_chunk(ci):
            seg_ids = ci * chunk + jnp.arange(chunk)
            seg = jax.vmap(lambda s: gather(stft_pad, s))(seg_ids)
            masks = model.separate(variables, seg)
            return (jnp.sum(masks["spk_masks"].astype(jnp.float32))
                    + jnp.sum(masks["noise_masks"].astype(jnp.float32)))

        return jax.lax.map(sep_chunk, jnp.arange(total_seg // chunk)).sum()

    def prog_mvdr(variables, wav):
        wav_f = wav.astype(jnp.float32) * (1.0 / 32768.0)
        stft_pad = jnp.moveaxis(model.extractor.stft.forward(wav_f), 1, 3)

        def sep_chunk(ci):
            seg_ids = ci * chunk + jnp.arange(chunk)
            seg = jax.vmap(lambda s: gather(stft_pad, s))(seg_ids)
            masks = model.separate(variables, seg)
            sep = mvdr_beamform(masks["spk_masks"], masks["noise_masks"], seg)
            return jnp.sum(jnp.abs(sep))

        return jax.lax.map(sep_chunk, jnp.arange(total_seg // chunk)).sum()

    for tag, prog in [("stft-only", prog_stft), ("stft+gather", prog_gather),
                      ("stft+gather+conformer", prog_model),
                      ("stft+gather+conformer+mvdr", prog_mvdr)]:
        fn = jax.jit(prog)
        t0 = time.time()
        jax.block_until_ready(fn(variables, wav))
        comp = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(variables, wav))
            ts.append(time.time() - t0)
        print(f"{tag}: compile {comp:.0f}s | steady {min(ts):.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
