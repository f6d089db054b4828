"""Train the tiny CSS model that backs the end-to-end ACCURACY test.

The suite's other e2e tests assert plumbing (random weights, meaningless
transcripts). This tool closes that gap: it trains a tiny single-channel
ConformerCSS on a synthetic two-speaker separation task through the real
training stack (byte-seek SimulatedDataset -> run_training_css -> orbax
checkpoint) and commits the result as a fixture
(tests/fixtures/css_tiny_trained/) in the native checkpoint format, so
tests/test_e2e_accuracy.py can assert actual separation quality — SI-SNR
improvement and a zero-tcpWER pipeline run — with no mounted weights.

Task: speaker A lives in a low harmonic band (220-880 Hz), speaker B in a
high band (2.4-3.8 kHz); both have random AM envelopes and overlapping
activity bursts over white noise. Separating disjoint bands is learnable
in a few hundred CPU steps yet exercises the identical loss/PIT/mask path
the real checkpoints use (reference semantics: css/training/train.py).

Run from the repo root (CPU is fine, ~2-4 min):

    JAX_PLATFORMS=cpu python tools/make_e2e_accuracy_fixture.py
"""
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

FS = 16000
LOW_HARMONICS = (220.0, 440.0, 660.0, 880.0)
HIGH_HARMONICS = (2400.0, 3100.0, 3800.0)
N_MICS = 7          # dataset format is 7-mic; SC training reads mic 0
MAX_SPKS = 3        # reference column layout; third speaker slot silent


def band_speaker(rng: np.random.RandomState, n: int, harmonics,
                 n_bursts=3, amp=0.15) -> np.ndarray:
    """One synthetic 'speaker': AM harmonics gated by activity bursts."""
    t = np.arange(n) / FS
    sig = np.zeros(n, np.float32)
    for f in harmonics:
        phase = rng.uniform(0, 2 * np.pi)
        am = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t
                                + rng.uniform(0, 2 * np.pi))
        sig += (am * np.sin(2 * np.pi * f * t + phase)).astype(np.float32)
    sig *= amp / len(harmonics)
    gate = np.zeros(n, np.float32)
    for _ in range(n_bursts):
        start = rng.randint(0, max(1, n - FS // 2))
        length = rng.randint(FS // 2, int(FS * 1.5))
        gate[start:start + length] = 1.0
    # 10 ms raised-cosine smoothing so bursts aren't clicky
    win = np.hanning(321).astype(np.float32)
    gate = np.convolve(gate, win / win.sum(), mode="same")
    return sig * gate


def make_utterance(rng: np.random.RandomState, seconds=4.0):
    """Returns (mixture [T,M], direct [T,M,S], noise [T,M])."""
    n = int(FS * seconds)
    spk_a = band_speaker(rng, n, LOW_HARMONICS)
    spk_b = band_speaker(rng, n, HIGH_HARMONICS)
    direct = np.zeros((n, N_MICS, MAX_SPKS), np.float32)
    direct[:, :, 0] = spk_a[:, None]
    direct[:, :, 1] = spk_b[:, None]
    noise = (0.01 * rng.randn(n, N_MICS)).astype(np.float32)
    mixture = direct.sum(-1) + noise
    return mixture, direct, noise


def write_band_dataset(root: Path, n_utts: int, seed: int,
                       seconds=4.0) -> Path:
    """Write the reference byte-seek flat-partition format
    (simulated_dataset.py docstring): int16 rows + per-utt json + .map."""
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    utt_map = {}
    for u in range(n_utts):
        uid = f"{u:04d}_band"
        mixture, direct, noise = make_utterance(rng, seconds)
        n = len(mixture)
        utt_map[uid] = n
        cols = {}

        def put(name, arr, scale=None):
            if scale is not None:
                q = np.clip(arr * scale, -32768, 32767).astype(np.int16)
                cols[name] = dict(dtype="int16", shape=list(q.shape),
                                  itemsize=2,
                                  element_in_row=int(np.prod(q.shape[1:])),
                                  row_size=int(2 * np.prod(q.shape[1:])))
                cols[name + "_scale"] = dict(values=str(float(scale)))
                (root / f"{uid}.{name}").write_bytes(q.tobytes())
            else:
                cols[name] = dict(dtype="int8", shape=list(arr.shape),
                                  itemsize=1,
                                  element_in_row=int(np.prod(arr.shape[1:])),
                                  row_size=int(np.prod(arr.shape[1:])))
                (root / f"{uid}.{name}").write_bytes(
                    arr.astype(np.int8).tobytes())

        put("mixture", mixture, scale=30000.0)
        put("gt_spk_direct_early_echoes", direct, scale=30000.0)
        put("gt_noise", noise, scale=30000.0)
        act = (np.abs(direct[:, 0, :]) > 1e-4).astype(np.int8)
        put("gt_spk_activity_scores", act)
        meta = dict(index_name=None, index_value=uid, columns=cols)
        (root / f"{uid}.json").write_text(json.dumps(meta))
    (root / "dataset-000000.map").write_text(json.dumps(utt_map))
    return root


def fixture_train_cfg(out_dir: str, iters: int = 400):
    from notsofar_tpu.training.config import (ConformerCfgM,
                                              ConformerCssCfgM, ExtractorCfgM,
                                              NnetCfgM, TrainCfg)
    return TrainCfg(
        train_dir="band_train", val_dir="band_val", out_dir=out_dir,
        single_channel=True,
        segment_len_secs=1.0,
        global_batch_size=8,
        learning_rate=2e-3, is_debug=True,
        loss_name="mask", base_loss_name="l1", clip_gt_to_mixture=True,
        calc_side_info=False,
        log_params_mlflow=False, log_metrics_mlflow=False,
        eval_every=(100, "iterations"), save_every=(100, "iterations"),
        scheduler_step_every=(1, "iterations"),
        stop_after=(iters, "iterations"),
        conformer_css_cfg=ConformerCssCfgM(
            extractor_conf=ExtractorCfgM(ipd_index=""),
            nnet_conf=NnetCfgM(
                conformer_conf=ConformerCfgM(
                    attention_dim=32, attention_heads=4, linear_units=64,
                    num_blocks=2, kernel_size=5, dropout_rate=0.0),
                in_features=257)))


def si_snr_db(est: np.ndarray, ref: np.ndarray) -> float:
    """Scale-invariant SNR (dB) of est against ref."""
    ref = ref - ref.mean()
    est = est - est.mean()
    proj = (np.dot(est, ref) / (np.dot(ref, ref) + 1e-12)) * ref
    noise = est - proj
    return float(10 * np.log10(
        (np.dot(proj, proj) + 1e-12) / (np.dot(noise, noise) + 1e-12)))


def separate_streams(model, variables, mixture_mic0: np.ndarray) -> np.ndarray:
    """mixture [T] -> separated stream waveforms [S+N, T] via masks+iSTFT."""
    import jax.numpy as jnp
    stft_c = model.stft(jnp.asarray(mixture_mic0)[None])        # [1,F,T]
    masks = model.separate(variables, stft_c)
    spk = masks["spk_masks"]                                     # [1,F,T,S]
    noi = masks["noise_masks"]                                   # [1,F,T,N]
    all_masks = jnp.concatenate([spk, noi], axis=-1)[0]          # [F,T,K]
    outs = []
    for k in range(all_masks.shape[-1]):
        masked = stft_c[0] * all_masks[..., k]
        outs.append(np.asarray(model.istft(masked[None]))[0])
    return np.stack(outs)


def evaluate(model, variables, seed=7777, n_eval=4):
    """Held-out per-speaker best-stream SI-SNR improvement (dB)."""
    rng = np.random.RandomState(seed)
    imps = {0: [], 1: []}
    for _ in range(n_eval):
        mixture, direct, _ = make_utterance(rng)
        mix0 = mixture[:, 0]
        streams = separate_streams(model, variables, mix0)
        for s in (0, 1):
            ref = direct[:, 0, s]
            if np.dot(ref, ref) < 1e-8:
                continue
            base = si_snr_db(mix0[: streams.shape[1]],
                             ref[: streams.shape[1]])
            best = max(si_snr_db(st, ref[: len(st)]) for st in streams)
            imps[s].append(best - base)
    return {s: float(np.mean(v)) for s, v in imps.items() if v}


def main():
    # Force the CPU backend: the environment's sitecustomize registers the
    # axon TPU plugin at interpreter startup, so JAX_PLATFORMS=cpu is
    # ignored; jax.config.update works as long as no computation ran yet
    # (same recipe as tests/conftest.py). The model is tiny — CPU training
    # is faster than per-step host<->device transfers over the tunnel.
    import jax
    jax.config.update("jax_platforms", "cpu")
    from notsofar_tpu.utils.jax_setup import setup_jax
    setup_jax()
    from notsofar_tpu.css.inference import save_css_model
    from notsofar_tpu.training.dataset import (SegmentSplitter,
                                               SimulatedDataset)
    from notsofar_tpu.training.train import (get_model, init_state,
                                             make_optimizer,
                                             restore_checkpoint,
                                             run_training_css)
    import jax

    tmp = Path(tempfile.mkdtemp(prefix="band_fixture_"))
    train_root = write_band_dataset(tmp / "band_train", n_utts=24, seed=1)
    val_root = write_band_dataset(tmp / "band_val", n_utts=4, seed=2)

    out_dir = tmp / "out"
    cfg = fixture_train_cfg(str(out_dir), iters=400)

    seg_len = int(cfg.segment_len_secs * FS)
    splitter = SegmentSplitter(min_overlap=seg_len // 4,
                               max_overlap=seg_len // 2,
                               pr_force_align=0.5,
                               desired_segm_len=seg_len)
    needed = ["mixture", "gt_spk_direct_early_echoes", "gt_noise"]
    train_set = SimulatedDataset(str(train_root), splitter, seed=11,
                                 single_channel=True, needed_columns=needed)
    val_set = SimulatedDataset(str(val_root), splitter, seed=12,
                               single_channel=True, needed_columns=needed)

    run_training_css(cfg, "", "", str(out_dir),
                     datasets=(train_set, val_set))

    model = get_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, tx, jax.random.PRNGKey(0))
    state, _ = restore_checkpoint(str(out_dir), state)
    print(f"restored step {int(state.step)}")
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats),
                 "constants": jax.device_get(state.constants)}

    imps = evaluate(model, variables)
    print(f"held-out SI-SNR improvement (dB): {imps}")
    if min(imps.values()) < 6.0:
        raise SystemExit("fixture quality below the 6 dB bar; not saving")

    fixture_dir = REPO / "tests" / "fixtures" / "css_tiny_trained"
    save_css_model(fixture_dir, variables, cfg)
    size = sum(p.stat().st_size for p in fixture_dir.iterdir())
    print(f"saved {fixture_dir} ({size / 1024:.0f} KiB)")


if __name__ == "__main__":
    main()
