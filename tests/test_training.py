"""Training stack tests: dataset format reader, segment splitter, loss
semantics, augmentation, the jitted DP train step on the 8-device CPU mesh,
and checkpoint save/resume."""
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from notsofar_tpu.models.conformer import ConformerConfig
from notsofar_tpu.training.augmentations import batch_roll_mics, mic_shift_augment
from notsofar_tpu.training.config import (ConformerCfgM, ConformerCssCfgM,
                                          ExtractorCfgM, NnetCfgM, TrainCfg)
from notsofar_tpu.training.dataset import (DataLoader, SegmentSplitter,
                                           SimulatedDataset)
from notsofar_tpu.training.schedulers import make_schedule
from notsofar_tpu.training.config import LinearWarmupDecayCfg, SchedulerStepLrCfg

FS = 16000


def write_sim_dataset(root: Path, n_utts=4, n_samples=2 * FS, n_mics=7, n_spks=2):
    """Write a flat-partition simulated dataset in the reference byte
    format (simulated_dataset.py docstring / sample_data json)."""
    root.mkdir(parents=True, exist_ok=True)
    utt_map = {}
    rng = np.random.RandomState(0)
    for u in range(n_utts):
        uid = f"{u:04d}_utt"
        utt_map[uid] = n_samples
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

        direct = rng.randn(n_samples, n_mics, n_spks).astype(np.float32) * 0.05
        reverb = rng.randn(n_samples, n_mics, n_spks).astype(np.float32) * 0.01
        noise = rng.randn(n_samples, n_mics).astype(np.float32) * 0.01
        mixture = direct.sum(-1) + reverb.sum(-1) + noise
        put("mixture", mixture, scale=30000.0)
        put("gt_spk_direct_early_echoes", direct, scale=30000.0)
        put("gt_spk_reverb", reverb, scale=30000.0)
        put("gt_noise", noise, scale=30000.0)
        put("gt_spk_activity_scores",
            rng.randint(-1, 2, (n_samples, n_spks)))
        meta = dict(index_name=None, index_value=uid, columns=cols)
        (root / f"{uid}.json").write_text(json.dumps(meta))
    (root / "dataset-000000.map").write_text(json.dumps(utt_map))
    return root


@pytest.fixture(scope="module")
def sim_root(tmp_path_factory):
    return write_sim_dataset(tmp_path_factory.mktemp("simdata"))


def test_segment_splitter_cover():
    sp = SegmentSplitter(min_overlap=8000, max_overlap=24000,
                         pr_force_align=0.5, desired_segm_len=48000)
    for length in [48000, 60000, 100000, 200000]:
        t0s, seg_len = sp(length, seed=(1, 0))
        assert seg_len == 48000
        for t0 in t0s:
            assert 0 <= t0 and t0 + seg_len <= length
    # too-short utterance -> no segments
    t0s, _ = sp(10000, seed=(1, 0))
    assert t0s == []


def test_dataset_reads_and_scales(sim_root):
    sp = SegmentSplitter(2000, 4000, 0.5, 8000)
    ds = SimulatedDataset(str(sim_root), sp, seed=1)
    assert len(ds) > 0
    seg = ds[0]
    assert seg["mixture"].shape == (8000, 7)
    assert seg["mixture"].dtype == np.float32
    assert seg["gt_spk_direct_early_echoes"].shape == (8000, 7, 3)  # padded
    assert seg["gt_spk_activity_scores"].dtype == np.int8
    # mixture invariant: direct + reverb + noise ~ mixture (int16 rounding)
    recon = (seg["gt_spk_direct_early_echoes"].sum(-1)
             + seg["gt_spk_reverb"].sum(-1) + seg["gt_noise"])
    np.testing.assert_allclose(seg["mixture"], recon, atol=2e-3)


def test_dataset_single_channel(sim_root):
    sp = SegmentSplitter(2000, 4000, 0.5, 8000)
    ds = SimulatedDataset(str(sim_root), sp, seed=1, single_channel=True)
    seg = ds[0]
    assert seg["mixture"].shape == (8000, 1)


def test_dataloader_batches(sim_root):
    sp = SegmentSplitter(2000, 4000, 0.5, 8000)
    ds = SimulatedDataset(str(sim_root), sp, seed=1,
                          needed_columns=["mixture", "gt_noise"])
    dl = DataLoader(ds, batch_size=2, num_threads=2, seed=3)
    dl.set_epoch(1)
    batches = list(dl)
    assert len(batches) == len(ds) // 2
    assert batches[0]["mixture"].shape == (2, 8000, 7)
    # epoch seeding changes order deterministically
    dl.set_epoch(2)
    b2 = list(dl)
    assert len(b2) == len(batches)


def test_batch_roll_mics_matches_loop():
    rng = np.random.RandomState(0)
    arr = rng.randn(4, 100, 6, 3).astype(np.float32)
    shifts = np.array([0, 1, 3, 5])
    got = np.asarray(batch_roll_mics(jnp.asarray(arr), jnp.asarray(shifts)))
    for b in range(4):
        want = np.roll(arr[b], shifts[b], axis=1)
        np.testing.assert_allclose(got[b], want, rtol=1e-6)


def test_mic_shift_preserves_mic0():
    rng = np.random.RandomState(1)
    batch = {"mixture": jnp.asarray(rng.randn(3, 50, 7).astype(np.float32)),
             "gt_noise": jnp.asarray(rng.randn(3, 50, 7).astype(np.float32))}
    out = mic_shift_augment(batch, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out["mixture"][:, :, 0]),
                                  np.asarray(batch["mixture"][:, :, 0]))
    # same permutation applied to all keys
    m_in = np.asarray(batch["mixture"][:, :, 1:])
    m_out = np.asarray(out["mixture"][:, :, 1:])
    n_in = np.asarray(batch["gt_noise"][:, :, 1:])
    n_out = np.asarray(out["gt_noise"][:, :, 1:])
    for b in range(3):
        for s in range(6):
            if np.allclose(m_out[b, :, 0], m_in[b, :, (0 - s) % 6]):
                np.testing.assert_allclose(n_out[b, :, 0],
                                           n_in[b, :, (0 - s) % 6])
                break


def test_schedules():
    s = make_schedule("linear_warmup_decay", SchedulerStepLrCfg(),
                      LinearWarmupDecayCfg(warmup=10, decay=20))
    assert s(0) == 0.0 and s(5) == 0.5 and s(10) == 1.0
    assert abs(s(20) - 0.5) < 1e-9 and s(30) == 0.0
    s2 = make_schedule("step_lr", SchedulerStepLrCfg(step_size=2, gamma=0.5),
                       LinearWarmupDecayCfg())
    assert s2(0) == 1.0 and s2(2) == 0.5 and s2(4) == 0.25


def _tiny_train_cfg(tmp, sc=False):
    return TrainCfg(
        train_dir="x", val_dir="x", out_dir=str(tmp),
        single_channel=sc,
        segment_len_secs=0.5,
        global_batch_size=8,
        learning_rate=1e-3, is_debug=True,
        loss_name="mask", base_loss_name="l1", clip_gt_to_mixture=True,
        calc_side_info=True,
        log_params_mlflow=False, log_metrics_mlflow=False,
        eval_every=(4, "iterations"), save_every=(4, "iterations"),
        scheduler_step_every=(1, "iterations"),
        stop_after=(4, "iterations"),
        conformer_css_cfg=ConformerCssCfgM(
            extractor_conf=ExtractorCfgM(ipd_index="" if sc else
                                         "1,0;2,0;3,0;4,0;5,0;6,0"),
            nnet_conf=NnetCfgM(
                conformer_conf=ConformerCfgM(attention_dim=32,
                                             attention_heads=4,
                                             linear_units=64, num_blocks=2,
                                             kernel_size=5,
                                             dropout_rate=0.1),
                in_features=257 if sc else 1799)))


def test_train_loop_end_to_end(tmp_path, sim_root):
    """Four optimizer steps on the 8-device CPU mesh, eval + checkpoint."""
    from notsofar_tpu.training.dataset import SegmentSplitter, SimulatedDataset
    from notsofar_tpu.training.train import run_training_css

    cfg = _tiny_train_cfg(tmp_path)
    sp = SegmentSplitter(2000, 4000, 0.5, int(cfg.segment_len_secs * FS))
    needed = ["mixture", "gt_spk_direct_early_echoes", "gt_noise"]
    train_set = SimulatedDataset(str(sim_root), sp, seed=1,
                                 needed_columns=needed)
    val_set = SimulatedDataset(str(sim_root), sp, seed=2,
                               needed_columns=needed)
    out = run_training_css(cfg, "", "", str(tmp_path),
                           datasets=(train_set, val_set))
    assert (Path(out) / "checkpoints").exists()


def test_checkpoint_resume(tmp_path, sim_root):
    from notsofar_tpu.training.train import (get_model, init_state,
                                             make_optimizer,
                                             restore_checkpoint,
                                             save_checkpoint)
    cfg = _tiny_train_cfg(tmp_path)
    model = get_model(cfg)
    tx = make_optimizer(cfg)
    state = init_state(model, cfg, tx, jax.random.PRNGKey(0))
    state = state.replace(step=jnp.asarray(17, jnp.int32))
    save_checkpoint(str(tmp_path), state, scheduler_step=5)

    fresh = init_state(model, cfg, tx, jax.random.PRNGKey(1))
    restored, sched = restore_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 17
    assert sched == 5
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_tar_partition_dataset(tmp_path):
    """The tar-archive partition format must read identically to flat."""
    import tarfile
    flat = write_sim_dataset(tmp_path / "flat", n_utts=2, n_samples=FS)
    tar_dir = tmp_path / "tar"
    tar_dir.mkdir()
    umap = tmp_path / "utterances.map"
    umap.write_text((tmp_path / "flat" / "dataset-000000.map").read_text())
    with tarfile.open(tar_dir / "part-000000.tar", "w") as tf:
        # utterances.map inside the tar is the index (simulated_dataset.py:73-80)
        tf.add(umap, arcname="utterances.map")
        for f in sorted((tmp_path / "flat").iterdir()):
            if f.name.endswith(".map"):
                continue
            tf.add(f, arcname=f.name)
    sp = SegmentSplitter(2000, 4000, 0.5, 8000)
    ds_flat = SimulatedDataset(str(flat), sp, seed=7)
    ds_tar = SimulatedDataset(str(tar_dir), sp, seed=7)
    assert len(ds_flat) == len(ds_tar)
    a, b = ds_flat[0], ds_tar[0]
    np.testing.assert_allclose(a["mixture"], b["mixture"], atol=1e-6)
    np.testing.assert_allclose(a["gt_noise"], b["gt_noise"], atol=1e-6)
