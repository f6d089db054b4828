"""CSS trainer: data-parallel jit train loop with orbax checkpointing.

Rebuild of run_training_css (/root/reference/css/training/train.py:101-408),
TPU-first:

* DP via a Mesh + NamedSharding: batch sharded over 'dp', params
  replicated; the gradient all-reduce is inserted by XLA under jit (the
  DDP/NCCL equivalent with no framework code);
* one jitted train step fuses mic-shift augmentation, STFT feature
  extraction, the Conformer forward, the PIT loss, AdamW and grad clip;
* AdamW matches torch semantics (decoupled weight decay on all params,
  betas 0.9/0.999, eps 1e-8); grads are clipped by global norm first
  (train.py:313-318);
* the scheduler step counter is decoupled from the optimizer step
  (`scheduler_step_every` frequency tuples), the LR enters the step as a
  scalar;
* checkpoints hold params/batch_stats/opt_state/step — restoring resumes
  mid-training exactly (the reference saves optimizer state but has no
  resume path, SURVEY §5.4);
* metrics are averaged over the global batch on device; mlflow logging is
  import-guarded like the reference (train.py:615-649).
"""
import dataclasses
import os
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from notsofar_tpu.models.css_wrapper import CssModel
from notsofar_tpu.parallel.mesh import (make_mesh, replicate_tree,
                                        shard_batch)
from notsofar_tpu.training.augmentations import mic_shift_augment
from notsofar_tpu.training.config import TrainCfg
from notsofar_tpu.training.dataset import (DataLoader, SegmentSplitter,
                                           SimulatedDataset)
from notsofar_tpu.training.losses import css_loss
from notsofar_tpu.training.schedulers import make_schedule
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("train")


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    constants: Any
    opt_state: Any
    step: jnp.ndarray


def get_model(cfg: TrainCfg) -> CssModel:
    if cfg.model_name != "css_with_conformer":
        raise ValueError(f"Unknown model name: {cfg.model_name}!")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]
    return CssModel(cfg.conformer_css_cfg.freeze(), dtype=dtype)


def make_optimizer(cfg: TrainCfg) -> optax.GradientTransformation:
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(cfg.clip_grad_norm)
            if cfg.clip_grad_norm > 0 else optax.identity(),
            optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=cfg.weight_decay)))(
        learning_rate=cfg.learning_rate)
    return tx


def make_train_step(model: CssModel, tx, cfg: TrainCfg):
    is_mc = not cfg.single_channel

    def loss_fn(params, state: TrainState, batch, rng):
        variables = {"params": params, "batch_stats": state.batch_stats,
                     "constants": state.constants}
        res, new_vars = model.forward(
            variables, batch["mixture"], deterministic=False,
            use_running_average=False, mutable=["batch_stats"],
            rngs={"dropout": rng})
        loss, side = css_loss(model, res, batch, cfg.loss_name,
                              cfg.base_loss_name, cfg.noise_weight,
                              cfg.clip_gt_to_mixture, cfg.calc_side_info)
        return loss, (new_vars["batch_stats"], side)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, lr, rng):
        aug_rng, drop_rng = jax.random.split(rng)
        if is_mc:
            batch = mic_shift_augment(batch, aug_rng)
        (loss, (new_bs, side)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state, batch, drop_rng)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        metrics = {"loss": loss}
        if side is not None:
            metrics.update(side)
        return new_state, metrics

    @jax.jit
    def eval_step(state: TrainState, batch):
        variables = {"params": state.params, "batch_stats": state.batch_stats,
                     "constants": state.constants}
        res = model.forward(variables, batch["mixture"], deterministic=True,
                            use_running_average=True)
        loss, side = css_loss(model, res, batch, cfg.loss_name,
                              cfg.base_loss_name, cfg.noise_weight,
                              cfg.clip_gt_to_mixture, cfg.calc_side_info)
        metrics = {"loss": loss}
        if side is not None:
            metrics.update(side)
        return metrics

    return train_step, eval_step


def init_state(model: CssModel, cfg: TrainCfg, tx, rng) -> TrainState:
    variables = model.init(rng)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        constants=variables.get("constants", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32))


# --------------------------------------------------------------------------
# checkpointing (orbax)
# --------------------------------------------------------------------------

def save_checkpoint(out_dir: str, state: TrainState, scheduler_step: int,
                    keep: int = 3):
    import orbax.checkpoint as ocp
    path = Path(out_dir).absolute() / "checkpoints"
    with ocp.CheckpointManager(
            path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)) as mgr:
        step = int(state.step)
        mgr.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(
                dict(params=state.params, batch_stats=state.batch_stats,
                     constants=state.constants, opt_state=state.opt_state,
                     step=state.step)),
            meta=ocp.args.JsonSave({"scheduler_step": scheduler_step})))
        mgr.wait_until_finished()
    return str(path)


def restore_checkpoint(out_dir: str, state: TrainState
                       ) -> Tuple[TrainState, int]:
    """Restore the latest checkpoint into `state` (exact mid-train resume)."""
    import orbax.checkpoint as ocp
    path = Path(out_dir).absolute() / "checkpoints"
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return state, 0
        tpl = dict(params=state.params, batch_stats=state.batch_stats,
                   constants=state.constants, opt_state=state.opt_state,
                   step=state.step)
        restored = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(tpl),
            meta=ocp.args.JsonRestore()))
    st = restored["state"]
    new_state = state.replace(params=st["params"],
                              batch_stats=st["batch_stats"],
                              constants=st["constants"],
                              opt_state=st["opt_state"], step=st["step"])
    return new_state, int(restored["meta"]["scheduler_step"])


# --------------------------------------------------------------------------
# the loop
# --------------------------------------------------------------------------

def _is_every(freq: Optional[Tuple], epoch: int, iter_in_epoch: int,
              num_batches: int, total_iters: int) -> bool:
    if freq is None:
        return False
    n, unit = freq
    if unit == "epochs":
        return epoch % n == 0 and iter_in_epoch == num_batches
    if unit == "iterations":
        return total_iters % n == 0
    raise ValueError(f"Unknown frequency type: {unit}!")


def run_training_css(train_cfg: TrainCfg, train_dir: str, val_dir: str,
                     out_dir: str, resume: bool = False,
                     datasets=None) -> str:
    """Full training loop. Returns out_dir (parity with train.py:101-408)."""
    cfg = train_cfg
    _LOG.info("Starting training")
    _LOG.info(f"{cfg}")
    attempt_load_mlflow()
    if cfg.log_params_mlflow:
        log_params_to_mlflow(cfg)

    mesh = make_mesh()
    _LOG.info(f"Mesh: {mesh} over {len(jax.devices())} devices")

    model = get_model(cfg)
    tx = make_optimizer(cfg)
    rng = jax.random.PRNGKey(cfg.seed + 40973)
    state = init_state(model, cfg, tx, rng)
    scheduler_step = 0
    if resume:
        state, scheduler_step = restore_checkpoint(out_dir, state)
        _LOG.info(f"Resumed at step {int(state.step)} "
                  f"(scheduler step {scheduler_step})")
    state = replicate_tree(mesh, state)

    schedule = make_schedule(cfg.scheduler_name, cfg.scheduler_step_lr_cfg,
                             cfg.scheduler_linear_warmup_decay_cfg)
    train_step, eval_step = make_train_step(model, tx, cfg)

    # datasets
    if datasets is None:
        seg_len = int(cfg.segment_len_secs * cfg.fs)
        splitter = SegmentSplitter(
            min_overlap=int(seg_len * cfg.segment_min_overlap_factor),
            max_overlap=int(seg_len * cfg.segment_max_overlap_factor),
            pr_force_align=cfg.segment_pr_force_align,
            desired_segm_len=seg_len)
        needed = ["mixture", "gt_spk_direct_early_echoes", "gt_noise"]
        train_set = SimulatedDataset(
            train_dir, splitter, seed=44697134,
            sample_frac=cfg.train_set_cfg.sample_frac,
            max_urls=cfg.train_set_cfg.max_urls,
            single_channel=cfg.single_channel, needed_columns=needed)
        val_set = SimulatedDataset(
            val_dir, splitter, seed=836591172,
            sample_frac=cfg.val_set_cfg.sample_frac,
            max_urls=cfg.val_set_cfg.max_urls,
            single_channel=cfg.single_channel, needed_columns=needed)
    else:
        train_set, val_set = datasets
    _LOG.info(f"Training set: {len(train_set)} segments, "
              f"{train_set.get_length_seconds() / 3600:.4} hours")
    _LOG.info(f"Validation set: {len(val_set)} segments, "
              f"{val_set.get_length_seconds() / 3600:.4} hours")

    workers = 0 if cfg.is_debug else cfg.dataloader_workers
    local_batch = cfg.global_batch_size // jax.process_count()
    # drop_last=False matches the reference's torch DataLoader default
    # (train.py:220-228) — its debug config yields fewer segments than one
    # batch; ragged batches fall back to replicated sharding.
    train_loader = DataLoader(train_set, local_batch, shuffle=True,
                              seed=cfg.seed + 46117, num_threads=workers,
                              drop_last=False,
                              shard_index=jax.process_index(),
                              num_shards=jax.process_count())
    val_loader = DataLoader(val_set, local_batch, shuffle=False,
                            num_threads=workers, drop_last=False,
                            shard_index=jax.process_index(),
                            num_shards=jax.process_count())

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(state.params))
    _LOG.info(f"Model size: {n_params:,} params")

    total_iters = 1
    num_instances = 0
    pending_metrics: list = []  # device-side scalars; synced only at eval
    stop = False
    epoch = 0
    host_rng = np.random.RandomState(cfg.seed + 2112)

    def drain_metrics() -> Dict[str, float]:
        """Sum the pending device metrics (single host sync).

        Multi-process note: each metric is the output of a jitted SPMD step
        over the *globally sharded* batch, so it is already a global value,
        fully replicated across processes — the reference's explicit
        reduce-to-rank0 (train.py:581-612) has no equivalent work to do here.
        Proven by tests/test_multiprocess.py (2-process loss == 1-process).
        """
        nonlocal pending_metrics
        out: Dict[str, float] = {}
        for bs, m in pending_metrics:
            for k, v in m.items():
                out[k] = out.get(k, 0.0) + bs * float(v)
        pending_metrics = []
        return out

    while not stop:
        epoch += 1
        _LOG.info(f"Starting epoch {epoch}")
        train_loader.set_epoch(epoch)
        num_batches = len(train_loader)
        if num_batches == 0:
            raise RuntimeError("empty training loader (batch > dataset?)")

        for iter_in_epoch, batch in enumerate(train_loader, start=1):
            if stop:
                break
            batch = {k: v for k, v in batch.items()
                     if isinstance(v, np.ndarray) and v.dtype != np.int8}
            batch = shard_batch(mesh, batch)
            lr = cfg.learning_rate * schedule(scheduler_step)
            step_rng = jax.random.PRNGKey(host_rng.randint(1 << 31))
            state, metrics = train_step(state, batch,
                                        jnp.asarray(lr, jnp.float32),
                                        step_rng)
            if iter_in_epoch % 10 == 0:
                _LOG.info(f"ep{epoch} it{iter_in_epoch}/{num_batches} "
                          f"tot_it{total_iters}: .")
            # metrics stay on device until the next eval boundary — forcing
            # them to host every step would serialize the async dispatch
            # pipeline (disk reads and transfers overlap the running step)
            pending_metrics.append((cfg.global_batch_size, metrics))
            num_instances += cfg.global_batch_size

            every = partial(_is_every, epoch=epoch,
                            iter_in_epoch=iter_in_epoch,
                            num_batches=num_batches, total_iters=total_iters)
            if every(cfg.scheduler_step_every):
                scheduler_step += 1
            if every(cfg.stop_after):
                _LOG.info("Stopping training")
                stop = True
            if every(cfg.eval_every) or stop:
                _LOG.info("Evaluating")
                acc = drain_metrics()
                assert np.isfinite(acc.get("loss", 0.0)), "loss is not finite!"
                val_metrics = eval_model(eval_step, state, val_loader, mesh)
                train_metrics = {f"train/{k}": v / max(num_instances, 1)
                                 for k, v in acc.items()}
                all_metrics = {**train_metrics,
                               **{f"val/{k}": v for k, v in val_metrics.items()},
                               "lr": lr,
                               "train/num_instances": num_instances}
                _LOG.info(f"ep{epoch} it{iter_in_epoch}: {all_metrics}")
                if cfg.log_metrics_mlflow:
                    log_metrics_to_mlflow(all_metrics, step=total_iters)
                num_instances = 0
            if every(cfg.save_every) or stop:
                path = save_checkpoint(out_dir, jax.device_get(state),
                                       scheduler_step,
                                       keep=cfg.checkpoint_keep)
                _LOG.info(f"Saved checkpoint at step {int(state.step)} "
                          f"to {path}")
            total_iters += 1

    _LOG.info("Finished training")
    return out_dir


def eval_model(eval_step, state, val_loader, mesh) -> Dict[str, float]:
    """Average metrics over the validation loader (train.py:528-568).

    Multi-process: the loader pads shards to equal sizes so every process
    runs the same number of eval steps (SPMD lockstep), and each jitted
    metric is already the global-batch mean (replicated across processes);
    the per-batch weights below are process-local sizes, which are equal
    across processes and therefore cancel in the weighted average.
    """
    sums: Dict[str, float] = {}
    n = 0
    for it, batch in enumerate(val_loader):
        batch = {k: v for k, v in batch.items()
                 if isinstance(v, np.ndarray) and v.dtype != np.int8}
        bs = batch["mixture"].shape[0]
        batch = shard_batch(mesh, batch)
        metrics = eval_step(state, batch)
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + bs * float(v)
        n += bs
    return {k: v / max(n, 1) for k, v in sums.items()}


# --------------------------------------------------------------------------
# optional mlflow (import-guarded, train.py:615-649)
# --------------------------------------------------------------------------
mlflow = None


def attempt_load_mlflow():
    global mlflow
    if mlflow is None:
        try:
            mlflow = __import__("mlflow")
        except ImportError:
            pass


def log_params_to_mlflow(d, prefix=""):
    if mlflow is None:
        return
    for f in dataclasses.fields(d):
        value = getattr(d, f.name)
        name = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(value):
            log_params_to_mlflow(value, prefix=name + ".")
        else:
            mlflow.log_param(name, value)


def log_metrics_to_mlflow(metrics: dict, step: int):
    if mlflow is None:
        return
    mlflow.log_metrics(metrics, step=step)
