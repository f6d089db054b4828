"""CSS training CLI.

Rebuild of /root/reference/run_training_css_local.py +
css/training/train.py:658-699: loads a TrainCfg yaml (debug_mc.yaml by
default — 90 iterations on the tiny sample data) and runs the trainer.
"""
import argparse
import os
import shutil
from pathlib import Path

from notsofar_tpu.utils.jax_setup import setup_jax
setup_jax()
from notsofar_tpu.parallel.mesh import maybe_initialize_distributed
from notsofar_tpu.training.config import TrainCfg
from notsofar_tpu.training.train import run_training_css
from notsofar_tpu.utils.conf import load_yaml_to_dataclass
from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("run_training")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--conf", default=None)
    parser.add_argument("--data_root_in", default=None)
    parser.add_argument("--data_root_out", default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint in out_dir")
    args = parser.parse_args()

    maybe_initialize_distributed()

    project_dir = Path(__file__).parent
    conf_path = str(project_dir / "configs" / "train_css" / "debug_mc.yaml") \
        if args.conf is None else args.conf
    data_root_in = project_dir if args.data_root_in is None \
        else Path(args.data_root_in)
    data_root_out = project_dir / "artifacts" / "outputs" / "css_train" \
        if args.data_root_out is None else Path(args.data_root_out)

    train_cfg = load_yaml_to_dataclass(conf_path, TrainCfg)
    train_dir = data_root_in / train_cfg.train_dir
    val_dir = data_root_in / train_cfg.val_dir
    out_dir = data_root_out / train_cfg.out_dir

    _LOG.info(f"Copying the config to {out_dir}")
    os.makedirs(out_dir, exist_ok=True)
    shutil.copy(conf_path, str(Path(out_dir) / "config.yaml"))

    run_training_css(train_cfg, train_dir=str(train_dir),
                     val_dir=str(val_dir), out_dir=str(out_dir),
                     resume=args.resume)


if __name__ == "__main__":
    main()
