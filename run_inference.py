"""Inference CLI: run the full meeting-transcription pipeline.

Rebuild of /root/reference/run_inference.py with the same config scenarios:

    python run_inference.py --config-name dev_set_mc_debug
    python run_inference.py --config-name full_dev_set_mc
    python run_inference.py --config-name full_dev_set_sc

Data/model resolution: downloads via azcopy when available, otherwise uses
NOTSOFAR_DATA_ROOT-mounted local data, or explicit --meetings-dir /
--models-dir paths (useful in zero-egress environments).
"""
import argparse
from pathlib import Path
from pprint import pprint

from notsofar_tpu.utils.jax_setup import setup_jax
setup_jax()
from notsofar_tpu.inference_pipeline.inference import (FetchFromCacheCfg,
                                                       InferenceCfg,
                                                       inference_pipeline)
from notsofar_tpu.utils.azure_storage import (download_meeting_subset,
                                              download_models)
from notsofar_tpu.utils.conf import load_yaml_to_dataclass


def get_project_root() -> Path:
    return Path(__file__).parent


def load_config(config_name: str) -> InferenceCfg:
    """config name -> yaml + session_query (run_inference.py:18-48)."""
    root = get_project_root()
    if config_name == "full_dev_set_mc":
        conf_file = root / "configs/inference/inference_v1.yaml"
        session_query = "is_mc == True"
    elif config_name == "full_dev_set_sc":
        conf_file = root / "configs/inference/inference_v1.yaml"
        session_query = "is_mc == False"
    elif config_name == "dev_set_mc_debug":
        conf_file = root / "configs/inference/debug_inference.yaml"
        session_query = ('device_name == "plaza_0" and is_mc == True and '
                         'meeting_id == "MTG_30860"')
    else:
        raise ValueError(f"unknown config name: {config_name}")

    cfg: InferenceCfg = load_yaml_to_dataclass(str(conf_file), InferenceCfg)
    if session_query is not None:
        assert cfg.session_query is None, "overriding session_query from yaml"
        cfg.session_query = session_query
    return cfg


def main(config_name: str, output_dir: str = "", meetings_dir: str = "",
         models_dir: str = ""):
    root = get_project_root()
    cfg = load_config(config_name)

    if not meetings_dir:
        meetings_root = root / "artifacts" / "meeting_data"
        meetings_dir = download_meeting_subset(
            subset_name="dev_set", version="240825.1_dev1",
            destination_dir=str(meetings_root))
        if meetings_dir is None:
            raise RuntimeError(
                "failed to resolve the benchmark dataset; pass "
                "--meetings-dir or set NOTSOFAR_DATA_ROOT")
    if not models_dir:
        models_dir = download_models(
            destination_dir=str(root / "artifacts" / "css_models"))
        if models_dir is None:
            raise RuntimeError("failed to resolve CSS models; pass "
                               "--models-dir or set NOTSOFAR_DATA_ROOT")

    outputs_dir = (root if output_dir == "" else Path(output_dir)) \
        / "artifacts" / "outputs"
    exp_name = ("pass_through" if cfg.css.pass_through_ch0 else "css") \
        + "_" + cfg.asr.model_name
    outputs_dir = outputs_dir / exp_name

    pprint(f"{config_name=}")
    pprint(cfg)
    inference_pipeline(meetings_dir=str(meetings_dir),
                       models_dir=str(models_dir),
                       out_dir=str(outputs_dir), cfg=cfg,
                       cache=FetchFromCacheCfg())


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Run inference pipeline")
    parser.add_argument("--config-name", type=str, default="dev_set_mc_debug")
    parser.add_argument("--output-dir", type=str, default="")
    parser.add_argument("--meetings-dir", type=str, default="",
                        help="local meetings dir (skips download)")
    parser.add_argument("--models-dir", type=str, default="",
                        help="local CSS/whisper models dir (skips download)")
    args = parser.parse_args()
    main(args.config_name, args.output_dir, args.meetings_dir,
         args.models_dir)
