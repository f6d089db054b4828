"""Tracing / profiling utilities.

The reference has no profiling story (SURVEY.md §5.1 — tqdm bars only);
this module adds the TPU-native one:

* `trace(dir)` — context manager around jax.profiler traces (view in
  TensorBoard / Perfetto);
* `StageTimer` — per-stage wall-clock + RTFx accounting for the inference
  pipeline (the BASELINE metric is RTFx = audio seconds per wall second).
"""
import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

from notsofar_tpu.utils.logging_def import get_logger

_LOG = get_logger("profiling")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope; writes a TensorBoard-compatible trace."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        _LOG.info(f"profiler trace written to {log_dir}")


@dataclass
class StageTimer:
    """Accumulates wall time per pipeline stage and reports RTFx."""
    audio_seconds: float = 0.0
    stage_seconds: Dict[str, float] = field(default_factory=dict)
    _t0: Optional[float] = None
    _stage: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.stage_seconds[name] = self.stage_seconds.get(name, 0.0) + dt

    def add_audio(self, seconds: float):
        self.audio_seconds += seconds

    def report(self) -> Dict:
        total = sum(self.stage_seconds.values())
        out = {
            "audio_seconds": round(self.audio_seconds, 2),
            "wall_seconds": round(total, 2),
            "rtfx": round(self.audio_seconds / total, 2) if total else None,
            "stages": {k: dict(seconds=round(v, 2),
                               rtfx=round(self.audio_seconds / v, 2) if v else None)
                       for k, v in self.stage_seconds.items()},
        }
        return out

    def log(self):
        _LOG.info(f"RTFx report: {json.dumps(self.report())}")
