"""Tracing / metrics / logging (SURVEY §5 auxiliary subsystems).

The reference has wall-clock helpers + it/s logging + optional wandb
(src/trainer.py:55-109, src/utils.py:13-21); TPU-natively this adds
``jax.profiler`` traces and device memory polling (the NVML analog).
"""

from __future__ import annotations

import contextlib
import json
import logging
import math
import time
from pathlib import Path
from typing import Dict, Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def profile_trace(out_dir: str):
    """XLA/TPU profiler trace (view with TensorBoard or xprof)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory() -> Dict[str, int]:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return {k: int(v) for k, v in stats.items() if "bytes" in k}
    except Exception:
        return {}


class ThroughputMeter:
    """it/s, tokens/s, Ksamples counters (reference trainer.py:84-93)."""

    def __init__(self):
        self.t_last = time.time_ns()
        self.total_samples = 0
        self.total_tokens = 0

    def step(self, batch_size: int, tokens: int) -> Dict[str, float]:
        now = time.time_ns()
        dt = max((now - self.t_last) / 1e9, 1e-9)
        self.t_last = now
        self.total_samples += batch_size
        self.total_tokens += tokens
        return {
            "it/s": 1.0 / dt,
            "sample/s": batch_size / dt,
            "token/s": tokens / dt,
            "Ksamples": self.total_samples / 1000.0,
        }


class TrainLogWriter:
    """Appends per-epoch lines to ``<proj_dir>/train_log.txt``
    (reference trainer.py:59-65,152-154) and optionally mirrors to wandb."""

    def __init__(self, proj_dir: str, run_config: Optional[dict] = None,
                 wandb_project: str = ""):
        Path(proj_dir).mkdir(parents=True, exist_ok=True)
        self.path = Path(proj_dir) / "train_log.txt"
        with open(self.path, "a") as f:
            f.write(f"NEW RUN {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
            if run_config:
                f.write(json.dumps(run_config, default=str) + "\n")
        self.wandb = None
        if wandb_project:
            try:
                import wandb

                self.wandb = wandb
                wandb.init(project=wandb_project, config=run_config)
            except ImportError:
                log.warning("wandb not installed; metrics go to train_log.txt only")

    def log_step(self, metrics: Dict[str, float]) -> None:
        if self.wandb is not None:
            self.wandb.log(metrics)

    def log_epoch(self, epoch: int, loss: float, lr: float) -> None:
        line = (
            f"{epoch} {loss:.6f} {math.exp(min(loss, 20)):.4f} {lr:.8f} "
            f"{time.strftime('%Y-%m-%d %H:%M:%S')}"
        )
        with open(self.path, "a") as f:
            f.write(line + "\n")
