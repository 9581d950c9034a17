"""Optional-sink training metrics logging (tensorboard and/or wandb).

Capability parity with the reference's experiment tracking
(/root/reference/sdfest/vae/scripts/train.py:9,134-160 uses wandb;
initialization/scripts/train.py logs to tensorboard): both sinks are
optional here — tensorboard activates when the config sets ``log_dir``,
wandb when the config sets ``wandb: true`` AND the package is importable
(it is not bundled; deployments are frequently air-gapped).  All logging
calls are no-ops when no sink is active, so training never depends on
either package.
"""
from __future__ import annotations

from typing import Any, Dict, Optional


class MetricsLogger:
    """Scalar/figure logger fanning out to the configured sinks."""

    def __init__(self, config: Dict[str, Any], run_name: str):
        self._tb = None
        self._wandb = None
        self._csv = None
        if config.get("scalar_csv"):
            # plain-file sink for air-gapped runs: one `step,name,value`
            # row per scalar, flushed per write so curves survive an
            # interrupted run (the reference relies on wandb/tensorboard
            # for this; deployments here frequently have neither)
            import os

            path = str(config["scalar_csv"])
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._csv = open(path, "a", buffering=1)
            if self._csv.tell() == 0:
                self._csv.write("step,name,value\n")
        if config.get("log_dir") is not None:
            try:
                import os

                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(config["log_dir"], run_name)
                )
            except ImportError:
                print("tensorboard unavailable; tensorboard logging disabled")
        if config.get("wandb", False):
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=config.get("wandb_project", "sdfest_tpu"),
                    name=run_name,
                    config={
                        k: v
                        for k, v in config.items()
                        if isinstance(v, (int, float, str, bool))
                    },
                )
            except ImportError:
                print("wandb unavailable; wandb logging disabled")

    @property
    def active(self) -> bool:
        """Whether any sink is active."""
        return (
            self._tb is not None
            or self._wandb is not None
            or self._csv is not None
        )

    def add_scalar(self, name: str, value: float, step: int) -> None:
        if self._csv is not None:
            self._csv.write(f"{step},{name},{value}\n")
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)
        if self._wandb is not None:
            self._wandb.log({name: value}, step=step)

    def add_figure(self, name: str, figure, step: int) -> None:
        if self._tb is not None:
            self._tb.add_figure(name, figure, step)
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(figure)}, step=step)

    def close(self) -> None:
        if self._csv is not None:
            self._csv.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def make_logger(config: Dict[str, Any], run_name: str) -> Optional[MetricsLogger]:
    """A :class:`MetricsLogger`, or None when no sink is configured."""
    logger = MetricsLogger(config, run_name)
    return logger if logger.active else None
