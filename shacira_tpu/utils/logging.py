"""Experiment logging: TensorBoard scalars/images, parquet records, wandb.

Covers the reference's observability surface (SURVEY §5): TensorBoard
SummaryWriter (base_trainer.py:625-665), parquet append-only experiment
records (multiview_trainer.py:316-323), and optional wandb (gated — absent
in this environment)."""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np


class ExperimentLogger:
    """TB + parquet + stdout logging with graceful degradation."""

    def __init__(self, log_dir: str, exp_name: str = 'exp',
                 use_tensorboard: bool = True, use_wandb: bool = False):
        self.log_dir = log_dir
        self.exp_name = exp_name
        os.makedirs(log_dir, exist_ok=True)
        self.writer = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.writer = SummaryWriter(log_dir=log_dir)
            except Exception:
                self.writer = None
        self.wandb = None
        if use_wandb:
            try:
                import wandb
                wandb.init(project='shacira_tpu', name=exp_name, dir=log_dir)
                self.wandb = wandb
            except Exception:
                self.wandb = None
        self._records = []

    def scalar(self, tag: str, value: float, step: int):
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        if self.wandb is not None:
            self.wandb.log({tag: value}, step=step)

    def image(self, tag: str, img_hwc: np.ndarray, step: int):
        if self.writer is not None:
            chw = np.transpose(np.clip(img_hwc, 0, 1), (2, 0, 1))
            self.writer.add_image(tag, chw, step)
        if self.wandb is not None:
            self.wandb.log({tag: self.wandb.Image(img_hwc)}, step=step)

    def record(self, metrics: Dict):
        """Append an experiment record row (parquet on close)."""
        self._records.append({'timestamp': time.time(),
                              'exp_name': self.exp_name, **metrics})

    def close(self):
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
        if self._records:
            try:
                import pandas as pd
                df = pd.DataFrame(self._records)
                path = os.path.join(self.log_dir, 'logs.parquet')
                if os.path.exists(path):
                    df = pd.concat([pd.read_parquet(path), df])
                df.to_parquet(path, index=False)
            except Exception:
                import json
                with open(os.path.join(self.log_dir, 'logs.json'), 'w') as f:
                    json.dump(self._records, f)
        if self.wandb is not None:
            self.wandb.finish()
