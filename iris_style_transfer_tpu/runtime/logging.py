"""Metric logging — wandb-compatible namespaces with a local JSONL backend.

The reference logs everything to wandb with hierarchical keys like
``train/c1/accu`` and ``test/pre/c2/mis/f1`` (``utils.py:74-109`` feeding
``iris_style_transfer_openeds2019.py:186-197``).  The same metric names are
preserved here so dashboards compare 1:1; backends: wandb when available
and enabled, plus an always-on local JSONL sink (SURVEY.md §5.5).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np


def _to_scalar(v):
    if hasattr(v, "item"):
        try:
            return v.item()
        except Exception:
            return float(np.asarray(v).mean())
    return v


class MetricLogger:
    def __init__(
        self,
        project: str,
        name: str,
        config: dict | None = None,
        out_dir: str = "saved/logs",
        use_wandb: bool | None = None,
    ):
        self.project = project
        self.name = name
        self.step = 0
        os.makedirs(out_dir, exist_ok=True)
        safe = name.replace("/", "_").replace(" ", "_")
        self.path = os.path.join(out_dir, f"{project}__{safe}.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb is None:
            use_wandb = os.environ.get("IST_TPU_WANDB", "0") == "1"
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project=project, name=name, config=config or {}, anonymous="allow")
            except Exception:
                self._wandb = None
        if config:
            self._fh.write(json.dumps({"_config": {k: str(v) for k, v in config.items()}}) + "\n")
            self._fh.flush()

    def log(self, metrics: dict[str, Any]) -> None:
        # bulk-fetch device values first: jax.device_get starts the host
        # copies for EVERY leaf before blocking on any, so a dict of N
        # device scalars costs ~one transfer latency instead of N
        # serialized ~150 ms tunnel round trips through the per-key
        # ``_to_scalar`` path (round-5 drain attribution)
        dev_keys = [k for k, v in metrics.items() if hasattr(v, "copy_to_host_async")]
        if dev_keys:
            import jax

            fetched = jax.device_get([metrics[k] for k in dev_keys])
            metrics = {**metrics, **dict(zip(dev_keys, fetched))}
        rec = {k: _to_scalar(v) for k, v in metrics.items()}
        rec["_step"] = self.step
        rec["_time"] = time.time()
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items() if not k.startswith("_")})
        self.step += 1

    def finish(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
