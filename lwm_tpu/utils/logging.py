"""Metrics logger: W&B-compatible surface with a JSONL fallback.

Replaces tux.WandBLogger (SURVEY.md §5.5). When wandb is unavailable (as in
this environment) metrics stream to ``<output_dir>/<experiment_id>/metrics.jsonl``.
Proc0-gated by default (``enable`` ctor arg), like the reference train.py:64-68.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import ml_collections

from lwm_tpu.utils.flags import flatten_config_dict


class MetricsLogger:
    @staticmethod
    def get_default_config(updates=None):
        config = ml_collections.ConfigDict()
        config.online = False
        config.prefix = "lwm_tpu"
        config.project_id = ""
        config.experiment_id = ml_collections.config_dict.placeholder(str)
        config.append_uuid = True
        config.experiment_note = ml_collections.config_dict.placeholder(str)
        config.output_dir = "/tmp/lwm_tpu"
        config.wandb_dir = ""
        config.profile_dir = ""
        if updates is not None:
            config.update(ml_collections.ConfigDict(updates).copy_and_resolve_references())
        return config

    def __init__(self, config, variant, enable=True):
        self.config = self.get_default_config(config)
        self.enable = enable
        self.variant = variant

        if self.config.experiment_id is None or self.config.experiment_id == "":
            self.config.experiment_id = uuid.uuid4().hex
        elif self.config.append_uuid:
            self.config.experiment_id = f"{self.config.experiment_id}--{uuid.uuid4().hex[:8]}"

        self._output_dir = os.path.join(self.config.output_dir, self.config.experiment_id)
        self._wandb_run = None
        self._jsonl = None
        if self.enable:
            os.makedirs(self._output_dir, exist_ok=True)
            if self.config.online:
                try:
                    import wandb

                    self._wandb_run = wandb.init(
                        project=self.config.project_id or None,
                        id=self.config.experiment_id,
                        notes=self.config.experiment_note,
                        config=flatten_config_dict(ml_collections.ConfigDict(variant))
                        if variant
                        else None,
                        dir=self.config.wandb_dir or None,
                        resume="allow",
                    )
                except Exception:
                    self._wandb_run = None
            if self._wandb_run is None:
                self._jsonl = open(os.path.join(self._output_dir, "metrics.jsonl"), "a")
                with open(os.path.join(self._output_dir, "variant.json"), "w") as f:
                    json.dump(_to_jsonable(variant), f, indent=2, default=str)

    def log(self, metrics, step=None):
        if not self.enable:
            return
        if self._wandb_run is not None:
            self._wandb_run.log(metrics, step=step)
        else:
            record = {"_time": time.time()}
            if step is not None:
                record["_step"] = step
            record.update({k: _to_jsonable(v) for k, v in metrics.items()})
            self._jsonl.write(json.dumps(record, default=str) + "\n")
            self._jsonl.flush()

    @property
    def experiment_id(self):
        return self.config.experiment_id

    @property
    def output_dir(self):
        return self._output_dir


def _to_jsonable(v):
    if hasattr(v, "item") and getattr(v, "ndim", 1) == 0:
        return v.item()
    if hasattr(v, "tolist"):
        return v.tolist()
    if isinstance(v, ml_collections.ConfigDict):
        return v.to_dict()
    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    return v


# Backwards-friendly alias matching the reference's name.
WandBLogger = MetricsLogger
