"""Observability: wandb-compatible logger (optional), metric trackers, timing.

Replaces the reference's wandb-everywhere logging (§2.7 row 31) behind an
interface that degrades to JSONL + stdout when wandb is unavailable or
``--disable_wandb`` is set (the reference honors that flag only in
``Buffer_ROCO_Test.py:160-168``; here it works everywhere).  Also provides
``MetricLogger``/``SmoothedValue`` analogs (``utils.py:623-773``) and
jax.profiler hooks (SURVEY.md §5.1 — the reference has no tracing at all).
"""

from __future__ import annotations

import collections
import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class RunLogger:
    """wandb if available+enabled, else JSONL file + stdout."""

    def __init__(self, project: str = "DatasetDistillation",
                 name: Optional[str] = None, config: Optional[Dict] = None,
                 disable_wandb: bool = True, log_dir: str = "./logged_files"):
        self.step = 0
        self._wandb = None
        self.name = name or time.strftime("%Y-%m-%d %H:%M:%S")
        if not disable_wandb:
            try:
                # never block on network in air-gapped runs; `wandb sync`
                # uploads offline runs later
                os.environ.setdefault("WANDB_MODE", "offline")
                import wandb

                self._wandb = wandb
                wandb.init(project=project, config=config, name=name)
                self.name = wandb.run.name or self.name
            except Exception as e:
                print(f"[log] wandb unavailable ({e}); falling back to JSONL")
        os.makedirs(log_dir, exist_ok=True)
        safe = self.name.replace("/", "_").replace(":", "-").replace(" ", "_")
        self._file = open(os.path.join(log_dir, f"{safe}.jsonl"), "a")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        step = self.step if step is None else step
        clean = {}
        for k, v in metrics.items():
            if isinstance(v, (int, float, str)):
                clean[k] = v
            else:
                try:
                    clean[k] = float(np.asarray(v))
                except Exception:
                    continue
        if self._wandb is not None:
            self._wandb.log(clean, step=step)
        self._file.write(json.dumps({"step": step, **clean}) + "\n")
        self._file.flush()

    # ---- rich artifacts (reference distill.py:386-394: wandb Images /
    # Histograms / Html sentence tables per eval) ----

    def log_image(self, key: str, image, step: Optional[int] = None,
                  caption: Optional[str] = None):
        """``image``: HWC uint8/float array, or a path to a saved PNG.
        wandb gets a wandb.Image; the JSONL fallback records the artifact
        file path (arrays are summarized by shape)."""
        step = self.step if step is None else step
        if self._wandb is not None:
            img = (self._wandb.Image(str(image), caption=caption)
                   if isinstance(image, (str, os.PathLike))
                   else self._wandb.Image(np.asarray(image), caption=caption))
            self._wandb.log({key: img}, step=step)
        ref = (str(image) if isinstance(image, (str, os.PathLike))
               else f"<image {tuple(np.asarray(image).shape)}>")
        self._file.write(json.dumps(
            {"step": step, key: {"_type": "image", "path": ref}}) + "\n")
        self._file.flush()

    def log_histogram(self, key: str, values, step: Optional[int] = None):
        """wandb.Histogram when available; summary stats in the JSONL."""
        step = self.step if step is None else step
        v = np.asarray(values, np.float64).ravel()
        if self._wandb is not None:
            self._wandb.log({key: self._wandb.Histogram(v)}, step=step)
        self._file.write(json.dumps(
            {"step": step, key: {"_type": "histogram", "n": int(v.size),
                                 "min": float(v.min()) if v.size else 0.0,
                                 "max": float(v.max()) if v.size else 0.0,
                                 "mean": float(v.mean()) if v.size else 0.0,
                                 "std": float(v.std()) if v.size else 0.0}}
        ) + "\n")
        self._file.flush()

    def log_html(self, key: str, html: str, step: Optional[int] = None,
                 path: Optional[str] = None):
        """wandb.Html when available (the reference's decoded-sentence
        tables); the JSONL records the backing file path when given."""
        step = self.step if step is None else step
        if self._wandb is not None:
            self._wandb.log({key: self._wandb.Html(html)}, step=step)
        self._file.write(json.dumps(
            {"step": step, key: {"_type": "html",
                                 "path": path or f"<inline {len(html)}B>"}}
        ) + "\n")
        self._file.flush()

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
        self._file.close()


class SmoothedValue:
    """Windowed median/avg tracker (utils.py:714-773 analog)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = collections.deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    """Iteration logger with ETA (utils.py:623-710 analog)."""

    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = collections.defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, attr):
        if attr in self.meters:
            return self.meters[attr]
        raise AttributeError(attr)

    def __str__(self):
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = ""):
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        for i, obj in enumerate(iterable):
            t0 = time.time()
            yield obj
            iter_time.update(time.time() - t0)
            if i % print_freq == 0:
                print(f"{header} [{i}]  {self}  time: {iter_time}")
        total = time.time() - start
        print(f"{header} Total time: {total:.1f}s")


class Profiler:
    """jax.profiler trace scope (new capability vs reference; SURVEY §5.1)."""

    def __init__(self, profile_dir: Optional[str]):
        self.dir = profile_dir

    def __enter__(self):
        if self.dir:
            import jax

            jax.profiler.start_trace(self.dir)
        return self

    def __exit__(self, *exc):
        if self.dir:
            import jax

            jax.profiler.stop_trace()
        return False


def get_time() -> str:
    return time.strftime("[%Y-%m-%d %H:%M:%S]", time.localtime())
