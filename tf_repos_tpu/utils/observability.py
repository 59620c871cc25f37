"""Observability: scalar metric events, profiler traces, NaN guards.

The reference's observability is TensorBoard summaries wired through
RunConfig (save_summary_steps/log_step_count_steps, DeepFM.py:339-340)
plus explicit tf.summary.scalar calls (DeepCvrMTL.py:225-226). TPU-native
equivalents here:

  MetricsWriter   append-only JSONL scalar events in model_dir — trivially
                  greppable/plottable — PLUS TensorBoard event files
                  (utils/tb_events.py, dependency-free) so curves are
                  directly comparable to the reference's published
                  artifacts (deep_ctr/uploads/tensorboard_auc.png)
  profile_trace   jax.profiler trace (xplane) over a step window; view in
                  TensorBoard's profile plugin or xprof
  enable_nan_checks  jax_debug_nans — the SPMD-era stand-in for the
                  reference's (absent) race detection: deterministic
                  numeric faults fail fast with a traceback instead of
                  corrupting the run (SURVEY.md §5)
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    """Append-only JSONL scalar events: {"step": N, "wall": t, <scalars>}."""

    def __init__(
        self, model_dir: str, filename: str = "metrics.jsonl", tensorboard: bool = True
    ):
        os.makedirs(model_dir, exist_ok=True)
        self.path = os.path.join(model_dir, filename)
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if tensorboard:
            from tf_repos_tpu.utils.tb_events import TensorBoardWriter

            self._tb = TensorBoardWriter(model_dir)

    def write(self, step: int, scalars: Dict[str, float], kind: str = "train") -> None:
        rec = {"step": int(step), "wall": time.time(), "kind": kind}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalars(
                step, {f"{kind}/{k}": float(v) for k, v in scalars.items()}
            )

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class profile_trace:
    """Context manager: capture a jax.profiler trace into ``log_dir``.

    Usage in the train loop (harness): steps [profile_start,
    profile_start+profile_steps) run under the trace.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._active = False

    def __enter__(self):
        import jax

        os.makedirs(self.log_dir, exist_ok=True)
        jax.profiler.start_trace(self.log_dir)
        self._active = True
        return self

    def __exit__(self, *exc):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
        return False


def enable_nan_checks() -> None:
    import jax

    jax.config.update("jax_debug_nans", True)
