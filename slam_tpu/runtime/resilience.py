"""Failure detection and recovery.

The reference exits on any fatal error (core.cpp:858-859,891,913 —
SURVEY.md §5.3: no retry, no recovery). Production runs here are
long-lived compiled programs, so recovery = checkpoint + resume: this
wrapper runs a checkpointed run and, on crash (device OOM, preemption,
transient runtime failure), re-enters from the last saved chunk. Resumes
are bit-exact (deterministic threefry streams), so a recovered run is
indistinguishable from an uninterrupted one.
"""

from __future__ import annotations

import sys
import time


def run_resilient(runner, *, seed: int = 0, n_ticks: int | None = None,
                  every: int = 50, ckpt_path: str = "ckpt/run",
                  max_retries: int = 3, backoff_s: float = 5.0):
    """Runner.run_checkpointed with automatic resume-on-failure.

    Returns the RunResult of the (possibly resumed) run. Raises after
    ``max_retries`` consecutive failures.
    """
    attempt = 0
    while True:
        try:
            return runner.run_checkpointed(
                seed=seed, n_ticks=n_ticks, every=every,
                ckpt_path=ckpt_path, resume=attempt > 0)
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — any device failure
            attempt += 1
            print(f"run failed ({type(e).__name__}: {e}); "
                  f"retry {attempt}/{max_retries} from checkpoint",
                  file=sys.stderr)
            if attempt > max_retries:
                raise
            time.sleep(backoff_s * attempt)
