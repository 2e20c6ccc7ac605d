"""Graceful-preemption checkpointing.

TPU pods (and most cluster schedulers) deliver SIGTERM ahead of
eviction. The trainers poll a :class:`PreemptionGuard` every iteration
and, on notice, write one final resumable checkpoint and exit cleanly —
``--resume`` then continues from the exact iteration. The reference has
no analog (mmseg relies on finding the last periodic checkpoint, losing
up to ``checkpoint_interval`` iterations of work).

Multi-process correctness: the checkpoint save runs orbax barriers on
EVERY host, so all processes must decide to save at the SAME step. With
``jax.distributed`` initialized, JAX's coordination service already
propagates preemption notices (SIGTERM by default) and computes a safe
common step — ``reached_preemption_sync_point`` returns True on all
hosts at that step. Single-process falls back to a local signal flag.
"""

from __future__ import annotations

import signal
import threading

import jax


class PreemptionGuard:
    """Poll ``should_checkpoint(step)`` once per training iteration."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = False
        self._prev = {}
        self._sync = None
        self._inert = False
        if jax.process_count() > 1:
            # a LOCAL flag is unsafe here: only the signaled rank would
            # save, parking it alone in the orbax all-host barrier while
            # the others run ahead (the exact deadlock CheckpointManager
            # documents). Without the coordination service's common safe
            # step, stay inert.
            try:
                from jax._src import distributed

                if distributed.global_state.preemption_sync_manager is not None:
                    from jax.experimental.multihost_utils import (
                        reached_preemption_sync_point,
                    )

                    self._sync = reached_preemption_sync_point
            except Exception:  # pragma: no cover - defensive
                self._sync = None
            self._inert = self._sync is None
        elif threading.current_thread() is threading.main_thread():
            for s in signals:
                try:
                    self._prev[s] = signal.signal(s, self._on_signal)
                except (ValueError, OSError):  # pragma: no cover
                    pass

    def _on_signal(self, signum, frame):
        self._flag = True

    def should_checkpoint(self, step: int) -> bool:
        """True when every process should save-and-exit at ``step``.

        Multi-process: delegates to the coordination service's common
        safe step (call EVERY step, from the same step on all hosts).
        Single-process: the local SIGTERM flag.
        """
        if self._inert:
            return False
        if self._sync is not None:
            return self._sync(step)
        return self._flag

    def close(self):
        """Restore the previous signal handlers."""
        for s, prev in self._prev.items():
            try:
                signal.signal(s, prev)
            except (ValueError, OSError):  # pragma: no cover
                pass
        self._prev = {}
