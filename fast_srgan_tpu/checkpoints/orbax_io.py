"""Orbax checkpointing: async save, resume-from-latest, retention.

Replaces the reference's raw ``torch.save`` of four state_dict files per
checkpoint step (reference trainer.py:143-156) and its fragile pretrain
resume (trainer.py:90-94 — which looks for ``runs/pretrain.pt`` but saves
``runs/pretrain_generator.pt``, so stock resume never fires; documented in
SURVEY.md §2.3 and deliberately *not* replicated).

Design: one Orbax ``CheckpointManager`` per training run storing a pure
pytree {g_params, g_opt, d_params, d_opt} keyed by step, with async writes
(training continues while the previous checkpoint flushes) and automatic
retention. Pretrain completion is a dedicated step key so the GAN phase can
start from it, and `latest_step` drives crash recovery: on restart, training
resumes from the newest checkpoint (the failure-recovery story the reference
lacks — SURVEY.md §5).
"""

from __future__ import annotations

import os
import signal
import threading
from contextlib import contextmanager
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

PRETRAIN_STEP = 0  # the reserved step key for the end-of-pretrain snapshot

# --- SIGINT deferral around the checkpoint dispatch window -----------------
# A KeyboardInterrupt landing INSIDE CheckpointManager.save() tears the
# dispatch midway: async commit futures are already running but not yet
# registered with the manager, so a subsequent wait_until_finished() cannot
# see them — and the interrupt handler's own save then races the orphaned
# writer threads on the step's tmp dir. Observed on hardware twice (round-2
# soak and the round-3 rerun, both at a checkpoint-boundary SIGINT): orbax's
# stale-tmp cleanup rmtree's `<step>.orbax-checkpoint-tmp` while the orphan
# is still writing into it — "Directory not empty" + NOT_FOUND, both copies
# lost. Post-hoc guards cannot close this (the orphans are invisible), so
# the dispatch window itself must be uninterruptible: SIGINT received inside
# `defer_sigint()` is recorded and re-raised as KeyboardInterrupt when the
# OUTERMOST block exits.

_defer_lock = threading.Lock()
_defer_depth = 0
_pending_sigint = False
_prev_handler = None


@contextmanager
def defer_sigint():
    """Delay Ctrl-C delivery until this (reentrant) block exits.

    Only the main thread can retarget signal handlers; on other threads
    this is a no-op (signals are delivered to the main thread anyway).
    """
    global _defer_depth, _pending_sigint, _prev_handler
    if threading.current_thread() is not threading.main_thread():
        yield
        return
    if _defer_depth == 0 and signal.getsignal(signal.SIGINT) is signal.SIG_IGN:
        # The process explicitly opted out of Ctrl-C (daemonized/nohup
        # runs inherit SIG_IGN): deferral must not convert an ignored
        # signal into a fatal KeyboardInterrupt.
        yield
        return

    def _record(signum, frame):
        global _pending_sigint
        _pending_sigint = True

    with _defer_lock:
        _defer_depth += 1
        if _defer_depth == 1:
            _pending_sigint = False
            _prev_handler = signal.signal(signal.SIGINT, _record)
    try:
        yield
    finally:
        with _defer_lock:
            _defer_depth -= 1
            outermost = _defer_depth == 0
            if outermost:
                signal.signal(signal.SIGINT, _prev_handler)
                fire = _pending_sigint
                _pending_sigint = False
        if outermost and fire:
            # Deliver with the ORIGINAL disposition, not a hardcoded raise:
            # Python's default handler raises KeyboardInterrupt (the normal
            # trainer path); a custom handler runs as it would have; a
            # SIG_DFL process gets the signal re-sent for OS-default
            # handling now that the disposition is restored.
            if callable(_prev_handler):
                _prev_handler(signal.SIGINT, None)
            else:
                os.kill(os.getpid(), signal.SIGINT)


def tree_skeleton(tree: Any) -> Any:
    """Canonical container-only structure of a pytree (no leaf data).

    Normalizes to how orbax checkpoint metadata records containers, so a
    saved tree's skeleton compares to a live state tree's with plain ==:
    NamedTuples (optax states) become dicts keyed by field name, other
    sequences become lists, dicts keep their keys, and empty containers
    (e.g. optax EmptyState) collapse to None like any leaf.
    """
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        out = {k: tree_skeleton(v) for k, v in zip(tree._fields, tree)}
        return out if out else None
    if isinstance(tree, dict):
        out = {k: tree_skeleton(v) for k, v in tree.items()}
        return out if out else None
    if isinstance(tree, (list, tuple)):
        seq = [tree_skeleton(v) for v in tree]
        return seq if seq else None
    return None


class CheckpointIO:
    """Thin wrapper over an async Orbax CheckpointManager."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                create=True,
                enable_async_checkpointing=True,
            ),
            # Register the handler up front so `item_metadata` can read a
            # saved tree's structure in a FRESH process (resume): without
            # it, metadata reads before the first save/restore fail with
            # "could not be restored. Please provide a
            # CheckpointHandlerRegistry" and saved_skeleton() would fall
            # back to raw restore errors on structure mismatches.
            item_handlers=ocp.StandardCheckpointHandler(),
        )

    # -- save ---------------------------------------------------------------

    def save(self, step: int, tree: Dict[str, Any]) -> None:
        """Save `tree` at `step`; an existing step is replaced.

        Latest-state-wins: re-running a phase with ``training.resume=false``
        in an existing run dir legitimately re-saves steps a previous run
        wrote (orbax raises StepAlreadyExistsError otherwise, which would
        discard the whole re-done phase at its final save). The overwrite
        path is SYNCHRONOUS (wait after save) to shrink the
        delete-to-commit window during which a crash would lose both
        copies — orbax offers no atomic same-step replace, so the window
        cannot be closed entirely, but it is then bounded by one flush
        rather than left open across async training."""
        # The whole wait/delete/save sequence runs with SIGINT deferred: an
        # interrupt inside the dispatch orphans writer threads that
        # wait_until_finished() cannot see (see defer_sigint above), and an
        # interrupt between delete and save would lose the old copy with no
        # new one. The signal re-raises when the block exits.
        with defer_sigint():
            # ALWAYS drain in-flight async saves first. A save issued while
            # a previous save of the SAME step is still flushing (observed
            # on hardware: SIGINT landing right after the periodic save of
            # step 1250, round-2 soak) makes orbax's atomicity layer rmtree
            # the live writer's tmp dir — the writer dies with NOT_FOUND and
            # the cleanup with "Directory not empty"; both copies are lost.
            self.wait()
            replacing = self.has_step(step)
            if replacing:
                self.manager.delete(step)
            # force=True: CheckpointManager.save silently no-ops on any
            # step <= latest_step (should_save gate) — exactly the rerun-
            # over-an-existing-run-dir case this replace path exists for.
            # Without it, delete(step)+save(step) would DELETE the old
            # checkpoint and then write nothing.
            saved = self.manager.save(
                step, args=ocp.args.StandardSave(tree), force=True
            )
            if not saved:
                raise RuntimeError(
                    f"orbax declined to save step {step} "
                    f"(latest={self.manager.latest_step()}); checkpoint "
                    "would be silently lost"
                )
            if replacing:
                self.wait()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    # -- restore ------------------------------------------------------------

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def has_step(self, step: int) -> bool:
        return step in (self.manager.all_steps() or [])

    def saved_skeleton(self, step: int) -> Optional[Any]:
        """Container structure of the tree saved at `step` (metadata only —
        no array reads), as :func:`tree_skeleton` output. None when the
        metadata is unavailable (e.g. an orbax version without
        item_metadata trees) — callers then fall back to restore-and-fail.
        """
        try:
            meta = self.manager.item_metadata(step)
            tree = getattr(meta, "tree", None)
            if tree is None:
                return None
            return tree_skeleton(tree)
        except Exception:
            return None

    def restore(self, step: int, like: Optional[Dict[str, Any]] = None):
        """Restore step; `like` provides the abstract tree (shapes/dtypes/
        shardings) so arrays are restored directly onto the right devices."""
        if like is not None:
            import jax

            abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, like)
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(abstract)
            )
        return self.manager.restore(step)

    def close(self) -> None:
        self.wait()
        self.manager.close()
