"""Orbax CheckpointIO + npz_io unit tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_srgan_tpu.checkpoints.npz_io import (
    flatten_tree,
    load_npz_params,
    save_npz_params,
    unflatten_tree,
)
from fast_srgan_tpu.checkpoints.orbax_io import CheckpointIO, tree_skeleton


class TestNpzIO:
    def test_roundtrip(self, tmp_path, rng):
        tree = {
            "params": {
                "a": {"kernel": rng.standard_normal((3, 3)).astype(np.float32)},
                "b": {"bias": rng.standard_normal((4,)).astype(np.float32)},
            }
        }
        path = str(tmp_path / "p.npz")
        save_npz_params(path, tree)
        back = load_npz_params(path)
        np.testing.assert_array_equal(
            back["params"]["a"]["kernel"], tree["params"]["a"]["kernel"]
        )
        np.testing.assert_array_equal(
            back["params"]["b"]["bias"], tree["params"]["b"]["bias"]
        )

    def test_wrapper_added_when_missing(self, tmp_path):
        path = str(tmp_path / "q.npz")
        save_npz_params(path, {"x": {"y": np.zeros(2, np.float32)}})
        back = load_npz_params(path)
        assert "params" in back

    def test_flatten_unflatten_inverse(self):
        tree = {"a": {"b": {"c": np.ones(1)}}, "d": np.zeros(2)}
        assert unflatten_tree(flatten_tree(tree)).keys() == tree.keys()


class TestTreeSkeleton:
    """The structural resume pre-check (trainer._restore): compare the
    saved tree's container skeleton from checkpoint metadata to the live
    state tree's, instead of string-matching orbax's error message."""

    def test_container_normalization(self):
        import collections

        NT = collections.namedtuple("NT", ["mu", "nu"])
        Empty = collections.namedtuple("Empty", [])
        t = {
            "opt": (NT(mu={"k": np.zeros(1)}, nu=np.ones(1)), [np.zeros(2)]),
            "e": Empty(),
        }
        assert tree_skeleton(t) == {
            "opt": [{"mu": {"k": None}, "nu": None}, [None]],
            "e": None,
        }

    def test_saved_skeleton_matches_like_with_optax_state(self, tmp_path):
        import optax

        params = {"layer": {"kernel": jnp.ones((2, 2))}}
        opt_state = optax.adamw(1e-3).init(params)
        tree = {"g_params": params, "g_opt": opt_state}
        io = CheckpointIO(str(tmp_path / "ck"))
        io.save(1, tree)
        io.wait()
        assert io.saved_skeleton(1) == tree_skeleton(tree)
        # a different-settings tree (extra EMA key / different opt chain)
        # is detected structurally, before any array data is read
        assert io.saved_skeleton(1) != tree_skeleton(
            {**tree, "g_ema": params}
        )
        assert io.saved_skeleton(1) != tree_skeleton(
            {"g_params": params,
             "g_opt": optax.chain(
                 optax.clip_by_global_norm(1.0), optax.adamw(1e-3)
             ).init(params)}
        )
        io.close()

    def test_saved_skeleton_missing_step(self, tmp_path):
        io = CheckpointIO(str(tmp_path / "ck2"))
        assert io.saved_skeleton(99) is None
        io.close()


class TestCheckpointIO:
    def test_save_restore_latest(self, tmp_path):
        io = CheckpointIO(str(tmp_path / "ck"), max_to_keep=2)
        tree = {"w": jnp.arange(6.0).reshape(2, 3)}
        assert io.latest_step() is None
        io.save(3, tree)
        io.save(7, {"w": jnp.ones((2, 3))})
        io.wait()
        assert io.latest_step() == 7
        assert io.has_step(3) and not io.has_step(5)
        back = io.restore(3, like=tree)
        np.testing.assert_array_equal(np.asarray(back["w"]), np.arange(6.0).reshape(2, 3))
        io.close()

    def test_replace_earlier_step_persists(self, tmp_path):
        # Regression: orbax save() no-ops on step <= latest_step unless
        # forced, so replacing an earlier step (resume=false rerun over an
        # existing run dir) used to delete the old copy and write NOTHING.
        io = CheckpointIO(str(tmp_path / "ck"), max_to_keep=5)
        io.save(3, {"w": jnp.zeros(2)})
        io.save(7, {"w": jnp.zeros(2)})
        io.save(3, {"w": jnp.ones(2)})  # replace behind latest
        io.wait()
        assert io.has_step(3)
        back = io.restore(3, like={"w": jnp.zeros(2)})
        np.testing.assert_array_equal(np.asarray(back["w"]), np.ones(2))
        # Fresh re-save of a NEW step behind the old run's latest must also
        # persist (the rerun's first checkpoints).
        io.save(5, {"w": jnp.full(2, 2.0)})
        io.wait()
        assert io.has_step(5)
        io.close()

    def test_same_step_resave_while_flushing(self, tmp_path):
        # Regression (caught by the round-2 hardware soak): a save of step N
        # issued while the async flush of step N was still writing made
        # orbax's tmp-dir cleanup rmtree the live writer's directory — the
        # writer died with NOT_FOUND, the cleanup with "Directory not
        # empty", and both copies were lost. save() must drain in-flight
        # flushes before touching the step dir, making back-to-back
        # same-step saves (SIGINT right after a periodic checkpoint) safe.
        io = CheckpointIO(str(tmp_path / "ck"), max_to_keep=3)
        big = {"w": jnp.arange(1 << 16, dtype=jnp.float32)}  # slow-ish flush
        io.save(10, big)
        io.save(10, {"w": jnp.ones(1 << 16)})  # no wait() in between
        io.wait()
        assert io.has_step(10)
        back = io.restore(10, like=big)
        np.testing.assert_array_equal(
            np.asarray(back["w"]), np.ones(1 << 16, np.float32)
        )
        io.close()

    def test_retention(self, tmp_path):
        io = CheckpointIO(str(tmp_path / "ck"), max_to_keep=2)
        tree = {"w": jnp.zeros(2)}
        for s in (1, 2, 3):
            io.save(s, tree)
        io.wait()
        assert not io.has_step(1)  # evicted
        assert io.has_step(2) and io.has_step(3)
        io.close()


class TestDeferSigint:
    """SIGINT landing inside the checkpoint dispatch window must be
    deferred to the end of the outermost block (the round-3 hardware soak
    variant of the interrupt-save race: an interrupt INSIDE
    CheckpointManager.save orphans writer threads that wait() cannot see,
    and the handler's own save then races them on the step tmp dir)."""

    def test_signal_inside_block_reraises_on_exit(self):
        import os
        import signal

        from fast_srgan_tpu.checkpoints.orbax_io import defer_sigint

        progressed = []
        with pytest.raises(KeyboardInterrupt):
            with defer_sigint():
                os.kill(os.getpid(), signal.SIGINT)
                # the signal is swallowed here; work continues
                progressed.append("after-signal")
        assert progressed == ["after-signal"]
        # handler restored: a fresh SIGINT raises immediately again
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGINT)

    def test_nested_blocks_defer_to_outermost(self):
        import os
        import signal

        from fast_srgan_tpu.checkpoints.orbax_io import defer_sigint

        order = []
        with pytest.raises(KeyboardInterrupt):
            with defer_sigint():
                with defer_sigint():
                    os.kill(os.getpid(), signal.SIGINT)
                    order.append("inner")
                # inner exit must NOT re-raise
                order.append("between")
        assert order == ["inner", "between"]

    def test_no_signal_is_a_noop(self):
        from fast_srgan_tpu.checkpoints.orbax_io import defer_sigint

        with defer_sigint():
            pass

    def test_save_interrupted_mid_dispatch_completes(self, tmp_path):
        # A SIGINT delivered while save() is dispatching must neither tear
        # the dispatch nor lose the checkpoint: the save completes, THEN
        # KeyboardInterrupt surfaces.
        import os
        import signal
        import threading

        io = CheckpointIO(str(tmp_path / "ck"), max_to_keep=2)
        tree = {"w": jnp.arange(1 << 14, dtype=jnp.float32)}

        fired = threading.Event()

        def fire_sigint():
            os.kill(os.getpid(), signal.SIGINT)
            fired.set()

        orig_save = io.manager.save

        def save_with_interrupt(*a, **kw):
            # deliver the signal synchronously inside the dispatch window
            fire_sigint()
            return orig_save(*a, **kw)

        io.manager.save = save_with_interrupt
        with pytest.raises(KeyboardInterrupt):
            io.save(5, tree)
        assert fired.is_set()
        io.manager.save = orig_save
        io.wait()
        assert io.has_step(5)
        back = io.restore(5, like=tree)
        np.testing.assert_array_equal(
            np.asarray(back["w"]), np.arange(1 << 14, dtype=np.float32)
        )
        io.close()

    def test_sig_ign_processes_stay_uninterruptible(self):
        # A daemonized/nohup'd run inherits SIGINT=SIG_IGN; deferral must
        # not convert an ignored stray SIGINT into a fatal
        # KeyboardInterrupt.
        import os
        import signal

        from fast_srgan_tpu.checkpoints.orbax_io import defer_sigint

        prev = signal.signal(signal.SIGINT, signal.SIG_IGN)
        try:
            with defer_sigint():
                os.kill(os.getpid(), signal.SIGINT)  # ignored, as configured
            # still ignored after the block
            os.kill(os.getpid(), signal.SIGINT)
        finally:
            signal.signal(signal.SIGINT, prev)

    def test_custom_handler_receives_deferred_signal(self):
        # A process with its own SIGINT handler gets that handler invoked
        # at block exit — not a hardcoded KeyboardInterrupt.
        import os
        import signal

        from fast_srgan_tpu.checkpoints.orbax_io import defer_sigint

        calls = []

        def handler(signum, frame):
            calls.append(signum)

        prev = signal.signal(signal.SIGINT, handler)
        try:
            with defer_sigint():
                os.kill(os.getpid(), signal.SIGINT)
                assert calls == []  # deferred, not delivered inside
            assert calls == [signal.SIGINT]  # delivered at exit
            assert signal.getsignal(signal.SIGINT) is handler  # restored
        finally:
            signal.signal(signal.SIGINT, prev)


class TestRestoreStructureGuard:
    """Trainer._restore's decision logic (stubbed IO — no orbax on disk):
    different TOP-LEVEL KEY SETS are a settings mismatch and must raise
    WITHOUT attempting the restore (an orbax that tolerates subset
    restores would silently resume the wrong recipe, e.g. dropping saved
    EMA params under ema_decay=0); same keys with nested drift fall
    through to orbax (benign metadata-representation drift), raising the
    settings diagnosis only if orbax also rejects it."""

    class _IO:
        def __init__(self, skel, fail=False):
            self.skel, self.fail, self.restored = skel, fail, 0

        def saved_skeleton(self, step):
            return self.skel

        def restore(self, step, like=None):
            self.restored += 1
            if self.fail:
                raise RuntimeError("orbax structure rejection")
            return {"restored": True}

    def _host(self, tree):
        from fast_srgan_tpu.train.trainer import Trainer

        class _Host:
            _restore = Trainer._restore

            def _state_tree(self):
                return tree

        return _Host()

    def test_extra_top_key_raises_without_restore(self):
        import numpy as np
        import pytest

        like = {"g": {"w": np.zeros(2)}, "d": {"w": np.zeros(2)}}
        saved_skel = {"g": {"w": None}, "d": {"w": None}, "g_ema": {"w": None}}
        io = self._IO(saved_skel)
        with pytest.raises(ValueError, match="structure mismatch"):
            self._host(like)._restore(io, 7)
        assert io.restored == 0  # never handed to orbax

    def test_missing_top_key_raises_without_restore(self):
        import numpy as np
        import pytest

        like = {"g": {"w": np.zeros(2)}, "g_ema": {"w": np.zeros(2)}}
        io = self._IO({"g": {"w": None}})
        with pytest.raises(ValueError, match="structure mismatch"):
            self._host(like)._restore(io, 7)
        assert io.restored == 0

    def test_nested_drift_falls_through_to_orbax(self):
        import numpy as np

        like = {"g": {"w": np.zeros(2)}}
        # same top-level keys, differently-recorded nested container
        io = self._IO({"g": [None]})
        out = self._host(like)._restore(io, 7)
        assert out == {"restored": True} and io.restored == 1

    def test_nested_drift_orbax_rejection_raises_diagnosis(self):
        import numpy as np
        import pytest

        like = {"g": {"w": np.zeros(2)}}
        io = self._IO({"g": [None]}, fail=True)
        with pytest.raises(ValueError, match="structure mismatch"):
            self._host(like)._restore(io, 7)
        assert io.restored == 1
