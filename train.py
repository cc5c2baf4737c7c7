#!/usr/bin/env python
"""Training entry point: two-phase SRGAN training with dotted CLI overrides.

Usage (same override surface as the reference's Hydra CLI —
/root/reference/train.py:46, README.md:43-48):

    python train.py [key.path=value ...]
    python train.py data.image_dir=/data/DIV2K training.batch_size=32 \
                    generator.n_layers=12 generator.n_filters=96

Pipeline parity with reference train.py: lazily preprocess images into the
.npy cache, seed everything, build the val/pretrain/train loaders, run
``Trainer.pretrain`` then ``Trainer.train``.

TPU-native: builds a 1-D data mesh over the local devices (parallel section
of the config), feeds uint8 HR crops, and leaves LR synthesis/normalization
to the jitted steps. Multi-host: launch one process per host after
`jax.distributed.initialize` — the loaders shard files by process index.
"""

from __future__ import annotations

import sys

import jax
import numpy as np

from fast_srgan_tpu.config import load_config
from fast_srgan_tpu.data.pipeline import make_loaders, resolve_val_numpy_dir
from fast_srgan_tpu.data.preprocess import ensure_numpy_cache
from fast_srgan_tpu.parallel.mesh import make_mesh
from fast_srgan_tpu.train.trainer import Trainer
from fast_srgan_tpu.utils import jax_cache

# NOTE: jax_cache.enable() is deliberately NOT called at import time here:
# its no-accelerator probe can initialize the JAX backend, and
# jax.distributed.initialize() (the multihost path below) must run before
# any backend initialization. It is enabled inside main() instead.


def resolve_run_dir(config) -> str:
    """Hydra-1.1 run-dir semantics (reference train.py:46,
    version_base="1.1"; SURVEY.md §2.6): default `outputs/<date>/<time>/`,
    `hydra.run.dir=DIR` overrides the destination, `hydra.run.dir=.` opts
    out (stay in the launch cwd) — also what Hydra users pass for that."""
    run_dir = explicit_run_dir(config)
    if run_dir is None:
        from datetime import datetime

        now = datetime.now()
        run_dir = f"outputs/{now:%Y-%m-%d}/{now:%H-%M-%S}"
    return run_dir


def explicit_run_dir(config):
    """The user-passed hydra.run.dir, or None when defaulted."""
    try:
        return config["hydra"]["run"]["dir"]
    except (KeyError, TypeError):
        return None


# Config keys naming *inputs* the user supplies (data, weights, an explicit
# checkpoint dir to resume from). These are anchored to the launch cwd
# before the Hydra-style chdir — real Hydra leaves this to the user via
# hydra.utils.to_absolute_path; the reference never calls it, so its
# relative data paths break under the per-run dir. Here the CLI does it
# for the known input keys so the shipped relative defaults (and a stable
# relative training.checkpoint_dir, which makes auto-resume work across
# per-run dirs) keep working. Output paths (runs/..., the defaulted
# checkpoint dir) intentionally stay relative — they belong inside the
# run dir.
_INPUT_PATH_KEYS = (
    ("data", "image_dir"),
    ("data", "numpy_dir"),
    ("data", "val_image_dir"),
    ("data", "val_numpy_dir"),
    ("training", "vgg_weights"),  # "pixel"/"init" sentinels excluded below
    ("training", "init_generator_pt"),
    ("training", "init_generator_optim_pt"),
    ("training", "checkpoint_dir"),
)
_VGG_SENTINELS = ("pixel", "init")


def _absolutize_input_paths(config, base: str) -> None:
    import os

    for section, key in _INPUT_PATH_KEYS:
        value = config[section].get(key)
        if not value or not isinstance(value, str):
            continue
        if key == "vgg_weights" and value in _VGG_SENTINELS:
            continue
        if not os.path.isabs(value):
            config[section][key] = os.path.join(base, value)


def _warn_if_resume_has_prior_runs(config) -> None:
    """training.resume=true defaults on, but a fresh per-run dir has
    nothing to resume — if earlier runs of this experiment exist under
    outputs/, say so loudly instead of silently restarting from step 0."""
    import glob
    import os

    if not config.training.get("resume", False):
        return
    if config.training.get("checkpoint_dir"):
        return  # stable (absolutized) checkpoint dir: resume works as-is
    pattern = os.path.join(
        "outputs", "*", "*", "runs", config.experiment.name, "ckpt"
    )
    prior = sorted(glob.glob(pattern))
    if prior:
        # point at the RUN dir (what hydra.run.dir takes), not its
        # runs/<name>/ckpt subpath
        latest_run = os.sep.join(prior[-1].split(os.sep)[:3])
        print(
            f"NOTE: training.resume=true, but this launch created a fresh "
            f"run dir — it will NOT resume the {len(prior)} earlier "
            f"run(s) found under outputs/. To continue the latest, pass "
            f"hydra.run.dir={latest_run} (or use a stable "
            f"training.checkpoint_dir)."
        )


def enter_run_dir(config) -> None:
    """chdir into the per-run output directory, so all relative paths
    (runs/..., checkpoints) land inside it — the reference behaves this way
    for every run (Hydra 1.1 auto-chdir). Input paths are re-anchored to
    the launch cwd first (see _INPUT_PATH_KEYS)."""
    if config.parallel.get("multihost") and explicit_run_dir(config) is None:
        # Each host computes the timestamped default independently —
        # processes launched across a second boundary would chdir into
        # DIFFERENT run dirs and the run's artifacts would splinter.
        raise SystemExit(
            "multihost runs need an explicit shared run directory: pass "
            "hydra.run.dir=<dir> (or hydra.run.dir=. to stay in the "
            "launch cwd)"
        )
    run_dir = resolve_run_dir(config)
    if run_dir != ".":
        import os

        _warn_if_resume_has_prior_runs(config)
        _absolutize_input_paths(config, os.getcwd())
        os.makedirs(run_dir, exist_ok=True)
        os.chdir(run_dir)
        print(f"Working directory: {os.getcwd()}")


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    if any(a in ("-h", "--help") for a in argv):
        print(__doc__)
        return
    # Anchor the bundled config to this file, not the cwd: launching from
    # another directory must not silently fall back to pure defaults
    # (load_config is lenient about a missing default path).
    import os as _os

    bundled = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), "configs", "config.yaml"
    )
    config = load_config(bundled, overrides=argv)

    enter_run_dir(config)

    # JAX_PLATFORMS=cpu (the CPU-mesh recipe: smoke/soak/multihost drills)
    # must beat sitecustomize's programmatic platform force-set, and must
    # be applied before distributed/backend init freezes the selection.
    from fast_srgan_tpu.utils.platforms import honor_env_platforms

    honor_env_platforms()

    if config.parallel.multihost:
        # DCN bring-up: after this, jax.devices() spans all hosts and the
        # same mesh/sharding code below runs the global program (SPMD).
        # Must precede jax_cache.enable(), whose probe can initialize the
        # backend (jax.distributed.initialize errors after backend init).
        jax.distributed.initialize()
    jax_cache.enable()

    np.random.seed(config.experiment.seed)

    ensure_numpy_cache(
        config.data.image_dir,
        config.data.numpy_dir,
        workers=config.training.num_workers,
    )
    val_numpy_dir = resolve_val_numpy_dir(config)
    if val_numpy_dir and config.data.get("val_image_dir"):
        # (val_numpy_dir alone means a prebuilt cache — nothing to build)
        ensure_numpy_cache(
            config.data.val_image_dir,
            val_numpy_dir,
            workers=config.training.num_workers,
        )
    import os

    if not any(f.endswith(".npy") for f in os.listdir(config.data.numpy_dir)):
        raise SystemExit(
            f"No training images: data.image_dir={config.data.image_dir!r} "
            f"produced an empty cache at {config.data.numpy_dir!r} "
            "(expected .png/.jpg images)"
        )

    mesh = make_mesh(
        num_devices=config.parallel.num_devices,
        axis_name=config.parallel.data_axis,
    )
    n_dev = mesh.size
    if config.training.batch_size % n_dev != 0:
        raise SystemExit(
            f"training.batch_size={config.training.batch_size} must be "
            f"divisible by the mesh size ({n_dev} devices)"
        )
    print(
        f"Devices: {n_dev} ({jax.devices()[0].platform}), "
        f"global batch {config.training.batch_size}"
    )

    shard = None
    if jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
        # config.training.batch_size is the GLOBAL batch: each host's loader
        # produces its local slice, reassembled across hosts in shard_batch.
        local = config.training.batch_size // jax.process_count()
        if local * jax.process_count() != config.training.batch_size:
            raise SystemExit(
                f"training.batch_size={config.training.batch_size} must be "
                f"divisible by the process count ({jax.process_count()})"
            )
        config.training.batch_size = local
    val_sampler, pretrain_loader, train_loader = make_loaders(config, shard=shard)

    trainer = Trainer(config, mesh=mesh)
    try:
        trainer.pretrain(pretrain_loader, val_sampler)
        trainer.train(train_loader, val_sampler)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
