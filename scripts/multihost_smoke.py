#!/usr/bin/env python
"""Two-process `jax.distributed` smoke test on localhost CPU.

The reference is strictly single-device (SURVEY.md §2.7); multi-host data
parallelism is a first-class capability of this rebuild, and this script is
the proof that the multi-process code paths actually execute — not just the
single-process mesh tests:

  * `jax.distributed.initialize` bring-up: 2 processes, coordinator on
    127.0.0.1, each contributing `--devices-per-host` CPU devices (default
    1; pass 4 for the realistic pod shape — a 2x4 = 8-device global mesh
    where each host addresses only its local slice).
  * `shard_batch`'s `process_count > 1` branch
    (fast_srgan_tpu/parallel/mesh.py): each process passes its LOCAL batch
    slice and the global array is assembled with
    `jax.make_array_from_process_local_data`.
  * Per-host file sharding (`CropSampler(shard=(index, count))`,
    fast_srgan_tpu/data/pipeline.py): disjoint path subsets whose union is
    the full file list.
  * Real sharded train steps: 1 pretrain + 3 full GAN steps (fp32,
    pixel-anchor content loss) through the same jitted programs train.py
    uses, run in SPMD lockstep across both processes.
  * A full masked validation pass (the Trainer.validate protocol) over an
    ODD-sized val set: every host walks the identical full val list (val
    samplers are never file-sharded — see data/pipeline.py make_loaders),
    so both processes issue the same number of global eval_step calls,
    padded tail included. Per-host shards of uneven size would
    desynchronize these collectives and deadlock; this pass is the live
    2-process proof of the sync contract, and of the metric math: the
    duplicated evaluation (each image counted once per host) must yield
    the exact single-process PSNR/SSIM with 2x the image count.

Loss equality: a third, single-process run consumes the identical global
batch on a 1-device mesh; per-step losses must match the 2-process run to
fp32 reduction tolerance. This validates that the multi-host program is the
*same math*, merely sharded.

Usage:  python scripts/multihost_smoke.py          # parent/orchestrator
Exit 0 and a final "MULTIHOST SMOKE OK" line on success.

(Workers pin the platform to CPU via jax.config.update after import — this
environment's sitecustomize pre-imports JAX with JAX_PLATFORMS=axon, and
`jax.distributed.initialize` must run before any backend touch, which a
clean child process guarantees.)
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FILES = 8
N_VAL_FILES = 5  # odd on purpose: forces a padded, masked tail batch
LR_SIZE = 8
SCALE = 4
HR_SIZE = LR_SIZE * SCALE
STEPS = 3
SEED = 0


def _global_batch(n: int) -> np.ndarray:
    """The deterministic global uint8 HR crop batch every run consumes."""
    rng = np.random.default_rng(SEED)
    return rng.integers(
        0, 256, size=(n, HR_SIZE, HR_SIZE, 3), dtype=np.uint8
    )


def _run_steps(mesh, local_batch: np.ndarray, val_dir: str, local_bs: int) -> dict:
    """1 pretrain + STEPS gan steps + a masked val pass; returns
    {step: {metric: float}, "eval": {...}}."""
    import jax

    from fast_srgan_tpu.config import default_config
    from fast_srgan_tpu.parallel.mesh import shard_batch
    from fast_srgan_tpu.train.steps import build_bundle

    config = default_config(
        data={"lr_image_size": LR_SIZE, "scale_factor": SCALE},
        generator={"n_filters": 8, "n_layers": 2},
        discriminator={"n_filters": 8},
        training={"bf16": False, "vgg_weights": "pixel"},
        parallel={"scale_lr": False},
    )
    bundle, g_state, d_state, vgg_params = build_bundle(config, mesh=mesh)

    sharded = shard_batch(local_batch, mesh)
    out = {}
    g_state, loss = bundle.pretrain_step(g_state, sharded)
    out["pretrain"] = {"loss": float(loss)}
    key = jax.random.key(7)
    for step in range(STEPS):
        g_state, d_state, metrics = bundle.gan_step(
            g_state, d_state, vgg_params, sharded, jax.random.fold_in(key, step)
        )
        out[f"gan{step}"] = {k: float(v) for k, v in metrics.items()}
    out["eval"] = _run_eval(mesh, bundle, g_state.params, val_dir, local_bs)
    return out


def _run_eval(mesh, bundle, g_params, val_dir: str, local_bs: int) -> dict:
    """Trainer.validate's protocol: full pass over the val files, tail batch
    padded + masked on device, masked SSE/SSIM sums psum'd to replicated
    scalars. Every process walks the SAME full file list, so all hosts make
    the same number of global eval_step calls (the sync contract)."""
    from fast_srgan_tpu.data.pipeline import CropSampler, list_numpy_files
    from fast_srgan_tpu.metrics.psnr_ssim import psnr_from_accumulator
    from fast_srgan_tpu.parallel.mesh import shard_batch

    val = CropSampler(
        list_numpy_files(val_dir), LR_SIZE, SCALE, seed=SEED, backend="numpy"
    )
    sse = n = ssim_sum = images = 0.0
    per_image_n = float(HR_SIZE * HR_SIZE * 3)
    for batch in val.sequential_batches(local_bs, seed=SEED, drop_last=False):
        valid = batch.shape[0]
        mask = np.ones(local_bs, np.float32)
        if valid < local_bs:
            batch = np.concatenate(
                [batch, batch[-1:].repeat(local_bs - valid, 0)]
            )
            mask[valid:] = 0.0
        b_sse, b_ssim, b_cnt = bundle.eval_step(
            g_params, shard_batch(batch, mesh), shard_batch(mask, mesh)
        )
        sse += float(b_sse)
        ssim_sum += float(b_ssim)
        images += float(b_cnt)
        n += per_image_n * float(b_cnt)
    return {
        "psnr": psnr_from_accumulator(sse, n),
        "ssim": ssim_sum / max(images, 1.0),
        "images": images,
    }


def worker(args) -> None:
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nprocs,
        process_id=args.worker,
    )
    assert jax.process_count() == args.nprocs, jax.process_count()

    from fast_srgan_tpu.data.pipeline import CropSampler
    from fast_srgan_tpu.parallel.mesh import make_mesh

    # --- per-host file sharding ---
    paths = sorted(
        os.path.join(args.data, f) for f in os.listdir(args.data)
        if f.endswith(".npy")
    )
    sampler = CropSampler(
        paths, LR_SIZE, SCALE, seed=SEED,
        shard=(jax.process_index(), jax.process_count()),
    )

    # --- sharded train steps on the global mesh (all devices, all hosts) ---
    mesh = make_mesh()
    local = args.global_batch // args.nprocs
    lo = jax.process_index() * local
    local_batch = _global_batch(args.global_batch)[lo:lo + local]
    losses = _run_steps(mesh, local_batch, args.val_data, local)

    print("WORKER_JSON " + json.dumps({
        "proc": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "shard_paths": [os.path.basename(p) for p in sampler.paths],
        "losses": losses,
    }))


def single(args) -> None:
    """Single-process reference run over the identical global batch."""
    import jax

    if jax.config.jax_platforms != "cpu":
        jax.config.update("jax_platforms", "cpu")

    from fast_srgan_tpu.parallel.mesh import make_mesh

    losses = _run_steps(
        make_mesh(1), _global_batch(args.global_batch), args.val_data,
        args.global_batch,
    )
    print("SINGLE_JSON " + json.dumps({"losses": losses}))


def parent(args) -> None:
    dph = args.devices_per_host
    global_batch = 2 * 2 * dph  # 2 rows per device, 2 hosts
    with tempfile.TemporaryDirectory(prefix="fastsr_mh_") as data_dir:
        rng = np.random.default_rng(1)
        for i in range(N_FILES):
            np.save(
                os.path.join(data_dir, f"img_{i:02d}.npy"),
                rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),
            )
        val_dir = os.path.join(data_dir, "val")
        os.makedirs(val_dir)
        for i in range(N_VAL_FILES):
            np.save(
                os.path.join(val_dir, f"val_{i:02d}.npy"),
                rng.integers(0, 256, (48, 48, 3), dtype=np.uint8),
            )

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        if dph > 1:
            env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dph}"

        def spawn(extra):
            return subprocess.Popen(
                [sys.executable, os.path.abspath(__file__)] + extra,
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )

        def attempt(port):
            workers = [
                spawn([
                    "--worker", str(i), "--nprocs", "2",
                    "--port", str(port), "--data", data_dir,
                    "--val-data", val_dir,
                    "--global-batch", str(global_batch),
                ])
                for i in range(2)
            ]
            single_env = dict(env)
            single_env.pop("XLA_FLAGS", None)  # reference run: one device
            single_proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__),
                 "--single", "--global-batch", str(global_batch),
                 "--val-data", val_dir],
                env=single_env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            outs, rcs = [], []
            for p in workers + [single_proc]:
                out, _ = p.communicate(timeout=600)
                outs.append(out)
                rcs.append(p.returncode)
            return outs, rcs

        # The ephemeral port is picked bind-then-close, so another process
        # can (rarely) claim it before the coordinator binds it — detect
        # that signature and retry the whole attempt on a fresh port.
        for retry in range(3):
            with socket.socket() as s:
                s.bind(("127.0.0.1", 0))
                port = s.getsockname()[1]
            outs, rcs = attempt(port)
            if not any(rcs):
                break
            bind_race = any(
                rc != 0 and (
                    "address already in use" in out.lower()
                    or "failed to bind" in out.lower()
                )
                for out, rc in zip(outs, rcs)
            )
            if not bind_race or retry == 2:
                for i, (out, rc) in enumerate(zip(outs, rcs)):
                    if rc != 0:
                        sys.stderr.write(f"--- child {i} rc={rc} ---\n{out}\n")
                raise SystemExit("child process failed")
            print(f"[smoke] coordinator port {port} was taken; retrying")

    reports = []
    for out in outs[:2]:
        line = [l for l in out.splitlines() if l.startswith("WORKER_JSON ")]
        assert len(line) == 1, out
        reports.append(json.loads(line[0][len("WORKER_JSON "):]))
    single_line = [
        l for l in outs[2].splitlines() if l.startswith("SINGLE_JSON ")
    ]
    ref = json.loads(single_line[0][len("SINGLE_JSON "):])["losses"]

    reports.sort(key=lambda r: r["proc"])
    # 2 processes, dph local devices each
    for r in reports:
        assert r["process_count"] == 2, r
        assert r["global_devices"] == 2 * dph, r
        assert r["local_devices"] == dph, r
    # disjoint file shards covering all files
    shard0, shard1 = (set(r["shard_paths"]) for r in reports)
    assert shard0.isdisjoint(shard1), (shard0, shard1)
    assert len(shard0 | shard1) == N_FILES, (shard0, shard1)
    # both processes computed identical (replicated) losses + eval scalars
    assert reports[0]["losses"] == reports[1]["losses"], reports
    # ... equal to the single-process run over the same global batch.
    # "eval" compares separately: both processes walked the FULL val list,
    # so every image was evaluated once per host — the psum'd masked sums
    # scale symmetrically (images 2x) and the means are exact.
    ref_eval = ref.pop("eval")
    got_eval = dict(reports[0]["losses"]["eval"])
    worst = 0.0
    for step, metrics in ref.items():
        for k, v in metrics.items():
            got = reports[0]["losses"][step][k]
            err = abs(got - v) / max(abs(v), 1e-8)
            worst = max(worst, err)
            assert err < 1e-4, (step, k, got, v)
    assert got_eval["images"] == 2 * ref_eval["images"], (got_eval, ref_eval)
    for k in ("psnr", "ssim"):
        err = abs(got_eval[k] - ref_eval[k]) / max(abs(ref_eval[k]), 1e-8)
        worst = max(worst, err)
        assert err < 1e-4, (k, got_eval[k], ref_eval[k])

    print(f"2-process x {dph}-device run (global batch {global_batch}): "
          f"losses over {1 + STEPS} steps match single-process "
          f"(worst rel err {worst:.2e})")
    print(f"val pass ({N_VAL_FILES} files, padded tail): both hosts in "
          f"lockstep, PSNR {got_eval['psnr']:.2f} == single-process, "
          f"{int(got_eval['images'])} image-evals (2x {int(ref_eval['images'])})")
    print("shards:", sorted(shard0), "|", sorted(shard1))
    print("MULTIHOST SMOKE OK")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--port", type=int, default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--val-data", default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--global-batch", type=int, default=4)
    ap.add_argument("--devices-per-host", type=int, default=1)
    args = ap.parse_args()
    if args.single:
        single(args)
    elif args.worker is not None:
        worker(args)
    else:
        parent(args)


if __name__ == "__main__":
    main()
