# Convenience targets for fast_srgan_tpu.

.PHONY: native test test-quick bench smoke serve clean \
        multihost soak bench-4k train-ab

# Build the native C++ crop-gather loader (also built lazily on first use).
native:
	g++ -O3 -std=c++17 -shared -fPIC -o csrc/libfastsr_loader.so \
	    csrc/fastsr_loader.cpp -lpthread

# Full suite: the merge gate (compile-dominated). Measured 2026-08-20 on
# this single-core box: 358 tests, all passing, 47m09s (2026-08-19: 333
# in 37m04s; the growth is the round-5 head-policy, video-calibration,
# per-scale-budget, and dryrun-contract tests) — budget ~35-50 min.
# See test-quick for the per-commit tier.
test:
	python -m pytest tests/ -x -q

# Per-commit gate: 175 tests incl. the generator/discriminator/VGG
# torch-parity oracles and the int8 PTQ tier; skips compile-heavy
# multi-device/full-size programs (tests/conftest.py SLOW_NODE_PATTERNS).
# Measured 2026-08-20 on this box (1 CPU core): 2m33s (2026-08-19:
# 2m45s-3m13s at 170 tests) — load-sensitive; budget ~3 min typical,
# 5 min worst-case.
test-quick:
	python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

# Tiny end-to-end training smoke on the virtual 8-device CPU mesh.
smoke:
	python scripts/make_dataset.py /tmp/sr_train --n 8 --size 160
	PYTHONPATH=$(CURDIR) JAX_PLATFORMS=cpu \
	XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python train.py hydra.run.dir=. \
	  data.image_dir=/tmp/sr_train data.numpy_dir=/tmp/sr_np \
	  generator.n_filters=16 generator.n_layers=2 discriminator.n_filters=16 \
	  training.pretrain_iterations=4 training.iterations=4 \
	  training.batch_size=8 training.log_iter=2 training.checkpoint_iter=2 \
	  training.bf16=false training.vgg_weights=pixel experiment.name=smoke

# Two real jax.distributed processes on localhost CPU: global batch
# assembly, per-host file sharding, loss equality vs single-process.
multihost:
	python scripts/multihost_smoke.py

# Reliability drill on the attached device: thousands of steps, SIGINT
# mid-GAN, resume, curve-continuity verdict (runs/<name>/SOAK_REPORT.json).
# Drills the full training feature set (EMA + augmentation + LR schedule)
# so the kill/resume covers their state too; the defaults-only recipe is
# `python scripts/soak.py`.
soak:
	python scripts/soak.py \
	  --extra training.ema_decay=0.999 \
	  --extra training.augment=true \
	  --extra training.lr_schedule=step \
	  --extra 'training.lr_decay_steps=[2500]'

bench-4k:
	python scripts/bench_4k.py

# A/B the GAN step formulations at the reference's full-loss operating
# point (batch 96 + VGG). Arms: recompute (the reference's two-forward
# form), shared-forward (default), + the vgg_concat / remat_vgg
# variants. 3 runs per arm (best-of-3 — single runs vary through the
# tunnel; docs/DESIGN.md measurement protocol).
train-ab:
	for arm in "SHARED=0 VGG_CONCAT=0 REMAT_VGG=0" \
	           "SHARED=1 VGG_CONCAT=0 REMAT_VGG=0" \
	           "SHARED=1 VGG_CONCAT=1 REMAT_VGG=0" \
	           "SHARED=1 VGG_CONCAT=0 REMAT_VGG=1" \
	           "SHARED=1 VGG_CONCAT=1 REMAT_VGG=1"; do \
	  for i in 1 2 3; do \
	    env STEPS=150 BATCH=96 VGG=init $$arm python scripts/train_throughput.py; \
	  done; done

# Batched HTTP serving daemon (see serve.py --help).
serve:
	python serve.py

clean:
	rm -f csrc/libfastsr_loader.so
	rm -rf runs outputs .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
