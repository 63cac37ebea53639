# quadruped-gym-tpu — developer entry points
# (the reference ships a Docker/Make launch layer, Makefile:1-47; this is
# the TPU-native equivalent: no GPU/X11 plumbing, everything runs on the
# host's JAX install or in the TPU container below)

PY ?= python

.PHONY: help test test-all test-fast bench train eval dryrun example walk sweep gait latency clean

help:
	@echo "targets:"
	@echo "  test      - default suite (skips multi-minute compile tests; see test-all)"
	@echo "  test-all  - full suite including the slow lane/leg/pallas compile tests"
	@echo "  bench     - headline benchmark (H=50 MPC rollouts/s/chip, one JSON line)"
	@echo "  train     - PPO training (runs/ppo); resume-safe"
	@echo "  eval      - evaluate runs/ppo policy under the fixed command"
	@echo "  dryrun    - multi-chip sharding dry run on a virtual 8-device CPU mesh"
	@echo "  example   - random-actuation rollout + joint-angle plot"
	@echo "  walk      - closed-loop MPC walk (fused Pallas planner, TPU)"
	@echo "  sweep     - domain-randomized scenario sweep (fused kernel, TPU)"
	@echo "  gait      - H=50 gradient gait optimization report (SQP/iLQR, TPU)"
	@echo "  latency   - real-time loop latency + fused-kernel roofline report (TPU)"

test:
	timeout --signal=INT --kill-after=30 300 $(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

test-fast: test

bench:
	$(PY) bench.py

train:
	$(PY) -m quadruped_gym_tpu.rl.train --output runs/ppo

eval:
	$(PY) -m quadruped_gym_tpu.rl.evaluate --policy runs/ppo/policy

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	  $(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('dryrun ok')"

example:
	$(PY) examples/random_rollout.py

walk:
	$(PY) examples/closed_loop_walk.py

sweep:
	$(PY) examples/scenario_sweep.py

gait:
	$(PY) examples/gait_sqp.py --solver sqp --horizon 50

latency:
	$(PY) scripts/latency_report.py

clean:
	rm -rf .jax_cache __pycache__ */__pycache__ plots videos runs
