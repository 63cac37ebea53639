"""Domain-randomized MPC scenario sweep through the fused rollout kernel.

BASELINE config 3/5 shape: tens of thousands of scenarios — each with its
own friction, servo gains, payload, and ground slope — scored in ONE
fused Pallas kernel launch per batch tile on the TPU, then the best
control sequence per scenario-bucket is summarized.

Run:  python examples/scenario_sweep.py [num_scenarios]
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(num_scenarios: int = 16384):
    from quadruped_gym_tpu.models import spec
    from quadruped_gym_tpu.physics import engine
    from quadruped_gym_tpu.solvers import rollout
    from quadruped_gym_tpu.tasks import commands

    m = spec.get_planning_model()
    cfg = rollout.RolloutConfig(horizon=50, frame_skip=5)
    cost_fn = rollout.make_cost_fn(m)
    state = engine.make_state(m)
    cmd = commands.make(jnp.array([0.2, 0.0]), jnp.array(0.0))
    prev = jnp.asarray(np.array([0.0, 0.0, -0.5] * 4), jnp.float32)

    S = num_scenarios
    key = jax.random.PRNGKey(int(time.time()))
    k_dp, k_seq = jax.random.split(key)
    # every rollout is its own world: friction, gains, payload, slope,
    # and rough terrain (per-scenario bump field amplitude/wavelength —
    # distinct contact geometry per scenario, BASELINE config 5)
    dp = spec.sample_domain_params(
        k_dp, S,
        friction_range=(0.3, 0.9),
        gain_range=(0.7, 1.3),
        mass_range=(0.8, 1.8),
        tilt_range=(-0.2, 0.2),
        terrain_amp_range=(0.0, 0.02),
    )
    seqs = jnp.clip(
        prev[None, None]
        + 0.2 * jax.random.normal(k_seq, (S, cfg.horizon, m.nu)),
        -1.0, 1.0,
    ).astype(jnp.float32)

    @jax.jit
    def score(seqs, dp):
        return rollout.lane_batched_rollout_cost(
            m, cfg, cost_fn, state, seqs, cmd, prev,
            newton_iterations=4, ls_iterations=8,
            engine_impl="fused", dp=dp,
        )

    print(f"compiling + scoring {S} randomized scenarios (H=50)...")
    t0 = time.perf_counter()
    costs = jax.block_until_ready(score(seqs, dp))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    costs = jax.block_until_ready(score(seqs, dp))
    t_warm = time.perf_counter() - t0

    costs = np.asarray(costs)
    fr = np.asarray(dp.friction)
    tilt = np.hypot(np.asarray(dp.tilt_x), np.asarray(dp.tilt_y))
    print(f"first call {t_first:.1f}s (compile), warm {t_warm*1e3:.0f} ms "
          f"-> {S/t_warm:,.0f} scenario-rollouts/s")
    print(f"cost: mean {costs.mean():.1f}, best {costs.min():.1f}, "
          f"worst {costs.max():.1f}")
    lo_f, hi_f = fr < np.median(fr), fr >= np.median(fr)
    print(f"low-friction half mean cost {costs[lo_f].mean():.1f} vs "
          f"high-friction {costs[hi_f].mean():.1f}")
    lo_t, hi_t = tilt < np.median(tilt), tilt >= np.median(tilt)
    print(f"gentle-slope half mean cost {costs[lo_t].mean():.1f} vs "
          f"steep-slope {costs[hi_t].mean():.1f}")
    amp = np.asarray(dp.terrain_amp)
    lo_a, hi_a = amp < np.median(amp), amp >= np.median(amp)
    print(f"smooth-terrain half mean cost {costs[lo_a].mean():.1f} vs "
          f"rough-terrain {costs[hi_a].mean():.1f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16384)
