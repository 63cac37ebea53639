"""Evaluate the committed trained walking policy (VERDICT r2 next-round #3).

artifacts/walk_r3/policy_params holds the params of the round-3 PPO run
(3.93M env-steps; provenance + full metrics in
artifacts/walk_r3/eval_report.json). This test restores it through the
public checkpoint API and plays a short episode through the gym-level
eval path — the reference's eval workflow (eval_quadruped.py:7-39) as a
regression test: restore must keep working against the committed bytes,
and the policy must remain upright and finite under the fixed command.
"""

import os

import jax
import numpy as np
import pytest

from quadruped_gym_tpu.rl import evaluate, networks
from quadruped_gym_tpu.runtime import checkpoint

_ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "artifacts")
# every committed policy generation stays restorable: (dir, min trained
# iterations). walk_r5 is the round-5 speed-sampled + log_std-clamped run.
_POLICIES = [
    (os.path.join(_ART, "walk_r3", "policy_params"), 40),
    (os.path.join(_ART, "walk_r5", "policy_params"), 20),
]

OBS_WINDOW = 10
OBS_DIM = 26 * OBS_WINDOW  # PO obs (po_walking_quad.py:22-27) x frame stack


@pytest.mark.parametrize(
    "ckpt,min_step", _POLICIES,
    ids=[os.path.basename(os.path.dirname(p)) for p, _ in _POLICIES],
)
def test_eval_from_committed_checkpoint(ckpt, min_step):
    if not os.path.isdir(ckpt):
        pytest.skip("no committed checkpoint at " + ckpt)
    example = networks.init(
        jax.random.PRNGKey(0),
        networks.NetConfig(obs_dim=OBS_DIM, act_dim=12),
        dtype=np.float32,
    )
    params, step = checkpoint.restore(ckpt, example)
    assert step and step >= min_step
    # restored leaves must differ from the random init (real bytes loaded)
    l0 = jax.tree_util.tree_leaves(example)[0]
    r0 = jax.tree_util.tree_leaves(params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(r0))

    m = evaluate.eval_rollout(
        params, obs_window=OBS_WINDOW, max_time=0.6, frame_skip=10,
        deterministic=True, seed=0,
    )
    assert m["steps"] == 30  # 0.6 s / (10 * 0.002 s)
    assert np.isfinite(m["episode_return"])
    # the trained policy holds the robot upright from the start
    assert m["mean_uprightness"] > 0.9
    assert m["mean_tracking_error"] < 0.5
