"""Two-process jax.distributed rehearsal (VERDICT round-1 item #9).

Actually executes the DCN-path code in ``parallel/multihost.py`` — two OS
processes, a real coordinator, a global mesh spanning both processes, and a
psum whose result proves the cross-process all-reduce ran — rather than
only importing it. CPU backend (the sandbox's TPU is a single tunneled
chip); the collective pattern is identical on a pod.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["QG_REPO"])
import jax
import jax.numpy as jnp
import numpy as np

from quadruped_gym_tpu import parallel
from quadruped_gym_tpu.parallel import multihost

started = multihost.initialize()   # reads JAX_COORDINATOR_ADDRESS etc.
assert started, "initialize() did not start the multi-process runtime"
assert jax.process_count() == 2, jax.process_count()

mesh = multihost.global_mesh(axis_names=("data",))
n = mesh.devices.size
assert n == jax.device_count() == 4  # 2 procs x 2 virtual CPU devices

from jax import shard_map
from jax.sharding import PartitionSpec as P

def f(x):
    return jax.lax.psum(x, "data")

g = jax.jit(shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P()))
# each global row i holds value i; psum over the data axis sums all rows
x = jnp.arange(n, dtype=jnp.float32).reshape(n, 1)
from jax.sharding import NamedSharding
xs = jax.device_put(x, NamedSharding(mesh, P("data")))
out = np.asarray(jax.device_get(g(xs)))
expect = np.arange(n, dtype=np.float32).sum()
assert out.shape == (1, 1) and out[0, 0] == expect, (out, expect)
print(f"proc {jax.process_index()}: psum ok ({out[0, 0]} == {expect})")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_psum():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        # escape the sandbox's pinned axon platform: clean PYTHONPATH + CPU
        env.pop("PYTHONPATH", None)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            QG_REPO=REPO,
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "psum ok" in out
