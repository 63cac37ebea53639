"""Test configuration.

Parity tests run in float64 on the CPU backend so the JAX engine can be
compared against CPU MuJoCo at machine precision. Multi-device sharding
tests use an 8-device virtual CPU mesh (``--xla_force_host_platform_device_count``),
so collectives are exercised without a TPU pod — the strategy SURVEY.md §4
prescribes for a repo whose reference has no tests at all.
"""

import os

# must be set before jax initializes its CPU client
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# CPU-only platform discovery: the suite never uses the real chip, and
# merely initializing the axon TPU tunnel (a) intermittently hangs for
# minutes and (b) BLOCKS any concurrently-launched training/bench
# process from acquiring the chip — a pytest run used to stall a TPU
# training job at backend init until the tests finished.
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

# persistent compilation cache: repeated pytest runs skip most XLA compiles.
# .test_cache is COMMITTED (like .multichip_cache) so the fast tier stays
# under its 300 s gate on a fresh checkout — the lane/leg engines take
# many minutes of XLA CPU compile cold. Cache keys depend on the set of
# initialized platforms, so entries must be populated under the same
# CPU-only discovery configured above.
import os as _os

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
# JAX_COMPILATION_CACHE_DIR overrides, so a test run can use a private
# cache while another JAX process (bench/training) writes the shared one —
# concurrent writers have produced torn-read aborts (see note below)
jax.config.update(
    "jax_compilation_cache_dir",
    _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    or _os.path.join(_REPO, ".test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

jax.config.update("jax_enable_x64", True)
# Belt-and-braces with the JAX_PLATFORMS=cpu default above (a caller may
# have exported their own JAX_PLATFORMS): route defaults to the CPU
# backend for deterministic, float64-capable test execution.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")


@pytest.fixture(autouse=True)
def _gate_compilation_cache(request):
    """Disable the persistent compilation cache for ``nocache`` tests.

    Serializing the giant interpret-mode fused-rollout executables for
    the on-disk cache segfaults inside XLA's CPU AOT serializer
    (reproduced: put_executable_and_time -> SIGSEGV at
    test_solvers.py::test_delayed_closed_loop_lane_predictor). Those
    programs are CPU-test-only and recompile quickly enough; skipping
    the cache entirely for them avoids the crash."""
    if request.node.get_closest_marker("nocache") is None:
        yield
        return
    old = jax.config.jax_enable_compilation_cache
    jax.config.update("jax_enable_compilation_cache", False)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", old)


@pytest.fixture(scope="module", autouse=True)
def _free_compiled_executables():
    """Drop compiled executables between test modules.

    The suite accumulates ~150 large XLA CPU executables in one process;
    past ~the 68th test, deserializing the next persistent-cache entry
    aborts inside XLA (reproducible at test_sqp in full-suite runs, never
    standalone). Clearing after each module keeps the per-process load
    bounded; re-traces within later modules hit the on-disk cache."""
    yield
    jax.clear_caches()
