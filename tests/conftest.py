"""Test configuration: force an 8-device CPU mesh before jax initializes.

This is the TPU analog of multi-node testing without a cluster (SURVEY.md §4):
all tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised; real-TPU benchmarking happens in bench.py only.
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (loaded from sitecustomize) overrides platform
# selection via jax.config, which beats the env var — override it back.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()

# persistent compilation cache: repeated suite runs skip XLA recompiles
# (kept inside the repo so it survives environment resets; host-keyed so a
# session on a different machine never loads foreign CPU AOT code)
from omnifusion_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(str(pathlib.Path(__file__).parent.parent / ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def load_golden(name: str):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden fixture {name} not generated (tools/make_goldens.py)")
    return np.load(path)
