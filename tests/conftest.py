"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes, hence the env mutation at import
time (pytest imports conftest before test modules import jax).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores JAX_PLATFORMS; the config API does work.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"

import pathlib  # noqa: E402

import pytest  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="session")
def tokens_path() -> str:
    return str(REPO / "p4fr_tpu" / "configs" / "tokens.txt")


@pytest.fixture(scope="session")
def vocab(tokens_path):
    from p4fr_tpu.data.vocab import Vocab

    return Vocab.from_files([tokens_path])


@pytest.fixture(scope="session", autouse=True)
def _build_native():
    """Best-effort build of the C++ helpers so tests exercise them."""
    from p4fr_tpu.native import build

    build.build(verbose=False)
    yield
