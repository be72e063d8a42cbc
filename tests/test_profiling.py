"""Profiling helpers (utils/profiling.py) and the persistent-cache gate."""

import os

import jax
import jax.numpy as jnp

from clonealign_tpu.utils.cache import enable_persistent_cache
from clonealign_tpu.utils.profiling import timed, trace

import pytest

pytestmark = pytest.mark.slow


def test_timed_reports(capsys):
    with timed("probe"):
        (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    out = capsys.readouterr().out
    assert out.startswith("probe: ") and out.strip().endswith("s")


def test_trace_writes_profile(tmp_path):
    d = str(tmp_path / "trace")
    with trace(d):
        (jnp.ones((32, 32)) + 1).block_until_ready()
    # a plugins/profile/<run> directory with at least one artifact appears
    found = []
    for root, _dirs, files in os.walk(d):
        found.extend(files)
    assert found, "no trace artifacts written"


def test_persistent_cache_skips_cpu(tmp_path):
    # suite runs on CPU (conftest) -> gate must skip
    assert jax.default_backend() == "cpu"
    assert enable_persistent_cache(str(tmp_path / "cache")) is None
    before = jax.config.jax_compilation_cache_dir
    try:
        assert enable_persistent_cache(str(tmp_path / "cache2"), tpu_only=False) is not None
    finally:
        # restore: the cache dir is global config; later tests in this
        # process must not write compiles into a soon-deleted tmp dir
        jax.config.update("jax_compilation_cache_dir", before)
