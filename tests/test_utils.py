"""Profiling/debug utilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpvae_tpu.utils import (
    StepTimer, assert_finite, check_finite, cholesky_flops,
    device_memory_stats,
)


def test_step_timer():
    t = StepTimer()
    for _ in range(10):
        t.tick()
    rep = t.report()
    assert rep["steps"] == 10
    assert rep["steps_per_sec"] > 0
    # resets
    assert t.report()["steps"] == 0


def test_cholesky_flops():
    assert cholesky_flops(2, 10) == pytest.approx(2000 / 3)


def test_check_finite_under_jit():
    @jax.jit
    def f(x):
        return check_finite({"a": x, "b": x * 2}, "params")

    assert bool(f(jnp.ones(4)))
    assert not bool(f(jnp.array([1.0, jnp.nan, 2.0, 3.0])))


def test_assert_finite():
    assert_finite({"w": jnp.ones(3)}, "ok")
    with pytest.raises(FloatingPointError, match="bad"):
        assert_finite({"w": jnp.array([jnp.inf])}, "bad")


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)
