"""Multi-chip sharding on the 8-device virtual CPU mesh: the DP train step
compiles, executes, and matches the single-device step numerically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__
from gpvae_tpu import elbo as elbo_lib
from gpvae_tpu.parallel import (
    make_mesh, make_parallel_train_step, replicate, shard_batch,
)
from gpvae_tpu.train import TrainConfig, create_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    model, cfg, x, times, mask = __graft_entry__._flagship(t=8, batch=16)
    batch = {"x": x, "times": times, "mask": mask}
    config = TrainConfig(learning_rate=2e-4)
    state, tx = create_train_state(model, batch, config)
    return model, batch, state, tx


def test_dryrun_multichip_entrypoint():
    assert len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)


def test_parallel_step_matches_single_device(setup):
    model, batch, state, tx = setup
    sched = elbo_lib.BetaSchedule()

    single = make_train_step(model, tx, sched, donate=False)
    s1, m1 = single(state, batch)

    mesh = make_mesh(8)
    pstep = make_parallel_train_step(model, tx, sched, mesh)
    s2, m2 = pstep(replicate(state, mesh), shard_batch(batch, mesh))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_entry_compile_check():
    fn, args = __graft_entry__.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
