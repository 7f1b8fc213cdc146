"""Multi-chip sharding on the 8-device virtual CPU mesh: the DP train step
compiles, executes, and matches the single-device step numerically."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__
from gpvae_tpu import elbo as elbo_lib
from gpvae_tpu.parallel import (
    make_mesh, make_parallel_multi_step, make_parallel_train_step,
    replicate, shard_batch, shard_batch_stack,
)
from gpvae_tpu.train import TrainConfig, create_train_state, make_train_step


@pytest.fixture()  # function-scoped: the DP step donates its state, and
# replicate() may alias rather than copy an already-committed pytree
def setup():
    model, cfg, x, times, mask = __graft_entry__._flagship(t=8, batch=16)
    batch = {"x": x, "times": times, "mask": mask}
    config = TrainConfig(learning_rate=2e-4)
    state, tx = create_train_state(model, batch, config)
    return model, batch, state, tx


def test_dryrun_multichip_entrypoint():
    assert len(jax.devices()) >= 8
    __graft_entry__.dryrun_multichip(8)


@pytest.mark.parametrize("n_devices", [2, 8])
def test_parallel_step_matches_single_device(setup, n_devices):
    model, batch, state, tx = setup
    sched = elbo_lib.BetaSchedule()

    single = make_train_step(model, tx, sched, donate=False)
    s1, m1 = single(state, batch)

    mesh = make_mesh(n_devices)
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


def test_parallel_multistep_training_tracks_single_device(setup):
    """Ten DP optimizer steps track ten single-device steps.  Parity is at
    loss-trajectory level: the DP program compiles differently (psum
    reduction order), and under Adam a 1-ulp gradient difference grows to
    ~lr-scale parameter differences within a few steps."""
    model, batch, state, tx = setup
    sched = elbo_lib.BetaSchedule()
    single = make_train_step(model, tx, sched, donate=False)
    mesh = make_mesh(8)
    pstep = make_parallel_train_step(model, tx, sched, mesh)

    s1 = state
    s2 = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    losses1, losses2 = [], []
    for _ in range(10):
        s1, m1 = single(s1, batch)
        s2, m2 = pstep(s2, sharded)
        losses1.append(float(m1["loss"]))
        losses2.append(float(m2["loss"]))
    assert int(s2.step) == int(s1.step)
    np.testing.assert_allclose(losses1, losses2, rtol=2e-2)
    assert np.isfinite(losses2).all()
    # it is actually training
    assert losses2[-1] < losses2[0]


def test_parallel_multi_step_matches_k1_path(setup):
    """k scanned DP steps per dispatch == k one-per-dispatch DP steps
    (VERDICT r3 #5: the mesh analog of make_multi_step must be
    step-for-step the same program)."""
    model, batch, state, tx = setup
    sched = elbo_lib.BetaSchedule()
    mesh = make_mesh(8)
    k = 4

    pstep = make_parallel_train_step(model, tx, sched, mesh)
    s1 = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    for _ in range(k):
        s1, m1 = pstep(s1, sharded)

    # independent identical state (the DP steps donate theirs)
    state2, _ = create_train_state(
        model, batch, TrainConfig(learning_rate=2e-4)
    )
    multi = make_parallel_multi_step(model, tx, sched, mesh)
    s2, m2 = multi(
        replicate(state2, mesh), shard_batch_stack([batch] * k, mesh)
    )
    assert int(s2.step) == int(s1.step) == k
    assert np.isfinite(float(m2["loss"]))
    # same math, different compiled program (scan): the PARAMETERS after k
    # identical-seed steps must agree to fp32 reassociation noise — a loose
    # loss-only check (old rtol=2e-2) could not see a beta off-by-one or a
    # dropped metric psum
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    for p1, p2 in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), rtol=2e-4, atol=1e-6
        )


def test_fit_data_parallel_multi_step_chunks(tmp_path):
    """The DP driver with steps_per_call > 1: scanned chunks train, log at
    the chunk cadence, checkpoint, and resume."""
    from gpvae_tpu.parallel import fit_data_parallel

    model, cfg, x, times, mask = __graft_entry__._flagship(t=8, batch=16)
    batch = {"x": x, "times": times, "mask": mask}
    config = TrainConfig(
        learning_rate=3e-3, num_steps=24, log_every=8, steps_per_call=4,
        checkpoint_every=12, checkpoint_dir=str(tmp_path / "ck"),
    )
    mesh = make_mesh(8)
    state, log = fit_data_parallel(
        model, iter(lambda: batch, None), config, mesh, verbose=False
    )
    losses = [r["loss"] for r in log.rows]
    assert int(np.asarray(jax.device_get(state.step))) == 24
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # resume from the sharded-loop checkpoint
    config2 = TrainConfig(
        learning_rate=3e-3, num_steps=32, log_every=8, steps_per_call=4,
        checkpoint_every=12, checkpoint_dir=str(tmp_path / "ck"),
    )
    state2, _ = fit_data_parallel(
        model, iter(lambda: batch, None), config2, mesh, verbose=False
    )
    assert int(np.asarray(jax.device_get(state2.step))) == 32


def test_fit_data_parallel_finite_iterator(tmp_path):
    """A finite iterator sized to num_steps must neither overshoot nor
    raise StopIteration out of the driver (chunks clamp to the remaining
    steps: 4+4+2 at num_steps=10, k=4), and a too-short iterator stops
    gracefully through the final checkpoint save."""
    from gpvae_tpu.parallel import fit_data_parallel

    model, cfg, x, times, mask = __graft_entry__._flagship(t=8, batch=16)
    batch = {"x": x, "times": times, "mask": mask}
    config = TrainConfig(
        learning_rate=3e-3, num_steps=10, log_every=4, steps_per_call=4,
        checkpoint_every=8, checkpoint_dir=str(tmp_path / "ck"),
    )
    mesh = make_mesh(8)
    state, _ = fit_data_parallel(
        model, iter([batch] * 10), config, mesh, verbose=False
    )
    assert int(np.asarray(jax.device_get(state.step))) == 10

    config2 = TrainConfig(
        learning_rate=3e-3, num_steps=100, log_every=4, steps_per_call=4,
        checkpoint_every=8, checkpoint_dir=str(tmp_path / "ck2"),
    )
    state2, _ = fit_data_parallel(
        model, iter([batch] * 7), config2, mesh, verbose=False
    )
    assert int(np.asarray(jax.device_get(state2.step))) == 7
    # the stop path still wrote the final checkpoint
    from gpvae_tpu import train as train_lib
    ckpt = train_lib.CheckpointManager(str(tmp_path / "ck2"), 2)
    restored = ckpt.restore_latest(state2)
    assert restored is not None and int(restored.step) == 7


def test_shard_batch_rejects_uneven_batch(setup):
    model, batch, state, tx = setup
    mesh = make_mesh(8)
    uneven = {k: np.asarray(v)[:12] for k, v in batch.items()}  # 12 % 8 != 0
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(uneven, mesh)


def test_parallel_step_carries_feature_mask(setup):
    """The healing regime's per-feature mask shards and threads through the
    DP step (same fix as the single-device loop, ADVICE r1 medium)."""
    model, batch, state, tx = setup
    sched = elbo_lib.BetaSchedule()
    rng = np.random.default_rng(0)
    fmask = rng.random(np.asarray(batch["x"]).shape) >= 0.5
    full = dict(batch, feature_mask=fmask)

    mesh = make_mesh(8)
    # a second independent state: replicate() may alias and the DP step
    # donates, so one state cannot feed two step calls
    state2, _ = create_train_state(
        model, batch, TrainConfig(learning_rate=2e-4)
    )
    pstep = make_parallel_train_step(model, tx, sched, mesh)
    _, m_masked = pstep(replicate(state, mesh), shard_batch(full, mesh))
    pstep2 = make_parallel_train_step(model, tx, sched, mesh)
    _, m_plain = pstep2(replicate(state2, mesh), shard_batch(batch, mesh))
    assert np.isfinite(float(m_masked["loss"]))
    # masking out ~half the features must change the NLL
    assert not np.isclose(float(m_masked["nll"]), float(m_plain["nll"]))


def test_entry_compile_check():
    fn, args = __graft_entry__.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))


def test_fit_data_parallel_trains(tmp_path):
    """The DP driver loop (BASELINE config 5): global batches shard over
    the mesh, loss decreases, checkpoints save and resume."""
    from gpvae_tpu.parallel import fit_data_parallel
    from gpvae_tpu.train import TrainConfig

    model, cfg, x, times, mask = __graft_entry__._flagship(t=8, batch=16)
    batch = {"x": x, "times": times, "mask": mask}
    batches = iter(lambda: batch, None)  # infinite same-batch iterator
    config = TrainConfig(
        learning_rate=3e-3, num_steps=40, log_every=10,
        checkpoint_every=20, checkpoint_dir=str(tmp_path / "ck"),
    )
    mesh = make_mesh(8)
    state, log = fit_data_parallel(
        model, batches, config, mesh, verbose=False
    )
    losses = [r["loss"] for r in log.rows]
    assert int(np.asarray(jax.device_get(state.step))) == 40
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # resume from the checkpoint with a longer horizon
    config2 = TrainConfig(
        learning_rate=3e-3, num_steps=50, log_every=10,
        checkpoint_every=20, checkpoint_dir=str(tmp_path / "ck"),
    )
    state2, _ = fit_data_parallel(
        model, iter(lambda: batch, None), config2, mesh, verbose=False
    )
    assert int(np.asarray(jax.device_get(state2.step))) == 50


def test_parallel_step_with_toeplitz_prior():
    """The structured-prior model (config 3) compiles and matches the
    single-device step under the DP mesh — the Durbin scan and GS matmuls
    shard with the batch."""
    from gpvae_tpu.models import GPVAE, GPVAEConfig

    t, b = 16, 16
    cfg = GPVAEConfig(
        latent_dim=2, obs_dim=15, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(5.0, 2.0),
        encoder="dense", decoder="dense",
        shared_time_grid=True, structured_prior="toeplitz",
    )
    model = GPVAE(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": (rng.random((b, t, 15)) < 0.4).astype(np.float32),
        "times": np.broadcast_to(
            np.arange(t, dtype=np.float32), (b, t)
        ).copy(),
        "mask": np.ones((b, t), bool),
    }
    config = TrainConfig(learning_rate=2e-4)
    state, tx = create_train_state(model, batch, config)
    state2, _ = create_train_state(model, batch, config)
    sched = elbo_lib.BetaSchedule()

    single = make_train_step(model, tx, sched, donate=False)
    _, m1 = single(state2, batch)

    mesh = make_mesh(8)
    pstep = make_parallel_train_step(model, tx, sched, mesh)
    _, m2 = pstep(replicate(state, mesh), shard_batch(batch, mesh))
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m1["kl"]), float(m2["kl"]), rtol=1e-4
    )


def test_config5_shape_dp_step_t1024():
    """BASELINE config 5 *at shape* on the virtual mesh (VERDICT r2 #6):
    one data-parallel train step at T=1024 on a shared uniform grid,
    global batch 16 over 8 virtual devices, Toeplitz structured prior
    (the dp_scale preset's model) — asserts finiteness and a step count.
    The full 4096-sequence global batch is a memory scale-out of exactly
    this program (same per-device shapes x 256 more rows)."""
    from gpvae_tpu import configs
    from gpvae_tpu.models import GPVAE

    preset = configs.get("dp_scale")
    cfg = preset.model
    t = cfg.time_len
    assert t == 1024, "config 5 must run at shape"
    b = 16
    model = GPVAE(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": (rng.random((b, t, 15)) < 0.4).astype(np.float32),
        "times": np.broadcast_to(
            np.arange(t, dtype=np.float32) * (60.0 / t), (b, t)
        ).copy(),
        "mask": np.ones((b, t), bool),
    }
    config = TrainConfig(learning_rate=2e-4)
    state, tx = create_train_state(model, batch, config)
    sched = elbo_lib.BetaSchedule()
    mesh = make_mesh(8)
    pstep = make_parallel_train_step(model, tx, sched, mesh)
    new_state, metrics = pstep(
        replicate(state, mesh), shard_batch(batch, mesh)
    )
    assert int(new_state.step) == 1
    for k in ("loss", "nll", "kl"):
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
