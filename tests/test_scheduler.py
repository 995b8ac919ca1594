"""FlowMatchSchedule numerics vs an independent torch re-derivation of the
reference equations (utils/scheduler.py:106-194, utils/wan_wrapper.py:181-228,
v2v.py:133-136)."""
import numpy as np
import pytest
import torch

from realtime_video_tpu.scheduler import (
    FlowMatchSchedule,
    get_denoising_schedule,
    warp_denoising_steps,
)


def torch_sigmas(n=1000, shift=5.0, sigma_min=0.0, sigma_max=1.0, extra_one_step=True):
    if extra_one_step:
        s = torch.linspace(sigma_max, sigma_min, n + 1)[:-1]
    else:
        s = torch.linspace(sigma_max, sigma_min, n)
    return shift * s / (1 + (shift - 1) * s)


@pytest.fixture(scope="module")
def sched():
    return FlowMatchSchedule.create(shift=5.0, sigma_min=0.0, extra_one_step=True)


def test_sigma_table_matches_reference_formula(sched):
    expected = torch_sigmas().numpy()
    np.testing.assert_allclose(np.asarray(sched.sigmas), expected, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sched.timesteps), expected * 1000, rtol=1e-6
    )


def test_add_noise_lerp(sched):
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((4, 16, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((4, 16, 8, 8)).astype(np.float32)
    t = np.array([1000, 937, 833, 625], np.float32)
    out = np.asarray(sched.add_noise(x0, noise, t))
    sig = np.asarray(sched.sigmas)
    ts = np.asarray(sched.timesteps)
    for i in range(4):
        tid = np.argmin(np.abs(ts - t[i]))
        exp = (1 - sig[tid]) * x0[i] + sig[tid] * noise[i]
        np.testing.assert_allclose(out[i], exp, rtol=1e-5, atol=1e-5)


def test_flow_x0_roundtrip(sched):
    rng = np.random.default_rng(1)
    xt = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    flow = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    t = np.array([900, 500], np.float32)
    x0 = sched.flow_to_x0(flow, xt, t)
    flow2 = sched.x0_to_flow(x0, xt, t)
    np.testing.assert_allclose(np.asarray(flow2), flow, rtol=1e-4, atol=1e-4)


def test_noise_x0_consistency(sched):
    """add_noise then x0<->noise conversions must be self-consistent."""
    rng = np.random.default_rng(2)
    x0 = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    noise = rng.standard_normal((2, 3, 4, 4)).astype(np.float32)
    t = np.array([800, 300], np.float32)
    xt = sched.add_noise(x0, noise, t)
    noise_rec = np.asarray(sched.x0_to_noise(x0, xt, t))
    np.testing.assert_allclose(noise_rec, noise, rtol=1e-3, atol=1e-3)
    x0_rec = np.asarray(sched.noise_to_x0(noise, xt, t))
    np.testing.assert_allclose(x0_rec, x0, rtol=1e-3, atol=1e-3)


def test_euler_step_at_final(sched):
    rng = np.random.default_rng(3)
    sample = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    vel = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    # stepping from the last timestep goes to sigma=0
    t_last = np.asarray(sched.timesteps)[-1] * np.ones((1,), np.float32)
    out = np.asarray(sched.step(vel, t_last, sample))
    sig_last = np.asarray(sched.sigmas)[-1]
    np.testing.assert_allclose(out, sample + vel * (0 - sig_last), rtol=1e-5)


def test_denoising_schedule_reference_values(sched):
    """v2v.get_denoising_schedule at strength=1.0, steps=4 starts at t_max and
    ends at 0 (the padded entry)."""
    padded = np.asarray(sched.zero_padded_timesteps())
    out = get_denoising_schedule(padded, 1.0, steps=4)
    assert out.shape == (4,)
    assert out[0] == padded[0]  # 1000 - 1000 -> index 0 (t = sigma_max * 1000)
    assert out[-1] == 0.0  # 1000 - 0 -> index 1000 (padded zero)
    assert np.all(np.diff(out) < 0)
    # strength 0.5 starts mid-schedule
    half = get_denoising_schedule(padded, 0.5, steps=4)
    assert half[0] == padded[500]


def test_warp_denoising_steps(sched):
    warped = warp_denoising_steps(
        np.asarray(sched.timesteps), [1000, 750, 500, 250]
    )
    ts = np.asarray(sched.timesteps)
    np.testing.assert_allclose(warped, [ts[0], ts[250], ts[500], ts[750]], rtol=1e-6)


def test_training_weight_normalised(sched):
    t = np.asarray(sched.timesteps)
    w = np.asarray(sched.training_weight(t))
    assert w.shape == (1000,)
    np.testing.assert_allclose(w.sum(), 1000.0, rtol=1e-3)
