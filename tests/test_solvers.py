"""Flow-matching solver math properties (vs the exact ODE for a known target).

For a linear-Gaussian toy: if the model always predicts the true constant x0
(flow = (x_t - x0)/sigma_t), the probability-flow ODE solution from any x_t is
exact for ANY solver order — all solvers must recover x0 at sigma=0.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from realtime_video_tpu.solvers import (
    FlowDPMSolverMultistep,
    FlowUniPCMultistep,
    get_sampling_sigmas,
)


def _perfect_flow(sample, sigma, x0):
    # flow = eps - x0 = (x_t - x0) / sigma
    return (sample - x0) / sigma


@pytest.mark.parametrize("solver_cls", [FlowDPMSolverMultistep, FlowUniPCMultistep])
def test_solver_recovers_constant_x0(solver_cls):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4)).astype(np.float32))
    noise = jnp.asarray(rng.standard_normal((1, 4, 4)).astype(np.float32))

    solver = solver_cls(shift=5.0)
    solver.set_timesteps(20, shift=5.0)
    sample = noise  # sigma_0 = 1 -> pure noise
    for i, t in enumerate(solver.timesteps):
        sigma = float(solver.sigmas[i])
        flow = _perfect_flow(sample, sigma, x0)
        sample = solver.step(flow, float(t), sample)
    np.testing.assert_allclose(np.asarray(sample), np.asarray(x0), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("solver_cls", [FlowDPMSolverMultistep, FlowUniPCMultistep])
def test_second_order_beats_first_order_on_curved_target(solver_cls):
    """x0(sigma) varying linearly in lambda — 2nd order should track better
    than 1st with few steps."""
    rng = np.random.default_rng(1)
    base = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))

    def x0_of_sigma(s):
        return base * (1.0 + 0.3 * s)

    def run(order):
        solver = solver_cls(shift=3.0, solver_order=order)
        solver.set_timesteps(8, shift=3.0)
        sample = jnp.asarray(rng.standard_normal((1, 8)).astype(np.float32))
        for i, t in enumerate(solver.timesteps):
            sigma = float(solver.sigmas[i])
            flow = (sample - x0_of_sigma(sigma)) / sigma
            sample = solver.step(flow, float(t), sample)
        return np.asarray(sample)

    err2 = np.abs(run(2) - np.asarray(x0_of_sigma(0.0))).max()
    err1 = np.abs(run(1) - np.asarray(x0_of_sigma(0.0))).max()
    assert err2 <= err1 + 1e-5


def test_sampling_sigmas_monotone():
    # reference-faithful (fm_solvers.py:22-26): starts at 1.0, NO trailing 0
    # (set_timesteps appends the final_sigmas_type="zero" entry itself)
    s = get_sampling_sigmas(50, 5.0)
    assert s[0] == pytest.approx(1.0)
    assert s[-1] > 0.0
    assert np.all(np.diff(s) < 0)
