"""Golden parity: our flow-matching multistep solvers vs the reference's
vendored diffusers schedulers (wan/utils/fm_solvers.py FlowDPMSolverMultistep,
fm_solvers_unipc.py FlowUniPCMultistep), run step-for-step on a synthetic
denoising trajectory.

The synthetic "model" is a deterministic function of (sample, step) so each
side rolls out its OWN trajectory — any per-step divergence compounds and
fails the final comparison.
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_compat  # noqa: E402

torch = pytest.importorskip("torch")

from realtime_video_tpu.solvers import (  # noqa: E402
    FlowDPMSolverMultistep,
    FlowUniPCMultistep,
    get_sampling_sigmas,
)

SHIFT = 5.0
STEPS = 10
SHAPE = (1, 4, 6, 8)


def _flow_model(sample: np.ndarray, i: int) -> np.ndarray:
    """Deterministic synthetic flow prediction: mixes the sample with a fixed
    per-step pattern so trajectories are sensitive to every update."""
    rng = np.random.default_rng(100 + i)
    pattern = rng.normal(size=SHAPE).astype(np.float32)
    return 0.4 * sample + pattern


def _rollout_ref(scheduler_cls, init, *, via_sigmas: bool):
    fm = ref_compat.load("wan.utils.fm_solvers")
    fmu = ref_compat.load("wan.utils.fm_solvers_unipc")
    cls = getattr(fm, scheduler_cls, None) or getattr(fmu, scheduler_cls)
    sched = cls(num_train_timesteps=1000, shift=1, use_dynamic_shifting=False)
    if via_sigmas:
        sigmas = fm.get_sampling_sigmas(STEPS, SHIFT)
        fm.retrieve_timesteps(sched, device="cpu", sigmas=sigmas)
    else:
        sched.set_timesteps(STEPS, device="cpu", shift=SHIFT)
    sample = torch.from_numpy(init.copy())
    for i, t in enumerate(sched.timesteps):
        flow = torch.from_numpy(_flow_model(sample.numpy(), i))
        sample = sched.step(flow, t, sample, return_dict=False)[0]
    return sample.numpy(), np.asarray(sched.timesteps, np.float64)


def _rollout_ours(solver, init, sigmas=None):
    solver.set_timesteps(STEPS, shift=SHIFT, sigmas=sigmas)
    sample = jnp.asarray(init.copy())
    for i, t in enumerate(solver.timesteps):
        flow = jnp.asarray(_flow_model(np.asarray(sample), i))
        sample = solver.step(flow, t, sample)
    return np.asarray(sample), np.asarray(solver.timesteps, np.float64)


@pytest.fixture(scope="module")
def init_sample():
    return np.random.default_rng(7).normal(size=SHAPE).astype(np.float32)


def test_dpmpp_matches_reference(init_sample):
    want, ref_t = _rollout_ref("FlowDPMSolverMultistepScheduler", init_sample,
                               via_sigmas=True)
    # the reference dpm++ pipeline path feeds explicit get_sampling_sigmas
    # (causal_diffusion_inference.py:335-339) — mirror that call shape
    got, our_t = _rollout_ours(FlowDPMSolverMultistep(shift=SHIFT), init_sample,
                               sigmas=get_sampling_sigmas(STEPS, SHIFT))
    np.testing.assert_allclose(our_t, ref_t, rtol=1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unipc_matches_reference(init_sample):
    want, ref_t = _rollout_ref("FlowUniPCMultistepScheduler", init_sample,
                               via_sigmas=False)
    got, our_t = _rollout_ours(FlowUniPCMultistep(shift=SHIFT), init_sample)
    np.testing.assert_allclose(our_t, ref_t, rtol=1e-4)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dpmpp_order3_matches_reference(init_sample):
    fm = ref_compat.load("wan.utils.fm_solvers")
    sched = fm.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False,
        solver_order=3)
    sigmas = fm.get_sampling_sigmas(STEPS, SHIFT)
    fm.retrieve_timesteps(sched, device="cpu", sigmas=sigmas)
    sample = torch.from_numpy(init_sample.copy())
    for i, t in enumerate(sched.timesteps):
        flow = torch.from_numpy(_flow_model(sample.numpy(), i))
        sample = sched.step(flow, t, sample, return_dict=False)[0]
    want = sample.numpy()
    assert np.isfinite(want).all()

    got, _ = _rollout_ours(
        FlowDPMSolverMultistep(shift=SHIFT, solver_order=3), init_sample,
        sigmas=get_sampling_sigmas(STEPS, SHIFT))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unipc_order3_matches_reference(init_sample):
    fmu = ref_compat.load("wan.utils.fm_solvers_unipc")
    sched = fmu.FlowUniPCMultistepScheduler(
        num_train_timesteps=1000, shift=1, use_dynamic_shifting=False,
        solver_order=3)
    sched.set_timesteps(STEPS, device="cpu", shift=SHIFT)
    sample = torch.from_numpy(init_sample.copy())
    for i, t in enumerate(sched.timesteps):
        flow = torch.from_numpy(_flow_model(sample.numpy(), i))
        sample = sched.step(flow, t, sample, return_dict=False)[0]
    want = sample.numpy()
    assert np.isfinite(want).all()

    got, _ = _rollout_ours(
        FlowUniPCMultistep(shift=SHIFT, solver_order=3), init_sample)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
