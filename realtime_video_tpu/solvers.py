"""Flow-matching multistep ODE solvers for the 50-step teacher path.

Functional equivalents of the reference's vendored diffusers-style schedulers
(wan/utils/fm_solvers.py FlowDPMSolverMultistep, fm_solvers_unipc.py
FlowUniPCMultistep), implemented from the exponential-integrator math in
x0(data)-prediction form.

Flow matching: x_t = (1-s) x0 + s eps, alpha_t = 1-s, sigma_t = s,
lambda_t = log(alpha/sigma). Updates (h = lambda_t - lambda_s > 0 while
denoising):

  DPM++ 1st order:  x_t = (s_t/s_s) x_s - a_t (e^{-h} - 1) x0_s
  DPM++ 2M:         ... [(1 + 1/(2r)) x0_s - 1/(2r) x0_prev],  r = h_prev/h
  UniPC (bh2):      predictor/corrector with B(h) = expm1(-h) correction row

Solvers hold small host-side histories; the heavy model evals stay jitted in
the pipelines.
"""
from __future__ import annotations

import math
from typing import List, Optional

import jax.numpy as jnp
import numpy as np


def _shifted_sigmas(num_inference_steps: int, shift: float) -> np.ndarray:
    s = np.linspace(1.0, 1.0 / num_inference_steps, num_inference_steps, dtype=np.float64)
    s = shift * s / (1 + (shift - 1) * s)
    return np.concatenate([s, [0.0]])  # trailing 0 = fully denoised


class _FlowSolverBase:
    """Shared schedule + x0-history plumbing."""

    def __init__(self, num_train_timesteps: int = 1000, shift: float = 5.0,
                 solver_order: int = 2):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        self.solver_order = solver_order
        self.sigmas: Optional[np.ndarray] = None
        self.timesteps: Optional[np.ndarray] = None
        self._x0_history: List[jnp.ndarray] = []
        self._step_index = 0

    def set_timesteps(self, num_inference_steps: int, shift: Optional[float] = None):
        if shift is not None:
            self.shift = shift
        self.sigmas = _shifted_sigmas(num_inference_steps, self.shift)
        self.timesteps = (self.sigmas[:-1] * self.num_train_timesteps).astype(np.float32)
        self._x0_history = []
        self._step_index = 0

    # -- lambda helpers (clamped so lambda stays finite at the endpoints) ----

    def _lam(self, i: int) -> float:
        s = float(np.clip(self.sigmas[i], 1e-6, 1 - 1e-6))
        return math.log((1 - s) / s)

    def _alpha_sigma(self, i: int):
        s = float(self.sigmas[i])
        return 1.0 - s, s

    def convert_flow_to_x0(self, flow_pred: jnp.ndarray, sample: jnp.ndarray) -> jnp.ndarray:
        sigma = float(self.sigmas[self._step_index])
        return sample - sigma * flow_pred

    def scale_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, step_index: int):
        s = float(self.sigmas[step_index])
        return (1 - s) * sample + s * noise


class FlowDPMSolverMultistep(_FlowSolverBase):
    """DPM-Solver++(2M) in data-prediction form (fm_solvers.py:69+)."""

    def step(self, model_output_flow: jnp.ndarray, timestep, sample: jnp.ndarray):
        del timestep  # sequential stepping: index tracked internally
        i = self._step_index
        x0 = self.convert_flow_to_x0(model_output_flow, sample)

        lam_s, lam_t = self._lam(i), self._lam(i + 1)
        a_t, s_t = self._alpha_sigma(i + 1)
        _, s_s = self._alpha_sigma(i)
        h = lam_t - lam_s
        last_step = i + 1 >= len(self.sigmas) - 1

        if not self._x0_history or last_step or self.solver_order == 1:
            # first order
            x_t = (s_t / s_s) * sample - a_t * math.expm1(-h) * x0
        else:
            lam_p = self._lam(i - 1)
            h_prev = lam_s - lam_p
            r = h_prev / h
            x0_prev = self._x0_history[-1]
            d = (1.0 + 1.0 / (2 * r)) * x0 - (1.0 / (2 * r)) * x0_prev
            x_t = (s_t / s_s) * sample - a_t * math.expm1(-h) * d

        self._x0_history.append(x0)
        if len(self._x0_history) > self.solver_order:
            self._x0_history.pop(0)
        self._step_index += 1
        return x_t.astype(sample.dtype)


class FlowUniPCMultistep(_FlowSolverBase):
    """UniPC (order 2, bh2) in data-prediction form (fm_solvers_unipc.py:20+).

    Runs UniC correction with the current model output against the previous
    prediction, then the UniP predictor for the next sample.
    """

    def __init__(self, num_train_timesteps: int = 1000, shift: float = 5.0,
                 solver_order: int = 2):
        super().__init__(num_train_timesteps, shift, solver_order)
        self._last_sample = None

    def _unip(self, x0, sample, i: int):
        """Predictor step from index i to i+1 using x0 history."""
        lam_s, lam_t = self._lam(i), self._lam(i + 1)
        a_t, s_t = self._alpha_sigma(i + 1)
        _, s_s = self._alpha_sigma(i)
        h = lam_t - lam_s
        hh = -h
        h_phi_1 = math.expm1(hh)
        x_t = (s_t / s_s) * sample - a_t * h_phi_1 * x0
        if self._x0_history and i + 1 < len(self.sigmas) - 1 and self.solver_order >= 2:
            lam_p = self._lam(i - 1)
            rk = (lam_p - lam_s) / h  # negative
            D1 = (self._x0_history[-1] - x0) / rk
            B_h = h_phi_1  # bh2
            h_phi_2 = h_phi_1 / hh - 1.0
            rho = (h_phi_2 / B_h)
            x_t = x_t - a_t * B_h * rho * D1
        return x_t

    def _unic(self, x0_t, i: int):
        """Corrector at index i using the fresh model output x0_t and the
        sample/x0 that produced it."""
        if self._last_sample is None or not self._x0_history:
            return None
        sample, x0_s = self._last_sample
        lam_s, lam_t = self._lam(i - 1), self._lam(i)
        a_t, s_t = self._alpha_sigma(i)
        _, s_s = self._alpha_sigma(i - 1)
        h = lam_t - lam_s
        hh = -h
        h_phi_1 = math.expm1(hh)
        B_h = h_phi_1
        h_phi_2 = h_phi_1 / hh - 1.0
        rho_c = h_phi_2 / B_h
        D1_t = x0_t - x0_s
        x_t = (s_t / s_s) * sample - a_t * h_phi_1 * x0_s - a_t * B_h * rho_c * D1_t
        return x_t

    def step(self, model_output_flow: jnp.ndarray, timestep, sample: jnp.ndarray):
        del timestep
        i = self._step_index
        x0 = self.convert_flow_to_x0(model_output_flow, sample)

        corrected = self._unic(x0, i) if i > 0 else None
        if corrected is not None:
            sample = corrected.astype(sample.dtype)
            # x0 is conditioned on the uncorrected sample; reference UniPC also
            # reuses the same model output after correction
        x_t = self._unip(x0, sample, i)

        self._x0_history.append(x0)
        if len(self._x0_history) > self.solver_order:
            self._x0_history.pop(0)
        self._last_sample = (sample, x0)
        self._step_index += 1
        return x_t.astype(sample.dtype)


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """(reference wan/utils/fm_solvers.py helper) shifted sigma ladder."""
    return _shifted_sigmas(sampling_steps, shift)
