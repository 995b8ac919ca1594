"""Flow-matching noise schedule — pure-functional JAX rebuild.

Numerics mirror the reference `FlowMatchScheduler` (utils/scheduler.py:106-194)
and the flow→x0 conversion in `WanDiffusionWrapper` (utils/wan_wrapper.py:181-228):

    sigma schedule:   sigma = shift * s / (1 + (shift - 1) * s),  s = linspace
    timesteps:        t = sigma * num_train_timesteps
    add_noise:        x_t = (1 - sigma_t) * x0 + sigma_t * noise
    flow target:      v = noise - x0
    flow -> x0:       x0 = x_t - sigma_t * v
    euler step:       x_{t-1} = x_t + v * (sigma_next - sigma_t)

Timesteps are looked up by nearest-neighbour match (argmin |timesteps - t|) so any
integer timestep in [0, 1000] can be passed, as in the reference.

Deviation from reference: conversions run in float32 instead of float64
(wan_wrapper.py:196 uses double; TPUs have no f64 — fp32 is within bf16 tolerance).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FlowMatchSchedule:
    """Immutable schedule tables. Safe to close over in jitted functions."""

    sigmas: jnp.ndarray  # [num_steps] f32
    timesteps: jnp.ndarray  # [num_steps] f32
    num_train_timesteps: int = 1000
    shift: float = 5.0

    @classmethod
    def create(
        cls,
        num_inference_steps: int = 1000,
        num_train_timesteps: int = 1000,
        shift: float = 5.0,
        sigma_max: float = 1.0,
        sigma_min: float = 0.0,
        extra_one_step: bool = True,
        denoising_strength: float = 1.0,
        inverse_timesteps: bool = False,
        reverse_sigmas: bool = False,
    ) -> "FlowMatchSchedule":
        # reference: utils/scheduler.py:118-133 (server instantiates with
        # sigma_min=0.0, extra_one_step=True, release_server.py:556-557)
        sigma_start = sigma_min + (sigma_max - sigma_min) * denoising_strength
        if extra_one_step:
            sigmas = np.linspace(
                sigma_start, sigma_min, num_inference_steps + 1, dtype=np.float32
            )[:-1]
        else:
            sigmas = np.linspace(
                sigma_start, sigma_min, num_inference_steps, dtype=np.float32
            )
        if inverse_timesteps:
            sigmas = sigmas[::-1].copy()
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        if reverse_sigmas:
            sigmas = 1 - sigmas
        timesteps = sigmas * num_train_timesteps
        return cls(
            sigmas=jnp.asarray(sigmas, dtype=jnp.float32),
            timesteps=jnp.asarray(timesteps, dtype=jnp.float32),
            num_train_timesteps=num_train_timesteps,
            shift=shift,
        )

    # -- lookups ---------------------------------------------------------

    def timestep_id(self, timestep: jnp.ndarray) -> jnp.ndarray:
        """Nearest schedule index for (possibly fractional) timesteps [*]."""
        t = jnp.asarray(timestep, dtype=jnp.float32)
        return jnp.argmin(
            jnp.abs(self.timesteps[None, :] - t.reshape(-1)[:, None]), axis=1
        ).reshape(t.shape)

    def sigma_at(self, timestep: jnp.ndarray) -> jnp.ndarray:
        return self.sigmas[self.timestep_id(timestep)]

    # -- core ops (shapes: x [..., C, H, W] or any; timestep broadcastable
    #    against leading axes) ---------------------------------------------

    def _bcast_sigma(self, timestep: jnp.ndarray, ndim: int) -> jnp.ndarray:
        sigma = self.sigma_at(timestep)
        return sigma.reshape(sigma.shape + (1,) * (ndim - sigma.ndim))

    def add_noise(
        self, x0: jnp.ndarray, noise: jnp.ndarray, timestep: jnp.ndarray
    ) -> jnp.ndarray:
        """Forward corruption x_t = (1-sigma) x0 + sigma noise (scheduler.py:159-176)."""
        sigma = self._bcast_sigma(timestep, x0.ndim).astype(jnp.float32)
        out = (1.0 - sigma) * x0.astype(jnp.float32) + sigma * noise.astype(jnp.float32)
        return out.astype(noise.dtype)

    def step(
        self,
        model_output: jnp.ndarray,
        timestep: jnp.ndarray,
        sample: jnp.ndarray,
        to_final: bool = False,
    ) -> jnp.ndarray:
        """Euler flow step (scheduler.py:143-157)."""
        tid = self.timestep_id(timestep)
        sigma = self.sigmas[tid]
        sigma = sigma.reshape(sigma.shape + (1,) * (sample.ndim - sigma.ndim))
        n = self.sigmas.shape[0]
        if to_final:
            sigma_next = jnp.zeros_like(sigma)
        else:
            next_id = jnp.clip(tid + 1, 0, n - 1)
            sigma_next = jnp.where(tid + 1 >= n, 0.0, self.sigmas[next_id])
            sigma_next = sigma_next.reshape(sigma.shape)
        return (
            sample.astype(jnp.float32)
            + model_output.astype(jnp.float32) * (sigma_next - sigma)
        ).astype(sample.dtype)

    def flow_to_x0(
        self, flow_pred: jnp.ndarray, xt: jnp.ndarray, timestep: jnp.ndarray
    ) -> jnp.ndarray:
        """x0 = x_t - sigma_t * v (wan_wrapper.py:181-205)."""
        sigma = self._bcast_sigma(timestep, xt.ndim)
        out = xt.astype(jnp.float32) - sigma * flow_pred.astype(jnp.float32)
        return out.astype(flow_pred.dtype)

    def x0_to_flow(
        self, x0_pred: jnp.ndarray, xt: jnp.ndarray, timestep: jnp.ndarray
    ) -> jnp.ndarray:
        """v = (x_t - x0) / sigma_t (wan_wrapper.py:207-228)."""
        sigma = self._bcast_sigma(timestep, xt.ndim)
        out = (xt.astype(jnp.float32) - x0_pred.astype(jnp.float32)) / sigma
        return out.astype(x0_pred.dtype)

    def x0_to_noise(
        self, x0: jnp.ndarray, xt: jnp.ndarray, timestep: jnp.ndarray
    ) -> jnp.ndarray:
        """noise = (x_t - (1-sigma) x0) / sigma — flow-matching analogue of
        SchedulerInterface.convert_x0_to_noise (utils/scheduler.py:26-50)."""
        sigma = self._bcast_sigma(timestep, xt.ndim)
        out = (xt.astype(jnp.float32) - (1.0 - sigma) * x0.astype(jnp.float32)) / sigma
        return out.astype(x0.dtype)

    def noise_to_x0(
        self, noise: jnp.ndarray, xt: jnp.ndarray, timestep: jnp.ndarray
    ) -> jnp.ndarray:
        """x0 = (x_t - sigma noise) / (1-sigma) (scheduler.py:52-75 analogue)."""
        sigma = self._bcast_sigma(timestep, xt.ndim)
        out = (xt.astype(jnp.float32) - sigma * noise.astype(jnp.float32)) / (
            1.0 - sigma
        )
        return out.astype(noise.dtype)

    def training_target(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timestep: jnp.ndarray
    ) -> jnp.ndarray:
        """Flow-matching target v = noise - x0 (scheduler.py:178-180)."""
        del timestep
        return noise - sample

    def training_weight(self, timestep: jnp.ndarray) -> jnp.ndarray:
        """Gaussian-bell step weights (scheduler.py:134-141, training=True)."""
        n = self.timesteps.shape[0]
        x = self.timesteps
        y = jnp.exp(-2.0 * ((x - n / 2) / n) ** 2)
        y_shifted = y - y.min()
        weights = y_shifted * (n / y_shifted.sum())
        # NB reference training_weight uses argmin over axis 0 of
        # (timesteps[:,None] - t[None,:]) — same nearest-neighbour lookup.
        return weights[self.timestep_id(timestep)]

    def zero_padded_timesteps(self) -> jnp.ndarray:
        """timesteps with a trailing 0 — used for denoising-schedule lookup
        (release_server.py:560)."""
        return jnp.concatenate([self.timesteps, jnp.zeros((1,), jnp.float32)])


def get_denoising_schedule(
    zero_padded_timesteps: jnp.ndarray | np.ndarray,
    denoising_strength: float,
    steps: int = 4,
) -> np.ndarray:
    """Strength-scaled denoising timestep list (reference v2v.py:133-136).

    Returns a host-side np.ndarray [steps] of float32 timesteps — this is static
    per session, so it is deliberately NOT traced.
    """
    tbl = np.asarray(zero_padded_timesteps)
    idx = np.linspace(denoising_strength * 1000, 0, steps, dtype=np.float32).astype(
        np.int64
    )
    return tbl[1000 - idx]


def warp_denoising_steps(
    timesteps: np.ndarray, denoising_step_list: Sequence[int]
) -> np.ndarray:
    """Warp integer steps through the shifted schedule
    (reference pipeline/causal_inference.py:29-32)."""
    tbl = np.concatenate([np.asarray(timesteps, np.float32), np.zeros(1, np.float32)])
    return tbl[1000 - np.asarray(denoising_step_list, np.int64)]
