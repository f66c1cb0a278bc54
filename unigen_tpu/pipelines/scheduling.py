"""Flow-matching Euler discrete scheduler + SD3 timestep sampling/weighting.

Pure-function re-design of the reference's scheduler stack:
  * FlowMatchEulerDiscreteScheduler (loaded at reference train.py:280, stepped
    at src/UniGenPipeline.py:775) — static/dynamic sigma shifting, Euler step
    prev = x + (sigma_next - sigma) * v.
  * calculate_shift mu from image sequence length (UniGenPipeline.py:663-670).
  * compute_density_for_timestep_sampling / compute_loss_weighting_for_sd3
    (train.py:594-652) for the flow-matching training loop.

Everything returns arrays usable inside jit (the denoise loop runs under
lax.scan with the full sigma table precomputed).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class FlowMatchConfig:
    num_train_timesteps: int = 1000
    shift: float = 1.0                   # schnell: 1.0; SD3.5/dev: 3.0
    use_dynamic_shifting: bool = False   # FLUX.1-dev: True
    base_shift: float = 0.5
    max_shift: float = 1.15
    base_image_seq_len: int = 256
    max_image_seq_len: int = 4096


def calculate_shift(image_seq_len: int, cfg: FlowMatchConfig) -> float:
    m = (cfg.max_shift - cfg.base_shift) / (cfg.max_image_seq_len - cfg.base_image_seq_len)
    b = cfg.base_shift - m * cfg.base_image_seq_len
    return image_seq_len * m + b


def time_shift_exponential(mu: float, sigma: np.ndarray) -> np.ndarray:
    return math.exp(mu) / (math.exp(mu) + (1.0 / sigma - 1.0))


def time_shift_static(shift: float, sigma: np.ndarray) -> np.ndarray:
    return shift * sigma / (1.0 + (shift - 1.0) * sigma)


def training_sigmas(cfg: FlowMatchConfig) -> np.ndarray:
    """The scheduler's full training sigma table (descending, len N)."""
    timesteps = np.linspace(1, cfg.num_train_timesteps, cfg.num_train_timesteps)[::-1]
    sigmas = timesteps / cfg.num_train_timesteps
    if not cfg.use_dynamic_shifting:
        sigmas = time_shift_static(cfg.shift, sigmas)
    return sigmas.astype(np.float32)


def inference_sigmas(cfg: FlowMatchConfig, num_steps: int,
                     image_seq_len: Optional[int] = None,
                     mu: Optional[float] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sigmas [n+1] with terminal 0, timesteps [n] = sigma*1000)."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    if cfg.use_dynamic_shifting:
        if mu is None:
            assert image_seq_len is not None, "dynamic shifting needs seq len"
            mu = calculate_shift(image_seq_len, cfg)
        sigmas = time_shift_exponential(mu, sigmas)
    else:
        sigmas = time_shift_static(cfg.shift, sigmas)
    timesteps = sigmas * cfg.num_train_timesteps
    sigmas = np.concatenate([sigmas, [0.0]])
    return jnp.asarray(sigmas, jnp.float32), jnp.asarray(timesteps, jnp.float32)


def euler_step(sample: jnp.ndarray, model_output: jnp.ndarray,
               sigma: jnp.ndarray, sigma_next: jnp.ndarray) -> jnp.ndarray:
    """x_{t-1} = x_t + (sigma_next - sigma) * v. fp32 update."""
    out = sample.astype(jnp.float32) + (sigma_next - sigma) * model_output.astype(jnp.float32)
    return out.astype(sample.dtype)


def scale_noise(sample: jnp.ndarray, noise: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Forward process z_t = (1 - sigma) x + sigma z1 (train.py:601-604).

    Computed in f32, returned in the SAMPLE's dtype: the strongly-typed f32
    sigma table used to promote the noisy latents — and with them the ENTIRE
    training forward/backward — to f32 activations (caught in round 5: the
    serving forward traced bf16 attention while the train step traced f32;
    2x activation HBM was the single biggest train-vs-serving MFU gap)."""
    sigma = jnp.reshape(sigma.astype(jnp.float32),
                        (-1,) + (1,) * (sample.ndim - 1))
    out = (1.0 - sigma) * sample.astype(jnp.float32) \
        + sigma * noise.astype(jnp.float32)
    return out.astype(sample.dtype)


def sample_timestep_density(rng: jax.Array, batch: int, scheme: str = "none", *,
                            logit_mean: float = 0.0, logit_std: float = 1.0,
                            mode_scale: float = 1.29) -> jnp.ndarray:
    """u in (0,1) per sample (compute_density_for_timestep_sampling)."""
    if scheme == "logit_normal":
        u = jax.random.normal(rng, (batch,)) * logit_std + logit_mean
        return jax.nn.sigmoid(u)
    if scheme == "mode":
        u = jax.random.uniform(rng, (batch,))
        return 1.0 - u - mode_scale * (jnp.cos(jnp.pi * u / 2.0) ** 2 - 1.0 + u)
    return jax.random.uniform(rng, (batch,))


def loss_weighting(sigmas: jnp.ndarray, scheme: str = "none") -> jnp.ndarray:
    """compute_loss_weighting_for_sd3."""
    if scheme == "sigma_sqrt":
        return (sigmas ** -2.0).astype(jnp.float32)
    if scheme == "cosmap":
        bot = 1.0 - 2.0 * sigmas + 2.0 * sigmas ** 2
        return 2.0 / (jnp.pi * bot)
    return jnp.ones_like(sigmas)
