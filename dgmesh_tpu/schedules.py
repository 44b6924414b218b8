"""Learning-rate / noise schedules (reference: utils/general_utils.py:42-75).

Pure functions of the step so they can be traced inside jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1_000_000):
    """Log-linear interpolation with optional delayed warmup.

    Matches the reference's get_expon_lr_func semantics, including the
    "return 0 for step<0 or lr_init==0" disable switch.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(max(lr_final, 1e-30)) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


def linear_noise(step, lr_init: float = 0.1, lr_final: float = 1e-15,
                 lr_delay_mult: float = 0.01, max_steps: int = 20_000):
    """AST time-noise magnitude (reference: get_linear_noise_func, train.py:119).

    Linear (not log) interpolation with the same sin-delay ramp.
    """
    step = jnp.asarray(step, jnp.float32)
    delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / max_steps, 0, 1)
    )
    t = jnp.clip(step / max_steps, 0, 1)
    lerp = lr_init * (1 - t) + lr_final * t
    return delay_rate * lerp
