"""Epoch/step schedules: sigmoid ramp, capacity anneal, LR schedules.

Functional equivalents of ``alpha_schedule`` (/root/reference/main_shot_vae.py:518-520),
the JointVAE capacity ramp (main_smooth_ELBO_mnist.py:262-282) and the
MultiStepLR + epoch-0 warmup optimizer policy (main_shot_vae.py:198-199,223-225,
253-254). All are plain python/jnp functions usable both on host (epoch loop)
and inside jit (step-indexed variants).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import optax


def alpha_schedule(epoch, max_epoch, alpha_max):
    """Mean-teacher sigmoidal ramp: alpha_max * exp(-5 (1 - min(1, e/E))^2).

    Parity: main_shot_vae.py:518-520. Works on python floats and jnp scalars.
    """
    if max_epoch <= 0:  # fully ramped (guards tiny debug runs)
        return alpha_max
    if isinstance(epoch, (int, float)):
        return alpha_max * math.exp(-5.0 * (1.0 - min(1.0, epoch / max_epoch)) ** 2)
    frac = jnp.minimum(1.0, epoch / max_epoch)
    return alpha_max * jnp.exp(-5.0 * (1.0 - frac) ** 2)


def shot_vae_epoch_schedules(epoch, cfg):
    """All per-epoch scalar weights of the SHOT-VAE trainer in one dict.

    Parity: main_shot_vae.py:269-279 — cmi, dmi, ew, kl_beta_c, kl_beta_d,
    pwm, ucw. ``cfg`` needs attributes: akb, cmi, dmi, aew, ewm, kbmc, kbmd,
    apw, pwm, wmf, epochs, wrd.
    """
    return {
        "cmi": alpha_schedule(epoch, cfg.akb, cfg.cmi),
        "dmi": alpha_schedule(epoch, cfg.akb, cfg.dmi),
        "ew": alpha_schedule(epoch, cfg.aew, cfg.ewm),
        "kl_beta_c": alpha_schedule(epoch, cfg.akb, cfg.kbmc),
        "kl_beta_d": alpha_schedule(epoch, cfg.akb, cfg.kbmd),
        "pwm": alpha_schedule(epoch, cfg.apw, cfg.pwm),
        "ucw": alpha_schedule(epoch, round(cfg.wmf * cfg.epochs), cfg.wrd),
    }


def multistep_lr(base_lr: float, milestones: Sequence[int], steps_per_epoch: int,
                 gamma: float = 0.1, warmup_factor: float = 0.2):
    """Piecewise-constant LR over *steps* with milestone decays and epoch-0 warmup.

    The reference multiplies lr by ``warmup_factor`` for epoch 0 only
    (main_shot_vae.py:223-225,253-254) and uses ``MultiStepLR`` with gamma 0.1
    at the epoch milestones (main_shot_vae.py:198-199). Expressed here as an
    optax schedule keyed by the global step so the whole thing lives inside
    the jitted update.

    Milestone semantics: the reference calls ``scheduler.step(epoch)`` at the
    END of epoch ``epoch`` (main_shot_vae.py:252), so the decayed LR is first
    used at the start of epoch ``m + 1`` — epoch ``m`` itself still trains at
    the undecayed LR. Hence the boundary sits at ``(m + 1) * steps_per_epoch``
    (this also keeps the ewm×5 bump, applied at the end of epoch
    ``adjust_lr[0]``, landing together with the first decay).
    """
    boundaries = {1 * steps_per_epoch: 1.0 / warmup_factor}
    for m in milestones:
        key = (m + 1) * steps_per_epoch
        boundaries[key] = boundaries.get(key, 1.0) * gamma
    return optax.piecewise_constant_schedule(
        init_value=base_lr * warmup_factor, boundaries_and_scales=boundaries
    )


def linear_capacity(step, cap_min, cap_max, num_iters):
    """Linearly annealed capacity C(t), clamped at cap_max.

    Parity: main_smooth_ELBO_mnist.py:262-268.
    """
    cap = (cap_max - cap_min) * jnp.asarray(step, jnp.float32) / float(num_iters) + cap_min
    return jnp.minimum(cap, cap_max)
