"""Finite-difference gradient checking for the differentiable renderer.

BASELINE.json metric: "pixel-gradient allclose vs finite differences
(materials, textures, lights, camera)". The renderer is deterministic
given (pixel, sample) — the counter-based RNG (core/rng.py) makes every
render a pure function of scene parameters — so central differences are
well-defined and comparable against reverse-mode AD.

Caveat baked into `fd_check`: discrete decisions (Russian roulette,
lobe/light picks, pass-through, visibility) move their decision
boundaries as parameters change. AD treats them as fixed (the correct
'detach' semantics, SURVEY.md §7 step 7); FD occasionally steps a sample
across a boundary and spikes. Averaging over pixels+samples and using a
central step keeps the disagreement below a few percent for smooth
losses; callers control tolerance.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np


def fd_grad(loss_fn: Callable[[float], object], x0: float,
            eps: float = 1e-3) -> float:
    """Central finite difference d loss / dx at x0."""
    lp = float(loss_fn(x0 + eps))
    lm = float(loss_fn(x0 - eps))
    return (lp - lm) / (2.0 * eps)


def fd_check(loss_fn: Callable[[float], object], x0: float = 1.0,
             eps: float = 1e-3):
    """Compare AD and FD gradients of a scalar-parameter loss.

    Returns (ad, fd, rel_err) where rel_err is |ad-fd| / max(|fd|, 1e-8).
    """
    ad = float(jax.grad(lambda x: loss_fn(x))(x0))
    fd = fd_grad(loss_fn, x0, eps)
    rel = abs(ad - fd) / max(abs(fd), 1e-8)
    return ad, fd, rel


def fd_check_vector(loss_fn: Callable, x0: np.ndarray, eps: float = 1e-3,
                    indices=None):
    """Per-component FD vs AD for a vector parameter.

    indices limits which components are FD-probed (FD is O(2 per
    component)). Returns (ad, fd, rel_err) arrays over the probed set.
    """
    import jax.numpy as jnp

    x0 = np.asarray(x0, np.float32)
    ad_full = np.asarray(jax.grad(lambda x: loss_fn(x))(jnp.asarray(x0)))
    if indices is None:
        indices = list(np.ndindex(x0.shape))
    ad, fd = [], []
    for idx in indices:
        xp = x0.copy(); xp[idx] += eps
        xm = x0.copy(); xm[idx] -= eps
        fd.append((float(loss_fn(jnp.asarray(xp)))
                   - float(loss_fn(jnp.asarray(xm)))) / (2 * eps))
        ad.append(ad_full[idx])
    ad = np.asarray(ad)
    fd = np.asarray(fd)
    rel = np.abs(ad - fd) / np.maximum(np.abs(fd), 1e-8)
    return ad, fd, rel
