"""Per-image two-component Chi(3) (Maxwell) mixture EM over link distances.

TPU-native version of the reference's Stats class (registration/stats.h,
stats.cxx):

* ``chipdf(x) = sqrt(2/pi) x^2 exp(-x^2/2)`` (stats.h:10-16)
* EM M-step divides the weighted mean by ``ESP = 1.59576912160573``
  (= E[Chi(3)] = 2 sqrt(2/pi), stats.cxx:16,45-47)
* convergence at 0.1% relative change of all three parameters
  (stats.cxx:49-51)
* inlier posterior with the d < 0.1 shortcut (stats.h:84-92)

Differences from the reference, both deliberate:

* The reference reservoir-subsamples to 10k distances per image
  (stats.h:36-76).  Here the E-step runs over *all* link distances —
  a few fused reductions on TPU — which is statistically strictly better;
  an optional ``max_samples`` stride-subsampling is provided for
  experiments.
* All images iterate in lockstep inside one ``lax.while_loop``; converged
  images freeze their parameters (the reference converges each image
  independently inside an OpenMP loop).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["chi_pdf", "estimate_mixture", "inlier_probability", "CHI_MEAN"]

CHI_MEAN = 1.59576912160573  # mean of the Chi(3) distribution
_SQRT_2_OVER_PI = 0.797884560802865


def chi_pdf(x):
    x2 = x * x
    return _SQRT_2_OVER_PI * x2 * jnp.exp(-0.5 * x2)


def _responsibility(d, c1, c2, ratio):
    f1 = ratio * chi_pdf(d / c1) / c1
    f2 = (1.0 - ratio) * chi_pdf(d / c2) / c2
    return f1 / (f1 + f2 + 1e-16)


@partial(jax.jit, static_argnames=("max_iterations", "settle"))
def estimate_mixture(
    distances: jax.Array,  # (N, L) per-image link distances
    valid: jax.Array,  # (N, L) bool
    params: jax.Array,  # (N, 3) warm-start (c1, c2, ratio)
    max_iterations: int = 10000,
    epsilon: float = 1e-6,
    settle: int = 3,
) -> jax.Array:
    """Run EM to convergence for every image simultaneously; returns (N, 3).

    ``settle`` runs that many EXTRA EM steps per image after the
    reference's 0.1%-relative-change stop first fires (stats.cxx:49-51).
    The stop is a knife edge: a ~1-ulp transcendental difference between
    backends (TPU exp vs libm exp) can flip it by one iteration, which
    perturbs the returned parameters by up to the full 0.1% tolerance and
    — compounded through warm starts over hundreds of optimizer
    iterations — measurably forks downstream decisions (the
    diffeomorphism guard; measured at reference scale: E rel drift
    2.9e-3 on TPU vs 3.6e-5 with identical libm).  Settling is
    contractive: each extra step shrinks the distance to the EM fixed
    point, so implementations that disagree only in ulps land on the
    same parameters.  The default 3 is this framework's (and the C++
    oracle's, baseline_frog.cpp::estimateEM) shared definition of
    convergence — a strictly-deeper stop inside the reference's own
    tolerance band; 0 reproduces the reference's stopping exactly."""
    d = distances
    w = valid.astype(jnp.float32)

    def em_step(p):
        c1, c2, ratio = p[:, 0:1], p[:, 1:2], p[:, 2:3]
        t = _responsibility(d, c1, c2, ratio) * w
        sum1 = jnp.sum(t * d, axis=1)
        sum2 = jnp.sum(t, axis=1)
        sum5 = jnp.sum(w, axis=1)
        # outlier moments summed DIRECTLY over (w - t) rather than as
        # differences of totals: when almost every sample is an inlier the
        # subtraction form cancels catastrophically in f32 and c2 becomes
        # reduction-order dependent (breaking cross-sharding determinism)
        sum3 = jnp.sum((w - t) * d, axis=1)
        sum4 = jnp.sum(w - t, axis=1)
        sum2 = jnp.maximum(sum2, epsilon)
        sum3 = jnp.maximum(sum3, epsilon)
        sum4 = jnp.maximum(sum4, epsilon)
        sum5 = jnp.maximum(sum5, epsilon)
        nc1 = jnp.maximum(epsilon, sum1 / sum2 / CHI_MEAN)
        nc2 = jnp.maximum(epsilon, sum3 / sum4 / CHI_MEAN)
        nratio = jnp.maximum(epsilon, sum2 / sum5)
        return jnp.stack([nc1, nc2, nratio], axis=1)

    # per-image state: remaining = -1 (still iterating), k > 0 (k settle
    # steps left), 0 (frozen)
    def cond(carry):
        _, remaining, it = carry
        return jnp.any(remaining != 0) & (it < max_iterations)

    def body(carry):
        p, remaining, it = carry
        new = em_step(p)
        rel = jnp.abs(p - new) / jnp.maximum(jnp.abs(new), 1e-30)
        converged = jnp.all(rel < 0.001, axis=1)
        active = remaining != 0
        p = jnp.where(active[:, None], new, p)
        # the converging step itself applies its update (reference:
        # params assigned before the break, stats.cxx:48-52), THEN the
        # settle countdown starts
        remaining = jnp.where(
            (remaining < 0) & converged,
            jnp.int32(settle),
            jnp.where(remaining > 0, remaining - 1, remaining),
        )
        return p, remaining, it + 1

    has_samples = jnp.sum(valid, axis=1) > 0
    out, _, _ = jax.lax.while_loop(
        cond,
        body,
        (params, jnp.where(has_samples, jnp.int32(-1), jnp.int32(0)),
         jnp.int32(0)),
    )
    return out


def inlier_probability(d: jax.Array, params: jax.Array) -> jax.Array:
    """Posterior inlier probability (stats.h:84-92).

    ``d`` broadcasts against ``params[..., 0:3]`` = (c1, c2, ratio).
    """
    eps = 1e-10
    c1 = params[..., 0] + eps
    c2 = params[..., 1] + eps
    ratio = params[..., 2]
    x1 = ratio * chi_pdf(d / c1) / c1
    x2 = (1.0 - ratio) * chi_pdf(d / c2) / c2
    p = x1 / (x1 + x2 + eps)
    return jnp.where(d < 0.1, 1.0, p)


def histogram(distances, valid, bin_size: float = 1.0, n_bins: int | None = None):
    """Per-image distance histograms, bin = round(d / bin_size)
    (stats.cxx:121-131).  Returns (N, n_bins) counts."""
    import numpy as np

    d = np.asarray(distances)
    v = np.asarray(valid)
    idx = np.rint(d / bin_size).astype(np.int64)
    if n_bins is None:
        n_bins = int(idx[v].max()) + 1 if v.any() else 1
    n = d.shape[0]
    out = np.zeros((n, n_bins), np.int64)
    for i in range(n):
        sel = idx[i][v[i]]
        sel = sel[sel < n_bins]
        np.add.at(out[i], sel, 1)
    return out
