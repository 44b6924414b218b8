"""Point-set evaluation metrics: Chamfer distance and EMD.

Replaces three CUDA eval backends of the reference:
  - chamferdist (mesh_evaluation.py:8,67-70)
  - StructuralLosses nn_distance / ApproxMatch (metrics/pytorch_structural_losses/,
    emd_cd in metrics/evaluation_metrics.py:42-62)
  - the auction-EMD `emd` package (utils/emd_utils.py)

Chamfer is exact (chunked pairwise-min over MXU matmul distances, shared with
ops/knn).  EMD uses entropic-regularised Sinkhorn iterations in a
lax.while_loop — an approximation, as is the reference's ApproxMatch
(approxmatch.cu is itself an approximate auction transport).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .knn import knn


def chamfer(a, b, a_valid=None, b_valid=None, squared: bool = True):
    """Bidirectional Chamfer distance between (N,3) and (M,3) point sets.

    Returns (cd, d_a2b (N,), d_b2a (M,)).  cd = mean_a min_b d + mean_b min_a d
    with squared euclidean by default, matching emd_cd's CD convention
    (evaluation_metrics.py:42-62: sums of per-direction means).
    """
    d_ab, _ = knn(a, b, 1, ref_valid=b_valid)
    d_ba, _ = knn(b, a, 1, ref_valid=a_valid)
    d_ab = d_ab[:, 0]
    d_ba = d_ba[:, 0]
    if not squared:
        d_ab = jnp.sqrt(jnp.maximum(d_ab, 0))
        d_ba = jnp.sqrt(jnp.maximum(d_ba, 0))
    if a_valid is not None:
        ma = jnp.where(a_valid, d_ab, 0.0).sum() / jnp.maximum(a_valid.sum(), 1)
    else:
        ma = d_ab.mean()
    if b_valid is not None:
        mb = jnp.where(b_valid, d_ba, 0.0).sum() / jnp.maximum(b_valid.sum(), 1)
    else:
        mb = d_ba.mean()
    return ma + mb, d_ab, d_ba


def emd_sinkhorn(a, b, epsilon: float = 0.005, iters: int = 600):
    """Entropic-regularised earth mover's distance between equal-size sets.

    a, b: (N,3).  Returns approximate EMD = Σ P·C with P from Sinkhorn on the
    euclidean cost (uniform marginals).  Same scale as the reference's
    emd_approx_cuda = ApproxMatch match_cost / N (evaluation_metrics.py:18-24,
    approxmatch.cu:3-326) — i.e. the mean matched euclidean distance.

    Calibration vs EXACT optimal assignment (scipy linear_sum_assignment on
    f64 costs, Gaussian clouds n ∈ {64,128,256,512}, 5 seeds each — see
    tests/test_geometry_ops.py::test_emd_sinkhorn_vs_exact): max relative
    error 0.5% at these defaults (1.6% at the looser eps=0.01/300).  The
    reference's ApproxMatch is itself an approximation that overestimates by
    a few percent, so these numbers are comparable-or-closer to true EMD.
    """
    n = a.shape[0]
    a2 = jnp.sum(a * a, -1, keepdims=True)
    b2 = jnp.sum(b * b, -1)
    C = a2 + b2[None, :] - 2.0 * jnp.matmul(
        a, b.T, precision=jax.lax.Precision.HIGHEST)
    # ApproxMatch costs are euclidean (not squared) — match that convention
    C = jnp.sqrt(jnp.maximum(C, 1e-12))

    eps = epsilon * jnp.mean(C)  # scale-invariant regularisation
    logK = -C / eps
    logu = jnp.zeros(n)
    logv = jnp.zeros(n)
    log_marg = -jnp.log(n)

    def body(i, carry):
        logu, logv = carry
        logu = log_marg - jax.nn.logsumexp(logK + logv[None, :], axis=1)
        logv = log_marg - jax.nn.logsumexp(logK + logu[:, None], axis=0)
        return (logu, logv)

    logu, logv = jax.lax.fori_loop(0, iters, body, (logu, logv))
    P = jnp.exp(logu[:, None] + logK + logv[None, :])
    # P has total mass 1 → Σ P·C is the mean matched distance, the same scale
    # as the reference's match_cost/N (emd_approx_cuda, evaluation_metrics.py:18-24)
    return jnp.sum(P * C)
