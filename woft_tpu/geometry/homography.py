"""Batched, differentiable homography estimation in JAX.

TPU-native rework of the reference solvers
(ref:pytracking/utils/least_squares_H.py:56-346):

- non-homogeneous DLT (H33 fixed to 1), weighted least squares, solved by QR
  (the canonical WOFT estimator) or by normal equations (fast path),
- IRLS re-weighting with L1 / Huber losses (fixed iteration count -> static
  control flow, jit-friendly),
- homogeneous DLT via SVD of the normal matrix,
- projection / reprojection error metrics.

All solvers accept zero weights as exact point removal: multiplying a row of
the least-squares system by 0 removes it from the minimisation, which is how
the framework turns the reference's dynamic boolean point filtering into
static-shape weight masking (SURVEY.md section 7.1).

Everything is batched over a leading ``B`` dim, fp32, and differentiable
(the reference trains the weight head through this solve,
ref:pytracking/optical_flow/training_configs/v2_SNOB_large_g05.py:36-50).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


# ---------------------------------------------------------------------------
# projective helpers (jnp, batched)
# ---------------------------------------------------------------------------

def e2p(pts):
    """(B, 2, N) euclidean -> (B, 3, N) homogeneous."""
    ones = jnp.ones_like(pts[..., :1, :])
    return jnp.concatenate([pts, ones], axis=-2)


def p2e(homo, eps=_EPS):
    """(B, 3, N) homogeneous -> (B, 2, N) euclidean.

    Division guarded like kornia's convert_points_from_homogeneous: points
    with |z| <= eps pass through unscaled instead of producing inf.
    """
    z = homo[..., -1:, :]
    scale = jnp.where(jnp.abs(z) > eps, 1.0 / jnp.where(z == 0, 1.0, z), 1.0)
    return homo[..., :-1, :] * scale


def h_proj(H, pts):
    """Project points by homographies. H: (B, 3, 3), pts: (B, 2, N)."""
    return p2e(H @ e2p(pts))


def compose_h(*Hs):
    """Compose homographies right-to-left and normalise H33 to 1.

    ``compose_h(A, B)`` applies ``A`` first: result = B @ A
    (ref:pytracking/utils/geom_utils.py:365-373).
    """
    result = functools.reduce(jnp.matmul, reversed(Hs))
    return result / result[..., 2:3, 2:3]


def normalize_points(points, weights=None, eps=_EPS):
    """Hartley-normalise a point set: zero centroid, mean norm sqrt(2).

    Mirrors the normalisation used by the reference solvers
    (kornia ``normalize_points``, ref:pytracking/utils/least_squares_H.py:168-169)
    with an optional ``weights`` mask so that zero-weight (padding/duplicate)
    points do not pollute the statistics — with all-ones weights this is
    exactly the unweighted transform.

    Args:
        points: (B, N, 2)
        weights: optional (B, N) non-negative; only used as a mask/weighting
            for the statistics.
    Returns:
        (normed_points (B, N, 2), transform (B, 3, 3))
    """
    if weights is None:
        mean = jnp.mean(points, axis=1, keepdims=True)          # (B,1,2)
        scale = jnp.mean(jnp.linalg.norm(points - mean, axis=-1), axis=-1)
    else:
        w = weights[..., None]                                   # (B,N,1)
        wsum = jnp.sum(w, axis=1, keepdims=True)
        mean = jnp.sum(points * w, axis=1, keepdims=True) / (wsum + eps)
        dist = jnp.linalg.norm(points - mean, axis=-1)           # (B,N)
        scale = jnp.sum(dist * weights, axis=-1) / (wsum[..., 0, 0] + eps)
    scale = jnp.sqrt(2.0) / (scale + eps)                        # (B,)

    z = jnp.zeros_like(scale)
    o = jnp.ones_like(scale)
    transform = jnp.stack([
        jnp.stack([scale, z, -scale * mean[:, 0, 0]], axis=-1),
        jnp.stack([z, scale, -scale * mean[:, 0, 1]], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)                                                  # (B,3,3)
    normed = (points - mean) * scale[:, None, None]
    return normed, transform


def _inv_norm_transform(transform):
    """Closed-form inverse of a Hartley normalisation transform."""
    s = transform[..., 0, 0]
    tx = transform[..., 0, 2]
    ty = transform[..., 1, 2]
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    inv_s = 1.0 / s
    return jnp.stack([
        jnp.stack([inv_s, z, -tx * inv_s], axis=-1),
        jnp.stack([z, inv_s, -ty * inv_s], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------------------
# DLT system construction
# ---------------------------------------------------------------------------

def _build_nonhomogeneous_system(points1, points2, weights):
    """Build the interleaved (B, 2N, 8) system A x = b with H33 fixed to 1.

    Row construction matches ref:pytracking/utils/least_squares_H.py:171-193:
    per correspondence the two rows

        [0 0 0 -x1 -y1 -1  y2*x1  y2*y1] x = -y2
        [x1 y1 1  0  0  0 -x2*x1 -x2*y1] x =  x2

    (interleaved: ax row then ay row), and — like the reference — weights
    multiply the rows directly (w, not sqrt(w)).
    """
    x1 = points1[..., 0]
    y1 = points1[..., 1]
    x2 = points2[..., 0]
    y2 = points2[..., 1]
    ones = jnp.ones_like(x1)
    zeros = jnp.zeros_like(x1)

    ax = jnp.stack([zeros, zeros, zeros, -x1, -y1, -ones, y2 * x1, y2 * y1],
                   axis=-1)                                       # (B,N,8)
    ay = jnp.stack([x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1],
                   axis=-1)                                       # (B,N,8)
    A = jnp.concatenate([ax[:, :, None, :], ay[:, :, None, :]], axis=2)
    A = A.reshape(A.shape[0], -1, 8)                              # (B,2N,8)

    b = jnp.stack([-y2, x2], axis=-1).reshape(x2.shape[0], -1, 1)  # (B,2N,1)

    if weights is not None:
        w = jnp.repeat(weights, 2, axis=-1)[..., None]            # (B,2N,1)
        A = w * A
        b = w * b
    return A, b


def _solution_to_h(solution, transform1, transform2, eps=_EPS):
    """Append H33=1, reshape, and undo the normalisation transforms."""
    B = solution.shape[0]
    ones = jnp.ones((B, 1, 1), dtype=solution.dtype)
    h = jnp.concatenate([solution, ones], axis=1).reshape(B, 3, 3)
    H = _inv_norm_transform(transform2) @ (h @ transform1)
    return H / (H[..., 2:3, 2:3] + eps)


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------

def find_homography_wls_qr(points1, points2, weights=None, *,
                           mask_normalization=True):
    """Weighted least-squares homography via QR (the canonical WOFT solver).

    Non-homogeneous DLT with H33 = 1, Hartley-normalised, solved by reduced
    QR + triangular solve (ref:pytracking/utils/least_squares_H.py:142-210).
    Differentiable; zero weights remove points exactly.

    Args:
        points1: (B, N, 2) source points.
        points2: (B, N, 2) destination points (H maps 1 -> 2).
        weights: optional (B, N).
        mask_normalization: normalise with weight-masked statistics (exact
            point removal); ``False`` reproduces the reference's unweighted
            normalisation over every passed point.
    Returns:
        (B, 3, 3) homographies with H33 = 1.
    """
    norm_w = weights if mask_normalization else None
    # The solve is tiny (2Nx8) but precision-critical: on TPU the QR's
    # internal matmuls would otherwise run bf16 passes (observed 4x worse
    # corner errors). Force fp32 MXU passes locally.
    with jax.default_matmul_precision("highest"):
        p1n, t1 = normalize_points(points1, norm_w)
        p2n, t2 = normalize_points(points2, norm_w)
        A, b = _build_nonhomogeneous_system(p1n, p2n, weights)

        q, r = jnp.linalg.qr(A)                                   # (B,2N,8),(B,8,8)
        rhs = jnp.swapaxes(q, -1, -2) @ b                         # (B,8,1)
        solution = jax.scipy.linalg.solve_triangular(r, rhs, lower=False)
        return _solution_to_h(solution, t1, t2)


def find_homography_wls_normal(points1, points2, weights=None, *,
                               mask_normalization=True, ridge=0.0):
    """Weighted least-squares homography via 8x8 normal equations.

    Fast path: builds ``A^T A`` with one MXU-friendly einsum reduction over
    the (possibly huge, zero-padded) point set and solves the tiny 8x8
    system. Same minimiser as the QR solver (the reference row-weighting by
    ``w`` makes the objective ``sum w_i^2 r_i^2``; both paths inherit it).
    Preferred for full-field (H*W points) fits where materialising Q would
    be wasteful.
    """
    norm_w = weights if mask_normalization else None
    with jax.default_matmul_precision("highest"):
        p1n, t1 = normalize_points(points1, norm_w)
        p2n, t2 = normalize_points(points2, norm_w)
        A, b = _build_nonhomogeneous_system(p1n, p2n, weights)

        AtA = jnp.einsum('bni,bnj->bij', A, A,
                         precision=jax.lax.Precision.HIGHEST)
        Atb = jnp.einsum('bni,bnk->bik', A, b,
                         precision=jax.lax.Precision.HIGHEST)
        if ridge:
            AtA = AtA + ridge * jnp.eye(8, dtype=AtA.dtype)
        solution = jnp.linalg.solve(AtA, Atb)
        return _solution_to_h(solution, t1, t2)


def irls_l1(residuals, eps=_EPS):
    """IRLS weights for an L1 loss (ref:least_squares_H.py:268-269)."""
    return 1.0 / (jnp.abs(residuals) + eps)


def irls_huber(residuals, k=1.0, eps=_EPS):
    """IRLS weights for a Huber loss: L2 within +-k, L1 outside
    (ref:least_squares_H.py:272-277)."""
    abs_res = jnp.abs(residuals)
    return jnp.where(abs_res < k, jnp.ones_like(abs_res),
                     1.0 / (abs_res + eps))


def find_homography_irls_qr(points1, points2, weights=None, *,
                            reweighting_fn=irls_l1, n_iter=5,
                            mask_normalization=True):
    """IRLS m-estimator homography (ref:least_squares_H.py:280-346).

    Runs ``n_iter + 1`` QR solves with residual-based re-weights
    ``sqrt(fn(residual))`` on top of the (optional) data weights. The loop is
    a ``lax.fori_loop`` over a fixed count — jit-friendly.
    """
    norm_w = weights if mask_normalization else None
    with jax.default_matmul_precision("highest"):
        p1n, t1 = normalize_points(points1, norm_w)
        p2n, t2 = normalize_points(points2, norm_w)
        A, b = _build_nonhomogeneous_system(p1n, p2n, weights)

        def solve(rew):
            q, r = jnp.linalg.qr(rew * A)
            rhs = jnp.swapaxes(q, -1, -2) @ (rew * b)
            return jax.scipy.linalg.solve_triangular(r, rhs, lower=False)

        def body(_, carry):
            rew, _ = carry
            solution = solve(rew)
            residuum = A @ solution - b
            return jnp.sqrt(reweighting_fn(residuum)), solution

        init = (jnp.ones_like(b), jnp.zeros((b.shape[0], 8, 1), b.dtype))
        _, solution = jax.lax.fori_loop(0, n_iter + 1, body, init)
        return _solution_to_h(solution, t1, t2)


def find_homography_dlt_svd(points1, points2, weights=None, *,
                            mask_normalization=True):
    """Homogeneous DLT via SVD of the 9x9 normal matrix
    (ref:least_squares_H.py:213-265). Weights enter as ``A^T diag(w) A``.
    """
    norm_w = weights if mask_normalization else None
    p1n, t1 = normalize_points(points1, norm_w)
    p2n, t2 = normalize_points(points2, norm_w)

    x1 = p1n[..., 0]
    y1 = p1n[..., 1]
    x2 = p2n[..., 0]
    y2 = p2n[..., 1]
    ones = jnp.ones_like(x1)
    zeros = jnp.zeros_like(x1)
    ax = jnp.stack([zeros, zeros, zeros, -x1, -y1, -ones,
                    y2 * x1, y2 * y1, y2], axis=-1)
    ay = jnp.stack([x1, y1, ones, zeros, zeros, zeros,
                    -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([ax[:, :, None, :], ay[:, :, None, :]], axis=2)
    A = A.reshape(A.shape[0], -1, 9)                              # (B,2N,9)

    with jax.default_matmul_precision("highest"):
        if weights is None:
            AtA = jnp.einsum('bni,bnj->bij', A, A,
                             precision=jax.lax.Precision.HIGHEST)
        else:
            w = jnp.repeat(weights, 2, axis=-1)                   # (B,2N)
            AtA = jnp.einsum('bn,bni,bnj->bij', w, A, A,
                             precision=jax.lax.Precision.HIGHEST)

        _, _, vt = jnp.linalg.svd(AtA)
        h = vt[..., -1, :].reshape(-1, 3, 3)
        H = _inv_norm_transform(t2) @ (h @ t1)
        return H / (H[..., 2:3, 2:3] + _EPS)


# ---------------------------------------------------------------------------
# error metrics
# ---------------------------------------------------------------------------

def proj_errors(H, pts_a, pts_b):
    """L2 distance between ``H @ pts_a`` and ``pts_b``.

    (ref:least_squares_H.py:474-489 — used by the redetection self-check.)
    H: (B,3,3); pts_a, pts_b: (B,2,N). Returns (B, N).
    """
    proj = h_proj(H, pts_a)
    return jnp.linalg.norm(proj - pts_b, axis=-2)


def reproj_errors(gt_h, est_h, pts_a):
    """Forward-by-GT, backward-by-estimate L2 errors — the training loss
    (ref:least_squares_H.py:400-419). pts_a: (B,2,N). Returns (B, N)."""
    fwd = gt_h @ e2p(pts_a)
    back = p2e(jnp.linalg.solve(est_h, fwd))
    return jnp.linalg.norm(back - pts_a, axis=-2)


def proj_diff_errors(gt_h, est_h, pts_a):
    """L2 between GT-projected and estimate-projected points
    (ref:least_squares_H.py:422-437)."""
    return jnp.linalg.norm(h_proj(gt_h, pts_a) - h_proj(est_h, pts_a),
                           axis=-2)


# ---------------------------------------------------------------------------
# host-side robust estimators (cv2; the reference's ablation solvers)
# ---------------------------------------------------------------------------

def find_homography_cvransac(pts_a, pts_b, weights=None, *,
                             max_iters=10000, thr=1.4142, conf=0.995):
    """OpenCV RANSAC homography (ablation_09, ref:least_squares_H.py:366-393).

    pts_a, pts_b: (B, N, 2) arrays (host numpy or device). Weights ignored
    (RANSAC replaces them). Returns (B, 3, 3) numpy."""
    import cv2
    a = np.asarray(pts_a, np.float64)
    b = np.asarray(pts_b, np.float64)
    assert a.shape[1] >= 4, "Not enough correspondences for RANSAC"
    hs = []
    for batch in range(a.shape[0]):
        H, _ = cv2.findHomography(a[batch].reshape(-1, 1, 2),
                                  b[batch].reshape(-1, 1, 2),
                                  method=cv2.RANSAC, maxIters=max_iters,
                                  ransacReprojThreshold=thr, confidence=conf)
        hs.append(H / (H[2, 2] + _EPS))
    return np.stack(hs)


def find_homography_trs(pts_a, pts_b, weights=None):
    """Similarity (translation/rotation/scale) fit via
    cv2.estimateAffinePartial2D (ref:least_squares_H.py:349-363)."""
    import cv2
    a = np.asarray(pts_a, np.float64)
    b = np.asarray(pts_b, np.float64)
    hs = []
    for batch in range(a.shape[0]):
        A, _ = cv2.estimateAffinePartial2D(
            a[batch].reshape(-1, 1, 2), b[batch].reshape(-1, 1, 2),
            ransacReprojThreshold=3, maxIters=10000, confidence=0.999)
        H = np.concatenate([A, [[0.0, 0.0, 1.0]]], axis=0)
        hs.append(H / (H[2, 2] + _EPS))
    return np.stack(hs)


# ---------------------------------------------------------------------------
# numpy twins (host-side glue: demo, vis, state plumbing)
# ---------------------------------------------------------------------------

def np_e2p(xs):
    """(D, N) -> (D+1, N) homogeneous (ref:geom_utils.py:234-236)."""
    return np.vstack((xs, np.ones(xs.shape[1])))


def np_p2e(xs):
    """(D+1, N) -> (D, N) euclidean (ref:geom_utils.py:239-242)."""
    return xs[:-1, :] / np.reshape(xs[-1, :], (1, xs.shape[1]))


def np_h_proj(H, points):
    """Project (D, N) points by a homography (ref:geom_utils.py:200-210)."""
    return np_p2e(np.matmul(H, np_e2p(points)))


def np_compose_h(*Hs):
    """Compose homographies right-to-left, None-propagating, H33-normalised
    (ref:geom_utils.py:365-373)."""
    for H in Hs:
        if H is None:
            return None
    result = functools.reduce(np.dot, reversed(Hs))
    return result / result[2, 2]


def np_reproj_errors(gt_h, est_h, pts_a, mean=True):
    """Numpy twin of ``reproj_errors`` (ref:least_squares_H.py:492-502)."""
    fb = np_compose_h(gt_h, np.linalg.inv(est_h))
    reproj = np_h_proj(fb, pts_a)
    err = np.sqrt(np.sum(np.square(reproj - pts_a), axis=0))
    if mean:
        return float(np.mean(err))
    return err
