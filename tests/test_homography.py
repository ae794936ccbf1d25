"""Property and oracle tests for the homography solvers.

The reference solver stack depends on kornia (absent here), so the oracle is
(a) exact synthetic recovery properties and (b) a hand-rolled numpy twin of
the reference's QR-DLT math (ref:pytracking/utils/least_squares_H.py:142-210).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from woft_tpu.geometry import (
    compose_h,
    find_homography_wls_qr,
    find_homography_wls_normal,
    find_homography_irls_qr,
    find_homography_dlt_svd,
    irls_huber,
    h_proj,
    proj_errors,
    reproj_errors,
    np_compose_h,
    np_h_proj,
)


def random_h(rng, scale=0.3):
    H = np.eye(3) + scale * rng.uniform(-0.5, 0.5, (3, 3))
    H[2, :2] *= 1e-3   # keep perspective mild / well-conditioned
    return H / H[2, 2]


def make_pairs(rng, B=2, N=100, noise=0.0, h_scale=0.3):
    pts1 = rng.uniform(0, 100, (B, N, 2)).astype(np.float32)
    Hs = np.stack([random_h(rng, h_scale) for _ in range(B)])
    pts2 = np.stack([np_h_proj(Hs[b], pts1[b].T).T for b in range(B)])
    pts2 = (pts2 + noise * rng.normal(size=pts2.shape)).astype(np.float32)
    return jnp.asarray(pts1), jnp.asarray(pts2), Hs


@pytest.mark.parametrize("solver,atol", [
    (find_homography_wls_qr, 5e-4),
    (find_homography_wls_normal, 5e-4),
    # fp32 SVD of the squared normal matrix: looser conditioning
    (find_homography_dlt_svd, 5e-3),
    (find_homography_irls_qr, 5e-4),
])
def test_exact_recovery_noiseless(solver, atol):
    rng = np.random.default_rng(0)
    pts1, pts2, Hs = make_pairs(rng, B=3, N=64)
    H_est = np.asarray(solver(pts1, pts2))
    for b in range(3):
        est = H_est[b] / H_est[b][2, 2]
        assert np.allclose(est, Hs[b], atol=atol), (est, Hs[b])


def test_weight_zeroing_equals_point_removal():
    """Zero weight on a point == removing it (SURVEY.md 7.1 core claim)."""
    rng = np.random.default_rng(1)
    pts1, pts2, _ = make_pairs(rng, B=1, N=60, noise=0.5)
    # corrupt the last 10 points heavily
    pts2 = pts2.at[:, 50:, :].add(37.0)
    w_full = jnp.ones((1, 60)).at[:, 50:].set(0.0)

    H_masked = np.asarray(find_homography_wls_qr(pts1, pts2, w_full))
    H_removed = np.asarray(find_homography_wls_qr(pts1[:, :50], pts2[:, :50],
                                                  jnp.ones((1, 50))))
    assert np.allclose(H_masked, H_removed, atol=1e-4)


def test_weights_downweight_outliers():
    rng = np.random.default_rng(2)
    pts1, pts2, Hs = make_pairs(rng, B=1, N=200, noise=0.05)
    outliers = rng.choice(200, 60, replace=False)
    pts2_corrupt = np.array(pts2)
    pts2_corrupt[0, outliers] += rng.uniform(20, 80, (60, 2))
    w = np.ones((1, 200), np.float32)
    w[0, outliers] = 1e-4

    H_w = np.asarray(find_homography_wls_qr(jnp.asarray(pts1),
                                            jnp.asarray(pts2_corrupt),
                                            jnp.asarray(w)))[0]
    H_plain = np.asarray(find_homography_wls_qr(jnp.asarray(pts1),
                                                jnp.asarray(pts2_corrupt)))[0]
    corners = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], np.float64).T
    err_w = np.linalg.norm(np_h_proj(H_w, corners) - np_h_proj(Hs[0], corners))
    err_plain = np.linalg.norm(np_h_proj(H_plain, corners)
                               - np_h_proj(Hs[0], corners))
    assert err_w < 1.0
    assert err_w < err_plain / 5


def test_qr_matches_numpy_lstsq_oracle():
    """The weighted solution must minimise ||w (A x - b)||: compare against
    numpy lstsq on the identically-constructed system."""
    rng = np.random.default_rng(3)
    pts1, pts2, _ = make_pairs(rng, B=1, N=80, noise=1.0)
    w = rng.uniform(0.1, 1.0, (1, 80)).astype(np.float32)

    H = np.asarray(find_homography_wls_qr(pts1, pts2, jnp.asarray(w),
                                          mask_normalization=False))[0]

    # numpy oracle: identical normalisation + row construction + lstsq
    def normalize(p):
        mean = p.mean(axis=0)
        scale = np.sqrt(2) / (np.linalg.norm(p - mean, axis=1).mean() + 1e-8)
        T = np.array([[scale, 0, -scale * mean[0]],
                      [0, scale, -scale * mean[1]],
                      [0, 0, 1.0]])
        return (p - mean) * scale, T

    p1 = np.asarray(pts1[0], np.float64)
    p2 = np.asarray(pts2[0], np.float64)
    p1n, T1 = normalize(p1)
    p2n, T2 = normalize(p2)
    rows_a, rows_b = [], []
    for (x1, y1), (x2, y2), wi in zip(p1n, p2n, w[0]):
        rows_a.append(wi * np.array([0, 0, 0, -x1, -y1, -1, y2 * x1, y2 * y1]))
        rows_b.append(wi * -y2)
        rows_a.append(wi * np.array([x1, y1, 1, 0, 0, 0, -x2 * x1, -x2 * y1]))
        rows_b.append(wi * x2)
    sol, *_ = np.linalg.lstsq(np.array(rows_a), np.array(rows_b), rcond=None)
    H_oracle = np.concatenate([sol, [1.0]]).reshape(3, 3)
    H_oracle = np.linalg.inv(T2) @ H_oracle @ T1
    H_oracle /= H_oracle[2, 2]
    assert np.allclose(H, H_oracle, atol=1e-3), (H, H_oracle)


def test_irls_l1_robustness():
    """L1 IRLS must shrug off gross outliers that break plain LSq."""
    rng = np.random.default_rng(4)
    pts1, pts2, Hs = make_pairs(rng, B=1, N=150, noise=0.02)
    pts2_c = np.array(pts2)
    outliers = rng.choice(150, 30, replace=False)
    pts2_c[0, outliers] += 50.0
    H = np.asarray(find_homography_irls_qr(pts1, jnp.asarray(pts2_c),
                                           n_iter=10))[0]
    H_plain = np.asarray(find_homography_wls_qr(pts1, jnp.asarray(pts2_c)))[0]
    corners = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], np.float64).T
    err = np.abs(np_h_proj(H, corners) - np_h_proj(Hs[0], corners)).max()
    err_plain = np.abs(np_h_proj(H_plain, corners)
                       - np_h_proj(Hs[0], corners)).max()
    assert err < 1.0, err
    assert err < err_plain / 3


def test_irls_huber_runs_finite():
    """Huber(k=2) on normalised residuals ~= plain LSq here; just check the
    fixed-iteration loop is stable and finite (the reference ablation_08
    solver, ref:configs 'wIRLSq')."""
    rng = np.random.default_rng(14)
    pts1, pts2, _ = make_pairs(rng, B=2, N=80, noise=0.1)
    H = np.asarray(find_homography_irls_qr(
        pts1, pts2, reweighting_fn=lambda r: irls_huber(r, k=2.0), n_iter=5))
    assert np.isfinite(H).all()
    assert np.allclose(H[:, 2, 2], 1.0)


def _np_normalize_points(pts):
    """Unweighted Hartley normalisation, float64 (kornia
    normalize_points twin, ref:least_squares_H.py:296-298)."""
    mean = pts.mean(axis=0)
    scale = np.linalg.norm(pts - mean, axis=1).mean()
    s = np.sqrt(2.0) / (scale + 1e-8)
    T = np.array([[s, 0, -s * mean[0]], [0, s, -s * mean[1]], [0, 0, 1.0]])
    return (pts - mean) * s, T


def _np_irls_qr_oracle(p1, p2, weights, reweighting_fn, n_iter):
    """Float64 line-by-line twin of the reference IRLS solver
    (ref:least_squares_H.py:280-346): data weights multiply A and b ONCE
    up front; the IRLS reweights sqrt(fn(residual)) multiply on top each
    iteration; the residual uses the weighted A; n_iter+1 solves."""
    p1n, T1 = _np_normalize_points(p1)
    p2n, T2 = _np_normalize_points(p2)
    x1, y1 = p1n[:, 0], p1n[:, 1]
    x2, y2 = p2n[:, 0], p2n[:, 1]
    o, z = np.ones_like(x1), np.zeros_like(x1)
    ax = np.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1], axis=-1)
    ay = np.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1], axis=-1)
    A = np.stack([ax, ay], axis=1).reshape(-1, 8)       # interleaved rows
    b = np.stack([-y2, x2], axis=1).reshape(-1, 1)
    if weights is not None:
        w = np.repeat(weights, 2)[:, None]
        A = w * A
        b = w * b
    rew = np.ones_like(b)
    for _ in range(n_iter + 1):
        sol = np.linalg.lstsq(rew * A, rew * b, rcond=None)[0]
        residuum = A @ sol - b
        rew = np.sqrt(reweighting_fn(residuum))
    H = np.concatenate([sol, [[1.0]]]).reshape(3, 3)
    H = np.linalg.inv(T2) @ H @ T1
    return H / H[2, 2]


def test_irls_matches_reference_oracle():
    """Our fori_loop IRLS vs the float64 reference-twin oracle — pins the
    subtle reweight normalisation (VERDICT round-1 weak #5). Uses
    mask_normalization=False to match kornia's unweighted stats."""
    rng = np.random.default_rng(11)
    pts1, pts2, Hs = make_pairs(rng, B=2, N=80, noise=0.0)
    pts2 = np.array(pts2)
    # 20% outliers
    out_idx = rng.choice(80, 16, replace=False)
    pts2[:, out_idx] += rng.normal(0, 15.0, (2, 16, 2))
    weights = rng.uniform(0.2, 1.0, (2, 80)).astype(np.float32)

    def np_huber(res, k=2.0, eps=1e-8):
        a = np.abs(res)
        w = 1.0 / (a + eps)
        w[a < k] = 1.0
        return w

    ours = np.asarray(find_homography_irls_qr(
        jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(weights),
        reweighting_fn=lambda r: irls_huber(r, k=2.0), n_iter=5,
        mask_normalization=False))

    corners = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float).T
    for bidx in range(2):
        oracle = _np_irls_qr_oracle(
            np.asarray(pts1)[bidx].astype(np.float64),
            pts2[bidx].astype(np.float64),
            weights[bidx].astype(np.float64), np_huber, n_iter=5)
        err = np.linalg.norm(np_h_proj(ours[bidx], corners)
                             - np_h_proj(oracle, corners), axis=0)
        assert err.max() < 0.05, (bidx, err)


def test_error_metrics():
    rng = np.random.default_rng(5)
    pts1, pts2, Hs = make_pairs(rng, B=2, N=32)
    H = jnp.asarray(Hs.astype(np.float32))
    pa = jnp.swapaxes(pts1, 1, 2)
    pb = jnp.swapaxes(pts2, 1, 2)
    assert np.allclose(np.asarray(proj_errors(H, pa, pb)), 0, atol=1e-2)
    assert np.allclose(np.asarray(reproj_errors(H, H, pa)), 0, atol=1e-2)
    # identity vs identity
    eye = jnp.broadcast_to(jnp.eye(3), (2, 3, 3))
    errs = proj_errors(eye, pa, pa)
    assert np.allclose(np.asarray(errs), 0, atol=1e-5)


def test_compose_h():
    rng = np.random.default_rng(6)
    A = random_h(rng)
    B = random_h(rng)
    np_res = np_compose_h(A, B)          # apply A first: B @ A
    expect = (B @ A) / (B @ A)[2, 2]
    assert np.allclose(np_res, expect)
    j_res = np.asarray(compose_h(jnp.asarray(A), jnp.asarray(B)))
    assert np.allclose(j_res, expect, atol=1e-6)
    assert np_compose_h(A, None) is None


def test_h_proj_batched():
    rng = np.random.default_rng(7)
    H = np.stack([random_h(rng) for _ in range(3)]).astype(np.float32)
    pts = rng.uniform(0, 50, (3, 2, 17)).astype(np.float32)
    out = np.asarray(h_proj(jnp.asarray(H), jnp.asarray(pts)))
    for b in range(3):
        assert np.allclose(out[b], np_h_proj(H[b], pts[b]), atol=1e-3)
