"""Independent NumPy oracle for the reference math.

Because the reference binary cannot be compiled in this image (no
Armadillo), parity tests check the JAX implementation against this
plain-NumPy transliteration of the reference's FORMULAS (derived from
reading Kernel.cpp / GP_Utils.cpp, cited per function). It shares no
code with gp_ss_ak_tpu and is deliberately written in loop/BLAS style
so the two code paths are structurally independent.
"""

from __future__ import annotations

import math

import numpy as np


def rotation(alpha, beta, teta):
    """Kernel.cpp:1402-1410, element by element."""
    R = np.zeros((3, 3))
    R[0, 0] = math.cos(alpha) * math.cos(teta) + math.sin(alpha) * \
        math.sin(beta) * math.sin(teta)
    R[0, 1] = -math.sin(alpha) * math.cos(teta) + math.cos(alpha) * \
        math.sin(beta) * math.sin(teta)
    R[0, 2] = -math.cos(beta) * math.sin(teta)
    R[1, 0] = math.sin(alpha) * math.cos(beta)
    R[1, 1] = math.cos(alpha) * math.cos(beta)
    R[1, 2] = math.sin(beta)
    R[2, 0] = math.cos(alpha) * math.sin(teta) - math.sin(alpha) * \
        math.sin(beta) * math.cos(teta)
    R[2, 1] = -math.sin(alpha) * math.sin(teta) - math.cos(alpha) * \
        math.sin(beta) * math.cos(teta)
    R[2, 2] = math.cos(beta) * math.cos(teta)
    return R


def maha_dist(X1, X2, angles, widths, width_r=None):
    """MahaDist (Kernel.cpp:1370-1435): recentre by combined mean, map
    both sets through M = R diag(widths) R^T, Gram expansion, clamp."""
    X1 = np.array(X1, float)
    X2 = np.array(X2, float)
    n, m = X1.shape[0], X2.shape[0]
    d = X1.shape[1]
    mu = (X1.sum(0) + X2.sum(0)) / (n + m)
    X1 = X1 - mu
    X2 = X2 - mu
    R = np.eye(d)
    R[:3, :3] = rotation(*angles)
    lam = np.zeros((d, d))
    lam[0, 0], lam[1, 1], lam[2, 2] = widths
    if d == 4:
        lam[3, 3] = width_r
    M = R @ lam @ R.T
    A1 = X1 @ M
    A2 = X2 @ M
    D2 = (A1 * A1).sum(1)[:, None] + (A2 * A2).sum(1)[None, :] \
        - 2.0 * A1 @ A2.T
    D2[D2 < 0] = 0.0
    return D2


def eucl_dist(X1, X2, hyp):
    """EuclDist (Kernel.cpp:1343-1368): hyp^-2-scaled sq. distances."""
    X1 = np.array(X1, float)
    X2 = np.array(X2, float)
    n, m = X1.shape[0], X2.shape[0]
    mu = (X1.sum(0) + X2.sum(0)) / (n + m)
    X1 = X1 - mu
    X2 = X2 - mu
    s = math.exp(-2.0 * math.log(hyp))
    A1 = X1 * s
    A2 = X2 * s
    D2 = (A1 * X1).sum(1)[:, None] + (A2 * X2).sum(1)[None, :] \
        - 2.0 * X1 @ A2.T
    D2[D2 < 0] = 0.0
    return D2


def expans_K(X1, X2, p):
    """Kern_ExpAnisotropic::computeK (Kernel.cpp:856-882).
    p = dict with AngleX/Y/Z, inverseWidthx/y/z, Sigma, inversewidthR."""
    d = X1.shape[1]
    if d < 3:
        X1 = np.pad(X1, [(0, 0), (0, 3 - d)])
        X2 = np.pad(X2, [(0, 0), (0, 3 - d)])
    D2 = maha_dist(
        X1, X2,
        (p["AngleX"], p["AngleY"], p["AngleZ"]),
        (p["inverseWidthx"], p["inverseWidthy"], p["inverseWidthz"]),
        p.get("inversewidthR"),
    )
    return p["Sigma"] ** 2 * np.exp(-np.sqrt(D2))


def rbf_K(X1, X2, hayper, inv_width, sigma):
    """Kern_RBF::computeK (Kernel.cpp:482-488)."""
    D2 = eucl_dist(X1, X2, hayper)
    return sigma ** 2 * np.exp(-0.5 * inv_width * D2)


def exp_K(X1, X2, hayper, sigma):
    """Kern_Exponential::computeK (Kernel.cpp:636-642)."""
    D2 = eucl_dist(X1, X2, hayper)
    return sigma ** 2 * np.exp(-np.sqrt(D2))


def gauss_nlml(K, y, sn2):
    """The reference NLML for the Gaussian likelihood, via its own
    B-form algebra (GP_Utils.cpp:872-915, 1138-1162):
      alpha solves (K + sn2 I) alpha = y  (IRLS fixed point)
      B = I + K / sn2,  Lchol = chol(B)
      L = 1/2 alpha^T K alpha - sum lp + sum log diag Lchol
    """
    n = K.shape[0]
    A = K + sn2 * np.eye(n)
    alpha = np.linalg.solve(A, y)
    yhat = K @ alpha
    lp = -((y - yhat) ** 2) / (2 * sn2) - 0.5 * math.log(
        2 * math.pi * sn2)
    B = np.eye(n) + K / sn2
    Lb = np.linalg.cholesky(B)
    return 0.5 * alpha @ yhat - lp.sum() + np.log(np.diag(Lb)).sum()


def gauss_posterior(K, kX, kdiag, y, sn2):
    """posteriorMeanVar for the Gaussian case (GP_Utils.cpp:943-1043):
    mu = kX^T alpha; var = kdiag - sum(v^2) clamped >= 0, + sn2."""
    n = K.shape[0]
    A = K + sn2 * np.eye(n)
    alpha = np.linalg.solve(A, y)
    mu = kX.T @ alpha
    B = np.eye(n) + K / sn2
    Lb = np.linalg.cholesky(B)
    W = np.full(n, 1.0 / sn2)
    sw = np.sqrt(W)
    V = np.linalg.solve(Lb, sw[:, None] * kX)
    var = kdiag - (V * V).sum(0)
    var[var < 0] = 0.0
    return mu, var + sn2


def numeric_grad(f, x, eps=1e-6):
    x = np.asarray(x, float)
    g = np.zeros_like(x)
    for i in range(x.size):
        xp = x.copy()
        xm = x.copy()
        xp[i] += eps
        xm[i] -= eps
        g[i] = (f(xp) - f(xm)) / (2 * eps)
    return g
