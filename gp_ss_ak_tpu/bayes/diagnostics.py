"""MCMC convergence diagnostics: split-R-hat and bulk ESS.

Standard Vehtari et al. (2021) formulations over (chains, samples, p)
arrays — the quality gates for the hyperposterior path (accept-rate
alone says nothing about mixing).
"""

from __future__ import annotations

import numpy as np


def split_rhat(theta: np.ndarray) -> np.ndarray:
    """Split-R-hat per parameter. theta: (chains, samples, p)."""
    th = np.asarray(theta, np.float64)
    c, s, p = th.shape
    half = s // 2
    splits = np.concatenate([th[:, :half], th[:, half : 2 * half]], axis=0)
    m, n = splits.shape[0], splits.shape[1]
    chain_means = splits.mean(axis=1)                    # (m, p)
    chain_vars = splits.var(axis=1, ddof=1)              # (m, p)
    B = n * chain_means.var(axis=0, ddof=1)              # (p,)
    W = chain_vars.mean(axis=0)                          # (p,)
    var_plus = (n - 1) / n * W + B / n
    with np.errstate(divide="ignore", invalid="ignore"):
        rhat = np.sqrt(var_plus / W)
    return np.where(W > 0, rhat, 1.0)


def _autocov(x: np.ndarray) -> np.ndarray:
    """Autocovariance by FFT per chain; x: (n,) -> (n,)."""
    n = x.shape[0]
    xc = x - x.mean()
    f = np.fft.rfft(xc, 2 * n)
    acov = np.fft.irfft(f * np.conj(f))[:n].real / n
    return acov


def ess_bulk(theta: np.ndarray) -> np.ndarray:
    """Bulk effective sample size per parameter (Geyer initial
    monotone sequence over chain-averaged autocorrelations)."""
    th = np.asarray(theta, np.float64)
    c, s, p = th.shape
    out = np.zeros(p)
    for j in range(p):
        acovs = np.stack([_autocov(th[i, :, j]) for i in range(c)])
        chain_var = acovs[:, 0].mean()
        if chain_var == 0:
            out[j] = c * s
            continue
        # Vehtari: rho_t = 1 - (W - mean_t acov) / var_plus
        mean_var = th[:, :, j].mean(axis=1).var(ddof=1) if c > 1 else 0.0
        var_plus = (s - 1) / s * chain_var + mean_var
        rho = 1.0 - (chain_var - acovs.mean(axis=0)) / var_plus
        rho[0] = 1.0
        # Geyer pairs: sum while pair sums positive and monotone
        tau = 0.0
        prev = np.inf
        for t in range(0, s - 1, 2):
            pair = rho[t] + (rho[t + 1] if t + 1 < s else 0.0)
            if pair < 0:
                break
            pair = min(pair, prev)
            prev = pair
            tau += pair
        tau = max(2.0 * tau - 1.0, 1.0 / s)
        out[j] = c * s / tau
    return np.minimum(out, c * s)


def summarize(theta: np.ndarray, names=None) -> dict:
    """{'rhat': ..., 'ess': ..., 'mean': ..., 'std': ...} arrays."""
    th = np.asarray(theta, np.float64)
    flat = th.reshape(-1, th.shape[-1])
    return {
        "rhat": split_rhat(th),
        "ess": ess_bulk(th),
        "mean": flat.mean(axis=0),
        "std": flat.std(axis=0, ddof=1),
        "names": list(names) if names is not None else None,
    }
