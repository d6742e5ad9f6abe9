"""MCMC convergence diagnostics for the batched samplers — split R-hat and
effective sample size.

The reference workflow ends at the MAP handoff; this module closes the
loop on the sampling side the way `solve_stats` does for the optimizer
fleets: given the (n_samples, chains, n) draws that `hmc_sample` /
`chees_sample` return, it computes the two numbers every HMC user needs
before trusting them — the split-chain potential scale reduction factor
(R-hat, Gelman & Rubin via the split formulation of Vehtari et al. 2021)
and the autocorrelation-aware effective sample size (Geyer's initial
monotone sequence estimator, the Stan formulation).

Diagnostics are host-side numpy by design (they run once, after sampling,
on data that is being fetched for analysis anyway — the same call the
axon sync-economics note says to batch); nothing here touches the device.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = ["ChainDiagnostics", "split_rhat", "ess", "diagnose_chains"]


class ChainDiagnostics(NamedTuple):
    """Per-dimension convergence summary for a batch of chains.

    rhat: (n,) split-chain R-hat (want < 1.01)
    ess: (n,) effective sample size (out of draws * chains)
    mean/std: (n,) pooled posterior moment estimates
    """

    rhat: np.ndarray
    ess: np.ndarray
    mean: np.ndarray
    std: np.ndarray


def _split_chains(x: np.ndarray) -> np.ndarray:
    """(draws, chains, n) -> (draws//2, 2*chains, n): each chain split in
    half, so a chain drifting between halves shows up as between-chain
    variance (the 'split' in split R-hat)."""
    d = (x.shape[0] // 2) * 2
    first, second = x[: d // 2], x[d // 2 : d]
    return np.concatenate([first, second], axis=1)


def split_rhat(samples) -> np.ndarray:
    """Split-chain R-hat per dimension.

    samples: (draws, chains, n) array (as returned by the samplers).
    Returns (n,) — values near 1 indicate the chains agree; > 1.01 means
    keep sampling (Vehtari et al. 2021 threshold)."""
    x = _split_chains(np.asarray(samples, np.float64))
    n_draw, n_chain, _ = x.shape
    if n_draw < 2:
        raise ValueError("need at least 4 draws for split R-hat")
    chain_mean = x.mean(axis=0)  # (chains, n)
    chain_var = x.var(axis=0, ddof=1)  # (chains, n)
    w = chain_var.mean(axis=0)  # within
    b = n_draw * chain_mean.var(axis=0, ddof=1)  # between
    var_plus = (n_draw - 1) / n_draw * w + b / n_draw
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.sqrt(var_plus / w)
    # a dimension the chains never move in (w == 0) is perfectly mixed
    return np.where(w > 0, out, 1.0)


def _chain_autocov(x: np.ndarray) -> np.ndarray:
    """Biased (1/N) autocovariance per (chain, dim) via FFT.
    x: (draws, chains, n) -> (draws, chains, n)."""
    n_draw = x.shape[0]
    xc = x - x.mean(axis=0, keepdims=True)
    size = 2 ** int(np.ceil(np.log2(2 * n_draw)))
    f = np.fft.rfft(xc, n=size, axis=0)
    acov = np.fft.irfft(f * np.conj(f), n=size, axis=0)[:n_draw]
    return acov.real / n_draw


def ess(samples) -> np.ndarray:
    """Bulk effective sample size per dimension (Geyer initial monotone
    sequence over the multi-chain autocorrelation, as in Stan).

    samples: (draws, chains, n). Returns (n,) — iid draws give
    ~draws*chains; sticky chains give much less."""
    x = _split_chains(np.asarray(samples, np.float64))
    n_draw, n_chain, n_dim = x.shape
    if n_draw < 4:
        raise ValueError("need at least 8 draws for ess")
    acov = _chain_autocov(x)  # (draws, chains, n)
    chain_var = acov[0] * n_draw / (n_draw - 1.0)  # (chains, n)
    w = chain_var.mean(axis=0)
    var_plus = (n_draw - 1) / n_draw * w + n_draw * x.mean(axis=0).var(
        axis=0, ddof=1
    ) / n_draw
    var_plus = np.where(var_plus > 0, var_plus, 1.0)

    # rho_t = 1 - (W - mean_chain_acov_t) / var_plus     (Stan eq.)
    rho = 1.0 - (w[None, :] - acov.mean(axis=1)) / var_plus[None, :]
    rho[0] = 1.0

    # Geyer: sum consecutive pairs while positive, enforce monotone decay
    n_pair = n_draw // 2
    pair = rho[0 : 2 * n_pair : 2] + rho[1 : 2 * n_pair : 2]  # (n_pair, n)
    # monotone decreasing envelope
    pair = np.minimum.accumulate(pair, axis=0)
    # truncate at the first non-positive pair (exclusive)
    positive = pair > 0.0
    first_bad = np.where(
        positive.all(axis=0), n_pair, positive.argmin(axis=0)
    )  # (n,)
    mask = np.arange(n_pair)[:, None] < first_bad[None, :]
    tau = -1.0 + 2.0 * np.sum(pair * mask, axis=0)  # sum includes rho_0 pair
    tau = np.maximum(tau, 1.0 / np.log10(n_draw * n_chain + 10.0))
    return n_draw * n_chain / tau


def diagnose_chains(samples) -> ChainDiagnostics:
    """One-call summary: split R-hat, ESS, pooled mean/std per dimension."""
    x = np.asarray(samples, np.float64)
    pooled = x.reshape(-1, x.shape[-1])
    return ChainDiagnostics(
        rhat=split_rhat(x),
        ess=ess(x),
        mean=pooled.mean(axis=0),
        std=pooled.std(axis=0, ddof=1),
    )
