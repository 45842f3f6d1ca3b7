"""Pure-Python d-separation / Markov-blanket causal filter.

The reference shells out to R/bnlearn (causality/d_separation.py:24-59
writes a CSV, runs R_scripts/d_separation.R — hill-climbing structure
learning with a target-outedge blacklist — and reads back the Markov
blanket of `outcome`; causality/causal_filter.py:3-19 then rejects a
candidate iff a sensitive feature appears in that blanket). R is not in
this container, so this module provides an executable in-process
fallback with the same contract: IAMB Markov-blanket discovery
(grow-shrink over conditional-independence G-tests on discretized
variables) returning (passes: bool, blanket: list[str]).

The G² statistic is 2·N·CMI(X;T|Z); p-values come from the chi-square
survival function, computed via the standard regularized incomplete
gamma series/continued-fraction (no scipy in-container).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# chi-square survival function (regularized upper incomplete gamma)


def _gamma_q(a: float, x: float) -> float:
    """Q(a, x) = Γ(a, x)/Γ(a): series for x < a+1, Lentz continued
    fraction otherwise (the classic numerically-stable split)."""
    if x <= 0.0:
        return 1.0
    if x < a + 1.0:
        # P(a,x) series; Q = 1 - P
        term = 1.0 / a
        total = term
        n = a
        for _ in range(500):
            n += 1.0
            term *= x / n
            total += term
            if abs(term) < abs(total) * 1e-14:
                break
        p = total * math.exp(-x + a * math.log(x) - math.lgamma(a))
        return max(0.0, 1.0 - p)
    # continued fraction for Q(a,x)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        d = tiny if abs(d) < tiny else d
        c = b + an / c
        c = tiny if abs(c) < tiny else c
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < 1e-14:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def chi2_sf(x: float, df: float) -> float:
    """P(Chi2_df > x)."""
    if df <= 0:
        return 1.0
    return _gamma_q(df / 2.0, x / 2.0)


# ---------------------------------------------------------------------------
# discretization + conditional-independence G-test


def _discretize_column(s: pd.Series, bins: int) -> np.ndarray:
    """Integer codes: categoricals factorize; continuous columns get
    quantile bins (mirrors the R script's as.factor / as.numeric split,
    d_separation.R:24-26)."""
    v = s.to_numpy()
    if s.dtype.kind in "OUSb" or s.nunique(dropna=False) <= bins:
        return pd.factorize(s, use_na_sentinel=False)[0].astype(np.int64)
    q = np.nanquantile(v.astype(np.float64), np.linspace(0, 1, bins + 1)[1:-1])
    return np.digitize(np.nan_to_num(v.astype(np.float64)), np.unique(q)).astype(np.int64)


def g_test_ci(
    x: np.ndarray, t: np.ndarray, z: np.ndarray | None = None
) -> tuple[float, float]:
    """(G², p) for X ⟂ T | Z on integer-coded arrays. G² = 2·N·CMI in
    nats; df = (|X|−1)(|T|−1)·∏|Zi| with observed level counts."""
    n = len(x)
    if z is None or (hasattr(z, "shape") and z.size == 0):
        zcode = np.zeros(n, dtype=np.int64)
        n_z = 1
    else:
        z2 = z.reshape(n, -1)
        zcode = np.zeros(n, dtype=np.int64)
        n_z = 1
        for j in range(z2.shape[1]):
            _, codes = np.unique(z2[:, j], return_inverse=True)
            k = codes.max() + 1
            zcode = zcode * k + codes
            n_z *= int(k)
        _, zcode = np.unique(zcode, return_inverse=True)
    _, xc = np.unique(x, return_inverse=True)
    _, tc = np.unique(t, return_inverse=True)
    kx, kt, kz = xc.max() + 1, tc.max() + 1, zcode.max() + 1
    joint = np.zeros((kz, kx, kt), dtype=np.float64)
    np.add.at(joint, (zcode, xc, tc), 1.0)
    nz = joint.sum(axis=(1, 2), keepdims=True)
    px = joint.sum(axis=2, keepdims=True)
    pt = joint.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        expect = px * pt / np.maximum(nz, 1.0)
        terms = joint * np.log(joint / expect)
    g = 2.0 * float(np.nansum(terms))
    df = (kx - 1) * (kt - 1) * n_z
    return g, chi2_sf(g, df)


# ---------------------------------------------------------------------------
# IAMB Markov blanket


def markov_blanket(
    df: pd.DataFrame,
    target: str,
    *,
    alpha: float = 0.05,
    bins: int = 8,
    max_cond: int = 3,
) -> list[str]:
    """IAMB: grow the blanket by max conditional association while the
    G-test rejects independence, then shrink members that become
    conditionally independent. Conditioning sets are capped at
    `max_cond` strongest members (keeps counts dense at small n —
    the standard practical IAMB restriction).

    Faithfulness caveat (inherent to constraint-based growth): a parent
    pair whose joint effect is marginally invisible (pure XOR) is not
    discovered — the reference's score-based bnlearn hc would find it.
    The fairness-filter use case conditions on one candidate plus the
    sensitive column, where this does not arise."""
    coded = {c: _discretize_column(df[c], bins) for c in df.columns}
    t = coded[target]
    candidates = [c for c in df.columns if c != target]
    mb: list[str] = []

    def cond(exclude: str | None = None) -> np.ndarray | None:
        zs = [coded[m] for m in mb[:max_cond] if m != exclude]
        return np.column_stack(zs) if zs else None

    # grow
    changed = True
    while changed:
        changed = False
        best, best_g, best_p = None, 0.0, 1.0
        for c in candidates:
            if c in mb:
                continue
            g, p = g_test_ci(coded[c], t, cond())
            if p < alpha and g > best_g:
                best, best_g, best_p = c, g, p
        if best is not None:
            mb.append(best)
            changed = True
    # shrink
    for c in list(mb):
        _, p = g_test_ci(coded[c], t, cond(exclude=c))
        if p >= alpha:
            mb.remove(c)
    return mb


def d_separation_filter(
    df: pd.DataFrame,
    sensitive: list[str] | str,
    target: str = "outcome",
    *,
    alpha: float = 0.05,
    bins: int = 8,
) -> tuple[bool, list[str]]:
    """The reference causal_filter contract (causality/
    causal_filter.py:3-19): learn MB(target); pass iff no sensitive
    column is in it. Returns (passes, blanket)."""
    if isinstance(sensitive, str):
        sensitive = [sensitive]
    mb = markov_blanket(df, target, alpha=alpha, bins=bins)
    return not set(sensitive) & set(mb), mb


def builtin_causal_filter(alpha: float = 0.05, bins: int = 8):
    """Ready-made `causal_filter` for fairexp_lifecycle — the
    executable stand-in for the R/bnlearn subprocess.

    The reference's JCIT check (fairexp.py:276-286) puts the MODEL
    OUTPUT in the outcome node and asks whether it is d-separated from
    the sensitive features; in the per-candidate prefilter position the
    candidate's own values play that role: a candidate whose values are
    NOT d-separated from the sensitive column (sensitive lands in
    MB(candidate)) carries sensitive information and is vetoed, e.g.
    mean(n_tok by source) falls, log(n_tok) survives."""

    def filt(name: str, x: np.ndarray, y: np.ndarray, sensitive: np.ndarray) -> bool:
        frame = pd.DataFrame({"sensitive": pd.Series(sensitive), "outcome": x})
        ok, _mb = d_separation_filter(frame, ["sensitive"], "outcome", alpha=alpha, bins=bins)
        return ok

    return filt
