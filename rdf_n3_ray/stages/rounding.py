"""Half-away-from-zero rounding matching DuckDB's ``ROUND``.

Every contract entry that reports a rounded float (ANN sims, kNN
edges, label centroids, top-event values) is hash-compared against a
DuckDB oracle that rounds with ``ROUND(x, d)`` — half-AWAY-from-zero.
``np.round`` / ``Series.round`` are half-to-EVEN, so a value landing
exactly on a representable .5 boundary at the target precision would
diverge between the engines even when the underlying float64 agrees
(ADVICE r4, stages/ann.py:678).  This helper applies the same
integer half-away rule on the Ray side: ``sign(x) * floor(|x| *
10^d + 0.5) / 10^d``.

Residual (documented, not fixable at this layer): the two engines can
still compute the UNROUNDED float64 differently (dgemm/fold vs
sequential summation order), so a sim within one ulp of a boundary
may round apart.  Ranking on the rounded value with id tie-breaks
(KnnGraph, MaskedTopK) keeps edge SELECTION stable either way; the
reported value differs only in the final 1e-4 digit in that regime.
"""
from __future__ import annotations

import numpy as np

__all__ = ["round_half_away"]


def round_half_away(x, decimals: int):
    """Round half away from zero (DuckDB ``ROUND`` semantics).

    Accepts a numpy array / pandas Series / scalar; returns a float64
    numpy array (or scalar).  NaN propagates.  ``-0.0`` survives for
    tiny negatives, matching what ``np.round`` produced before and
    what DuckDB returns for the same float64 input.

    Implementation note: NOT ``floor(|x|*scale + 0.5)`` — the +0.5
    addition double-rounds, pushing values one ulp BELOW a .5
    boundary up (e.g. 4.9999999999999996e-05 at 4 decimals) where
    C++ ``std::round`` (DuckDB's kernel) correctly rounds down.
    ``t - trunc(t)`` is exact in IEEE-754 for |t| < 2^52 (and above
    that every double is an integer, frac = 0), so comparing the
    exact fraction against 0.5 reproduces std::round bit-for-bit.
    """
    if decimals < 0:
        # DuckDB's negative-precision kernel is divide-then-multiply
        # with a different overflow rule; no caller needs it, and
        # claiming parity outside the verified domain would be wrong
        raise ValueError("round_half_away: decimals must be >= 0")
    scale = 10.0 ** decimals
    arr = np.asarray(x, dtype=np.float64)
    scalar = arr.ndim == 0
    if scalar:
        arr = np.atleast_1d(arr)  # 0-d arrays reject mask assignment
    with np.errstate(invalid="ignore", over="ignore"):
        t = arr * scale  # same pre-scaling DuckDB applies
        r = np.trunc(t)
        frac = t - r
        out = (r + np.sign(t) * (np.abs(frac) >= 0.5)) / scale
        # DuckDB's RoundOperatorPrecision returns the INPUT when the
        # scaled intermediate overflows to inf (|x| > ~1.8e308/10^d):
        # such magnitudes have no fractional part at any precision.
        # In-place on the (essentially never hit) bad rows only — a
        # np.where would copy the whole array on every hot-path call.
        bad = ~np.isfinite(t) & np.isfinite(arr)
        if bad.any():
            out[bad] = arr[bad]
    # NaN propagates; sign of small negatives survives (sign(t)*False
    # == 0.0, so -1e-9 -> -0.0 just as np.round produced)
    return np.float64(out[0]) if scalar else out
