"""Coherence -> inversion-weight generators.

Reference: src/mintpy/simulation/decorrelation.py:337-376
``coherence2weight`` and its helpers — the functions that turn a quality
measure (interferometric coherence there; any [0,1] reliability score
here, e.g. an extraction-confidence column) into WLS weights for
``fit_time_func(weight_col=...)``.

Weight families (same names/semantics as the reference):

* ``var``    — 1 / phase variance, with the distributed-scatterer phase
  PDF of Tough et al. (1995) / Hanssen (2001) Eq. 4.2.24 evaluated
  numerically into a lookup table (decorrelation.py:21-118
  ``phase_pdf_ds`` / ``phase_variance_ds`` / :270-301
  ``coherence2phase_variance``).
* ``coherence`` — the clipped coherence itself (Perissin & Wang 2012).
* ``fisher`` — Fisher information index 2L c^2/(1-c^2)
  (Seymour & Cumming 1994; decorrelation.py:325-334).

Discipline preserved from the reference: all math in float64, NaN and
sub-epsilon coherence clipped to epsilon=5e-2 (coherence2weight:339-341),
fisher clipped below 1 by 1e-3 (coherence2fisher_info_index) — then cast
float32 for storage (:371-373).

Spark shape: the numeric work happens driver-side into a small LUT /
closed form; the returned Column is pure Catalyst (clip + arithmetic or a
literal-array lookup) so weight generation rides inside whole-stage
codegen — no Python on the data path, no extra shuffle.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EPSILON = 5e-2  # coherence floor (decorrelation.py:339-341)
FISHER_EPS = 1e-3  # ceiling clip for fisher/ps paths (:329-332)
COH_STEP = 0.005  # LUT resolution (coherence2phase_variance:296-299)


def _gamma(x: float) -> float:
    try:
        return math.gamma(x)
    except ValueError:
        return float("inf")


def phase_pdf_ds(L: int, coherence: np.ndarray, phi_num: int = 1000) -> np.ndarray:
    """Marginal phase PDF for distributed scatterers, closed form for
    integer L — Hanssen (2001) Eq. 4.2.24 / Lee et al. (1994)
    (re-derivation of decorrelation.py:21-86 from the published equation).
    Returns (phi_num, len(coherence)) float64."""
    coh = np.asarray(coherence, np.float64).reshape(1, -1)
    phi = np.linspace(-np.pi, np.pi, phi_num, dtype=np.float64).reshape(-1, 1)
    A = np.power(1 - np.square(coh), L) / (2 * np.pi)
    A = np.tile(A, (phi_num, 1))
    B = _gamma(2 * L - 1) / ((_gamma(L)) ** 2 * 2 ** (2 * (L - 1)))
    beta = np.abs(coh) * np.cos(phi)
    C = ((2 * L - 1) * beta) / np.power(1 - np.square(beta), L + 0.5)
    C = C * (np.pi / 2 + np.arcsin(beta))
    C = C + 1 / np.power(1 - np.square(beta), L)
    sumD = 0.0
    if L > 1:
        acc = np.zeros_like(beta)
        for r in range(int(L) - 1):
            D = _gamma(L - 0.5) / _gamma(L - 0.5 - r)
            D *= _gamma(L - 1 - r) / _gamma(L - 1)
            D = D * (1 + (2 * r + 1) * np.square(beta)) / np.power(
                1 - np.square(beta), r + 2
            )
            acc += D
        sumD = acc / (2 * (L - 1))
    return A * (B * C + sumD)


def phase_variance_lut(L: int, coh_step: float = COH_STEP) -> tuple[np.ndarray, np.ndarray]:
    """(coherence grid, phase variance) — numerical second moment of the
    DS phase PDF on the reference's grid (decorrelation.py:87-118:
    var = sum(phi^2 * pdf * dphi) over phi in [-pi, pi))."""
    coh_num = int(1.0 / coh_step)
    coh = np.linspace(coh_step, 1.0, num=coh_num) - coh_step / 2.0
    phi_num = len(coh)
    phi = np.linspace(-np.pi, np.pi, phi_num, dtype=np.float64).reshape(-1, 1)
    phi_step = 2 * np.pi / phi_num
    pdf = phase_pdf_ds(L, coh, phi_num=phi_num)
    var = np.sum(np.square(np.tile(phi, (1, len(coh)))) * pdf * phi_step, axis=0)
    # negative tail when coherence ~ 1 -> clamp to min positive (ref :112-117)
    bad = var <= 0
    if not np.all(bad):
        var[bad] = np.nanmin(var[~bad])
    else:
        var[bad] = np.finfo(np.float64).eps
    return coh, var


def coherence2weight(
    coh: Column, weight_func: str = "var", L: int = 20, epsilon: float = EPSILON
) -> Column:
    """Coherence column -> weight column (float32, float64 math inside).

    Matches decorrelation.py:337-376: NaN/sub-epsilon coherence floored at
    epsilon; 'var' uses the DS phase-variance LUT (computed driver-side,
    shipped as a literal array — a 200-double broadcast, not a join);
    'coherence' passes the clipped value; 'fisher' is 2L c^2/(1-c^2) with
    the 1-1e-3 ceiling. Unknown names raise, same as the reference.
    """
    L = max(int(L), 1)
    c = F.coalesce(coh.cast("double"), F.lit(float(epsilon)))
    c = F.greatest(c, F.lit(float(epsilon)))
    weight_func = weight_func.lower()
    if "var" in weight_func:
        grid, var = phase_variance_lut(L)
        coh_min, coh_max = float(grid.min()), float(grid.max())
        cc = F.least(F.greatest(c, F.lit(coh_min)), F.lit(coh_max))
        # reference indexing: int16((coh - coh_min) / step), then LUT
        idx = ((cc - F.lit(coh_min)) / F.lit(COH_STEP)).cast("int")
        lut = F.array(*[F.lit(float(v)) for v in var])
        w = F.lit(1.0) / F.element_at(lut, idx + 1)
    elif "coh" in weight_func or "lin" in weight_func:
        w = c
    elif "fim" in weight_func or "fisher" in weight_func:
        cf = F.least(c, F.lit(1.0 - FISHER_EPS))
        w = F.lit(2.0 * L) * cf * cf / (F.lit(1.0) - cf * cf)
    elif weight_func in ("no", "sbas", "uniform"):
        return F.lit(None).cast("float")
    else:
        raise ValueError(f"un-recognized weight function: {weight_func}")
    return w.cast("float")
