"""Network least-squares inversion — the SBAS solve itself.

Reference: ``estimate_timeseries`` (src/mintpy/ifgram_inversion.py:91-227),
the reference's flagship routine: a redundant network of pairwise
differences (interferograms there; snapshot deltas here) is inverted per
pixel into the time series at the observation dates, relative to the first
date. Design matrix A (num_pairs x num_dates) has -1 at the pair's start
date and +1 at its end date (objects/stack.py:250-280
``get_design_matrix4timeseries``); the first-date column is dropped (the
temporal reference), and the system is solved by (optionally weighted)
lstsq. Inversion quality is the temporal coherence of the residuals
(ifgram_inversion.py:291-363 ``calc_inv_quality``).

Spark recast: the unit of work is one key's pair network inside
``applyInPandas`` (one Arrow batch per key, numpy lstsq — the same
per-pixel math, keys in place of pixels). The gap-fill operator
(operators/gapfill.py) remains the degenerate-network fast path (a chain
network inverts to cumulative sums — pure window functions, no solver);
this operator handles the REDUNDANT network (connection level > 1, missing
pairs, weights) where the LS solve genuinely matters.

Consistency property used by the driver oracle: when the network is
consistent (every delta equals the true series difference — e.g. pairs
generated from the series itself), the LS solution reproduces
``series - series[first]`` exactly, so the SQL twin is the
first_value-referenced series. With noise or dropped pairs it is the
minimum-norm reconciliation, verified by pytest against numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def network_invert(
    pairs: DataFrame,
    key: str = "url",
    ts1: str = "ts1",
    ts2: str = "ts2",
    delta_col: str = "delta",
    weight_col: str | None = None,
    sigma_col: str | None = None,
    min_redundancy: int = 1,
) -> DataFrame:
    """Per-key network LS inversion.

    Input: pair rows (key, ts1, ts2, delta[, weight][, sigma]).
    Output: (key, ts, value[, value_std], num_pairs, num_dates, coherence)
    — one row per date in the key's network, value relative to the key's
    first date (value = 0.0 there), coherence = |sum exp(i * resid)| /
    num_pairs over the pair residuals (1.0 for a consistent network).

    ``sigma_col``: per-pair observation std — propagated through the
    pseudo-inverse exactly as the reference's ``estimate_timeseries_cov``
    (ifgram_inversion.py:230-265): ``ts_cov = Aplus diag(sigma^2) Aplus'``,
    ``value_std = sqrt(diag)`` (0.0 at the reference date). With weights,
    propagation runs through the weighted estimator.

    NULL/NaN deltas are dropped pair-wise (the reference's
    ``skip_invalid_obs``, ifgram_inversion.py:70-88) — one bad pair must
    not poison the key. If the surviving network's weakest date is touched
    by fewer than ``min_redundancy`` pairs, the key emits NULL values
    (the reference skips the calculation below the redundancy threshold,
    ifgram_inversion.py:246-248); lstsq still handles mere
    rank-deficiency above the threshold via the minimum-norm solution,
    exposed by the coherence channel (ifgram_inversion.py:291-363).
    """
    fields = [
        T.StructField(key, pairs.schema[key].dataType),
        T.StructField("ts", pairs.schema[ts1].dataType),
        T.StructField("value", T.DoubleType()),
    ]
    if sigma_col is not None:
        fields.append(T.StructField("value_std", T.DoubleType()))
    fields += [
        T.StructField("num_pairs", T.LongType()),
        T.StructField("num_dates", T.LongType()),
        T.StructField("coherence", T.DoubleType()),
    ]
    schema = T.StructType(fields)

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        k = pdf[key].iloc[0]
        # skip_invalid_obs (ifgram_inversion.py:70-88): drop NaN pairs
        pdf = pdf[pdf[delta_col].notna()]
        if len(pdf) == 0:
            return pd.DataFrame({f.name: [] for f in schema.fields})
        dates = np.unique(
            np.concatenate([pdf[ts1].to_numpy(), pdf[ts2].to_numpy()])
        )
        idx = {d: i for i, d in enumerate(dates)}
        n_pairs, n_dates = len(pdf), len(dates)
        A = np.zeros((n_pairs, n_dates), dtype=np.float64)
        rows = np.arange(n_pairs)
        # index through the numpy datetime64 values (iterating the pandas
        # column yields pd.Timestamp objects that don't hash-match them)
        A[rows, [idx[d] for d in pdf[ts1].to_numpy()]] = -1.0
        A[rows, [idx[d] for d in pdf[ts2].to_numpy()]] = 1.0
        A = A[:, 1:]  # drop the reference (first-date) column
        # redundancy check (ifgram_inversion.py:246-248): weakest date's
        # pair count below threshold -> no-data output for the key
        if A.shape[1] == 0 or int(np.min(np.sum(A != 0.0, axis=0))) < min_redundancy:
            return pd.DataFrame(
                {
                    key: [k] * n_dates,
                    "ts": list(dates),
                    "value": [np.nan] * n_dates,
                    **(
                        {"value_std": [np.nan] * n_dates}
                        if sigma_col is not None
                        else {}
                    ),
                    "num_pairs": [n_pairs] * n_dates,
                    "num_dates": [n_dates] * n_dates,
                    "coherence": [0.0] * n_dates,
                }
            )
        d = pdf[delta_col].to_numpy(dtype=np.float64)
        ws = None
        if weight_col is not None:
            ws = np.sqrt(pdf[weight_col].to_numpy(dtype=np.float64))
        Aw = A if ws is None else A * ws[:, None]
        dw = d if ws is None else d * ws
        m = np.linalg.lstsq(Aw, dw, rcond=None)[0]
        resid = d - A @ m
        coh = float(np.abs(np.exp(1j * resid).sum()) / n_pairs)
        values = np.concatenate([[0.0], m])
        out = {
            key: [k] * n_dates,
            "ts": list(dates),
            "value": values,
        }
        if sigma_col is not None:
            # estimate_timeseries_cov (ifgram_inversion.py:230-265):
            # Aplus diag(sigma^2) Aplus' over the (weighted) system
            s = pdf[sigma_col].to_numpy(dtype=np.float64)
            s = s if ws is None else s * ws
            Aplus = np.linalg.pinv(Aw)
            cov = (Aplus * np.square(s)[None, :]) @ Aplus.T
            out["value_std"] = np.concatenate([[0.0], np.sqrt(np.diag(cov))])
        out["num_pairs"] = [n_pairs] * n_dates
        out["num_dates"] = [n_dates] * n_dates
        out["coherence"] = [coh] * n_dates
        return pd.DataFrame(out)

    cols = [key, ts1, ts2, delta_col] + ([weight_col] if weight_col else [])
    if sigma_col is not None and sigma_col not in cols:
        cols.append(sigma_col)
    return pairs.select(*cols).groupBy(key).applyInPandas(solve, schema)
