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


def _connected(di: np.ndarray, dj: np.ndarray, n: int) -> bool:
    """Exact connectivity of the pair graph via union-find — decides
    rank(A) == n-1 (incidence-matrix rank theorem) so the normal-equation
    fast path is taken only when its system is provably nonsingular."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    comps = n
    for a, b in zip(di.tolist(), dj.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            comps -= 1
            if comps == 1:
                return True
    return comps == 1


def network_invert(
    pairs: DataFrame,
    key: str = "url",
    ts1: str = "ts1",
    ts2: str = "ts2",
    delta_col: str = "delta",
    weight_col: str | None = None,
    sigma_col: str | None = None,
    min_redundancy: int = 1,
    num_buckets: int | None = None,
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
        # skip_invalid_obs (ifgram_inversion.py:70-88): drop NaN pairs.
        # NULL endpoints too — a NaT survives np.unique as its own date
        # (NaT != NaT) and then idx[NaT] raises KeyError, killing the
        # whole job on one malformed row instead of skipping it. Self
        # pairs (ts1 == ts2) are vacuous constraints: the Laplacian path
        # nets them to zero but the dense path would overwrite the -1
        # with +1, turning them into a bogus absolute-value constraint —
        # drop them so both solver paths agree. Non-finite or
        # non-positive weights likewise: one NaN weight propagates
        # through np.linalg.solve WITHOUT raising and silently nulls the
        # key's entire series.
        pdf = pdf[
            pdf[delta_col].notna()
            & pdf[ts1].notna()
            & pdf[ts2].notna()
            & (pdf[ts1] != pdf[ts2])
        ]
        if weight_col is not None:
            w_ok = pd.to_numeric(pdf[weight_col], errors="coerce")
            pdf = pdf[np.isfinite(w_ok) & (w_ok > 0)]
        if len(pdf) == 0:
            return pd.DataFrame({f.name: [] for f in schema.fields})
        # index through the numpy datetime64 values (iterating the pandas
        # column yields pd.Timestamp objects that don't hash-match them)
        t1v, t2v = pdf[ts1].to_numpy(), pdf[ts2].to_numpy()
        dates = np.unique(np.concatenate([t1v, t2v]))
        idx = {d: i for i, d in enumerate(dates)}
        n_pairs, n_dates = len(pdf), len(dates)
        di = np.array([idx[d] for d in t1v], dtype=np.int64)
        dj = np.array([idx[d] for d in t2v], dtype=np.int64)
        # redundancy check (ifgram_inversion.py:246-248): weakest
        # non-reference date's pair count below threshold -> no-data
        # output for the key (computed from the index arrays — the dense
        # design matrix is only materialized on the fallback path)
        touch = np.bincount(di, minlength=n_dates) + np.bincount(dj, minlength=n_dates)
        if n_dates < 2 or int(touch[1:].min()) < min_redundancy:
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
        wv = None
        if weight_col is not None:
            wv = pdf[weight_col].to_numpy(dtype=np.float64)

        # Fast path: on a CONNECTED network the (weighted) normal
        # equations A'WA m = A'Wd have the unique solution lstsq would
        # return, and A'WA is the graph Laplacian of the pair network
        # (restricted to non-reference dates) — assembled in O(pairs)
        # scatter-adds instead of materializing the dense n_pairs x
        # n_dates design matrix, then one dense Cholesky-sized solve
        # (O(n^3/3) vs lstsq's SVD). Connectivity is decided exactly by
        # union-find (rank(A) = n_dates - #components), so the
        # nearly-singular-Laplacian trap never arises: disconnected
        # networks take the dense lstsq fallback, whose minimum-norm
        # solution the reference relies on (ifgram_inversion.py:368-389).
        m = None
        if sigma_col is None and _connected(di, dj, n_dates):
            ww = np.ones(n_pairs) if wv is None else wv
            lap = np.zeros((n_dates, n_dates), dtype=np.float64)
            np.add.at(lap, (di, di), ww)
            np.add.at(lap, (dj, dj), ww)
            np.add.at(lap, (di, dj), -ww)
            np.add.at(lap, (dj, di), -ww)
            rhs = np.zeros(n_dates, dtype=np.float64)
            np.add.at(rhs, dj, ww * d)
            np.add.at(rhs, di, -(ww * d))
            try:
                m = np.linalg.solve(lap[1:, 1:], rhs[1:])
            except np.linalg.LinAlgError:
                # reachable: a zero-weight pair is an edge for union-find
                # but not for the Laplacian (exactly singular system) —
                # fall back to the min-norm dense solve
                m = None
        if m is None:
            A = np.zeros((n_pairs, n_dates), dtype=np.float64)
            rows = np.arange(n_pairs)
            A[rows, di] = -1.0
            A[rows, dj] = 1.0
            A = A[:, 1:]  # drop the reference (first-date) column
            ws = None if wv is None else np.sqrt(wv)
            Aw = A if ws is None else A * ws[:, None]
            dw = d if ws is None else d * ws
            m = np.linalg.lstsq(Aw, dw, rcond=None)[0]
        m_full = np.concatenate([[0.0], m])
        resid = d - (m_full[dj] - m_full[di])
        coh = float(np.abs(np.exp(1j * resid).sum()) / n_pairs)
        out = {
            key: [k] * n_dates,
            "ts": list(dates),
            "value": m_full,
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
    if sigma_col is not None:
        # covariance propagation needs the per-key pseudo-inverse; runs
        # on the seqstate seam (key-clustered mapInPandas) so even this
        # rare path avoids per-key Arrow frame construction (VERDICT r4
        # #6). solve() still sees one key's rows at a time.
        def solve_groups(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = [solve(g) for _, g in pdf.groupby(key, sort=False)]
            return pd.concat(outs, ignore_index=True)

        from mintpy_spark.operators.seqstate import map_sorted_groups

        src = pairs.select(*cols)
        out = map_sorted_groups(
            src.where(F.col(key).isNotNull()), key, (ts1, ts2),
            solve_groups, schema,
        )
        # NULL keys are a legal (single) group here — the seam forbids
        # them, so that one group keeps the grouped path (null-only scan,
        # pushed-down filter; empty at plan time when the key is
        # non-nullable by schema)
        nulls = src.where(F.col(key).isNull())
        return out.unionByName(
            nulls.groupBy(key).applyInPandas(solve, schema)
        )

    # ---- batched path (the default): cohort keys by network STRUCTURE --
    #
    # The reference inverts all pixels sharing a design matrix in ONE
    # matrix-RHS solve (ifgram_inversion.py:368-389 operates on a
    # (num_pairs x num_pixels) block, not pixel-at-a-time). The Spark
    # analog: group keys into hash buckets (bounded Arrow batches, any
    # bucket count is correct — keys are independent), and inside the UDF
    # cohort keys whose (di, dj) index structure is identical after
    # mapping timestamps to sorted-date positions. One Laplacian
    # factorization then solves EVERY key in the cohort via a matrix RHS
    # — per-key cost drops from (frame build + factorize + solve) to one
    # column of a LAPACK multi-RHS triangular solve. At 10^12-key scale
    # set num_buckets ~ total_pairs / (rows per executor-comfortable
    # batch); the per-bucket working set is what must fit in memory.
    if num_buckets is None:
        num_buckets = max(
            pairs.sparkSession.sparkContext.defaultParallelism * 4, 8
        )

    def solve_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # same row filters as the per-key path (skip_invalid_obs)
        pdf = pdf[
            pdf[delta_col].notna()
            & pdf[ts1].notna()
            & pdf[ts2].notna()
            & (pdf[ts1] != pdf[ts2])
        ]
        if weight_col is not None:
            w_ok = pd.to_numeric(pdf[weight_col], errors="coerce")
            pdf = pdf[np.isfinite(w_ok) & (w_ok > 0)]
        if len(pdf) == 0:
            return pd.DataFrame({f.name: [] for f in schema.fields})
        # canonical pair order so identical networks hash to one cohort
        pdf = pdf.sort_values([key, ts1, ts2], kind="mergesort")
        kvals = pdf[key].to_numpy()
        t1v, t2v = pdf[ts1].to_numpy(), pdf[ts2].to_numpy()
        dv = pdf[delta_col].to_numpy(dtype=np.float64)
        wall = (
            pdf[weight_col].to_numpy(dtype=np.float64)
            if weight_col is not None
            else None
        )
        # use_na_sentinel=False: a NULL key must get a REAL code (the
        # default -1 sentinel breaks the sorted-boundary searchsorted —
        # NaN sorts last but -1 is the smallest code), preserving the
        # per-key path's behavior of emitting a NULL-keyed group
        kcodes, kuniq = pd.factorize(kvals, use_na_sentinel=False)
        starts = np.searchsorted(kcodes, np.arange(len(kuniq)))
        ends = np.append(starts[1:], len(kcodes))
        cohorts: dict = {}
        for g in range(len(kuniq)):
            s, e = int(starts[g]), int(ends[g])
            dates = np.unique(np.concatenate([t1v[s:e], t2v[s:e]]))
            di = np.searchsorted(dates, t1v[s:e]).astype(np.int64)
            dj = np.searchsorted(dates, t2v[s:e]).astype(np.int64)
            sig = (len(dates), di.tobytes(), dj.tobytes())
            cohorts.setdefault(sig, []).append((g, s, e, dates, di, dj))

        o_key, o_ts, o_val, o_npr, o_ndt, o_coh = [], [], [], [], [], []
        for sig, members in cohorts.items():
            n_dates = sig[0]
            _, _, _, _, di, dj = members[0]
            n_pairs, m = len(di), len(members)
            touch = np.bincount(di, minlength=n_dates) + np.bincount(
                dj, minlength=n_dates
            )
            if n_dates < 2 or int(touch[1:].min()) < min_redundancy:
                for g, s, e, dates, _, _ in members:
                    o_key.append(np.repeat(kuniq[g], n_dates))
                    o_ts.append(dates)
                    o_val.append(np.full(n_dates, np.nan))
                    o_npr.append(np.full(n_dates, n_pairs, dtype=np.int64))
                    o_ndt.append(np.full(n_dates, n_dates, dtype=np.int64))
                    o_coh.append(np.zeros(n_dates))
                continue
            conn = _connected(di, dj, n_dates)
            D = np.stack([dv[s:e] for _, s, e, _, _, _ in members], axis=1)
            A = None  # dense incidence, built lazily per cohort

            def _dense_A():
                Ad = np.zeros((n_pairs, n_dates), dtype=np.float64)
                rows = np.arange(n_pairs)
                Ad[rows, di] = -1.0
                Ad[rows, dj] = 1.0
                return Ad[:, 1:]

            if weight_col is None and conn:
                lap = np.zeros((n_dates, n_dates), dtype=np.float64)
                one = np.ones(n_pairs)
                np.add.at(lap, (di, di), one)
                np.add.at(lap, (dj, dj), one)
                np.add.at(lap, (di, dj), -one)
                np.add.at(lap, (dj, di), -one)
                rhs = np.zeros((n_dates, m), dtype=np.float64)
                np.add.at(rhs, dj, D)
                np.add.at(rhs, di, -D)
                M = np.linalg.solve(lap[1:, 1:], rhs[1:])
            elif weight_col is None:
                A = _dense_A()
                M = np.linalg.lstsq(A, D, rcond=None)[0]
            else:
                # weights differ per key: structure shared, factorization
                # not — loop keys but keep everything in numpy
                M = np.empty((n_dates - 1, m), dtype=np.float64)
                for c, (g, s, e, dates, _, _) in enumerate(members):
                    w, d = wall[s:e], dv[s:e]
                    mk = None
                    if conn:
                        lap = np.zeros((n_dates, n_dates), dtype=np.float64)
                        np.add.at(lap, (di, di), w)
                        np.add.at(lap, (dj, dj), w)
                        np.add.at(lap, (di, dj), -w)
                        np.add.at(lap, (dj, di), -w)
                        rhs = np.zeros(n_dates, dtype=np.float64)
                        np.add.at(rhs, dj, w * d)
                        np.add.at(rhs, di, -(w * d))
                        try:
                            mk = np.linalg.solve(lap[1:, 1:], rhs[1:])
                        except np.linalg.LinAlgError:
                            mk = None
                    if mk is None:
                        if A is None:
                            A = _dense_A()
                        ws = np.sqrt(w)
                        mk = np.linalg.lstsq(
                            A * ws[:, None], d * ws, rcond=None
                        )[0]
                    M[:, c] = mk
            M_full = np.vstack([np.zeros((1, m)), M])
            resid = D - (M_full[dj] - M_full[di])
            coh = np.abs(np.exp(1j * resid).sum(axis=0)) / n_pairs
            for c, (g, s, e, dates, _, _) in enumerate(members):
                o_key.append(np.repeat(kuniq[g], n_dates))
                o_ts.append(dates)
                o_val.append(M_full[:, c])
                o_npr.append(np.full(n_dates, n_pairs, dtype=np.int64))
                o_ndt.append(np.full(n_dates, n_dates, dtype=np.int64))
                o_coh.append(np.full(n_dates, coh[c]))
        return pd.DataFrame(
            {
                key: np.concatenate(o_key),
                "ts": np.concatenate(o_ts),
                "value": np.concatenate(o_val),
                "num_pairs": np.concatenate(o_npr),
                "num_dates": np.concatenate(o_ndt),
                "coherence": np.concatenate(o_coh),
            }
        )

    bucketed = pairs.select(*cols).withColumn(
        "_b", F.pmod(F.xxhash64(F.col(key)), F.lit(int(num_buckets)))
    )
    return bucketed.groupBy("_b").applyInPandas(solve_bucket, schema)
