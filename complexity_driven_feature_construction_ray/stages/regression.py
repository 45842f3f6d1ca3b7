"""Per-group OLS regression (slope/intercept) as a streaming combiner.

The "per-entity trend" feature (e.g. each user's value drift over
time) is a grouped simple linear regression. Like the gbt fits, it
needs only the five sufficient statistics per (group):
(n, Σx, Σy, Σxx, Σxy) — so each batch contributes a vectorized
per-group partial (bincount over factorized keys), the partials merge
through ONE Ray hash aggregate over DISTINCT groups (group-cardinality
sized, never row sized), and the closed forms

    slope     = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)
    intercept = (Σy − slope·Σx) / n

run on the tiny merged frame. Matches SQL regr_slope / regr_intercept.

Numerical note: callers should shift x to a small range (e.g. epoch
seconds minus a fixed epoch) — the closed form cancels n·Σxx against
Σx², and a large x offset inflates both terms; the same shift on the
SQL side leaves slope unchanged and intercept consistently defined.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_ols(
    ds,
    *,
    key: str,
    x_col: str,
    y_col: str,
    x_shift: float = 0.0,
    slope_col: str = "slope",
    intercept_col: str = "intercept",
):
    """Returns a Dataset of (key, n, slope, intercept) per group.
    Rows with a null group key are dropped (no NULL-key group)."""
    from ray.data.aggregate import Sum

    def part(batch: pa.Table) -> pa.Table:
        k = batch[key].to_numpy(zero_copy_only=False)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64) - x_shift
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~(np.isnan(x) | np.isnan(y))
        codes, uniques = pd.factorize(k)
        # null group keys factorize to code -1, which np.bincount
        # rejects; drop those rows (documented: no NULL-key group)
        ok &= codes >= 0
        codes = np.where(codes < 0, 0, codes)
        nk = len(uniques)
        if nk == 0:
            return pa.table({key: pa.array([], type=batch[key].type),
                             "n": pa.array([], type=pa.float64()),
                             "sx": pa.array([], type=pa.float64()),
                             "sy": pa.array([], type=pa.float64()),
                             "sxx": pa.array([], type=pa.float64()),
                             "sxy": pa.array([], type=pa.float64())})
        xz = np.where(ok, x, 0.0)
        yz = np.where(ok, y, 0.0)
        return pa.table({
            key: pa.array(np.asarray(uniques)),
            "n": pa.array(np.bincount(codes, weights=ok.astype(np.float64), minlength=nk)),
            "sx": pa.array(np.bincount(codes, weights=xz, minlength=nk)),
            "sy": pa.array(np.bincount(codes, weights=yz, minlength=nk)),
            "sxx": pa.array(np.bincount(codes, weights=xz * xz, minlength=nk)),
            "sxy": pa.array(np.bincount(codes, weights=xz * yz, minlength=nk)),
        })

    merged = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("sxy", alias_name="sxy"),
        )
    )

    def close(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy()
        sx = batch["sx"].to_numpy()
        sy = batch["sy"].to_numpy()
        sxx = batch["sxx"].to_numpy()
        sxy = batch["sxy"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            den = n * sxx - sx * sx
            slope = np.where(den != 0, (n * sxy - sx * sy) / den, np.nan)
            intercept = (sy - slope * sx) / np.maximum(n, 1)
        return pa.table({
            key: batch[key],
            "n": pa.array(n.astype(np.int64)),
            slope_col: pa.array(slope),
            intercept_col: pa.array(intercept),
        })

    return merged.map_batches(close, batch_format="pyarrow")
