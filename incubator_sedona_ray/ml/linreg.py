"""Exact distributed least squares over integer features — train a linear
quality/length regressor on a 100 TB corpus in ONE streaming pass.

The scale pattern is mergeable sufficient statistics: ordinary least
squares needs only ``G = X'X`` and ``b = X'y`` (p x p and p x 1 — bytes,
not data). With INTEGER features and target (counts, lengths, flags — the
usual corpus-quality signals) every entry is an int64 sum of products:
order-independent, overflow-checked, and bit-equal to any SQL engine
computing ``sum(x_i * x_j)``. Each batch collapses to one partial-sums
row inside ``map_batches``; a single global aggregate merges them; the
driver solves a p x p system.

Determinism of the SOLVE: for two features + intercept the Cramer
determinants are evaluated from one shared expression-string table
(:data:`CRAMER3`) — Python ``eval`` and the SQL oracle render the SAME
expression text, so every float64 operation happens in the same order and
the coefficients match bit-for-bit, not just approximately. Larger p
falls back to ``np.linalg.solve`` (documented as non-bit-reproducible).

No counterpart in the reference repo (Sedona has no ML ops); the
sufficient-statistics formulation is textbook (e.g. Hastie et al., ESL
§3.2) and is what every "scalable linear model" implementation reduces to.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Cramer's rule for G @ beta = b with
#   G = [[n, sx1, sx2], [sx1, s11, s12], [sx2, s12, s22]],  b = (sy, s1y, s2y)
# Shared between Python eval() and the SQL oracle so the float64 op order
# is identical on both sides. All variables must already be float64/DOUBLE.
CRAMER3 = {
    "det": "n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)",
    "det0": "sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y)",
    "det1": "n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2)",
    "det2": "n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2)",
}


def suffstats_int(ds, x_cols: list[str], y_col: str) -> dict[str, int]:
    """Exact int64 sufficient statistics {n, sxi, sij (i<=j), siy, sy, syy}
    for OLS with intercept. Columns must be integer-valued; raises on
    int64 overflow in any PARTIAL, and — because the global Sum of many
    near-bound partials can still wrap silently — a float64 magnitude
    estimate of every statistic is aggregated alongside the exact int64
    and compared POST-MERGE: a merged total whose estimate exceeds 2^62 or
    disagrees with the wrapped integer raises instead of returning
    garbage."""
    from ray.data.aggregate import Sum

    p = len(x_cols)
    names = ["n", "sy", "syy"]
    names += [f"sx{i + 1}" for i in range(p)]
    names += [f"s{i + 1}{j + 1}" for i in range(p) for j in range(i, p)]
    names += [f"s{i + 1}y" for i in range(p)]

    def partial(t: pa.Table) -> pa.Table:
        cols = [t[c].to_numpy(zero_copy_only=False).astype(np.int64) for c in x_cols]
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        colsf = [c.astype(np.float64) for c in cols]
        yf = y.astype(np.float64)
        # (int exact value, float magnitude estimate) per statistic — the
        # estimate is immune to int64 wraparound, so comparing it against
        # 2^62 catches overflow the wrapped integer sum would hide
        vals = {
            "n": (np.int64(t.num_rows), float(t.num_rows)),
            "sy": (y.sum(), yf.sum()),
            "syy": ((y * y).sum(), (yf * yf).sum()),
        }
        for i, xi in enumerate(cols):
            xf = colsf[i]
            vals[f"sx{i + 1}"] = (xi.sum(), xf.sum())
            vals[f"s{i + 1}y"] = ((xi * y).sum(), (xf * yf).sum())
            for j in range(i, p):
                vals[f"s{i + 1}{j + 1}"] = ((xi * cols[j]).sum(), (xf * colsf[j]).sum())
        for k, (_, est) in vals.items():
            if abs(est) > float(1 << 62):
                raise OverflowError(f"sufficient statistic {k} near int64 range")
        cols_out = {k: pa.array([int(vals[k][0])], type=pa.int64()) for k in names}
        cols_out.update(
            {f"{k}__f": pa.array([vals[k][1]], type=pa.float64()) for k in names}
        )
        return pa.table(cols_out)

    agg = ds.map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(k, alias_name=k) for k in names],
        *[Sum(f"{k}__f", alias_name=f"{k}__f") for k in names],
    )
    out = {}
    for k in names:
        exact = int(agg[k])
        est = float(agg[f"{k}__f"])
        if abs(est) > float(1 << 62):
            raise OverflowError(f"merged sufficient statistic {k} near int64 range")
        # wrap detection: float64 carries ~15.9 significant digits, so a
        # genuine int64 wrap (error >= 2^64) dwarfs the estimate's rounding
        if abs(est - float(exact)) > max(1.0, abs(est)) * 1e-6:
            raise OverflowError(
                f"merged sufficient statistic {k} overflowed int64 "
                f"(exact={exact}, float-estimate={est!r})"
            )
        out[k] = exact
    return out


def linear_fit_exact(ds, x_cols: list[str], y_col: str):
    """OLS with intercept over integer columns. Returns a pandas DataFrame
    (feature, beta) with feature = 'intercept', then ``x_cols`` in order.
    For exactly two features the solve is the shared-expression Cramer
    form (bit-reproducible vs SQL); otherwise ``np.linalg.solve``."""
    import pandas as pd

    p = len(x_cols)
    s = suffstats_int(ds, x_cols, y_col)
    if p == 2:
        env = {k: float(v) for k, v in s.items()}
        det = eval(CRAMER3["det"], {"__builtins__": {}}, env)  # noqa: S307 — fixed expr table
        if det == 0.0:
            raise ValueError("singular design matrix")
        betas = [
            eval(CRAMER3[f"det{i}"], {"__builtins__": {}}, env) / det  # noqa: S307
            for i in range(3)
        ]
    else:
        G = np.zeros((p + 1, p + 1), dtype=np.float64)
        b = np.zeros(p + 1, dtype=np.float64)
        G[0, 0] = s["n"]
        b[0] = s["sy"]
        for i in range(p):
            G[0, i + 1] = G[i + 1, 0] = s[f"sx{i + 1}"]
            b[i + 1] = s[f"s{i + 1}y"]
            for j in range(i, p):
                G[i + 1, j + 1] = G[j + 1, i + 1] = s[f"s{i + 1}{j + 1}"]
        betas = np.linalg.solve(G, b).tolist()
    return pd.DataFrame(
        {"feature": ["intercept"] + list(x_cols), "beta": betas}
    )


def cramer3_sql(n="n", sx1="sx1", sx2="sx2", sy="sy", s11="s11", s12="s12", s22="s22", s1y="s1y", s2y="s2y"):
    """Render the shared Cramer expressions with SQL column references —
    the oracle-side twin of the Python eval above."""
    sub = {"n": n, "sx1": sx1, "sx2": sx2, "sy": sy, "s11": s11, "s12": s12, "s22": s22, "s1y": s1y, "s2y": s2y}
    import re

    def render(expr: str) -> str:
        return re.sub(r"\b([a-z0-9]+)\b", lambda m: sub.get(m.group(1), m.group(1)), expr)

    return {k: render(v) for k, v in CRAMER3.items()}
