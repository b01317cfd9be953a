"""PCA power-iteration checks.

The driver testdata embeddings are near-isotropic (random unit vectors:
covariance spectrum is almost degenerate), so "the" dominant eigenvector
is ill-conditioned there and 8 power rounds land on an arbitrary
high-eigenvalue mixture — the cross-engine oracle still verifies the
fixed-point trajectory EXACTLY on that data (tools/check_correctness).
The numpy-parity claim therefore runs on a CONSTRUCTED corpus with a
planted dominant direction (the repo's standing fixture discipline:
prove spectral behavior on data that has the property, not on noise)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from apache_beam_challange_spark.plans.linalg import (
    _DIM,
    _ITER,
    pca_power_iteration_top_component,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """200 unit vectors = strong planted direction + small noise: the
    top eigenvalue dominates (gap >> (1 - 1/ITER)), so power iteration
    must recover the planted axis."""
    rng = np.random.default_rng(7)
    u = rng.normal(size=_DIM)
    u /= np.linalg.norm(u)
    x = 0.9 * u[None, :] + 0.1 * rng.normal(size=(200, _DIM))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in x],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(["p"] * 200),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    return str(d), x


def test_pca_recovers_planted_direction(spark, planted_dir):
    d, x = planted_dir
    rows = pca_power_iteration_top_component(spark, d).collect()
    assert len(rows) == _DIM
    v = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    g = x.T @ x / len(x)
    w, vecs = np.linalg.eigh(g)
    top = vecs[:, -1]
    cos = abs(float(top @ v) / (np.linalg.norm(top) * np.linalg.norm(v)))
    assert cos > 0.999, cos
    # the L1-Rayleigh eigenvalue estimate differs from the L2 lambda_1 by
    # the ||.||_1 / ||.||_2 norm ratio of the eigenvector — bound it to
    # the same order of magnitude
    eig = rows[0]["eigval_est"]
    lam1 = float(w[-1])
    assert 0.25 * lam1 < eig < 4 * lam1, (eig, lam1)


def test_pca_runs_on_driver_corpus(spark, sf_dir):
    """On the real (near-isotropic) corpus the contract is shape +
    determinism — 64 rows, unit-ish L1 mass, fixed iteration count."""
    rows = pca_power_iteration_top_component(spark, sf_dir).collect()
    assert len(rows) == _DIM
    l1 = sum(abs(r["loading"]) for r in rows)
    assert 0.99 <= l1 <= 1.01
    assert _ITER == 8  # pinned: the oracle unrolls exactly this many


def test_pca_driver_read_is_dim_bounded():
    """The only collect() is the Gram half-triangle: dim*(dim+1)/2 rows,
    independent of corpus size."""
    assert _DIM * (_DIM + 1) // 2 == 2080


def test_kcenter_matches_numpy_greedy(spark, planted_dir):
    """The engine's farthest-point picks must equal a numpy replay of
    the same fixed-point greedy (seed 0, max-dot state, min-dot argmin,
    vec_id tie-break)."""
    from apache_beam_challange_spark.plans.linalg import (
        _KC_K,
        _KC_SD,
        kcenter_diversity_sample,
    )

    d, x = planted_dir
    rows = kcenter_diversity_sample(spark, d).collect()
    assert [r["sel_round"] for r in rows] == list(range(1, _KC_K + 1))
    xd = x.astype(np.float64)
    dots_u = np.floor(
        (xd[:, None, :] * xd[None, :, :]) * _KC_SD + 0.5
    ).astype(np.int64).sum(axis=2)
    chosen = [0]
    state = None
    for _ in range(_KC_K - 1):
        d_new = dots_u[:, chosen[-1]]
        state = d_new if state is None else np.maximum(state, d_new)
        masked = state.copy()
        masked[chosen] = np.iinfo(np.int64).max
        chosen.append(int(np.argmin(masked)))  # argmin tie-breaks low idx
    assert [r["vec_id"] for r in rows] == chosen


def test_linreg_matches_numpy_ols(spark, sf_dir):
    """The closed-form normal-equation fit must agree with a numpy OLS
    on the identically quantized data (value in 1e-4 units, hour as
    int) — same moments, so agreement is to double rounding, not a
    statistical tolerance."""
    from apache_beam_challange_spark.plans.linalg import (
        linreg_value_on_hour_by_type,
    )

    tbl = pq.read_table(
        sf_dir + "/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    tbl["h"] = tbl["ts"].dt.hour.astype(np.int64)
    tbl["yu"] = np.floor(tbl["value"] * 10000 + 0.5).astype(np.int64)
    rows = linreg_value_on_hour_by_type(spark, sf_dir).collect()
    assert len(rows) == tbl["event_type"].nunique()
    for r in rows:
        g = tbl[tbl["event_type"] == r["event_type"]]
        n = np.float64(len(g))
        sh = np.float64(g["h"].sum())
        shh = np.float64((g["h"] * g["h"]).sum())
        sy = np.float64(g["yu"].sum())
        shy = np.float64((g["h"] * g["yu"]).sum())
        slope_u = (n * shy - sh * sy) / (n * shh - sh * sh)
        assert np.isclose(r["slope_per_hour"], slope_u / 10000.0, rtol=1e-12)
        assert np.isclose(
            r["intercept"], (sy - slope_u * sh) / n / 10000.0, rtol=1e-12
        )


def test_chow_matches_numpy_ols_rss(spark, sf_dir):
    """Replay the Chow F from three numpy OLS fits on the identical
    exact-cent daily series; F must be finite and non-negative."""
    import pandas as pd

    from apache_beam_challange_spark.plans.linalg import (
        _CHOW_BREAK_DAY,
        chow_break_daily_revenue,
    )

    t = pq.read_table(
        sf_dir + "/events.parquet", columns=["ts", "event_type", "value"]
    ).to_pandas()
    t["d"] = (t["ts"].dt.normalize() - pd.Timestamp("2024-01-01")).dt.days
    t["yc"] = np.floor(t["value"].to_numpy() * 100 + 0.5).astype(np.int64)

    def rss(g):
        n = np.float64(len(g))
        x = g["d"].to_numpy(dtype=np.float64)
        y = g["yc"].to_numpy(dtype=np.float64)
        sx, sy = x.sum(), y.sum()
        sxy_c = (x * y).sum() - sx * sy / n
        return ((y * y).sum() - sy * sy / n) - sxy_c * sxy_c / (
            (x * x).sum() - sx * sx / n
        )

    rows = chow_break_daily_revenue(spark, sf_dir).collect()
    for r in rows:
        g = (
            t[t["event_type"] == r["event_type"]]
            .groupby("d")["yc"]
            .sum()
            .reset_index()
        )
        g1 = g[g["d"] < _CHOW_BREAK_DAY]
        g2 = g[g["d"] >= _CHOW_BREAK_DAY]
        assert (r["n"], r["n1"], r["n2"]) == (len(g), len(g1), len(g2))
        f = ((rss(g) - (rss(g1) + rss(g2))) / 2.0) / (
            (rss(g1) + rss(g2)) / np.float64(len(g) - 4)
        )
        assert np.isclose(r["chow_f"], f, rtol=1e-9)
        assert np.isfinite(r["chow_f"]) and r["chow_f"] >= 0.0
