"""Golden equality of the coarse-to-fine inversion search.

The ``coarse`` mode (exact branch-and-bound over the wspd axis, see
``_copol_argmin``) must be BIT-identical to ``exhaustive`` — same
argmin, same first-minimum tie-break, same NaN propagation — on
realistic pixels, NaN corners, and adversarial near-tie inputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from xsarsea_spark.operators.inversion import (
    _invert_batch,
    invert_from_model,
    prepare_luts,
)

COLS = {
    "inc": "incidence",
    "keep": ["pid"],
    "sigma0_co_db": "s0co_db",
    "sigma0_cr_db": "s0cr_db",
    "dsig_cr": "dsig_cr",
    "anc_re": "anc_re",
    "anc_im": "anc_im",
}


def _pixels(n: int, seed: int, with_nans: bool = True) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    wspd = rng.uniform(0.5, 45.0, n)
    phi = rng.uniform(-180.0, 180.0, n)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n, dtype=np.int64),
            "incidence": rng.uniform(17.0, 49.0, n),
            "s0co_db": rng.uniform(-30.0, 0.0, n),
            "s0cr_db": rng.uniform(-40.0, -15.0, n),
            "dsig_cr": rng.uniform(0.05, 1.5, n),
            "anc_re": wspd * np.cos(np.radians(phi)),
            "anc_im": wspd * np.sin(np.radians(phi)),
        }
    )
    if with_nans:
        for c in ["incidence", "s0co_db", "anc_re", "s0cr_db", "dsig_cr"]:
            pdf.loc[rng.choice(n, n // 20, replace=False), c] = np.nan
    return pdf


@pytest.fixture(scope="module")
def luts():
    # reference-scale steps: n_wspd ~ 250, n_phi ~ 73 — big enough
    # that coarse pruning actually engages
    return prepare_luts(
        "gmf_cmod5n", "gmf_rs2_v2",
        inc_step=1.0, wspd_step=0.2, phi_step=2.5, cr_wspd_step=0.1,
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coarse_bitequal_exhaustive(luts, seed):
    pdf = _pixels(3000, seed)
    a = _invert_batch(pdf, luts, 0.1, COLS, search="exhaustive")
    b = _invert_batch(pdf, luts, 0.1, COLS, search="coarse")
    for c in ["wind_co_re", "wind_co_im", "wind_dual_re", "wind_dual_im"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())


def test_coarse_bitequal_on_near_ties(luts):
    """Pixels engineered so many (wspd, phi) cells cost the same:
    zero ancillary wind makes Jwind constant over phi, forcing the
    tie-break to do the work in both modes."""
    n = 500
    rng = np.random.default_rng(99)
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n, dtype=np.int64),
            "incidence": np.round(rng.uniform(17.0, 49.0, n)),  # on-grid
            "s0co_db": rng.choice([-20.0, -10.0, -5.0], n),
            "s0cr_db": rng.choice([-30.0, -25.0], n),
            "dsig_cr": np.full(n, 0.5),
            "anc_re": np.zeros(n),
            "anc_im": np.zeros(n),
        }
    )
    a = _invert_batch(pdf, luts, 0.1, COLS, search="exhaustive")
    b = _invert_batch(pdf, luts, 0.1, COLS, search="coarse")
    for c in ["wind_co_re", "wind_co_im", "wind_dual_re", "wind_dual_im"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())


@pytest.mark.parametrize("stride", [2, 8, 64])
def test_stride_never_changes_results(luts, stride):
    pdf = _pixels(1000, 7)
    a = _invert_batch(pdf, luts, 0.1, COLS, search="exhaustive")
    b = _invert_batch(pdf, luts, 0.1, COLS, search="coarse", stride=stride)
    for c in ["wind_co_re", "wind_co_im", "wind_dual_re", "wind_dual_im"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())


def test_spark_end_to_end_flag(spark, luts):
    """invert_from_model honors the conf flag and both modes agree
    through the full mapInPandas plan."""
    pdf = _pixels(800, 3)
    lin = pdf.copy()
    # invert_from_model takes LINEAR sigma0 and does its own dB inside
    lin["sigma0"] = 10.0 ** (lin.pop("s0co_db") / 10.0)
    lin["sigma0_cr"] = 10.0 ** (lin.pop("s0cr_db") / 10.0)
    df = spark.createDataFrame(lin)

    def run(mode):
        out = invert_from_model(
            df,
            co_model="gmf_cmod5n",
            cr_model="gmf_rs2_v2",
            dsig_co=0.1,
            sigma0_co_col="sigma0",
            sigma0_cr_col="sigma0_cr",
            dsig_cr_col="dsig_cr",
            anc_re_col="anc_re",
            anc_im_col="anc_im",
            keep_cols=["pid"],
            search=mode,
        )
        return out.orderBy("pid").toPandas()

    a, b = run("exhaustive"), run("coarse")
    for c in ["wind_co_re", "wind_co_im", "wind_dual_re", "wind_dual_im"]:
        np.testing.assert_array_equal(a[c].to_numpy(), b[c].to_numpy())
