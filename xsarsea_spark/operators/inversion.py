"""Wind-field inversion from sigma0 (the engine's flagship kernel).

Parity target: xsarsea ``windspeed.py:17-439`` (``invert_from_model``):
per pixel, find the LUT entry minimizing a Bayesian cost
``J = Jwind + Jsig``; dual-pol runs a second stage over the crosspol
LUT coupled through ``|wind_co|``; wind vectors are complex (modulus =
speed, angle = direction relative to antenna).

Spark-first physical design (SURVEY.md §2.4): a pixel × LUT cross join
is infeasible at the reference's high-res LUT (~4.5e7 cells), so the
kernel is an Arrow-batched ``mapInPandas`` with the bounded LUT shipped
once per executor as a SparkContext broadcast of NumPy arrays — the
distributed analog of the reference's numba guvectorize over dask
chunks (``windspeed.py:284-323``). Inside a batch everything is
vectorized NumPy (row-chunked so memory stays ~tens of MB per task).

Complex wind is represented as (re, im) double column pairs
(SURVEY.md §1.2 — Spark has no complex type).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xsarsea_spark.functions.gmfs import GMF_REGISTRY
from xsarsea_spark.operators.lut import axis_from_range, gmf_lut_numpy

__all__ = ["invert_from_model", "prepare_luts", "crosspol_wspd_lut_db"]

_D_ANTENNA = 2.0
_D_AZI = 2.0
_DWSPD_FG = 2.0


def prepare_luts(
    co_model: str | None,
    cr_model: str | None,
    inc_step: float = 1.0,
    wspd_step: float = 0.2,
    phi_step: float = 2.5,
    cr_wspd_step: float = 0.1,
) -> dict:
    """Driver-side constant fold: materialize LUTs in dB as NumPy.

    Mirrors the reference's LUT preparation hoist
    (``windspeed.py:144-181``): dB conversion, coordinate vectors, and
    the per-(wspd, phi) cartesian wind components precomputed once.
    """
    out: dict = {"phi_180": False}
    if co_model:
        g = GMF_REGISTRY[co_model]
        axes = [
            axis_from_range("incidence", g.inc_range[0], g.inc_range[1], inc_step),
            axis_from_range("wspd", g.wspd_range[0], g.wspd_range[1], wspd_step),
            axis_from_range("phi", g.phi_range[0], g.phi_range[1], phi_step),
        ]
        lut = gmf_lut_numpy(co_model, axes)
        sig_db = 10.0 * np.log10(lut["sigma0"] + 1e-15)
        c = lut["coords"]
        lut_db = np.ascontiguousarray(sig_db.transpose(1, 2, 0))
        with np.errstate(invalid="ignore"):
            # per-(wspd, incidence) sigma0 band over phi, for the
            # coarse-search lower bound (NaN cells -> NaN band ->
            # prune-safe: an all-NaN phi slice can never win anyway)
            band_lo = np.nanmin(lut_db, axis=1)
            band_hi = np.nanmax(lut_db, axis=1)
        out["co"] = {
            # (wspd, phi, incidence) contiguous like the reference kernel
            "lut_db": lut_db,
            "band_lo": band_lo,  # (wspd, incidence)
            "band_hi": band_hi,
            "inc": c["incidence"],
            "wspd": c["wspd"],
            "phi": c["phi"],
        }
        out["phi_180"] = (180.0 - (c["phi"][-1] - c["phi"][0])) < 2.0
        wspd_g, phi_g = np.meshgrid(c["wspd"], c["phi"], indexing="ij")
        out["co"]["u"] = wspd_g * np.cos(np.radians(phi_g))  # antenna comp
        out["co"]["v"] = wspd_g * np.sin(np.radians(phi_g))  # azimuth comp
        out["co"]["wspd_grid"] = wspd_g
        out["co"]["phi_grid"] = phi_g
    if cr_model:
        g = GMF_REGISTRY[cr_model]
        axes = [
            axis_from_range("incidence", g.inc_range[0], g.inc_range[1], inc_step),
            axis_from_range("wspd", g.wspd_range[0], g.wspd_range[1], cr_wspd_step),
        ]
        lut = gmf_lut_numpy(cr_model, axes)
        out["cr"] = {
            "lut_db": np.ascontiguousarray(
                (10.0 * np.log10(lut["sigma0"] + 1e-15)).transpose(1, 0)
            ),  # (wspd, incidence)
            "inc": lut["coords"]["incidence"],
            "wspd": lut["coords"]["wspd"],
        }
    return out


def crosspol_wspd_lut_db(cr_model: str, inc_step: float = 1.0,
                         wspd_step: float = 0.1) -> dict:
    """Crosspol LUT alone (for the SQL-checkable crosspol inversion)."""
    return prepare_luts(None, cr_model, inc_step=inc_step,
                        cr_wspd_step=wspd_step)["cr"]


def _nearest_idx(x: np.ndarray, x0: float, step: float, n: int) -> np.ndarray:
    """Nearest regular-grid index via floor(t + 0.5) — the same closed
    form the SQL oracle uses, so both engines bucket identically."""
    i = np.floor((x - x0) / step + 0.5)
    # NaN pixels are masked downstream by the NaN guard, but the int
    # cast itself must not see them (numpy emits "invalid value
    # encountered in cast"): park them on index 0 first — the guard
    # overwrites those lanes with NaN regardless of the index used.
    i = np.where(np.isnan(i), 0.0, i)
    return np.clip(i, 0, n - 1).astype(np.int64)


def _copol_argmin(
    co: dict,
    phi_180: bool,
    s0co: np.ndarray,
    m_ant: np.ndarray,
    m_azi: np.ndarray,
    iis: np.ndarray,
    dsig_co: float,
    jbuf: np.ndarray,
    tbuf: np.ndarray,
    search: str,
    stride: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-chunk copol cost argmin -> (wspd, phi); all inputs are
    1-D vectors over the chunk's valid pixels.

    Two search modes producing BIT-IDENTICAL results:

    - ``exhaustive``: every (wspd, phi) cell, the wspd-blocked loop.
    - ``coarse``: the reference's restricted-search idea
      (``windspeed.py:220-276``) done as exact branch-and-bound. A
      strided pass establishes a per-pixel cost bound jmin1; a wspd
      is then skipped when, for EVERY pixel of the chunk, an analytic
      lower bound on its cost exceeds jmin1. The bound sums two
      terms, each a true lower bound of the evaluated cost:

      * wind prior: ``((w - |anc|)/D)^2 <= Jwind(w, phi)`` for every
        grid phi (the continuous-circle minimum);
      * sigma0 band: per (w, incidence) the LUT's [min, max] over phi
        is precomputed; if the pixel's s0 falls outside the band,
        ``((nearest band edge - s0)/dsig)^2 <= Jsig(w, phi)``. With
        the reference's dsig_co = 0.1 this cuts sharply: wspds whose
        backscatter band can't reach the observed sigma0 cost
        hundreds, and the surviving band of wspds is narrow.

      Skipping is per-w over the whole chunk (union of per-pixel
      live sets), never per-pixel — measured: per-w fancy indexing
      cost more than it pruned. The caller sorts pixels by
      (incidence index, s0) before chunking so per-pixel live sets
      inside a chunk overlap tightly. A skipped wspd has J strictly
      above the global minimum for every pixel, so it can neither
      win nor steal the first-minimum tie-break; evaluating extra
      wspds is exhaustive-identical by construction — the ascending
      loop reproduces the exhaustive selection exactly (golden-tested
      in tests/test_inversion_search.py). The 1e-9 relative margin
      only UNDER-prunes (float slack), never changes results.
    """
    n_w, n_phi = co["lut_db"].shape[0], co["lut_db"].shape[1]
    b = len(s0co)
    rows = np.arange(b)

    def eval_w(w: int, sub: np.ndarray):
        # one wspd slice over the pixel subset ``sub``; in-place passes
        # over the preallocated (n_phi, chunk) buffers with the same
        # elementwise op order in both modes -> bit-identical values
        m = len(sub)
        j = jbuf[:, :m]
        t = tbuf[:, :m]
        np.subtract(co["u"][w][:, None], m_ant[sub][None, :], out=j)
        j /= _D_ANTENNA
        np.multiply(j, j, out=j)
        np.subtract(co["v"][w][:, None], m_azi[sub][None, :], out=t)
        t /= _D_AZI
        np.multiply(t, t, out=t)
        j += t
        np.take(co["lut_db"][w], iis[sub], axis=1, out=t)
        t -= s0co[sub][None, :]
        t /= dsig_co
        np.multiply(t, t, out=t)
        j += t
        p = np.argmin(j, axis=0)
        return p, j[p, np.arange(m)]

    # NaN-init: if a pixel's cost is NaN for EVERY wspd (a NaN
    # anywhere in lut_db propagates through argmin), no update fires
    jmin = np.full(b, np.inf)
    wspd_co = np.full(b, np.nan)
    phi_co = np.full(b, np.nan)

    use_coarse = (
        search == "coarse"
        and _D_ANTENNA == _D_AZI  # the circle bound needs one D
        and n_w > 2 * stride
    )
    if use_coarse:
        # lower-bound matrix (n_w, b): wind prior + sigma0-band terms
        mm = np.hypot(m_ant, m_azi)
        lb = (co["wspd"][:, None] - mm[None, :]) / _D_ANTENNA
        np.multiply(lb, lb, out=lb)
        blo = co["band_lo"][:, iis]          # (n_w, b)
        bhi = co["band_hi"][:, iis]
        s0 = s0co[None, :]
        gap = np.where(s0 < blo, blo - s0, np.where(s0 > bhi, s0 - bhi, 0.0))
        gap /= dsig_co
        np.multiply(gap, gap, out=gap)
        lb += gap                             # NaN band -> NaN lb -> not live
        jmin1 = np.full(b, np.inf)
        for w in range(0, n_w, stride):
            _, vmin = eval_w(w, rows)
            np.fmin(jmin1, vmin, out=jmin1)  # fmin: NaN never lowers
        thr = jmin1 * (1.0 + 1e-9) + 1e-12  # inf stays inf: no prune
        # a wspd survives if ANY pixel's bound admits it; the winner
        # for each pixel always survives (its lb <= its J <= jmin1 <
        # thr), and an all-NaN-cost pixel (thr=inf) keeps every
        # finite-bound wspd alive
        live_w = np.flatnonzero((lb <= thr).any(axis=1))
    else:
        live_w = range(n_w)

    for w in live_w:
        p, vmin = eval_w(w, rows)
        upd = vmin < jmin
        if upd.any():
            jmin[upd] = vmin[upd]
            wspd_co[upd] = co["wspd"][w]
            phi_co[upd] = co["phi"][p[upd]]
    return wspd_co, phi_co


def _invert_batch(
    pdf: pd.DataFrame,
    luts: dict,
    dsig_co: float,
    cols: dict,
    chunk: int | None = None,
    search: str = "coarse",
    stride: int = 16,
) -> pd.DataFrame:
    # measured sweet spots (tests/test_inversion_search.py + PLANS.md):
    # coarse wants small chunks (tighter per-chunk live-wspd unions),
    # exhaustive wants big ones (amortize the per-wspd python loop)
    if chunk is None:
        chunk = 256 if search == "coarse" else 1024
    n = len(pdf)
    inc = pdf[cols["inc"]].to_numpy(dtype=np.float64, na_value=np.nan)
    out_co = np.full(n, np.nan, dtype=np.complex128)
    out_dual = np.full(n, np.nan, dtype=np.complex128)

    has_co = "co" in luts and cols.get("sigma0_co_db") is not None
    has_cr = "cr" in luts and cols.get("sigma0_cr_db") is not None

    if has_co:
        s0co = pdf[cols["sigma0_co_db"]].to_numpy(np.float64, na_value=np.nan)
        anc = (
            pdf[cols["anc_re"]].to_numpy(np.float64, na_value=np.nan)
            + 1j * pdf[cols["anc_im"]].to_numpy(np.float64, na_value=np.nan)
        )
        co = luts["co"]
        ii = _nearest_idx(inc, co["inc"][0],
                          co["inc"][1] - co["inc"][0], len(co["inc"]))
        valid = ~np.isnan(inc) & ~np.isnan(s0co) & ~np.isnan(np.abs(anc))
        idx = np.flatnonzero(valid)
        if search == "coarse":
            # sort pixels by (incidence index, s0) so the per-pixel
            # live wspd sets inside each chunk overlap tightly
            # (per-pixel results are order-independent; outputs
            # scatter back through sel)
            idx = idx[np.lexsort((s0co[idx], ii[idx]))]
        # wspd-blocked argmin (see _copol_argmin): iterating the wspd
        # axis keeps every temporary at (n_phi, chunk) — cache-resident
        # — instead of materializing the full (n_wspd, n_phi, chunk)
        # cost cube (~18 MB per 128 px at reference LUT steps, which
        # made the kernel DRAM-bandwidth-bound at ~10x the compute
        # cost). Identical arithmetic order and first-minimum
        # tie-break, so results are bit-equal to the cube form.
        n_phi = co["lut_db"].shape[1]
        jbuf = np.empty((n_phi, chunk))
        tbuf = np.empty((n_phi, chunk))
        for s in range(0, len(idx), chunk):
            sel = idx[s: s + chunk]
            m_ant = np.real(anc[sel])
            m_azi = np.imag(anc[sel])
            if luts["phi_180"]:
                m_azi = np.abs(m_azi)
            wspd_co, phi_co = _copol_argmin(
                co, luts["phi_180"], s0co[sel], m_ant, m_azi, ii[sel],
                dsig_co, jbuf, tbuf, search, stride,
            )
            sol = wspd_co * np.exp(1j * np.radians(phi_co))
            if luts["phi_180"]:
                sol2 = wspd_co * np.exp(-1j * np.radians(phi_co))
                d1 = np.abs(np.angle(anc[sel] / sol))
                d2 = np.abs(np.angle(anc[sel] / sol2))
                sol = np.where(d1 <= d2, sol, sol2)
            out_co[sel] = sol

    if has_cr:
        s0cr = pdf[cols["sigma0_cr_db"]].to_numpy(np.float64, na_value=np.nan)
        dsig_cr = pdf[cols["dsig_cr"]].to_numpy(np.float64, na_value=np.nan)
        cr = luts["cr"]
        ii = _nearest_idx(inc, cr["inc"][0],
                          cr["inc"][1] - cr["inc"][0], len(cr["inc"]))
        valid = ~np.isnan(inc) & ~np.isnan(s0cr) & ~np.isnan(dsig_cr)
        if has_co:
            # copol requested but ancillary NaN -> dual also NaN (guard
            # parity with windspeed.py:197-207)
            s0co_n = pdf[cols["sigma0_co_db"]].to_numpy(np.float64,
                                                        na_value=np.nan)
            anc_n = (
                pdf[cols["anc_re"]].to_numpy(np.float64, na_value=np.nan)
                + 1j * pdf[cols["anc_im"]].to_numpy(np.float64, na_value=np.nan)
            )
            valid &= ~(~np.isnan(s0co_n) & np.isnan(np.abs(anc_n)))
        idx = np.flatnonzero(valid)
        n_crw = cr["lut_db"].shape[0]
        jc = np.empty((n_crw, chunk))
        tc = np.empty((n_crw, chunk))
        for s in range(0, len(idx), chunk):
            sel = idx[s: s + chunk]
            b = len(sel)
            jcb = jc[:, :b]
            tcb = tc[:, :b]
            # jsig = ((lut - s0) / dsig)^2 in-place (same op order as
            # the expression form -> bit-identical)
            np.take(cr["lut_db"], ii[sel], axis=1, out=jcb)
            jcb -= s0cr[sel][None, :]
            jcb /= dsig_cr[sel][None, :]
            np.multiply(jcb, jcb, out=jcb)
            wco = np.abs(out_co[sel])
            fg = ~np.isnan(wco)
            if fg.any():
                np.subtract(cr["wspd"][:, None], wco[None, :], out=tcb)
                tcb /= _DWSPD_FG
                np.multiply(tcb, tcb, out=tcb)
                jcb[:, fg] += tcb[:, fg]
            amin = np.argmin(jcb, axis=0)
            wspd_dual = cr["wspd"][amin]
            phi_dual = np.where(fg, np.angle(out_co[sel]), 0.0)
            out_dual[sel] = wspd_dual * np.exp(1j * phi_dual)

    if has_co and has_cr:
        # low-wind blend (windspeed.py:426-428): below 5 m/s the copol
        # solution is the dual-pol wind
        low = (np.abs(out_co) < 5.0) | (np.abs(out_dual) < 5.0)
        out_dual = np.where(low, out_co, out_dual)

    res = pdf[cols["keep"]].copy()
    res["wind_co_re"] = np.real(out_co)
    res["wind_co_im"] = np.imag(out_co)
    res["wind_dual_re"] = np.real(out_dual)
    res["wind_dual_im"] = np.imag(out_dual)
    return res


def invert_from_model(
    px: DataFrame,
    co_model: str | None = None,
    cr_model: str | None = None,
    dsig_co: float = 0.1,
    inc_col: str = "incidence",
    sigma0_co_col: str | None = None,
    sigma0_cr_col: str | None = None,
    dsig_cr_col: str | None = None,
    anc_re_col: str | None = None,
    anc_im_col: str | None = None,
    keep_cols: list | None = None,
    lut_inc_step: float = 1.0,
    lut_wspd_step: float = 0.2,
    lut_phi_step: float = 2.5,
    lut_cr_wspd_step: float = 0.1,
    search: str | None = None,
) -> DataFrame:
    """Distributed wind inversion; returns keep_cols + wind (re, im) pairs.

    Input sigma0 columns are LINEAR; dB conversion (with the reference's
    1e-15 clamp) happens inside the plan before the kernel.

    ``search`` picks the copol argmin strategy: ``"coarse"`` (default;
    exact branch-and-bound, bit-identical to exhaustive — see
    ``_copol_argmin``) or ``"exhaustive"``. Defaults from
    ``spark.xsarsea.inversion.search``; the coarse stride from
    ``spark.xsarsea.inversion.coarseStride`` (8).
    """
    from xsarsea_spark.engine import get_conf, get_conf_int

    spark = px.sparkSession
    if search is None:
        search = get_conf(spark, "spark.xsarsea.inversion.search", "coarse")
    stride = get_conf_int(spark, "spark.xsarsea.inversion.coarseStride", 8)
    luts = prepare_luts(
        co_model,
        cr_model,
        inc_step=lut_inc_step,
        wspd_step=lut_wspd_step,
        phi_step=lut_phi_step,
        cr_wspd_step=lut_cr_wspd_step,
    )
    b_luts = spark.sparkContext.broadcast(luts)

    keep_cols = list(keep_cols or [])
    work = px
    cols = {"inc": inc_col, "keep": keep_cols, "sigma0_co_db": None,
            "sigma0_cr_db": None, "dsig_cr": None,
            "anc_re": anc_re_col, "anc_im": anc_im_col}
    if co_model and sigma0_co_col:
        work = work.withColumn(
            "__s0co_db", F.expr(f"10e0 * log10({sigma0_co_col} + 1e-15)")
        )
        cols["sigma0_co_db"] = "__s0co_db"
    if cr_model and sigma0_cr_col:
        work = work.withColumn(
            "__s0cr_db", F.expr(f"10e0 * log10({sigma0_cr_col} + 1e-15)")
        )
        cols["sigma0_cr_db"] = "__s0cr_db"
        cols["dsig_cr"] = dsig_cr_col

    in_cols = [c for c in
               [inc_col, cols["sigma0_co_db"], cols["sigma0_cr_db"],
                cols["dsig_cr"], anc_re_col, anc_im_col] + keep_cols
               if c is not None]
    work = work.select(*dict.fromkeys(in_cols))

    out_fields = [work.schema[c] for c in keep_cols] + [
        T.StructField(n, T.DoubleType())
        for n in ["wind_co_re", "wind_co_im", "wind_dual_re", "wind_dual_im"]
    ]
    schema = T.StructType(out_fields)

    def gen(batches):
        for pdf in batches:
            yield _invert_batch(pdf, b_luts.value, dsig_co, cols,
                                search=search, stride=stride)

    return work.mapInPandas(gen, schema=schema)
