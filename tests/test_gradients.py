"""Tile+halo stencil framework: distributed result must be bit-equal
to the whole-image NumPy chain (halo >= total pyramid reach)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from xsarsea_spark.operators.gradients import (
    CIRC_KERNEL,
    local_gradients,
    local_gradients_numpy,
)


def test_tile_halo_bit_exact(spark):
    NL, NS = 120, 168
    rng = np.random.default_rng(7)
    img = rng.uniform(0.01, 0.05, (NL, NS))
    pdf = pd.DataFrame({
        "line": np.repeat(np.arange(NL), NS),
        "sample": np.tile(np.arange(NS), NL),
        "sigma0": img.ravel(),
    })
    px = spark.createDataFrame(pdf)
    out = (
        local_gradients(px, NL, NS, tile=48, halo=24)
        .toPandas()
        .sort_values(["line4", "sample4"])
        .reset_index(drop=True)
    )
    ref = local_gradients_numpy(img)
    h, w = NL // 4, NS // 4
    assert len(out) == h * w
    for k in ("g2_re", "g2_im", "g3", "c"):
        got = out[k].to_numpy().reshape(h, w)
        assert np.array_equal(got, ref[k][:h, :w]), k


def test_circ_kernel_properties():
    # composed kernel preserves mass and symmetry
    assert abs(CIRC_KERNEL.sum() - 1.0) < 1e-12
    assert np.allclose(CIRC_KERNEL, CIRC_KERNEL[::-1])
    assert len(CIRC_KERNEL) == 31


def test_rain_mask_tile_bit_exact(spark):
    import pandas as pd

    from xsarsea_spark.operators.gradients import (
        filtering_parameters,
        filtering_parameters_numpy,
    )

    NL, NS = 120, 160
    rng = np.random.default_rng(23)
    img = rng.uniform(0.005, 0.08, (NL, NS))
    pdf = pd.DataFrame({
        "line": np.repeat(np.arange(NL), NS),
        "sample": np.tile(np.arange(NS), NL),
        "sigma0": img.ravel(),
    })
    px = spark.createDataFrame(pdf)
    out = (
        filtering_parameters(px, NL, NS, tile=56, halo=48)
        .toPandas().sort_values(["line4", "sample4"]).reset_index(drop=True)
    )
    ref = filtering_parameters_numpy(img)
    h, w = NL // 4, NS // 4
    assert len(out) == h * w
    for k in ("f1", "f2", "f3", "f4", "F"):
        assert np.array_equal(out[k].to_numpy().reshape(h, w),
                              ref[k][:h, :w]), k


def test_minimum_halo_bitexact(spark):
    """halo=20 (the minimum multiple of 4 covering the pyramid's
    18-px stencil reach, and the default) must be bit-identical to a
    generous halo=32 across tile sizes — halo only replicates, never
    changes interior outputs."""
    import numpy as np

    from xsarsea_spark.operators.gradients import local_gradients

    rng = np.random.default_rng(5)
    n = 128
    vals = rng.uniform(0.01, 1.0, size=(n, n))
    rows = [(int(i), int(j), float(vals[i, j]))
            for i in range(n) for j in range(n)]
    px = spark.createDataFrame(rows, "line int, sample int, sigma0 double")
    ref = local_gradients(px, n, n, tile=64, halo=32).orderBy(
        "line4", "sample4").collect()
    for tile in (32, 64):
        got = local_gradients(px, n, n, tile=tile, halo=20).orderBy(
            "line4", "sample4").collect()
        assert got == ref
