"""OPQ dimension-allocation contracts."""
from __future__ import annotations

import numpy as np
import pytest


def _mkvecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>")


def test_allocation_is_balanced_serpentine(spark):
    """Dims sorted by variance are dealt serpentine: each subspace
    gets exactly one dim per variance tier, and the permutation is a
    bijection."""
    from xsarsea_spark.pipeline.opq import train_allocation

    rng = np.random.RandomState(7)
    d, m, n = 8, 2, 40
    # per-dim spread grows with the index -> variance order is the
    # reverse of the dim order (highest variance = dim 7)
    rows = [rng.uniform(-1, 1, d) * np.arange(1, d + 1)
            for _ in range(n)]
    perm = train_allocation(_mkvecs(spark, rows), m=m)
    assert sorted(perm.tolist()) == list(range(d))
    # expected: replicate the grid keys in exact Python ints over the
    # float32-widened data, rank desc, deal serpentine (m=2: block0
    # -> s0,s1; block1 -> s1,s0; ...)
    import math

    g = 10 ** 9
    x = np.stack(rows).astype(np.float32).astype(np.float64)
    keys = [
        len(x) * g * sum(math.floor(v * v * g) for v in x[:, j])
        - sum(math.floor(v * g) for v in x[:, j]) ** 2
        for j in range(d)
    ]
    ranked = sorted(range(d), key=lambda j: (-keys[j], j))
    slots = {}
    for r, dim in enumerate(ranked):
        block, pos = divmod(r, m)
        s = pos if block % 2 == 0 else m - 1 - pos
        slots[(s, block)] = dim
    want = [slots[k] for k in sorted(slots)]
    assert perm.tolist() == want
    # and each subspace holds exactly one dim per variance tier
    tiers = {dim: r // m for r, dim in enumerate(ranked)}
    for s in range(m):
        sub = perm.tolist()[s * (d // m):(s + 1) * (d // m)]
        assert sorted(tiers[j] for j in sub) == list(range(d // m))


def test_apply_allocation_matches_numpy(spark):
    """The in-plan projection equals numpy fancy-indexing, as
    doubles."""
    from xsarsea_spark.pipeline.opq import apply_allocation

    rows = [np.arange(4, dtype=np.float32) + i for i in range(3)]
    perm = np.array([2, 0, 3, 1])
    got = (apply_allocation(_mkvecs(spark, rows), perm)
           .orderBy("vec_id").collect())
    for i, r in enumerate(got):
        want = np.asarray(rows[i], dtype=np.float64)[perm]
        assert r["embedding"] == pytest.approx(want.tolist(), abs=0)


def test_allocation_requires_divisible_dim(spark):
    from xsarsea_spark.pipeline.opq import train_allocation

    rows = [np.ones(6) * i for i in range(5)]
    with pytest.raises(ValueError, match="not divisible"):
        train_allocation(_mkvecs(spark, rows), m=4)


def test_allocation_balances_variance_products(spark):
    """The point of the allocation: per-subspace variance products
    are closer to each other than the identity layout's (the OPQ
    eigenvalue-allocation objective, Ge et al. 2013 sec. 4)."""
    from xsarsea_spark.pipeline.opq import (apply_allocation,
                                            train_allocation)

    rng = np.random.RandomState(11)
    d, m, n = 16, 4, 200
    scales = np.exp(rng.uniform(-2, 2, d))
    rows = [rng.normal(0, 1, d) * scales for _ in range(n)]
    df = _mkvecs(spark, rows)
    perm = train_allocation(df, m=m)

    def spread(mat):
        v = mat.var(axis=0)
        logs = [np.sum(np.log(v[s * (d // m):(s + 1) * (d // m)]))
                for s in range(m)]
        return max(logs) - min(logs)

    x = np.stack([np.asarray(r, dtype=np.float64) for r in rows])
    assert spread(x[:, perm]) < spread(x)
