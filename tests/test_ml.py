"""functions/ml.py: closed-form ridge fit, map-only scoring, exact AUC.

Numerics are pinned against direct numpy references (lstsq / brute-force
pair counting) computed on the SAME data the distributed paths see, so a
partial-moment or prefix-sum bug cannot hide behind the contract oracle.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_dataset_spark.functions import binary_auc, linear_score, ridge_fit


def _make_df(spark, X, y, n_parts=7):
    rows = [(i, [float(v) for v in X[i]], float(y[i])) for i in range(len(y))]
    return spark.createDataFrame(
        rows, "id long, embedding array<double>, label double"
    ).repartition(n_parts)


def _ridge_ref(X, y, lam):
    A = np.hstack([X, np.ones((X.shape[0], 1))])
    reg = np.eye(A.shape[1]) * lam
    reg[-1, -1] = 0.0
    return np.linalg.solve(A.T @ A + reg, A.T @ y)


def _auc_ref(scores, ys):
    pos = np.asarray(scores)[np.asarray(ys) == 1]
    neg = np.asarray(scores)[np.asarray(ys) == 0]
    if len(pos) == 0 or len(neg) == 0:
        return None
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    return (gt + 0.5 * eq) / (len(pos) * len(neg))


class TestRidgeFit:
    def test_matches_direct_solve(self, spark):
        rng = np.random.RandomState(3)
        X = rng.randn(200, 6)
        w_true = np.array([1.5, -2.0, 0.0, 3.0, 0.5, -1.0])
        y = X @ w_true + 2.0 + 0.01 * rng.randn(200)
        df = _make_df(spark, X, y)
        for lam in (0.0, 1.0, 25.0):
            model = ridge_fit(df, "embedding", "label", lam=lam)
            ref = _ridge_ref(X, y, lam)
            np.testing.assert_allclose(model.weights, ref[:-1], rtol=1e-9)
            assert abs(model.intercept - ref[-1]) < 1e-9
            assert model.grad_inf < 1e-10
            assert model.n == 200

    def test_partitioning_invariant(self, spark):
        rng = np.random.RandomState(7)
        X, y = rng.randn(150, 4), rng.randn(150)
        m1 = ridge_fit(_make_df(spark, X, y, 1), "embedding", "label", lam=2.0)
        m2 = ridge_fit(_make_df(spark, X, y, 13), "embedding", "label", lam=2.0)
        np.testing.assert_allclose(m1.weights, m2.weights, rtol=1e-12)
        assert abs(m1.intercept - m2.intercept) < 1e-12

    def test_mse_and_baseline(self, spark):
        rng = np.random.RandomState(11)
        X = rng.randn(300, 5)
        y = X[:, 0] * 4.0 + 1.0 + 0.1 * rng.randn(300)
        model = ridge_fit(_make_df(spark, X, y), "embedding", "label", lam=0.5)
        assert model.mse <= model.baseline_mse  # (0, mean) is feasible
        assert abs(model.baseline_mse - np.var(y)) < 1e-9
        scored = linear_score(_make_df(spark, X, y), model, "embedding")
        mse2 = scored.agg(
            F.avg((F.col("label") - F.col("score")) ** 2)
        ).first()[0]
        assert abs(model.mse - mse2) < 1e-9

    def test_nulls_ignored_and_empty_raises(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0], 1.0), (2, None, 5.0), (3, [0.0, 1.0], None)],
            "id long, embedding array<double>, label double",
        )
        model = ridge_fit(df, "embedding", "label", lam=1.0)
        assert model.n == 1
        with pytest.raises(ValueError, match="no non-null rows"):
            ridge_fit(df.filter("id = 2"), "embedding", "label")
        with pytest.raises(ValueError, match="lam"):
            ridge_fit(df, "embedding", "label", lam=-1.0)


class TestLinearScore:
    def test_score_and_sigmoid(self, spark):
        rng = np.random.RandomState(5)
        X, y = rng.randn(50, 3), rng.randn(50)
        df = _make_df(spark, X, y)
        model = ridge_fit(df, "embedding", "label", lam=1.0)
        out = linear_score(df, model, "embedding").orderBy("id").collect()
        exp = X @ model.weights + model.intercept
        np.testing.assert_allclose([r["score"] for r in out], exp, rtol=1e-12)
        sig = linear_score(df, model, "embedding", sigmoid=True).orderBy("id")
        np.testing.assert_allclose(
            [r["score"] for r in sig.collect()], 1 / (1 + np.exp(-exp)), rtol=1e-12
        )

    def test_null_embedding_scores_null(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0], 1.0), (2, None, 2.0)],
            "id long, embedding array<double>, label double",
        )
        model = ridge_fit(df, "embedding", "label", lam=1.0)
        rows = {r["id"]: r["score"] for r in linear_score(df, model).collect()}
        assert rows[1] is not None and rows[2] is None


class TestBinaryAuc:
    def test_perfect_and_inverted(self, spark):
        df = spark.createDataFrame(
            [(float(i), 1 if i >= 5 else 0) for i in range(10)], "score double, y int"
        )
        assert binary_auc(df).first()["auc"] == 1.0
        inv = df.select((-F.col("score")).alias("score"), "y")
        assert binary_auc(inv).first()["auc"] == 0.0

    def test_ties_average_rank(self, spark):
        # all scores equal -> AUC exactly 0.5 through the tie credit
        df = spark.createDataFrame(
            [(1.0, i % 2) for i in range(20)], "score double, y int"
        )
        assert binary_auc(df).first()["auc"] == 0.5

    def test_single_class_null(self, spark):
        df = spark.createDataFrame([(1.0, 1), (2.0, 1)], "score double, y int")
        row = binary_auc(df).first()
        assert row["auc"] is None and row["n_pos"] == 2 and row["n_neg"] == 0

    def test_matches_bruteforce_reference(self, spark):
        rng = np.random.RandomState(13)
        scores = rng.randint(0, 15, size=400).astype(float)  # heavy ties
        ys = rng.randint(0, 2, size=400)
        df = spark.createDataFrame(
            [(float(s), int(t)) for s, t in zip(scores, ys)], "score double, y int"
        ).repartition(9)
        got = binary_auc(df).first()
        ref = _auc_ref(scores, ys)
        assert abs(got["auc"] - round(ref, 6)) <= 1e-6
        assert got["n_pos"] == int(ys.sum())

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(-5, 5), st.integers(0, 1)),
            min_size=2,
            max_size=60,
        )
    )
    def test_property_vs_reference(self, pairs):
        # session fixture is function-scoped per hypothesis example via
        # get_spark's getOrCreate (cheap); arbitrary tie patterns
        from polars_dataset_spark.session import get_spark

        spark = get_spark("pytest")
        df = spark.createDataFrame(
            [(float(s), int(t)) for s, t in pairs], "score double, y int"
        ).repartition(4)
        got = binary_auc(df).first()["auc"]
        ref = _auc_ref([p[0] for p in pairs], [p[1] for p in pairs])
        if ref is None:
            assert got is None
        else:
            assert abs(got - round(ref, 6)) <= 1e-6


def test_binary_auc_empty_input(spark):
    df = spark.createDataFrame([], "score double, y int")
    row = binary_auc(df).first()
    assert (row["n_pos"], row["n_neg"], row["auc"]) == (0, 0, None)


def _kmeans_ref(x, centers, iters):
    """Plain numpy Lloyd's with argmin-lowest-id ties — the contract
    kmeans_fit must reproduce bit-for-bit at small k (dense branch)."""
    import numpy as np

    centers = np.asarray(centers, dtype=np.float64).copy()
    sizes = None
    inertia = 0.0
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        inertia = float(d[np.arange(len(x)), a].sum())
        sizes = np.bincount(a, minlength=len(centers))
        for j in range(len(centers)):
            if sizes[j]:
                centers[j] = x[a == j].mean(axis=0)
    return centers, sizes, inertia


def test_kmeans_fit_matches_numpy_reference(spark):
    import numpy as np
    import pandas as pd

    from polars_dataset_spark.functions import kmeans_fit

    rng = np.random.RandomState(3)
    x = rng.normal(size=(400, 6))
    init = x[:5].copy()
    df = spark.createDataFrame(
        pd.DataFrame({"embedding": [v.tolist() for v in x]})
    ).repartition(7)
    m = kmeans_fit(df, k=5, iters=4, init_centroids=init, tol=None)
    ref_c, ref_s, ref_i = _kmeans_ref(x, init, 4)
    assert m.iters_run == 4
    assert np.array_equal(m.sizes, ref_s)
    # per-cell means: Spark partial-agg sum order differs from numpy's —
    # equal to float tolerance, not bitwise
    assert np.allclose(m.centroids, ref_c, rtol=0, atol=1e-9)
    assert abs(m.inertia - ref_i) <= 1e-6 * max(ref_i, 1.0)


def test_kmeans_fit_tol_early_stop_and_convergence(spark):
    import numpy as np
    import pandas as pd

    from polars_dataset_spark.functions import kmeans_fit

    # two tight, far-apart blobs: Lloyd's converges after 1-2 updates,
    # so a generous iters budget must early-stop and the centroids must
    # hit the exact blob means
    rng = np.random.RandomState(4)
    a = rng.normal(scale=0.01, size=(50, 4)) + 10.0
    b = rng.normal(scale=0.01, size=(50, 4)) - 10.0
    x = np.concatenate([a, b])
    df = spark.createDataFrame(pd.DataFrame({"embedding": [v.tolist() for v in x]}))
    m = kmeans_fit(df, k=2, iters=20, init_centroids=[x[0], x[50]], tol=1e-9)
    assert m.iters_run < 20
    assert sorted(m.sizes.tolist()) == [50, 50]
    got = m.centroids[np.argsort(m.centroids[:, 0])]
    want = np.stack([b.mean(axis=0), a.mean(axis=0)])
    assert np.allclose(got, want, atol=1e-9)


def test_kmeans_fit_validates_and_ignores_nulls(spark):
    import pytest as _pytest

    from polars_dataset_spark.functions import kmeans_fit

    df = spark.createDataFrame(
        [([0.0, 0.0],), (None,), ([4.0, 4.0],)], "embedding array<double>"
    )
    m = kmeans_fit(df, k=2, iters=2, init_centroids=[[0.0, 0.0], [4.0, 4.0]])
    assert m.sizes.tolist() == [1, 1]  # the null row never reached a cell
    with _pytest.raises(ValueError, match="k must be"):
        kmeans_fit(df, k=0)
    empty = spark.createDataFrame([], "embedding array<double>")
    with _pytest.raises(ValueError, match="no non-null"):
        kmeans_fit(empty, k=2)


def test_groupwise_linear_trend_exact(spark):
    import numpy as np

    from polars_dataset_spark.functions import groupwise_linear_trend

    rows = []
    # group a: exact line y = 2x + 1; group b: noisy; group c: degenerate
    for x in range(10):
        rows.append(("a", x, 2.0 * x + 1.0))
        rows.append(("b", x, 3.0 * x - 5.0 + (0.5 if x % 2 else -0.5)))
    rows.append(("c", 4, 9.0))            # single point
    rows.append(("d", 7, 1.0))
    rows.append(("d", 7, 3.0))            # zero x-variance
    df = spark.createDataFrame(rows, "g string, x int, y double")
    out = {r["g"]: r for r in groupwise_linear_trend(df, ["g"], "x", "y").collect()}
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 1.0
    xb = np.arange(10); yb = 3.0 * xb - 5.0 + np.where(xb % 2, 0.5, -0.5)
    slope_ref, inter_ref = np.polyfit(xb, yb, 1)
    assert abs(out["b"]["slope"] - slope_ref) < 1e-6
    assert abs(out["b"]["intercept"] - inter_ref) < 1e-6
    assert out["c"]["slope"] is None and out["d"]["slope"] is None
    # partitioning invariance (the decimal-sum contract)
    again = {r["g"]: r for r in groupwise_linear_trend(df.repartition(9), ["g"], "x", "y").collect()}
    assert {g: (r["slope"], r["intercept"]) for g, r in out.items()} == {
        g: (r["slope"], r["intercept"]) for g, r in again.items()
    }
