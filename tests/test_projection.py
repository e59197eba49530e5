"""Distributed PCA/whitening (functions/projection.py): the one-pass
partial-moment fit must equal numpy PCA computed directly on the
collected data (identical population-moment formulas), projections must
decorrelate/whiten, and nulls must pass through."""

import numpy as np
import pandas as pd
import pytest

from polars_dataset_spark.functions import fit_pca, pca_project


def _correlated(n=400, seed=3):
    rng = np.random.default_rng(seed)
    latent = rng.normal(size=(n, 3))
    mix = rng.normal(size=(3, 8))
    return (latent @ mix + 0.05 * rng.normal(size=(n, 8)) + 2.0).astype(np.float64)


def _to_df(spark, X, n_partitions=5):
    pdf = pd.DataFrame({"vec_id": range(len(X)), "embedding": [r.tolist() for r in X]})
    return spark.createDataFrame(pdf).repartition(n_partitions)


def test_fit_matches_numpy_reference(spark):
    X = _correlated()
    model = fit_pca(_to_df(spark, X), "embedding")
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / len(X)
    evals = np.linalg.eigvalsh(cov)[::-1]
    assert model.n == len(X)
    assert model.mean == pytest.approx(mean, abs=1e-10)
    assert model.eigvals == pytest.approx(evals, abs=1e-10)
    assert model.trace == pytest.approx(cov.trace(), abs=1e-10)
    # components orthonormal, eigvals descending
    WtW = model.components.T @ model.components
    assert WtW == pytest.approx(np.eye(8), abs=1e-10)
    assert np.all(np.diff(model.eigvals) <= 1e-12)


def test_projection_decorrelates_and_whitens(spark):
    X = _correlated()
    df = _to_df(spark, X)
    model = fit_pca(df, "embedding", k=3)
    out = pca_project(df, model, "embedding")
    P = np.stack([r.proj for r in out.select("proj").collect()])
    # spark projection == numpy projection (same model)
    ref = (X - model.mean) @ model.components
    assert np.abs(np.sort(P, axis=0) - np.sort(ref, axis=0)).max() < 1e-10
    # decorrelated: projected covariance is diag(eigvals)
    C = (P - P.mean(0)).T @ (P - P.mean(0)) / len(P)
    assert C == pytest.approx(np.diag(model.eigvals), abs=1e-8)
    # the 3 latent directions carry ~all the variance
    assert model.eigvals.sum() > 0.95 * model.trace
    white = pca_project(df, model, "embedding", whiten=True)
    Pw = np.stack([r.proj for r in white.select("proj").collect()])
    Cw = (Pw - Pw.mean(0)).T @ (Pw - Pw.mean(0)) / len(Pw)
    assert Cw == pytest.approx(np.eye(3), abs=1e-6)


def test_nulls_and_float32_input(spark):
    X = _correlated(n=60).astype(np.float32)
    pdf = pd.DataFrame(
        {"vec_id": range(61), "embedding": [r.tolist() for r in X] + [None]}
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    model = fit_pca(df, "embedding", k=2)  # null row ignored in fit
    assert model.n == 60
    out = {r.vec_id: r.proj for r in pca_project(df, model).collect()}
    assert out[60] is None
    assert len(out[0]) == 2


def test_empty_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null rows"):
        fit_pca(df)
