"""Scale-path tests for the coarse quantizer behind ivf_topk /
semantic_dedup (VERDICT r4 item #1): tiled matmul argmin, broadcast
centroids, two-level coarse->sub training — assignment memory must stay
bounded per Arrow batch at ANY cell count, and the fixture-scale
(small-k dense) path must stay bitwise-faithful to the SQL oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from polars_dataset_spark.functions import similarity as S


def _rand(n, d, seed=0):
    return np.random.RandomState(seed).normal(size=(n, d)).astype(np.float64)


def _dense_argmin(mat, centers):
    return ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)


def test_tiled_argmin_matches_dense(monkeypatch):
    # force MANY tiles: tiny chunks prove the merge logic, not one big pass
    monkeypatch.setattr(S, "_ROW_CHUNK", 7)
    monkeypatch.setattr(S, "_CENT_CHUNK", 13)
    mat, centers = _rand(101, 8, 1), _rand(200, 8, 2)  # k=200 > _DENSE_K_MAX
    assert np.array_equal(S._argmin_cells(mat, centers), _dense_argmin(mat, centers))


def test_tiled_argmin_tie_breaks_to_lowest_id(monkeypatch):
    monkeypatch.setattr(S, "_ROW_CHUNK", 3)
    monkeypatch.setattr(S, "_CENT_CHUNK", 5)
    monkeypatch.setattr(S, "_DENSE_K_MAX", 2)
    # duplicate centroids straddling chunk boundaries: ties must pick the
    # LOWEST cell id even when the duplicate lives in a later chunk
    base = _rand(6, 4, 3)
    centers = np.concatenate([base, base, base], axis=0)  # ids 0-5,6-11,12-17
    mat = base + 1e-12
    assert S._argmin_cells(mat, centers).max() <= 5


def test_tiled_top_cells_matches_stable_argsort(monkeypatch):
    monkeypatch.setattr(S, "_ROW_CHUNK", 5)
    monkeypatch.setattr(S, "_CENT_CHUNK", 11)
    mat, centers = _rand(37, 6, 4), _rand(150, 6, 5)
    got = S._top_cells(mat, centers, 4)
    d = ((mat[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
    want = np.argsort(d, axis=1, kind="stable")[:, :4]
    assert np.array_equal(got, want)


def test_lloyd_kmeans_tiled_equals_reference():
    # the Lloyd's rewrite (tiled argmin + bincount means) must reproduce
    # the original dense formulation exactly at fixture scale
    x = _rand(300, 8, 6)
    got = S._lloyd_kmeans(x, 10, seed=42)

    rng = np.random.RandomState(42)
    centers = x[rng.choice(len(x), size=10, replace=False)].astype(np.float64)
    for _ in range(12):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(10):
            pts = x[assign == j]
            if len(pts):
                centers[j] = pts.mean(axis=0)
    assert np.allclose(got, centers, atol=1e-12)


def test_two_level_quantizer_assign_matches_numpy_reference():
    coarse = _rand(5, 4, 7)
    subs = _rand(5 * 3, 4, 8).reshape(5, 3, 4)
    q = S._Quantizer(coarse, subs)
    assert q.n_cells == 15
    mat = _rand(64, 4, 9)
    got = q.assign(mat)
    c1 = _dense_argmin(mat, coarse)
    want = np.array(
        [c * 3 + _dense_argmin(mat[i : i + 1], subs[c])[0] for i, c in enumerate(c1)]
    )
    assert np.array_equal(got, want)


def test_two_level_top_cells_covers_assign():
    # the multi-probe list must always contain the assigned cell first
    coarse = _rand(4, 4, 10)
    subs = _rand(4 * 2, 4, 11).reshape(4, 2, 4)
    q = S._Quantizer(coarse, subs)
    mat = _rand(32, 4, 12)
    top = q.top_cells(mat, 3)
    assign = q.assign(mat)
    assert np.array_equal(top[:, 0], assign)


def test_train_quantizer_two_level_memory_bounded(spark, monkeypatch):
    # n_cells >= 4096 triggers the two-level path; shrink the tile knobs so
    # ANY dense batch x k pass would be caught as a wrong answer, and verify
    # end-to-end: train distributed, assign via broadcast, cells partition
    # the corpus with every id in exactly one cell
    monkeypatch.setattr(S, "_ROW_CHUNK", 64)
    monkeypatch.setattr(S, "_CENT_CHUNK", 32)
    n, d = 3000, 8
    mat = _rand(n, d, 13)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n), "embedding": list(mat)})
    )
    quant = S._train_quantizer(df, "vec_id", "embedding", 4500, seed=1, train_cap=1024)
    assert quant.subs is not None  # two-level engaged
    assert quant.n_cells >= 4500
    # broadcast assignment over the real Spark path
    cell_of, _ = S._cell_udfs(spark, quant)
    out = df.select("vec_id", cell_of(F.col("embedding")).alias("cell")).collect()
    assert len(out) == n
    cells = {r.vec_id: r.cell for r in out}
    # every worker-side choice must be a VALID hierarchical argmin (BLAS
    # rounding differs by batch shape, so ulp-level ties may pick another
    # equally-near centroid — exact id equality is not the contract)
    k2 = quant.k2
    for i in range(n):
        c1, sub = cells[i] // k2, cells[i] % k2
        dco = ((mat[i][None, :] - quant.coarse) ** 2).sum(axis=1)
        assert dco[c1] <= dco.min() * (1 + 1e-9) + 1e-9
        dsub = ((mat[i][None, :] - quant.subs[c1]) ** 2).sum(axis=1)
        assert dsub[sub] <= dsub.min() * (1 + 1e-9) + 1e-9
    # and the overwhelming majority agree exactly with the driver-side path
    want = quant.assign(mat)
    assert sum(cells[i] == want[i] for i in range(n)) >= 0.99 * n


def test_semantic_dedup_large_n_cells_end_to_end(spark):
    # planted exact dups must still die when the quantizer goes two-level
    n, d = 1200, 8
    rng = np.random.RandomState(14)
    mat = rng.normal(size=(n, d))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    dup = np.concatenate([mat, mat[:50]], axis=0)  # ids 1200.. dup ids 0..49
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(dup)), "embedding": list(dup)})
    )
    out = {
        r.vec_id: r
        for r in S.semantic_dedup(
            df, threshold=0.999, n_cells=4200, train_cap=512
        ).collect()
    }
    assert len(out) == n + 50
    for i in range(50):
        # exact twins quantize identically -> same cell -> later id dropped
        assert out[i].cell == out[n + i].cell
        assert out[i].kept and not out[n + i].kept


def test_ivf_topk_two_level_finds_planted_neighbor(spark):
    n, d = 800, 8
    rng = np.random.RandomState(15)
    mat = rng.normal(size=(n, d))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    near = mat[0] + rng.normal(scale=0.001, size=d)
    rows = np.concatenate([mat, near[None, :] / np.linalg.norm(near)], axis=0)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(len(rows)), "embedding": list(rows)})
    )
    out = S.ivf_topk(
        df.filter(F.col("vec_id") == 0), df, k=1, n_cells=4100, n_probe=2, train_cap=256
    ).collect()
    # a ~identical vector quantizes to the same cell: probe 1 finds it
    assert out[0].neighbor_id == n and out[0].cosine > 0.999


def test_train_quantizer_empty_and_tiny(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S._train_quantizer(empty, "vec_id", "embedding", 16, 1, 64) is None
    tiny = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    q = S._train_quantizer(tiny, "vec_id", "embedding", 16, 1, 64)
    assert q.subs is None and 1 <= q.n_cells <= 2  # degrades to corpus size


def test_semantic_dedup_null_vectors_pass_through(spark):
    # a null embedding can't be a near-dup of anything: it must survive
    # with cell=null and never crash the quantizer/assignment paths
    rows = [(0, [1.0, 0.0]), (1, None), (2, [1.0, 0.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in S.semantic_dedup(df, threshold=0.99).collect()}
    assert len(out) == 4
    assert out[1].kept and out[1].cell is None
    assert out[3].kept and out[3].cell is None
    assert out[0].kept and not out[2].kept  # real dedup still ran


def test_ivf_topk_null_vectors_ignored(spark):
    rows = [(0, [1.0, 0.0]), (1, None), (2, [0.99, 0.01]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.ivf_topk(df, df, k=1, n_cells=2, n_probe=2, train_cap=8).collect()
    ids = {r.query_id for r in out}
    assert 1 not in ids  # null probe produces no result rows
    by_q = {r.query_id: r.neighbor_id for r in out}
    assert by_q[0] == 2 and by_q[2] == 0  # null corpus row never a neighbor


def test_two_level_top_cells_block_boundaries(monkeypatch):
    # tiny tile knobs force many row blocks through the vectorized
    # gather path; results must match the flat brute-force ranking
    coarse = _rand(6, 4, 20)
    subs = _rand(6 * 3, 4, 21).reshape(6, 3, 4)
    q = S._Quantizer(coarse, subs)
    mat = _rand(23, 4, 22)
    got = q.top_cells(mat, 4)
    assert got.shape == (23, 4)
    assert np.array_equal(got[:, 0], q.assign(mat))
    # remaining probes are distinct, valid cells
    for row in got:
        assert len(set(row.tolist())) == 4
        assert all(0 <= c < q.n_cells for c in row)


def test_ivf_recall_monotone_in_nprobe(spark, sf_dir):
    """The recall/scan-fraction frontier (VERDICT r8 #8): with one fixed
    quantizer, probing more cells gives a NESTED candidate set, so
    recall@k vs the exact baseline is weakly monotone in n_probe — the
    knob scale users turn to trade recall for scan fraction. Asserted
    over n_probe in {1, 2, 4, 8} of 16 cells on the sf fixture."""
    from polars_dataset_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    exact = set(
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(probes, emb, k=5).collect()
    )
    quant = S._train_quantizer(emb, "vec_id", "embedding", 16, 42, 65_536)
    recalls = []
    for n_probe in (1, 2, 4, 8):
        approx = set(
            (r.query_id, r.neighbor_id)
            for r in S.ivf_topk(
                probes, emb, k=5, n_cells=16, n_probe=n_probe,
                centroids=quant.coarse,
            ).collect()
        )
        recalls.append(len(exact & approx) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[-1] > 0.6, f"recall@8/16 too low: {recalls}"
    assert recalls[-1] > recalls[0], f"n_probe knob has no effect: {recalls}"
