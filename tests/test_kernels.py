import numpy as np
import pytest

from polars_dataset_spark.kernels import cubic_spline_interp, interp_trace, pchip_interp


def test_spline_identity_on_knots():
    x = np.sort(np.random.RandomState(0).uniform(0, 10, 50))
    y = np.sin(x)
    assert np.allclose(cubic_spline_interp(x, y, x), y, atol=1e-12)
    assert np.allclose(pchip_interp(x, y, x), y, atol=1e-12)


def test_spline_accuracy_smooth():
    x = np.linspace(0, 10, 80)
    y = np.sin(x)
    xq = np.linspace(0.2, 9.8, 500)
    assert np.max(np.abs(cubic_spline_interp(x, y, xq) - np.sin(xq))) < 1e-4
    assert np.max(np.abs(cubic_spline_interp(x, y, xq, bc_type="natural") - np.sin(xq))) < 1e-2
    assert np.max(np.abs(pchip_interp(x, y, xq) - np.sin(xq))) < 5e-3


def test_pchip_monotone_preserving():
    x = np.linspace(0, 5, 30)
    y = np.cumsum(np.abs(np.random.RandomState(1).rand(30)))
    out = pchip_interp(x, y, np.linspace(0, 5, 400))
    assert np.all(np.diff(out) >= -1e-12)


def test_small_inputs():
    assert np.isnan(cubic_spline_interp(np.array([]), np.array([]), np.array([1.0]))[0])
    assert cubic_spline_interp(np.array([2.0]), np.array([7.0]), np.array([5.0]))[0] == 7.0
    # two points → linear
    out = cubic_spline_interp(np.array([0.0, 2.0]), np.array([0.0, 4.0]), np.array([1.0]))
    assert out[0] == pytest.approx(2.0)
    # three points falls back to natural (no degenerate not-a-knot system)
    out3 = cubic_spline_interp(np.array([0.0, 1.0, 2.0]), np.array([0.0, 1.0, 0.0]), np.array([0.5]))
    assert np.isfinite(out3[0])


def test_interp_trace_robustness():
    x = np.array([3.0, 1.0, 2.0, 2.0, np.nan])
    y = np.array([9.0, 1.0, 3.0, 5.0, 2.0])
    # unsorted input sorted, duplicate knots averaged, NaN pair dropped
    out = interp_trace(x, y, np.array([1.0, 2.0, 3.0]), method="linear")
    assert out == pytest.approx([1.0, 4.0, 9.0])
    # <2 valid points → NaN fill
    assert np.isnan(interp_trace(np.array([1.0]), np.array([2.0]), np.array([1.0]))[0])


def test_extrapolation_is_polynomial():
    x = np.linspace(0, 5, 20)
    y = x**2
    out = cubic_spline_interp(x, y, np.array([-0.5, 5.5]))
    assert out == pytest.approx([0.25, 30.25], abs=1e-6)


def test_savgol_polynomial_exact():
    from polars_dataset_spark.kernels import savgol_coeffs, savgol_smooth

    t = np.linspace(0.0, 5.0, 41)
    y = 2.0 + 3.0 * t - 0.5 * t**2
    assert np.allclose(savgol_smooth(y, 7, 2), y, atol=1e-9)  # degree<=order: exact
    # weights sum to 1 (constant preservation) and are symmetric
    c = savgol_coeffs(9, 3)
    assert abs(c.sum() - 1.0) < 1e-12
    assert np.allclose(c, c[::-1], atol=1e-12)
    # noise suppression: smoothing shrinks deviation from the true line
    rng = np.random.RandomState(0)
    noisy = t + rng.normal(0, 0.5, t.size)
    sm = savgol_smooth(noisy, 11, 2)
    assert np.abs(sm - t).mean() < np.abs(noisy - t).mean()
    # short-trace fallback + validation
    assert np.allclose(savgol_smooth(np.array([1.0, 2.0, 3.0]), 7, 1), [1, 2, 3], atol=1e-9)
    import pytest as _pt
    with _pt.raises(ValueError):
        savgol_coeffs(4, 2)
    with _pt.raises(ValueError):
        savgol_coeffs(5, 5)


def test_lomb_scargle_finds_uneven_sinusoid_peak():
    """A sinusoid sampled on an IRREGULAR grid (the case FFT can't touch
    without regridding) must put its dominant power at the true
    frequency, with near-noiseless normalized power ~ n/2 / var ratio."""
    import numpy as np

    from polars_dataset_spark.kernels import lomb_scargle_power

    rng = np.random.default_rng(9)
    t = np.sort(rng.uniform(0, 80.0, size=300))      # uneven sampling
    f_true = 0.25
    y = 3.0 + 2.0 * np.sin(2 * np.pi * f_true * t + 0.7)
    freqs = np.linspace(0.02, 0.5, 97)
    p = lomb_scargle_power(t, y, freqs)
    assert freqs[int(np.argmax(p))] == pytest.approx(f_true, abs=0.01)
    # noiseless sinusoid: peak normalized power ≈ n/2
    assert p.max() == pytest.approx(150.0, rel=0.05)
    # constant trace -> all-zero power, no nan
    flat = lomb_scargle_power(t, np.full_like(t, 5.0), freqs)
    assert np.all(flat == 0.0)
    with pytest.raises(ValueError, match="freqs"):
        lomb_scargle_power(t, y, np.array([0.0, 0.1]))


def test_lomb_scargle_operator_spark(spark):
    """Operator end-to-end: grouped-map over two traces, one of which is
    pure noise — the sinusoid trace peaks at its frequency, power column
    per value var, frequency as index."""
    import numpy as np
    import pandas as pd

    from polars_dataset_spark import Dataset
    from polars_dataset_spark.operators import lomb_scargle

    rng = np.random.default_rng(4)
    t = np.sort(rng.uniform(0, 60.0, size=200))
    rows = []
    for g, y in (
        ("sig", np.sin(2 * np.pi * 0.2 * t)),
        ("noise", rng.normal(size=t.size)),
    ):
        rows += [(g, float(ti), float(yi)) for ti, yi in zip(t, y)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "x", "v"]))
    ds = Dataset(df, index="x", id_vars=["g"])
    freqs = np.linspace(0.05, 0.45, 41)
    out = lomb_scargle(ds, freqs).df.toPandas()
    assert set(out.columns) == {"g", "frequency", "v_power"}
    sig = out[out.g == "sig"].set_index("frequency")["v_power"]
    assert abs(sig.idxmax() - 0.2) < 0.011
    # the noise trace has no comparable peak
    noise = out[out.g == "noise"]["v_power"]
    assert sig.max() > 5 * noise.max()
