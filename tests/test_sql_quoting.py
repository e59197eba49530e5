"""Adversarial quoting tests for every operator that turns DATA values
into generated expressions or column names (VERDICT r02 next-steps #6):
cut/qcut labels, pivot values, to_dummies categories, funnel step names.
All of these must survive quotes, backticks, dots and SQL metacharacters
in the data/labels without breaking the generated plan or mislabeling."""

from pyspark.sql import functions as F

from polars_dataset_spark.core import Dataset
from polars_dataset_spark.functions.funnel import funnel_counts

NASTY = ["o'clock", 'dq"uote', "back`tick", "dot.ted", "semi;colon--", "per%cent"]


def test_cut_labels_with_quotes(spark):
    df = spark.createDataFrame([(float(i),) for i in range(6)], "v double")
    ds = Dataset(df, index="v")
    out = ds.cut("v", breaks=[1.5, 3.5], labels=NASTY[:3]).df
    got = {r["v"]: r["v_bin"] for r in out.collect()}
    assert got[0.0] == "o'clock"
    assert got[2.0] == 'dq"uote'
    assert got[5.0] == "back`tick"


def test_qcut_labels_with_quotes(spark):
    df = spark.createDataFrame([(float(i),) for i in range(8)], "v double")
    ds = Dataset(df, index="v")
    out = ds.qcut("v", 2, labels=["lo'w; --", 'hi"gh`']).df
    vals = {r["v_bin"] for r in out.collect()}
    assert vals == {"lo'w; --", 'hi"gh`'}


def test_pivot_values_with_quotes(spark):
    rows = [(n, i, float(i)) for i, n in enumerate(NASTY)]
    df = spark.createDataFrame(rows, "cat string, idx long, val double")
    ds = Dataset(df, index="idx", id_vars=["cat"])
    wide = ds.pivot(on="cat", index="idx", values=NASTY)
    # every nasty value must surface as a real, selectable column
    for n in NASTY:
        assert n in wide.columns
    assert wide.count() == len(NASTY)


def test_to_dummies_categories_with_quotes(spark):
    rows = [(n, i) for i, n in enumerate(NASTY)] + [(None, 99)]
    df = spark.createDataFrame(rows, "cat string, idx long")
    ds = Dataset(df, index="idx", id_vars=[])
    out = ds.to_dummies("cat").df
    for n in NASTY:
        assert f"cat_{n}" in out.columns
    assert "cat_null" in out.columns
    # each row hot in exactly one indicator
    pdf = out.toPandas()
    ind_cols = [c for c in pdf.columns if c.startswith("cat_")]
    assert (pdf[ind_cols].sum(axis=1) == 1).all()


def test_funnel_step_names_with_quotes(spark):
    rows = []
    for u in range(3):
        rows.append((u, 1.0 + u, NASTY[0]))
        rows.append((u, 2.0 + u, NASTY[1]))
    df = spark.createDataFrame(rows, "user_id long, tsec double, event_type string").select(
        "user_id", F.timestamp_seconds("tsec").alias("ts"), "event_type"
    )
    out = funnel_counts(df, steps=[NASTY[0], NASTY[1]])
    got = {r["step"]: r["n_users"] for r in out.collect()}
    assert got == {NASTY[0]: 3, NASTY[1]: 3}
