"""classification_audit (functions/text): confusion-derived per-class
metrics against hand-computed values, null-vs-zero semantics, and the
langid composition."""

from pyspark.sql import functions as F

from polars_dataset_spark.functions.text import (
    STOPWORDS,
    classification_audit,
    with_language_id,
)


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "label_true string, label_pred string")
    return {r.label: r for r in classification_audit(df).collect()}


def test_perfect_classifier(spark):
    got = _run(spark, [("a", "a")] * 3 + [("b", "b")] * 2)
    for lbl, n in (("a", 3), ("b", 2)):
        r = got[lbl]
        assert r.n_true == n and r.n_pred == n and r.tp == n
        assert r.precision == 1.0 and r.recall == 1.0 and r.f1 == 1.0


def test_hand_computed_confusion(spark):
    # truth: 4 a, 2 b; preds: a->a 3, a->b 1, b->b 1, b->a 1
    got = _run(
        spark,
        [("a", "a")] * 3 + [("a", "b")] + [("b", "b")] + [("b", "a")],
    )
    a, b = got["a"], got["b"]
    assert (a.n_true, a.n_pred, a.tp) == (4, 4, 3)
    assert a.precision == 0.75 and a.recall == 0.75 and a.f1 == 0.75
    assert (b.n_true, b.n_pred, b.tp) == (2, 2, 1)
    assert b.precision == 0.5 and b.recall == 0.5 and b.f1 == 0.5


def test_label_only_in_predictions(spark):
    # 'und' predicted but never true: precision 0, recall null, f1 null
    got = _run(spark, [("a", "a"), ("a", "und")])
    u = got["und"]
    assert u.n_true == 0 and u.n_pred == 1 and u.tp == 0
    assert u.precision == 0.0
    assert u.recall is None and u.f1 is None


def test_label_only_in_truth(spark):
    # class never predicted: recall 0, precision null, f1 null
    got = _run(spark, [("a", "b"), ("b", "b")])
    a = got["a"]
    assert a.n_true == 1 and a.n_pred == 0 and a.tp == 0
    assert a.recall == 0.0
    assert a.precision is None and a.f1 is None


def test_langid_composition(spark):
    rows = [
        ("en", " ".join(STOPWORDS["en"])),
        ("de", " ".join(STOPWORDS["de"])),
        ("es", " ".join(STOPWORDS["fr"][:6] + STOPWORDS["es"][:3])),  # es→fr bleed
        ("en", "zzz qqq xxx"),  # en→und
    ]
    df = spark.createDataFrame(rows, "label_true string, text string")
    audited = classification_audit(
        with_language_id(df, out_col="label_pred")
    )
    got = {r.label: r for r in audited.collect()}
    assert got["en"].n_true == 2 and got["en"].tp == 1
    assert got["de"].f1 == 1.0
    assert got["es"].recall == 0.0  # the planted bleed
    assert got["fr"].n_pred == 1 and got["fr"].n_true == 0
    assert got["und"].n_pred == 1
