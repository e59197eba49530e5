"""Deterministic training-shard assignment and writing.

The last step of a training-data pipeline is a GLOBAL SHUFFLE: examples
must reach the trainer in a reproducible pseudo-random order, split into
size-balanced shards that stream independently. Doing this with a real
``ORDER BY rand()`` is a full sort with a non-reproducible key; the
portable form is order-by-hash:

- ``shard = portable_hash(salt, id) mod n_shards`` — the same md5-based
  hash as :mod:`polars_dataset_spark.functions.sampling`, so the split is
  reproducible across engines, runs, and cluster sizes (adding machines
  never moves an example);
- within a shard, examples order by the SAME hash — a deterministic
  pseudo-random order (documents that were adjacent in the source are
  scattered), which is exactly what curriculum-free training wants;
- ``write_training_shards`` realizes it as ONE hash-partition shuffle
  (``repartition(n_shards, shard)``) + ``sortWithinPartitions`` + a
  hive-partitioned write — each task writes its own shard directory, no
  global sort, no single-partition stage, shard count independent of
  input partitioning.

Everything here restates in ANSI SQL (the q66/q67 md5 pattern), so the
assignment and order are driver-oracle-checkable end to end.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "assign_training_shards",
    "write_training_shards",
    "leakage_safe_split",
    "split_thresholds_hex",
]


def _order_hash(id_col: str, salt: str) -> F.Column:
    # the package-wide 60-bit portable hash (collision-free enough for
    # ordering, never negative) — ONE definition so shard and sample
    # reproducibility can't silently diverge
    from polars_dataset_spark.functions.sampling import portable_hash_long

    return portable_hash_long(id_col, salt)


def assign_training_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "",
    shard_col: str = "shard",
    order_col: str = "shard_pos",
) -> DataFrame:
    """Add ``shard_col`` (0..n_shards-1, md5-uniform so shard sizes are
    balanced) and ``order_col`` (the 60-bit order hash; ascending =
    this shard's deterministic training order). Map-only — no shuffle
    until the caller writes or windows."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = _order_hash(id_col, salt)
    return df.withColumns(
        {shard_col: F.pmod(h, F.lit(n_shards)).cast("int"), order_col: h}
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``n_shards`` hive-partitioned directories
    (``shard=K/``), rows within each shard stored in the deterministic
    order-hash order. One hash-partition shuffle total; each task sorts
    and writes exactly one shard, so output file count = shard count
    whatever the input partitioning."""
    assigned = assign_training_shards(df, id_col, n_shards, salt)
    (
        # sort key leads with `shard`: the hive writer requires each task's
        # rows ordered by the partition columns and inserts its own
        # (UNSTABLE, shard-only) sort when they aren't — which would
        # scramble the shard_pos order the whole op exists to provide
        assigned.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "shard_pos")
        .drop("shard_pos")
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("shard")
        .save(path)
    )


def split_thresholds_hex(weights: "dict[str, float]") -> "list[tuple[str, str]]":
    """Cumulative split boundaries as fixed-width 15-hex-digit strings.

    ``{"train": 0.8, "val": 0.1, "test": 0.1}`` →
    ``[("train", "ccccccccccccccc"), ("val", "e66666666666666"),
    ("test", "fffffffffffffff")]``: a unit with 60-bit hash hex ``h``
    lands in the first split whose boundary is ``>= h``. Boundaries
    are computed in EXACT decimal arithmetic (``Fraction(str(w))``) so
    the same literals can be restated verbatim in an oracle — float
    rounding of ``0.8 · 16^15`` would be off by hundreds and impossible
    to reproduce cross-engine."""
    if not weights:
        raise ValueError("weights must be non-empty")
    fracs = [(name, Fraction(str(w))) for name, w in weights.items()]
    if any(f <= 0 for _, f in fracs):
        raise ValueError(f"split weights must be positive: {weights}")
    total = sum(f for _, f in fracs)
    out, cum = [], Fraction(0)
    for name, f in fracs:
        cum += f
        out.append((name, format(min(int(cum / total * 16**15), 16**15 - 1), "015x")))
    # the last boundary is forced to the max hex so no hash can fall out
    out[-1] = (out[-1][0], "f" * 15)
    return out


def leakage_safe_split(
    df: DataFrame,
    pairs: "DataFrame | None",
    id_col: str = "doc_id",
    weights: "dict[str, float] | None" = None,
    salt: str = "split",
    id_a: str = "id_a",
    id_b: str = "id_b",
    component_col: str = "component",
    split_col: str = "split",
) -> DataFrame:
    """Train/val/test split that cannot leak near-duplicates across the
    boundary: documents connected by ``pairs`` (e.g. MinHash-LSH
    near-dup candidates) form clusters, and the WHOLE cluster is
    assigned to one split by hashing its representative id — so a test
    document's paraphrase can never sit in train. A plain per-doc hash
    split (``hash_sample``-style) leaks: near-identical docs hash
    independently and straddle the boundary ~2·p·(1−p) of the time.

    ``pairs=None`` degrades to the per-doc hash split (every doc its own
    cluster). Returns ``df`` + ``component_col`` (min reachable id — the
    cluster's deterministic representative) + ``split_col``.

    Scale shape: connected components is the package's large/small-star
    contraction (one keyed shuffle per round, rounds ≈ log diameter);
    the split itself is map-only after ONE left join of the corpus
    against the component map (component map rows ≤ docs that appear in
    a pair — usually a small fraction; Spark/AQE broadcasts it when
    small). The md5-hex threshold compare is the package's portable
    60-bit hash, restatable verbatim in SQL."""
    from polars_dataset_spark.functions.graph import connected_components

    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    bounds = split_thresholds_hex(weights)
    if pairs is not None:
        comp = connected_components(pairs, id_a, id_b)
        out = df.join(
            comp.withColumnRenamed("id", "__cc_id"),
            df[id_col] == F.col("__cc_id"),
            "left",
        ).drop("__cc_id")
        out = out.withColumn(
            component_col, F.coalesce(F.col("component"), F.col(id_col))
        )
        if component_col != "component":
            out = out.drop("component")
    else:
        out = df.withColumn(component_col, F.col(id_col))
    hex15 = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(component_col).cast("string"))), 1, 15
    )
    expr = None
    for name, bound in bounds:
        cond = hex15 <= F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return out.withColumn(split_col, expr)
