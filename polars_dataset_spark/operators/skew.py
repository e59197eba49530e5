"""Skew-mitigated equi-join: salt the skewed (large) side, replicate the
small side.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin.enabled``) splits
oversized sort-merge partitions at runtime and is the first line of
defense — but it only engages for sort-merge/shuffled-hash joins and
only on post-shuffle partition size. Salting is the explicit fallback
when (a) one hot key alone exceeds an executor (AQE splits partitions,
not keys — a single-key partition cannot be split further when the
*build* side for that key must be replicated anyway), or (b) the join is
keyed for a downstream stage and the skew must not reach it.

Semantics: exactly ``left.join(right, on, how)`` for ``how`` in
{inner, left} — each left row joins the one replica of the matching
right row group that carries its salt, so multiplicities are preserved.
Right/full joins would need the mirrored construction (salt right,
replicate left); not provided.

Cost model: right side is duplicated ``salt``× (shuffle volume
|R|·salt — keep the replicated side the SMALL one), in exchange for the
hot key's rows spreading over ``salt`` reducers instead of one. With
|R| small enough to broadcast, prefer ``F.broadcast`` (no salt needed);
salting targets the middle regime: R too big to broadcast, L skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Join ``left`` (large, possibly skewed) to ``right`` (smaller) on
    equi-keys, spreading each hot key over ``salt`` shuffle partitions.

    Left rows get a uniform random salt in [0, salt); right rows are
    exploded to all ``salt`` values; the join adds the salt column to the
    key so Catalyst hashes (key, salt) — the hot key's rows land on
    ``salt`` distinct reducers. The salt column never escapes.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    # rand() is re-drawn if a task retries, but any salt value matches a
    # replica of the right row group, so retried tasks stay correct —
    # the salt only chooses WHICH reducer, never WHETHER a match exists.
    l = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, on=keys + ["__salt"], how=how).drop("__salt")
