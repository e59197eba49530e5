"""The engine's query suite: one entry per operator from SURVEY §2, each
expressed through the package's public API, plus (wherever ANSI SQL can
express the semantics) a DuckDB oracle string computing the same result.

Contract (driver, ``/root/repo/__spark_entry__.py``): the driver runs the
Spark query and the oracle side by side at sf=0.01 and compares row count,
schema and an order-insensitive value hash with columns sorted by name —
so every computed column is aliased identically on both sides, floats are
rounded identically on both sides (money-scale sums to 2 decimals,
averages to 4, per-row arithmetic to 6 — coarse enough that engine-order
float noise of ~1e-9 relative cannot flip a rounded digit), and timestamps
are emitted as formatted strings (engine-neutral).

Every query has an oracle entry. Ops whose values no SQL engine can
recompute (off-knot spline interpolation, approximate sketches) carry
CONTRACT oracles instead: the Spark side emits oracle-checkable value
columns (knot-exact endpoints, counts, frequency axes) plus boolean
guarantee columns the oracle states as ``true`` — and the test suite
additionally pins their numerics with self-verifying properties
(``tests/``).

Oracle typing rule (the q25 r01/r02 driver-hash lesson): DuckDB ``sum``
over integers yields HUGEINT and pandas materialises it as float64, so
the driver's stringified hash sees ``1.0`` vs Spark's ``1``. Every
integer-sum/decimal output column must be CAST (BIGINT/DOUBLE) in the
oracle SQL — enforced by tests/test_oracle_types.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from polars_dataset_spark.core import Dataset
from polars_dataset_spark.operators import (
    autophase,
    fourier_transform,
    join_asof,
    regrid,
)
from polars_dataset_spark.functions import (
    cosine_topk,
    embedding_neardup,
    exact_dedup,
    lsh_bucketed_topk,
    minhash_lsh_candidates,
    simhash_dedup,
    with_fingerprint,
    with_language_id,
    with_quality_score,
    with_text_stats,
)
from polars_dataset_spark.functions.text import STOPWORDS
from polars_dataset_spark.session import pin
from polars_dataset_spark.sources.tables import load_table
from polars_dataset_spark.streaming import sessionize_batch, session_agg, windowed_agg

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _prep(spark: SparkSession) -> None:
    """Dynamic confs the comparisons rely on, safe on any session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")


def _lineitem_ds(spark: SparkSession, sf_dir: str) -> Dataset:
    return Dataset(
        load_table(spark, sf_dir, "lineitem"),
        index="l_shipdate",
        id_vars=["l_returnflag", "l_linestatus"],
    )


# ---------------------------------------------------------------------------
# Relational surface (SURVEY §2.1/§2.3: E1-E21 + delegated ops)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)  AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE)
             AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))), 2) AS DOUBLE)
             AS sum_charge,
           round(avg(l_quantity), 4)  AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4)
             AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4)
             AS avg_disc,
           count(*)                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark, sf_dir):
    """TPC-H Q1 shape: the groupBy-agg core (E2 delegation + hash agg).
    Catalyst plans partial+final hash aggregation; the only shuffle is on
    the two grouping keys."""
    _prep(spark)
    ds = _lineitem_ds(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # 2-dp money sums accumulate as EXACT DECIMAL and round in decimal:
    # a double sum's order-dependent random-walk error reaches ~0.04 at
    # 60 M rows, past the 2-dp rounding unit (caught by the r9 sf10
    # sweep on q03; quantity sums are integer-valued and already exact
    # in double at any order, so they stay plain)
    price_d = F.col("l_extendedprice").cast("decimal(28,6)")
    disc_price_d = disc_price.cast("decimal(28,6)")
    charge_d = (disc_price * (1 + F.col("l_tax"))).cast("decimal(28,6)")
    disc_d = F.col("l_discount").cast("decimal(28,6)")
    n = F.count(F.lit(1))
    return (
        ds.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .group_by("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(price_d), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price_d), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge_d), 2).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(price_d).cast("double") / n, 4).alias("avg_price"),
            F.round(F.sum(disc_d).cast("double") / n, 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "q02_filter_project",
    f"""
    SELECT l_orderkey, l_linenumber,
           strftime(l_shipdate, '{TS_FMT_DUCK}') AS ship_s,
           round(l_extendedprice * (1 - l_discount), 6) AS revenue
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 25 AND l_discount > 0.02
    """,
)
def q02(spark, sf_dir):
    """Filter + projection (E3/E4): predicates push to the parquet scan
    (PushedFilters), projection prunes columns (ReadSchema)."""
    _prep(spark)
    ds = _lineitem_ds(spark, sf_dir)
    out = ds.filter(
        F.col("l_quantity").between(5, 25), F.col("l_discount") > 0.02
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", TS_FMT_SPARK).alias("ship_s"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.col("l_shipdate"),
    )
    return out.df.drop("l_shipdate")


@query(
    "q03_join_agg",
    """
    SELECT o.o_orderstatus,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           count(DISTINCT l.l_orderkey) AS n_orders
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q03(spark, sf_dir):
    """Equi-join + aggregate (E7): Catalyst/AQE picks the physical join."""
    _prep(spark)
    li = _lineitem_ds(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, left_on="l_orderkey", right_on="o_orderkey", how="inner")
    rev_d = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return joined.group_by("o_orderstatus").agg(
        F.round(F.sum(rev_d), 2).cast("double").alias("revenue"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "q04_semi_join",
    """
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)
    """,
)
def q04(spark, sf_dir):
    """Semi join (polars how='semi' → Spark left_semi)."""
    _prep(spark)
    orders = Dataset(load_table(spark, sf_dir, "orders"), index="o_orderdate", id_vars=["o_orderstatus"])
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 49)
    out = orders.join(big, left_on="o_orderkey", right_on="l_orderkey", how="semi")
    return out.fetch("o_orderkey", "o_orderstatus")


@query(
    "q05_anti_join",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q05(spark, sf_dir):
    """Anti join (polars how='anti' → Spark left_anti)."""
    _prep(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_mktsegment")


@query(
    "q06_star_join",
    """
    SELECT r.r_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q06(spark, sf_dir):
    """Star join over the full dimension chain: every dimension is
    explicitly broadcast (they are small by schema design), so the fact
    table never shuffles — the plan is a chain of BroadcastHashJoins plus
    one final agg exchange. This is the 100 TB-safe shape."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(orders.select("o_orderkey", "o_custkey")), li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")), 2
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@query(
    "q07_pivot",
    """
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS F,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q07(spark, sf_dir):
    """Pivot (E6): supplying ``values`` up front avoids the distinct-
    discovery job — the whole pivot is one hash aggregation."""
    _prep(spark)
    ds = _lineitem_ds(spark, sf_dir).select(
        "l_returnflag", "l_linestatus", "l_shipdate", "l_quantity"
    )
    pv = ds.pivot(
        on="l_linestatus", index=["l_returnflag"], values=["F", "O"], aggregate_function="sum"
    )
    return pv.select("l_returnflag", F.round("F", 2).alias("F"), F.round("O", 2).alias("O"))


@query(
    "q08_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable, l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def q08(spark, sf_dir):
    """Unpivot/melt (delegated surface): wide → long."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "variable",
        "value",
    )


# Window order for the q09/q10/q11/q54/q88 trace family. The sf0.1
# fixture REUSES (l_orderkey, l_linenumber) across rows, so the original
# (shipdate, orderkey, linenumber) order has 12 tied groups whose members
# differ in quantity/price — cumsum/lag over them was nondeterministic
# and failed the upward sf0.1 sweep (r8). Appending the measures makes
# the order TOTAL for every consumer: rows still tied agree on all five
# columns, and each window value here is a function of the ordered
# (quantity, price) sequence only, so swapping full ties is a no-op.
_TRACE_ORDER = (
    "ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice"
)
_TRACE_ORDER_COLS = (
    "l_shipdate", "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
)


@query(
    "q09_cumsum",
    f"""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus
                 {_TRACE_ORDER} ROWS UNBOUNDED PRECEDING), 6) AS qty_cumsum
    FROM lineitem
    """,
)
def q09(spark, sf_dir):
    """Per-trace cumulative sum — the idiomatic id_vars/index window op
    this data model exists for (SURVEY §2.3 windows)."""
    _prep(spark)
    w = (
        Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy(*_TRACE_ORDER_COLS)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 6).alias("qty_cumsum"),
    )


@query(
    "q10_diff",
    f"""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice - lag(l_extendedprice) OVER (
                 PARTITION BY l_returnflag, l_linestatus {_TRACE_ORDER}), 6) AS price_diff
    FROM lineitem
    """,
)
def q10(spark, sf_dir):
    """Per-trace first difference (shift/diff via lag)."""
    _prep(spark)
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(*_TRACE_ORDER_COLS)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") - F.lag("l_extendedprice").over(w), 6).alias("price_diff"),
    )


@query(
    "q11_rolling_mean",
    f"""
    SELECT l_orderkey, l_linenumber,
           round(avg(l_quantity) OVER (PARTITION BY l_returnflag, l_linestatus
                 {_TRACE_ORDER} ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS qty_roll
    FROM lineitem
    """,
)
def q11(spark, sf_dir):
    """Rolling mean over a 7-row trace window."""
    _prep(spark)
    w = (
        Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy(*_TRACE_ORDER_COLS)
        .rowsBetween(-6, 0)
    )
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 4).alias("qty_roll"),
    )


@query(
    "q12_rank",
    """
    SELECT o_orderkey,
           rank()       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
           dense_rank() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS price_dense
    FROM orders
    """,
)
def q12(spark, sf_dir):
    """Ranking windows (rank / dense_rank)."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense"),
    )


@query(
    "q13_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q13(spark, sf_dir):
    """Top-k (E: top_k → orderBy+limit): Catalyst plans
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).limit(10).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "q14_coord",
    f"SELECT DISTINCT strftime(l_shipdate, '{TS_FMT_DUCK}') AS ship_s FROM lineitem",
)
def q14(spark, sf_dir):
    """Distinct coordinate values (E16, sorted-coordinate variant)."""
    _prep(spark)
    ds = _lineitem_ds(spark, sf_dir)
    coord = ds.coord("l_shipdate", maintain_order=False)
    return coord.select(F.date_format("l_shipdate", TS_FMT_SPARK).alias("ship_s"))


@query(
    "q15_extrema",
    """
    SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           round(avg(l_quantity), 4) AS avg_qty, count(*) AS n
    FROM lineitem
    """,
)
def q15(spark, sf_dir):
    """Global aggregate row (E17 extrema generalized)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("n"),
    )


@query(
    "q16_unique",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q16(spark, sf_dir):
    """Distinct rows over a subset (unique/dropDuplicates)."""
    _prep(spark)
    ds = _lineitem_ds(spark, sf_dir)
    return ds.fetch("l_returnflag", "l_linestatus").distinct()


@query(
    "q17_quantiles",
    """
    SELECT round(median(o_totalprice), 4) AS med_price,
           round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders
    """,
)
def q17(spark, sf_dir):
    """Exact median / interpolated quantiles (delegated agg surface)."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.round(F.median("o_totalprice"), 4).alias("med_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


@query(
    "q18_drop_nan",
    """
    WITH t AS (
      SELECT l_orderkey,
             CASE WHEN l_discount > 0.05 THEN 'NaN'::DOUBLE ELSE l_quantity END AS val
      FROM lineitem)
    SELECT count(*) AS n_rows, round(sum(val), 2) AS sum_val
    FROM t WHERE NOT isnan(val)
    """,
)
def q18(spark, sf_dir):
    """NaN-vs-null duality (E20 drop_nan): IEEE NaN rows filtered, nulls
    untouched — the polars semantics mapped onto F.isnan."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ds = Dataset(
        li.select(
            "l_orderkey",
            "l_shipdate",
            F.when(F.col("l_discount") > 0.05, F.lit(float("nan")))
            .otherwise(F.col("l_quantity"))
            .alias("val"),
        ),
        index="l_shipdate",
    )
    out = ds.drop_nan()
    return out.df.agg(F.count("*").alias("n_rows"), F.round(F.sum("val"), 2).alias("sum_val"))


@query(
    "q19_fill_null",
    """
    SELECT coalesce(nullif(o_orderpriority, '1-URGENT'), 'none') AS prio, count(*) AS n
    FROM orders GROUP BY 1
    """,
)
def q19(spark, sf_dir):
    """Null handling (fill_null/fillna)."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    ds = Dataset(
        o.select(
            "o_orderdate",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio"),
        ),
        index="o_orderdate",
    )
    filled = ds.fill_null("none")
    return filled.df.groupBy("prio").agg(F.count("*").alias("n"))


@query(
    "q20_row_index",
    """
    SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) - 1 AS rn
    FROM orders
    """,
)
def q20(spark, sf_dir):
    """with_row_index: Spark has no implicit row order, so the index is
    defined over an explicit (id_vars, index) ordering."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    ds = Dataset(o.select("o_orderkey"), index="o_orderkey")
    return ds.with_row_index("rn").fetch("o_orderkey", "rn")


@query(
    "q21_concat_diagonal",
    """
    SELECT l_orderkey AS k, l_quantity AS qty, NULL::DOUBLE AS price
    FROM lineitem WHERE l_returnflag = 'A'
    UNION ALL
    SELECT l_orderkey, NULL::DOUBLE, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q21(spark, sf_dir):
    """Diagonal concat (pl.concat(how='diagonal') →
    unionByName(allowMissingColumns=True))."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select(
        F.col("l_orderkey").alias("k"), F.col("l_quantity").alias("qty")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k"), F.col("l_extendedprice").alias("price")
    )
    return a.unionByName(b, allowMissingColumns=True)


@query(
    "q22_asof_join",
    f"""
    WITH od AS (
      SELECT o_orderdate, max(o_totalprice) AS best_price
      FROM orders GROUP BY o_orderdate)
    SELECT l.l_orderkey, l.l_linenumber,
           strftime(l.l_shipdate, '{TS_FMT_DUCK}') AS ship_s,
           od.best_price
    FROM lineitem l ASOF LEFT JOIN od ON l.l_shipdate >= od.o_orderdate
    """,
)
def q22(spark, sf_dir):
    """As-of join (polars join_asof, backward). method='auto' probes the
    right side and — here, a small pre-aggregation — takes the broadcast
    binary-search path: MAP-ONLY over the left side, no shuffle, and in
    particular no single-partition global sort (which is what the
    union-sort realization degrades to when `by` is empty). The right
    side is pre-aggregated per key so ties are deterministic."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    od = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(F.max("o_totalprice").alias("best_price"))
    )
    out = join_asof(li, od, on="l_shipdate", right_on="o_orderdate", strategy="backward")
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", TS_FMT_SPARK).alias("ship_s"),
        "best_price",
    )


@query(
    "q23_struct_roundtrip",
    """
    SELECT l_orderkey, l_linenumber,
           l_quantity AS "qty.amount", l_extendedprice AS "qty.price"
    FROM lineitem
    """,
)
def q23(spark, sf_dir):
    """Struct build → unnest round-trip (E13/E14): pure projections that
    Catalyst collapses — the flattened output equals the plain projection."""
    _prep(spark)
    from polars_dataset_spark.operators import rebuild_structs, unnest_structs

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.struct(
            F.col("l_quantity").alias("amount"), F.col("l_extendedprice").alias("price")
        ).alias("qty"),
    )
    flat, smap = unnest_structs(li)
    rebuilt = rebuild_structs(flat, smap)  # exercise the inverse too
    flat2, _ = unnest_structs(rebuilt)
    return flat2


# ---------------------------------------------------------------------------
# Events: windowed / sessionized time series (SURVEY §2.3 streaming scope)
# ---------------------------------------------------------------------------


@query(
    "q24_windowed_agg",
    f"""
    WITH w AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
             count(*) AS n, sum(CAST(value AS DECIMAL(28,6))) AS s
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT ws, event_type, n, s,
             2 * CAST(s * 1000000 AS HUGEINT) + n AS a, 2 * n AS b
      FROM w)
    SELECT strftime(ws, '{TS_FMT_DUCK}') AS window_start, event_type,
           n AS n_events, CAST(s AS DOUBLE) AS sum_value,
           CAST((a - ((a % b + b) % b)) // b AS DOUBLE) / 1000000.0 AS avg_value
    FROM m
    """,
)
def q24(spark, sf_dir):
    """Tumbling event-time window aggregation — the batch twin of the
    streaming plan (same code path runs on readStream + watermark)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    out = windowed_agg(ev, window="1 hour")
    return out.select(
        F.date_format("window_start", TS_FMT_SPARK).alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
        "avg_value",
    )


@query(
    "q25_sessionize",
    f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts, value,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM g)
    SELECT user_id, session_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(max(ts), '{TS_FMT_DUCK}') AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def q25(spark, sf_dir):
    """Batch sessionization (lag + cumsum gap-break), 30-minute gap."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    out = sessionize_batch(ev, gap_seconds=1800)
    return out.select(
        "user_id",
        "session_id",
        F.date_format("session_start", TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "sum_value",
    )


@query(
    "q26_session_window",
    f"""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) >= 1800 THEN 1 ELSE 0 END AS brk
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM g)
    SELECT user_id,
           strftime(min(ts), '{TS_FMT_DUCK}') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '{TS_FMT_DUCK}') AS session_end,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def q26(spark, sf_dir):
    """F.session_window semantics (end = last event + gap): the native
    Structured-Streaming session operator run in batch mode."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    out = session_agg(ev, gap="30 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", TS_FMT_SPARK).alias("session_start"),
        F.date_format("session_end", TS_FMT_SPARK).alias("session_end"),
        "n_events",
        "sum_value",
    )


@query(
    "q27_json_props",
    """
    SELECT event_type,
           round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 4) AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q27(spark, sf_dir):
    """Semi-structured access: JSON property extraction + aggregate."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(F.get_json_object("props", "$.k").cast("long")), 4).alias("avg_k"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# Text analysis / dedup / similarity (SURVEY §2.4 pipeline operators)
# ---------------------------------------------------------------------------


@query(
    "q28_text_stats",
    r"""
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS n_tokens,
           round(CASE WHEN trim(text) = '' THEN 0.0
                 ELSE length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                      / len(regexp_split_to_array(trim(lower(text)), '\s+')) END, 6) AS mean_tok_len,
           round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
                 / length(text), 6) AS punct_ratio
    FROM documents
    """,
)
def q28(spark, sf_dir):
    """Token counting + quality stats: pure codegen'd expressions."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = with_text_stats(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round("mean_token_len", 6).alias("mean_tok_len"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
    )


def _duck_langid_sql() -> str:
    toks = r"regexp_split_to_array(trim(lower(text)), '\s+')"
    hits = {
        lang: f"len(list_filter({toks}, x -> list_contains({words!r}, x)))".replace("'", "'")
        for lang, words in STOPWORDS.items()
    }
    hit_cols = ",\n           ".join(f"{expr} AS h_{lang}" for lang, expr in hits.items())
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN h_{l} = {best} THEN '{l}'" for l in langs
    ) + " ELSE 'und' END"
    return f"""
    WITH h AS (
      SELECT doc_id,
           {hit_cols}
      FROM documents WHERE trim(text) <> '')
    SELECT {case} AS lang_pred, count(*) AS n
    FROM h GROUP BY 1
    """


@query("q29_language_id", _duck_langid_sql())
def q29(spark, sf_dir):
    """Language identification (stopword-hit heuristic), counts per
    detected language."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    out = with_language_id(docs)
    return out.groupBy("lang_pred").agg(F.count("*").alias("n"))


@query(
    "q30_quality_score",
    r"""
    WITH s AS (
      SELECT source, text,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS n_tokens,
             CASE WHEN trim(text) = '' THEN 0.0
                  ELSE length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                       / len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS mtl,
             coalesce((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
                   / nullif(length(text), 0), 0.0) AS punct,
             coalesce((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                   / nullif(length(text), 0), 0.0) AS digit
      FROM documents),
    q AS (
      SELECT source,
             round(0.4 * (CASE WHEN n_tokens <= 0 THEN 0.0 ELSE least(n_tokens / 20.0, 1.0) END)
                 + 0.3 * (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
                 + 0.3 * (1.0 - least(1.0, punct * 2.0 + digit)), 6) AS quality
      FROM s)
    SELECT source, round(avg(quality), 4) AS avg_quality, count(*) AS n
    FROM q GROUP BY source
    """,
)
def q30(spark, sf_dir):
    """Heuristic quality scoring, aggregated per source."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    out = with_quality_score(docs)
    return out.groupBy("source").agg(
        F.round(F.avg("quality"), 4).alias("avg_quality"), F.count("*").alias("n")
    )


@query(
    "q31_fingerprint",
    r"""
    WITH n AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents)
    SELECT doc_id,
           CASE WHEN length(norm) = 0 THEN 0
                ELSE list_reduce(
                       list_prepend(0::BIGINT,
                         list_transform(range(1, length(norm) + 1),
                                        i -> ascii(substring(norm, i::INT, 1))::BIGINT)),
                       (acc, x) -> (acc * 31 + x) % 1000000007) END AS fingerprint
    FROM n
    """,
)
def q31(spark, sf_dir):
    """Document fingerprint: engine-reproducible polynomial rolling hash."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return with_fingerprint(docs).select("doc_id", "fingerprint")


@query(
    "q32_exact_dedup",
    r"""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents
    GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g')
    """,
)
def q32(spark, sf_dir):
    """Exact dedup: representative (min id) per normalized text."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        docs.groupBy(norm.alias("__norm"))
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .drop("__norm")
    )


@query(
    "q33_media_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS checksum
    FROM documents
    """,
)
def q33(spark, sf_dir):
    """Multimodal column shape: opaque binary payload + typed metadata
    (size, content hash) — all JVM-side."""
    _prep(spark)
    from polars_dataset_spark.functions import binary_with_metadata

    docs = load_table(spark, sf_dir, "documents")
    out = binary_with_metadata(docs, "text", "text/plain")
    return out.select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.checksum").alias("checksum"),
    )


@query(
    "q34_cosine_topk",
    """
    WITH p AS (SELECT * FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(
                 list_transform(p.embedding, x -> x::DOUBLE),
                 list_transform(c.embedding, x -> x::DOUBLE)), 6) AS cosine
      FROM p, embeddings c WHERE p.vec_id <> c.vec_id)
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def q34(spark, sf_dir):
    """Exact brute-force cosine top-k — the ANN correctness baseline."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return cosine_topk(probes, emb, k=5)


@query(
    "q35_embedding_neardup",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(
               list_transform(a.embedding, x -> x::DOUBLE),
               list_transform(b.embedding, x -> x::DOUBLE)), 6) AS cosine
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id
      AND list_cosine_similarity(
               list_transform(a.embedding, x -> x::DOUBLE),
               list_transform(b.embedding, x -> x::DOUBLE)) >= 0.32
    """,
)
def q35(spark, sf_dir):
    """Embedding near-duplicate pairs above a cosine threshold, exact
    variant — the oracle-checkable twin of the LSH path (q36). Block-
    matrix execution: broadcast corpus + per-partition numpy matmul
    (BLAS), ~20× faster than expression-based pairwise dot products.
    Threshold tuned to the fixture's random-vector similarity range so
    the result set is non-trivial."""
    _prep(spark)
    from polars_dataset_spark.functions import cosine_pairs_block

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_block(emb, threshold=0.32)


# ---- LSH oracles: the hyperplane family is DETERMINISTIC given its seed,
# so the full algorithm (bucket assignment included) is SQL-expressible by
# inlining the seeded hyperplanes as literal vectors in the oracle. The
# remaining float risk is a sign flip of a near-zero projection under a
# different summation order — probability ~1e-9 on this fixture.


def _hyperplane_bucket_sql(dim: int, planes: int, seed: int = 42, e: str = "e") -> str:
    """DuckDB expression for the hyperplane-LSH bucket id of a double-list
    column ``e`` — the exact twin of ``bucket_of`` in
    :mod:`polars_dataset_spark.functions.dedup` /
    :mod:`~.functions.similarity` (same RandomState(seed) planes)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    hyper = rng.normal(size=(dim, planes)).astype(np.float64)
    terms = []
    for j in range(planes):
        lit = "[" + ", ".join(repr(float(v)) for v in hyper[:, j]) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({e}, {lit}) > 0.0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


def _multiprobe_flips(planes: int, probe_bits: int) -> list[int]:
    """Bucket-xor masks probed by ``lsh_bucketed_topk`` (0 + every mask of
    ≤ probe_bits set bits)."""
    import itertools as _it

    return [0] + [
        sum(1 << b for b in combo)
        for r in range(1, probe_bits + 1)
        for combo in _it.combinations(range(planes), r)
    ]


@query(
    "q36_neardup_lsh",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    b AS (
      SELECT vec_id, e, {_hyperplane_bucket_sql(64, 8)} AS bucket FROM v)
    SELECT x.vec_id AS id_a, y.vec_id AS id_b,
           round(list_cosine_similarity(x.e, y.e), 6) AS cosine
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE round(list_cosine_similarity(x.e, y.e), 6) >= 0.32
    """,
)
def q36(spark, sf_dir):
    """Hyperplane-LSH near-dup pairs (the 100 TB path for q35): bucketed
    candidate generation + exact verify. The seeded hyperplanes are inlined
    in the oracle as literals, so the WHOLE algorithm — bucket collisions
    included — is driver-checked, not just executed."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_neardup(emb, threshold=0.32, planes=8)


def _jaccard_pair_ctes(threshold: float, with_jaccard: bool = False) -> str:
    """The exact-Jaccard pair set over a preceding ``sh(doc_id, shingles)``
    CTE, as a tractable-at-sf0.1 CTE chain ending in ``p(id_a, id_b[,
    jaccard])``. Replaces the old brute-force ``sh a JOIN sh b ON
    a.doc_id < b.doc_id`` (O(n²) list-intersects: fine at sf0.01's 500
    docs, >100 s at sf0.1's 5000 — the r7 VERDICT's blocker for a full
    upward oracle sweep).

    EXACT, not approximate: candidates come from the AllPairs/PPJoin
    prefix filter — order every doc's shingles by global frequency (ties
    by value, a total order); if J(A,B) ≥ t then |A∩B| ≥ t·|A∪B| ≥
    t·max(|A|,|B|), so A and B must collide inside their first
    |X| − ⌈t·|X|⌉ + 1 shingles (else the overlap budget is exhausted) —
    any qualifying pair shares a PREFIX shingle and survives to the
    exact list_intersect verify. Verified pair-identical to the brute
    force at sf0.01 and sf0.1 (256 pairs @ t=0.7). The verify re-joins
    ``sh`` by id so each doc's full shingle list is materialized once,
    not carried through the candidate explosion."""
    jac = (
        ",\n             round(len(list_intersect(a.shingles, b.shingles))::DOUBLE\n"
        "                   / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard"
        if with_jaccard
        else ""
    )
    return f"""
    inv AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    gfreq AS (SELECT g, count(*) AS c FROM inv GROUP BY g),
    ranked AS (
      SELECT inv.doc_id, inv.g,
             row_number() OVER (PARTITION BY inv.doc_id ORDER BY gfreq.c, inv.g) AS rk,
             count(*) OVER (PARTITION BY inv.doc_id) AS sz
      FROM inv JOIN gfreq USING (g)),
    pref AS (SELECT doc_id, g FROM ranked WHERE rk <= sz - ceil({threshold} * sz) + 1),
    cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
             FROM pref a JOIN pref b ON a.g = b.g AND a.doc_id < b.doc_id),
    p AS (
      SELECT cand.id_a, cand.id_b{jac}
      FROM cand JOIN sh a ON a.doc_id = cand.id_a JOIN sh b ON b.doc_id = cand.id_b
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) >= {threshold})"""


@query(
    "q37_minhash_pairs",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),"""
    + _jaccard_pair_ctes(0.6, with_jaccard=True)
    + """
    SELECT id_a, id_b, jaccard FROM p
    """,
)
def q37(spark, sf_dir):
    """MinHash-LSH near-duplicate text pairs with exact-Jaccard verify.
    The oracle is the EXACT all-pairs token-3-shingle Jaccard (O(n²) is
    fine for DuckDB at sf0.01): since every emitted pair is exact-verified,
    LSH output ⊆ exact set always, and on this fixture the near-dups sit
    far above the banding s-curve (64 hashes / 16 bands), so recall is 1
    and the sets coincide — checked as full equality."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, threshold=0.6)


def _simhash_votes_sql() -> str:
    vote = lambda j: (
        f"sum(c * (2 * ((strpos('0123456789abcdef', substring(h, {j // 4 + 1}, 1)) - 1)"
        f" >> {3 - j % 4} & 1) - 1)) AS v{j}"
    )
    return ",\n             ".join(vote(j) for j in range(64))


def _simhash_chunks_sql(chunks: int = 4) -> str:
    width = 64 // chunks
    expr = lambda k: (
        " + ".join(
            f"(CASE WHEN v{k * width + p} > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(width)
        )
        + f" AS ch{k}"
    )
    return ",\n             ".join(expr(k) for k in range(chunks))


@query(
    "q38_simhash_dedup",
    rf"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id,
             unnest(CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END) AS t
      FROM d),
    tf AS (
      SELECT doc_id, t, count(*) AS c, md5(t) AS h FROM tok GROUP BY doc_id, t),
    votes AS (
      SELECT doc_id,
             {{VOTES}}
      FROM tf GROUP BY doc_id),
    ch AS (
      SELECT doc_id,
             {{CHUNKS}}
      FROM votes),
    losers AS (
      SELECT DISTINCT b.doc_id
      FROM ch a JOIN ch b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.ch0, b.ch0)) + bit_count(xor(a.ch1, b.ch1))
          + bit_count(xor(a.ch2, b.ch2)) + bit_count(xor(a.ch3, b.ch3)) <= 3)
    SELECT doc_id, source, lang FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    """.replace("{VOTES}", _simhash_votes_sql()).replace("{CHUNKS}", _simhash_chunks_sql()),
)
def q38(spark, sf_dir):
    """SimHash hamming-band dedup survivors, FULL value oracle: the
    engine-portable construction (md5-nibble bits, tf-weighted votes,
    16-bit chunks) replays exactly in SQL, and the oracle needs no
    banding at all — pigeonhole blocking has recall exactly 1 for
    hamming <= k, so the brute-force O(n²) pair set the oracle computes
    IS the operator's pair set."""
    _prep(spark)
    from polars_dataset_spark.functions import simhash_dedup_portable

    docs = load_table(spark, sf_dir, "documents")
    return simhash_dedup_portable(docs, max_hamming=3).select("doc_id", "source", "lang")


@query(
    "q39_lsh_topk",
    f"""
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings),
    b AS (
      SELECT vec_id, e, {_hyperplane_bucket_sql(64, 8)} AS bucket FROM v),
    pr AS (
      SELECT p.vec_id AS query_id, xor(p.bucket, f.fl) AS bucket
      FROM b p, (SELECT unnest({_multiprobe_flips(8, 3)}) AS fl) f
      WHERE p.vec_id < 10),
    cand AS (
      SELECT DISTINCT pr.query_id, c.vec_id AS neighbor_id
      FROM pr JOIN b c USING (bucket)
      WHERE pr.query_id <> c.vec_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             round(list_cosine_similarity(q.e, c.e), 6) AS cosine
      FROM cand
      JOIN b q ON q.vec_id = cand.query_id
      JOIN b c ON c.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, cosine,
           CAST(row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
    FROM scored
    QUALIFY rank <= 5
    """,
)
def q39(spark, sf_dir):
    """Approximate (multi-probe LSH) cosine top-k — scale path of q34.
    Oracle replays the full algorithm in SQL: literal seeded hyperplanes,
    the same 93 multi-probe bucket flips, exact re-rank inside the
    candidate set — so the approximation itself is driver-checked."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_bucketed_topk(probes, emb, k=5)


def _daily_traces(spark, sf_dir):
    """Per-(returnflag, linestatus) daily revenue traces. day = integer
    days since epoch (exact in both engines); revenue summed as
    DECIMAL(28,6) (the products are exact 4-dp values) so the result is
    identical regardless of partition/merge order — the property the
    regrid/FFT oracles below rely on."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    ).cast("double")
    return li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.datediff(F.col("l_shipdate").cast("date"), F.to_date(F.lit("1970-01-01"))).alias(
            "day"
        ),
    ).agg(rev.alias("revenue"))


def _common_days(traces) -> list[int]:
    """Days observed in EVERY trace, ascending — a deterministic shared
    grid (a few thousand ints: safe to collect)."""
    n_traces = traces.select("l_returnflag", "l_linestatus").distinct().count()
    rows = (
        traces.groupBy("day")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") == n_traces)
        .select("day")
        .collect()
    )
    return sorted(r["day"] for r in rows)


# shared CTE head for the q40/q41 oracles (see _daily_traces)
_TRACES_SQL = """
    t AS (
      SELECT l_returnflag, l_linestatus,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
      FROM lineitem GROUP BY 1, 2, 3),
    cd AS (
      SELECT day FROM t GROUP BY day
      HAVING count(*) = (SELECT count(*) FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM t))"""


@query(
    "q40_regrid",
    f"""
    WITH {_TRACES_SQL})
    SELECT t.l_returnflag, t.l_linestatus, CAST(t.day AS DOUBLE) AS day,
           round(t.revenue, 6) AS revenue
    FROM t JOIN cd USING (day)
    """,
)
def q40(spark, sf_dir):
    """Flagship regrid (E10): per-trace not-a-knot spline interpolation of
    daily-revenue traces onto the grid of days every trace observed. A
    spline reproduces its knot values exactly (identity error ~1e-10 ≪
    the 6-dp rounding), so the full grouped-map spline machinery — group
    shuffle, kernel solve, grid contract — is driver-checked against the
    raw daily aggregation. The uniform-grid interpolating variant (points
    OFF the knots) is q76."""
    _prep(spark)
    import numpy as np

    # one materialized rollup, two consumers (common-day probe + regrid)
    traces = pin(_daily_traces(spark, sf_dir), eager=True)
    days = _common_days(traces)
    ds = Dataset(
        traces.withColumn("day", F.col("day").cast("double")),
        index="day",
        id_vars=["l_returnflag", "l_linestatus"],
    )
    out = regrid(ds, np.asarray(days, dtype=np.float64)).df
    return out.select(
        "l_returnflag", "l_linestatus", "day", F.round("revenue", 6).alias("revenue")
    )


@query(
    "q41_fourier",
    f"""
    WITH {_TRACES_SQL}
      ORDER BY day LIMIT 256),
    s AS (
      SELECT t.l_returnflag, t.l_linestatus, t.day, t.revenue / 1000000.0 AS y,
             row_number() OVER (
               PARTITION BY t.l_returnflag, t.l_linestatus ORDER BY t.day) - 1 AS tt
      FROM t JOIN cd USING (day)),
    m AS (
      SELECT l_returnflag, l_linestatus, count(*) + 1 AS n, median(step) AS step
      FROM (
        SELECT l_returnflag, l_linestatus,
               day - lag(day) OVER (
                 PARTITION BY l_returnflag, l_linestatus ORDER BY day) AS step
        FROM s)
      WHERE step IS NOT NULL GROUP BY 1, 2),
    k AS (
      SELECT l_returnflag, l_linestatus, n, step, unnest(range(0, n // 2 + 1)) AS kk
      FROM m),
    ft AS (
      SELECT k.l_returnflag, k.l_linestatus, k.kk, k.n, k.step,
             sum(s.y * cos(2 * pi() * ((k.kk * s.tt) % k.n) / k.n)) AS re,
             -sum(s.y * sin(2 * pi() * ((k.kk * s.tt) % k.n) / k.n)) AS im
      FROM k JOIN s USING (l_returnflag, l_linestatus)
      GROUP BY 1, 2, 3, 4, 5)
    SELECT l_returnflag, l_linestatus,
           round(kk / (n * step), 6) AS frequency,
           round(re, 6) + 0.0 AS re,
           round(im, 6) + 0.0 AS im,
           round(sqrt(re * re + im * im), 6) + 0.0 AS amp
    FROM ft
    """,
)
def q41(spark, sf_dir):
    """Per-trace rFFT (H5) over the first 256 common-grid days, revenue in
    $M. The oracle is the O(n²) DFT evaluated directly in SQL (6 traces ×
    256 samples × 129 bins ≈ 200k trig terms — trivial for DuckDB), so
    the FFT kernel, per-trace grouping, frequency axis and spectra are all
    value-checked. The spline-regrid→FFT composition (no SQL twin) is
    q77. `+ 0.0` normalizes -0.0 across engines."""
    _prep(spark)
    import numpy as np

    # one materialized rollup, two consumers (common-day probe + DFT input)
    traces = pin(_daily_traces(spark, sf_dir), eager=True)
    days = _common_days(traces)[:256]
    sub = traces.filter(F.col("day").isin([int(d) for d in days])).select(
        "l_returnflag",
        "l_linestatus",
        F.col("day").cast("double").alias("day"),
        (F.col("revenue") / F.lit(1e6)).alias("rev_m"),
    )
    ds = Dataset(sub, index="day", id_vars=["l_returnflag", "l_linestatus"])
    out = fourier_transform(ds).df
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.round("frequency", 6).alias("frequency"),
        (F.round("rev_m_re", 6) + F.lit(0.0)).alias("re"),
        (F.round("rev_m_im", 6) + F.lit(0.0)).alias("im"),
        (F.round("rev_m_abs", 6) + F.lit(0.0)).alias("amp"),
    )


@query(
    "q42_autophase",
    """
    WITH m AS (
      SELECT sum(l_discount * l_discount) AS sxx,
             sum(l_tax * l_tax)           AS syy,
             sum(l_discount * l_tax)      AS sxy
      FROM lineitem),
    cand AS (
      SELECT sxx, syy, sxy,
             0.5 * atan2(-2 * sxy, sxx - syy) AS p,
             0.5 * atan2(-2 * sxy, sxx - syy) + pi() / 2 AS q
      FROM m),
    phi AS (
      SELECT CASE
               WHEN (sin(p) * sin(p) * sxx + 2 * sin(p) * cos(p) * sxy + cos(p) * cos(p) * syy)
                 <= (sin(q) * sin(q) * sxx + 2 * sin(q) * cos(q) * sxy + cos(q) * cos(q) * syy)
               THEN p ELSE q END AS phi
      FROM cand)
    SELECT l.l_orderkey, l.l_linenumber,
           round(l.l_discount * cos(phi.phi) - l.l_tax * sin(phi.phi), 6) AS x_rot,
           round(l.l_discount * sin(phi.phi) + l.l_tax * cos(phi.phi), 6) AS y_rot
    FROM lineitem l, phi
    """,
)
def q42(spark, sf_dir):
    """Autophase (H2): closed-form global phase from three distributed
    second moments, then a plain column rotation — no iterative fit."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ds = Dataset(
        li.select("l_orderkey", "l_linenumber", "l_shipdate", "l_discount", "l_tax"),
        index="l_shipdate",
    )
    rot = autophase(ds, "l_discount", "l_tax")
    return rot.fetch(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_discount"), 6).alias("x_rot"),
        F.round(F.col("l_tax"), 6).alias("y_rot"),
    )


# ---------------------------------------------------------------------------
# Delegated-surface parity batch 2 (SURVEY §2.3: expression namespaces,
# set ops, theta joins, multidimensional aggs, more window shapes)
# ---------------------------------------------------------------------------


@query(
    "q43_explode_tokens",
    r"""
    SELECT tok, count(*) AS n FROM (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents WHERE trim(text) <> '')
    GROUP BY tok HAVING count(*) >= 10
    """,
)
def q43(spark, sf_dir):
    """explode (list namespace): token frequency via explode(split(...))."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )
    return toks.groupBy("tok").agg(F.count("*").alias("n")).filter(F.col("n") >= 10)


@query(
    "q44_string_namespace",
    """
    SELECT p_partkey,
           upper(p_name)                       AS name_u,
           length(p_name)                      AS name_len,
           contains(p_name, 'a')               AS has_a,
           replace(p_type, ' ', '_')           AS type_u,
           substring(p_brand, 1, 5)            AS brand5,
           starts_with(p_name, 'p')            AS starts_p
    FROM part
    """,
)
def q44(spark, sf_dir):
    """str.* namespace parity: upper/length/contains/replace/substr/
    starts_with as built-in codegen'd expressions."""
    _prep(spark)
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_u"),
        F.length("p_name").alias("name_len"),
        F.contains("p_name", F.lit("a")).alias("has_a"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_u"),
        F.substring("p_brand", 1, 5).alias("brand5"),
        F.startswith("p_name", F.lit("p")).alias("starts_p"),
    )


@query(
    "q45_datetime_namespace",
    f"""
    SELECT o_orderkey,
           date_part('year', o_orderdate)  AS y,
           date_part('month', o_orderdate) AS m,
           date_part('dow', o_orderdate)   AS dow,
           strftime(date_trunc('month', o_orderdate), '{TS_FMT_DUCK}') AS month_start,
           strftime(o_orderdate + INTERVAL 90 DAY, '{TS_FMT_DUCK}')    AS due
    FROM orders
    """,
)
def q45(spark, sf_dir):
    """dt.* namespace parity: year/month/dow/truncate/offset. Spark dayofweek
    is 1=Sunday; duckdb dow is 0=Sunday — aligned by subtraction."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), TS_FMT_SPARK).alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), TS_FMT_SPARK).alias("due"),
    )


@query(
    "q46_cross_join",
    """
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def q46(spark, sf_dir):
    """Cross join (polars how='cross')."""
    _prep(spark)
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q47_theta_join",
    """
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal
    """,
)
def q47(spark, sf_dir):
    """Theta/inequality join (polars join_where): equi-key plus inequality
    residual — Catalyst keeps the hash join on the equi part and applies
    the inequality as a post-filter (no nested-loop blowup)."""
    _prep(spark)
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c,
        (s["s_nationkey"] == c["c_nationkey"]) & (s["s_acctbal"] > c["c_acctbal"]),
    ).select("s_suppkey", "c_custkey")


@query(
    "q48_set_ops",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def q48(spark, sf_dir):
    """Set ops (intersect — native in Spark, expressible as semi join in
    polars)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.intersect(r)


@query(
    "q49_multi_distinct",
    """
    SELECT count(DISTINCT l_orderkey)                       AS d_orders,
           count(DISTINCT l_partkey)                        AS d_parts,
           count(DISTINCT (l_returnflag, l_linestatus))     AS d_flags
    FROM lineitem
    """,
)
def q49(spark, sf_dir):
    """Multiple exact distinct aggregates in one pass (n_unique)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_orderkey").alias("d_orders"),
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("d_flags"),
    )


@query(
    "q50_cube",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q50(spark, sf_dir):
    """Cube (multidimensional agg — free in Spark, beyond the polars
    surface; SURVEY §2.3 notes it as available)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@query(
    "q51_case_bucketing",
    """
    SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                WHEN o_totalprice < 10000 THEN 'mid'
                ELSE 'large' END AS bucket,
           count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def q51(spark, sf_dir):
    """Conditional expressions (when/otherwise) + agg."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 1000, "small")
        .when(F.col("o_totalprice") < 10000, "mid")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price")
    )


@query(
    "q52_collect_sorted",
    """
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q52(spark, sf_dir):
    """implode/collect_list parity: per-group sorted distinct list,
    emitted as a joined string for engine-neutral comparison."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses")
    )


@query(
    "q53_window_distribution",
    """
    SELECT o_orderkey,
           ntile(4)       OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist()    OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q53(spark, sf_dir):
    """Distribution windows: ntile / percent_rank / cume_dist."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q54_first_last",
    f"""
    SELECT DISTINCT l_returnflag, l_linestatus,
           first_value(l_quantity) OVER w AS first_qty,
           last_value(l_quantity)  OVER w AS last_qty
    FROM lineitem
    WINDOW w AS (PARTITION BY l_returnflag, l_linestatus {_TRACE_ORDER}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q54(spark, sf_dir):
    """first/last over the whole trace (delegated agg surface).

    Realized as min_by/max_by on the trace-order key struct (guide §2.3
    "aggregate before you shuffle"): the unbounded-frame window +
    DISTINCT shuffled EVERY row to #traces partitions and sorted them
    (r13 profile: 12.6 s executor CPU, 31 MB shuffled, parallelism
    capped at 6 traces); the aggregate form computes the identical
    (first_qty, last_qty) pair per trace with map-side partial
    aggregation — shuffle bytes drop to one row per (task, trace) and
    the map side parallelizes with the cluster, not the trace count.
    Equivalence: the trace order is TOTAL (five columns, _TRACE_ORDER)
    and rows tied on all five agree on l_quantity, so first/last over
    the ordered unbounded frame ARE the quantities at the min/max order
    key — and DISTINCT over per-trace-constant columns is one row per
    trace, exactly the groupBy output."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    key = F.struct(*[F.col(c) for c in _TRACE_ORDER_COLS])
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.min_by("l_quantity", key).alias("first_qty"),
        F.max_by("l_quantity", key).alias("last_qty"),
    )


@query(
    "q55_slice",
    """
    SELECT o_orderkey, o_totalprice FROM (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS rn
      FROM orders)
    WHERE rn BETWEEN 101 AND 120
    """,
)
def q55(spark, sf_dir):
    """slice/tail semantics: rows [100, 120) of an explicit order (Spark
    has no implicit row order — canonical (id_vars, index) order, SURVEY
    §7 hard-parts #2). Routed through Dataset.slice, which rides the
    two-pass distributed prefix sum — no single-partition window even
    when the input is large enough to need an exchange."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders")
    ds = Dataset(o.select("o_orderkey", "o_totalprice"), index="o_orderkey")
    return ds.slice(100, 20).fetch("o_orderkey", "o_totalprice")


@query(
    "q56_regexp_extract",
    r"""
    SELECT event_id,
           regexp_extract(props, '"k": (\d+)', 1) AS k_str
    FROM events WHERE props IS NOT NULL
    """,
)
def q56(spark, sf_dir):
    """Regex extraction (str.extract)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("props").isNotNull()).select(
        "event_id", F.regexp_extract("props", r'"k": (\d+)', 1).alias("k_str")
    )


@query(
    "q57_bpe_token_count",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS n_tokens
    FROM documents
    """,
)
def q57(spark, sf_dir):
    """BPE-ish token counting (LLM-token budget proxy): identical RE2
    pattern evaluated by both engines."""
    _prep(spark)
    from polars_dataset_spark.functions import with_token_count

    docs = load_table(spark, sf_dir, "documents")
    return with_token_count(docs, mode="bpe").select("doc_id", "n_tokens")


@query(
    "q58_ivf_topk",
    """
    WITH cent AS (
      SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
      FROM embeddings WHERE vec_id < 8),
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
          FROM embeddings),
    dist AS (
      SELECT e.vec_id, cent.cell, list_distance(e.ev, cent.cv) AS d
      FROM e, cent),
    assign AS (
      SELECT vec_id AS neighbor_id, cell FROM dist
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
    pcells AS (
      SELECT vec_id AS query_id, cell FROM dist WHERE vec_id < 10
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) <= 3),
    cand AS (
      SELECT p.query_id, a.neighbor_id
      FROM pcells p JOIN assign a USING (cell)
      WHERE a.neighbor_id <> p.query_id
      GROUP BY 1, 2),
    scored AS (
      SELECT c.query_id, c.neighbor_id,
             round(list_cosine_similarity(q.ev, n.ev), 6) AS cosine
      FROM cand c
      JOIN e q ON q.vec_id = c.query_id
      JOIN e n ON n.vec_id = c.neighbor_id)
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored QUALIFY rank <= 5
    """,
)
def q58(spark, sf_dir):
    """IVF approximate cosine top-k: coarse quantizer + probed-cell exact
    re-rank (the clustered-corpus ANN path). The quantizer here is FIXED
    (centroids = the first 8 corpus vectors) so the whole pipeline —
    nearest-centroid assignment (squared-L2, ties to the lower cell),
    3-cell probing, in-cell exact cosine rank — replays exactly in SQL;
    production use omits ``centroids`` and gets the sampled-KMeans
    quantizer (same plan shape, driver-trained on a bounded sample)."""
    _prep(spark)
    from polars_dataset_spark.functions import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    cents = [r["embedding"] for r in emb.filter(F.col("vec_id") < 8)
             .orderBy("vec_id").select("embedding").collect()]
    return ivf_topk(probes, emb, k=5, n_cells=8, n_probe=3, centroids=cents)


@query(
    "q59_group_by_dynamic",
    """
    SELECT l_returnflag, l_linestatus,
           floor(l_quantity / 10) * 10 AS index_start,
           count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
)
def q59(spark, sf_dir):
    """Dynamic group-by (polars ``group_by_dynamic``): tumbling numeric-
    index buckets per trace, one hash aggregation."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ds = Dataset(li, index="l_quantity", id_vars=["l_returnflag", "l_linestatus"])
    return (
        ds.group_by_dynamic(10.0)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("index_start", F.col("index_start").cast("double"))
    )


@query(
    "q61_join_where",
    """
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c ON s.s_acctbal < c.c_acctbal - 9000
    """,
)
def q61(spark, sf_dir):
    """Pure inequality join (polars ``join_where`` with no equi key):
    Catalyst plans BroadcastNestedLoop with the small side broadcast —
    inherently O(|S|·|C|) work but no shuffle; the selective predicate
    keeps output small. At scale: add any equi conjunct (see q47) or
    bucketize the range key to regain a hash join."""
    _prep(spark)
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(c, s["s_acctbal"] < c["c_acctbal"] - 9000).select(
        "s_suppkey", "c_custkey"
    )


@query(
    "q62_fill_nan",
    """
    WITH t AS (
      SELECT CASE WHEN l_discount > 0.05 THEN 'NaN'::DOUBLE ELSE l_quantity END AS val
      FROM lineitem)
    SELECT count(*) AS n,
           round(sum(CASE WHEN isnan(val) THEN 0.0 ELSE val END), 2) AS sum_filled,
           CAST(sum(CASE WHEN isnan(val) THEN 1 ELSE 0 END) AS BIGINT) AS n_was_nan
    FROM t
    """,
)
def q62(spark, sf_dir):
    """fill_nan (the complement of q18's drop_nan): NaN → 0 replacement,
    nulls untouched — polars NaN/null duality again."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ds = Dataset(
        li.select(
            "l_shipdate",
            F.when(F.col("l_discount") > 0.05, F.lit(float("nan")))
            .otherwise(F.col("l_quantity"))
            .alias("val"),
        ),
        index="l_shipdate",
    )
    was_nan = F.sum(F.when(F.isnan("val"), 1).otherwise(0)).alias("n_was_nan")
    pre = ds.df.agg(F.count("*").alias("n"), was_nan)
    filled = ds.fill_nan(0.0)
    return (
        filled.df.agg(F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("sum_filled"))
        .crossJoin(pre.select("n_was_nan"))
    )


def _duck_clean_corpus_sql() -> str:
    """q60 oracle: the WHOLE clean_corpus composition in SQL — per-doc
    quality (q30's formulas), per-doc language id (q29's), exact dedup
    (q32's), ONE-PASS fuzzy dedup via the exact-Jaccard pair set (recall 1
    on the fixture, q37's argument: drop the larger id of each verified
    pair), BPE-ish token count (q57's)."""
    toks = r"regexp_split_to_array(trim(lower(text)), '\s+')"
    hit_exprs = {
        lang: f"len(list_filter({toks}, x -> list_contains({words!r}, x)))"
        for lang, words in STOPWORDS.items()
    }
    hit_cols = ",\n             ".join(f"{e} AS h_{l}" for l, e in hit_exprs.items())
    langs = list(STOPWORDS)
    best = "greatest(" + ", ".join(f"h_{l}" for l in langs) + ")"
    lang_case = (
        "CASE WHEN " + best + " = 0 THEN 'und' "
        + " ".join(f"WHEN h_{l} = {best} THEN '{l}'" for l in langs)
        + " ELSE 'und' END"
    )
    return rf"""
    WITH s AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len({toks}) END AS n_toks0,
             CASE WHEN trim(text) = '' THEN 0.0
                  ELSE length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                       / len({toks}) END AS mtl,
             coalesce((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
                   / nullif(length(text), 0), 0.0) AS punct,
             coalesce((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
                   / nullif(length(text), 0), 0.0) AS digit
      FROM documents),
    q AS (
      SELECT doc_id, text,
             round(0.4 * (CASE WHEN n_toks0 <= 0 THEN 0.0 ELSE least(n_toks0 / 20.0, 1.0) END)
                 + 0.3 * (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
                 + 0.3 * (1.0 - least(1.0, punct * 2.0 + digit)), 6) AS quality
      FROM s),
    f AS (SELECT * FROM q WHERE quality >= 0.5),
    lg AS (
      SELECT doc_id, text, quality,
             {hit_cols}
      FROM f),
    l AS (SELECT doc_id, text, quality, {lang_case} AS lang_pred FROM lg),
    dd AS (
      SELECT l.* FROM l
      JOIN (SELECT min(doc_id) AS keep FROM l
            GROUP BY regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) k
        ON l.doc_id = k.keep),
    tok AS (
      SELECT doc_id,
             CASE WHEN regexp_replace(trim(lower(text)), '\s+', ' ', 'g') = ''
                  THEN ['']
                  ELSE string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')
             END AS toks
      FROM dd),
    sh AS (
      SELECT doc_id, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),
    {_jaccard_pair_ctes(0.7)},
    losers AS (SELECT DISTINCT id_b FROM p)
    SELECT dd.doc_id, dd.lang_pred, dd.quality,
           len(regexp_extract_all(dd.text,
               '''(?:[sdmt]|ll|ve|re)| ?\p{{L}}+| ?\p{{N}}+| ?[^\s\p{{L}}\p{{N}}]+')) AS n_tokens
    FROM dd LEFT JOIN losers ON dd.doc_id = losers.id_b
    WHERE losers.id_b IS NULL
    """


@query("q60_clean_corpus", _duck_clean_corpus_sql())
def q60(spark, sf_dir):
    """Composed training-corpus pipeline: quality filter → language id →
    exact dedup → MinHash-LSH fuzzy dedup → BPE-ish token accounting.
    The oracle replays the ENTIRE composition in SQL (stage formulas from
    q29/q30/q32/q57; the fuzzy stage via the exact-Jaccard pair set,
    recall-1 on this fixture per q37's argument) — so stage ORDERING and
    interaction are value-checked, not just each stage alone."""
    _prep(spark)
    from polars_dataset_spark.functions import clean_corpus

    docs = load_table(spark, sf_dir, "documents")
    return clean_corpus(docs, min_quality=0.5, fuzzy_threshold=0.7).select(
        "doc_id", "lang_pred", "quality", "n_tokens"
    )


@query(
    "q63_connected_components",
    """
    SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY lang, source) AS component
    FROM documents
    QUALIFY count(*) OVER (PARTITION BY lang, source) > 1
    """,
)
def q63(spark, sf_dir):
    """Distributed connected components (large-star/small-star,
    functions/graph.py) — value-matched: the edge list is a
    deterministic PATH through each (lang, source) group (worst case
    for naive propagation), so every node's true component is its
    group minimum, which the oracle states directly while the Spark
    side actually runs the iterative contraction."""
    _prep(spark)
    from polars_dataset_spark.functions import chain_edges, connected_components

    docs = load_table(spark, sf_dir, "documents")
    edges = chain_edges(docs, "doc_id", "lang", "source")
    return connected_components(edges)


@query(
    "q64_dedup_components",
    r"""
    WITH RECURSIVE
    d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),"""
    + _jaccard_pair_ctes(0.7)
    + r""",
    e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT reach.id, e.t FROM reach JOIN e ON reach.r = e.s),
    comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id)
    SELECT doc.doc_id, doc.lang, doc.source
    FROM documents doc JOIN comp ON doc.doc_id = comp.id
    WHERE comp.root = doc.doc_id
    """,
)
def q64(spark, sf_dir):
    """Transitive fuzzy dedup: MinHash-LSH near-duplicate pairs →
    connected components (large-star/small-star) → keep the minimum-id
    representative per CLUSTER. Oracle: the exact-Jaccard pair graph
    (recall 1 on this fixture, same argument as q37) closed transitively
    with a recursive CTE — so the LSH+CC composition is value-checked
    end-to-end, not just its stages."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        dedup_by_components,
        minhash_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, threshold=0.7)
    return dedup_by_components(docs, pairs).select("doc_id", "lang", "source")


@query(
    "q65_salted_join",
    """
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def q65(spark, sf_dir):
    """Skew-mitigated join (operators/skew.py): lineitem salted 8 ways,
    orders replicated per salt, joined on (key, salt) — value-matched
    against the plain equi-join, proving the salt never changes the
    result, only the shuffle distribution."""
    _prep(spark)
    from polars_dataset_spark.operators import salted_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    od = load_table(spark, sf_dir, "orders")
    joined = salted_join(li, od, on="o_orderkey", how="inner", salt=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")), 2
        ).cast("double").alias(
            "revenue"
        ),
    )


@query(
    "q66_stratified_sample",
    """
    SELECT doc_id, lang, source
    FROM documents
    QUALIFY row_number() OVER (
        PARTITION BY lang, source
        ORDER BY md5(cast(doc_id AS VARCHAR)), doc_id
    ) <= 5
    """,
)
def q66(spark, sf_dir):
    """Deterministic stratified sampling (functions/sampling.py): at most
    5 docs per (lang, source), selected in md5(id)-hash order — the
    engine-portable capped data-mixing draw. Value-matched because both
    engines compute the identical md5 hex, so they pick the identical
    rows."""
    _prep(spark)
    from polars_dataset_spark.functions import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, ["lang", "source"], quota=5, id_col="doc_id").select(
        "doc_id", "lang", "source"
    )


@query(
    "q67_hash_sample",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5(cast(doc_id AS VARCHAR)), 1, 15) < '199999999999999'
    """,
)
def q67(spark, sf_dir):
    """Deterministic ~10% corpus sample by id hash (map-only, no RNG
    state): fraction 0.1 → 60-bit threshold 0.1·16^15 = 0x19999…, which
    the oracle states as a fixed-length hex-string compare — the same
    set either way."""
    _prep(spark)
    from polars_dataset_spark.functions import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", fraction=0.1).select("doc_id", "lang")


@query(
    "q68_pack_sequences",
    """
    SELECT doc_id, lang,
           CAST(sum(n_chars) OVER w AS BIGINT) AS cum_tokens,
           CAST((sum(n_chars) OVER w - n_chars) // 4096 AS BIGINT) AS bin,
           CAST((sum(n_chars) OVER w - n_chars) % 4096 AS BIGINT) AS offset
    FROM documents
    WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q68(spark, sf_dir):
    """Sequence packing (functions/packing.py): concat-and-chunk window
    assignment for pretraining — per-lang streams ordered by doc_id,
    4096-token budget, each doc gets its window index and offset from
    one prefix sum (exact-integer value match)."""
    _prep(spark)
    from polars_dataset_spark.functions import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, budget=4096, tokens_col="n_chars", order_col="doc_id",
        stream_cols=["lang"],
    ).select("doc_id", "lang", "cum_tokens", "bin", "offset")


@query(
    "q69_pack_global",
    """
    SELECT doc_id,
           CAST(sum(n_chars) OVER w AS BIGINT) AS cum_tokens,
           CAST((sum(n_chars) OVER w - n_chars) // 4096 AS BIGINT) AS bin,
           CAST((sum(n_chars) OVER w - n_chars) % 4096 AS BIGINT) AS offset
    FROM documents
    WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q69(spark, sf_dir):
    """Single-stream packing: the oracle is a global window (fine for
    DuckDB single-node); the Spark side runs the TWO-PASS distributed
    prefix sum (range partition → per-partition totals → offset map →
    within-partition windows, functions/packing._global_prefix_sum) —
    value-matching proves the scale path computes the identical global
    running total with no single-reducer stage."""
    _prep(spark)
    from polars_dataset_spark.functions import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(
        docs, budget=4096, tokens_col="n_chars", order_col="doc_id"
    ).select("doc_id", "cum_tokens", "bin", "offset")


@query(
    "q70_range_join",
    """
    WITH win AS (
      SELECT event_id AS win_id, ts AS s, ts + INTERVAL 2 MINUTE AS e
      FROM events WHERE event_type = 'error')
    SELECT w.win_id, count(*) AS n, round(sum(ev.value), 2) AS sum_value
    FROM win w JOIN events ev ON ev.ts >= w.s AND ev.ts <= w.e
    GROUP BY 1
    """,
)
def q70(spark, sf_dir):
    """Bucketized range join (operators/range_join.py): events inside the
    2-minute window after each error event. The naive inequality join
    plans BroadcastNestedLoop (O(|P|·|I|), broadcast side must fit);
    bucketing the time axis at the max window length turns it into an
    equi hash join on the bucket (each pair meets in exactly one bucket,
    so no dedup) — value-matched against DuckDB's plain theta join."""
    _prep(spark)
    from polars_dataset_spark.operators import range_join

    ev = load_table(spark, sf_dir, "events")
    win = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("win_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 MINUTES")).alias("e"),
    )
    out = range_join(ev.select("ts", "value"), win, "ts", "s", "e")
    return out.groupBy("win_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


@query(
    "q71_stream_dedup",
    f"""
    SELECT user_id, event_type,
           strftime(min(ts), '{TS_FMT_DUCK}') AS first_ts
    FROM events GROUP BY 1, 2
    """,
)
def q71(spark, sf_dir):
    """Streaming exact dedup, batch twin (streaming/ops.stream_dedup):
    one surviving row per (user_id, event_type) with its first event
    time. The stream side is dropDuplicatesWithinWatermark — duplicate
    suppression with state EVICTED past the watermark, the only dedup
    that stays bounded on an unbounded stream; parity with this batch
    plan is pinned in tests/test_streaming.py."""
    _prep(spark)
    from polars_dataset_spark.streaming import stream_dedup

    ev = load_table(spark, sf_dir, "events")
    out = stream_dedup(ev, ("user_id", "event_type"))
    return out.select(
        "user_id",
        "event_type",
        F.date_format("first_ts", TS_FMT_SPARK).alias("first_ts"),
    )


@query(
    "q72_rolling_range",
    """
    SELECT l_returnflag, l_linestatus, l_quantity,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))) OVER (
               PARTITION BY l_returnflag, l_linestatus
               ORDER BY l_quantity
               RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS roll_sum
    FROM lineitem
    """,
)
def q72(spark, sf_dir):
    """Value-based rolling window (polars ``rolling_sum_by``): sum over
    all rows whose l_quantity lies within 5 UNITS (not 5 rows) of the
    current row's, per trace — ``rangeBetween``, the frame kind q11's
    row-based rolling cannot express; ties share one frame, so the
    result is deterministic in both engines. Money sums accumulate as
    exact DECIMAL and round in decimal on BOTH sides (the r9 money-sum
    lesson) — the r10 sampled sf10 sweep caught this query's double
    random-walk error crossing the 2-dp rounding unit at a 10 M-row
    window partition (0.04 at ~6.4e10)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    # Two-level realization (guide §2.3 "aggregate before you shuffle" /
    # §8 "decide with small rows"): a RANGE frame's value is a function
    # of the DISTINCT quantity only (ties share one frame), so
    # pre-aggregate the exact decimal sum per (trace, quantity) with
    # map-side partial aggregation, run the range window over that tiny
    # distinct-quantity frame, and join the per-quantity result back —
    # the join side is dimension-sized (traces x distinct quantities),
    # so AQE broadcasts it and the raw rows are never shuffled at all.
    # The r12-shape plan shuffled EVERY row to #traces partitions and
    # summed per row (r13 profile: 10.0 s executor CPU, 15 MB shuffled,
    # parallelism capped at 6). Decimal sums are exact and associative,
    # so sum-of-group-sums == sum-of-rows bit-for-bit.
    per_q = li.groupBy(*keys, "l_quantity").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).alias("__qsum")
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("l_quantity"))
        .rangeBetween(-5, 0)
    )
    rolled = per_q.select(
        *keys,
        "l_quantity",
        F.round(F.sum("__qsum").over(w), 2).cast("double").alias("roll_sum"),
    )
    return li.select(*keys, "l_quantity").join(
        rolled, on=[*keys, "l_quantity"]
    )


@query(
    "q73_hash_sample_by",
    """
    SELECT doc_id, source
    FROM documents
    WHERE substring(md5(cast(doc_id AS VARCHAR)), 1, 15) <
          CASE source WHEN 'src1' THEN 'ffffffffffffffff'
                      WHEN 'src2' THEN '666666666666666'
                      ELSE '199999999999999' END
    """,
)
def q73(spark, sf_dir):
    """Per-stratum fraction sampling (the deterministic ``sampleBy``):
    keep 100% of src1, 40% of src2, 10% of everything else — a mixing
    recipe as one map-only CASE threshold on the id hash. 0.4·16^15 =
    0x6666…6 (15 digits), 0.1·16^15 = 0x19999…9; the src1 threshold
    exceeds any 15-digit hash, keeping all."""
    _prep(spark)
    from polars_dataset_spark.functions import hash_sample_by

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample_by(
        docs, "doc_id", "source", {"src1": 1.0, "src2": 0.4}, default=0.1
    ).select("doc_id", "source")


@query(
    "q74_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q74(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP (q50 covers CUBE): per (flag,
    status), per flag, and grand total in ONE pass — Catalyst expands
    grouping sets into a single Expand + hash aggregate, not three
    scans."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
    )


@query(
    "q75_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_orderpriority
        ORDER BY o_totalprice DESC, o_orderkey
    ) <= 3
    """,
)
def q75(spark, sf_dir):
    """Top-k per group (polars ``group_by(...).head(k)`` after sort):
    rank inside each partition, keep k — one shuffle on the group key,
    per-partition heap via the window sort; the id tiebreak makes the
    cut deterministic in both engines."""
    _prep(spark)
    od = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "q76_regrid_uniform",
    f"""
    WITH {_TRACES_SQL}),
    b AS (SELECT max(mn) AS lo, min(mx) AS hi FROM (
            SELECT min(day) AS mn, max(day) AS mx FROM t
            GROUP BY l_returnflag, l_linestatus))
    SELECT t.l_returnflag, t.l_linestatus,
           CAST(200 AS BIGINT) AS n_grid,
           count(*) AS n_knots,
           true AS day_lo_ok, true AS day_hi_ok, true AS envelope_ok,
           round(max(CASE WHEN t.day = b.lo THEN t.revenue END), 6) AS v_lo,
           round(max(CASE WHEN t.day = b.hi THEN t.revenue END), 6) AS v_hi
    FROM t CROSS JOIN b
    GROUP BY 1, 2
    """,
)
def q76(spark, sf_dir):
    """Uniform-grid spline regrid — the interpolating path (grid points OFF
    the knots). The grid spans the COMMON day span (max of per-trace first
    days → min of per-trace last days) so every grid point interpolates —
    never extrapolates — for every trace at every sf. No SQL engine can
    recompute the spline, so the oracle checks the interpolation CONTRACT
    per trace, q78-style: exactly 200 grid points spanning [lo, hi]; the
    spline value at an endpoint that IS a knot of the trace equals the raw
    daily aggregate there (real value match, NULL-safe where the endpoint
    day is absent from a trace); the knot count feeding each per-group
    kernel equals the raw daily-row count; and every interpolated value
    stays inside the trace's raw envelope ± 3× its range — a catastrophe
    bound, not a tight one: at sparse-knot sfs (sf0.001) genuine cubic
    overshoot reaches ~1× the range, while a broken kernel or accidental
    extrapolation blows far past 3×. Off-knot numerics are pinned by
    pytest/hypothesis on the kernel."""
    _prep(spark)
    import numpy as np

    # Materialize the daily aggregate ONCE: four downstream consumers
    # (span probe, regrid input, raw stats, endpoint checks) would each
    # re-run the lineitem scan+aggregation otherwise. At scale the traces
    # frame is tiny (days x traces) while the scan is the 100-TB part —
    # checkpointing the rollup is the right plan shape.
    traces = pin(_daily_traces(spark, sf_dir), eager=True)
    keys = ["l_returnflag", "l_linestatus"]
    row = (
        traces.groupBy(*keys)
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .agg(F.max("mn").alias("lo"), F.min("mx").alias("hi"))
        .first()
    )
    lo, hi = float(row["lo"]), float(row["hi"])
    ds = Dataset(
        traces.withColumn("day", F.col("day").cast("double")),
        index="day",
        id_vars=keys,
    )
    reg = regrid(ds, np.linspace(lo, hi, 200)).df
    raw = traces.groupBy(*keys).agg(
        F.count("*").alias("n_knots"),
        F.min("revenue").alias("raw_min"),
        F.max("revenue").alias("raw_max"),
        F.max(F.when(F.col("day") == int(lo), F.col("revenue"))).alias("raw_at_lo"),
        F.max(F.when(F.col("day") == int(hi), F.col("revenue"))).alias("raw_at_hi"),
    )
    ra = reg.groupBy(*keys).agg(
        F.count("*").alias("n_grid"),
        F.min("day").alias("gmin"),
        F.max("day").alias("gmax"),
        F.min("revenue").alias("smin"),
        F.max("revenue").alias("smax"),
        F.max(F.when(F.col("day") == lo, F.col("revenue"))).alias("s_at_lo"),
        F.max(F.when(F.col("day") == hi, F.col("revenue"))).alias("s_at_hi"),
    )
    rng = F.col("raw_max") - F.col("raw_min")
    return ra.join(raw, keys).select(
        *keys,
        "n_grid",
        "n_knots",
        (F.col("gmin") == F.lit(lo)).alias("day_lo_ok"),
        (F.col("gmax") == F.lit(hi)).alias("day_hi_ok"),
        (
            (F.col("smax") <= F.col("raw_max") + 3.0 * rng)
            & (F.col("smin") >= F.col("raw_min") - 3.0 * rng)
        ).alias("envelope_ok"),
        F.when(F.col("raw_at_lo").isNotNull(), F.round("s_at_lo", 6)).alias("v_lo"),
        F.when(F.col("raw_at_hi").isNotNull(), F.round("s_at_hi", 6)).alias("v_hi"),
    )


@query(
    "q77_fourier_spline",
    f"""
    WITH {_TRACES_SQL}),
    b AS (SELECT max(mn) AS lo, min(mx) AS hi FROM (
            SELECT min(day) AS mn, max(day) AS mx FROM t
            GROUP BY l_returnflag, l_linestatus))
    SELECT t.l_returnflag, t.l_linestatus,
           CAST(65 AS BIGINT) AS n_bins,
           round(63.5 / (any_value(b.hi) - any_value(b.lo)), 6) AS freq_hi,
           CAST(0.0 AS DOUBLE) AS freq_lo,
           true AS dc_im_ok, true AS nyq_im_ok, true AS dc_sum_ok
    FROM t CROSS JOIN b
    GROUP BY 1, 2
    """,
)
def q77(spark, sf_dir):
    """Spline-regrid to 128 uniform points, then per-trace rFFT — the H5
    composition over interpolated (non-knot) samples (q41 value-checks the
    FFT itself on the common-day grid). The oracle checks the composition's
    CONTRACT per trace: 65 = 128//2+1 output bins; the frequency axis ends
    at the Nyquist rate 0.5/step = 63.5/(hi-lo) (a real value match — it
    pins grid construction AND the median-step frequency axis) and starts at
    DC 0.0; the DC and Nyquist bins of a real-input rFFT are purely real;
    and the DC bin's real part equals the plain sum of the interpolated
    samples (FFT-vs-direct-sum cross-check)."""
    _prep(spark)
    import numpy as np

    # one materialized rollup (span probe + regrid input), and the regrid
    # output checkpointed too — its per-group pandas kernel feeds BOTH the
    # FFT and the sample-sum cross-check and must not run twice
    traces = pin(_daily_traces(spark, sf_dir), eager=True)
    keys = ["l_returnflag", "l_linestatus"]
    row = (
        traces.groupBy(*keys)
        .agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
        .agg(F.max("mn").alias("lo"), F.min("mx").alias("hi"))
        .first()
    )
    lo, hi = float(row["lo"]), float(row["hi"])
    ds = Dataset(
        traces.withColumn("day", F.col("day").cast("double")),
        index="day",
        id_vars=keys,
    )
    g = regrid(ds, np.linspace(lo, hi, 128))
    g = Dataset(pin(g.df, eager=True), index="day", id_vars=keys)
    f = fourier_transform(g).df
    ssum = g.df.groupBy(*keys).agg(
        F.sum("revenue").alias("sample_sum"),
        F.sum(F.abs("revenue")).alias("sabs"),
    )
    w = Window.partitionBy(*keys)
    fx = f.withColumn("fmax", F.max("frequency").over(w))
    fa = fx.groupBy(*keys).agg(
        F.count("*").alias("n_bins"),
        F.round(F.max("frequency"), 6).alias("freq_hi"),
        F.min("frequency").alias("freq_lo"),
        F.max(F.when(F.col("frequency") == 0.0, F.col("revenue_re"))).alias("dc_re"),
        F.max(F.when(F.col("frequency") == 0.0, F.abs(F.col("revenue_im")))).alias(
            "dc_im"
        ),
        F.max(
            F.when(F.col("frequency") == F.col("fmax"), F.abs(F.col("revenue_im")))
        ).alias("nyq_im"),
    )
    tol = F.lit(1e-9) * F.col("sabs") + F.lit(1e-6)
    return fa.join(ssum, keys).select(
        *keys,
        "n_bins",
        "freq_hi",
        "freq_lo",
        (F.col("dc_im") <= tol).alias("dc_im_ok"),
        (F.col("nyq_im") <= tol).alias("nyq_im_ok"),
        (F.abs(F.col("dc_re") - F.col("sample_sum")) <= tol).alias("dc_sum_ok"),
    )


@query(
    "q78_approx_quantiles",
    """
    SELECT count(*) AS n,
           true AS p25_ok, true AS med_ok, true AS p75_ok
    FROM orders
    """,
)
def q78(spark, sf_dir):
    """Approximate quantiles — the 100 TB path beside q17's exact sort
    aggregate. ``percentile_approx`` (Greenwald-Khanna sketch: one pass,
    bounded memory, mergeable map-side) guarantees rank error ≤
    n/accuracy. The sketch's picked VALUE is engine-specific, so the
    driver-checked contract is the guarantee itself: each returned value's
    true rank interval must overlap [⌊(p−ε)n⌋, ⌈(p+ε)n⌉]."""
    _prep(spark)
    import math

    o = load_table(spark, sf_dir, "orders")
    acc = 1000
    row = o.agg(
        F.percentile_approx(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(acc)
        ).alias("qs"),
        F.count("*").alias("n"),
    ).first()
    (p25, med, p75), n = row["qs"], row["n"]
    c = F.col("o_totalprice")

    def ok(v: float, p: float):
        lt = F.sum((c < F.lit(v)).cast("long"))
        le = F.sum((c <= F.lit(v)).cast("long"))
        lo = math.floor((p - 1.0 / acc) * n)
        hi = math.ceil((p + 1.0 / acc) * n)
        return (lt + 1 <= F.lit(hi)) & (le >= F.lit(lo))

    return o.agg(
        F.count("*").alias("n"),
        ok(p25, 0.25).alias("p25_ok"),
        ok(med, 0.50).alias("med_ok"),
        ok(p75, 0.75).alias("p75_ok"),
    )


@query(
    "q79_merge_sorted",
    f"""
    SELECT o_orderkey, strftime(o_orderdate, '{TS_FMT_DUCK}') AS od, o_totalprice
    FROM orders
    """,
)
def q79(spark, sf_dir):
    """polars ``merge_sorted``: two disjoint sorted halves re-merged on
    the sort key — realized as union + one shuffle-sort (Spark has no
    order-preserving merge primitive; pre-sortedness is a physical
    property Catalyst re-derives, not an API input)."""
    _prep(spark)
    od = load_table(spark, sf_dir, "orders")
    even = Dataset(od.filter(F.col("o_orderkey") % 2 == 0), index="o_orderkey")
    odd = od.filter(F.col("o_orderkey") % 2 == 1)
    merged = even.merge_sorted(odd, key="o_orderdate")
    return merged.df.select(
        "o_orderkey",
        F.date_format("o_orderdate", TS_FMT_SPARK).alias("od"),
        "o_totalprice",
    )


@query(
    "q80_rolling_order_stats",
    """
    SELECT o_orderkey, o_orderpriority,
           round(median(o_totalprice) OVER w, 4) AS med7,
           round(quantile_cont(o_totalprice, 0.25) OVER w, 4) AS p25_7
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q80(spark, sf_dir):
    """polars ``rolling_median`` / ``rolling_quantile``: exact order
    statistics over a trailing rows frame — unique index so the frame
    is deterministic. Both quantiles come from ONE chunked
    order-statistics pass (``rolling_quantiles``, r13): the former
    JVM window capped parallelism at the 5 priority traces (measured
    6.2 s CPU across 5 single-core tasks at sf0.1); the chunked pass
    range-partitions on (trace, index) with an overlap carry, so
    parallelism scales with the cluster (guide §2.6)."""
    _prep(spark)
    od = load_table(spark, sf_dir, "orders")
    ds = Dataset(
        od.select("o_orderkey", "o_orderpriority", "o_totalprice"),
        index="o_orderkey",
        id_vars=["o_orderpriority"],
    )
    out = ds.rolling_quantiles(
        "o_totalprice",
        {"o_totalprice_rolling_median": 0.5, "o_totalprice_rolling_q": 0.25},
        7,
    )
    return out.df.select(
        "o_orderkey",
        "o_orderpriority",
        F.round("o_totalprice_rolling_median", 4).alias("med7"),
        F.round("o_totalprice_rolling_q", 4).alias("p25_7"),
    )


@query(
    "q81_sample_exact_n",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), '7')) LIMIT 100
    """,
)
def q81(spark, sf_dir):
    """polars ``sample(n=...)``: EXACTLY n rows, deterministic and
    engine-portable — order by md5(index, seed), take n. Catalyst plans
    TakeOrderedAndProject (per-partition top-n, merge), so no global sort
    materializes; md5 is bit-identical in Spark and DuckDB, which is what
    makes an exact-sample oracle possible at all."""
    _prep(spark)
    od = load_table(spark, sf_dir, "orders")
    ds = Dataset(od, index="o_orderkey")
    return ds.sample(n=100, seed=7).df.select("o_orderkey", "o_totalprice")


@query(
    "q82_interpolate_nulls",
    """
    WITH t AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 7 IN (2, 3) THEN NULL ELSE o_totalprice END AS val
      FROM orders),
    f AS (
      SELECT o_orderkey, o_orderpriority, val,
             CAST(o_orderkey AS DOUBLE) AS x,
             last_value(val IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN val IS NOT NULL THEN CAST(o_orderkey AS DOUBLE) END
                        IGNORE NULLS) OVER wp AS px,
             first_value(val IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN val IS NOT NULL THEN CAST(o_orderkey AS DOUBLE) END
                         IGNORE NULLS) OVER wn AS nx
      FROM t
      WINDOW wp AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wn AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT o_orderkey, o_orderpriority,
           CASE WHEN val IS NOT NULL THEN val
                ELSE pv + (nv - pv) * (x - px) / (nx - px) END AS val
    FROM f
    """,
)
def q82(spark, sf_dir):
    """polars ``interpolate_by(index)``: null gaps filled by linear
    interpolation against the index within each trace; leading/trailing
    nulls stay null. Pure window expressions (prev/next known value+index
    via ignorenulls frames) — no Python, one shuffle on the trace key."""
    _prep(spark)
    od = load_table(spark, sf_dir, "orders")
    sel = od.select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 7 == 2, F.lit(None))
        .when(F.col("o_orderkey") % 7 == 3, F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("val"),
    )
    ds = Dataset(sel, index="o_orderkey", id_vars=["o_orderpriority"])
    out = ds.interpolate_nulls("val")
    # no rounding: both engines evaluate the identical IEEE expression on
    # identical inputs, so the doubles are bit-equal — while round() at any
    # fixed precision DISAGREES between engines on the exact-decimal ties
    # interpolation produces (observed: ...8784375 at 6 dp)
    return out.df.select("o_orderkey", "o_orderpriority", "val")


@query(
    "q83_cut_bins",
    """
    SELECT CASE WHEN l_quantity <= 10 THEN '(-inf, 10.0]'
                WHEN l_quantity <= 25 THEN '(10.0, 25.0]'
                WHEN l_quantity <= 40 THEN '(25.0, 40.0]'
                ELSE '(40.0, inf]' END AS bin,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def q83(spark, sf_dir):
    """polars ``cut``: fixed-break binning as one map-only CASE chain
    (labels match polars' interval spelling), then a count per bin."""
    _prep(spark)
    ds = _lineitem_ds(spark, sf_dir)
    binned = ds.cut("l_quantity", [10, 25, 40], out_col="bin")
    return binned.df.groupBy("bin").agg(F.count("*").alias("n"))


@query(
    "q84_value_counts",
    """
    SELECT o_orderpriority, count(*) AS count FROM orders GROUP BY 1
    """,
)
def q84(spark, sf_dir):
    """polars ``value_counts``: frequency table of one column."""
    _prep(spark)
    od = load_table(spark, sf_dir, "orders")
    return Dataset(od, index="o_orderkey").value_counts("o_orderpriority")


@query(
    "q85_list_namespace",
    r"""
    WITH d AS (SELECT doc_id, trim(lower(text)) AS t FROM documents),
    tok AS (
      SELECT doc_id,
             CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(t, '\s+') END AS toks
      FROM d)
    SELECT doc_id,
           len(toks) AS n_toks,
           toks[1] AS first_tok,
           CAST(list_contains(toks, 'the') AS INT) AS has_the,
           len(list_filter(toks, x -> length(x) > 5)) AS n_long
    FROM tok
    """,
)
def q85(spark, sf_dir):
    """List namespace parity (polars ``.list.*`` → Spark array functions):
    size / element access / membership / lambda filter, all JVM-side
    expressions over the tokenized text."""
    _prep(spark)
    from polars_dataset_spark.functions.text import tokenize

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.try_element_at(toks, F.lit(1)).alias("first_tok"),
        F.array_contains(toks, "the").cast("int").alias("has_the"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
    )


@query(
    "q86_upsample_ffill",
    f"""
    WITH {_TRACES_SQL}),
    b AS (
      SELECT l_returnflag, l_linestatus, min(day) AS mn, max(day) AS mx
      FROM t GROUP BY 1, 2),
    g AS (
      SELECT l_returnflag, l_linestatus, unnest(range(mn, mx + 1)) AS day FROM b),
    j AS (
      SELECT g.l_returnflag, g.l_linestatus, g.day, t.revenue
      FROM g LEFT JOIN t USING (l_returnflag, l_linestatus, day))
    SELECT l_returnflag, l_linestatus, CAST(day AS DOUBLE) AS day,
           last_value(revenue IGNORE NULLS) OVER (
             PARTITION BY l_returnflag, l_linestatus ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue
    FROM j
    """,
)
def q86(spark, sf_dir):
    """polars ``upsample`` + ``fill_null(strategy='forward')``: per-trace
    daily grids generated distributedly (sequence+explode, no driver
    loop), missing days inserted as nulls, then forward-filled with an
    O(n) growing frame. Unrounded: both engines carry the same decimal-
    exact revenue doubles, and the fill only SELECTS existing values."""
    _prep(spark)
    traces = _daily_traces(spark, sf_dir)
    ds = Dataset(
        traces.withColumn("day", F.col("day").cast("double")),
        index="day",
        id_vars=["l_returnflag", "l_linestatus"],
    )
    out = ds.upsample(every=1.0).fill_forward("revenue")
    return out.df.select("l_returnflag", "l_linestatus", "day", "revenue")


@query(
    "q87_interval_join",
    f"""
    SELECT l.user_id,
           l.event_id AS l_event_id, r.event_id AS r_event_id,
           strftime(l.ts, '{TS_FMT_DUCK}') AS l_ts,
           strftime(r.ts, '{TS_FMT_DUCK}') AS r_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'view' AND r.event_type = 'purchase'
     AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 30 MINUTE
    """,
)
def q87(spark, sf_dir):
    """Event-correlation interval join (view→purchase attribution within
    30 min per user). ONE definition serves batch and stream: on streams
    both sides carry watermarks and Spark bounds the join state to the
    interval (see test_interval_join_stream_matches_batch); in batch it
    is this equi-join + range predicate."""
    _prep(spark)
    from polars_dataset_spark.streaming import interval_join

    ev = load_table(spark, sf_dir, "events")
    out = interval_join(ev, ev, max_delay="30 minutes")
    return out.select(
        "user_id",
        "l_event_id",
        "r_event_id",
        F.date_format("l_ts", TS_FMT_SPARK).alias("l_ts"),
        F.date_format("r_ts", TS_FMT_SPARK).alias("r_ts"),
    )


@query(
    "q88_pct_change",
    f"""
    SELECT l_orderkey, l_linenumber,
           round(l_quantity / lag(l_quantity) OVER (
             PARTITION BY l_returnflag, l_linestatus {_TRACE_ORDER}) - 1, 6) AS qty_pct
    FROM lineitem
    """,
)
def q88(spark, sf_dir):
    """polars ``pct_change`` per trace: x/lag(x) − 1; null at trace
    starts. One window, tie-safe composite order."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy(*_TRACE_ORDER_COLS)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / F.lag("l_quantity", 1).over(w) - 1, 6).alias("qty_pct"),
    )


@query(
    "q89_decontamination",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, CASE WHEN len(toks) >= 8
        THEN list_distinct(list_transform(range(1, len(toks) - 6),
                                          i -> array_to_string(toks[i:i+7], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS grams
      FROM tok),
    bg AS (SELECT DISTINCT unnest(grams) AS g FROM sh WHERE doc_id < 25),
    dg AS (SELECT doc_id, unnest(grams) AS g FROM sh WHERE doc_id >= 25),
    hit AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (g))
    SELECT s.doc_id,
           CAST(EXISTS (SELECT 1 FROM hit WHERE hit.doc_id = s.doc_id) AS INT)
             AS contaminated
    FROM sh s WHERE s.doc_id >= 25
    """,
)
def q89(spark, sf_dir):
    """Benchmark decontamination (train/test-leakage guard): flag corpus
    docs sharing any token 8-gram with a benchmark set (here: doc_id <
    25 stands in for the benchmark). The benchmark's distinct n-grams
    broadcast; the corpus side is map-only explode + broadcast hash join
    — no corpus-sized shuffle, no pairwise comparison."""
    _prep(spark)
    from polars_dataset_spark.functions import contamination_flags

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 25)
    corpus = docs.filter(F.col("doc_id") >= 25)
    return contamination_flags(corpus, bench, n=8).select("doc_id", "contaminated")


@query(
    "q90_repetition_stats",
    r"""
    WITH d AS (
      SELECT doc_id, trim(lower(text)) AS t FROM documents),
    tok AS (
      SELECT doc_id,
             CASE WHEN t = '' THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(t, '\s+') END AS toks
      FROM d),
    dupf AS (
      SELECT doc_id,
             CASE WHEN len(toks) > 0
                  THEN round(1.0 - len(list_distinct(toks))::DOUBLE / len(toks), 6)
                  ELSE 0.0 END AS dup_token_frac
      FROM tok),
    bg AS (
      SELECT doc_id, unnest(list_transform(range(1, len(toks)),
                                           i -> array_to_string(toks[i:i+1], ' '))) AS g
      FROM tok WHERE len(toks) >= 2),
    pg AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
    top AS (SELECT doc_id, round(max(c)::DOUBLE / sum(c), 6) AS top_bigram_frac
            FROM pg GROUP BY doc_id)
    SELECT dupf.doc_id, dupf.dup_token_frac,
           coalesce(top.top_bigram_frac, 0.0) AS top_bigram_frac
    FROM dupf LEFT JOIN top USING (doc_id)
    """,
)
def q90(spark, sf_dir):
    """Repetition-based quality filters (Gopher-style): duplicate-token
    fraction (pure expression) and most-frequent-bigram fraction (explode
    + two partial-aggregated hash aggs — cost ∝ token count). The classic
    boilerplate/spam signals a pretraining filter needs beyond n-gram
    dedup."""
    _prep(spark)
    from polars_dataset_spark.functions import with_repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return with_repetition_stats(docs).select(
        "doc_id",
        F.round("dup_token_frac", 6).alias("dup_token_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


@query(
    "q91_temperature_mix",
    """
    WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c),
    w AS (SELECT source, n, pow(CAST(n AS DOUBLE), 0.7) AS wt FROM c),
    ws AS (SELECT sum(wt) AS wsum FROM w),
    r AS (
      SELECT w.source,
             least(1.0, (0.5 * t.total) * w.wt / ws.wsum / w.n) AS rate,
             printf('%015x',
               CAST(trunc(least(1.0, (0.5 * t.total) * w.wt / ws.wsum / w.n)
                          * 1152921504606846976.0) AS BIGINT)) AS thr
      FROM w, t, ws)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE r.rate >= 1.0
       OR substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15) < r.thr
    """,
)
def q91(spark, sf_dir):
    """Temperature-weighted source mixing (the standard pretraining
    recipe: keep-rate ∝ count^T / count, T=0.7 up-weighting small
    sources, scaled so overall keep ≈ 50%). One tiny count aggregation +
    a map-only deterministic id-hash filter; the oracle recomputes the
    exact rates and replays the same md5-threshold in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import temperature_mix

    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mix(docs, "doc_id", "source", temperature=0.7, target_fraction=0.5)
    return out.select("doc_id", "source")


@query(
    "q92_token_budget",
    r"""
    WITH t AS (
      SELECT doc_id,
             len(regexp_extract_all(text,
               '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS UNBOUNDED PRECEDING) AS cum
      FROM t)
    SELECT doc_id, n_tokens FROM c WHERE cum <= 20000
    """,
)
def q92(spark, sf_dir):
    """Deterministic global token-budget truncation: docs taken in
    id-hash priority order until the cumulative BPE-ish token count
    would pass 20k — exact, order/retry-stable (md5 is engine-portable,
    so even the selected SET is oracle-checked)."""
    _prep(spark)
    from polars_dataset_spark.functions import take_until_token_budget, with_token_count

    docs = load_table(spark, sf_dir, "documents")
    counted = with_token_count(docs, mode="bpe")
    out = take_until_token_budget(counted, 20_000, "n_tokens", "doc_id")
    return out.select("doc_id", "n_tokens")


# Shared DuckDB tokenization CTE fragment (parity with functions.text
# tokenize(): ASCII-\s+ split of space-trimmed lowered text; empty text →
# no token rows, matching explode of an empty array).
_TOK_CTE = r"""
    d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(string_split(norm, ' ')) AS token
      FROM d WHERE norm <> '')
"""


@query(
    "q93_chunk_documents",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    t AS (
      SELECT doc_id,
             CASE WHEN norm = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split(norm, ' ') END AS toks
      FROM d),
    m AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 64 THEN 1
                  ELSE (len(toks) - 64 + 47) // 48 + 1 END AS nc
      FROM t)
    SELECT doc_id, unnest(range(0, nc)) AS chunk_idx,
           array_to_string(toks[unnest(range(0, nc))*48+1
                                : least(unnest(range(0, nc))*48+64, n)], ' ') AS chunk_text,
           len(toks[unnest(range(0, nc))*48+1
                    : least(unnest(range(0, nc))*48+64, n)]) AS n_tokens
    FROM m
    """,
)
def q93(spark, sf_dir):
    """Context-window chunking: overlapping 64-token windows, stride 48
    (functions/corpus.py chunk_documents) — the segmentation step of a
    pretraining pipeline. Map-only explode; the oracle replays the exact
    window arithmetic over DuckDB list slices."""
    _prep(spark)
    from polars_dataset_spark.functions import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, max_tokens=64, overlap=16)


@query(
    "q94_vocab_oov",
    rf"""
    WITH {_TOK_CTE},
    v AS (
      SELECT token FROM tok GROUP BY token
      ORDER BY count(*) DESC, token LIMIT 20)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(CASE WHEN token IN (SELECT token FROM v) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN token IN (SELECT token FROM v) THEN 0 ELSE 1 END)::DOUBLE
                 / count(*), 6) AS oov_frac
    FROM tok GROUP BY doc_id
    """,
)
def q94(spark, sf_dir):
    """Vocabulary build (top-20 tokens by corpus frequency, lexicographic
    ties) + per-document out-of-vocabulary accounting. The vocab is
    broadcast against the token stream — one aggregation + TakeOrdered
    for the build, map-side join + per-doc agg for the accounting."""
    _prep(spark)
    from polars_dataset_spark.functions import build_vocab, with_oov_rate

    docs = load_table(spark, sf_dir, "documents")
    vocab = build_vocab(docs, top_v=20)
    return with_oov_rate(docs, vocab)


@query(
    "q95_surprisal",
    rf"""
    WITH {_TOK_CTE},
    f AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM f),
    b AS (SELECT token,
                 CAST(round(log2(total::DOUBLE / cnt), 7) AS DECIMAL(20,7)) AS bits
          FROM f, tot)
    SELECT doc_id, count(*) AS n_tokens,
           round(CAST(sum(bits) AS DOUBLE) / count(*), 4) AS surprisal_bits
    FROM tok JOIN b USING (token)
    GROUP BY doc_id
    """,
)
def q95(spark, sf_dir):
    """Unigram-LM surprisal per document (mean -log2 p(token) under the
    corpus unigram distribution) — the classic cheap perplexity-style
    quality signal. Per-token bits rounded to 7 and summed as DECIMAL so
    the mean is partitioning- and engine-stable."""
    _prep(spark)
    from polars_dataset_spark.functions import with_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return with_surprisal(docs)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\b\d{3}-\d{4}\b"


@query(
    "q96_pii_redaction",
    rf"""
    WITH s AS (
      SELECT doc_id,
             'contact user' || doc_id || '@example.com or 10.0.'
               || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
               || ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' ' || text AS t
      FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_IP}', '<IP>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g') AS text_redacted,
           len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails,
           len(regexp_extract_all(t, '{_PII_IP}')) AS n_ips,
           len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones
    FROM s
    """,
)
def q96(spark, sf_dir):
    """PII redaction (emails → <EMAIL>, IPv4 → <IP>, phone forms →
    <PHONE>) with per-type match counts. The fixture corpus carries no
    PII, so both sides deterministically synthesize an email, IP, and
    phone from doc_id before scrubbing — the oracle checks the full
    redacted text, not just the counts. RE2-and-Java-compatible
    patterns; map-only codegen'd regexes."""
    _prep(spark)
    from polars_dataset_spark.functions import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.lit("contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" "),
            F.col("text"),
        ).alias("text"),
    )
    return redact_pii(synth).select(
        "doc_id", "text_redacted", "n_emails", "n_ips", "n_phones"
    )


@query(
    "q97_tfidf_topk",
    rf"""
    WITH {_TOK_CTE},
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT token, count(*) AS df_t FROM tf GROUP BY token),
    nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf)
    SELECT doc_id, token, tf, df_t,
           round(tf * ln(n::DOUBLE / df_t), 6) AS tfidf,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY tf DESC, df_t, token) AS rank
    FROM tf JOIN dfreq USING (token), nd
    QUALIFY rank <= 3
    """,
)
def q97(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf. Rank order is
    INTEGER-deterministic (tf desc, doc-frequency asc, token asc); the
    float tf-idf rides along as a value column but never decides order,
    so the result replays exactly on any engine."""
    _prep(spark)
    from polars_dataset_spark.functions import tfidf_top_terms

    docs = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, k=3)


@query(
    "q98_chunk_dedup",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    t AS (
      SELECT doc_id,
             CASE WHEN norm = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split(norm, ' ') END AS toks
      FROM d),
    m AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) <= 32 THEN 1
                  ELSE (len(toks) - 32 + 23) // 24 + 1 END AS nc
      FROM t),
    c AS (
      SELECT doc_id, unnest(range(0, nc)) AS chunk_idx,
             array_to_string(toks[unnest(range(0, nc))*24+1
                                  : least(unnest(range(0, nc))*24+32, n)], ' ') AS chunk_text,
             len(toks[unnest(range(0, nc))*24+1
                      : least(unnest(range(0, nc))*24+32, n)]) AS n_tokens
      FROM m)
    SELECT doc_id, chunk_idx, n_tokens
    FROM (SELECT *, row_number() OVER (PARTITION BY chunk_text
                                       ORDER BY doc_id, chunk_idx) AS rn FROM c)
    WHERE rn = 1
    """,
)
def q98(spark, sf_dir):
    """Passage-level exact dedup (C4/RefinedWeb-style): 32-token windows
    with stride 24, keep the first occurrence of every distinct chunk
    text — chunking composed with a hash-partitioned keep-first window."""
    _prep(spark)
    from polars_dataset_spark.functions import chunk_documents, dedup_chunks

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, max_tokens=32, overlap=8)
    return dedup_chunks(chunks).select("doc_id", "chunk_idx", "n_tokens")


@query(
    "q99_outer_join",
    """
    WITH ship AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY 1),
    ord AS (
      SELECT CAST(o_orderdate AS DATE) AS d, count(*) AS n_orders
      FROM orders GROUP BY 1)
    SELECT strftime(coalesce(ship.d, ord.d), '%Y-%m-%d') AS day,
           coalesce(revenue, 0.0)  AS revenue,
           coalesce(n_orders, 0)   AS n_orders
    FROM ship FULL OUTER JOIN ord ON ship.d = ord.d
    """,
)
def q99(spark, sf_dir):
    """FULL OUTER join of two aggregates with different key coverage
    (ship-date revenue vs order-date counts): exercises the outer-join
    delegation (`how="full"` → full_outer) plus null-coalescing of the
    join key itself. Both sides pre-aggregate before the join, so the
    shuffled row count is days, not line items."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ship = Dataset(
        li.groupBy(F.to_date("l_shipdate").alias("d")).agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("revenue")
        ),
        index="d",
    )
    ord_ = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count("*").alias("n_orders")
    ).withColumnRenamed("d", "d2")
    joined = ship.join(Dataset(ord_, index="d2"), left_on="d", right_on="d2", how="full")
    return joined.fetch(
        F.date_format(F.coalesce("d", "d2"), TS_FMT_SPARK[:10]).alias("day"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
    )


@query(
    "q100_corr_matrix",
    """
    WITH pairs AS (
      SELECT 'l_quantity' AS col_x, 'l_quantity' AS col_y, corr(l_quantity, l_quantity) AS c FROM lineitem
      UNION ALL SELECT 'l_quantity', 'l_extendedprice', corr(l_quantity, l_extendedprice) FROM lineitem
      UNION ALL SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount) FROM lineitem
      UNION ALL SELECT 'l_extendedprice', 'l_extendedprice', corr(l_extendedprice, l_extendedprice) FROM lineitem
      UNION ALL SELECT 'l_extendedprice', 'l_discount', corr(l_extendedprice, l_discount) FROM lineitem
      UNION ALL SELECT 'l_discount', 'l_discount', corr(l_discount, l_discount) FROM lineitem)
    SELECT col_x, col_y, round(c, 6) AS corr FROM pairs
    UNION ALL
    SELECT col_y, col_x, round(c, 6) AS corr FROM pairs WHERE col_x <> col_y
    """,
)
def q100(spark, sf_dir):
    """Pairwise Pearson correlation matrix in ONE aggregate pass (all
    co-moment accumulators run together — no per-pair jobs). Tidy long
    output, mirrored across the diagonal like the SQL oracle."""
    _prep(spark)
    ds = Dataset(
        load_table(spark, sf_dir, "lineitem"),
        index="l_shipdate",
        id_vars=["l_returnflag", "l_linestatus"],
    )
    out = ds.corr_matrix("l_quantity", "l_extendedprice", "l_discount")
    return out.select("col_x", "col_y", F.round("corr", 6).alias("corr"))


@query(
    "q101_to_dummies",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END AS l_returnflag_A,
           CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END AS l_returnflag_N,
           CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS l_returnflag_R,
           CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS l_linestatus_F,
           CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END AS l_linestatus_O
    FROM lineitem
    """,
)
def q101(spark, sf_dir):
    """One-hot encoding (polars ``to_dummies``): the TPC-H flag/status
    category sets are part of the spec, so the query PINS them
    (``categories=``) — the output schema no longer depends on which
    values a fixture subset happens to contain (the sf10 keyed-subset
    sweep exclusion, VERDICT r10 #6), and the distinct scan is skipped:
    the whole query is one map-only codegen projection, zero
    exchanges."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"
    )
    ds = Dataset(li, index="l_linenumber", id_vars=["l_orderkey"])
    out = ds.to_dummies(
        "l_returnflag",
        "l_linestatus",
        categories={"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]},
    )
    return out.df.select(
        "l_orderkey", "l_linenumber",
        *[F.col(c).cast("int").alias(c) for c in out.columns if "_" in c and c.startswith("l_")
          and c not in ("l_orderkey", "l_linenumber")],
    )


@query(
    "q102_dup_flags",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents)
    SELECT doc_id,
           count(*) OVER (PARTITION BY norm) > 1 AS is_duplicated,
           row_number() OVER (PARTITION BY norm ORDER BY doc_id) = 1 AS is_first_distinct
    FROM d
    """,
)
def q102(spark, sf_dir):
    """Row-level duplicate flags (polars ``is_duplicated`` /
    ``is_first_distinct``) over normalized document text: one count
    window + one row_number window on the same partitioning — a single
    hash shuffle, no self-join."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("norm"),
    )
    ds = Dataset(docs, index="doc_id")
    out = ds.is_duplicated(subset=["norm"]).is_first_distinct(subset=["norm"])
    return out.df.select("doc_id", "is_duplicated", "is_first_distinct")


@query(
    "q103_gather_every",
    """
    SELECT event_id, event_type, value
    FROM (SELECT event_id, event_type, value,
                 row_number() OVER (ORDER BY event_id) - 1 AS rn
          FROM events)
    WHERE rn >= 7 AND (rn - 7) % 1000 = 0
    """,
)
def q103(spark, sf_dir):
    """Positional every-n-th-row selection (polars ``gather_every``)
    without a single-partition global window: two-pass distributed
    prefix sum (range partition → per-partition counts → offset map),
    the same machinery as global sequence packing."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ds = Dataset(ev, index="event_id")
    return ds.gather_every(1000, offset=7).df.select("event_id", "event_type", "value")


@query(
    "q104_peaks",
    """
    WITH flagged AS (
      SELECT user_id,
             value > coalesce(lag(value)  OVER w, '-infinity'::DOUBLE) AND
             value > coalesce(lead(value) OVER w, '-infinity'::DOUBLE) AS pk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
    SELECT user_id, count(*) FILTER (WHERE pk) AS n_peaks
    FROM flagged GROUP BY user_id
    """,
)
def q104(spark, sf_dir):
    """Local-peak detection per user series (polars ``peak_max``) then a
    per-user peak count: lag/lead window arithmetic in codegen, one
    shuffle on the trace key shared by the window and the aggregate."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    ds = Dataset(ev, index="event_id", id_vars=["user_id"])
    out = ds.peak_max("value")
    return (
        out.df.groupBy("user_id")
        .agg(F.count(F.when(F.col("value_peak_max"), 1)).alias("n_peaks"))
    )


@query(
    "q105_approx_distinct",
    """
    SELECT event_type, count(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def q105(spark, sf_dir):
    """HyperLogLog++ approximate distinct count per group — the 100-TB
    cardinality path (mergeable sketch, one pass, no distinct shuffle of
    raw values). Like q78, the oracle checks a GUARANTEE, not the
    engine-specific estimate: the estimate must land within the
    configured 5% relative error of the exact count (checked on the
    Spark side against Spark's own exact count; the oracle recomputes
    the exact count and asserts the flag)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    est = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("within_5pct"),
        )
    )


@query(
    "q106_horizontal",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice + l_discount + l_tax, 6)      AS row_sum,
           round((l_extendedprice + l_discount + l_tax) / 3, 6) AS row_mean,
           least(l_extendedprice, l_discount, l_tax)            AS row_min,
           greatest(l_extendedprice, l_discount, l_tax)         AS row_max
    FROM lineitem
    """,
)
def q106(spark, sf_dir):
    """Row-wise (horizontal) aggregates — polars ``sum_horizontal`` /
    ``mean_horizontal`` / ``min_horizontal`` / ``max_horizontal``. Pure
    map-only projection, no shuffle; the whole query is one codegen'd
    scan stage."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )
    ds = Dataset(li, index="l_linenumber", id_vars=["l_orderkey"])
    cols = ("l_extendedprice", "l_discount", "l_tax")
    out = (
        ds.sum_horizontal(*cols, out_col="row_sum")
        .mean_horizontal(*cols, out_col="row_mean")
        .min_horizontal(*cols, out_col="row_min")
        .max_horizontal(*cols, out_col="row_max")
    )
    return out.fetch(
        "l_orderkey", "l_linenumber",
        F.round("row_sum", 6).alias("row_sum"),
        F.round("row_mean", 6).alias("row_mean"),
        F.col("row_min").alias("row_min"),
        F.col("row_max").alias("row_max"),
    )


@query(
    "q107_sliding_windows",
    f"""
    WITH e AS (
      -- floor, not ::BIGINT (which ROUNDS): events carry fractional seconds
      SELECT ts, value, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
    x AS (
      SELECT sec, value,
             unnest(range((sec - 1800) // 900 + 1, sec // 900 + 1)) AS k
      FROM e)
    SELECT strftime(to_timestamp(k * 900), '{TS_FMT_DUCK}') AS window_start,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
    FROM x GROUP BY k
    """,
)
def q107(spark, sf_dir):
    """SLIDING event-time windows (polars ``group_by_dynamic`` with
    ``period > every``): 30-minute windows every 15 minutes, each event
    counted in the 2 windows covering it. Spark's native ``F.window``
    (window=period, slide=every) — the same Expand-based operator the
    streaming path uses, one shuffle on the window key. Decimal
    summation keeps the money total order-independent (q24 policy)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    ds = Dataset(ev.select("ts", "value"), index="ts")
    out = ds.group_by_dynamic("15 minutes", period="30 minutes").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("sum_value"),
    )
    return out.select(
        F.date_format("index_start", TS_FMT_SPARK).alias("window_start"),
        "n_events",
        "sum_value",
    )


@query(
    "q108_packing_report",
    """
    WITH p AS (
      SELECT lang, n_chars,
             (sum(n_chars) OVER w - n_chars) // 4096 AS bin
      FROM documents
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    b AS (
      SELECT lang, bin, sum(n_chars) AS toks, count(*) AS n_docs
      FROM p GROUP BY lang, bin)
    SELECT lang, count(*) AS n_bins,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           round(avg(least(toks, 4096)) / 4096.0, 6) AS mean_fill,
           CAST(sum(CASE WHEN toks >= 4096 THEN 1 ELSE 0 END) AS BIGINT) AS n_full
    FROM b GROUP BY lang
    """,
)
def q108(spark, sf_dir):
    """Packing-efficiency report over the q68 layout: per stream, how
    many context windows, their mean fill rate and how many are full —
    the observability query a batch-size/budget decision needs. Composes
    pack_sequences with two aggregations; a doc straddling a boundary
    counts toward the window it STARTS in, so per-bin tokens can exceed
    the budget and fill is capped at 1 (matching the SQL replay)."""
    _prep(spark)
    from polars_dataset_spark.functions import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(
        docs, budget=4096, tokens_col="n_chars", order_col="doc_id",
        stream_cols=["lang"],
    )
    bins = packed.groupBy("lang", "bin").agg(
        F.sum("n_chars").alias("toks"), F.count("*").alias("n_docs")
    )
    return bins.groupBy("lang").agg(
        F.count("*").alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg(F.least(F.col("toks"), F.lit(4096))) / 4096.0, 6).alias("mean_fill"),
        F.sum(F.when(F.col("toks") >= 4096, 1).otherwise(0)).alias("n_full"),
    )


@query(
    "q109_dup_cluster_sizes",
    r"""
    WITH d AS (
      SELECT regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    c AS (SELECT norm, count(*) AS sz FROM d GROUP BY norm)
    SELECT sz AS cluster_size, count(*) AS n_clusters
    FROM c GROUP BY sz
    """,
)
def q109(spark, sf_dir):
    """Duplicate-cluster size histogram — the dedup observability query
    (how much of the corpus is exact-duplicated, and in what cluster
    sizes). Two hash aggregations, the second over at most |distinct
    texts| rows."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    clusters = docs.select(
        F.regexp_replace(F.trim(F.lower("text")), r"\s+", " ").alias("norm")
    ).groupBy("norm").agg(F.count("*").alias("cluster_size"))
    return clusters.groupBy("cluster_size").agg(F.count("*").alias("n_clusters"))


@query(
    "q110_bitset_semi_join",
    """
    SELECT l.l_orderkey, count(*) AS n_lines,
           round(sum(l.l_extendedprice), 2) AS revenue
    FROM lineitem l
    WHERE l.l_orderkey IN (
      SELECT o_orderkey FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000)
    GROUP BY l.l_orderkey
    """,
)
def q110(spark, sf_dir):
    """Semi-join reduction (operators/bloom.py): the fact side is
    pre-filtered through a distributed bitset of the build keys BEFORE
    its join shuffle — built with one aggregation, broadcast as ≤ m/64
    bitset words, probed map-side. The oracle is the PLAIN semi join:
    the bitset only prunes, results are identical by construction."""
    _prep(spark)
    from polars_dataset_spark.operators import bitset_prefilter_join

    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 250000))
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    kept = bitset_prefilter_join(li, urgent, on="l_orderkey", how="left_semi")
    return kept.groupBy("l_orderkey").agg(
        F.count("*").alias("n_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@query(
    "q111_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT 'view' AS step, (SELECT count(*) FROM v) AS n_users
    UNION ALL SELECT 'click', (SELECT count(*) FROM c)
    UNION ALL SELECT 'purchase', (SELECT count(*) FROM p)
    """,
)
def q111(spark, sf_dir):
    """Ordered funnel (view → click AFTER view → purchase AFTER click):
    sequence matching as k filtered min-aggregates + (k−1) user-key
    joins of per-user scalars — no per-user event sort, no session
    window; each stage's frame shrinks so AQE promotes the later joins
    to broadcast."""
    _prep(spark)
    from polars_dataset_spark.functions import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(ev, ["view", "click", "purchase"])


@query(
    "q112_cohort_retention",
    f"""
    WITH c AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id),
    a AS (SELECT user_id, date_trunc('week', ts) AS p FROM events)
    SELECT strftime(cohort, '{TS_FMT_DUCK}') AS cohort,
           CAST(round((epoch(p) - epoch(cohort)) / 604800) AS BIGINT) AS period_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN c USING (user_id)
    GROUP BY cohort, period_offset
    """,
)
def q112(spark, sf_dir):
    """Weekly cohort retention: cohort = week of each user's first
    event; cells count distinct users active N weeks later. Two hash
    aggregations + one user-key join of per-user scalars — the standard
    retention matrix without windows or per-user sorts."""
    _prep(spark)
    from polars_dataset_spark.functions import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    out = cohort_retention(ev, period="week")
    return out.select(
        F.date_format("cohort", TS_FMT_SPARK).alias("cohort"),
        "period_offset",
        "n_users",
    )


@query(
    "q113_merge_upsert",
    """
    WITH updates AS (
      SELECT o_orderkey, 'MERGED' AS o_orderpriority,
             CAST(round(CAST(o_totalprice AS DECIMAL(28,2)) * CAST(1.10 AS DECIMAL(3,2)), 2) AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0),
    inserts AS (
      SELECT -1 AS o_orderkey, 'NEW' AS o_orderpriority, 0.0 AS o_totalprice),
    merged AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
      UNION ALL SELECT * FROM updates
      UNION ALL SELECT * FROM inserts)
    SELECT o_orderpriority, count(*) AS n,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderpriority
    """,
)
def q113(spark, sf_dir):
    """MERGE INTO semantics on plain DataFrames (operators/merge.py):
    updates replace colliding keys, inserts append — one key anti-join
    (broadcast for small update sets) plus a union. The aggregate
    proves replaced rows are gone and new rows landed."""
    _prep(spark)
    from polars_dataset_spark.operators import merge_upsert

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    updates = (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            F.lit("MERGED").alias("o_orderpriority"),
            # 2-dp money arithmetic in DECIMAL end-to-end: double
            # round(x*1.1, 2) lands on true .xx5 halves whose
            # shortest-vs-binary rounding splits between engines at
            # sf10 row counts (r9 sweep class)
            F.round(
                F.col("o_totalprice").cast("decimal(28,2)")
                * F.lit(__import__("decimal").Decimal("1.10")),
                2,
            ).cast("double").alias("o_totalprice"),
        )
    )
    inserts = o.sparkSession.createDataFrame(
        [(-1, "NEW", 0.0)], "o_orderkey long, o_orderpriority string, o_totalprice double"
    )
    merged = merge_upsert(o, updates.unionByName(inserts), on="o_orderkey")
    return merged.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
        .cast("double")
        .alias("total"),
    )


@query(
    "q114_snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders),
    new AS (
      SELECT o_orderkey, o_orderpriority,
             CASE WHEN o_orderkey % 50 = 0 THEN round(o_totalprice + 1, 2)
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL SELECT -5, 'NEWROW', 1.0)
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           coalesce(new.o_orderpriority, old.o_orderpriority) AS o_orderpriority,
           coalesce(new.o_totalprice, old.o_totalprice) AS o_totalprice,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type
    FROM old FULL OUTER JOIN new USING (o_orderkey)
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_totalprice <> new.o_totalprice
       OR old.o_orderpriority <> new.o_orderpriority
    """,
)
def q114(spark, sf_dir):
    """Change-data-capture between snapshots (operators/merge.py):
    full-outer key join + null-safe struct comparison tags every row
    insert/delete/update. The synthetic 'new' snapshot drops keys
    divisible by 7, bumps prices on keys divisible by 50, and adds one
    row — the diff must recover exactly those changes."""
    _prep(spark)
    from polars_dataset_spark.operators import snapshot_diff

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    new = (
        o.filter(F.col("o_orderkey") % 7 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 50 == 0, F.round(F.col("o_totalprice") + 1, 2)
            ).otherwise(F.col("o_totalprice")),
        )
        .unionByName(
            o.sparkSession.createDataFrame(
                [(-5, "NEWROW", 1.0)],
                "o_orderkey long, o_orderpriority string, o_totalprice double",
            )
        )
    )
    return snapshot_diff(o, new, on="o_orderkey")


@query(
    "q115_weighted_sample",
    """
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             ln(greatest(('0x' || substring(md5(cast(doc_id AS VARCHAR)), 1, 15))::BIGINT
                         / 1152921504606846976.0, 1e-18)) / n_chars AS wkey
      FROM documents WHERE n_chars > 0)
    ORDER BY wkey DESC, doc_id ASC LIMIT 50
    """,
)
def q115(spark, sf_dir):
    """Weighted sample without replacement (Efraimidis–Spirakis A-Res,
    weight = document length): the uniform draw is md5-derived, so the
    SELECTED SET is deterministic, topology-independent, and replayable
    by the oracle — both engines pick the same 50 documents. Plans as
    TakeOrderedAndProject (per-partition heaps, no full sort)."""
    _prep(spark)
    from polars_dataset_spark.functions import weighted_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return weighted_sample(docs, k=50, weight_col="n_chars", id_col="doc_id")


@query(
    "q116_group_quantiles",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def q116(spark, sf_dir):
    """Per-group exact percentile bands (p50/p95/p99 of event value per
    type) — the SLO/latency-report shape. One hash aggregation; exact
    interpolated percentiles for oracle parity, with q78's
    percentile_approx as the documented sketch path at 100 TB."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@query(
    "q117_zscore_outliers",
    """
    WITH s AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) FILTER (WHERE abs((e.value - s.mu) / s.sigma) > 3) AS n_outliers,
           count(*) AS n_events
    FROM events e JOIN s USING (event_type)
    GROUP BY e.event_type
    """,
)
def q117(spark, sf_dir):
    """Per-group z-score outlier screening: one aggregate for the group
    moments (tiny — one row per group, broadcast back), one map-side
    scoring pass, one count aggregate. No window over the raw events;
    the moments frame is the only shuffled data besides the group
    keys."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    scored = ev.join(F.broadcast(stats), "event_type")
    return scored.groupBy("event_type").agg(
        F.count(
            F.when(F.abs((F.col("value") - F.col("mu")) / F.col("sigma")) > 3, 1)
        ).alias("n_outliers"),
        F.count("*").alias("n_events"),
    )


@query(
    "q118_quality_audit",
    """
    SELECT count(*) AS n_rows,
           count(*) FILTER (WHERE text IS NULL OR trim(text) = '') AS empty_text,
           count(*) FILTER (WHERE n_chars IS NULL OR n_chars < 0) AS bad_n_chars,
           count(*) FILTER (WHERE n_chars IS NOT NULL AND text IS NOT NULL
                              AND n_chars <> length(text)) AS n_chars_mismatch,
           count(*) FILTER (WHERE lang NOT IN ('en','de','zh','fr','es')) AS unknown_lang,
           count(*) - count(DISTINCT doc_id) AS dup_ids
    FROM documents
    """,
)
def q118(spark, sf_dir):
    """Data-quality audit in ONE aggregate pass (plus the distinct-id
    accumulator): null/empty checks, range checks, a cross-column
    consistency check (stored n_chars vs actual length) and key
    uniqueness — the great-expectations-style contract a 100 TB ingest
    runs before anything else, with no second scan per rule."""
    _prep(spark)
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count("*").alias("n_rows"),
        F.count(
            F.when(F.col("text").isNull() | (F.trim("text") == ""), 1)
        ).alias("empty_text"),
        F.count(
            F.when(F.col("n_chars").isNull() | (F.col("n_chars") < 0), 1)
        ).alias("bad_n_chars"),
        F.count(
            F.when(
                F.col("n_chars").isNotNull()
                & F.col("text").isNotNull()
                & (F.col("n_chars") != F.length("text")),
                1,
            )
        ).alias("n_chars_mismatch"),
        F.count(
            F.when(~F.col("lang").isin("en", "de", "zh", "fr", "es"), 1)
        ).alias("unknown_lang"),
        (F.count("*") - F.countDistinct("doc_id")).alias("dup_ids"),
    )


@query(
    "q119_savgol_smooth",
    f"""
    WITH
    t AS (
      SELECT l_returnflag, l_linestatus,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
      FROM lineitem GROUP BY 1, 2, 3),
    o AS (
      SELECT l_returnflag, l_linestatus, day, revenue,
             row_number() OVER w AS pos, count(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n
      FROM t WINDOW w AS (PARTITION BY l_returnflag, l_linestatus ORDER BY day))
    SELECT l_returnflag, l_linestatus, day,
           round((-2*lag(revenue, 3) OVER w2 + 3*lag(revenue, 2) OVER w2
                  + 6*lag(revenue, 1) OVER w2 + 7*revenue
                  + 6*lead(revenue, 1) OVER w2 + 3*lead(revenue, 2) OVER w2
                  - 2*lead(revenue, 3) OVER w2) / 21.0, 4) AS smooth_rev
    FROM o
    WINDOW w2 AS (PARTITION BY l_returnflag, l_linestatus ORDER BY day)
    QUALIFY pos > 3 AND pos <= n - 3
    """,
)
def q119(spark, sf_dir):
    """Savitzky–Golay smoothing (window 7, order 2) of the daily revenue
    traces — the spectroscopy smoothing staple as a grouped-map numpy
    kernel, same single-shuffle profile as regrid. The oracle replays
    the INTERIOR convolution with the exact (-2,3,6,7,6,3,-2)/21
    weights via lag/lead; edge rows (terminal-window polynomial fits)
    are filtered on both sides, and pytest pins their semantics."""
    _prep(spark)
    traces = _daily_traces(spark, sf_dir)
    ds = Dataset(traces, index="day", id_vars=["l_returnflag", "l_linestatus"])
    sm = ds.smooth("revenue", window=7, polyorder=2).df
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy("day")
    pos = F.row_number().over(w)
    n = F.count("*").over(Window.partitionBy("l_returnflag", "l_linestatus"))
    return (
        sm.withColumn("__pos", pos)
        .withColumn("__n", n)
        .filter((F.col("__pos") > 3) & (F.col("__pos") <= F.col("__n") - 3))
        .select(
            "l_returnflag",
            "l_linestatus",
            "day",
            F.round("revenue_smooth", 4).alias("smooth_rev"),
        )
    )


@query(
    "q120_detrend",
    """
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS rev
      FROM lineitem GROUP BY 1, 2, 3),
    u AS (
      SELECT l_returnflag, l_linestatus, day,
             CAST(rev AS DOUBLE) AS revenue,
             CAST(rev * 1000000 AS HUGEINT) AS rev_u
      FROM t),
    fit AS (
      SELECT l_returnflag, l_linestatus,
             count(*) AS n, sum(day) AS sx, sum(day*day) AS sxx,
             sum(rev_u) AS sy, sum(day*rev_u) AS sxy
      FROM u GROUP BY 1, 2),
    sl AS (
      SELECT l_returnflag, l_linestatus,
             CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
               / 1000000.0 AS s,
             CAST(sy*sxx - sx*sxy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)
               / 1000000.0 AS b
      FROM fit)
    SELECT u.l_returnflag, u.l_linestatus, u.day,
           round(u.revenue - (sl.s * u.day + sl.b), 4) AS resid
    FROM u JOIN sl USING (l_returnflag, l_linestatus)
    """,
)
def q120(spark, sf_dir):
    """Per-trace linear detrend (Dataset.detrend), single-pass fit
    broadcast back, map-side subtract. The trace measure is kept as
    DECIMAL so detrend takes its EXACT-moments path (r9): the OLS fit is
    computed from exact integer/decimal sums and is bit-deterministic
    under any partitioning — the r9 sf1 sweep caught the previous
    regr_slope co-moment fit differing from DuckDB's in the last ulps
    (order-dependent double merges), splitting 4 of 15k rounded
    residuals at a 4-dp boundary. The oracle replays the identical
    formula over HUGEINT micro-units with the identical cast/divide
    sequence, so both engines run the same IEEE ops on the same exact
    integers."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    rev_dec = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    )
    traces = li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.datediff(
            F.col("l_shipdate").cast("date"), F.to_date(F.lit("1970-01-01"))
        ).alias("day"),
    ).agg(rev_dec.alias("revenue"))
    ds = Dataset(traces, index="day", id_vars=["l_returnflag", "l_linestatus"])
    out = ds.detrend("revenue", out_col="resid")
    return out.fetch(
        "l_returnflag", "l_linestatus", "day", F.round("resid", 4).alias("resid")
    )


@query(
    "q121_normalize",
    """
    WITH s AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma,
             min(value) AS lo, max(value) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / nullif(s.sigma, 0), 6) AS z,
           round((e.value - s.lo) / nullif(s.hi - s.lo, 0), 6) AS mm
    FROM events e JOIN s USING (event_type)
    """,
)
def q121(spark, sf_dir):
    """Per-group feature scaling (z-score + min-max in one pass each):
    tiny per-group stats broadcast back, map-side arithmetic — the
    standard pre-training normalization shape."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    ds = Dataset(ev, index="event_id", id_vars=["event_type"])
    out = ds.normalize("value", method="zscore", out_col="z").normalize(
        "value", method="minmax", out_col="mm"
    )
    return out.fetch(
        "event_id", "event_type",
        F.round("z", 6).alias("z"), F.round("mm", 6).alias("mm"),
    )


@query(
    "q122_autocorr",
    """
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
      FROM lineitem GROUP BY 1, 2, 3),
    lagged AS (
      SELECT l_returnflag, l_linestatus, revenue,
             lag(revenue, 1) OVER w AS r1, lag(revenue, 7) OVER w AS r7
      FROM t WINDOW w AS (PARTITION BY l_returnflag, l_linestatus ORDER BY day))
    SELECT l_returnflag, l_linestatus,
           round(corr(revenue, r1), 6) AS acf_1,
           round(corr(revenue, r7), 6) AS acf_7
    FROM lagged GROUP BY 1, 2
    """,
)
def q122(spark, sf_dir):
    """Per-trace autocorrelation at lags 1 and 7 (weekly seasonality
    probe): one keyed window for the lags, then corr accumulators — the
    shuffle is on the trace key only, shared by window and aggregate."""
    _prep(spark)
    traces = _daily_traces(spark, sf_dir)
    w = Window.partitionBy("l_returnflag", "l_linestatus").orderBy("day")
    lagged = traces.select(
        "l_returnflag", "l_linestatus", "revenue",
        F.lag("revenue", 1).over(w).alias("r1"),
        F.lag("revenue", 7).over(w).alias("r7"),
    )
    return lagged.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.corr("revenue", "r1"), 6).alias("acf_1"),
        F.round(F.corr("revenue", "r7"), 6).alias("acf_7"),
    )


@query(
    "q123_ohlc",
    f"""
    SELECT event_type,
           strftime(time_bucket(INTERVAL '1 day', ts), '{TS_FMT_DUCK}') AS bar,
           round(arg_min(value, ts), 6) AS open,
           round(max(value), 6)         AS high,
           round(min(value), 6)         AS low,
           round(arg_max(value, ts), 6) AS close,
           count(*)                     AS n
    FROM events GROUP BY 1, 2
    """,
)
def q123(spark, sf_dir):
    """OHLC bars (open/high/low/close per key per day): min_by/max_by
    pick the first/last value by timestamp inside one hash aggregation
    — the financial downsampling staple with no window or sort. (ts is
    unique per (type, day) in this fixture, so min_by/arg_min ties
    cannot differ across engines.)"""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), TS_FMT_SPARK).alias("bar"),
        )
        .agg(
            F.round(F.min_by("value", "ts"), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", "ts"), 6).alias("close"),
            F.count("*").alias("n"),
        )
    )


@query(
    "q124_source_kl",
    r"""
    WITH d AS (
      SELECT source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT source, unnest(string_split(norm, ' ')) AS token
      FROM d WHERE norm <> ''),
    c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    ct AS (SELECT sum(cnt) AS tot FROM c),
    s AS (SELECT source, token, count(*) AS scnt FROM tok GROUP BY 1, 2),
    st AS (SELECT source, sum(scnt) AS gt FROM s GROUP BY source)
    SELECT s.source,
           round(sum((scnt::DOUBLE / gt) * ln((scnt::DOUBLE / gt) / (cnt::DOUBLE / tot))), 6) AS kl,
           CAST(min(gt) AS BIGINT) AS n_tokens
    FROM s JOIN c USING (token) JOIN st USING (source) CROSS JOIN ct
    GROUP BY s.source
    """,
)
def q124(spark, sf_dir):
    """Data-mixing drift diagnostic: unigram KL(source ‖ corpus) per
    source. After the first token aggregation every frame is
    vocabulary-sized; the group totals and corpus total broadcast. A
    uniform synthetic corpus gives near-zero divergences — the point is
    the oracle checks the full computation, not the magnitude."""
    _prep(spark)
    from polars_dataset_spark.functions import kl_divergence_by

    docs = load_table(spark, sf_dir, "documents")
    out = kl_divergence_by(docs, group_col="source")
    return out.select(
        "source", F.round("kl", 6).alias("kl"), F.col("n_tokens")
    )


@query(
    "q125_rolling_corr",
    """
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
             CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
               AS revenue
      FROM lineitem GROUP BY 1, 2, 3)
    SELECT l_returnflag, l_linestatus, day,
           round(corr(revenue, CAST(day AS DOUBLE))
                   OVER (PARTITION BY l_returnflag, l_linestatus ORDER BY day
                         ROWS BETWEEN 13 PRECEDING AND CURRENT ROW), 4) + 0.0 AS trend_corr
    FROM t
    """,
)
def q125(spark, sf_dir):
    """Rolling correlation (local trend strength: revenue vs day over a
    14-row window). Spark has no corr window aggregate, so this builds
    it from five windowed averages on ONE frame spec — same single
    shuffle, all codegen — while DuckDB's native windowed corr checks
    the identity. 4-dp rounding: the engines' corr accumulators differ
    by ~1e-12 relative, so 6-dp boundary collisions were observable
    (~1e-4/row) at sf0.001; 4 dp puts the collision odds below 1e-7
    per row while staying far tighter than any analytic use of a
    correlation needs."""
    _prep(spark)
    traces = _daily_traces(spark, sf_dir).withColumn(
        "day_d", F.col("day").cast("double")
    )
    ds = Dataset(traces, index="day", id_vars=["l_returnflag", "l_linestatus"])
    out = ds.rolling_corr("revenue", "day_d", window_size=14, out_col="trend_corr")
    return out.fetch(
        "l_returnflag", "l_linestatus", "day",
        (F.round("trend_corr", 4) + F.lit(0.0)).alias("trend_corr"),
    )


@query(
    "q126_winsorize",
    """
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.05) AS lo,
             quantile_cont(o_totalprice, 0.95) AS hi
      FROM orders)
    SELECT count(*) AS n,
           CAST(round(sum(CAST(least(greatest(o_totalprice, lo), hi) AS DECIMAL(28,6))), 2) AS DOUBLE) AS total,
           round(CAST(sum(CAST(least(greatest(o_totalprice, lo), hi) AS DECIMAL(28,6))) AS DOUBLE) / count(*), 4) AS mean,
           round(min(least(greatest(o_totalprice, lo), hi)), 2) AS mn,
           round(max(least(greatest(o_totalprice, lo), hi)), 2) AS mx
    FROM orders, b
    """,
)
def q126(spark, sf_dir):
    """Winsorized summary (5% tails clipped to the exact quantiles):
    robust-statistics tail treatment as one percentile aggregate (two
    scalars) + a map-only clip + one summary aggregate."""
    _prep(spark)
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ds = Dataset(o, index="o_orderkey")
    w = ds.winsorize("o_totalprice", p=0.05, out_col="wz")
    wz_d = F.col("wz").cast("decimal(28,6)")
    return w.df.agg(
        F.count("*").alias("n"),
        F.round(F.sum(wz_d), 2).cast("double").alias("total"),
        F.round(F.sum(wz_d).cast("double") / F.count(F.lit(1)), 4).alias("mean"),
        F.round(F.min("wz"), 2).alias("mn"),
        F.round(F.max("wz"), 2).alias("mx"),
    )


@query(
    "q127_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, median(value) AS m FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, med.m, median(abs(e.value - med.m)) AS mad
      FROM events e JOIN med USING (event_type) GROUP BY e.event_type, med.m)
    SELECT e.event_type,
           count(*) FILTER (WHERE abs(e.value - mad.m) > 3 * 1.4826 * mad.mad) AS n_outliers,
           round(mad.m, 6) AS med, round(mad.mad, 6) AS mad
    FROM events e JOIN mad USING (event_type)
    GROUP BY e.event_type, mad.m, mad.mad
    """,
)
def q127(spark, sf_dir):
    """Robust outlier screening via median/MAD (immune to the outliers
    themselves, unlike q117's moments): two exact-median aggregation
    passes + a map-side flag. 1.4826·MAD estimates σ under normality —
    the standard robust z-score."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("m"))
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "m")
        .agg(F.median(F.abs(F.col("value") - F.col("m"))).alias("mad"))
    )
    return (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "m", "mad")
        .agg(
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("m")) > 3 * 1.4826 * F.col("mad"), 1
                )
            ).alias("n_outliers")
        )
        .select(
            "event_type", "n_outliers",
            F.round("m", 6).alias("med"), F.round("mad", 6).alias("mad"),
        )
    )


@query(
    "q128_interevent_times",
    """
    WITH d AS (
      SELECT user_id,
             epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      FROM events)
    SELECT round(avg(gap), 4)                    AS mean_gap_s,
           round(median(gap), 4)                 AS median_gap_s,
           round(quantile_cont(gap, 0.95), 4)    AS p95_gap_s,
           count(*)                              AS n_gaps
    FROM d WHERE gap IS NOT NULL
    """,
)
def q128(spark, sf_dir):
    """Inter-event time distribution (user cadence): one keyed window
    for the per-user deltas, then a summary aggregate — the
    arrival-process statistics behind session-gap and rate-limit
    choices. epoch deltas keep sub-second precision as exact doubles."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    d = ev.select(gap.alias("gap")).filter(F.col("gap").isNotNull())
    return d.agg(
        F.round(F.avg("gap"), 4).alias("mean_gap_s"),
        F.round(F.median("gap"), 4).alias("median_gap_s"),
        F.round(F.percentile("gap", F.lit(0.95)), 4).alias("p95_gap_s"),
        F.count("*").alias("n_gaps"),
    )


@query(
    "q129_audience_overlap",
    """
    WITH a AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT x.event_type AS type_a, y.event_type AS type_b,
           count(*) AS n_both,
           round(count(*)::DOUBLE /
                 ((SELECT count(DISTINCT user_id) FROM events WHERE event_type = x.event_type)
                  + (SELECT count(DISTINCT user_id) FROM events WHERE event_type = y.event_type)
                  - count(*)), 6) AS jaccard
    FROM a x JOIN a y ON x.user_id = y.user_id AND x.event_type < y.event_type
    GROUP BY x.event_type, y.event_type
    """,
)
def q129(spark, sf_dir):
    """Audience overlap between event types (pairwise user-set Jaccard):
    dedup to (type, user) pairs first — the self-join is on user_id over
    the DEDUPED frame, so its size is users·types, not raw events; per-
    type distinct counts broadcast for the union denominator."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    a = ev.select("event_type", "user_id").distinct()
    sizes = a.groupBy("event_type").agg(F.countDistinct("user_id").alias("sz"))
    both = (
        a.alias("x")
        .join(a.alias("y"), on="user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("type_a"), F.col("y.event_type").alias("type_b")
        )
        .agg(F.count("*").alias("n_both"))
    )
    out = (
        both.join(F.broadcast(sizes.withColumnRenamed("event_type", "type_a")
                              .withColumnRenamed("sz", "sz_a")), "type_a")
        .join(F.broadcast(sizes.withColumnRenamed("event_type", "type_b")
                          .withColumnRenamed("sz", "sz_b")), "type_b")
    )
    return out.select(
        "type_a", "type_b", "n_both",
        F.round(
            F.col("n_both") / (F.col("sz_a") + F.col("sz_b") - F.col("n_both")), 6
        ).alias("jaccard"),
    )


def _cross_jaccard_pair_ctes(threshold: float, with_jaccard: bool = False) -> str:
    """Cross-side variant of :func:`_jaccard_pair_ctes`: the exact
    Jaccard pair set BETWEEN two halves of a preceding ``sh(doc_id,
    is_l, shingles)`` CTE, ending in ``p(id_l, id_r[, jaccard])``.
    Same AllPairs/PPJoin prefix filter (global-frequency shingle
    order; a qualifying pair must collide within both prefixes), with
    the candidate join restricted to L×R — this replaces the
    brute-force ``l JOIN r ON TRUE`` oracles whose O(|L|·|R|)
    list-intersects timed out at the sf10 decade (VERDICT r11 #6);
    the filter is exact, so the restated oracle computes the
    IDENTICAL pair set at every SF."""
    jac = (
        ",\n             round(len(list_intersect(a.shingles, b.shingles))::DOUBLE\n"
        "                   / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) AS jaccard"
        if with_jaccard
        else ""
    )
    return f"""
    inv AS (SELECT doc_id, is_l, unnest(shingles) AS g FROM sh),
    gfreq AS (SELECT g, count(*) AS c FROM inv GROUP BY g),
    ranked AS (
      SELECT inv.doc_id, inv.is_l, inv.g,
             row_number() OVER (PARTITION BY inv.doc_id ORDER BY gfreq.c, inv.g) AS rk,
             count(*) OVER (PARTITION BY inv.doc_id) AS sz
      FROM inv JOIN gfreq USING (g)),
    pref AS (SELECT doc_id, is_l, g FROM ranked
             WHERE rk <= sz - ceil({threshold} * sz) + 1),
    cand AS (SELECT DISTINCT a.doc_id AS id_l, b.doc_id AS id_r
             FROM pref a JOIN pref b ON a.g = b.g
             WHERE a.is_l AND NOT b.is_l),
    p AS (
      SELECT cand.id_l, cand.id_r{jac}
      FROM cand JOIN sh a ON a.doc_id = cand.id_l
                JOIN sh b ON b.doc_id = cand.id_r
      WHERE round(len(list_intersect(a.shingles, b.shingles))::DOUBLE
                  / len(list_distinct(list_concat(a.shingles, b.shingles))), 6) >= {threshold})"""


@query(
    "q130_fuzzy_join",
    rf"""
    WITH d AS (
      SELECT doc_id, source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, source,
             CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, source < 'src5' AS is_l, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),
    {_cross_jaccard_pair_ctes(0.6, with_jaccard=True)}
    SELECT id_l AS doc_id_l, id_r AS doc_id_r, jaccard FROM p
    """,
)
def q130(spark, sf_dir):
    """Cross-corpus record linkage (entity resolution): near-identical
    documents BETWEEN two disjoint source halves via banded MinHash-LSH
    across two frames — shuffle ∝ (|L|+|R|)·bands, never |L|·|R|. Exact
    Jaccard verifies candidates, so output ⊆ exact cross set; the
    fixture's near-dups sit far above the s-curve, so recall is 1 and
    the oracle (exact all-pairs cross Jaccard) matches as equality —
    the q37 argument applied across tables."""
    _prep(spark)
    from polars_dataset_spark.functions import fuzzy_join

    docs = load_table(spark, sf_dir, "documents")
    left = docs.filter(F.col("source") < "src5")
    right = docs.filter(F.col("source") >= "src5")
    return fuzzy_join(
        left, right, left_id="doc_id", right_id="doc_id", threshold=0.6
    )


@query(
    "q131_cluster_report",
    """
    WITH e AS (
      SELECT vec_id, label, embedding FROM embeddings),
    dims AS (
      SELECT vec_id, label, unnest(range(1, len(embedding) + 1)) AS i,
             embedding[unnest(range(1, len(embedding) + 1))]::DOUBLE AS v
      FROM e),
    cent AS (
      SELECT label, i, avg(v) AS c FROM dims GROUP BY label, i),
    dots AS (
      SELECT d.vec_id, d.label,
             sum(d.v * cent.c) AS dot,
             sqrt(sum(d.v * d.v)) AS nv,
             sqrt(sum(cent.c * cent.c)) AS nc
      FROM dims d JOIN cent ON d.label = cent.label AND d.i = cent.i
      GROUP BY d.vec_id, d.label)
    SELECT label, count(*) AS n,
           round(avg(dot / (nv * nc)), 6) AS mean_cos_to_centroid,
           round(min(dot / (nv * nc)), 6) AS min_cos_to_centroid
    FROM dots GROUP BY label
    """,
)
def q131(spark, sf_dir):
    """Clustering-quality report over the embeddings table: per-label
    centroid (posexplode → per-(label,dim) avg — centroids as ROWS, no
    driver collect, any dimensionality) then each vector's cosine to
    its own centroid via a dim-aligned join + per-vector reduce. Two
    shuffles total, both keyed; entirely built-in expressions, no UDF."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode(F.col("embedding")).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = dims.groupBy("label", "i").agg(F.avg("v").alias("c"))
    dots = (
        dims.join(cent, on=["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("v") * F.col("c")).alias("dot"),
            F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nv"),
            F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("nc"),
        )
    )
    cos = F.col("dot") / (F.col("nv") * F.col("nc"))
    return dots.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(cos), 6).alias("mean_cos_to_centroid"),
        F.round(F.min(cos), 6).alias("min_cos_to_centroid"),
    )


@query(
    "q132_centroid_separation",
    """
    WITH dims AS (
      SELECT label, unnest(range(1, len(embedding) + 1)) AS i,
             embedding[unnest(range(1, len(embedding) + 1))]::DOUBLE AS v
      FROM embeddings),
    cent AS (
      SELECT label, i, avg(v) AS c FROM dims GROUP BY label, i),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             sum(a.c * b.c) AS dot,
             sqrt(sum(a.c * a.c)) AS na, sqrt(sum(b.c * b.c)) AS nb
      FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
      GROUP BY a.label, b.label)
    SELECT label_a, label_b, round(dot / (na * nb), 6) AS cos_sep
    FROM pairs
    """,
)
def q132(spark, sf_dir):
    """Inter-centroid separation (pairwise cosine between label
    centroids — q131's intra-cluster complement, together the
    silhouette picture): the self-join runs on the CENTROID frame
    (labels·dims rows), never on the vectors."""
    _prep(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("i", "v")
    ).withColumn("v", F.col("v").cast("double"))
    cent = dims.groupBy("label", "i").agg(F.avg("v").alias("c"))
    a = cent.select(F.col("label").alias("label_a"), "i", F.col("c").alias("ca"))
    b = cent.select(F.col("label").alias("label_b"), "i", F.col("c").alias("cb"))
    pairs = (
        a.join(b, on="i")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("dot"),
            F.sqrt(F.sum(F.col("ca") * F.col("ca"))).alias("na"),
            F.sqrt(F.sum(F.col("cb") * F.col("cb"))).alias("nb"),
        )
    )
    return pairs.select(
        "label_a", "label_b",
        F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos_sep"),
    )


@query(
    "q133_rfm_segments",
    """
    WITH rfm AS (
      SELECT user_id,
             CAST(floor(epoch((SELECT max(ts) FROM events)) - epoch(max(ts)))
                  AS BIGINT)                                    AS recency_s,
             count(*)                                            AS frequency,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)   AS monetary,
             CAST(sum(CAST(value AS DECIMAL(28,6))) * 1000000 AS BIGINT) AS mu
      FROM events GROUP BY user_id),
    cuts AS (
      SELECT quantile_cont(frequency, 0.5) AS f_med,
             quantile_cont(monetary, 0.5)  AS m_med,
             quantile_cont(recency_s, 0.5) AS r_med
      FROM rfm)
    -- avg_monetary rounds in EXACT integer micro-units: a double
    -- sum's order-dependent last ulp flipped the 4th decimal at sf0.1,
    -- and Spark/DuckDB round boundary doubles differently (shortest
    -- decimal string vs exact binary). round(S/(100 n)) half-up as
    -- (2S + 100n) // (200n), then one exact-identical double division.
    SELECT CASE WHEN recency_s <= r_med THEN 'recent' ELSE 'lapsed' END AS r_seg,
           CASE WHEN frequency >  f_med THEN 'frequent' ELSE 'occasional' END AS f_seg,
           CASE WHEN monetary  >  m_med THEN 'high' ELSE 'low' END AS m_seg,
           count(*) AS n_users,
           CAST((2 * sum(mu) + 100 * count(*)) // (200 * count(*)) AS DOUBLE)
             / 10000.0 AS avg_monetary
    FROM rfm, cuts
    GROUP BY r_seg, f_seg, m_seg
    """,
)
def q133(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary): one per-user
    aggregate (decimal-stable monetary sums), median thresholds from one
    3-scalar aggregate, then a map-side CASE bucketing and the segment
    rollup. The corpus max timestamp is a 1-row scalar subquery on both
    engines."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    rfm = ev.groupBy("user_id").agg(
        F.floor(
            F.lit(max_ts).cast("double") - F.max("ts").cast("double")
        ).cast("long").alias("recency_s"),
        F.count("*").alias("frequency"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("monetary"),
        (F.sum(F.col("value").cast("decimal(28,6)")) * 1000000)
        .cast("long").alias("mu"),
    )
    cuts = rfm.agg(
        F.percentile("frequency", F.lit(0.5)).alias("f_med"),
        F.percentile("monetary", F.lit(0.5)).alias("m_med"),
        F.percentile("recency_s", F.lit(0.5)).alias("r_med"),
    ).first()
    return (
        rfm.select(
            F.when(F.col("recency_s") <= cuts["r_med"], "recent").otherwise("lapsed").alias("r_seg"),
            F.when(F.col("frequency") > cuts["f_med"], "frequent").otherwise("occasional").alias("f_seg"),
            F.when(F.col("monetary") > cuts["m_med"], "high").otherwise("low").alias("m_seg"),
            "monetary",
            "mu",
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("mu").alias("__mu_sum"),
        )
        # exact integer half-up rounding in micro-units (see the oracle's
        # comment): Spark's round() on a double rounds its SHORTEST
        # decimal string, DuckDB the exact binary — they disagree on
        # boundary values, so neither side may round a double here.
        # FLOOR division, not DIV: Spark's DIV truncates toward zero
        # while DuckDB's // floors, so a negative numerator (refund-heavy
        # segment) would diverge by one micro-unit step; (a − pmod(a,b))
        # is exactly divisible, making the truncating DIV equal the
        # mathematical floor for either sign (r8 review).
        .withColumn(
            "avg_monetary",
            F.expr(
                "CAST((2 * __mu_sum + 100 * n_users"
                " - pmod(2 * __mu_sum + 100 * n_users, 200 * n_users))"
                " DIV (200 * n_users) AS DOUBLE) / 10000.0"
            ),
        )
        .drop("__mu_sum")
    )


@query(
    "q134_event_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6) AS p
    FROM c
    """,
)
def q134(spark, sf_dir):
    """First-order Markov transition matrix between event types (per
    user sequence): one keyed window for the successor, one count
    aggregation, row-normalized probabilities via a tiny keyed window
    over the 5×5 count frame."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    wn = Window.partitionBy("from_type")
    return c.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(wn), 6).alias("p"),
    )


@query(
    "q135_pareto_abc",
    """
    WITH pr AS (
      SELECT l_partkey, sum(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(28,6))) AS revenue
      FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT sum(revenue) AS t FROM pr),
    ranked AS (
      SELECT l_partkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, l_partkey) AS cum
      FROM pr),
    -- exact decimal threshold compares (5·cum vs 4·t, 20·cum vs 19·t):
    -- no float division, so the class boundary cannot drift between
    -- engines on partial-sum rounding
    classed AS (
      SELECT revenue,
             CASE WHEN 5 * cum <= 4 * t THEN 'A'
                  WHEN 20 * cum <= 19 * t THEN 'B' ELSE 'C' END AS abc
      FROM ranked, tot)
    SELECT abc, count(*) AS n_parts,
           round(CAST(sum(revenue) AS DOUBLE), 2) AS class_revenue
    FROM classed GROUP BY abc
    """,
)
def q135(spark, sf_dir):
    """Pareto/ABC analysis: parts ranked by revenue, classed by
    cumulative revenue share (A ≤80%, B ≤95%, C rest). The descending
    value-ordered global cumsum rides the two-pass distributed prefix
    sum (range partition on the NEGATED revenue — no single-partition
    window over the part frame); revenue itself is decimal-stable."""
    _prep(spark)
    from polars_dataset_spark.functions.packing import _global_prefix_sum

    li = load_table(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
        ).alias("revenue")
    )
    total = pr.agg(F.sum("revenue").alias("t")).first()["t"]
    parts = pr.sparkSession.sparkContext.defaultParallelism
    d = _global_prefix_sum(
        pr.withColumn("__negrev", -F.col("revenue")),
        "revenue",
        ["__negrev", "l_partkey"],
        max(parts, 1),
    )
    # exact decimal threshold compares — same integer multipliers as the
    # oracle, so the class boundary is bit-identical across engines
    cum = F.col("__cum")
    t = F.lit(total)
    abc = (
        F.when(cum * 5 <= t * 4, "A").when(cum * 20 <= t * 19, "B").otherwise("C")
    )
    return (
        d.withColumn("abc", abc)
        .groupBy("abc")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.sum("revenue").cast("double"), 2).alias("class_revenue"),
        )
    )


@query(
    "q136_wow_growth",
    f"""
    WITH w AS (
      SELECT date_trunc('week', ts) AS wk,
             CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      FROM events GROUP BY wk)
    SELECT strftime(wk, '{TS_FMT_DUCK}') AS week,
           round(revenue, 2) AS revenue,
           round(revenue / lag(revenue)
                   OVER (PARTITION BY date_part('year', wk) ORDER BY wk) - 1, 6)
             AS wow_growth
    FROM w
    """,
)
def q136(spark, sf_dir):
    """Week-over-week growth: the raw shuffle is one weekly aggregate
    (decimal-stable); the lag window over the tiny weeks frame is
    PARTITIONED by year (first week of a year gets null growth — the
    standard YoY-boundary convention) so even this post-aggregate step
    keeps the suite's zero-single-partition invariant."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(F.date_trunc("week", "ts").alias("wk")).agg(
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("revenue")
    )
    w = Window.partitionBy(F.year("wk")).orderBy("wk")
    return wk.select(
        F.date_format("wk", TS_FMT_SPARK).alias("week"),
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.lag("revenue").over(w) - 1, 6).alias("wow_growth"),
    )


@query(
    "q137_new_vs_returning",
    f"""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min(ts)) AS first_wk
      FROM events GROUP BY user_id),
    act AS (
      SELECT DISTINCT e.user_id, date_trunc('week', e.ts) AS wk
      FROM events e)
    SELECT strftime(act.wk, '{TS_FMT_DUCK}') AS week,
           count(*) FILTER (WHERE act.wk = first_seen.first_wk)  AS new_users,
           count(*) FILTER (WHERE act.wk <> first_seen.first_wk) AS returning_users
    FROM act JOIN first_seen USING (user_id)
    GROUP BY act.wk
    """,
)
def q137(spark, sf_dir):
    """New-vs-returning user split per week: first-seen week per user
    (one aggregate, a per-user scalar frame) joined to the deduped
    (user, week) activity — the growth-accounting companion to cohort
    retention (q112)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("first_wk")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    j = act.join(first_seen, "user_id")
    return j.groupBy(F.date_format("wk", TS_FMT_SPARK).alias("week")).agg(
        F.count(F.when(F.col("wk") == F.col("first_wk"), 1)).alias("new_users"),
        F.count(F.when(F.col("wk") != F.col("first_wk"), 1)).alias("returning_users"),
    )


@query(
    "q138_cc_small_clusters",
    """
    SELECT doc_id AS id, min(doc_id) OVER (PARTITION BY doc_id // 4) AS component
    FROM documents
    QUALIFY count(*) OVER (PARTITION BY doc_id // 4) > 1
    """,
)
def q138(spark, sf_dir):
    """Connected components on the REALISTIC near-dup regime: many tiny
    clusters (consecutive doc_id runs of ≤4, chained) instead of q63's
    adversarial one-path-per-group worst case. Real dedup graphs look
    like this — millions of 2-5 node components — and star contraction
    converges in ~2 rounds here vs O(log diameter) on the path graph;
    benching both pins the expected AND the worst-case cost
    (tests/test_graph_convergence.py asserts the round counts)."""
    _prep(spark)
    from polars_dataset_spark.functions import chain_edges, connected_components

    docs = load_table(spark, sf_dir, "documents")
    clustered = docs.withColumn("__cl", F.floor(F.col("doc_id") / 4).cast("long"))
    edges = chain_edges(clustered, "doc_id", "__cl")
    return connected_components(edges)


@query(
    "q139_skew_kurtosis",
    """
    WITH mu AS (
        SELECT l_returnflag AS flag,
               avg(l_extendedprice) AS mu_p, avg(l_quantity) AS mu_q
        FROM lineitem GROUP BY 1
    )
    SELECT t.l_returnflag AS flag,
           round(avg(pow(l_extendedprice - mu_p, 3))
                 / pow(avg(pow(l_extendedprice - mu_p, 2)), 1.5), 4) + 0.0
               AS skew_price,
           round(avg(pow(l_extendedprice - mu_p, 4))
                 / pow(avg(pow(l_extendedprice - mu_p, 2)), 2) - 3, 4) + 0.0
               AS kurt_price,
           round(avg(pow(l_quantity - mu_q, 3))
                 / pow(avg(pow(l_quantity - mu_q, 2)), 1.5), 4) + 0.0
               AS skew_qty
    FROM lineitem t JOIN mu ON t.l_returnflag = mu.flag
    GROUP BY 1
    """,
)
def q139(spark, sf_dir):
    """Per-group skewness / excess kurtosis — the same Catalyst
    single-pass mergeable central-moment aggregate behind
    ``Dataset.skew()``/``Dataset.kurtosis()`` (core.py), here grouped.

    Spark's ``skewness``/``kurtosis`` use POPULATION moments
    (m3/m2^1.5, m4/m2²−3) while DuckDB's built-ins apply the
    sample-adjustment factors — so the oracle states the population
    formula explicitly via a two-pass mean join instead of calling
    DuckDB's ``skewness()``. Rounded to 4 dp (the averages policy):
    Spark's streaming merge and DuckDB's two-pass differ at ~1e-12
    relative, far below the boundary. Upgrades skew/kurtosis from
    test-only to value-oracled (VERDICT r02 "What's missing" #4)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # + 0.0 collapses IEEE -0.0 to +0.0 on both sides (the q41/q125
    # lesson): a skew of -1e-17 rounds to -0.0 in one engine, 0.0 in the
    # other, and the driver hash stringifies them differently
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        (F.round(F.skewness("l_extendedprice"), 4) + F.lit(0.0)).alias("skew_price"),
        (F.round(F.kurtosis("l_extendedprice"), 4) + F.lit(0.0)).alias("kurt_price"),
        (F.round(F.skewness("l_quantity"), 4) + F.lit(0.0)).alias("skew_qty"),
    )


@query(
    "q140_ewm_mean",
    """
    WITH t AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               strftime(l_shipdate, '%Y-%m-%d') AS day,
               CAST(sum(l_quantity) AS DOUBLE) AS v
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1996-01-01'
        GROUP BY 1, 2, 3
    ), r AS (
        SELECT flag, status, day, v,
               row_number() OVER (PARTITION BY flag, status ORDER BY day)
                   AS rn
        FROM t
    )
    SELECT flag, status, day,
           round(
               sum(v * pow(2.0, rn)) OVER (
                   PARTITION BY flag, status ORDER BY rn
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               * pow(0.5, rn)
               / (2.0 * (1.0 - pow(0.5, rn))), 4) AS qty_ewm
    FROM r
    """,
)
def q140(spark, sf_dir):
    """Per-trace exponentially weighted mean (``Dataset.ewm_mean``,
    alpha=0.5, adjust=True) over daily quantity traces — the sequential
    recursion runs as one ``applyInPandas`` pass per trace (vectorised
    ``pandas.ewm``), the same single-shuffle grouped-map profile as
    regrid. Traces are the DAILY aggregate per (returnflag, linestatus),
    one year: the daily grain guarantees a UNIQUE per-trace index (raw
    lineitem has no unique order key in this fixture — (orderkey,
    linenumber) repeats — and EWMA is order-sensitive, so any index tie
    would make the result engine-dependent).

    The oracle restates adjust=True EWMA in closed form: with per-trace
    row number ``rn``, y_t = Σ_{s≤t} v_s·(1/2)^(rn_t−rn_s) / Σ_{k<rn_t}
    (1/2)^k — the numerator as a cumulative ``sum(v·2^rn)`` rescaled by
    ``0.5^rn`` (terms older than ~53 lags fall below double epsilon,
    exactly like the recursion), the denominator in closed form
    ``2(1−0.5^rn)``. One year of daily knots keeps rn ≤ 366 so
    ``2^rn ≤ 2^367 ≪`` double overflow; both engines agree to ~1e-12,
    rounded at 4 dp (the averages policy). Upgrades ewm_mean from
    test-only (tests/test_core.py pandas parity) to value-oracled."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
    ).agg(F.sum("l_quantity").cast("double").alias("v"))
    ds = Dataset(daily, index="day", id_vars=["flag", "status"])
    return (
        ds.ewm_mean("v", alpha=0.5, adjust=True)
        .df.select(
            "flag", "status", "day", F.round(F.col("v_ewm_mean"), 4).alias("qty_ewm")
        )
    )


@query(
    "q141_neardup_vs_corpus",
    rf"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id,
             CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, doc_id % 2 = 1 AS is_l, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),
    {_cross_jaccard_pair_ctes(0.7)}
    SELECT doc_id, lang, source FROM documents
    WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT id_l FROM p)
    """,
)
def q141(spark, sf_dir):
    """Dedup of ARRIVING data against an EXISTING corpus — the batch
    core of the continuous-ingestion path (``stream_neardup_filter``
    runs exactly this per micro-batch): build the LSH index of the
    even-id half once (``build_neardup_index`` — corpus signed ONCE,
    the piece that makes per-batch probing affordable), then keep only
    odd-id documents with no near-duplicate (shingle Jaccard ≥ 0.7) in
    it. Oracle: exact all-pairs cross-Jaccard anti-filter (recall 1 on
    this fixture — the q37/q130 s-curve argument at 64 hashes / 16
    bands)."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        build_neardup_index,
        neardup_filter_against,
    )

    docs = load_table(spark, sf_dir, "documents")
    idx = build_neardup_index(docs.filter(F.col("doc_id") % 2 == 0))
    out = neardup_filter_against(
        docs.filter(F.col("doc_id") % 2 == 1), idx, threshold=0.7
    ).select("doc_id", "lang", "source")
    # the verify set materialised eagerly inside the call (localCheckpoint),
    # so the index caches can be released before the caller's action
    idx.unpersist()
    return out


@query(
    "q142_pca_whiten",
    """
    WITH u AS (
        SELECT unnest(embedding) AS v, unnest(range(1, 65)) AS dim
        FROM embeddings),
    per AS (SELECT var_pop(v) AS vp FROM u GROUP BY dim)
    SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n,
           CAST(64 AS BIGINT) AS d, CAST(16 AS BIGINT) AS k,
           round(sum(vp), 4) AS trace,
           true AS explained_ok, true AS decorrelated_ok,
           true AS descending_ok, true AS whiten_ok
    FROM per
    """,
)
def q142(spark, sf_dir):
    """Distributed PCA + whitening over the embedding column
    (functions/projection.py): one-pass partial-moment fit (per-partition
    (n, Σx, ΣxxT) → driver d×d eigh — nothing driver-side scales with
    rows), map-only projection. The ANN pre-step: decorrelated/whitened
    dimensions balance hyperplane/IVF cells and truncation cuts every
    downstream distance to k terms.

    CONTRACT oracle (the eigenbasis itself is engine-specific): ``trace``
    is a genuine cross-engine VALUE check — sum of eigenvalues must equal
    DuckDB's independently computed Σ_dims var_pop (trace identity); the
    booleans assert, from a second distributed moment pass over the
    PROJECTED data, that the projection's covariance is diag(eigvals)
    (decorrelated, off-diag < 1e-8), eigenvalues are descending, the
    projected variance equals the top-k eigenvalue sum, and whitened
    covariance is I (< 1e-5). Numerics additionally pinned against a
    direct numpy PCA in tests/test_projection.py."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import (
        embedding_covariance,
        fit_pca,
        pca_project,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, "embedding", k=16)
    proj = pca_project(emb, model, "embedding")
    white = pca_project(emb, model, "embedding", whiten=True)
    _, cov_p, n_p = embedding_covariance(proj, "proj")
    _, cov_w, _ = embedding_covariance(white, "proj")
    diag = np.diag(cov_p)
    off_p = float(np.abs(cov_p - np.diag(diag)).max())
    return spark.createDataFrame(
        [
            (
                n_p,
                int(model.mean.shape[0]),
                int(model.components.shape[1]),
                round(float(model.trace), 4),
                bool(abs(diag.sum() - model.eigvals.sum()) < 1e-6),
                bool(off_p < 1e-8),
                bool(np.all(np.diff(model.eigvals) <= 1e-12)),
                bool(np.abs(cov_w - np.eye(16)).max() < 1e-5),
            )
        ],
        "n long, d long, k long, trace double, explained_ok boolean, "
        "decorrelated_ok boolean, descending_ok boolean, whiten_ok boolean",
    )


@query(
    "q143_model_quality",
    r"""
    WITH t AS (
      SELECT doc_id,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END
            AS n_tokens,
        CASE WHEN trim(text) = '' THEN 0.0
             ELSE length(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE
                  / len(regexp_split_to_array(trim(lower(text)), '\s+')) END
            AS mtl,
        (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
            / length(text) AS pr,
        (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
            / length(text) AS dr,
        (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::DOUBLE
            / length(text) AS ur,
        CASE WHEN trim(text) = '' THEN 0.0
             ELSE len(list_intersect(
                      regexp_split_to_array(trim(lower(text)), '\s+'),
                      ['the','and','of','to','in','is','that','it','for','with']
                  ))::DOUBLE
                  / len(regexp_split_to_array(trim(lower(text)), '\s+')) END
            AS sr
      FROM documents)
    SELECT doc_id,
           round(1.0 / (1.0 + exp(-(-2.0 + 0.6 * ln(1 + n_tokens)
                                    + 0.15 * mtl + 2.0 * sr
                                    - 3.0 * pr - 2.0 * dr - 1.0 * ur))), 6)
               AS model_quality
    FROM t
    """,
)
def q143(spark, sf_dir):
    """Model-based quality scoring (``with_model_quality``): a logistic
    scorer over prose features — the fastText-style quality-classifier
    SHAPE pretraining pipelines apply to every document — with fixed
    public heuristic weights, entirely codegen'd (map-only, zero
    shuffle, fuses into the surrounding scan at 100 TB). The oracle
    restates the full feature pipeline and sigmoid in SQL; the only
    cross-engine slack is libm ``exp`` (≤1 ulp), far under the 6-dp
    boundary."""
    _prep(spark)
    from polars_dataset_spark.functions.text import with_model_quality

    docs = load_table(spark, sf_dir, "documents")
    return with_model_quality(docs).select("doc_id", "model_quality")


@query(
    "q144_heavy_hitters",
    r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS item
        FROM documents WHERE trim(text) <> ''),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT item, CAST(count(*) AS BIGINT) AS cnt
    FROM tok, tot
    GROUP BY item, n
    HAVING count(*) > 0.005 * n
    """,
)
def q144(spark, sf_dir):
    """Heavy hitters over the corpus token stream
    (``functions/frequency.heavy_hitters``, phi = 0.5 %): Misra–Gries
    per-partition prefilter (map-only, ≤199 counters) → exact count of
    the candidate set only (broadcast semi-join BEFORE the counting
    shuffle) → exact threshold filter. The third sketch beside
    percentile_approx (q78) and HLL (q105): at 100 TB this bounds the
    shuffle by the candidate set, not the distinct-token cardinality,
    and the MG superset guarantee (Agarwal et al. mergeable summaries)
    makes the final output EXACT — so the oracle is the plain exact
    token-frequency SQL, a full value match, not a contract."""
    _prep(spark)
    from polars_dataset_spark.functions import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    from polars_dataset_spark.functions.text import tokenize

    toks = docs.select(
        F.explode(tokenize(F.col("text"))).alias("item")
    )
    return heavy_hitters(toks, "item", phi=0.005)


@query(
    "q145_changepoint_score",
    """
    WITH t AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               strftime(l_shipdate, '%Y-%m-%d') AS day,
               CAST(sum(l_quantity) AS DOUBLE) AS v
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1996-01-01'
        GROUP BY 1, 2, 3
    )
    SELECT flag, status, day,
           round(abs(
               avg(v) OVER (PARTITION BY flag, status ORDER BY day
                            ROWS BETWEEN 1 FOLLOWING AND 14 FOLLOWING)
             - avg(v) OVER (PARTITION BY flag, status ORDER BY day
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
           ), 4) AS cp_score,
           (abs(
               avg(v) OVER (PARTITION BY flag, status ORDER BY day
                            ROWS BETWEEN 1 FOLLOWING AND 14 FOLLOWING)
             - avg(v) OVER (PARTITION BY flag, status ORDER BY day
                            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
           ) > 0.5 * stddev_samp(v) OVER (PARTITION BY flag, status))
               AS cp_flag
    FROM t
    QUALIFY count(*) OVER (PARTITION BY flag, status ORDER BY day
                           ROWS BETWEEN 13 PRECEDING AND 14 FOLLOWING) = 28
    """,
)
def q145(spark, sf_dir):
    """Changepoint / level-shift scoring per daily trace: the classic
    moving-average drift score — |mean of the next 14 days − mean of the
    trailing 14 days| — flagged against the trace's own dispersion
    (0.5·σ). Pure window expressions (two ROWS frames + one whole-trace
    stddev), identical in both engines; rows without a complete 28-day
    context are excluded (the QUALIFY twin of the count guard). At
    scale: one hash shuffle on the trace key, all frames computed in a
    single WindowExec pass per ordering."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("day"),
    ).agg(F.sum("l_quantity").cast("double").alias("v"))
    w = Window.partitionBy("flag", "status").orderBy("day")
    pre = F.avg("v").over(w.rowsBetween(-13, 0))
    post = F.avg("v").over(w.rowsBetween(1, 14))
    sigma = F.stddev_samp("v").over(Window.partitionBy("flag", "status"))
    ctx = F.count(F.lit(1)).over(w.rowsBetween(-13, 14))
    return (
        daily.select(
            "flag",
            "status",
            "day",
            F.round(F.abs(post - pre), 4).alias("cp_score"),
            (F.abs(post - pre) > 0.5 * sigma).alias("cp_flag"),
            ctx.alias("__ctx"),
        )
        .filter(F.col("__ctx") == 28)
        .drop("__ctx")
    )


@query(
    "q146_ivf_recall",
    """
    SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 50) AS BIGINT)
               AS n_queries,
           CAST(10 AS BIGINT) AS k,
           true AS recall_gt_060,
           true AS beats_scan_fraction,
           true AS full_result_sets
    """,
)
def q146(spark, sf_dir):
    """Recall audit of the SAMPLED-KMeans IVF path — the one ANN variant
    whose output is approximation-dependent (q58 oracles the
    fixed-centroid variant exactly; here the coarse quantizer is trained
    on the corpus sample, the production shape). CONTRACT oracle: at
    n_probe=8 of 16 cells, recall@10 against the exact cosine_topk
    baseline must (a) exceed 0.60 on average (measured ~0.79 — wide
    margin over sample nondeterminism), (b) beat the 0.5 scan fraction —
    i.e. the clustering actually concentrates neighbors, the property
    IVF exists for — and (c) every query must return its full k results.
    Computing recall requires the exact baseline, so this query is the
    audit harness itself; at 100 TB you run it on a sampled slice."""
    _prep(spark)
    from polars_dataset_spark.functions import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 50)
    exact = cosine_topk(probes, emb, k=10).select("query_id", "neighbor_id")
    # two consumers (recall join + per-query sizes): materialize the IVF
    # result once instead of re-running train/assign/probe per consumer
    approx = pin(ivf_topk(probes, emb, k=10, n_cells=16, n_probe=8),
        eager=True
    )
    hits = (
        exact.join(approx.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg((F.count(F.lit(1)) / 10.0).alias("recall"))
    )
    sizes = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_res"))
    # left from sizes: a hypothetical zero-hit probe must count as
    # recall 0, not silently drop from the average and the query count
    per_query = sizes.join(hits, "query_id", "left").withColumn(
        "recall", F.coalesce(F.col("recall"), F.lit(0.0))
    )
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.lit(10).cast("long").alias("k"),
        (F.avg("recall") > 0.60).alias("recall_gt_060"),
        (F.avg("recall") > 8.0 / 16.0).alias("beats_scan_fraction"),
        (F.min("n_res") == 10).alias("full_result_sets"),
    )


@query(
    "q147_histogram",
    """
    WITH b AS (
        SELECT min(CAST(l_extendedprice AS DOUBLE)) AS lo,
               max(CAST(l_extendedprice AS DOUBLE)) AS hi
        FROM lineitem),
    w AS (SELECT lo, hi, (hi - lo) / 20 AS width FROM b),
    cnt AS (
        SELECT least(CAST(floor((CAST(l_extendedprice AS DOUBLE) - lo) / width)
                          AS BIGINT), 19) AS bin,
               CAST(count(*) AS BIGINT) AS count
        FROM lineitem, w
        GROUP BY 1),
    grid AS (SELECT unnest(range(20)) AS bin)
    SELECT grid.bin,
           round(lo + grid.bin * width, 6) AS lo,
           round(lo + (grid.bin + 1) * width, 6) AS hi,
           COALESCE(cnt.count, 0) AS count
    FROM grid CROSS JOIN w LEFT JOIN cnt ON grid.bin = cnt.bin
    """,
)
def q147(spark, sf_dir):
    """Equal-width histogram (``Dataset.hist``, polars ``hist`` shape):
    data-driven min/max bounds (one 2-scalar aggregate), pure-arithmetic
    bin ids (identical floats bin identically in any engine — the same
    subtraction/division/floor on both sides), empty bins zero-filled
    from a range frame, top value clamped into the last bin. One
    partial+final count aggregate — no sort, no window."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ds = Dataset(
        li.select("l_shipdate", "l_returnflag", "l_extendedprice"),
        index="l_shipdate",
        id_vars=["l_returnflag"],
    )
    h = ds.hist("l_extendedprice", bins=20)
    return h.select(
        "bin", F.round("lo", 6).alias("lo"), F.round("hi", 6).alias("hi"), "count"
    )


@query(
    "q148_lomb_scargle",
    """
    WITH t AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               CAST(date_diff('day', DATE '1995-01-01', l_shipdate) AS DOUBLE)
                   AS tnum,
               CAST(sum(l_quantity) AS DOUBLE) AS v
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1996-01-01'
        GROUP BY 1, 2, 3
    ), c AS (
        SELECT flag, status, tnum,
               v - avg(v) OVER (PARTITION BY flag, status) AS yc,
               var_pop(v) OVER (PARTITION BY flag, status) AS s2
        FROM t
    ), f AS (SELECT unnest(range(1, 25)) AS fi),
    x AS (
        SELECT flag, status, fi, tnum, yc, s2,
               2 * pi() * (fi / 365.0) AS omega
        FROM c CROSS JOIN f
    ), p1 AS (
        SELECT flag, status, fi,
               sum(sin((2 * omega) * tnum)) AS s2w,
               sum(cos((2 * omega) * tnum)) AS c2w,
               any_value(omega) AS omega
        FROM x GROUP BY 1, 2, 3
    ), tau AS (
        SELECT flag, status, fi, atan2(s2w, c2w) / (2 * omega) AS tau FROM p1
    ), p2 AS (
        SELECT x.flag, x.status, x.fi,
               sum(yc * cos(omega * (tnum - tau))) AS cterm,
               sum(yc * sin(omega * (tnum - tau))) AS sterm,
               sum(cos(omega * (tnum - tau)) * cos(omega * (tnum - tau))) AS cc,
               sum(sin(omega * (tnum - tau)) * sin(omega * (tnum - tau))) AS ss,
               any_value(s2) AS s2
        FROM x JOIN tau USING (flag, status, fi)
        GROUP BY 1, 2, 3
    )
    SELECT flag, status, CAST(fi AS BIGINT) AS fi,
           round((cterm * cterm / cc + sterm * sterm / ss) / (2 * s2), 4)
               AS power
    FROM p2
    """,
)
def q148(spark, sf_dir):
    """Per-trace Lomb–Scargle normalized periodogram
    (``operators.lomb_scargle`` + ``kernels.lomb_scargle_power``) at 1–24
    cycles/year over the 1995 daily quantity traces — spectral analysis
    that works DIRECTLY on uneven sampling (real ship-date grids have
    gaps), where the FFT (q41) needs a regrid first. Same single-shuffle
    grouped-map profile as regrid/FFT.

    FULL value oracle: the classic Lomb formula — tau rotation from
    atan2 of the double-angle sums, centered values, population-variance
    normalization — restated term-for-term in SQL with the SAME
    expression association as the numpy kernel, so both engines evaluate
    identical IEEE expressions; only summation order differs (~1e-13
    relative), far under the 4-dp boundary."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.operators import lomb_scargle

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-01-01"))
    )
    daily = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_linestatus").alias("status"),
        F.datediff("l_shipdate", F.lit("1995-01-01")).cast("double").alias("tnum"),
    ).agg(F.sum("l_quantity").cast("double").alias("v"))
    ds = Dataset(daily, index="tnum", id_vars=["flag", "status"])
    out = lomb_scargle(ds, np.arange(1, 25) / 365.0)
    return out.df.select(
        "flag",
        "status",
        F.round(F.col("frequency") * 365).cast("long").alias("fi"),
        F.round("v_power", 4).alias("power"),
    )


@query(
    "q149_update",
    """
    WITH u AS (
        SELECT o_custkey AS c_custkey,
               round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), 2)
                   AS new_bal
        FROM orders GROUP BY 1)
    SELECT c.c_custkey,
           round(COALESCE(u.new_bal, CAST(c.c_acctbal AS DOUBLE)), 2) AS c_acctbal,
           c.c_mktsegment
    FROM customer c LEFT JOIN u USING (c_custkey)
    """,
)
def q149(spark, sf_dir):
    """``Dataset.update`` (polars ``DataFrame.update``, join semantics):
    left-join on the key and COALESCE — non-null values from the update
    frame win, everything else (rows, schema, untouched columns) is
    preserved. Here: customer balances overridden by each customer's
    summed order value (decimal-stable sum), customers with no orders
    keep their original balance. One hash join, no window."""
    _prep(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    upd = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
        .cast("double")
        .alias("c_acctbal")
    )
    ds = Dataset(
        cust.select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "c_mktsegment",
        ),
        index="c_custkey",
        id_vars=[],
    )
    return ds.update(upd, on="c_custkey").df.select(
        "c_custkey", F.round("c_acctbal", 2).alias("c_acctbal"), "c_mktsegment"
    )


@query(
    "q150_bigram_surprisal",
    r"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
                   AS toks
        FROM documents),
    tok AS (
        SELECT doc_id, unnest(toks) AS token,
               unnest(range(1, len(toks) + 1)) AS pos
        FROM d),
    big AS (
        SELECT doc_id,
               lag(token) OVER (PARTITION BY doc_id ORDER BY pos) AS prev,
               token
        FROM tok QUALIFY prev IS NOT NULL),
    uni AS (SELECT token, count(*) AS c1 FROM tok GROUP BY 1),
    v AS (SELECT count(*) AS vsz FROM uni),
    bi AS (SELECT prev, token, count(*) AS cb FROM big GROUP BY 1, 2),
    sc AS (
        SELECT big.doc_id,
               CAST(round(log2((c1 + 0.5 * vsz) / (cb + 0.5)), 7)
                    AS DECIMAL(20,7)) AS bits
        FROM big
        JOIN bi USING (prev, token)
        JOIN uni ON big.prev = uni.token
        CROSS JOIN v)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(CAST(sum(bits) AS DOUBLE) / count(*), 4)
               AS bigram_surprisal_bits
    FROM sc GROUP BY 1
    """,
)
def q150(spark, sf_dir):
    """Bigram-LM surprisal (``with_bigram_surprisal``, add-½ smoothing)
    — one order above q95's unigram signal: scores word SEQUENCES, so
    shuffled-token text (which the unigram model can't tell apart) reads
    as high-surprisal. Per-bigram bits round to 7 and sum as DECIMAL —
    partitioning- and engine-independent, same policy as q95. The
    oracle replays the whole pipeline: tokenize, per-doc lag, bigram +
    unigram counts, vocabulary scalar, smoothed log2, decimal mean."""
    _prep(spark)
    from polars_dataset_spark.functions import with_bigram_surprisal

    docs = load_table(spark, sf_dir, "documents")
    return with_bigram_surprisal(docs)


@query(
    "q151_interp_frame",
    f"""
    WITH {_TRACES_SQL})
    SELECT t.l_returnflag, t.l_linestatus, CAST(t.day AS DOUBLE) AS day,
           round(t.revenue, 6) AS revenue
    FROM t JOIN cd USING (day)
    """,
)
def q151(spark, sf_dir):
    """Historical op H4, ``interpolate_frame`` (monotone PCHIP), upgraded
    from test-only to value-oracled by the q40 argument: an interpolant
    reproduces its KNOT values exactly (PCHIP is interpolating, identity
    error ~1e-12 ≪ the 6-dp rounding), so regridding each daily-revenue
    trace onto the days every trace observed drives the full grouped-map
    PCHIP machinery — group shuffle, slope computation, grid contract —
    against the raw daily aggregation in SQL. Off-knot monotonicity and
    no-overshoot are pinned by hypothesis
    (tests/test_properties.py::test_pchip_monotone_and_bounded)."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.operators import interpolate_frame

    # one materialized rollup, two consumers (common-day probe + interp)
    traces = pin(_daily_traces(spark, sf_dir), eager=True)
    days = _common_days(traces)
    ds = Dataset(
        traces.withColumn("day", F.col("day").cast("double")),
        index="day",
        id_vars=["l_returnflag", "l_linestatus"],
    )
    out = interpolate_frame(ds, np.asarray(days, dtype=np.float64)).df
    return out.select(
        "l_returnflag", "l_linestatus", "day", F.round("revenue", 6).alias("revenue")
    )


@query(
    "q152_metadata_chain",
    """
    SELECT l_returnflag AS flag, strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS ship_day,
           round(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)), 4)
               AS net_price
    FROM lineitem WHERE l_quantity >= 45
    """,
)
def q152(spark, sf_dir):
    """The metadata-machinery ops (E4 select_data, E8 rename, E9 pipe,
    E15 drop, E19 sort_columns) chained into one driver-gated query —
    each was test-only because alone it produces no interesting values,
    but the CHAIN's output is plain data an oracle can state: rename
    remaps index/id_vars through the mapping, pipe re-wraps a raw
    DataFrame result with canonical column order, select_data keeps
    id_vars+index while appending computed value columns, drop refuses
    the index but prunes the rest, sort_columns canonicalizes. Any
    metadata-propagation regression in the chain breaks the output
    columns and fails the hash."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    ds = Dataset(
        li.select(
            "l_shipdate", "l_returnflag", "l_quantity",
            "l_extendedprice", "l_discount",
        ),
        index="l_shipdate",
        id_vars=["l_returnflag"],
    )
    chained = (
        ds.rename({"l_shipdate": "ship_day", "l_returnflag": "flag"})
        .pipe(lambda d: d.df.filter(F.col("l_quantity") >= 45))  # raw DF → re-wrapped
        .select_data(
            F.round(
                F.col("l_extendedprice").cast("double")
                * (1 - F.col("l_discount").cast("double")),
                4,
            ).alias("net_price"),
            F.col("l_quantity"),
        )
        .drop("l_quantity")
        .sort_columns()
    )
    return chained.df.select(
        "flag", F.date_format("ship_day", "yyyy-MM-dd").alias("ship_day"), "net_price"
    )


@query(
    "q153_gif_decode",
    """
    SELECT CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
           CAST((t1.y * 7 + t2.x * 13) % 256 AS BIGINT) AS px
    FROM range(16) t1(y) CROSS JOIN range(16) t2(x)
    """,
)
def q153(spark, sf_dir):
    """Driver gate for the pure-python GIF decoder (VERDICT r3 #4): a
    16×16 fixture whose pixel values follow the closed form
    ``(y·7 + x·13) mod 256`` is GIF-encoded (interlaced, so the
    variable-width LZW reader AND the four-pass de-interlace both run),
    pushed through ``decode_media(decoder='gif')`` on the executor, and
    re-emitted per-pixel — the oracle restates the closed form in SQL, so
    every pixel is a full value match. The 256-level gray palette makes
    the 8-bit round-trip exact (float32 v/255·255 rounds back to v)."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_media
    from polars_dataset_spark.functions.gif import encode_gif_gray

    yy, xx = np.mgrid[0:16, 0:16]
    img = ((yy * 7 + xx * 13) % 256).astype(np.float64) / 255.0
    blob = encode_gif_gray(img, interlaced=True)
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    dec = decode_media(df, decoder="gif", target_size=(16, 16))
    px = dec.select(F.posexplode("decoded").alias("pos", "val"))
    return px.select(
        F.floor(F.col("pos") / 16).cast("long").alias("y"),
        (F.col("pos") % 16).cast("long").alias("x"),
        F.round(F.col("val") * 255).cast("long").alias("px"),
    )


@query(
    "q154_stft_contract",
    """
    SELECT CAST(t.f AS BIGINT) AS frame, 8000 AS sample_rate,
           10 AS n_spec_frames, 129 AS n_bins, CAST(32 AS BIGINT) AS peak_bin,
           true AS neighbor_ok, true AS sidelobe_ok, true AS peak_level_ok
    FROM range(10) t(f)
    """,
)
def q154(spark, sf_dir):
    """Driver gate for the STFT spectrogram (VERDICT r3 #4), q76/q142-style
    contract oracle: a 0.5-amplitude 1 kHz sine at 8 kHz lands EXACTLY on
    bin 32 of a 256-point frame (spacing 31.25 Hz), and the 128-sample hop
    advances the phase by exactly 16 cycles — so all 10 frames carry
    identical windowed content and the physics is frame-invariant:
    argmax bin = 32, Hann neighbor bins ≈ half the peak, everything ≥3
    bins away < 1 % of it, and the peak magnitude ≈ A/2·Σhann (31.875).
    Booleans/ints only cross the float32 storage channel; the magnitude
    numerics are pinned by
    tests/test_functions.py::test_audio_spectrogram_tone_peaks."""
    _prep(spark)
    import struct

    import numpy as np

    from polars_dataset_spark.functions import audio_spectrogram

    rate, n = 8000, 1408  # 256 + 9·128 → exactly 10 frames
    t = np.arange(n) / rate
    sig = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    raw = (sig * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    df = spark.createDataFrame([(0, bytearray(wav))], "media_id long, content binary")
    spec = audio_spectrogram(df, frame_size=256, hop=128)
    fr = spec.select(
        "sample_rate",
        "n_spec_frames",
        F.posexplode("spectrogram").alias("frame", "mags"),
    )
    peak = F.array_max("mags")
    lo, hi = F.element_at("mags", 32), F.element_at("mags", 34)  # bins 31/33
    far = F.greatest(
        F.array_max(F.slice("mags", 1, 30)),  # bins 0..29
        F.array_max(F.slice("mags", 36, 94)),  # bins 35..128
    )
    hann_gain = float(np.hanning(256).sum()) * 0.25  # A/2·Σw at A=0.5
    return fr.select(
        F.col("frame").cast("long").alias("frame"),
        "sample_rate",
        "n_spec_frames",
        F.size("mags").alias("n_bins"),
        (F.array_position(F.col("mags"), peak) - 1).cast("long").alias("peak_bin"),
        (
            (lo / peak > 0.3) & (lo / peak < 0.7)
            & (hi / peak > 0.3) & (hi / peak < 0.7)
        ).alias("neighbor_ok"),
        (far < 0.01 * peak).alias("sidelobe_ok"),
        (F.abs(peak - F.lit(hann_gain)) < 0.5).alias("peak_level_ok"),
    )


@query(
    "q155_stream_heavy_hitters",
    r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS item
        FROM documents WHERE trim(text) <> ''),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT item, CAST(count(*) AS BIGINT) AS cnt
    FROM tok, tot
    GROUP BY item, n
    HAVING count(*) > 0.005 * n
    """,
)
def q155(spark, sf_dir):
    """Driver gate for streaming heavy hitters (VERDICT r3 #4): the
    documents table is re-served as a REAL Structured-Streaming source
    (4 parquet files, maxFilesPerTrigger=1 → 4 micro-batches), tokens
    flow through ``stream_heavy_hitters`` — per-batch Misra–Gries merged
    into the persistent ≤199-counter state via the crash-safe parquet
    swap — and the state's whole-history superset guarantee is then
    cashed in exactly as the batch op does: exact-count the candidates,
    filter > phi·n. Output is EXACT whatever the batch split, so the
    oracle is q144's plain token-frequency SQL — a genuine value match
    for the streaming machinery. The ≤⌈1/phi⌉-row result is collected so
    the scratch stream/state dirs can be deleted before returning."""
    _prep(spark)
    import shutil
    import tempfile

    from polars_dataset_spark.functions.text import tokenize
    from polars_dataset_spark.streaming.ops import stream_heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    work = tempfile.mkdtemp(prefix="q155_stream_hh_")
    src, state, ckpt = f"{work}/src", f"{work}/state", f"{work}/ckpt"
    try:
        docs.select("doc_id", "text").repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .select(F.explode(tokenize(F.col("text"))).alias("item"))
        )
        sq = stream_heavy_hitters(
            stream, "item", state_path=state, phi=0.005, checkpoint_path=ckpt
        )
        sq.processAllAvailable()
        sq.awaitTermination(120)  # availableNow: self-terminates, no cancel race
        sq.stop()
        cand = spark.read.parquet(state).select("item").distinct()
        vals = docs.select(F.explode(tokenize(F.col("text"))).alias("item"))
        total = vals.count()
        out = (
            vals.join(F.broadcast(cand), "item", "left_semi")
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > F.lit(0.005) * F.lit(total))
        )
        rows = [(r.item, r.cnt) for r in out.collect()]
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "item string, cnt long")


@query(
    "q156_webp_decode",
    """
    SELECT CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
           CAST((t1.y * 11 + t2.x * 5) % 256 AS BIGINT) AS px
    FROM range(16) t1(y) CROSS JOIN range(16) t2(x)
    """,
)
def q156(spark, sf_dir):
    """Driver gate for the pure-python WebP-lossless decoder (VERDICT r3
    #7): a 16×16 fixture whose gray value follows the closed form
    ``(y·11 + x·5) mod 256`` (r = g = b) is VP8L-encoded with
    subtract-green, per-block predictor modes AND a color cache all
    enabled — so the gated path runs the canonical prefix-code reader,
    two inverse transforms and the cache — then pushed through
    ``decode_media(decoder='webp')`` on the executor and re-emitted
    per-pixel; the oracle restates the closed form in SQL, a full value
    match. VP8L is lossless, so float32 v/255·255 rounds back to v
    exactly (same argument as q153)."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_media
    from polars_dataset_spark.functions.webp import encode_webp_lossless

    yy, xx = np.mgrid[0:16, 0:16]
    gray = ((yy * 11 + xx * 5) % 256).astype(np.uint8)
    img = np.stack([gray, gray, gray], axis=2)
    blob = encode_webp_lossless(
        img,
        subtract_green=True,
        predictor=(np.arange(16).reshape(4, 4) % 14),
        predictor_bits=2,
        cache_bits=5,
    )
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    dec = decode_media(df, decoder="webp", target_size=(16, 16))
    px = dec.select(F.posexplode("decoded").alias("pos", "val"))
    return px.select(
        F.floor(F.col("pos") / 16).cast("long").alias("y"),
        (F.col("pos") % 16).cast("long").alias("x"),
        F.round(F.col("val") * 255).cast("long").alias("px"),
    )


@query(
    "q157_semantic_dedup",
    """
    WITH cent AS (
      SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
      FROM embeddings
      WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS BIGINT))
                      FROM embeddings)),
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
          FROM embeddings),
    dist AS (
      SELECT e.vec_id, cent.cell, list_distance(e.ev, cent.cv) AS d
      FROM e, cent),
    assign AS (
      SELECT vec_id, cell FROM dist
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a JOIN assign b USING (cell)
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE a.vec_id < b.vec_id
        AND round(list_cosine_similarity(ea.ev, eb.ev), 6) >= 0.35)
    SELECT ass.vec_id, CAST(ass.cell AS INT) AS cell,
           (d.vec_id IS NULL) AS kept
    FROM assign ass LEFT JOIN dropped d ON d.vec_id = ass.vec_id
    """,
)
def q157(spark, sf_dir):
    """SemDeDup semantic dedup (Abbas et al. 2023) over the embeddings
    table: coarse-quantizer cells, within-cell pairwise cosine, drop any
    vector with an earlier-id cell-mate at cosine ≥ 0.35. The quantizer
    is FIXED (centroids = the first max(8, ⌈n/250⌉) corpus vectors, the
    q58 pattern with the cell count SCALING with the corpus — ~250
    vectors per cell whatever the sf, so the within-cell pairwise stage
    stays linear; the upward off-scale sweep measured ×13.9 at 10× data
    with a constant cell count before this) so the ENTIRE algorithm —
    assignment ties, pair generation, the parallel earlier-id keep rule
    — replays exactly in SQL, the cell-count rule included via a scalar
    subquery; production use omits ``centroids`` and gets the
    sampled-KMeans quantizer."""
    _prep(spark)
    import math

    from polars_dataset_spark.functions import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = max(8, math.ceil(emb.count() / 250.0))
    cents = [r["embedding"] for r in emb.filter(F.col("vec_id") < n_cells)
             .orderBy("vec_id").select("embedding").collect()]
    return semantic_dedup(emb, threshold=0.35, centroids=cents)


@query(
    "q158_ridge_fit",
    """
    SELECT CAST(count(*) AS BIGINT) AS n, CAST(64 AS BIGINT) AS d,
           round((count(*) * sum(CAST(label AS DOUBLE) * CAST(label AS DOUBLE))
                  - sum(CAST(label AS DOUBLE)) * sum(CAST(label AS DOUBLE)))
                 / (count(*) * count(*)), 6) AS baseline_mse,
           true AS grad_ok, true AS beats_baseline_ok, true AS mse_consistent_ok
    FROM embeddings
    """,
)
def q158(spark, sf_dir):
    """Distributed closed-form ridge regression (functions/ml.py): ONE
    mapInPandas pass reduces every partition to its Gram moments
    ``(n, AᵀA, Aᵀy, yᵀy)``; the driver solves the (d+1)² normal
    equations — the exact optimum, no iterative solver, nothing
    driver-side scaling with rows (the q142 partial-moment shape). The
    trainable half of the model-quality story: q143 scores with fixed
    weights, this FITS weights on labels.

    CONTRACT oracle (the coefficient vector is solver-specific):
    ``baseline_mse`` is a genuine cross-engine VALUE check — the
    intercept-only MSE (population variance of y) falls out of the same
    distributed moments as integer-exact arithmetic ``(n·Σy² − (Σy)²)/n²``
    that DuckDB restates verbatim, anchoring the moment pass itself.
    The booleans certify (a) the normal-equation residual
    ``Aᵀ(y−ŷ) − λ[w;0]`` is ≈0 (the solve hit the ridge optimum),
    (b) training MSE beats the intercept-only baseline, and (c) the
    moment-derived MSE equals an INDEPENDENT second distributed pass —
    map-only ``linear_score`` + avg((y−ŷ)²) — to 1e-9, cross-verifying
    ``AᵀA``/``Aᵀy`` against the scorer. Coefficient numerics are pinned
    against a direct numpy lstsq in tests/test_ml.py."""
    _prep(spark)
    from polars_dataset_spark.functions import linear_score, ridge_fit

    emb = load_table(spark, sf_dir, "embeddings")
    model = ridge_fit(emb, "embedding", "label", lam=1.0)
    scored = linear_score(
        emb.withColumn("y", F.col("label").cast("double")), model, "embedding"
    )
    mse2 = scored.agg(
        F.avg((F.col("y") - F.col("score")) ** 2).alias("m")
    ).first()["m"]
    totals = emb.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("label").cast("long")).alias("sy"),
        F.sum((F.col("label") * F.col("label")).cast("long")).alias("syy"),
    ).first()
    n, sy, syy = totals["n"], totals["sy"], totals["syy"]
    baseline = (n * syy - sy * sy) / (n * n)  # exact below 2^53
    return spark.createDataFrame(
        [
            (
                model.n,
                int(model.weights.shape[0]),
                round(baseline, 6),
                bool(model.grad_inf < 1e-8),
                bool(model.mse <= baseline + 1e-12),
                bool(abs(model.mse - mse2) < 1e-9),
            )
        ],
        "n long, d long, baseline_mse double, grad_ok boolean, "
        "beats_baseline_ok boolean, mse_consistent_ok boolean",
    )


@query(
    "q159_binary_auc",
    """
    WITH s AS (
      SELECT CAST(floor(embedding[1] * 8) AS BIGINT) AS score,
             CAST(label % 2 AS BIGINT) AS y
      FROM embeddings),
    p AS (SELECT score FROM s WHERE y = 1),
    neg AS (SELECT score FROM s WHERE y = 0)
    SELECT CAST((SELECT count(*) FROM p) AS BIGINT) AS n_pos,
           CAST((SELECT count(*) FROM neg) AS BIGINT) AS n_neg,
           round(sum(CASE WHEN p.score > neg.score THEN 2
                          WHEN p.score = neg.score THEN 1
                          ELSE 0 END)::DOUBLE
                 / (2.0 * (SELECT count(*) FROM p)
                        * (SELECT count(*) FROM neg)), 6) AS auc
    FROM p CROSS JOIN neg
    """,
)
def q159(spark, sf_dir):
    """Exact distributed ROC-AUC (``binary_auc``) — the evaluation half
    of the model-quality story. Spark runs the SCALE path: group by
    score, cumulative negatives via the two-pass distributed prefix sum
    (no single-partition window), one aggregate with an all-integer
    rank-sum numerator. The oracle computes the same AUC by the
    brute-force pair definition (every pos×neg pair, ½ credit for
    ties) — a genuinely independent formulation, feasible at oracle
    scale. The score ``floor(embedding[0]·8)`` is integer-exact in both
    engines (float32→double exact, ×8 a power of two, floor) and lands
    ~17 distinct values over the corpus, so average-rank tie handling
    carries real weight in the value."""
    _prep(spark)
    from polars_dataset_spark.functions import binary_auc

    emb = load_table(spark, sf_dir, "embeddings")
    s = emb.select(
        F.floor(F.col("embedding")[0].cast("double") * 8).cast("long").alias("score"),
        (F.col("label") % 2).cast("long").alias("y"),
    )
    return binary_auc(s, "score", "y")


@query(
    "q160_compression_quality",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN text IS NOT NULL AND length(text) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
           true AS all_in_range, true AS prose_band,
           true AS rep_tiny, true AS noise_high, true AS rep_lt_noise
    FROM documents
    """,
)
def q160(spark, sf_dir):
    """Compressibility quality signal (``with_compression_ratio``):
    per-doc deflate ratio — the classic cheap corpus filter
    (boilerplate/repeated text compresses ≪ prose; random noise ≈ 1).
    Map-only Arrow-batched UDF; zlib releases the GIL.

    CONTRACT oracle (compressed size is not a cross-library constant):
    ``n_docs``/``n_scored`` are exact SQL values (scored = non-null
    non-empty, matching the UDF's null rule); the booleans certify the
    corpus ratios land in (0, 1.2] with a prose-band mean (0.2, 0.9),
    and — on two deterministic in-query fixtures — that a repeated
    two-word page compresses under 0.05 while an md5-hex chain (half-
    entropy symbols) stays above 0.4 and above the repeated page.
    Monotonicity (more repetition → lower ratio) tested in
    tests/test_functions.py."""
    _prep(spark)
    from polars_dataset_spark.functions import with_compression_ratio

    docs = load_table(spark, sf_dir, "documents")
    scored = with_compression_ratio(docs, "text")
    stats = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("compression_ratio").alias("n_scored"),
        F.min("compression_ratio").alias("lo"),
        F.max("compression_ratio").alias("hi"),
        F.avg("compression_ratio").alias("mean"),
    ).first()
    import hashlib

    rep = "lorem ipsum " * 400
    chain, h = [], b"seed"
    for _ in range(300):
        h = hashlib.md5(h).digest()
        chain.append(h.hex())
    noise = "".join(chain)
    fix = with_compression_ratio(
        spark.createDataFrame([("rep", rep), ("noise", noise)], "k string, text string"),
        "text",
    )
    fr = {r["k"]: r["compression_ratio"] for r in fix.collect()}
    return spark.createDataFrame(
        [
            (
                stats["n_docs"],
                stats["n_scored"],
                bool(stats["lo"] > 0.0 and stats["hi"] <= 1.2),
                bool(0.2 < stats["mean"] < 0.9),
                bool(fr["rep"] < 0.05),
                bool(fr["noise"] > 0.4),
                bool(fr["rep"] < fr["noise"]),
            )
        ],
        "n_docs long, n_scored long, all_in_range boolean, prose_band boolean, "
        "rep_tiny boolean, noise_high boolean, rep_lt_noise boolean",
    )


@query(
    "q161_repeated_substrings",
    r"""
    WITH d AS (
        SELECT doc_id,
               CASE WHEN trim(text) = '' THEN []
                    ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
                   AS toks
        FROM documents),
    g0 AS (
        SELECT doc_id, toks,
               unnest(range(0, CASE WHEN len(toks) >= 8
                                    THEN len(toks) - 7 ELSE 0 END)) AS gpos
        FROM d),
    g AS (
        SELECT doc_id, gpos,
               md5(array_to_string(
                   list_transform(toks[gpos + 1 : gpos + 8], t -> md5(t)),
                   '')) AS gkey
        FROM g0),
    dup AS (SELECT gkey FROM g GROUP BY gkey HAVING count(*) >= 2),
    h AS (SELECT doc_id, gpos FROM g JOIN dup USING (gkey)),
    tok AS (
        SELECT doc_id, unnest(toks) AS tok,
               unnest(range(0, len(toks))) AS pos
        FROM d),
    c AS (
        SELECT t.doc_id, t.pos, t.tok,
               max(CASE WHEN h.gpos IS NOT NULL THEN t.pos END)
                   OVER (PARTITION BY t.doc_id ORDER BY t.pos) AS runmax
        FROM tok t LEFT JOIN h ON h.doc_id = t.doc_id AND h.gpos = t.pos),
    m AS (
        SELECT doc_id, pos, tok,
               (runmax IS NOT NULL AND runmax >= pos - 7) AS cov
        FROM c),
    a AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN cov THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
               coalesce(string_agg(CASE WHEN NOT cov THEN tok END,
                                   ' ' ORDER BY pos), '') AS cleaned_text
        FROM m GROUP BY doc_id)
    SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
           coalesce(a.n_removed, 0) AS n_removed,
           coalesce(a.cleaned_text, '') AS cleaned_text
    FROM d LEFT JOIN a USING (doc_id)
    """,
)
def q161(spark, sf_dir):
    """Exact repeated-substring excision (``remove_repeated_substrings``,
    Lee et al. 2022 at token granularity): every 8-token window whose
    exact content occurs twice+ anywhere in the corpus is cut, surviving
    tokens rejoined — the span-level dedup that catches shared
    boilerplate document-level MinHash cannot. FULL value oracle: gram
    keys are md5 (engine-portable), coverage is the running-max window
    identity, and the rebuilt text is compared string-exact per doc —
    the near-dup documents in the fixture share long real spans, so
    removal carries weight, while unique docs prove no false positives."""
    _prep(spark)
    from polars_dataset_spark.functions import remove_repeated_substrings

    docs = load_table(spark, sf_dir, "documents")
    return remove_repeated_substrings(docs, "doc_id", "text", k=8).select(
        "doc_id", "n_tokens", "n_removed", "cleaned_text"
    )


@query(
    "q162_quality_keep_dedup",
    r"""
    WITH RECURSIVE
    d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),"""
    + _jaccard_pair_ctes(0.7)
    + r""",
    e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT reach.id, e.t FROM reach JOIN e ON reach.r = e.s),
    comp AS (SELECT id, min(r) AS root FROM reach GROUP BY id),
    q AS (
      SELECT comp.id, comp.root, doc.n_chars
      FROM comp JOIN documents doc ON doc.doc_id = comp.id),
    keep AS (
      SELECT id FROM q
      QUALIFY row_number() OVER (PARTITION BY root
                                 ORDER BY n_chars DESC, id) = 1)
    SELECT doc.doc_id, doc.lang, CAST(doc.n_chars AS BIGINT) AS n_chars
    FROM documents doc JOIN keep ON doc.doc_id = keep.id
    """,
)
def q162(spark, sf_dir):
    """Quality-aware transitive dedup (``dedup_by_components(quality_col=
    ...)``): LSH near-dup pairs → connected components → keep the
    HIGHEST-``n_chars`` member per cluster (ties to the lower id) — the
    representative rule production pipelines want (keep the clean/longer
    original, not whichever copy got the smaller id). Same end-to-end
    value oracle as q64 (exact-Jaccard pair graph closed with a
    recursive CTE), with the per-component argmax keep rule replayed in
    SQL — so q64 and q162 together pin BOTH keep policies."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        dedup_by_components,
        minhash_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, threshold=0.7)
    return dedup_by_components(docs, pairs, quality_col="n_chars").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("n_chars")
    )


@query(
    "q163_datafile_csv",
    """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    """,
)
def q163(spark, sf_dir):
    """Driver gate for the ``Datafile`` CSV scan/sink (reference
    ``polars_dataset.py:309-338``): the nation table round-trips through
    ``Datafile.write`` (header CSV, single-file) and ``Datafile.load``
    (header + schema inference, index binding -> Dataset), and the loaded
    values must match the source table EXACTLY — a full value oracle over
    the whole write->parse->infer->load path. The reference's no-throw
    missing-file contract (load -> None) is asserted in the same gate."""
    _prep(spark)
    import shutil
    import tempfile

    from polars_dataset_spark.sources.datafile import Datafile

    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    work = tempfile.mkdtemp(prefix="q163_datafile_")
    try:
        df_file = Datafile(f"{work}/nation.csv", index="n_nationkey")
        df_file.write(nation)
        missing = Datafile(f"{work}/nope.csv").load(spark)
        if missing is not None:  # reference contract: log + None, no raise
            raise AssertionError("Datafile.load on a missing path must return None")
        loaded = df_file.load(spark)
        rows = (
            loaded.df.select(
                F.col("n_nationkey").cast("long"),
                "n_name",
                F.col("n_regionkey").cast("long"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        rows, "n_nationkey long, n_name string, n_regionkey long"
    )


@query(
    "q164_create_dataset_manifest",
    """
    SELECT CAST(10 * j AS BIGINT) AS temperature, CAST(i AS BIGINT) AS x,
           CAST((i * 3 + j * 7) % 11 AS BIGINT) AS y
    FROM range(3) t(j) CROSS JOIN range(10) s(i)
    """,
)
def q164(spark, sf_dir):
    """Driver gate for ``create_dataset`` multi-file TSV ingestion
    (reference ``build/lib/polars_dataset.py:385-454``): three headerless
    tab-separated trace files (each led by a ``#`` comment line that the
    scan must skip) whose values follow the closed form
    ``y = (3i + 7j) mod 11`` are ingested in ONE distributed scan, id
    values attached by joining the path manifest on input_file_name().
    The oracle restates the closed form, so every cell — including the
    per-file literal id column — is a full value match."""
    _prep(spark)
    import shutil
    import tempfile

    from polars_dataset_spark.sources.datafile import create_dataset

    work = tempfile.mkdtemp(prefix="q164_manifest_")
    try:
        manifest = []
        for j in range(3):
            path = f"{work}/trace_{j}.tsv"
            with open(path, "w") as fh:
                fh.write("# comment line the scan must skip\n")
                for i in range(10):
                    fh.write(f"{i}\t{(i * 3 + j * 7) % 11}\n")
            manifest.append({"path": path, "temperature": 10 * j})
        ds = create_dataset(spark, manifest, index="x", column_names=["x", "y"])
        rows = (
            ds.df.select(
                F.col("temperature").cast("long"),
                F.col("x").cast("long"),
                F.col("y").cast("long"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(rows, "temperature long, x long, y long")


@query(
    "q165_zorder_audit",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows, true AS rows_preserved,
           true AS multi_file, true AS user_clustered, true AS value_clustered
    FROM events
    """,
)
def q165(spark, sf_dir):
    """Driver gate for Z-order clustered writes (q76/q142-style contract
    oracle): events written via ``write_zordered(cols=[user_id, value])``
    into 16 z-range files, then audited with ``file_ranges`` — the
    per-file min/max statistics a skipping reader uses. Contract: row
    count preserved exactly (value-matched against the oracle's count),
    output is genuinely multi-file, and the MEAN per-file span of BOTH
    dimensions is under 60% of the global span (a single-column sort or
    an unclustered write fails one or both dimensions; true z-order at 16
    files lands near 25% each). Exact per-file boundaries are
    quantile-dependent, hence a contract — the layout plan itself is
    asserted Exchange-by-Exchange in tests/test_plans.py."""
    _prep(spark)
    import shutil
    import tempfile

    from polars_dataset_spark.sources.zorder import file_ranges, write_zordered

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_in = ev.count()
    work = tempfile.mkdtemp(prefix="q165_zorder_")
    try:
        path = f"{work}/events_z"
        write_zordered(ev, path, ["user_id", "value"], num_files=16)
        n_out = spark.read.parquet(path).count()
        ranges = file_ranges(spark, path, ["user_id", "value"]).collect()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    n_files = len(ranges)

    def mean_span_frac(lo_col, hi_col):
        lo = min(r[lo_col] for r in ranges)
        hi = max(r[hi_col] for r in ranges)
        if hi == lo:
            return 0.0
        return sum(float(r[hi_col]) - float(r[lo_col]) for r in ranges) / (
            n_files * (float(hi) - float(lo))
        )

    return spark.createDataFrame(
        [
            (
                n_out,
                n_out == n_in,
                n_files >= 2,
                mean_span_frac("user_id_min", "user_id_max") < 0.6,
                mean_span_frac("value_min", "value_max") < 0.6,
            )
        ],
        "n_rows long, rows_preserved boolean, multi_file boolean, "
        "user_clustered boolean, value_clustered boolean",
    )


@query(
    "q166_kmeans_step",
    """
    WITH cent AS (
      SELECT vec_id AS cell, list_transform(embedding, x -> x::DOUBLE) AS cv
      FROM embeddings WHERE vec_id < 8),
    e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS ev
          FROM embeddings),
    dist AS (
      SELECT e.vec_id, cent.cell, list_distance(e.ev, cent.cv) AS dd
      FROM e CROSS JOIN cent),
    assign AS (
      SELECT vec_id, cell, dd FROM dist
      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dd, cell) = 1),
    inert AS (SELECT round(sum(dd * dd), 6) AS inertia FROM assign),
    dims AS (
      SELECT a.cell, generate_subscripts(e.ev, 1) AS dim, unnest(e.ev) AS val
      FROM assign a JOIN e USING (vec_id)),
    newc AS (
      SELECT cell, CAST(dim AS INT) AS dim, round(avg(val), 6) AS val
      FROM dims GROUP BY cell, dim),
    sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS n FROM assign GROUP BY cell)
    SELECT CAST(s.cell AS INT) AS cell, s.n, newc.dim, newc.val, inert.inertia
    FROM sizes s JOIN newc USING (cell) CROSS JOIN inert
    """,
)
def q166(spark, sf_dir):
    """Distributed Lloyd's k-means (``ml.kmeans_fit``) — one exact
    refinement step from a FIXED init (the first 8 corpus vectors, the
    q58/q157 pattern), so assignment (argmin, ties to the lower cell),
    the per-cell moment reduction, the centroid update AND the inertia
    all replay in SQL — a full value oracle over the whole distributed
    iteration: per-batch broadcast argmin, one groupBy(cell) with
    map-side combine, driver sees exactly k moment rows. Multi-iteration
    convergence vs a numpy reference is pinned in tests/test_ml.py.

    Output is posexploded to scalar ``(cell, n, dim, val, inertia)``
    rows: the driver's canonicalizer hashes stringified pandas cells and
    cannot sort ``array<double>`` columns (r5's one red row)."""
    _prep(spark)
    from polars_dataset_spark.functions import kmeans_fit

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 8)
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    model = kmeans_fit(emb, k=8, iters=1, init_centroids=cents, tol=None)
    rows = [
        (int(c), int(model.sizes[c]), [float(v) for v in model.centroids[c]],
         float(model.inertia))
        for c in range(len(model.centroids))
    ]
    raw = spark.createDataFrame(
        rows, "cell int, n long, centroid array<double>, inertia double"
    )
    return raw.select(
        "cell", "n", F.round("inertia", 6).alias("inertia"),
        F.posexplode("centroid").alias("dim", "val"),
    ).select(
        "cell",
        "n",
        (F.col("dim") + 1).cast("int").alias("dim"),
        F.round("val", 6).alias("val"),
        "inertia",
    )


@query(
    "q167_training_shards",
    """
    WITH h AS (
      SELECT doc_id,
             ('0x' || substr(md5('s5' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 AS hv
      FROM documents),
    s AS (
      SELECT doc_id, hv, CAST(hv % 8 AS INT) AS shard,
             row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS rn
      FROM h)
    SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
           min_by(doc_id, hv) AS first_doc, max_by(doc_id, hv) AS last_doc,
           CAST(sum(rn * doc_id) AS BIGINT) AS order_check
    FROM s GROUP BY shard
    """,
)
def q167(spark, sf_dir):
    """Deterministic training shards (``functions.shards``): the global
    pseudo-random shuffle a trainer consumes — md5-uniform shard
    assignment (balanced, reproducible across engines/runs/cluster
    sizes) and a deterministic within-shard order. The oracle replays
    the hash arithmetic (the q66/q67 md5 pattern) and pins the ORDER
    itself via a position-weighted checksum ``Σ rank·doc_id`` plus the
    first/last doc per shard — any reordering or reassignment breaks a
    value. The physical writer (one hash shuffle, per-task sorted
    hive-partitioned output) is exercised in tests/test_functions.py."""
    _prep(spark)
    from pyspark.sql import Window

    from polars_dataset_spark.functions import assign_training_shards

    docs = load_table(spark, sf_dir, "documents")
    a = assign_training_shards(docs, "doc_id", n_shards=8, salt="s5")
    w = Window.partitionBy("shard").orderBy("shard_pos", "doc_id")
    return (
        a.withColumn("rn", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min_by("doc_id", "shard_pos").alias("first_doc"),
            F.max_by("doc_id", "shard_pos").alias("last_doc"),
            F.sum(F.col("rn") * F.col("doc_id")).alias("order_check"),
        )
    )


@query(
    "q168_gopher_rules",
    r"""
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks,
             length(regexp_replace(trim(lower(text)), '\s+', '', 'g')) AS nc
      FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             nc::DOUBLE / nullif(len(toks), 0) AS mean_len,
             (length(text) - length(replace(text, '#', ''))
              + len(regexp_extract_all(text, '\.\.\.')))::DOUBLE
                 / nullif(len(toks), 0) AS sym_ratio,
             len(list_filter(string_split(text, chr(10)),
                             l -> regexp_matches(trim(l), '\.\.\.$')))::DOUBLE
                 / len(string_split(text, chr(10))) AS ell_ratio,
             len(list_filter(string_split(text, chr(10)),
                             l -> regexp_matches(trim(l), '^[-*•]')))::DOUBLE
                 / len(string_split(text, chr(10))) AS bul_ratio,
             len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))::DOUBLE
                 / nullif(len(toks), 0) AS alpha_ratio,
             len(list_distinct(list_intersect(toks,
                 ['the','and','of','to','in','is','that','it','for','with'])))
                 AS n_stops
      FROM t),
    r AS (
      SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
             (n_words >= 25 AND n_words <= 100000) AS rule_word_count,
             coalesce(mean_len >= 3.0 AND mean_len <= 4.5, false)
                 AS rule_mean_word_len,
             coalesce(sym_ratio <= 0.1, false) AS rule_symbol_ratio,
             (ell_ratio <= 0.3) AS rule_ellipsis_lines,
             (bul_ratio <= 0.9) AS rule_bullet_lines,
             coalesce(alpha_ratio >= 0.8, false) AS rule_alpha_words,
             (n_stops >= 1) AS rule_stopwords
      FROM m)
    SELECT *,
           (rule_word_count AND rule_mean_word_len AND rule_symbol_ratio
            AND rule_ellipsis_lines AND rule_bullet_lines AND rule_alpha_words
            AND rule_stopwords) AS gopher_keep
    FROM r
    """,
)
def q168(spark, sf_dir):
    """Gopher-style hard quality rules (Rae et al. 2021) as per-rule
    boolean columns + the conjunction — the structural document filter
    production corpora apply before any soft scoring. Full value oracle:
    every rule's arithmetic (word counts, exact integer-ratio divisions,
    line/ellipsis/bullet scans, distinct-stopword counts) restates in
    SQL, and the thresholds are tuned so each data-dependent rule splits
    the fixture corpus both ways (word-count, mean-word-length and
    stopword rules all carry discriminating weight; the boolean
    comparisons are engine-exact because both engines divide the same
    integers). Map-only codegen'd expressions, no UDF."""
    _prep(spark)
    from polars_dataset_spark.functions import with_gopher_rules

    docs = load_table(spark, sf_dir, "documents")
    out = with_gopher_rules(
        docs,
        min_words=25,
        min_mean_word_len=3.0,
        max_mean_word_len=4.5,
        min_distinct_stopwords=1,
    )
    toks_n = F.size(
        F.when(
            F.length(F.trim(F.col("text"))) == 0, F.array().cast("array<string>")
        ).otherwise(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    )
    return out.select(
        "doc_id",
        toks_n.cast("long").alias("n_words"),
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_ellipsis_lines",
        "rule_bullet_lines",
        "rule_alpha_words",
        "rule_stopwords",
        "gopher_keep",
    )


@query(
    "q169_cap_per_source",
    """
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5('s5' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 AS hv
      FROM documents)
    SELECT doc_id, source FROM h
    QUALIFY row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) <= 17
    """,
)
def q169(spark, sf_dir):
    """Per-domain quota (``sampling.cap_per_group``): at most 17 docs per
    source, chosen by the deterministic md5 order — the cap web-scale
    corpora apply so a few giant domains can't dominate the token budget,
    reproducible because the 'random' choice is a pure function of
    (salt, id). Full value oracle: the exact kept SET replays via the
    q66/q67 portable-hash arithmetic; every source holds 25 docs at
    sf0.01 so the 17-cap bites everywhere (kept set = 20x17 = 340)."""
    _prep(spark)
    from polars_dataset_spark.functions import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "source", n_max=17, id_col="doc_id", salt="s5").select(
        "doc_id", "source"
    )


@query(
    "q170_compact_files",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(64 AS BIGINT) AS files_before,
           CAST(ceil(count(*) / 1750.0) AS BIGINT) AS files_after,
           true AS listing_matches, true AS rows_preserved
    FROM events
    """,
)
def q170(spark, sf_dir):
    """Small-file compaction (``sources.compact_files``) — the
    OPTIMIZE-style table maintenance a long-lived parquet dataset needs:
    events deliberately shattered into 64 tiny files, compacted to
    ceil(rows/1750) evenly-sized files with one round-robin repartition
    and the crash-safe Hadoop-FS staging swap. The oracle pins the exact
    row count, the before/after file counts, that the POST-swap physical
    listing equals the plan, and row preservation through the rewrite."""
    _prep(spark)
    import shutil
    import tempfile

    from polars_dataset_spark.sources.compact import _data_files, compact_files

    ev = load_table(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="q170_compact_")
    try:
        path = f"{work}/events_small"
        ev.repartition(64).write.parquet(path)
        stats = compact_files(spark, path, target_rows=1750)
        listed = len(_data_files(spark, path))
        n_after = spark.read.parquet(path).count()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                stats.n_rows,
                stats.files_before,
                stats.files_after,
                listed == stats.files_after,
                n_after == stats.n_rows,
            )
        ],
        "n_rows long, files_before long, files_after long, "
        "listing_matches boolean, rows_preserved boolean",
    )


@query(
    "q171_strip_markup",
    r"""
    SELECT doc_id,
           trim(regexp_replace(
               concat(coalesce(text, ''), ' A & B <tag> "q" ''s'' end'),
               '\s+', ' ', 'g')) AS clean_text
    FROM documents
    """,
)
def q171(spark, sf_dir):
    """HTML/markup stripping (``text.strip_markup``) — the first step of
    every web-corpus pipeline: each document is wrapped in a
    deterministic page (style + script blocks, a comment, tags, and
    every supported entity), stripped, and the oracle states the exact
    recovered text — the original document (markup-free by fixture
    construction) plus the decoded literal suffix, whitespace-collapsed.
    Script/style contents, the comment and all tags must vanish;
    ``&lt;tag&gt;`` must survive as VISIBLE ``<tag>`` (strip-then-decode
    order); every byte of the output is value-checked per doc."""
    _prep(spark)
    from polars_dataset_spark.functions import strip_markup

    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit(
            '<html><head><style>p{color:red}</style>'
            '<script type="t">var x = "</p>"; if (x<1) {}</script></head>'
            '<body><!-- generated\n wrapper --><p class="d">'
        ),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(
            "</p>\n<div>A &amp; B &lt;tag&gt; &quot;q&quot; "
            "&#39;s&#39;&nbsp;end</div></body></html>"
        ),
    )
    wrapped = docs.select("doc_id", page.alias("text"))
    return strip_markup(wrapped).select("doc_id", "clean_text")


@query(
    "q172_curation_pipeline",
    r"""
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN []
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks,
             length(regexp_replace(trim(lower(text)), '\s+', '', 'g')) AS nc
      FROM documents),
    kept AS (
      SELECT doc_id, source, len(toks) AS n_tokens
      FROM t
      WHERE len(toks) >= 25
        AND coalesce(nc::DOUBLE / nullif(len(toks), 0) BETWEEN 3.0 AND 4.5,
                     false)
        AND len(list_distinct(list_intersect(toks,
            ['the','and','of','to','in','is','that','it','for','with']))) >= 1),
    capped AS (
      SELECT doc_id, source, n_tokens,
             ('0x' || substr(md5('s5' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 AS hv
      FROM kept
      QUALIFY row_number() OVER (PARTITION BY source ORDER BY
          ('0x' || substr(md5('s5' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
          doc_id) <= 15)
    SELECT CAST(hv % 4 AS INT) AS shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min_by(doc_id, hv) AS first_doc
    FROM capped GROUP BY shard
    """,
)
def q172(spark, sf_dir):
    """End-to-end curation composition for the round-5 operator family —
    the q60 pattern: Gopher hard rules → per-source quota cap →
    deterministic training-shard assignment → per-shard token budget.
    The whole CHAIN (rule arithmetic, the cap's hash order interacting
    with the rule survivors, the shard split of the capped set, token
    sums per shard) replays in one SQL statement, so stage ORDERING and
    interaction are value-checked, not just each stage alone. Note the
    cap and the shard assignment share one portable hash — the oracle
    proves they compose without re-ranking surprises."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        assign_training_shards,
        cap_per_group,
        with_gopher_rules,
        with_token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    kept = with_gopher_rules(
        docs,
        min_words=25,
        min_mean_word_len=3.0,
        max_mean_word_len=4.5,
        min_distinct_stopwords=1,
    ).filter(
        F.col("rule_word_count")
        & F.col("rule_mean_word_len")
        & F.col("rule_stopwords")
    )
    kept = with_token_count(kept, mode="whitespace")
    capped = cap_per_group(kept, "source", n_max=15, id_col="doc_id", salt="s5")
    sharded = assign_training_shards(capped, "doc_id", n_shards=4, salt="s5")
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min_by("doc_id", "shard_pos").alias("first_doc"),
    )


@query(
    "q173_tiff_decode",
    """
    SELECT CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
           CAST((t1.y * 7 + t2.x * 13) % 256 AS BIGINT) AS px
    FROM range(16) t1(y) CROSS JOIN range(16) t2(x)
    """,
)
def q173(spark, sf_dir):
    """Driver gate for the pure-python baseline TIFF decoder (q153/q156
    pattern): a 16×16 fixture whose pixels follow the closed form
    ``(y·7 + x·13) mod 256`` is TIFF-encoded with the HARD options —
    big-endian byte order, TIFF-LZW (so the MSB-first variable-width
    reader and its early code-width change run), horizontal-differencing
    predictor, and a 5-row strip split — pushed through
    ``decode_media(decoder='tiff')`` on the executor and re-emitted
    per-pixel; the oracle restates the closed form, so every pixel is a
    full value match through decompression, prediction and strip
    reassembly. The 8-bit gray round-trip is exact (v/255·255 → v)."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_media
    from polars_dataset_spark.functions.tiff import encode_tiff_gray

    yy, xx = np.mgrid[0:16, 0:16]
    img = ((yy * 7 + xx * 13) % 256).astype(np.float64) / 255.0
    blob = encode_tiff_gray(
        img, compression="lzw", predictor=2, byte_order=">", rows_per_strip=5
    )
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    dec = decode_media(df, decoder="tiff", target_size=(16, 16))
    px = dec.select(F.posexplode("decoded").alias("pos", "val"))
    return px.select(
        F.floor(F.col("pos") / 16).cast("long").alias("y"),
        (F.col("pos") % 16).cast("long").alias("x"),
        F.round(F.col("val") * 255).cast("long").alias("px"),
    )


@query(
    "q174_flac_decode",
    """
    WITH s AS (
      SELECT ((i * 37) % 1001 - 500) / 32768.0 AS l,
             ((i * 53) % 997 - 498) / 32768.0 AS r
      FROM range(2000) t(i)),
    m AS (SELECT (l + r) / 2 AS v FROM s)
    SELECT 8000 AS sample_rate, 2 AS n_channels, CAST(2000 AS BIGINT) AS n_frames,
           CAST(0.25 AS DOUBLE) AS duration_s,
           round(sqrt(avg(v * v)), 6) AS rms,
           round(max(abs(v)), 6) AS peak
    FROM m
    """,
)
def q174(spark, sf_dir):
    """Driver gate for the pure-python FLAC decoder: a closed-form stereo
    signal (``L = (37i mod 1001) − 500``, ``R = (53i mod 997) − 498``) is
    FLAC-encoded through the HARD path — mid/side decorrelation, fixed
    order-2 predictors, Rice-coded partitioned residuals, CRC-8/16 —
    decoded by ``decode_audio`` on the executor, and the oracle restates
    the audio statistics from the closed form. The channel-mean mono
    values are EXACT dyadic rationals (÷32768 and ÷2 are power-of-two),
    so rms/peak/duration match to round-6 across engines; any bit error
    anywhere in subframe decode, stereo reconstruction or rice coding
    shifts rms/peak and fails the value hash."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_audio
    from polars_dataset_spark.functions.flac import encode_flac

    i = np.arange(2000)
    frames = np.stack(
        [(i * 37) % 1001 - 500, (i * 53) % 997 - 498], axis=1
    ).astype(np.int64)
    blob = encode_flac(
        frames, rate=8000, stereo_mode="mid_side", subframe="fixed", order=2,
        partition_order=2, blocksize=500,
    )
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    out = decode_audio(df)
    return out.select(
        "sample_rate",
        "n_channels",
        "n_frames",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    )


@query(
    "q175_dsir_weights",
    r"""
    WITH d AS (
      SELECT doc_id, lang = 'en' AS is_target,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, is_target,
             CASE WHEN norm = '' THEN CAST([] AS VARCHAR[])
                  ELSE string_split(norm, ' ') END AS toks
      FROM d),
    g AS (
      SELECT doc_id, is_target,
             list_concat(toks,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE CAST([] AS VARCHAR[]) END) AS grams
      FROM tok),
    inst AS (
      SELECT doc_id, is_target,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT % 1024 AS bucket
      FROM g, unnest(grams) AS u(gram)),
    feats AS (
      SELECT doc_id, is_target, bucket, count(*) AS cnt
      FROM inst GROUP BY 1, 2, 3),
    marg AS (
      SELECT bucket, sum(cnt) AS r_b,
             sum(CASE WHEN is_target THEN cnt ELSE 0 END) AS t_b
      FROM feats GROUP BY 1),
    tot AS (SELECT sum(r_b) AS rr, sum(t_b) AS tt FROM marg),
    ratios AS (
      SELECT bucket,
             CAST(round(ln((t_b + 1.0) / (tt + 1024.0))
                        - ln((r_b + 1.0) / (rr + 1024.0)), 7)
                  AS DECIMAL(20,7)) AS lr
      FROM marg, tot),
    agg AS (
      SELECT f.doc_id, any_value(f.is_target) AS is_target,
             CAST(sum(f.cnt) AS BIGINT) AS n_grams,
             CAST(round(sum(f.cnt * r.lr), 4) AS DOUBLE) AS dsir_logw,
             2 * CAST(sum(f.cnt * r.lr) * 10000000 AS HUGEINT)
               + 1000 * CAST(sum(f.cnt) AS HUGEINT) AS a,
             2000 * CAST(sum(f.cnt) AS HUGEINT) AS b
      FROM feats f JOIN ratios r USING (bucket)
      GROUP BY f.doc_id)
    SELECT doc_id, is_target, n_grams, dsir_logw,
           CAST((a - ((a % b + b) % b)) // b AS DOUBLE) / 10000.0
             AS dsir_logw_per_gram
    FROM agg
    """,
)
def q175(spark, sf_dir):
    """DSIR importance weighting (functions/dsir.py): hashed
    unigram+bigram bag-of-buckets models fit on the English subset
    (target) vs the whole corpus (raw), per-doc log likelihood ratio.
    Full value oracle: the ENTIRE pipeline — tokenization, gram
    formation, md5 bucket hash, smoothed marginals, round-7 DECIMAL
    log-ratio accumulation — restated in SQL; per-bucket ratios round
    to 7 and sum as DECIMAL so the per-doc sums are exact on both
    engines. Scale: one instance-keyed shuffle (map-side combined),
    bucket marginals collapse to ≤1024 rows, ratio table broadcast."""
    _prep(spark)
    from polars_dataset_spark.functions import dsir_score

    docs = load_table(spark, sf_dir, "documents")
    return dsir_score(docs, F.col("lang") == "en", buckets=1024, alpha=1.0)


@query(
    "q176_leakage_safe_split",
    r"""
    WITH RECURSIVE
    d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, CASE WHEN norm = '' THEN [''] ELSE string_split(norm, ' ') END AS toks
      FROM d),
    sh AS (
      SELECT doc_id, CASE WHEN len(toks) >= 3
        THEN list_distinct(list_transform(range(1, len(toks) - 1),
                                          i -> array_to_string(toks[i:i+2], ' ')))
        ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM tok),"""
    + _jaccard_pair_ctes(0.7)
    + r""",
    e AS (SELECT id_a AS s, id_b AS t FROM p UNION SELECT id_b, id_a FROM p),
    reach AS (
      SELECT doc_id AS id, doc_id AS r FROM documents
      UNION
      SELECT reach.id, e.t FROM reach JOIN e ON reach.r = e.s),
    comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
    lab AS (
      SELECT doc.doc_id, comp.component,
             substr(md5('split' || CAST(comp.component AS VARCHAR)), 1, 15) AS hx
      FROM documents doc JOIN comp ON doc.doc_id = comp.id)
    SELECT doc_id, component,
           CASE WHEN hx <= 'ccccccccccccccc' THEN 'train'
                WHEN hx <= 'e66666666666666' THEN 'val'
                ELSE 'test' END AS split
    FROM lab
    """,
)
def q176(spark, sf_dir):
    """Leakage-safe train/val/test split (functions/shards.py): MinHash
    near-dup clusters (LSH candidates → connected components) are
    assigned ATOMICALLY to one split by hashing the cluster
    representative — a paraphrase of a test doc can never land in
    train. Full value oracle: exact-Jaccard pair graph (recall 1 on the
    fixture, the q37/q64 argument) closed with a recursive CTE, then
    the identical md5-hex threshold compare with EXACT Fraction-derived
    boundaries (0.8 → 'ccccccccccccccc'). Scale: CC is the
    large/small-star contraction; the split itself is one left join +
    map-only hash compare."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        leakage_safe_split,
        minhash_lsh_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(docs, threshold=0.7)
    return leakage_safe_split(docs, pairs).select("doc_id", "component", "split")


@query(
    "q177_g711_decode",
    """
    WITH mu AS (
      SELECT 255 - ((i * 7) % 256) AS u FROM range(2048) t(i)),
    mud AS (
      SELECT CASE WHEN u >= 128
                  THEN -((((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132)
                  ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
             END / 32768.0 AS v
      FROM mu),
    al AS (
      SELECT xor((i * 11) % 256, 85) AS a FROM range(2048) t(i)),
    ald AS (
      SELECT CASE WHEN a >= 128 THEN mag ELSE -mag END / 32768.0 AS v
      FROM (SELECT a, CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                           ELSE (((a % 16) * 16) + 264) << (((a // 16) % 8) - 1)
                      END AS mag
            FROM al))
    SELECT 6 AS media_id, 8000 AS sample_rate, 1 AS n_channels,
           CAST(2048 AS BIGINT) AS n_frames, CAST(0.256 AS DOUBLE) AS duration_s,
           round(sqrt(avg(v * v)), 6) AS rms, round(max(abs(v)), 6) AS peak
    FROM ald
    UNION ALL
    SELECT 7, 8000, 1, CAST(2048 AS BIGINT), CAST(0.256 AS DOUBLE),
           round(sqrt(avg(v * v)), 6), round(max(abs(v)), 6)
    FROM mud
    """,
)
def q177(spark, sf_dir):
    """Driver gate for the G.711 telephony decoders (functions/g711.py):
    every byte value 0..255 appears in each ramp payload, so the oracle —
    which restates the FULL bit-field decode arithmetic (complement /
    XOR 0x55, sign, exponent shift, mantissa, bias) in SQL — checks the
    decoder at every quantization level, through the real WAV container
    path (format tags 6/7) on the executor. Any wrong bit anywhere in
    either companding law shifts rms/peak and fails the value hash."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_audio
    from polars_dataset_spark.functions.g711 import g711_wav_bytes

    i = np.arange(2048)
    alaw = bytes(((i * 11) % 256).astype(np.uint8))
    mulaw = bytes(((i * 7) % 256).astype(np.uint8))
    df = spark.createDataFrame(
        [
            (6, bytearray(g711_wav_bytes(alaw, fmt_tag=6))),
            (7, bytearray(g711_wav_bytes(mulaw, fmt_tag=7))),
        ],
        "media_id int, content binary",
    )
    out = decode_audio(df)
    return out.select(
        "media_id",
        "sample_rate",
        "n_channels",
        "n_frames",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    )


@query(
    "q178_key_skew_profile",
    """
    WITH stream AS (
      SELECT 'lang' AS col_name, coalesce(CAST(lang AS VARCHAR), '<null>') AS value
      FROM documents
      UNION ALL
      SELECT 'source', coalesce(CAST(source AS VARCHAR), '<null>') FROM documents
      UNION ALL
      SELECT 'doc_id', coalesce(CAST(doc_id AS VARCHAR), '<null>') FROM documents),
    v AS (
      SELECT col_name, value, count(*) AS cnt FROM stream GROUP BY 1, 2),
    agg AS (
      SELECT col_name, CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(cnt) AS BIGINT) AS top1_cnt
      FROM v GROUP BY 1),
    t AS (
      SELECT v.col_name, max(v.value) AS top1_key
      FROM v JOIN agg ON v.col_name = agg.col_name AND v.cnt = agg.top1_cnt
      GROUP BY 1)
    SELECT agg.col_name, n_rows, n_distinct, top1_key, top1_cnt,
           round(top1_cnt::DOUBLE / n_rows, 6) AS top1_share,
           round(top1_cnt::DOUBLE * n_distinct / n_rows, 4) AS skew_factor
    FROM agg JOIN t ON agg.col_name = t.col_name
    """,
)
def q178(spark, sf_dir):
    """Key-skew profiler (functions/profiling.py): the measurement that
    drives the salting / AQE-skew decisions in operators/skew.py —
    heaviest key, its share, and skew_factor (heaviest ÷ mean key
    count) per column, all in ONE instance-scale shuffle for k columns.
    Full value oracle: the exploded (col, value) stream, the
    deterministic struct-max tie-break (max count → max value), and
    both ratios restated in SQL. The fixture exposes all three regimes:
    doc_id uniform-unique (skew 1.0), source balanced, lang skewed
    ('en' ≈ 44%)."""
    _prep(spark)
    from polars_dataset_spark.functions import key_skew_profile

    docs = load_table(spark, sf_dir, "documents")
    return key_skew_profile(docs, ["lang", "source", "doc_id"])


@query(
    "q179_url_filter",
    r"""
    WITH src AS (
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN 'https://www.' || source || '.example/p/' || lang || '/' || doc_id
               WHEN 1 THEN 'https://sub.' || source || '.co.uk/a/b?x=1&y=' || doc_id
               WHEN 2 THEN 'http://' || source || '.org:8080/idx'
               WHEN 3 THEN 'ftp://10.0.0.' || (doc_id % 250) || '/f'
               WHEN 4 THEN 'not a url ' || doc_id
               ELSE 'https://spam.example/bad/' || doc_id
             END AS url
      FROM documents),
    parts AS (
      SELECT doc_id, url,
             nullif(lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)), '') AS scheme,
             nullif(lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)), '') AS host,
             CAST(nullif(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)', 1), '') AS INTEGER) AS port,
             nullif(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1), '') AS path,
             nullif(regexp_extract(url, '^[^#]*?\?([^#]*)', 1), '') AS query
      FROM src),
    dom AS (
      SELECT *,
             CASE WHEN host IS NULL THEN NULL
                  WHEN regexp_matches(host, '^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$')
                       OR len(string_split(host, '.')) <= 2 THEN host
                  WHEN array_to_string(string_split(host, '.')[-2:], '.')
                       IN ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                           'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
                           'com.mx','co.in','co.kr','co.za')
                       AND len(string_split(host, '.')) >= 3
                    THEN array_to_string(string_split(host, '.')[-3:], '.')
                  ELSE array_to_string(string_split(host, '.')[-2:], '.')
             END AS domain
      FROM parts)
    SELECT doc_id, scheme, host, port, path,
           CAST(CASE WHEN path IS NULL THEN 0
                ELSE len(list_filter(string_split(path, '/'), s -> s <> '')) END AS INTEGER)
               AS n_path_segments,
           CAST(CASE WHEN query IS NULL THEN 0
                ELSE len(list_filter(string_split(query, '&'), s -> s <> '')) END AS INTEGER)
               AS n_query_params,
           domain
    FROM dom
    WHERE domain IS NOT NULL
      AND domain NOT IN ('spam.example', 'src3.co.uk')
    """,
)
def q179(spark, sf_dir):
    """URL parsing + domain blocklist (functions/urls.py): URLs are
    synthesized deterministically from the fixture (six regimes: www
    host, multi-part co.uk suffix, explicit port, IPv4 literal,
    unparseable, blocklisted domain), parsed with the RE2-portable
    regex set, reduced to registered domains (embedded multi-part
    suffix subset), and filtered through the broadcast anti-join
    blocklist. Full value oracle: the identical regexes, suffix rules
    and blocklist restated in SQL. Map-only + broadcast — zero corpus
    shuffles."""
    _prep(spark)
    from polars_dataset_spark.functions import filter_url_blocklist, with_url_parts

    docs = load_table(spark, sf_dir, "documents")
    url = (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(F.lit("https://www."), F.col("source"), F.lit(".example/p/"),
                     F.col("lang"), F.lit("/"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(F.lit("https://sub."), F.col("source"), F.lit(".co.uk/a/b?x=1&y="),
                     F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 6 == 2,
            F.concat(F.lit("http://"), F.col("source"), F.lit(".org:8080/idx")),
        )
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(F.lit("ftp://10.0.0."), (F.col("doc_id") % 250).cast("string"),
                     F.lit("/f")),
        )
        .when(
            F.col("doc_id") % 6 == 4,
            F.concat(F.lit("not a url "), F.col("doc_id").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("https://spam.example/bad/"), F.col("doc_id").cast("string"))
        )
    )
    with_urls = docs.select("doc_id", url.alias("url"))
    parsed = with_url_parts(with_urls)
    kept = filter_url_blocklist(parsed, ["spam.example", "src3.co.uk"])
    return kept.select(
        "doc_id", "scheme", "host", "port", "path",
        "n_path_segments", "n_query_params", "domain",
    )


@query(
    "q180_tga_decode",
    """
    SELECT CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
           CAST(((t1.y * 5 + t2.x // 4) * 29) % 256 AS BIGINT) AS px
    FROM range(16) t1(y) CROSS JOIN range(16) t2(x)
    """,
)
def q180(spark, sf_dir):
    """Driver gate for the pure-python TGA decoder (q173 pattern): a
    16×16 fixture whose pixels follow the closed form
    ``((y·5 + x div 4)·29) mod 256`` (RLE-friendly runs of 4) is
    encoded through the HARD path — type 10 RLE truecolor, 24-bpp BGR,
    bottom-up scanline order, runs wrapping across row boundaries —
    pushed through ``decode_media(decoder='tga')`` on the executor and
    re-emitted per pixel; the oracle restates the closed form, so every
    pixel is a full value match through packet decode, BGR channel
    mean (all three channels equal → exact) and the vertical flip."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_media
    from polars_dataset_spark.functions.tga import encode_tga_rle

    yy, xx = np.mgrid[0:16, 0:16]
    v = ((yy * 5 + xx // 4) * 29) % 256
    rgb = np.repeat((v / 255.0)[:, :, None], 3, axis=2)
    blob = encode_tga_rle(rgb, depth=24, top_down=False)
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    dec = decode_media(df, decoder="tga", target_size=(16, 16))
    px = dec.select(F.posexplode("decoded").alias("pos", "val"))
    return px.select(
        F.floor(F.col("pos") / 16).cast("long").alias("y"),
        (F.col("pos") % 16).cast("long").alias("x"),
        F.round(F.col("val") * 255).cast("long").alias("px"),
    )


@query(
    "q181_line_dedup",
    """
    WITH src AS (
      SELECT doc_id, source,
             'Subscribe to our newsletter' || chr(10) || text || chr(10)
               || 'Copyright ' || source AS text
      FROM documents),
    l AS (
      SELECT doc_id, i - 1 AS pos, string_split(text, chr(10))[i] AS line
      FROM src CROSS JOIN range(1, 4) t(i)),
    r AS (
      SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) = 1
               AS keep
      FROM l)
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE keep), '')
               AS text,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept
    FROM r GROUP BY doc_id
    """,
)
def q181(spark, sf_dir):
    """C4-style line-level dedup (functions/dedup.dedup_lines): every
    duplicated line keeps only its first occurrence corpus-wide —
    the boilerplate killer shingle dedup misses. The fixture wraps each
    doc in a shared header + per-source footer, so three regimes fire:
    the header survives in exactly one doc, each footer in one doc per
    source, and bodies of exact-duplicate docs get excised too (some
    docs rebuild to '' — the empty-rebuild path is covered). Full value
    oracle: explode, md5-keyed first-occurrence window with the same
    (doc, pos) tie order, ordered string_agg rebuild — all restated in
    SQL, texts compared string-exact."""
    _prep(spark)
    from polars_dataset_spark.functions import dedup_lines

    docs = load_table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("Subscribe to our newsletter\n"),
            F.col("text"),
            F.lit("\nCopyright "),
            F.col("source"),
        ).alias("text"),
    )
    return dedup_lines(wrapped)


@query(
    "q182_bot_detection",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    g AS (
      SELECT user_id,
             (us - lag(us) OVER (PARTITION BY user_id ORDER BY us)) // 1000 AS gap_ms
      FROM e),
    gg AS (
      SELECT user_id, count(*) AS m, CAST(sum(gap_ms) AS BIGINT) AS sg,
             CAST(sum(gap_ms * gap_ms) AS BIGINT) AS sg2
      FROM g WHERE gap_ms IS NOT NULL GROUP BY 1),
    mixc AS (
      SELECT user_id, event_type, count(*) AS c FROM e GROUP BY 1, 2),
    mix AS (
      SELECT user_id, count(*) AS n_types, CAST(sum(c) AS BIGINT) AS n_events,
             sum(CAST(c AS DECIMAL(10,0))
                 * CAST(round(log2(c), 7) AS DECIMAL(20,7))) AS clog
      FROM mixc GROUP BY 1),
    sp AS (SELECT user_id, min(us) AS mn, max(us) AS mx FROM e GROUP BY 1),
    f AS (
      SELECT mix.user_id, n_events, CAST(n_types AS BIGINT) AS n_types,
             round((mx - mn) / 1e6, 4) AS span_s,
             CASE WHEN mx > mn
                  THEN round(CAST(n_events AS DOUBLE) * 86400000000.0
                             / CAST(mx - mn AS DOUBLE), 4) END AS events_per_day,
             -- exact integer half-up in 0.1-ms units (r8: the double
             -- round flipped the 4th decimal on boundary values):
             -- round(sg/(1000 m), 4) = round(10 sg / m) / 1e4
             CAST((20 * sg + m) // (2 * m) AS DOUBLE) / 10000.0 AS mean_gap_s,
             CASE WHEN m >= 2 THEN
               round(sqrt((CAST(m AS DOUBLE) * CAST(sg2 AS DOUBLE)
                           - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                          / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)))
                     / (CAST(sg AS DOUBLE) / CAST(m AS DOUBLE)), 4) END AS gap_cv,
             round(log2(CAST(n_events AS DOUBLE))
                   - CAST(clog AS DOUBLE) / CAST(n_events AS DOUBLE), 4)
                 AS type_entropy_bits
      FROM mix JOIN sp ON mix.user_id = sp.user_id
               LEFT JOIN gg ON mix.user_id = gg.user_id)
    SELECT *,
           coalesce(gap_cv < 0.9, false) AS too_regular,
           coalesce(events_per_day > 2.5, false) AS too_hot,
           coalesce(type_entropy_bits < 2.25, false) AS too_narrow,
           coalesce(gap_cv < 0.9, false)
             OR coalesce(events_per_day > 2.5, false)
             OR coalesce(type_entropy_bits < 2.25, false) AS is_bot
    FROM f
    """,
)
def q182(spark, sf_dir):
    """Behavioral bot detection (functions/behavior.py): per-actor
    rate / regularity / diversity features — integer-exact millisecond
    gap sums, q95-style DECIMAL entropy accumulation — plus the
    disjunctive rule flag. Thresholds (gap_cv < 0.9, > 2.5 events/day,
    entropy < 2.25 bits) chosen so each rule splits the fixture's 150
    users both ways (the q168 convention). Full value oracle: gaps,
    variance-from-integer-sums, entropy identity
    ``H = log2 n − Σc·log2 c / n`` and all four booleans restated in
    SQL. Two keyed shuffles, no UDFs."""
    _prep(spark)
    from polars_dataset_spark.functions import flag_bots

    events = load_table(spark, sf_dir, "events")
    return flag_bots(
        events, max_gap_cv=0.9, min_events_per_day=2.5, max_entropy_bits=2.25
    )


@query(
    "q183_aiff_decode",
    """
    WITH s AS (
      SELECT ((i * 37) % 1001 - 500) / 32768.0 AS l,
             ((i * 53) % 997 - 498) / 32768.0 AS r
      FROM range(1500) t(i)),
    m AS (SELECT (l + r) / 2 AS v FROM s)
    SELECT 44100 AS sample_rate, 2 AS n_channels, CAST(1500 AS BIGINT) AS n_frames,
           round(CAST(1500 AS DOUBLE) / 44100, 6) AS duration_s,
           round(sqrt(avg(v * v)), 6) AS rms,
           round(max(abs(v)), 6) AS peak
    FROM m
    """,
)
def q183(spark, sf_dir):
    """Driver gate for the pure-python AIFF decoder (q174 pattern): a
    closed-form stereo signal is packed through the big-endian IFF
    container — including the sample rate stored as an 80-bit IEEE
    extended float, the format's hard corner — decoded by
    ``decode_audio`` on the executor, and the oracle restates the audio
    statistics from the closed form. Channel-mean mono values are exact
    dyadic rationals, so rms/peak match to round-6; a wrong bit in the
    extended-float parse shifts sample_rate/duration and fails too."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_audio
    from polars_dataset_spark.functions.aiff import encode_aiff

    i = np.arange(1500)
    frames = np.stack(
        [(i * 37) % 1001 - 500, (i * 53) % 997 - 498], axis=1
    ).astype(np.int64)
    blob = encode_aiff(frames, rate=44100)
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    return decode_audio(df).select(
        "sample_rate",
        "n_channels",
        "n_frames",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    )


@query(
    "q184_ico_decode",
    """
    SELECT CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
           CAST((t1.y * 11 + t2.x * 3) % 256 AS BIGINT) AS px
    FROM range(16) t1(y) CROSS JOIN range(16) t2(x)
    """,
)
def q184(spark, sf_dir):
    """Driver gate for the ICO container decoder (q173/q180 pattern): an
    icon holding TWO members — a small decoy DIB and the 16×16 PNG
    payload whose pixels follow ``(y·11 + x·3) mod 256`` — goes through
    ``decode_media(decoder='ico')``; the decoder must pick the LARGEST
    member (the spec's 0-means-256 sizing included in the walk), hand
    it to the full PNG decoder, and every pixel value-matches the
    closed form restated by the oracle."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_media
    from polars_dataset_spark.functions.ico import _dib_bytes, encode_ico
    from polars_dataset_spark.functions.png import encode_png_gray

    yy, xx = np.mgrid[0:16, 0:16]
    img = ((yy * 11 + xx * 3) % 256).astype(np.float64) / 255.0
    decoy = np.full((4, 4), 0.5)
    blob = encode_ico([_dib_bytes(decoy, bpp=32), encode_png_gray(img, filter_type=4)])
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    dec = decode_media(df, decoder="ico", target_size=(16, 16))
    px = dec.select(F.posexplode("decoded").alias("pos", "val"))
    return px.select(
        F.floor(F.col("pos") / 16).cast("long").alias("y"),
        (F.col("pos") % 16).cast("long").alias("x"),
        F.round(F.col("val") * 255).cast("long").alias("px"),
    )


@query(
    "q185_qoi_decode",
    """
    SELECT CAST(t1.y AS BIGINT) AS y, CAST(t2.x AS BIGINT) AS x,
           CAST(((t1.y * 13 + t2.x * 7) % 256 + (t1.y * 31 + t2.x * 5) % 256
                 + (t1.y * 3 + t2.x * 11) % 256) AS BIGINT) AS px3
    FROM range(16) t1(y) CROSS JOIN range(16) t2(x)
    """,
)
def q185(spark, sf_dir):
    """Driver gate for the QOI decoder (q173/q180/q184 pattern): a
    16×16 RGB fixture with three DIFFERENT per-channel closed forms —
    so the greedy encoder emits a real mix of RGB/LUMA/DIFF/INDEX/RUN
    chunks, not one op — goes through ``decode_media(decoder='qoi')``;
    the oracle restates the channel SUM (the float32 channel mean times
    765 recovers the exact integer sum), so every pixel of every
    channel is value-checked through the running hash table and
    wraparound arithmetic."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_media
    from polars_dataset_spark.functions.qoi import encode_qoi

    yy, xx = np.mgrid[0:16, 0:16]
    rgb = np.stack(
        [
            (yy * 13 + xx * 7) % 256,
            (yy * 31 + xx * 5) % 256,
            (yy * 3 + xx * 11) % 256,
        ],
        axis=2,
    ).astype(np.float64) / 255.0
    blob = encode_qoi(rgb)
    df = spark.createDataFrame([(0, bytearray(blob))], "media_id long, content binary")
    dec = decode_media(df, decoder="qoi", target_size=(16, 16))
    px = dec.select(F.posexplode("decoded").alias("pos", "val"))
    return px.select(
        F.floor(F.col("pos") / 16).cast("long").alias("y"),
        (F.col("pos") % 16).cast("long").alias("x"),
        F.round(F.col("val") * 765).cast("long").alias("px3"),
    )


@query(
    "q186_drop_frequent_lines",
    """
    WITH src AS (
      SELECT doc_id, source,
             'Subscribe to our newsletter' || chr(10) || text || chr(10)
               || 'Copyright ' || source AS text
      FROM documents),
    l AS (
      SELECT doc_id, i - 1 AS pos, string_split(text, chr(10))[i] AS line
      FROM src CROSS JOIN range(1, 4) t(i)),
    freq AS (
      SELECT line FROM l WHERE trim(line) <> ''
      GROUP BY line HAVING count(DISTINCT doc_id) >= 3)
    SELECT doc_id,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE line NOT IN (SELECT line FROM freq)), '') AS text,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE line NOT IN (SELECT line FROM freq)) AS BIGINT)
               AS n_kept
    FROM l GROUP BY doc_id
    """,
)
def q186(spark, sf_dir):
    """RefinedWeb-style frequent-line removal
    (functions/dedup.drop_frequent_lines): lines in ≥3 distinct docs
    vanish from EVERY doc — including the first occurrence q181 keeps;
    sub-threshold repetition (duplicate-pair bodies) survives, pinning
    the semantic difference between the two line ops. Same wrapped
    fixture as q181: the shared header and every per-source footer
    (25 docs each) are removed everywhere; bodies stay unless the
    corpus has them in ≥3 docs. Full value oracle, texts
    string-exact."""
    _prep(spark)
    from polars_dataset_spark.functions import drop_frequent_lines

    docs = load_table(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("Subscribe to our newsletter\n"),
            F.col("text"),
            F.lit("\nCopyright "),
            F.col("source"),
        ).alias("text"),
    )
    return drop_frequent_lines(wrapped, min_docs=3)


def _bpe_oracle(n_merges: int) -> str:
    """Full multi-round BPE replay in DuckDB SQL: chars + end-of-word
    marker, weighted adjacent-pair counts, deterministic argmax
    (count desc, then lexicographic), and the left-to-right merge as a
    ``list_reduce`` fold — the fold is EXACTLY ``merge_sequence``
    (after a merge the accumulator tail is ``a||b``, which can never
    false-rematch since ``b`` is non-empty). One CTE pair per round."""
    sql = r"""
    WITH v AS (
      SELECT token, count(*) AS cnt FROM (
        SELECT unnest(string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ')) AS token
        FROM documents WHERE trim(text) <> '')
      WHERE token <> '' GROUP BY 1),
    s0 AS (SELECT token, cnt,
           list_transform(range(1, len(token) + 1), i -> token[i]) || ['</w>'] AS syms
           FROM v)"""
    for r in range(n_merges):
        sql += f""",
    p{r} AS (
      SELECT u.s['l'] AS l, u.s['r'] AS r, sum(cnt) AS pc FROM (
        SELECT cnt, unnest(list_transform(range(1, len(syms)),
                                          i -> {{'l': syms[i], 'r': syms[i+1]}})) AS s
        FROM s{r}) u
      GROUP BY 1, 2),
    m{r} AS (SELECT l, r, pc FROM p{r} ORDER BY pc DESC, l, r LIMIT 1)"""
        if r < n_merges - 1:
            sql += f""",
    s{r + 1} AS (
      SELECT token, cnt,
             list_reduce(list_transform(syms, x -> [x]),
               (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m{r}.l AND x[1] = m{r}.r
                                THEN acc[:len(acc)-1] || [m{r}.l || m{r}.r]
                                ELSE acc || x END) AS syms
      FROM s{r} CROSS JOIN m{r})"""
    parts = [
        f'SELECT {r} AS rank, l AS "left", r AS "right",'
        f" CAST(pc AS BIGINT) AS pair_count FROM m{r}"
        for r in range(n_merges)
    ]
    return sql + "\n" + "\nUNION ALL\n".join(parts)


def _bpe_apply_oracle(n_merges: int) -> str:
    """q188's oracle: the q187 training replay extended one step — the
    post-merge symbol table ``s{n}`` joins back onto each document's
    token stream, so per-doc encoded lengths are value-exact."""
    base = _bpe_oracle(n_merges)
    # keep only the CTE chain (drop the UNION ALL merge-table select)
    ctes = base[: base.index("\nSELECT 0 AS rank")]
    last = n_merges - 1
    return (
        ctes
        + f""",
    s{n_merges} AS (
      SELECT token, cnt,
             list_reduce(list_transform(syms, x -> [x]),
               (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = m{last}.l AND x[1] = m{last}.r
                                THEN acc[:len(acc)-1] || [m{last}.l || m{last}.r]
                                ELSE acc || x END) AS syms
      FROM s{last} CROSS JOIN m{last}),
    tok AS (
      SELECT doc_id, unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS token
      FROM documents WHERE trim(text) <> '')
    SELECT doc_id, CAST(sum(len(s{n_merges}.syms)) AS BIGINT) AS n_bpe_tokens
    FROM tok JOIN s{n_merges} USING (token)
    GROUP BY doc_id"""
    )


@query("q187_bpe_train", _bpe_oracle(4))
def q187(spark, sf_dir):
    """Distributed BPE tokenizer training (functions/bpe.py, Sennrich
    et al. 2016): the corpus collapses to the vocabulary table in ONE
    instance-scale shuffle, then every merge round runs on vocab-sized
    data (map-only pair explode + one aggregation + a 1-row argmax to
    the driver). FULL value oracle: all four rounds — weighted pair
    counts, the deterministic tie-break, and the left-to-right merge
    fold — replayed in SQL via list_reduce; the q166-style one-step
    precedent upgraded to the whole training loop."""
    _prep(spark)
    from polars_dataset_spark.functions import bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    _, table = bpe_learn(docs, n_merges=4)
    return table


@query("q188_bpe_encode", _bpe_apply_oracle(4))
def q188(spark, sf_dir):
    """BPE encoding end-to-end (functions/bpe.bpe_apply): the corpus
    re-encoded with the four merges q187 learns; per-doc encoded
    lengths. Full value oracle: the training replay extended one merge
    step to the final symbol table, joined back onto each document's
    token stream — so the Arrow-batched apply path (cache, rank-order
    merge loop) is value-checked against the SQL fold for every doc."""
    _prep(spark)
    from polars_dataset_spark.functions import bpe_apply, bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_learn(docs, n_merges=4)
    return bpe_apply(docs, merges).select("doc_id", "n_bpe_tokens")


@query(
    "q189_au_decode",
    """
    WITH mu AS (
      SELECT 255 - ((i * 13) % 256) AS u FROM range(1024) t(i)),
    mud AS (
      SELECT CASE WHEN u >= 128
                  THEN -((((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132)
                  ELSE (((u % 16) * 8 + 132) << ((u // 16) % 8)) - 132
             END / 32768.0 AS v
      FROM mu)
    SELECT 8000 AS sample_rate, 1 AS n_channels, CAST(1024 AS BIGINT) AS n_frames,
           CAST(0.128 AS DOUBLE) AS duration_s,
           round(sqrt(avg(v * v)), 6) AS rms, round(max(abs(v)), 6) AS peak
    FROM mud
    """,
)
def q189(spark, sf_dir):
    """Driver gate for the Sun AU container (functions/g711.decode_au):
    a mu-law byte ramp covering all 256 quantization levels rides the
    big-endian .snd header into ``decode_audio``; the oracle restates
    the G.711 bit-field arithmetic (the q177 oracle, new container
    path). A wrong header field (offset/encoding/rate) or any decode
    bit shifts rate/duration/rms and fails the hash."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import decode_audio
    from polars_dataset_spark.functions.g711 import AU_MULAW, encode_au

    payload = bytes(((np.arange(1024) * 13) % 256).astype(np.uint8))
    df = spark.createDataFrame(
        [(0, bytearray(encode_au(payload, AU_MULAW, rate=8000, channels=1)))],
        "media_id long, content binary",
    )
    return decode_audio(df).select(
        "sample_rate",
        "n_channels",
        "n_frames",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        F.round("peak", 6).alias("peak"),
    )


def _encoding_oracle() -> str:
    """q190's oracle, composed from the SAME pattern constants the
    operator compiles (single source of truth -- the regex bytes cannot
    drift between engines)."""
    from polars_dataset_spark.functions.text import CONTROL_RE, MOJIBAKE_RE

    moj = "caf\u00c3\u00a9"
    quote = "\u00e2\u0080\u009c"
    return f"""
    WITH s AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN text
               WHEN 1 THEN text || ' {moj}'
               WHEN 2 THEN text || chr(65533)
               WHEN 3 THEN text || chr(7)
               ELSE '{quote}' || text
             END AS t
      FROM documents),
    c AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(t, chr(65533))) AS BIGINT) AS n_replacement,
             CAST(len(regexp_extract_all(t, '{CONTROL_RE}')) AS BIGINT) AS n_control,
             CAST(len(regexp_extract_all(t, '{MOJIBAKE_RE}')) AS BIGINT) AS n_mojibake
      FROM s)
    SELECT doc_id, n_replacement, n_control, n_mojibake,
           n_replacement = 0 AND n_control = 0 AND n_mojibake = 0 AS encoding_clean
    FROM c
    """


@query("q190_encoding_anomalies", _encoding_oracle())
def q190(spark, sf_dir):
    """Encoding-damage detection (functions/text.with_encoding_anomalies):
    replacement characters, C0/DEL control bytes, and
    UTF-8-as-Latin-1 mojibake artifacts counted per doc with pure
    codegen'd regexp_count -- the cheap filter for text no model should
    train on. The fixture injects each damage class deterministically
    (doc_id mod 5: clean / mojibake e-acute / U+FFFD / BEL /
    curly-quote mojibake prefix); the oracle counts with the IDENTICAL
    pattern constants (imported, not copied). Map-only, zero
    shuffles."""
    _prep(spark)
    from polars_dataset_spark.functions import with_encoding_anomalies

    docs = load_table(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.col("text"), F.lit(" caf\u00c3\u00a9")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.col("text"), F.lit("\ufffd")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.col("text"), F.lit("\u0007")))
        .otherwise(F.concat(F.lit("\u00e2\u0080\u009c"), F.col("text")))
        .alias("text"),
    )
    return with_encoding_anomalies(injected).drop("text")


@query(
    "q191_group_trend",
    """
    WITH e AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS x, value FROM events),
    d AS (
      SELECT event_type,
             CAST(x AS DECIMAL(18,0)) AS xd,
             CAST(round(value, 6) AS DECIMAL(24,6)) AS yd,
             CAST(CAST(x AS DECIMAL(12,0)) * CAST(round(value, 6) AS DECIMAL(24,6))
                  AS DECIMAL(36,6)) AS xyd
      FROM e),
    a AS (
      SELECT event_type, count(*) AS n, sum(xd) AS sx, sum(xd * xd) AS sxx,
             sum(yd) AS sy, sum(xyd) AS sxy
      FROM d GROUP BY 1),
    f AS (
      SELECT event_type, CAST(n AS BIGINT) AS n,
             CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
             CAST(sxx AS DOUBLE) AS sxxd, CAST(sy AS DOUBLE) AS syd,
             CAST(sxy AS DOUBLE) AS sxyd
      FROM a)
    SELECT event_type, n,
           CASE WHEN n >= 2 AND nd * sxxd - sxd * sxd <> 0.0
                THEN round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6)
           END AS slope,
           CASE WHEN n >= 2 AND nd * sxxd - sxd * sxd <> 0.0
                THEN round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
                            * sxd) / nd, 6)
           END AS intercept
    FROM f
    """,
)
def q191(spark, sf_dir):
    """Per-group OLS trend (functions/ml.groupwise_linear_trend): one
    regression per event type — value vs absolute day index — from
    closed-form sums in ONE map-side-combined aggregation (the
    grouped-model sibling of q158's global ridge fit). Determinism
    contract: integer x, round-6 DECIMAL-accumulated y, so every sum
    is exact and the slope/intercept doubles are pure functions of
    exact inputs — the whole computation restates in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import groupwise_linear_trend

    events = load_table(spark, sf_dir, "events")
    with_day = events.withColumn(
        "x", F.expr("unix_micros(cast(ts as timestamp)) DIV 86400000000")
    )
    return groupwise_linear_trend(with_day, ["event_type"], "x", "value")


@query(
    "q192_column_profile",
    """
    WITH w AS (
      SELECT count(*) AS n,
             sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS null_lang,
             count(DISTINCT lang) AS dist_lang,
             CAST(min(lang) AS VARCHAR) AS min_lang, CAST(max(lang) AS VARCHAR) AS max_lang,
             sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS null_nc,
             count(DISTINCT n_chars) AS dist_nc,
             CAST(min(n_chars) AS VARCHAR) AS min_nc, CAST(max(n_chars) AS VARCHAR) AS max_nc,
             sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS null_src,
             count(DISTINCT source) AS dist_src,
             CAST(min(source) AS VARCHAR) AS min_src, CAST(max(source) AS VARCHAR) AS max_src
      FROM documents)
    SELECT 'lang' AS col_name, CAST(n AS BIGINT) AS n_rows,
           CAST(null_lang AS BIGINT) AS n_null,
           round(null_lang::DOUBLE / n, 6) AS null_frac,
           CAST(dist_lang AS BIGINT) AS n_distinct,
           min_lang AS min_value, max_lang AS max_value
    FROM w
    UNION ALL
    SELECT 'n_chars', CAST(n AS BIGINT), CAST(null_nc AS BIGINT),
           round(null_nc::DOUBLE / n, 6), CAST(dist_nc AS BIGINT), min_nc, max_nc
    FROM w
    UNION ALL
    SELECT 'source', CAST(n AS BIGINT), CAST(null_src AS BIGINT),
           round(null_src::DOUBLE / n, 6), CAST(dist_src AS BIGINT), min_src, max_src
    FROM w
    """,
)
def q192(spark, sf_dir):
    """Column profiler (functions/profiling.column_profile): per-column
    nulls / exact distincts / native-ordering min-max in ONE
    aggregation pass (min/max computed on the native type, THEN
    rendered as strings — a numeric column profiles numerically). Full
    value oracle over a string, a bigint and a categorical column."""
    _prep(spark)
    from polars_dataset_spark.functions import column_profile

    docs = load_table(spark, sf_dir, "documents")
    return column_profile(docs, ["lang", "n_chars", "source"])


@query(
    "q193_edit_distance_join",
    """
    WITH s AS (
      SELECT doc_id, substring(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), 1, 12) AS p
      FROM documents),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.p, b.p) AS dist
      FROM s a JOIN s b ON a.doc_id < b.doc_id)
    SELECT id_a, id_b, CAST(dist AS BIGINT) AS dist
    FROM pairs WHERE dist <= 2
    """,
)
def q193(spark, sf_dir):
    """Edit-distance join (functions/dedup.edit_distance_join): doc
    pairs whose normalized 12-char prefixes are within 2 unit edits —
    the character-level typo/OCR matcher the token-Jaccard fuzzy_join
    (q130) can't express. Spark runs the SOUND length-blocked plan
    (left fans out to [len−k, len+k], equi-join, exact levenshtein
    verify — recall 1 by construction); the oracle brute-forces ALL
    pairs, so blocking recall and the distance metric are both
    value-checked."""
    _prep(spark)
    from polars_dataset_spark.functions import edit_distance_join

    docs = load_table(spark, sf_dir, "documents")
    prefixes = docs.select(
        "doc_id",
        F.substring(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " "), 1, 12
        ).alias("p"),
    )
    pairs = edit_distance_join(prefixes, prefixes, col="p", max_dist=2)
    return pairs.filter(F.col("id_a") < F.col("id_b"))


@query(
    "q194_k_anonymity",
    """
    SELECT lang, source, CAST(count(*) AS BIGINT) AS class_size,
           count(*) < 7 AS at_risk
    FROM documents GROUP BY 1, 2
    """,
)
def q194(spark, sf_dir):
    """k-anonymity audit (functions/profiling.k_anonymity_audit): the
    (lang, source) quasi-identifier classes of the corpus with the
    under-k flag — the privacy gate a training-data release pipeline
    runs before shipping. k=7 splits the fixture's ~100 classes both
    ways. One map-side-combined shuffle; full value oracle."""
    _prep(spark)
    from polars_dataset_spark.functions import k_anonymity_audit

    docs = load_table(spark, sf_dir, "documents")
    return k_anonymity_audit(docs, ["lang", "source"], k=7)


@query(
    "q195_bm25_topk",
    r"""
    WITH d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(string_split(norm, ' ')) AS term
      FROM d WHERE norm <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    tot AS (SELECT (SELECT count(*) FROM documents) AS n,
                   (SELECT coalesce(sum(dl), 0) FROM dl) AS sumdl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN ('hash', 'join', 'vector') GROUP BY 1, 2),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    sc AS (
      SELECT tf.doc_id,
             round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl / (sumdl::DOUBLE / n)))), 6)
               AS score
      FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term), tot
      GROUP BY tf.doc_id)
    SELECT doc_id, score
    FROM sc ORDER BY score DESC, doc_id LIMIT 15
    """,
)
def q195(spark, sf_dir):
    """BM25 top-k retrieval (functions/retrieval.bm25_topk): the 15 best
    documents for a 3-term query under Okapi BM25 (Lucene idf variant,
    k1=1.2, b=0.75). Postings are pruned to the query's terms BEFORE the
    explode, document frequencies and corpus totals join back by
    broadcast, the per-doc reduce is one map-side-combined groupBy and
    the cut is a TakeOrdered — no corpus-cardinality shuffle, no global
    sort. Scores round to 6 with an id tiebreak, so the top-k set and
    values replay exactly in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import bm25_topk

    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "hash join vector", k=15)


@query(
    "q196_count_min_sketch",
    r"""
    WITH vals AS (
      SELECT CAST(source AS VARCHAR) AS item FROM documents
      WHERE source IS NOT NULL),
    js AS (SELECT j FROM range(4) t(j)),
    cells AS (
      SELECT j,
             ('0x' || substr(md5('cms' || j || ':' || item), 1, 15))::BIGINT % 32 AS b,
             count(*) AS cnt
      FROM vals, js GROUP BY 1, 2),
    keys AS (SELECT unnest(['src1', 'src19', 'src3', 'src7', 'zz_absent']) AS item),
    probes AS (
      SELECT item, j,
             ('0x' || substr(md5('cms' || j || ':' || item), 1, 15))::BIGINT % 32 AS b
      FROM keys, js),
    est AS (
      SELECT item, min(coalesce(cnt, 0)) AS est
      FROM probes LEFT JOIN cells USING (j, b) GROUP BY item),
    ex AS (SELECT item, count(*) AS exact FROM vals
           WHERE item IN ('src1', 'src19', 'src3', 'src7', 'zz_absent')
           GROUP BY item)
    SELECT item, CAST(est AS BIGINT) AS est,
           CAST(coalesce(exact, 0) AS BIGINT) AS exact,
           est >= coalesce(exact, 0) AS bound_ok
    FROM est LEFT JOIN ex USING (item)
    """,
)
def q196(spark, sf_dir):
    """Count-Min sketch (functions/frequency.cms_estimate): 4x32 cells
    over the source column, point estimates for four present keys and
    one absent key, joined against exact counts. The cell table's
    map-side combine bounds the shuffle at depth*width rows no matter
    the corpus size; the oracle replays the md5 bucketing, the min over
    hash rows, and the never-underestimates bound, all value-exact."""
    _prep(spark)
    from polars_dataset_spark.functions import cms_estimate

    docs = load_table(spark, sf_dir, "documents")
    keys = ["src1", "src19", "src3", "src7", "zz_absent"]
    est = cms_estimate(docs, "source", keys, depth=4, width=32)
    vals = docs.select(F.col("source").cast("string").alias("item")).filter(
        F.col("item").isNotNull()
    )
    exact = (
        vals.filter(F.col("item").isin(keys))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.join(exact, "item", "left").select(
        "item",
        F.col("est").cast("long").alias("est"),
        F.coalesce("exact", F.lit(0)).cast("long").alias("exact"),
        (F.col("est") >= F.coalesce("exact", F.lit(0))).alias("bound_ok"),
    )


@query(
    "q197_hll_distinct",
    r"""
    WITH vals AS (
      SELECT CAST(user_id AS VARCHAR) AS item FROM events
      WHERE user_id IS NOT NULL),
    hs AS (
      SELECT ('0x' || substr(md5('hll:' || item), 1, 15))::BIGINT AS h FROM vals),
    regs AS (
      SELECT h % 256 AS bucket,
             CASE WHEN h // 256 = 0 THEN 53
                  ELSE 53 - length(bin(h // 256)) END AS rho
      FROM hs),
    reg2 AS (SELECT bucket, max(rho) AS r FROM regs GROUP BY bucket),
    s AS (
      SELECT count(*) AS nonzero_buckets, sum(r) AS sum_registers,
             max(r) AS max_register,
             sum(power(0.5, r)) + (256 - count(*)) * 1.0 AS harmonic_sum
      FROM reg2),
    e AS (
      SELECT nonzero_buckets, sum_registers, max_register, harmonic_sum,
             round((0.7213 / (1 + 1.079 / 256)) * 65536 / harmonic_sum, 4) AS estimate
      FROM s),
    c AS (
      SELECT *,
             CASE WHEN estimate <= 640.0 AND nonzero_buckets < 256
                  THEN round(256 * ln(256.0 / (256 - nonzero_buckets)), 4)
                  ELSE estimate END AS corrected_estimate
      FROM e)
    SELECT CAST(256 AS BIGINT) AS m,
           CAST(nonzero_buckets AS BIGINT) AS nonzero_buckets,
           CAST(sum_registers AS BIGINT) AS sum_registers,
           CAST(max_register AS BIGINT) AS max_register,
           harmonic_sum, estimate, corrected_estimate,
           CAST((SELECT count(DISTINCT item) FROM vals) AS BIGINT) AS n_exact,
           abs(corrected_estimate / (SELECT count(DISTINCT item) FROM vals) - 1)
             < 0.25 AS rel_ok
    FROM c
    """,
)
def q197(spark, sf_dir):
    """Portable HyperLogLog (functions/frequency.hll_summary): p=8
    distinct-count sketch over event users whose EVERY output column —
    including the float estimate and the small-range linear-counting
    correction — replays bit-exactly in SQL (registers via integer
    bin-length, harmonic sum of exact dyadic 2^-r terms, one-multiply
    alpha*m^2 form). The exact distinct count rides along for the
    rel_ok accuracy contract. Complements q105 (Spark's JVM-internal
    HLL++, contract oracle only)."""
    _prep(spark)
    from polars_dataset_spark.functions import hll_summary

    ev = load_table(spark, sf_dir, "events")
    summ = hll_summary(ev, "user_id", p=8)
    exact = (
        ev.select(F.col("user_id").cast("string").alias("item"))
        .filter(F.col("item").isNotNull())
        .agg(F.countDistinct("item").alias("n_exact"))
    )
    return summ.crossJoin(F.broadcast(exact)).select(
        "m",
        "nonzero_buckets",
        "sum_registers",
        "max_register",
        "harmonic_sum",
        "estimate",
        "corrected_estimate",
        "n_exact",
        (
            F.abs(F.col("corrected_estimate") / F.col("n_exact") - 1) < 0.25
        ).alias("rel_ok"),
    )


@query(
    "q198_numeric_outliers",
    r"""
    WITH m AS (SELECT median(n_chars) AS med FROM documents),
    d AS (SELECT median(abs(n_chars - med)) AS mad FROM documents, m)
    SELECT doc_id, n_chars, med AS median, mad,
           abs(n_chars - med) AS deviation,
           abs(n_chars - med) > 2.0 * mad AS is_outlier
    FROM documents, m, d
    """,
)
def q198(spark, sf_dir):
    """Robust outlier flags (functions/profiling.numeric_outliers):
    median/MAD (Hampel) flags on document length at c=2.0 — 16 of 500
    rows flag at sf0.01, so the rule splits the fixture both ways. Both
    medians are exact percentiles of integers (dyadic), c=2.0 is exact,
    so every comparison replays bit-for-bit in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import numeric_outliers

    docs = load_table(spark, sf_dir, "documents")
    return numeric_outliers(docs, "n_chars", c=2.0)


@query(
    "q199_cdc_chunks",
    r"""
    WITH d AS (
      SELECT doc_id, text, length(text) AS n FROM documents
      WHERE text IS NOT NULL AND doc_id % 10 = 0),
    p AS (
      SELECT doc_id, text, n,
             CASE WHEN n >= 8 THEN list_filter(range(8, n + 1),
                    i -> ('0x' || substr(md5(substr(text, i - 7, 8)), 1, 15))::BIGINT
                         % 32 = 0)
                  ELSE [] END AS bounds
      FROM d),
    s AS (
      SELECT doc_id, text,
             CASE WHEN len(bounds) > 0 AND bounds[-1] = n THEN bounds
                  ELSE list_append(bounds, n) END AS ends
      FROM p),
    u AS (
      SELECT doc_id, text, unnest(ends) AS e,
             generate_subscripts(ends, 1) AS idx
      FROM s),
    ch AS (
      SELECT doc_id, idx - 1 AS chunk_idx,
             lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY idx) AS st, e, text
      FROM u)
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(st AS BIGINT) AS chunk_start, CAST(e - st AS BIGINT) AS chunk_len,
           md5(substr(text, st + 1, e - st)) AS chunk_hash
    FROM ch
    """,
)
def q199(spark, sf_dir):
    """Content-defined chunking (functions/dedup.cdc_chunks): documents
    split at md5-gram boundaries (window 8, expected chunk 32 chars) —
    the edit-robust chunk-hash dedup primitive. Map-only pure
    expressions, no shuffle; the oracle recomputes every boundary, every
    offset and every chunk hash, so the rebuild (chunks concatenate to
    the exact original text) is verified value-exact. The fixture query
    chunks a deterministic tenth of the corpus (doc_id % 10) — the
    md5-per-position constant is the operator's declared cost and needs
    no more than 50 docs to value-check; the sf0.1 bench would otherwise
    spend its whole wall on this one scan."""
    _prep(spark)
    from polars_dataset_spark.functions import cdc_chunks

    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .filter(F.col("doc_id") % 10 == 0)
    )
    ch = cdc_chunks(docs, window=8, mask_bits=5)
    return ch.select(
        "doc_id",
        "chunk_idx",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.col("chunk_len").cast("long").alias("chunk_len"),
        "chunk_hash",
    )


@query(
    "q200_bm25_topk_many",
    r"""
    WITH q(qid, qtext) AS (
      VALUES ('evalA', 'hash join'),
             ('evalB', 'vector index'),
             ('evalC', 'stream join vector')),
    qt AS (
      SELECT qid, unnest(list_distinct(string_split(qtext, ' '))) AS term
      FROM q),
    d AS (
      SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm
      FROM documents),
    tok AS (
      SELECT doc_id, unnest(string_split(norm, ' ')) AS term
      FROM d WHERE norm <> ''),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    tot AS (SELECT (SELECT count(*) FROM documents) AS n,
                   (SELECT coalesce(sum(dl), 0) FROM dl) AS sumdl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term IN (SELECT DISTINCT term FROM qt) GROUP BY 1, 2),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    sc AS (
      SELECT qt.qid, tf.doc_id,
             round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                       * tf * 2.2
                       / (tf + 1.2 * (0.25 + 0.75 * dl / (sumdl::DOUBLE / n)))), 6)
               AS score
      FROM tf JOIN qt USING (term) JOIN dl USING (doc_id)
           JOIN dfq USING (term), tot
      GROUP BY 1, 2),
    rk AS (
      SELECT qid, doc_id, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, doc_id) AS rank
      FROM sc)
    SELECT qid AS query_id, doc_id, score, CAST(rank AS INT) AS rank
    FROM rk WHERE rank <= 5
    """,
)
def q200(spark, sf_dir):
    """Batch BM25 retrieval (functions/retrieval.bm25_topk_many): top-5
    per query for a TABLE of queries — the shape eval-set
    decontamination actually runs (per-query bm25_topk would re-scan the
    corpus once per query; this scans it ONCE for all queries). The
    query table's union vocabulary prunes the corpus explode, the
    (term -> query) map / document frequencies / totals all join back by
    broadcast, the per-(query, doc) reduce is one map-side-combined
    groupBy and the top-k cut is a window PARTITIONED BY query (never a
    single partition). Same rounded-score + id tiebreak determinism as
    q195, so set, scores AND ranks replay exactly in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import bm25_topk_many

    docs = load_table(spark, sf_dir, "documents")
    qtab = spark.createDataFrame(
        [("evalA", "hash join"), ("evalB", "vector index"),
         ("evalC", "stream join vector")],
        "query_id string, query string",
    )
    return bm25_topk_many(docs, qtab, k=5)


@query(
    "q201_media_probe",
    """
    SELECT * FROM (VALUES
      (0, 'webp_vp8',  160,  120,  'lossy_key',            true),
      (1, 'jpeg',      64,   48,   'arith_sequential_p12', true),
      (2, 'webp_vp8l', 9,    7,    'lossless',             false),
      (3, 'png',       5,    4,    'lossless',             false),
      (4, 'webp_vp8x', 2000, 1000, 'extended',             true),
      (5, NULL, NULL, NULL, NULL, NULL)
    ) AS t(media_id, fmt, width, height, mode, gated)
    """,
)
def q201(spark, sf_dir):
    """Container-level media inventory (functions/multimodal.media_probe):
    format, dimensions, coding mode, and a ``gated`` flag parsed from
    CONTAINER headers only — so the formats whose entropy decode is
    gated (lossy-WebP/VP8 per RFC 6386 §9.1 keyframe headers,
    arithmetic/12-bit JPEG per their SOF segments) are still
    inventoriable on a 100 TB crawl. Fixtures: a hand-built VP8 lossy
    keyframe header, a hand-built SOF9 12-bit JPEG, a real VP8L blob
    from the in-repo lossless encoder, a real PNG from the in-repo
    encoder, a VP8X extended header, and a junk blob (all-null row).
    Contract oracle: the literal expected rows (same style as the
    codec family's closed-form oracles). Map-only Arrow batch; fixed
    bytes read per blob."""
    _prep(spark)
    import struct

    import numpy as np

    from polars_dataset_spark.functions import media_probe
    from polars_dataset_spark.functions.png import encode_png_gray
    from polars_dataset_spark.functions.webp import encode_webp_lossless

    tag = 0 | (3 << 1) | (1 << 4) | (100 << 5)  # keyframe, ver 3, shown
    vp8_payload = (
        tag.to_bytes(3, "little") + b"\x9d\x01\x2a" + struct.pack("<HH", 160, 120)
    )
    vp8 = (
        b"RIFF" + (12 + len(vp8_payload)).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + len(vp8_payload).to_bytes(4, "little") + vp8_payload
    )
    jpg = (
        b"\xff\xd8\xff\xc9" + (11).to_bytes(2, "big") + bytes([12])
        + (48).to_bytes(2, "big") + (64).to_bytes(2, "big")
        + bytes([1, 0x11, 0, 0x11])
    )
    img = np.stack(
        [(np.arange(63, dtype=np.float64).reshape(7, 9) % 256) / 255.0] * 3, axis=-1
    )
    vp8l = encode_webp_lossless(img)
    png = encode_png_gray((np.arange(20, dtype=np.float64).reshape(4, 5)) / 255.0)
    vp8x_payload = (
        bytes([0x10, 0, 0, 0]) + (1999).to_bytes(3, "little")
        + (999).to_bytes(3, "little")
    )
    vp8x = (
        b"RIFF" + (12 + len(vp8x_payload)).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + len(vp8x_payload).to_bytes(4, "little") + vp8x_payload
    )
    rows = [
        (0, bytearray(vp8)),
        (1, bytearray(jpg)),
        (2, bytearray(vp8l)),
        (3, bytearray(png)),
        (4, bytearray(vp8x)),
        (5, bytearray(b"not a media blob")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return media_probe(df).select(
        "media_id", "fmt", "width", "height", "mode", "gated"
    )


@query(
    "q202_av_container_probe",
    """
    SELECT CAST(media_id AS BIGINT) AS media_id, fmt,
           CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
           mode, CAST(gated AS BOOLEAN) AS gated,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(channels AS BIGINT) AS channels,
           CAST(duration_s AS DOUBLE) AS duration_s
    FROM (VALUES
      (0, 'mp3',  NULL, NULL, 'mpeg1_layer3', true,  44100, 2, 0.990375),
      (1, 'ogg',  NULL, NULL, 'vorbis',       true,  44100, 2, 2.0),
      (2, 'ogg',  NULL, NULL, 'opus',         true,  48000, 2, 2.0),
      (3, 'mp4',  640,  360,  'avc1',         true,  44100, 2, 2.5),
      (4, 'webm', 1280, 720,  'V_VP9',        true,  48000, 2, 1.5),
      (5, 'wav',  NULL, NULL, 'pcm',          false, 44100, 2, 1.0),
      (6, 'flac', NULL, NULL, 'lossless',     false, 44100, 2, 2.0),
      (7, NULL,   NULL, NULL, NULL,           NULL,  NULL,  NULL, NULL)
    ) AS t(media_id, fmt, width, height, mode, gated,
           sample_rate, channels, duration_s)
    """,
)
def q202(spark, sf_dir):
    """Compressed audio/video container inventory (r9, VERDICT r8 #1 —
    functions/containers.probe_av_header via media_probe): MP3 frame
    header + CBR duration math, OGG pages with Vorbis/Opus id packets +
    exact last-page granule duration, MP4 box walk (mvhd/hdlr/stsd),
    WebM EBML (Info duration, track dims/rate/channels), plus WAV and
    FLAC so the inventory covers decodable (gated=false) and
    entropy-gated (gated=true) blobs uniformly. Fixtures hand-built
    byte-for-byte from the public specs inside the query; the oracle is
    the literal expected table (same contract style as q201). Map-only
    Arrow batch; fixed bytes read per blob — the 100 TB story is a scan,
    not a codec stack."""
    _prep(spark)
    import struct

    from polars_dataset_spark.functions import media_probe

    # MP3: MPEG1 Layer III 128 kbps CBR 44100 Hz stereo; frame size =
    # 1152*128000/(8*44100) = 417; ID3v2.4 tag of 100 bytes skipped.
    frame = b"\xff\xfb\x90\x00" + b"\x00" * 413
    mp3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100 + frame * 38

    def ogg_page(htype, granule, seq, payload):
        return (
            b"OggS\x00" + bytes([htype]) + granule.to_bytes(8, "little")
            + (7).to_bytes(4, "little") + seq.to_bytes(4, "little")
            + b"\x00" * 4 + bytes([1, len(payload)]) + payload
        )

    vorbis_id = (
        b"\x01vorbis" + (0).to_bytes(4, "little") + bytes([2])
        + (44100).to_bytes(4, "little") + (0).to_bytes(4, "little")
        + (128000).to_bytes(4, "little") + (0).to_bytes(4, "little") + b"\xb8\x01"
    )
    ogg_vorbis = (
        ogg_page(2, 0, 0, vorbis_id) + ogg_page(4, 88200, 1, b"\x00" * 8)
    )
    opus_id = (
        b"OpusHead\x01\x02" + (312).to_bytes(2, "little")
        + (48000).to_bytes(4, "little") + b"\x00\x00\x00"
    )
    ogg_opus = ogg_page(2, 0, 0, opus_id) + ogg_page(4, 96312, 1, b"\x00" * 8)

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    mvhd = box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 2500) + b"\x00" * 80)
    avc1 = (
        struct.pack(">I", 86) + b"avc1" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 640, 360) + b"\x00" * 50
    )
    trak_v = box(
        b"trak",
        box(b"tkhd", b"\x00" * 76 + struct.pack(">II", 640 << 16, 360 << 16))
        + box(b"mdia",
              box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
              + box(b"minf", box(b"stbl",
                    box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + avc1)))),
    )
    mp4a = (
        struct.pack(">I", 36) + b"mp4a" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 8 + struct.pack(">HH", 2, 16) + b"\x00" * 4
        + struct.pack(">I", 44100 << 16)
    )
    trak_a = box(
        b"trak",
        box(b"mdia",
            box(b"hdlr", b"\x00" * 8 + b"soun" + b"\x00" * 13)
            + box(b"minf", box(b"stbl",
                  box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + mp4a)))),
    )
    mp4 = (
        box(b"ftyp", b"isom" + b"\x00" * 4 + b"isomavc1")
        + box(b"moov", mvhd + trak_v + trak_a)
    )

    def eid(i):
        return i.to_bytes((i.bit_length() + 7) // 8, "big")

    def el(i, payload):
        return eid(i) + bytes([0x80 | len(payload)]) + payload

    info = el(
        0x1549A966,
        el(0x2AD7B1, (1_000_000).to_bytes(3, "big"))
        + el(0x4489, struct.pack(">f", 1500.0)),
    )
    trk_v = el(
        0xAE,
        el(0x83, b"\x01") + el(0x86, b"V_VP9")
        + el(0xE0, el(0xB0, (1280).to_bytes(2, "big"))
             + el(0xBA, (720).to_bytes(2, "big"))),
    )
    trk_a = el(
        0xAE,
        el(0x83, b"\x02") + el(0x86, b"A_OPUS")
        + el(0xE1, el(0xB5, struct.pack(">f", 48000.0)) + el(0x9F, b"\x02")),
    )
    seg_body = info + el(0x1654AE6B, trk_v + trk_a)
    webm = (
        el(0x1A45DFA3, el(0x4282, b"webm"))
        + eid(0x18538067) + bytes([0x80 | len(seg_body)]) + seg_body
    )

    fmt_c = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 2, 44100, 176400, 4, 16
    )
    dat = b"data" + struct.pack("<I", 176400) + b"\x00" * 176400
    wav = b"RIFF" + struct.pack("<I", 4 + len(fmt_c) + len(dat)) + b"WAVE" + fmt_c + dat

    packed = (44100 << 44) | (1 << 41) | (15 << 36) | 88200
    flac = (
        b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big")
        + struct.pack(">HH", 1024, 1024) + b"\x00" * 6
        + packed.to_bytes(8, "big") + b"\x00" * 16
    )

    rows = [
        (0, bytearray(mp3)),
        (1, bytearray(ogg_vorbis)),
        (2, bytearray(ogg_opus)),
        (3, bytearray(mp4)),
        (4, bytearray(webm)),
        (5, bytearray(wav)),
        (6, bytearray(flac)),
        (7, bytearray(b"opaque bytes, no container")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return media_probe(df).select(
        "media_id", "fmt", "width", "height", "mode", "gated",
        "sample_rate", "channels", F.round("duration_s", 6).alias("duration_s"),
    )


@query(
    "q203_image_neardup",
    """
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(hamming AS BIGINT) AS hamming
    FROM (VALUES
      (0, 1, 0), (0, 2, 0), (0, 3, 1),
      (1, 2, 0), (1, 3, 1), (2, 3, 1)
    ) AS t(id_a, id_b, hamming)
    """,
)
def q203(spark, sf_dir):
    """Perceptual image near-dup pairs (functions/imagehash): 64-bit
    dHash (8x9 thumbnail gradient signs — invariant to uniform
    brightness shifts and lossless re-encoding) + the SAME pigeonhole
    Hamming banding the SimHash text path uses (dedup.hamming_band_pairs
    — recall exactly 1 for hamming <= k, shuffle ~ N*(k+1), never
    all-pairs). Fixtures: one 32x24 gradient encoded THREE ways
    (PNG/GIF/TIFF — byte-level dedup misses these, dHash pairs them at
    hamming 0), a one-cell perturbation (hamming 1), a checkerboard
    (hamming 44 — correctly absent), and a junk blob (null hash,
    excluded). Contract oracle: the literal expected pair set (q201
    style). The 100 TB story: one map-only Arrow decode pass + one
    banded equi-join."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import image_neardup_pairs
    from polars_dataset_spark.functions.gif import encode_gif_gray
    from polars_dataset_spark.functions.png import encode_png_gray
    from polars_dataset_spark.functions.tiff import encode_tiff_gray

    yy, xx = np.mgrid[0:24, 0:32]
    base = ((xx * 5 + yy * 13 + (xx * yy) % 7) % 256) / 255.0
    pert = base.copy()
    pert[6, 10] = 1.0  # a sampled 8x9-thumbnail cell: flips exactly one bit
    checker = ((xx + yy) % 2).astype(np.float64)
    rows = [
        (0, bytearray(encode_png_gray(base))),
        (1, bytearray(encode_gif_gray(base))),
        (2, bytearray(encode_tiff_gray(base))),
        (3, bytearray(encode_png_gray(pert))),
        (4, bytearray(encode_png_gray(checker))),
        (5, bytearray(b"junk, not an image")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return image_neardup_pairs(df, id_col="media_id", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


def _exif_jpeg_fixture(little: bool, gps: bool = True) -> bytes:
    """A spec-exact JPEG+Exif blob: SOI + APP1(Exif TIFF) + EOI. Both
    byte orders; IFD0 (Make/Model/Orientation/DateTime) + Exif IFD
    (DateTimeOriginal) + optional GPS IFD (N/W rationals)."""
    import struct

    e = "<" if little else ">"

    def entry(tag, typ, cnt, val4):
        return struct.pack(e + "HHI", tag, typ, cnt) + val4

    def off4(v):
        return struct.pack(e + "I", v)

    make, model = b"ACME\x00", b"Cam9000\x00"
    dt = b"2023:05:17 10:20:30\x00"
    n0 = 6 if gps else 5
    ifd0_end = 8 + 2 + n0 * 12 + 4
    off_make = ifd0_end
    off_model = off_make + len(make)
    exif_ifd = off_model + len(model)
    off_dt = exif_ifd + 2 + 12 + 4
    gps_ifd = off_dt + len(dt)
    off_lat = gps_ifd + 2 + 4 * 12 + 4
    off_lon = off_lat + 24

    def rat3(d, m, s):
        return struct.pack(e + "IIIIII", d, 1, m, 1, int(s * 100), 100)

    orient = struct.pack(e + "H", 6) + b"\x00\x00"
    ifd0 = struct.pack(e + "H", n0)
    ifd0 += entry(0x010F, 2, len(make), off4(off_make))
    ifd0 += entry(0x0110, 2, len(model), off4(off_model))
    ifd0 += entry(0x0112, 3, 1, orient)
    ifd0 += entry(0x0132, 2, len(dt), off4(off_dt))
    ifd0 += entry(0x8769, 4, 1, off4(exif_ifd))
    if gps:
        ifd0 += entry(0x8825, 4, 1, off4(gps_ifd))
    ifd0 += off4(0)
    exif = (
        struct.pack(e + "H", 1)
        + entry(0x9003, 2, len(dt), off4(off_dt))
        + off4(0)
    )
    tiff = (b"II*\x00" if little else b"MM\x00*") + off4(8) + ifd0 + make + model + exif + dt
    if gps:
        gpsd = struct.pack(e + "H", 4)
        gpsd += entry(1, 2, 2, b"N\x00\x00\x00")
        gpsd += entry(2, 5, 3, off4(off_lat))
        gpsd += entry(3, 2, 2, b"W\x00\x00\x00")
        gpsd += entry(4, 5, 3, off4(off_lon))
        gpsd += off4(0)
        tiff += gpsd + rat3(37, 46, 30.0) + rat3(122, 25, 9.0)
    app1 = b"Exif\x00\x00" + tiff
    return b"\xff\xd8\xff\xe1" + struct.pack(">H", 2 + len(app1)) + app1 + b"\xff\xd9"


@query(
    "q204_exif_probe",
    """
    SELECT CAST(media_id AS BIGINT) AS media_id, make, model,
           CAST(orientation AS INTEGER) AS orientation, datetime_original,
           CAST(gps_lat AS DOUBLE) AS gps_lat,
           CAST(gps_lon AS DOUBLE) AS gps_lon
    FROM (VALUES
      (0, 'ACME', 'Cam9000', 6, '2023:05:17 10:20:30', 37.775, -122.419167),
      (1, 'ACME', 'Cam9000', 6, '2023:05:17 10:20:30', 37.775, -122.419167),
      (2, 'ACME', 'Cam9000', 6, '2023:05:17 10:20:30', NULL, NULL),
      (3, NULL, NULL, NULL, NULL, NULL, NULL),
      (4, NULL, NULL, NULL, NULL, NULL, NULL)
    ) AS t(media_id, make, model, orientation, datetime_original,
           gps_lat, gps_lon)
    """,
)
def q204(spark, sf_dir):
    """Exif inventory over binary blobs (functions/exif.exif_probe):
    camera make/model, orientation (normalize before perceptual
    hashing), DateTimeOriginal, GPS decimal degrees — the PII a
    redaction pipeline must FIND before it can strip. Pure TIFF-IFD
    byte arithmetic inside JPEG APP1 (both byte orders), fixed bytes
    read per blob, no entropy decode — one map-only Arrow pass.
    Fixtures: little-endian + big-endian Exif JPEGs (identical logical
    content — the endian round-trip is the test), a GPS-less variant,
    an Exif-less JPEG, junk. Contract oracle: literal expected table
    (q201 style)."""
    _prep(spark)
    from polars_dataset_spark.functions import exif_probe

    rows = [
        (0, bytearray(_exif_jpeg_fixture(little=True))),
        (1, bytearray(_exif_jpeg_fixture(little=False))),
        (2, bytearray(_exif_jpeg_fixture(little=True, gps=False))),
        (3, bytearray(b"\xff\xd8\xff\xd9")),
        (4, bytearray(b"not a jpeg")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return exif_probe(df).select(
        "media_id", "make", "model", "orientation", "datetime_original",
        F.round("gps_lat", 6).alias("gps_lat"),
        F.round("gps_lon", 6).alias("gps_lon"),
    )


def _warc_record(wtype: str, uri: "str | None", payload: bytes, extra: str = "") -> bytes:
    """One spec-shaped WARC/1.0 record (CRLF headers, Content-Length
    framing, two-CRLF terminator)."""
    h = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{wtype}-1>\r\n"
        f"WARC-Date: 2024-03-01T12:00:00Z\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + extra
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return h + payload + b"\r\n\r\n"


@query(
    "q206_warc_ingest",
    """
    SELECT CAST(blob_id AS BIGINT) AS blob_id, CAST(rec_idx AS INTEGER) AS rec_idx,
           warc_type, target_uri, CAST(http_status AS INTEGER) AS http_status,
           http_content_type, CAST(payload_len AS BIGINT) AS payload_len,
           payload_md5
    FROM (VALUES
      (0, 0, 'warcinfo', NULL, NULL, NULL,
       28, '5af81cb8a34d5d3f3ce416a3d3b69603'),
      (0, 1, 'request',  'http://example.com/', NULL, NULL,
       37, 'a18e8b8145ebd974846203dd6c9d582b'),
      (0, 2, 'response', 'http://example.com/', 200, 'text/html; charset=utf-8',
       37, '5c18937dc1e4863fdc98855bdf97b360'),
      (1, 0, 'response', 'http://example.com/missing', 404, 'text/html',
       35, '8785dea4d8cf7e8fe0f9324f9e0db0a2'),
      (1, 1, 'response', 'http://example.com/img', 200, 'image/jpeg',
       64, 'b2d3f56bc197fd985d5965079b5e7148')
    ) AS t(blob_id, rec_idx, warc_type, target_uri, http_status,
           http_content_type, payload_len, payload_md5)
    """,
)
def q206(spark, sf_dir):
    """WARC ingestion (sources/warc.warc_records): the Common Crawl
    container -> one row per record, carry columns preserved, HTTP
    message split for response records (status, Content-Type, BODY as
    the payload — the bytes the text pipeline wants). Blob 0 is a plain
    WARC (warcinfo + request + response); blob 1 is PER-RECORD GZIP
    MEMBERS (the real Common Crawl layout: two concatenated gzip
    streams) with a 404 and a binary image response; blob 2 is junk
    contributing zero rows. Contract oracle: literal expected table
    with payload length + md5 standing in for the binary column (the
    driver canonicalizer cannot hash binary). One map-only Arrow pass,
    bounded header scans, malformed tails dropped not raised."""
    _prep(spark)
    import gzip

    from polars_dataset_spark.sources import warc_records

    html1 = b"<html><body>hello crawl</body></html>"
    html2 = b"<html><body>not found</body></html>"
    img = bytes(range(64))
    plain = (
        _warc_record("warcinfo", None, b"software: test-crawler/1.0\r\n",
                     "Content-Type: application/warc-fields\r\n")
        + _warc_record("request", "http://example.com/",
                       b"GET / HTTP/1.1\r\nHost: example.com\r\n\r\n")
        + _warc_record("response", "http://example.com/",
                       b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html1,
                       "Content-Type: application/http; msgtype=response\r\n")
    )
    gz = b"".join(
        gzip.compress(r, mtime=0)
        for r in (
            _warc_record("response", "http://example.com/missing",
                         b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\n" + html2,
                         "Content-Type: application/http; msgtype=response\r\n"),
            _warc_record("response", "http://example.com/img",
                         b"HTTP/1.1 200 OK\r\nContent-Type: image/jpeg\r\n\r\n" + img,
                         "Content-Type: application/http; msgtype=response\r\n"),
        )
    )
    blobs = [(0, bytearray(plain)), (1, bytearray(gz)), (2, bytearray(b"not a warc"))]
    df = spark.createDataFrame(blobs, "blob_id long, content binary")
    return warc_records(df).select(
        "blob_id", "rec_idx", "warc_type", "target_uri", "http_status",
        "http_content_type",
        F.length("payload").cast("bigint").alias("payload_len"),
        F.md5("payload").alias("payload_md5"),
    )


def _pdf_fixture(
    pages: int = 3,
    encrypted: bool = False,
    linearized: bool = False,
    hidden_tree: bool = False,
    version: str = "1.4",
) -> bytes:
    """A spec-shaped classic PDF: %PDF header, catalog + page tree (or
    an ObjStm stand-in hiding it, the PDF 1.5+ compressed-xref case),
    trailer with optional /Encrypt, optional Annex-F /Linearized first
    object."""
    head = f"%PDF-{version}".encode() + b"\n%\xe2\xe3\xcf\xd3\n"
    objs = []
    if linearized:
        objs.append(b"<< /Linearized 1 /L 5000 /N %d >>" % pages)
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    if hidden_tree:
        objs.append(
            b"<< /Type /ObjStm /N 4 /First 20 >>\nstream\n"
            b"(compressed bytes here)\nendstream"
        )
    else:
        kids = b" ".join(b"%d 0 R" % (3 + i) for i in range(pages))
        objs.append(b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % pages)
        for _ in range(pages):
            objs.append(b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>")
    body = b""
    for i, o in enumerate(objs, start=1):
        body += b"%d 0 obj\n" % i + o + b"\nendobj\n"
    trailer = b"trailer\n<< /Size %d /Root 1 0 R" % (len(objs) + 1)
    if encrypted:
        trailer += b" /Encrypt 9 0 R"
    trailer += b" >>\nstartxref\n0\n%%EOF\n"
    return head + body + trailer


@query(
    "q205_pdf_probe",
    """
    SELECT CAST(doc_blob_id AS BIGINT) AS doc_blob_id, version,
           CAST(page_count AS INTEGER) AS page_count,
           CAST(encrypted AS BOOLEAN) AS encrypted,
           CAST(linearized AS BOOLEAN) AS linearized,
           CAST(n_objects AS INTEGER) AS n_objects
    FROM (VALUES
      (0, '1.4', 3,    false, false, 5),
      (1, '1.4', 12,   false, false, 14),
      (2, '1.4', 3,    true,  false, 5),
      (3, '1.4', 3,    false, true,  6),
      (4, '1.5', 3,    false, false, 5),
      (5, '1.6', NULL, false, false, 2),
      (6, NULL,  NULL, NULL,  NULL,  NULL)
    ) AS t(doc_blob_id, version, page_count, encrypted, linearized, n_objects)
    """,
)
def q205(spark, sf_dir):
    """PDF inventory (functions/pdf.pdf_probe): version, page count,
    /Encrypt, Annex-F linearization, and visible object count. The
    root /Type /Pages node's /Count is read directly for classic
    files; a PDF 1.5+ file whose page tree is packed into /Type /ObjStm
    object streams gets them inflated (stdlib zlib, bounded caps — r11,
    VERDICT r10 #2) and rescanned, so page_count resolves there too
    (doc 4); only a file whose ObjStm is damaged/unparseable stays an
    honest NULL (doc 5 — a gate, not a guess, the VP8 contract). PDFs
    dominate a crawl's DOCUMENT bytes the way MP3/MP4 dominate its
    media bytes; routing (text-extract vs OCR vs drop-encrypted) needs
    this inventory before any parser runs. One map-only Arrow pass.
    Fixtures: classic 3-page + 12-page trees, an encrypted trailer, a
    linearized file, a REAL xref-stream+ObjStm 1.5 file, a damaged
    hidden-tree file, junk. Contract oracle: literal expected table
    (q201 style)."""
    _prep(spark)
    from polars_dataset_spark.functions import pdf_probe

    rows = [
        (0, bytearray(_pdf_fixture())),
        (1, bytearray(_pdf_fixture(pages=12))),
        (2, bytearray(_pdf_fixture(encrypted=True))),
        (3, bytearray(_pdf_fixture(linearized=True))),
        (4, bytearray(_pdf15_text_fixture([b"", b"", b""]))),
        (5, bytearray(_pdf_fixture(hidden_tree=True, version="1.6"))),
        (6, bytearray(b"%PDX not a pdf at all")),
    ]
    df = spark.createDataFrame(rows, "doc_blob_id long, content binary")
    return pdf_probe(df).select(
        "doc_blob_id", "version", "page_count", "encrypted", "linearized",
        "n_objects",
    )


# Messy-URL synthesis for q207 — ANSI SQL shared VERBATIM by the Spark
# side (F.expr) and the DuckDB oracle, so both engines canonicalize the
# exact same strings
_Q207_URL_EXPR = """
    CASE CAST(doc_id % 5 AS INT)
      WHEN 0 THEN 'HTTPS://WWW.' || upper(source)
               || '.Example:443/a//b/?utm_source=x&b=2&a=1#frag'
      WHEN 1 THEN 'http://' || source || '.org:8080//p?fbclid=abc'
      WHEN 2 THEN 'https://' || source || '.example'
      WHEN 3 THEN 'http://' || source || '.example:80/x?a=1&a=0&gclid=z'
      ELSE 'not-a-url-' || CAST(doc_id AS VARCHAR(32))
    END
"""


@query(
    "q207_url_canonicalize",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q207_URL_EXPR} AS url FROM documents
    ),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(url,
          '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,
        regexp_extract(url,
          '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)', 1) AS port,
        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path,
        regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS query
      FROM src),
    canon AS (
      SELECT doc_id, url, scheme, host, port, path,
        array_to_string(list_sort(list_filter(string_split(query, '&'),
          p -> p <> '' AND NOT regexp_matches(p,
            '^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid)(=.*)?$'))), '&')
          AS qcanon,
        CASE WHEN regexp_replace(path, '/{{2,}}', '/', 'g') = '' THEN '/'
             ELSE regexp_replace(path, '/{{2,}}', '/', 'g') END AS pathc
      FROM parts)
    SELECT doc_id, url,
      CASE WHEN scheme = '' OR host = '' THEN NULL
           ELSE scheme || '://' || host
             || CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                          OR (scheme = 'https' AND port = '443'))
                     THEN ':' || port ELSE '' END
             || pathc
             || CASE WHEN qcanon <> '' THEN '?' || qcanon ELSE '' END
      END AS url_canon
    FROM canon
    """,
)
def q207(spark, sf_dir):
    """URL canonicalization (functions/urls.canonicalize_url): the
    cheapest dedup a crawl pipeline has — BEFORE fetch/content dedup,
    on strings alone. Lowercase scheme+host, strip default ports, drop
    fragments, drop tracking params (utm_*/fbclid/gclid/...), byte-sort
    the surviving query params, collapse slash runs, null for
    non-fetchable strings. Pure codegen'd Column expressions (no UDF,
    zero exchanges); the oracle replays every step in ANSI SQL over the
    SAME synthesized messy URLs (the CASE expression is shared
    verbatim), so this is a FULL value oracle at every SF."""
    _prep(spark)
    from polars_dataset_spark.functions import canonicalize_url

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q207_URL_EXPR).alias("url")
    )
    return canonicalize_url(docs).select("doc_id", "url", "url_canon")


# q208: every third document REPLACED by a code snippet — shared
# verbatim between the Spark side (F.expr) and the DuckDB oracle;
# newlines spelled chr(10) so neither engine's string-escape rules bite
_Q208_TEXT_EXPR = """
    CASE WHEN doc_id % 3 = 0 THEN
      'def transform(rows):' || chr(10) ||
      '  out = [];' || chr(10) ||
      '  for (r) in rows: out += [r * 2];' || chr(10) ||
      '  return (out != []) && (len(out) == len(rows));'
    ELSE text END
"""


@query(
    "q208_code_detection",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q208_TEXT_EXPR} AS t FROM documents
    ),
    cnt AS (
      SELECT doc_id,
        CAST(greatest(length(t), 1) AS BIGINT) AS n_chars,
        CAST(length(t) - length(regexp_replace(t, '[{{}}();=<>\\[\\]]', '', 'g'))
             AS BIGINT) AS sym_cnt,
        CAST(greatest(len(list_filter(string_split_regex(t, '\\s+'),
             x -> x <> '')), 1) AS BIGINT) AS n_toks,
        CAST(len(regexp_extract_all(t,
             '\\b(def|import|return|function|const|var|void|printf|lambda|struct|typedef|nullptr|elif|async|await)\\b|=>|::|!=|==|\\+\\+|&&|\\|\\|'))
             AS BIGINT) AS kw_cnt,
        CAST(greatest(len(string_split(t, chr(10))), 1) AS BIGINT) AS n_lines,
        CAST(len(list_filter(string_split(t, chr(10)),
             l -> regexp_matches(l, '^(\\t| {{2,}})'))) AS BIGINT) AS ind_cnt
      FROM src),
    sc AS (
      SELECT doc_id,
        least(CAST(1000000 AS BIGINT), (sym_cnt * CAST(1000000 AS BIGINT) // n_chars) * 6) * 5
        + least(CAST(1000000 AS BIGINT), (kw_cnt * CAST(1000000 AS BIGINT) // n_toks) * 5) * 3
        + (ind_cnt * CAST(1000000 AS BIGINT) // n_lines) * 2 AS s
      FROM cnt)
    SELECT doc_id, CAST(s AS DOUBLE) / 10000000.0 AS code_score,
           s >= 3500000 AS is_code
    FROM sc
    """,
)
def q208(spark, sf_dir):
    """Code-vs-prose routing signal (functions/text.with_code_score):
    symbol density + prose-safe keyword density + indent fraction,
    computed in INTEGER ppm arithmetic with one final IEEE division —
    bit-exact across engines at every SF by construction (the
    q120/q133 rounding lesson applied up front instead of caught by a
    sweep). Every third document is replaced by a code snippet (shared
    verbatim CASE), so both classes are exercised; FULL value oracle.
    Map-only, no UDF, staged projections."""
    _prep(spark)
    from polars_dataset_spark.functions import with_code_score

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q208_TEXT_EXPR).alias("text")
    )
    return with_code_score(docs).select("doc_id", "code_score", "is_code")


@query(
    "q209_image_index_filter",
    """
    SELECT CAST(media_id AS BIGINT) AS media_id, kind FROM (VALUES
      (11, 'novel'), (12, 'junk')
    ) AS t(media_id, kind)
    """,
)
def q209(spark, sf_dir):
    """Static-corpus image dedup (functions/imagehash.build_image_index
    + image_filter_against — the continuous-ingestion half, mirroring
    the text path's NeardupIndex): the corpus is decoded + hashed ONCE
    into a persisted banded-signature frame; each arriving batch pays
    one map-only decode pass and one band equi-join. Fixtures: a
    2-image corpus; a batch holding a RE-ENCODED + BRIGHTENED copy of a
    corpus image (GIF of a PNG original, +2/255 — dropped), a novel
    image (kept), and a junk blob (kept: an undecodable blob is not
    evidence of duplication). Contract oracle: the literal survivor
    set."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import (
        build_image_index,
        image_filter_against,
    )
    from polars_dataset_spark.functions.gif import encode_gif_gray
    from polars_dataset_spark.functions.png import encode_png_gray

    yy, xx = np.mgrid[0:24, 0:32]
    a = ((xx * 5 + yy * 13 + (xx * yy) % 7) % 256) / 255.0
    b = ((xx * 7 + yy * 13) % 256) / 255.0
    corpus = spark.createDataFrame(
        [(0, bytearray(encode_png_gray(a))), (1, bytearray(encode_png_gray(b)))],
        "media_id long, content binary",
    )
    idx = build_image_index(corpus)
    novel = ((xx + yy) % 2).astype(np.float64)
    batch = spark.createDataFrame(
        [
            (10, "copy", bytearray(encode_gif_gray(np.clip(a + 2 / 255.0, 0, 1)))),
            (11, "novel", bytearray(encode_png_gray(novel))),
            (12, "junk", bytearray(b"not an image")),
        ],
        "media_id long, kind string, content binary",
    )
    return image_filter_against(batch, idx).select("media_id", "kind")


def _pdf_text_fixture(
    page_streams: "list[bytes]",
    flate: bool = False,
    version: str = "1.4",
    contents_array: bool = False,
) -> bytes:
    """A classic PDF with REAL content streams: catalog -> page tree ->
    per-page /Contents objects, raw or FlateDecode. ``contents_array``
    splits the FIRST page's stream in half across two content objects
    referenced as ``/Contents [a 0 R b 0 R]`` (spec-legal and common)."""
    import zlib as _zlib

    n = len(page_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs: "list[tuple[int, bytes]]" = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ]
    next_num = 3 + 2 * n

    def stream_obj(data: bytes) -> bytes:
        enc = _zlib.compress(data) if flate else data
        filt = b" /Filter /FlateDecode" if flate else b""
        return (
            b"<< /Length " + str(len(enc)).encode() + filt + b" >>\nstream\n"
            + enc + b"\nendstream"
        )

    for i, s in enumerate(page_streams):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        if i == 0 and contents_array:
            # split at a token boundary (spec §7.8.2: lexical tokens
            # never span content-stream members): the first newline
            cut = s.find(b"\n") + 1
            if cut <= 0:
                cut = len(s) // 2
            objs.append((
                page_num,
                f"<< /Type /Page /Parent 2 0 R /Contents [{content_num} 0 R {next_num} 0 R] >>".encode(),
            ))
            objs.append((content_num, stream_obj(s[:cut])))
            objs.append((next_num, stream_obj(s[cut:])))
            next_num += 1
        else:
            objs.append((
                page_num,
                f"<< /Type /Page /Parent 2 0 R /Contents {content_num} 0 R >>".encode(),
            ))
            objs.append((content_num, stream_obj(s)))
    out = b"%PDF-" + version.encode() + b"\n%\xe2\xe3\xcf\xd3\n"
    for num, o in objs:
        out += f"{num} 0 obj\n".encode() + o + b"\nendobj\n"
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        "startxref\n0\n%%EOF\n"
    ).encode()
    return out


@query(
    "q211_pdf_text",
    """
    SELECT CAST(doc_blob_id AS BIGINT) AS doc_blob_id,
           CAST(page_idx AS INTEGER) AS page_idx, page_text
    FROM (VALUES
      (0, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (0, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (1, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (1, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (2, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (3, NULL, NULL),
      (4, NULL, NULL),
      (5, NULL, NULL)
    ) AS t(doc_blob_id, page_idx, page_text)
    """,
)
def q211(spark, sf_dir):
    """PDF text extraction for CLASSIC files (functions/pdf.pdf_text,
    VERDICT r9 #3): page-tree walk (/Root -> /Pages -> /Kids), raw +
    FlateDecode content streams via stdlib zlib, bounded text-operator
    scan (Tj / ' / " / TJ arrays with kerning word-gaps, Td/TD/T*/ET
    line breaks, literal-string escapes + octal + hex strings).
    Fixtures: the same two-page document written raw (doc 0) and
    Flate-compressed (doc 1) — byte-identical text proves the codec
    path; a /Contents ARRAY page split at a token boundary (doc 2,
    spec §7.8.2 one-logical-stream rule); then the honest NULL gates —
    encrypted (doc 3), ObjStm-hidden page tree (doc 4), junk (doc 5) —
    one null row each so a router can count them (q205's gate rule).
    One map-only Arrow pass, linear in blob bytes, no shuffle; the
    explode is per-page within the row. Contract oracle: literal
    expected table validated value-exact in-session."""
    _prep(spark)
    from polars_dataset_spark.functions import pdf_text

    s1 = (
        b"BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 TD (second line) Tj ET\n"
        b"BT 72 600 Td [(A) -400 (B) 10 (C)] TJ ET\n"
    )
    s2 = (
        b"BT 72 720 Td (paren \\(x\\) and \\\\ slash \\100) Tj ET\n"
        b"BT 72 700 Td <48454C4C4F> Tj (cont)' ET\n"
    )
    rows = [
        (0, bytearray(_pdf_text_fixture([s1, s2], flate=False))),
        (1, bytearray(_pdf_text_fixture([s1, s2], flate=True))),
        (2, bytearray(_pdf_text_fixture([s1], contents_array=True))),
        (3, bytearray(_pdf_fixture(encrypted=True))),
        (4, bytearray(_pdf_fixture(hidden_tree=True, version="1.6"))),
        (5, bytearray(b"not a pdf")),
    ]
    df = spark.createDataFrame(rows, "doc_blob_id long, content binary")
    return pdf_text(df).select("doc_blob_id", "page_idx", "page_text")


def _pdf15_text_fixture(
    page_streams: "list[bytes]",
    content_flate: bool = False,
    stale_copy: bool = False,
) -> bytes:
    """A spec-shaped MODERN pdf (1.5+): catalog, page tree and page
    dicts packed into a Flate ``/Type /ObjStm`` object stream (ISO
    32000 §7.5.7); content streams top-level (raw or Flate); the
    cross-reference written as a ``/Type /XRef`` stream (§7.5.8) with
    ``/W [1 4 2]`` binary rows, Flate + PNG-Up ``/Predictor 12`` — the
    layout every post-2005 generator emits. ``stale_copy`` appends a
    SECOND ObjStm redefining page 1 to point at a 'STALE' content
    stream that the xref does NOT reference — readers must honor the
    xref's type-2 pinning, not last-writer-wins."""
    import zlib as _zlib

    n = len(page_streams)
    first_content = 3 + n
    objstm_num = 3 + 2 * n
    stale_content_num = objstm_num + 1
    stale_stm_num = objstm_num + 2
    xref_num = objstm_num + (3 if stale_copy else 1)

    def objstm_bytes(inner: "list[tuple[int, bytes]]") -> bytes:
        offs, pos = [], 0
        for num, b in inner:
            offs.append((num, pos))
            pos += len(b) + 1
        header = " ".join(f"{num} {off}" for num, off in offs).encode() + b"\n"
        payload = header + b"\n".join(b for _, b in inner) + b"\n"
        stm = _zlib.compress(payload)
        return (
            f"<< /Type /ObjStm /N {len(inner)} /First {len(header)}"
            f" /Filter /FlateDecode /Length {len(stm)} >>"
        ).encode() + b"\nstream\n" + stm + b"\nendstream"

    kids = " ".join(f"{3 + i} 0 R" for i in range(n))
    inner = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ] + [
        (
            3 + i,
            f"<< /Type /Page /Parent 2 0 R /Contents {first_content + i} 0 R >>".encode(),
        )
        for i in range(n)
    ]

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: "dict[int, int]" = {}

    def emit(num: int, body: bytes) -> None:
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode() + body + b"\nendobj\n")

    def stream_obj(data: bytes) -> bytes:
        enc = _zlib.compress(data) if content_flate else data
        filt = b" /Filter /FlateDecode" if content_flate else b""
        return (
            b"<< /Length " + str(len(enc)).encode() + filt + b" >>\nstream\n"
            + enc + b"\nendstream"
        )

    for i, s in enumerate(page_streams):
        emit(first_content + i, stream_obj(s))
    emit(objstm_num, objstm_bytes(inner))
    if stale_copy:
        emit(stale_content_num, stream_obj(b"BT (STALE) Tj ET\n"))
        emit(
            stale_stm_num,
            objstm_bytes(
                [(
                    3,
                    f"<< /Type /Page /Parent 2 0 R /Contents {stale_content_num} 0 R >>".encode(),
                )]
            ),
        )
    # xref STREAM: binary W [1 4 2] rows for objects 0..Size-1 (no
    # /Index => default [0 Size]), PNG-Up predicted then Flate — the
    # exact filter chain real generators write
    size = xref_num + 1
    rows: "list[tuple[int, int, int]]" = []
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif 1 <= num <= 2 + n:
            rows.append((2, objstm_num, num - 1))
        else:
            rows.append((1, offsets.get(num, len(out)), 0))
    cols = 7
    pred = bytearray()
    prev = bytes(cols)
    for t, f2, f3 in rows:
        raw = bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        pred.append(2)  # PNG Up tag
        pred.extend((raw[i] - prev[i]) & 0xFF for i in range(cols))
        prev = raw
    xstm = _zlib.compress(bytes(pred))
    emit(
        xref_num,
        (
            f"<< /Type /XRef /Size {size} /Root 1 0 R /W [1 4 2]"
            f" /Filter /FlateDecode"
            f" /DecodeParms << /Predictor 12 /Columns {cols} >>"
            f" /Length {len(xstm)} >>"
        ).encode() + b"\nstream\n" + xstm + b"\nendstream",
    )
    out.extend(f"startxref\n{offsets[xref_num]}\n%%EOF\n".encode())
    return bytes(out)


@query(
    "q216_pdf15_text",
    """
    SELECT CAST(doc_blob_id AS BIGINT) AS doc_blob_id,
           CAST(page_idx AS INTEGER) AS page_idx, page_text
    FROM (VALUES
      (0, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (0, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (1, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (1, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (2, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (3, NULL, NULL),
      (4, NULL, NULL)
    ) AS t(doc_blob_id, page_idx, page_text)
    """,
)
def q216(spark, sf_dir):
    """PDF 1.5+ text extraction (functions/pdf — xref streams + object
    streams, VERDICT r10 #2): the page tree of a post-2005 file lives
    inside Flate ``/Type /ObjStm`` streams and its cross-reference is a
    binary ``/Type /XRef`` stream (W field widths, PNG-Up Predictor 12
    over zlib) — the MAJORITY of real-crawl PDFs, previously behind the
    honest NULL gate. Fixtures: the q211 two-page document rebuilt the
    modern way with raw (doc 0) and Flate (doc 1) content streams —
    text byte-identical to the classic layout; an incremental-update
    file carrying a STALE ObjStm copy of page 1 that the xref does not
    reference (doc 2 — type-2 pinning must win over last-writer);
    then the honest gates kept honest — a damaged/unparseable ObjStm
    (doc 3) and junk (doc 4) yield one null row each. Same map-only
    Arrow pass as q211; all decoding stdlib zlib. Contract oracle:
    literal expected table validated value-exact in-session."""
    _prep(spark)
    from polars_dataset_spark.functions import pdf_text

    s1 = (
        b"BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 TD (second line) Tj ET\n"
        b"BT 72 600 Td [(A) -400 (B) 10 (C)] TJ ET\n"
    )
    s2 = (
        b"BT 72 720 Td (paren \\(x\\) and \\\\ slash \\100) Tj ET\n"
        b"BT 72 700 Td <48454C4C4F> Tj (cont)' ET\n"
    )
    rows = [
        (0, bytearray(_pdf15_text_fixture([s1, s2], content_flate=False))),
        (1, bytearray(_pdf15_text_fixture([s1, s2], content_flate=True))),
        (2, bytearray(_pdf15_text_fixture([s1], stale_copy=True))),
        (3, bytearray(_pdf_fixture(hidden_tree=True, version="1.6"))),
        (4, bytearray(b"not a pdf")),
    ]
    df = spark.createDataFrame(rows, "doc_blob_id long, content binary")
    return pdf_text(df).select("doc_blob_id", "page_idx", "page_text")


def _y4m_fixture(frames, colorspace: bytes = b"C420", fps: str = "25:1") -> bytes:
    """YUV4MPEG2 bytes from (h, w) uint8 luma planes; chroma planes are
    zeroed (the perceptual hash is luma-only by design)."""
    import numpy as _np

    h, w = frames[0].shape
    head = b"YUV4MPEG2 W%d H%d F%s Ip A1:1 %s\n" % (
        w, h, fps.encode(), colorspace,
    )
    chroma = {b"C420": (w // 2) * (h // 2) * 2, b"C444": 2 * w * h, b"Cmono": 0}[
        colorspace
    ]
    out = [head]
    for y in frames:
        out.append(b"FRAME\n")
        out.append(_np.asarray(y, dtype=_np.uint8).tobytes())
        out.append(bytes(chroma))
    return b"".join(out)


def _video_clip_fixture(phase: float = 0.0, w: int = 64, h: int = 48, n: int = 16):
    """A horizontally panning sine scene — continuous motion, the
    hardest honest case for duration-relative time segmentation (a
    static scene would make every temporal invariance trivially 0)."""
    import numpy as _np

    xx = _np.arange(w)[None, :]
    frames = []
    for t in range(n):
        f = 128.0 + 100.0 * _np.sin(2 * _np.pi * (xx / w + t / n + phase))
        frames.append(_np.clip(f + _np.zeros((h, 1)), 0, 255).astype(_np.uint8))
    return frames


@query(
    "q217_video_neardup",
    """
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(hamming AS INTEGER) AS hamming
    FROM (VALUES
      (0, 1, 0), (0, 2, 1), (0, 3, 4), (0, 4, 0),
      (1, 2, 1), (1, 3, 4), (1, 4, 0),
      (2, 3, 3), (2, 4, 1),
      (3, 4, 4)
    ) AS t(id_a, id_b, hamming)
    """,
)
def q217(spark, sf_dir):
    """Perceptual video near-dup (functions/videohash) — completes the
    modality matrix (text q141/image q203/audio q212, VERDICT r10 #3):
    a crawl's duplicate video is never byte-identical (the same clip
    arrives at different resolutions, frame rates and chroma layouts),
    so exact dedup is blind to it. 64-bit temporal signature: per-frame
    8x9 luma thumbnails, 8 duration-relative time segments (the audio
    hash's time axis), 8 adjacent-column sign diffs of each segment's
    mean thumbnail (the image dHash's spatial bit rule) — then the SAME
    pigeonhole Hamming banding (recall exactly 1, bit_count verify,
    shuffle ∝ N·(k+1), never all-pairs). Fixtures: one panning clip
    through a C444 chroma re-encode (hamming 0 — luma-only by
    construction), a half-resolution rescale (1), a 2x frame-drop
    retime (4 — the segment-boundary phase cost that motivates the
    video family's max_hamming=4 budget), a +12 brightness shift (0);
    a different clip sits 48+ bits away, and too-short (7 frames) /
    undecodable blobs hash null and pair with nothing. Decode runs once
    per blob; map-only except the banded equi-join. Contract oracle:
    the exact expected pair table."""
    _prep(spark)
    import numpy as np

    from polars_dataset_spark.functions import video_neardup_pairs

    A = _video_clip_fixture()
    B = _video_clip_fixture(phase=0.37)
    rows = [
        (0, bytearray(_y4m_fixture(A))),
        (1, bytearray(_y4m_fixture(A, colorspace=b"C444"))),
        (2, bytearray(_y4m_fixture([f[::2, ::2] for f in A]))),
        (3, bytearray(_y4m_fixture(A[::2], fps="25:2"))),
        (4, bytearray(_y4m_fixture(
            [np.clip(f.astype(int) + 12, 0, 255).astype(np.uint8) for f in A]
        ))),
        (5, bytearray(_y4m_fixture(B))),
        (6, bytearray(_y4m_fixture(A[:7]))),
        (7, bytearray(b"not a video")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return video_neardup_pairs(df).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.col("hamming").cast("int"),
    )


# q218: synthesized frontier — host and path CASE expressions shared
# VERBATIM between the Spark side (F.expr) and the DuckDB oracle; the
# oracle replays RFC 9309 longest-match precedence over a literal rule
# table (rule_len*2 + allow-bit makes max() implement "longest wins,
# Allow wins ties" in pure SQL)
_Q218_HOST_EXPR = """
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN 'a.example' WHEN 1 THEN 'b.example' ELSE 'c.example' END
"""
_Q218_PATH_EXPR = """
    CASE CAST(doc_id % 9 AS INT)
      WHEN 0 THEN '/private/page'
      WHEN 1 THEN '/private/public/x'
      WHEN 2 THEN '/data/feed.json'
      WHEN 3 THEN '/graft/secret'
      WHEN 4 THEN '/gr/ok'
      WHEN 5 THEN '/tmp/x'
      WHEN 6 THEN '/tmp/ok/y'
      WHEN 7 THEN '/search'
      ELSE '/data/feed.jsonl'
    END
"""

_Q218_ROBOTS_A = b"""\
# site-wide politeness
User-agent: *
Disallow: /private/
Allow: /private/public/
Disallow: /*.json$
Crawl-delay: 2

User-agent: graftbot
Disallow: /graft/
Allow: /gr
Crawl-delay: 5
"""
_Q218_ROBOTS_B = b"""\
User-agent: otherbot
Disallow: /

User-agent: *
Disallow: /tmp/
Disallow: /search$
Allow: /tmp/ok
Disallow: /*.json$
Crawl-delay: 1.5
"""


@query(
    "q218_robots_frontier",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q218_HOST_EXPR} AS host, {_Q218_PATH_EXPR} AS path
      FROM documents
    ),
    rules(rhost, rx, rule_len, allow, delay) AS (VALUES
      ('a.example', '^/graft/',    7, false, 5.0),
      ('a.example', '^/gr',        3, true,  5.0),
      ('b.example', '^/tmp/',      5, false, 1.5),
      ('b.example', '^/search$',   8, false, 1.5),
      ('b.example', '^/tmp/ok',    7, true,  1.5),
      ('b.example', '^/.*\\.json$', 8, false, 1.5)
    ),
    m AS (
      SELECT s.doc_id, s.host, s.path,
             CASE WHEN regexp_matches(s.path, r.rx)
                  THEN r.rule_len * 2 + CAST(r.allow AS INT) END AS matchkey,
             r.delay, r.rhost IS NOT NULL AS has_robots
      FROM src s LEFT JOIN rules r ON s.host = r.rhost
    ),
    agg AS (
      SELECT doc_id, host, path,
             max(matchkey) AS bestkey,
             max(delay) AS delay,
             bool_or(has_robots) AS has_robots
      FROM m GROUP BY doc_id, host, path
    )
    SELECT doc_id, 'http://' || host || path AS url,
           CAST(CASE WHEN bestkey IS NULL THEN true
                     ELSE bestkey % 2 = 1 END AS BOOLEAN) AS allowed,
           CAST(CASE WHEN has_robots THEN delay END AS DOUBLE) AS crawl_delay
    FROM agg
    """,
)
def q218(spark, sf_dir):
    """robots.txt politeness filter (functions/robots — RFC 9309,
    VERDICT r10 #4): the stage every crawler runs between the outlink
    frontier (q215) and fetch. The Spark side parses two REAL robots
    files with the stdlib parser — group selection picks the
    'graftbot' group on a.example (NOT the * group: groups don't
    merge) and falls back to * on b.example past the otherbot group;
    rules compile to portable regexes ONCE per host (map-only Arrow
    pass), collapse to per-host rule arrays, broadcast, and
    longest-match precedence (Allow wins ties) evaluates per link row
    with higher-order array functions — ZERO exchanges on the frontier
    side. c.example has no robots file: allowed, NULL crawl_delay.
    Paths exercise wildcard+anchor (/*.json$ hits .json, misses
    .jsonl), nested allow-under-disallow (/tmp/ok under /tmp/), exact
    $ anchoring (/search), and prefix overlap (/gr allows, /graft/
    disallows — longer wins). FULL value oracle: the host/path CASEs
    are shared verbatim and the oracle replays precedence over the
    literal rule table, so every row is value-checked at every SF."""
    _prep(spark)
    from polars_dataset_spark.functions import frontier_filter, robots_rules

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://"), F.expr(_Q218_HOST_EXPR), F.expr(_Q218_PATH_EXPR)
        ).alias("url"),
    )
    robots_df = spark.createDataFrame(
        [
            ("a.example", bytearray(_Q218_ROBOTS_A)),
            ("b.example", bytearray(_Q218_ROBOTS_B)),
        ],
        "host string, robots_txt binary",
    )
    rules = robots_rules(robots_df, user_agent="graftbot")
    out = frontier_filter(docs, rules, url_col="url", keep_disallowed=True)
    return out.select(
        "doc_id", "url", "allowed", F.col("crawl_delay").cast("double")
    )


@query(
    "q219_video_index_filter",
    """
    SELECT CAST(media_id AS BIGINT) AS media_id, kind
    FROM (VALUES
      (12, 'novel'), (13, 'tooshort'), (14, 'junk')
    ) AS t(media_id, kind)
    """,
)
def q219(spark, sf_dir):
    """Arriving-vs-corpus video dedup (videohash.build_video_index /
    video_filter_against) — closes the static-index family across ALL
    four modalities (text q141, image q209, audio q214, video here):
    the corpus is decoded + fingerprinted ONCE into a persisted banded
    index; each arriving batch pays one map-only decode pass and one
    band equi-join. Fixtures: a half-resolution rescale of corpus clip
    A and a 2x frame-drop retime of corpus clip B must DROP (inside
    the max_hamming=4 budget); a novel clip, a too-short-to-fingerprint
    clip, and an undecodable blob are KEPT (absence of evidence is not
    duplication). Contract oracle: the exact surviving-id table."""
    _prep(spark)
    from polars_dataset_spark.functions import build_video_index, video_filter_against

    A = _video_clip_fixture()
    B = _video_clip_fixture(phase=0.61)
    corpus = spark.createDataFrame(
        [(0, bytearray(_y4m_fixture(A))), (1, bytearray(_y4m_fixture(B)))],
        "media_id long, content binary",
    )
    idx = build_video_index(corpus)
    novel = _video_clip_fixture(phase=0.23)
    batch = spark.createDataFrame(
        [
            (10, "rescale", bytearray(_y4m_fixture([f[::2, ::2] for f in A]))),
            (11, "retime", bytearray(_y4m_fixture(B[::2], fps="25:2"))),
            (12, "novel", bytearray(_y4m_fixture(novel))),
            (13, "tooshort", bytearray(_y4m_fixture(A[:7]))),
            (14, "junk", bytearray(b"not a video")),
        ],
        "media_id long, kind string, content binary",
    )
    return video_filter_against(batch, idx).select("media_id", "kind")


def _audio_rich_fixture(rate: int, base: float = 330.0, secs: float = 0.6):
    """Harmonic-rich AM-modulated float frames (n, 1) — the broadband
    signal class the perceptual hash targets (pure tones are the
    pathological near-tie case and are covered by the relative-floor
    rule instead)."""
    import numpy as np

    t = np.arange(int(rate * secs)) / rate
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.0 * t))
    sig = 0.4 * env * (
        np.sin(2 * np.pi * base * t)
        + 0.5 * np.sin(2 * np.pi * 2.3 * base * t)
        + 0.25 * np.sin(2 * np.pi * 4.1 * base * t)
    )
    return sig[:, None]


def _pcm_wav_fixture(frames, rate: int) -> bytes:
    """16-bit PCM RIFF/WAVE of float frames in [-1, 1]."""
    import struct

    raw = (frames * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
    nch = frames.shape[1]
    block = nch * 2
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * block, block, 16)
    data = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    data += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(data)) + b"WAVE" + data


@query(
    "q212_audio_neardup",
    """
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(hamming AS INTEGER) AS hamming
    FROM (VALUES
      (0, 1, 0), (0, 2, 0), (0, 3, 0),
      (1, 2, 0), (1, 3, 0), (2, 3, 0)
    ) AS t(id_a, id_b, hamming)
    """,
)
def q212(spark, sf_dir):
    """Perceptual audio near-dup (functions/audiohash): the audio twin
    of image dHash (q203) — a crawl's duplicate recordings are never
    byte-identical (same master arrives as 8 kHz WAV here, FLAC there,
    44.1 kHz somewhere else), so exact dedup is blind to them. 64-bit
    Haitsma–Kalker-style sign-of-band-energy hash (9 log bands inside
    200–3200 Hz -> 8 adjacent diffs x 8 duration-relative time segments
    over a Hann STFT at a normalized 8 kHz — all bits in-band, ADVICE
    r10), then the SAME pigeonhole Hamming banding as
    SimHash/dHash (recall exactly 1, bit_count verify, shuffle
    ∝ N·(k+1), never all-pairs). Fixtures: one recording through three
    lossless containers (WAV/FLAC/AIFF — identical PCM must hash
    IDENTICALLY) plus a 44.1 kHz copy (resample invariance, hamming 0
    by the relative-floor tie rule); a different recording (550 Hz
    base, 32 bits away) and undecodable/null blobs must pair with
    nothing. Decode runs once per blob; map-only except the banded
    equi-join. Contract oracle: the exact expected pair table."""
    _prep(spark)
    from polars_dataset_spark.functions import audio_neardup_pairs
    from polars_dataset_spark.functions.aiff import encode_aiff
    from polars_dataset_spark.functions.flac import encode_flac

    sig = _audio_rich_fixture(8000)
    ints = (sig * 32768.0).clip(-32768, 32767).astype("int64")
    rows = [
        (0, bytearray(_pcm_wav_fixture(sig, 8000))),
        (1, bytearray(encode_flac(ints, rate=8000))),
        (2, bytearray(encode_aiff(ints, 8000))),
        (3, bytearray(_pcm_wav_fixture(_audio_rich_fixture(44100), 44100))),
        (4, bytearray(_pcm_wav_fixture(_audio_rich_fixture(8000, base=550.0), 8000))),
        (5, bytearray(b"not audio")),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    return audio_neardup_pairs(df, max_hamming=3).select("id_a", "id_b", "hamming")


@query(
    "q215_outlink_frontier",
    """
    SELECT CAST(page_id AS BIGINT) AS page_id,
           CAST(link_idx AS INTEGER) AS link_idx, link_url, url_canon
    FROM (VALUES
      (0, 0, 'http://ex.com/sub/page.html', 'http://ex.com/sub/page.html'),
      (0, 1, 'http://ex.com/abs',           'http://ex.com/abs'),
      (0, 2, 'http://other.example/x',      'http://other.example/x'),
      (0, 3, 'https://full.example/y',      'https://full.example/y'),
      (1, 0, 'http://site.example/one',     'http://site.example/one'),
      (1, 1, 'https://Site.Example:443/two//x/?utm_source=s&b=2&a=1',
             'https://site.example/two/x/?a=1&b=2')
    ) AS t(page_id, link_idx, link_url, url_canon)
    """,
)
def q215(spark, sf_dir):
    """Crawl-frontier stage (html.html_links -> urls.canonicalize_url):
    outgoing links of each fetched page, RFC 3986-resolved (<base href>
    honored, relative <base> against the page URI, protocol-relative
    inherits scheme, fragments stripped, javascript:/mailto:/fragment-
    only and script-subtree anchors dropped), then canonicalized by the
    q207 operator for frontier dedup. Both stages map-only (the q207
    half is pure codegen); the explode is per-page within the row.
    Fixtures: a <base>-bearing page exercising every resolution rule
    and a page whose messy absolute link must canonicalize (case,
    default port, slash runs, utm strip, param sort). Contract oracle:
    literal expected table."""
    _prep(spark)
    from polars_dataset_spark.functions import canonicalize_url, html_links

    p0 = (
        '<html><head><base href="/sub/"></head><body>'
        '<a href="page.html">rel</a><a href="/abs">abs</a>'
        '<a href="//other.example/x">pr</a>'
        '<a href="https://full.example/y#frag">full</a>'
        '<a href="javascript:void(0)">js</a><a href="#top">frag</a>'
        '<script>document.write(\'<a href="/ghost">skip</a>\')</script>'
        "</body></html>"
    ).encode()
    p1 = (
        '<a href="/one">1</a>'
        '<a href="HTTPS://Site.Example:443/two//x/?utm_source=s&amp;b=2&amp;a=1#f">2</a>'
        '<a href="mailto:x@y.z">m</a>'
    ).encode()
    rows = [
        (0, "http://ex.com/dir/p.html", bytearray(p0)),
        (1, "http://site.example/a/b.html", bytearray(p1)),
        (2, "http://empty.example/", bytearray(b"<p>no links</p>")),
    ]
    df = spark.createDataFrame(rows, "page_id long, url string, payload binary")
    links = html_links(df, url_col="url")
    return canonicalize_url(links, url_col="link_url").select(
        "page_id", "link_idx", "link_url", "url_canon"
    )


@query(
    "q214_audio_index_filter",
    """
    SELECT CAST(media_id AS BIGINT) AS media_id, kind
    FROM (VALUES
      (12, 'novel'), (13, 'tooshort'), (14, 'junk')
    ) AS t(media_id, kind)
    """,
)
def q214(spark, sf_dir):
    """Arriving-vs-corpus audio dedup (audiohash.build_audio_index /
    audio_filter_against) — completes the static-index family across
    modalities (text q141, image q209, audio here): the corpus is
    decoded + fingerprinted ONCE into a persisted banded index; each
    arriving batch pays one map-only decode pass and one band
    equi-join. Fixtures: a FLAC re-encode of corpus recording A and a
    44.1 kHz copy of corpus recording B must DROP (re-encode exact,
    resample via the relative-floor rule); a novel recording, a
    too-short-to-fingerprint clip, and an undecodable blob are KEPT
    (absence of evidence is not duplication). Contract oracle: the
    exact surviving-id table."""
    _prep(spark)
    from polars_dataset_spark.functions import audio_filter_against, build_audio_index
    from polars_dataset_spark.functions.aiff import encode_aiff
    from polars_dataset_spark.functions.flac import encode_flac

    sig_a = _audio_rich_fixture(8000)
    sig_b = _audio_rich_fixture(8000, base=550.0)
    ints_a = (sig_a * 32768.0).clip(-32768, 32767).astype("int64")
    corpus = spark.createDataFrame(
        [(0, bytearray(_pcm_wav_fixture(sig_a, 8000))),
         (1, bytearray(_pcm_wav_fixture(sig_b, 8000)))],
        "media_id long, content binary",
    )
    idx = build_audio_index(corpus)
    batch = spark.createDataFrame(
        [
            (10, "reencode", bytearray(encode_flac(ints_a, rate=8000))),
            (11, "resample", bytearray(_pcm_wav_fixture(_audio_rich_fixture(44100, base=550.0), 44100))),
            (12, "novel", bytearray(_pcm_wav_fixture(_audio_rich_fixture(8000, base=770.0), 8000))),
            (13, "tooshort", bytearray(encode_aiff(ints_a[:400], 8000))),
            (14, "junk", bytearray(b"not audio")),
        ],
        "media_id long, kind string, content binary",
    )
    return audio_filter_against(batch, idx).select("media_id", "kind")


# q213: every document wrapped in an HTML page template — the escape
# chain and template are ANSI SQL shared VERBATIM by the Spark side
# (F.expr) and the DuckDB oracle, so the extractor's inverse (strip
# markup, decode entities, drop nav/footer boilerplate, collapse
# whitespace) has a FULL value oracle at EVERY SF, not just fixtures
_Q213_HTML_EXPR = """
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR(32))
    || '</title></head><body><nav><a href="/">Home</a> <a href="/a">About</a></nav><p>'
    || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')
    || '</p><footer><a href="/terms">Terms</a></footer></body></html>'
"""


@query(
    "q213_html_corpus_scaled",
    f"""
    SELECT doc_id, 'utf-8' AS charset,
           'Doc ' || CAST(doc_id AS VARCHAR(32)) AS title,
           trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
    FROM documents
    """,
)
def q213(spark, sf_dir):
    """SF-scaled HTML extraction (functions/html.html_to_text): q210
    proves the corners on spec-built fixtures; this proves the VOLUME
    path — every document of the corpus wrapped in a page template
    (title, nav + footer link boilerplate, entity-escaped body) whose
    SQL is shared verbatim with the oracle, so extraction must invert
    the template EXACTLY at any SF: strip tags, decode entities back,
    drop the two link-dense blocks, collapse whitespace. One map-only
    Arrow pass over utf-8 bytes; the oracle is just the original text
    whitespace-normalized. Catches Arrow-batch/fragmentation bugs a
    6-row fixture never would."""
    _prep(spark)
    from polars_dataset_spark.functions import html_to_text

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.expr(_Q213_HTML_EXPR), "utf-8").alias("payload")
    )
    return html_to_text(docs, body_col="payload").select(
        "doc_id", "charset", "title", "text"
    )


def _html_page_fixtures() -> "list[tuple[str, bytes, str]]":
    """(uri, body bytes, HTTP Content-Type) HTML pages covering the
    charset + markup hazards the extractor exists for: entity refs,
    script/style/comment stripping, nav boilerplate, cp1252 under an
    iso-8859-1 label, meta-prescan cp1251, UTF-16LE BOM, unclosed
    tags."""
    utf8 = (
        b'<html><head><title>Alpha &amp; Beta</title><style>p{color:red}</style>'
        b'<script>var s="<p>no</p>";</script></head><body><!--c-->'
        b'<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        b"<p>Tom &amp; Jerry &#8212; the classic duo.</p>"
        b"<h2>hello crawl</h2></body></html>"
    )
    cp1252 = b"<p>caf\xe9 \x97 50\xa2</p>"  # e-acute, em-dash, cent sign
    cp1251 = '<meta charset="windows-1251"><p>Привет мир</p>'.encode("cp1251")
    utf16 = "<html><title>Seize</title><body><p>sixteen bits wide</p></body></html>".encode(
        "utf-16"  # LE with BOM
    )
    unclosed = b"<div><p>first part <b>bold run<ul><li>item one<li>item two"
    return [
        ("http://ex.com/utf8", utf8, "text/html; charset=utf-8"),
        ("http://ex.com/cp1252", cp1252, "text/html; charset=iso-8859-1"),
        ("http://ex.com/meta", cp1251, "text/html"),
        ("http://ex.org/utf16", utf16, "text/html"),
        ("http://ex.org/unclosed", unclosed, "text/html"),
    ]


@query(
    "q210_html_to_text",
    """
    SELECT target_uri, charset, title, text
    FROM (VALUES
      ('http://ex.com/utf8', 'utf-8', 'Alpha & Beta',
       'Tom & Jerry — the classic duo.' || chr(10) || 'hello crawl'),
      ('http://ex.com/cp1252', 'windows-1252', NULL, 'café — 50¢'),
      ('http://ex.com/meta', 'windows-1251', NULL, 'Привет мир'),
      ('http://ex.org/utf16', 'utf-16-le', 'Seize', 'sixteen bits wide'),
      ('http://ex.org/unclosed', 'utf-8', NULL,
       'first part bold run' || chr(10) || 'item one' || chr(10) || 'item two')
    ) AS t(target_uri, charset, title, text)
    """,
)
def q210(spark, sf_dir):
    """HTML -> text extraction (functions/html.warc_text_corpus): the
    stage that closed the last gap in the WARC -> training-shards
    pipeline (VERDICT r9 #1). End-to-end from CONTAINER bytes: two WARC
    blobs (one plain, one per-record-gzip) holding five HTML pages plus
    a 404 and an image/jpeg response that must never reach extraction.
    Covers the charset ladder (HTTP-header cp1252 under its iso-8859-1
    alias label, meta-prescan cp1251, UTF-16LE BOM, utf-8 default),
    entity decoding, script/style/comment stripping, nav-boilerplate
    pruning, block segmentation, and unclosed-tag tolerance — all
    stdlib, one map-only Arrow pass after the record explode (zero
    exchanges; linear in crawl bytes at any SF). Contract oracle:
    literal expected table validated value-exact in-session."""
    _prep(spark)
    import gzip

    from polars_dataset_spark.functions import warc_text_corpus

    def resp(uri: str, body: bytes, ctype: str, status: str = "200 OK") -> bytes:
        http = f"HTTP/1.1 {status}\r\nContent-Type: {ctype}\r\n\r\n".encode() + body
        return _warc_record(
            "response", uri, http,
            "Content-Type: application/http; msgtype=response\r\n",
        )

    pages = _html_page_fixtures()
    plain = b"".join(resp(u, b, c) for u, b, c in pages[:3]) + resp(
        "http://ex.com/404", b"<p>gone</p>", "text/html", status="404 Not Found"
    )
    gz = b"".join(
        gzip.compress(r, mtime=0)
        for r in (
            resp(*pages[3]),
            resp(*pages[4]),
            resp("http://ex.org/img", bytes(range(48)), "image/jpeg"),
        )
    )
    blobs = [(0, bytearray(plain)), (1, bytearray(gz))]
    df = spark.createDataFrame(blobs, "blob_id long, content binary")
    return warc_text_corpus(df).select("target_uri", "charset", "title", "text")


@query(
    "q220_density_boilerplate",
    """
    SELECT CAST(page_id AS BIGINT) AS page_id, mode, text
    FROM (VALUES
      (0, 'link', 'Home » Products' || chr(10) || 'Your trusted source'
          || chr(10) || 'Sign up now today'
          || chr(10) || 'Seventeen sturdy words of genuine article prose '
          || 'stretch this paragraph well past every word threshold the '
          || 'published tree checks against.'),
      (0, 'density', 'Sign up now today'
          || chr(10) || 'Seventeen sturdy words of genuine article prose '
          || 'stretch this paragraph well past every word threshold the '
          || 'published tree checks against.'),
      (1, 'link', 'Forty plus words of body prose follow here so the '
          || 'second page article survives both classifiers: the published '
          || 'tree keeps any block longer than forty words even when it '
          || 'directly follows link dense navigation chrome and nothing at '
          || 'all comes after it.'),
      (1, 'density', 'Forty plus words of body prose follow here so the '
          || 'second page article survives both classifiers: the published '
          || 'tree keeps any block longer than forty words even when it '
          || 'directly follows link dense navigation chrome and nothing at '
          || 'all comes after it.')
    ) AS t(page_id, mode, text)
    """,
)
def q220(spark, sf_dir):
    """Boilerplate classifier comparison (html.extract_text mode=, r11
    — VERDICT r10 #5): the SAME pages through both classifiers. Page 0
    carries link-FREE chrome (breadcrumb, tagline) that the local
    link-ratio rules keep by construction and Boilerpipe's published
    NumWordsRules tree (WSDM 2010) drops via neighbor word counts; the
    short CTA fragment directly before long content is KEPT by the
    tree (its next-block branch) — pinned so the published tree's
    exact behavior, including its known boundary case, is the
    contract. Page 1 is a >40-word article after link-dense nav: the
    nav drops in both modes, and the long block survives the tree's
    prev-link-dense branch unconditionally.
    ONE fused map-only Arrow pass for BOTH modes (r13,
    html_to_text_modes): each page is decoded and parsed once, both
    classifiers run over the shared block list — the former per-mode
    union decoded and parsed every page once per mode. Contract
    oracle: literal expected text per (page, mode)."""
    _prep(spark)
    from polars_dataset_spark.functions import html_to_text_modes

    p0 = (
        "<html><body>"
        "<div>Home » Products</div>"
        "<div>Your trusted source</div>"
        "<div>Sign up now today</div>"
        "<p>Seventeen sturdy words of genuine article prose stretch this "
        "paragraph well past every word threshold the published tree "
        "checks against.</p>"
        "</body></html>"
    ).encode()
    p1 = (
        '<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<p>Forty plus words of body prose follow here so the second "
        "page article survives both classifiers: the published tree keeps "
        "any block longer than forty words even when it directly follows "
        "link dense navigation chrome and nothing at all comes after "
        "it.</p></body>"
    ).encode()
    pages = spark.createDataFrame(
        [(0, bytearray(p0)), (1, bytearray(p1))], "page_id long, payload binary"
    )
    return html_to_text_modes(pages, modes=("link", "density")).select(
        "page_id", "mode", "text"
    )


# q221: PII planted into every k-th document — the planting CASE is
# ANSI SQL shared VERBATIM by the Spark side (F.expr) and the DuckDB
# oracle, and the oracle re-applies the SAME portable regex strings
# (interpolated from the module — one source of truth) in the SAME
# fixed sequential order, so detection counts AND the scrubbed text
# have a FULL value oracle at every SF
from polars_dataset_spark.functions.pii import PII_PATTERNS as _PII_RX

_PII_RX_SQL = {k: v.replace("'", "''") for k, v in _PII_RX.items()}
_Q221_TEXT_EXPR = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN text || ' contact alice.smith+news@mail.example.co.uk today'
      WHEN 1 THEN 'server ' || CAST(10 + doc_id % 200 AS VARCHAR(32))
                || '.0.' || CAST(doc_id % 256 AS VARCHAR(32)) || '.1 down, call (415) 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR(32)), 4, '0')
      WHEN 2 THEN 'ssn 123-45-6789 card 4111 1111 1111 1111 ' || text
      WHEN 3 THEN text || ' ring +4915123456789 or 415-555-2671'
      ELSE text
    END
"""


@query(
    "q221_pii_scrub",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q221_TEXT_EXPR} AS t0 FROM documents
    ),
    s1 AS (SELECT doc_id, t0, regexp_replace(t0,
      '{_PII_RX_SQL["email"]}', '[EMAIL]', 'g') AS t1 FROM src),
    s2 AS (SELECT *, regexp_replace(t1,
      '{_PII_RX_SQL["ipv4"]}', '[IP]', 'g') AS t2 FROM s1),
    s3 AS (SELECT *, regexp_replace(t2,
      '{_PII_RX_SQL["ssn"]}', '[SSN]', 'g') AS t3 FROM s2),
    s4 AS (SELECT *, regexp_replace(t3,
      '{_PII_RX_SQL["phone"]}', '[PHONE]', 'g') AS t4 FROM s3)
    SELECT doc_id,
      CAST(len(regexp_extract_all(t0, '{_PII_RX_SQL["email"]}')) AS INTEGER) AS n_email,
      CAST(len(regexp_extract_all(t1, '{_PII_RX_SQL["ipv4"]}')) AS INTEGER) AS n_ipv4,
      CAST(len(regexp_extract_all(t2, '{_PII_RX_SQL["ssn"]}')) AS INTEGER) AS n_ssn,
      CAST(len(regexp_extract_all(t3, '{_PII_RX_SQL["phone"]}')) AS INTEGER) AS n_phone,
      CAST(len(regexp_extract_all(t4, '{_PII_RX_SQL["cc"]}')) AS INTEGER) AS n_cc,
      regexp_replace(t4, '{_PII_RX_SQL["cc"]}', '[CARD]', 'g') AS scrubbed
    FROM s4
    """,
)
def q221(spark, sf_dir):
    """PII detection + redaction (functions/pii — the scrubbing stage
    every public-web corpus runs before release): five portable-regex
    families (email, IPv4 with octet guards, SSN shape with invalid
    prefixes excluded, 13-16-digit card runs — shape only, Luhn is not
    regex-expressible and over-matching is the right bias for a
    scrubber — and +international / NANP phones), counted
    SEQUENTIALLY (``with_pii_counts``: each family counts what the
    scrubber attributes to it after earlier families consumed their
    matches) and replaced with placeholders in the module's FIXED
    order (``scrub_pii``: email, ipv4, ssn, phone, cc — an
    unseparated +international number IS a 13-digit run, so phone
    must outrank the card family). Pure codegen regexp projections,
    zero exchanges, linear in corpus bytes. FULL value oracle: the
    planting CASE is shared verbatim and the oracle interpolates the
    IDENTICAL RE2-portable pattern strings from the module (one
    source of truth) in the identical order — counts and scrubbed
    text value-checked at every SF."""
    _prep(spark)
    from polars_dataset_spark.functions import scrub_pii, with_pii_counts

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q221_TEXT_EXPR).alias("text")
    )
    counted = with_pii_counts(docs)
    return scrub_pii(counted, out_col="scrubbed").select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_phone", "n_cc", "scrubbed"
    )


@query(
    "q222_sitemap_entries",
    """
    SELECT CAST(site_id AS BIGINT) AS site_id, kind,
           CAST(entry_idx AS INTEGER) AS entry_idx, loc, lastmod,
           changefreq, CAST(priority AS DOUBLE) AS priority
    FROM (VALUES
      (0, 'urlset', 0, 'https://a.example/',        '2026-08-01', 'daily',  0.9),
      (0, 'urlset', 1, 'https://a.example/about',   NULL,         NULL,     NULL),
      (0, 'urlset', 2, 'https://a.example/news',    '2026-08-15', 'hourly', 1.0),
      (1, 'sitemapindex', 0, 'https://b.example/sm1.xml.gz', '2026-07-01', NULL, NULL),
      (1, 'sitemapindex', 1, 'https://b.example/sm2.xml',    NULL,         NULL, NULL),
      (2, 'urlset', 0, 'https://c.example/only',   NULL, NULL, 0.5),
      (3, 'urlset', NULL, NULL, NULL, NULL, NULL),
      (4, NULL, NULL, NULL, NULL, NULL, NULL)
    ) AS t(site_id, kind, entry_idx, loc, lastmod, changefreq, priority)
    """,
)
def q222(spark, sf_dir):
    """Sitemap parsing (functions/sitemap — sitemaps.org protocol):
    the crawl-SEEDING stage pairing with robots politeness (q218) and
    the outlink frontier (q215) — robots.txt's global ``Sitemap:``
    lines (parse_robots now returns them) point here. Handles
    ``<urlset>`` seed pages with lastmod/changefreq/priority
    scheduling hints, ``<sitemapindex>`` children, gzipped blobs
    (sniffed), namespace tolerance (the c.example fixture omits the
    xmlns entirely — local tag names decide), entries missing the
    required ``<loc>`` skipped, an EMPTY urlset yielding one
    null-entry row, and junk yielding a null-kind row (the q205 gate
    rule). One map-only Arrow pass, stdlib gzip + ElementTree (no
    external entity resolution), 50 MB protocol cap. Contract oracle:
    literal expected table."""
    _prep(spark)
    import gzip as _gzip

    ns = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
    urlset = (
        f"<?xml version='1.0' encoding='UTF-8'?><urlset {ns}>"
        "<url><loc>https://a.example/</loc><lastmod>2026-08-01</lastmod>"
        "<changefreq>daily</changefreq><priority>0.9</priority></url>"
        "<url><loc> https://a.example/about </loc></url>"
        "<url><loc>https://a.example/news</loc><lastmod>2026-08-15</lastmod>"
        "<changefreq>hourly</changefreq><priority>1.0</priority></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no <loc>: skipped
        "</urlset>"
    ).encode()
    index = (
        f"<sitemapindex {ns}>"
        "<sitemap><loc>https://b.example/sm1.xml.gz</loc>"
        "<lastmod>2026-07-01</lastmod></sitemap>"
        "<sitemap><loc>https://b.example/sm2.xml</loc></sitemap>"
        "</sitemapindex>"
    ).encode()
    # no namespace at all + gzipped: both must still parse
    bare = (
        "<urlset><url><loc>https://c.example/only</loc>"
        "<priority>0.5</priority></url></urlset>"
    ).encode()
    rows = [
        (0, bytearray(urlset)),
        (1, bytearray(index)),
        (2, bytearray(_gzip.compress(bare, mtime=0))),
        (3, bytearray(f"<urlset {ns}></urlset>".encode())),
        (4, bytearray(b"not xml at all")),
    ]
    from polars_dataset_spark.functions import sitemap_entries

    df = spark.createDataFrame(rows, "site_id long, content binary")
    return sitemap_entries(df).select(
        "site_id", "kind", "entry_idx", "loc", "lastmod", "changefreq",
        F.col("priority").cast("double"),
    )


@query(
    "q223_anchor_inlinks",
    """
    SELECT url, CAST(n_inlinks AS BIGINT) AS n_inlinks,
           CAST(n_pages AS BIGINT) AS n_pages, anchors
    FROM (VALUES
      ('http://s.example/a',     2, 2, 'Article A|the A page'),
      ('http://s.example/b',     3, 2, 'B|see B'),
      ('http://other.example/x', 1, 1, ''),
      ('http://s.example/img',   1, 1, '')
    ) AS t(url, n_inlinks, n_pages, anchors)
    """,
)
def q223(spark, sf_dir):
    """Anchor-text + inlink aggregation (html.html_links with_text=True
    -> urls.canonicalize_url -> one keyed aggregate): what the REST of
    the web calls each page — the classic query-independent relevance
    / crawl-prioritization signal (inlink counts drive frontier
    priority; anchor terms describe targets better than their own
    pages do). Per canonical URL: total inlinks, distinct referring
    pages, and the sorted distinct non-empty anchor texts (pipe-joined
    — deterministic at any partitioning). Anchor text is the
    character data inside <a>...</a> (inline children transparent,
    image-only links yield ''), whitespace-collapsed. Plan: map-only
    extract + canonicalize, then ONE hash aggregate on the canonical
    URL — the natural link-inversion job at any scale. Fixtures: two
    pages cross-linking with differing anchors (dup links on one page
    count twice in n_inlinks, once in n_pages), an image-only link,
    an external link. Contract oracle: literal expected table."""
    _prep(spark)
    from polars_dataset_spark.functions import canonicalize_url, html_links

    p0 = (
        '<p><a href="/a">Article A</a> and <a href="/b"><b>see</b> B</a>'
        ' and <a href="/b">see B</a>'
        ' and <a href="http://other.example/x"><img src="i.png"></a></p>'
    ).encode()
    p1 = (
        '<a href="/a">the A page</a> <a href="/b#frag">B</a>'
        ' <a href="/img"><img src="t.gif"></a>'
    ).encode()
    pages = spark.createDataFrame(
        [
            (0, "http://s.example/p0", bytearray(p0)),
            (1, "http://s.example/p1", bytearray(p1)),
        ],
        "page_id long, url string, payload binary",
    )
    links = canonicalize_url(
        html_links(pages, url_col="url", with_text=True), url_col="link_url"
    )
    return (
        links.groupBy(F.col("url_canon").alias("url"))
        .agg(
            F.count("*").alias("n_inlinks"),
            F.countDistinct("page_id").alias("n_pages"),
            F.array_join(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.when(F.col("anchor_text") != "", F.col("anchor_text"))
                        )
                    )
                ),
                "|",
            ).alias("anchors"),
        )
    )


@query(
    "q224_jsonl_roundtrip",
    """
    SELECT doc_id, source, CAST(n_corrupt AS BIGINT) AS n_corrupt,
           length(text) AS text_len
    FROM documents CROSS JOIN (SELECT CAST(2 AS BIGINT) AS n_corrupt) c
    """,
)
def q224(spark, sf_dir):
    """JSONL source/sink (sources/jsonl — THE LLM training-data
    interchange format): documents round-trip through ``write_jsonl``
    -> ``read_jsonl`` with an EXPLICIT schema (no inference pre-scan:
    at corpus scale inference is a full extra read of every byte),
    PERMISSIVE corrupt-record handling proven by appending a file with
    two malformed lines and one good line — ``split_corrupt`` routes
    exactly those two to quarantine while every good row (including
    the appended one, filtered back out by id) survives value-intact;
    the job never dies on a bad line. multiLine=false keeps the input
    SPLITTABLE (one task per block, not per file). FULL value oracle:
    the round-tripped frame must equal the source table exactly, with
    the measured quarantine count carried on every row."""
    _prep(spark)
    import json as _json
    import shutil
    import tempfile

    from polars_dataset_spark.sources import read_jsonl_split, write_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    work = tempfile.mkdtemp(prefix="q224_jsonl_")
    try:
        write_jsonl(docs, f"{work}/docs", partitions=4)
        # adversarial member: two malformed lines + one good extra row
        with open(f"{work}/docs/part-extra.json", "w") as fh:
            fh.write('{"doc_id": broken!!\n')
            fh.write("not json at all\n")
            fh.write(
                _json.dumps({"doc_id": -1, "source": "x", "text": "extra"}) + "\n"
            )
        good, bad = read_jsonl_split(
            spark, f"{work}/docs", schema="doc_id long, source string, text string"
        )
        n_corrupt = bad.count()
        # Materialize DISTRIBUTED (executor block manager) before the
        # finally-block deletes the JSONL tempdir the scan reads from —
        # an eager localCheckpoint severs the lineage without pulling
        # the corpus through the driver (a collect() here was a
        # driver-memory hazard at larger SFs).
        out = pin(good.filter(F.col("doc_id") >= 0), eager=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out.select(
        "doc_id", "source",
        F.lit(n_corrupt).cast("long").alias("n_corrupt"),
        F.length("text").alias("text_len"),
    )


@query(
    "q225_fetch_schedule",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q218_HOST_EXPR} AS host, {_Q218_PATH_EXPR} AS path
      FROM documents
    ),
    rules(rhost, rx, rule_len, allow, delay) AS (VALUES
      ('a.example', '^/graft/',    7, false, 5.0),
      ('a.example', '^/gr',        3, true,  5.0),
      ('b.example', '^/tmp/',      5, false, 1.5),
      ('b.example', '^/search$',   8, false, 1.5),
      ('b.example', '^/tmp/ok',    7, true,  1.5),
      ('b.example', '^/.*\\.json$', 8, false, 1.5)
    ),
    m AS (
      SELECT s.doc_id, s.host, s.path,
             CASE WHEN regexp_matches(s.path, r.rx)
                  THEN r.rule_len * 2 + CAST(r.allow AS INT) END AS matchkey,
             r.delay, r.rhost IS NOT NULL AS has_robots
      FROM src s LEFT JOIN rules r ON s.host = r.rhost
    ),
    agg AS (
      SELECT doc_id, host, path,
             max(matchkey) AS bestkey, max(delay) AS delay,
             bool_or(has_robots) AS has_robots
      FROM m GROUP BY doc_id, host, path
    ),
    allowed AS (
      SELECT doc_id, host, 'http://' || host || path AS url,
             CASE WHEN has_robots THEN delay END AS crawl_delay
      FROM agg
      WHERE bestkey IS NULL OR bestkey % 2 = 1
    )
    SELECT doc_id, url,
           CAST(row_number() OVER (PARTITION BY host ORDER BY url, doc_id) - 1
                AS INTEGER) AS fetch_seq,
           CAST((row_number() OVER (PARTITION BY host ORDER BY url, doc_id) - 1)
                * coalesce(crawl_delay, 1.0) AS DOUBLE) AS fetch_offset_sec
    FROM allowed
    """,
)
def q225(spark, sf_dir):
    """Politeness fetch scheduling (robots.schedule_frontier — the
    stage AFTER frontier_filter): a crawler may not hammer one host,
    so each host's allowed links form a queue spaced by that host's
    crawl delay — ``fetch_seq`` (0-based per-host position,
    deterministic order by url,doc_id) and ``fetch_offset_sec``
    (seq x coalesce(crawl_delay, 1.0)). One window over the host key
    — the single hash shuffle a distributed fetcher needs anyway,
    because fetch workers consume per-host queues. FULL value oracle:
    the whole q218 filter chain replays in SQL and the schedule is a
    row_number window over the allowed rows — every row value-checked
    at every SF."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        frontier_filter,
        robots_rules,
        schedule_frontier,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://"), F.expr(_Q218_HOST_EXPR), F.expr(_Q218_PATH_EXPR)
        ).alias("url"),
    )
    robots_df = spark.createDataFrame(
        [
            ("a.example", bytearray(_Q218_ROBOTS_A)),
            ("b.example", bytearray(_Q218_ROBOTS_B)),
        ],
        "host string, robots_txt binary",
    )
    rules = robots_rules(robots_df, user_agent="graftbot")
    allowed = frontier_filter(docs, rules, url_col="url")
    sched = schedule_frontier(
        allowed, url_col="url", order_cols=[F.col("url"), F.col("doc_id")]
    )
    return sched.select("doc_id", "url", "fetch_seq", "fetch_offset_sec")


@query(
    "q226_template_clusters",
    """
    SELECT CAST(page_id AS BIGINT) AS page_id, CAST(n_tags AS INTEGER) AS n_tags,
           CAST(template_size AS BIGINT) AS template_size
    FROM (VALUES
      (0, 9, 2), (1, 9, 2), (2, 10, 1), (3, NULL, NULL)
    ) AS t(page_id, n_tags, template_size)
    """,
)
def q226(spark, sf_dir):
    """Template clustering (html.html_structure): hash of the page's
    start-tag SKELETON (text and attributes ignored) — two renders of
    one CMS template share it, so grouping by the signature measures
    template frequency across the corpus: the corpus-LEVEL boilerplate
    signal no per-page rule can see (a million pages with one skeleton
    are one site's template; their shared blocks are chrome even where
    a single page reads as content). Pages 0/1 render the same
    template with different text/attributes (same sig, template_size
    2); page 2 inserts one extra tag (size 1); a null body stays null.
    Plan: map-only signature pass + ONE count aggregate on the
    signature + broadcast join back — the natural template-frequency
    job at any scale. Contract oracle: literal expected table."""
    _prep(spark)
    from polars_dataset_spark.functions import html_structure

    tmpl = (
        '<html><head><title>{t}</title></head><body>'
        '<nav><a href="{u}">Home</a></nav>'
        "<p>{body}</p><footer><b>{f}</b></footer></body></html>"
    )
    rows = [
        (0, bytearray(tmpl.format(t="One", u="/a", body="alpha", f="c1").encode())),
        (1, bytearray(tmpl.format(t="Two", u="/b", body="beta words", f="c2").encode())),
        (2, bytearray(
            tmpl.format(t="Three", u="/c", body="gamma<br>delta", f="c3").encode()
        )),
        (3, None),
    ]
    pages = spark.createDataFrame(rows, "page_id long, payload binary")
    sigs = html_structure(pages).select("page_id", "structure_sig", "n_tags")
    freq = sigs.filter(F.col("structure_sig").isNotNull()).groupBy(
        "structure_sig"
    ).agg(F.count("*").alias("template_size"))
    return (
        sigs.join(F.broadcast(freq), on="structure_sig", how="left")
        .select("page_id", "n_tags", "template_size")
    )


# q227: CDX-J index lines synthesized from documents — the line CASE
# is ANSI SQL shared VERBATIM by the Spark side (F.expr) and the
# DuckDB oracle; the oracle replays the tokenization with the same
# regexes, the payload with json_extract_string, and the SURT key
# step-by-step — so parsing AND the key transform are value-checked
# at every SF
_Q227_LINE_EXPR = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'com,example)/page/' || CAST(doc_id AS VARCHAR(32))
        || ' 20260101120000 {"url": "https://example.com/Page/'
        || CAST(doc_id AS VARCHAR(32))
        || '", "mime": "text/html", "status": "200", "digest": "sha1:D'
        || CAST(doc_id AS VARCHAR(32))
        || '", "length": "' || CAST(1000 + doc_id AS VARCHAR(32))
        || '", "offset": "' || CAST(doc_id * 17 AS VARCHAR(32))
        || '", "filename": "crawl-00.warc.gz"}'
      WHEN 1 THEN 'org,site:8080)/x?a=1 20251231235959 '
        || '{"url": "http://site.org:8080/X?a=1", "mime": "application/pdf", '
        || '"status": "404", "digest": "sha1:DX", "length": "17", '
        || '"offset": "0", "filename": "crawl-01.warc.gz"}'
      WHEN 2 THEN 'not a cdxj line at all'
      ELSE 'com,host)/ 20260202020202 {"url": "https://host.com/", "status": "301"}'
    END
"""


@query(
    "q227_cdxj_surt",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q227_LINE_EXPR} AS line FROM documents
    ),
    tok AS (
      SELECT doc_id,
        nullif(regexp_extract(line, '^(\\S+) \\d{{14}} \\{{', 1), '') AS surt,
        nullif(regexp_extract(line, '^\\S+ (\\d{{14}}) \\{{', 1), '') AS ts,
        CASE WHEN regexp_matches(line, '^\\S+ \\d{{14}} \\{{')
             THEN regexp_extract(line, '^\\S+ \\d{{14}} (.*)$', 1) END AS pj
      FROM src),
    parsed AS (
      SELECT doc_id, surt, ts,
        json_extract_string(pj, '$.url') AS url,
        json_extract_string(pj, '$.mime') AS mime,
        CAST(json_extract_string(pj, '$.status') AS INTEGER) AS http_status,
        json_extract_string(pj, '$.digest') AS digest,
        CAST(json_extract_string(pj, '$.length') AS BIGINT) AS warc_length,
        CAST(json_extract_string(pj, '$.offset') AS BIGINT) AS warc_offset,
        json_extract_string(pj, '$.filename') AS warc_filename
      FROM tok),
    parts AS (
      SELECT *,
        lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(url,
          '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)) AS host,
        regexp_extract(url,
          '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)', 1) AS port,
        regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS rawpath,
        regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS query
      FROM parsed)
    SELECT doc_id, surt, ts, url, mime, http_status, digest,
           warc_length, warc_offset, warc_filename,
      CASE WHEN scheme = '' OR host = '' OR scheme IS NULL THEN NULL ELSE
        array_to_string(list_reverse(string_split(host, '.')), ',')
        || CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                 OR (scheme = 'https' AND port = '443'))
                THEN ':' || port ELSE '' END
        || ')'
        || CASE WHEN rawpath = '' THEN '/' ELSE lower(rawpath) END
        || CASE WHEN query <> '' THEN '?' || lower(query) ELSE '' END
      END AS url_surt
    FROM parts
    """,
)
def q227(spark, sf_dir):
    """CDX-J index parsing + SURT keys (functions/cdx): the FIRST job
    of any Common-Crawl-scale pipeline — you select records from the
    archive's INDEX (surt, timestamp, JSON payload with warc
    filename/offset/length) and fetch only those byte ranges; scanning
    the WARCs themselves is the canonical scale mistake. cdxj_lines is
    one codegen projection (two regex token extracts + from_json; the
    CC format stores numerics as JSON strings, mirrored in the schema
    then cast); surt_col rebuilds the sort key from the payload URL
    (lowercase, host labels reversed comma-joined so a domain is one
    contiguous key range, default ports dropped, documented simplified
    form). Malformed lines yield null fields, partial payloads null
    the missing fields only. FULL value oracle: the line CASE is
    shared verbatim; the oracle replays tokenization, JSON fields, and
    every SURT step in SQL — parsing AND the key transform
    value-checked at every SF."""
    _prep(spark)
    from polars_dataset_spark.functions import cdxj_lines, surt_col

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q227_LINE_EXPR).alias("value")
    )
    parsed = cdxj_lines(docs)
    return parsed.select(
        "doc_id", "surt", "ts", "url", "mime", "http_status", "digest",
        "warc_length", "warc_offset", "warc_filename",
        surt_col(F.col("url")).alias("url_surt"),
    )


@query(
    "q228_warc_range_fetch",
    """
    SELECT kind, filename, target_uri,
           CAST(http_status AS INTEGER) AS http_status, payload_text
    FROM (VALUES
      ('page_a',   'crawl-00.warc.gz', 'http://ex.com/a', 200, '<p>alpha page</p>'),
      ('page_c',   'crawl-00.warc.gz', 'http://ex.com/c', 200, '<p>gamma page</p>'),
      ('bogus',    'crawl-00.warc.gz', NULL, NULL, NULL),
      ('plain_b',  'crawl-01.warc',    'http://ex.com/b', 404, '<p>beta gone</p>')
    ) AS t(kind, filename, target_uri, http_status, payload_text)
    """,
)
def q228(spark, sf_dir):
    """CDX -> WARC ranged fetch (sources/warc.fetch_warc_records — the
    stage AFTER the q227 index selection): materialize exactly the
    records the index names, by byte range, per the Common Crawl
    convention (offset/length address the record's per-record gzip
    MEMBER inside the .warc.gz; plain ranges sniffed too). The index
    selection collapses to one array row per file, BROADCASTS, and a
    map-only Arrow pass slices + parses each wanted range — blob bytes
    never duplicate per record and never shuffle (at archive scale
    these are ranged GETs; grepping the WARCs is the canonical scale
    mistake). Fixtures: a 3-member .warc.gz fetching members 1 and 3
    plus one BOGUS range (null-fields row — gate, not guess), and a
    plain uncompressed WARC fetching its middle record. Contract
    oracle: literal expected table."""
    _prep(spark)
    import gzip as _gzip

    from polars_dataset_spark.sources import fetch_warc_records

    def resp(uri: str, body: bytes, status: str = "200 OK") -> bytes:
        http = (
            f"HTTP/1.1 {status}\r\nContent-Type: text/html\r\n\r\n".encode() + body
        )
        return _warc_record(
            "response", uri, http,
            "Content-Type: application/http; msgtype=response\r\n",
        )

    members = [
        _gzip.compress(resp("http://ex.com/a", b"<p>alpha page</p>"), mtime=0),
        _gzip.compress(resp("http://ex.com/junk", b"<p>skip me</p>"), mtime=0),
        _gzip.compress(resp("http://ex.com/c", b"<p>gamma page</p>"), mtime=0),
    ]
    gz_blob = b"".join(members)
    off = [0, len(members[0]), len(members[0]) + len(members[1])]
    plain_recs = [
        resp("http://ex.com/pre", b"<p>before</p>"),
        resp("http://ex.com/b", b"<p>beta gone</p>", status="404 Not Found"),
    ]
    plain_blob = b"".join(plain_recs)
    blobs = spark.createDataFrame(
        [
            ("crawl-00.warc.gz", bytearray(gz_blob)),
            ("crawl-01.warc", bytearray(plain_blob)),
        ],
        "filename string, content binary",
    )
    index = spark.createDataFrame(
        [
            ("page_a", "crawl-00.warc.gz", off[0], len(members[0])),
            ("page_c", "crawl-00.warc.gz", off[2], len(members[2])),
            ("bogus", "crawl-00.warc.gz", 7, 11),
            ("plain_b", "crawl-01.warc", len(plain_recs[0]), len(plain_recs[1])),
        ],
        "kind string, warc_filename string, warc_offset long, warc_length long",
    )
    fetched = fetch_warc_records(blobs, index)
    # re-attach index attributes by (file, range) — broadcast, index-sized
    labeled = fetched.join(
        F.broadcast(index),
        on=(
            (fetched["filename"] == index["warc_filename"])
            & (fetched["warc_offset"] == index["warc_offset"])
            & (fetched["warc_length"] == index["warc_length"])
        ),
    )
    return labeled.select(
        "kind", "filename", "target_uri", "http_status",
        F.decode(F.col("payload"), "utf-8").alias("payload_text"),
    )


def _pdf_encrypted_fixture(
    page_streams: "list[bytes]",
    mode: str = "rc4-40",
    user_pw: bytes = b"",
    owner_pw: bytes = b"own",
    flate: bool = False,
) -> bytes:
    """A classic PDF encrypted with the STANDARD security handler (ISO
    32000-1 §7.6.3 / 32000-2 §7.6.4), built entirely from the spec
    algorithms in ``functions/pdf_crypt`` — the inverse the q229 oracle
    needs. Modes: ``rc4-40`` (V=1 R=2), ``rc4-128`` (V=2 R=3),
    ``aes-128`` (V=4 R=4, /CF /StdCF /CFM /AESV2), ``aes-256`` (V=5
    R=6, /AESV3 — /U//UE from Algorithm 2.B, file key used directly per
    object) and ``aes-256-r5`` (the deprecated single-SHA-256 R=5).
    Streams are written as Encrypt(Filter(data)) — encryption is
    applied LAST by a writer (§7.6.2), so readers decrypt FIRST.
    Deterministic: fixed /ID, salts and file key; per-object AES IVs
    are MD5 of the object number."""
    import hashlib as _hashlib
    import zlib as _zlib

    from polars_dataset_spark.functions.pdf_crypt import (
        aes128_cbc_encrypt,
        compute_encryption_key,
        compute_o,
        compute_u,
        make_u_ue_r6,
        rc4,
    )

    v, r, bits = {
        "rc4-40": (1, 2, 40),
        "rc4-128": (2, 3, 128),
        "aes-128": (4, 4, 128),
        "aes-256": (5, 6, 256),
        "aes-256-r5": (5, 5, 256),
    }[mode]
    key_bytes = bits // 8
    id0 = bytes(range(16))
    p = -3904  # typical permissions-only mask: no print/copy/modify
    ue = oe = None
    if v == 5:
        key = bytes(range(32))  # fixed file key; wrapped by /U//UE
        u, ue = make_u_ue_r6(user_pw, key, r=r)
        o, oe = make_u_ue_r6(owner_pw, key, vsalt=b"\x03" * 8,
                             ksalt=b"\x04" * 8, r=r)
    else:
        o = compute_o(owner_pw, user_pw, r, key_bytes)
        key = compute_encryption_key(user_pw, o, p, id0, r, key_bytes)
        u = compute_u(key, id0, r)

    def enc_stream(num: int, data: bytes) -> bytes:
        if v == 5:
            iv = _hashlib.md5(b"iv%d" % num).digest()
            return aes128_cbc_encrypt(key, iv, data)  # AES-256 via key size
        md = _hashlib.md5(key)
        md.update(num.to_bytes(3, "little") + (0).to_bytes(2, "little"))
        if mode == "aes-128":
            md.update(b"sAlT")
        objkey = md.digest()[: min(key_bytes + 5, 16)]
        if mode == "aes-128":
            iv = _hashlib.md5(b"iv%d" % num).digest()
            return aes128_cbc_encrypt(objkey, iv, data)
        return rc4(objkey, data)

    n = len(page_streams)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs: "list[tuple[int, bytes]]" = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()),
    ]
    for i, s in enumerate(page_streams):
        page_num, content_num = 3 + 2 * i, 4 + 2 * i
        objs.append((
            page_num,
            f"<< /Type /Page /Parent 2 0 R /Contents {content_num} 0 R >>".encode(),
        ))
        filtered = _zlib.compress(s) if flate else s
        enc = enc_stream(content_num, filtered)
        filt = b" /Filter /FlateDecode" if flate else b""
        objs.append((
            content_num,
            b"<< /Length " + str(len(enc)).encode() + filt + b" >>\nstream\n"
            + enc + b"\nendstream",
        ))
    enc_num = 3 + 2 * n
    if mode == "aes-128":
        cf = (
            b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
        )
    elif v == 5:
        cf = (
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            b" /UE <" + ue.hex().encode() + b">"
            b" /OE <" + oe.hex().encode() + b">"
        )
    else:
        cf = b""
    objs.append((
        enc_num,
        b"<< /Filter /Standard /V " + str(v).encode() + b" /R " + str(r).encode()
        + b" /Length " + str(bits).encode() + b" /P " + str(p).encode()
        + b" /O <" + o.hex().encode() + b"> /U <" + u.hex().encode() + b">"
        + cf + b" >>",
    ))
    out = b"%PDF-1.6\n%\xe2\xe3\xcf\xd3\n"
    for num, body in objs:
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R"
        f" /Encrypt {enc_num} 0 R"
        f" /ID [<{id0.hex()}> <{id0.hex()}>] >>\n"
        "startxref\n0\n%%EOF\n"
    ).encode()
    return out


@query(
    "q229_pdf_encrypted_text",
    """
    SELECT CAST(doc_blob_id AS BIGINT) AS doc_blob_id,
           CAST(page_idx AS INTEGER) AS page_idx, page_text
    FROM (VALUES
      (0, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (0, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (1, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (1, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (2, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (2, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (3, NULL, NULL),
      (4, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (5, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (6, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (7, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (7, 1, 'paren (x) and \\ slash @' || chr(10) || 'HELLO' || chr(10) || 'cont'),
      (8, 0, 'Hello World' || chr(10) || 'second line' || chr(10) || 'A BC'),
      (9, NULL, NULL)
    ) AS t(doc_blob_id, page_idx, page_text)
    """,
)
def q229(spark, sf_dir):
    """Encrypted-PDF text extraction (functions/pdf_crypt — ISO 32000-1
    §7.6.3 standard security handler, VERDICT r11 #1): the majority of
    "encrypted" crawl PDFs are permissions-only — owner password set,
    USER password EMPTY — and decrypt from public-spec algorithms
    alone. Fixtures built by the in-repo spec encoder (Algorithm 3 /O,
    Algorithms 4-5 /U, Algorithm 2 file key, Algorithm 1 per-object
    keys): RC4-40 V=1 (doc 0), RC4-128 V=2 (doc 1), AES-128-CBC V=4
    /AESV2 crypt filters (doc 2) — each two pages whose decrypted text
    must equal the q211 classic-extraction baseline byte-for-byte;
    AES-128 with a REAL user password (doc 3) must stay behind the
    honest NULL gate (/U validation fails); RC4-128 and AES-128 over
    FlateDecode streams (docs 4-5) prove the decrypt-THEN-defilter
    order (§7.6.2: writers encrypt last); an unencrypted control
    (doc 6); AES-256 V=5 R=6 (ISO 32000-2 §7.6.4 — Algorithm 2.B
    iterated hash, /UE file-key unwrap, file key used directly per
    object, doc 7), the deprecated R=5 single-SHA-256 form over Flate
    (doc 8), and AES-256 with a real password gating NULL (doc 9).
    AES is FIPS-197 — decryption vectorized over numpy block arrays
    (C.1/C.3 known-answer pinned), the inherently-sequential
    encrypt/2.B chain on classic T-tables — inside the existing
    map-only Arrow pass; per-blob work, zero exchanges. FULL value
    oracle: literal expected table."""
    _prep(spark)
    from polars_dataset_spark.functions import pdf_text

    s1 = (
        b"BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 TD (second line) Tj ET\n"
        b"BT 72 600 Td [(A) -400 (B) 10 (C)] TJ ET\n"
    )
    s2 = (
        b"BT 72 720 Td (paren \\(x\\) and \\\\ slash \\100) Tj ET\n"
        b"BT 72 700 Td <48454C4C4F> Tj (cont)' ET\n"
    )
    rows = [
        (0, bytearray(_pdf_encrypted_fixture([s1, s2], mode="rc4-40"))),
        (1, bytearray(_pdf_encrypted_fixture([s1, s2], mode="rc4-128"))),
        (2, bytearray(_pdf_encrypted_fixture([s1, s2], mode="aes-128"))),
        (3, bytearray(
            _pdf_encrypted_fixture([s1], mode="aes-128", user_pw=b"secret")
        )),
        (4, bytearray(_pdf_encrypted_fixture([s1], mode="rc4-128", flate=True))),
        (5, bytearray(_pdf_encrypted_fixture([s1], mode="aes-128", flate=True))),
        (6, bytearray(_pdf_text_fixture([s1]))),
        (7, bytearray(_pdf_encrypted_fixture([s1, s2], mode="aes-256"))),
        (8, bytearray(
            _pdf_encrypted_fixture([s1], mode="aes-256-r5", flate=True)
        )),
        (9, bytearray(
            _pdf_encrypted_fixture([s1], mode="aes-256", user_pw=b"secret")
        )),
    ]
    df = spark.createDataFrame(rows, "doc_blob_id long, content binary")
    return pdf_text(df).select("doc_blob_id", "page_idx", "page_text")


# q230 fixture XML (module-level so the oracle can interpolate the
# members' exact uncompressed sizes)
_Q230_CT_XML = (
    b'<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org'
    b'/package/2006/content-types"><Default Extension="xml" ContentType='
    b'"application/xml"/></Types>'
)
_Q230_DOC_XML = (
    b'<?xml version="1.0"?>'
    b'<w:document xmlns:w="http://schemas.openxmlformats.org/'
    b'wordprocessingml/2006/main"><w:body>'
    b"<w:p><w:r><w:t>Quarterly report</w:t></w:r></w:p>"
    b"<w:p><w:r><w:t>alpha</w:t><w:tab/><w:t>beta</w:t></w:r>"
    b"<w:r><w:br/><w:t>gamma</w:t></w:r></w:p>"
    b"<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell one</w:t></w:r></w:p>"
    b"</w:tc></w:tr></w:tbl>"
    b"</w:body></w:document>"
)
_Q230_NOPREFIX_XML = (
    b'<document xmlns="http://schemas.openxmlformats.org/'
    b'wordprocessingml/2006/main"><body><p><r><t>no prefix</t></r></p>'
    b"</body></document>"
)
_Q230_TEXT_SQL = (
    "'Quarterly report' || chr(10) || 'alpha' || chr(9) || 'beta'"
    " || chr(10) || 'gamma' || chr(10) || 'cell one'"
)


@query(
    "q230_zip_docx_text",
    f"""
    SELECT CAST(blob_id AS BIGINT) AS blob_id,
           CAST(entry_idx AS INTEGER) AS entry_idx, entry_name,
           CAST(method AS INTEGER) AS method,
           CAST(uncompressed_size AS BIGINT) AS uncompressed_size,
           encrypted, doc_text
    FROM (VALUES
      (0, 0, 'a.txt',  0, 5,  false, NULL),
      (0, 1, 'docs/',  0, 0,  false, NULL),
      (0, 2, 'b.bin',  0, 10, false, NULL),
      (1, 0, '[Content_Types].xml', 8, {len(_Q230_CT_XML)}, false,
         {_Q230_TEXT_SQL}),
      (1, 1, 'word/document.xml', 8, {len(_Q230_DOC_XML)}, false,
         {_Q230_TEXT_SQL}),
      (2, 0, 'word/document.xml', 8, {len(_Q230_NOPREFIX_XML)}, false,
         'no prefix'),
      (3, 0, 'word/document.xml', 8, {len(_Q230_DOC_XML)}, true, NULL),
      (4, NULL, NULL, NULL, NULL, NULL, NULL)
    ) AS t(blob_id, entry_idx, entry_name, method, uncompressed_size,
           encrypted, doc_text)
    """,
)
def q230(spark, sf_dir):
    """ZIP container inventory + OOXML (docx) text extraction
    (functions/ooxml — VERDICT r11 #2): real crawls are full of
    ``.docx``/``.pptx``/``.xlsx``, all ZIP+XML. The central directory
    is parsed from the EOCD tail record (APPNOTE 4.3 — the archive's
    own index: inventory WITHOUT touching member bytes, the same
    index-first access pattern as CDX/WARC), members inflate bounded
    (stored/deflate only, CRC-checked, zip-bomb-guarded), and
    ``word/document.xml`` yields paragraph text (``w:p``/``w:t`` runs,
    ``w:tab`` -> tab, ``w:br`` -> newline, table cells included,
    namespace-tolerant local-name matching). Fixtures from the in-repo
    spec encoder (``build_zip``): a stored 3-member archive (inventory
    only), a deflate docx whose text must match the literal expectation
    byte-for-byte, a default-namespace docx (prefix-free XML), an
    encrypted-member docx (flag bit 0 — inventory shows it, text
    gates NULL), and junk (all-null row, the q205 gate rule). One
    map-only Arrow pass per surface, zero exchanges. FULL value
    oracle: literal expected table."""
    _prep(spark)
    from polars_dataset_spark.functions import build_zip, docx_text, zip_inventory

    blobs = [
        (0, build_zip(
            [("a.txt", b"hello"), ("docs/", b""), ("b.bin", bytes(range(10)))],
            method=0,
        )),
        (1, build_zip(
            [("[Content_Types].xml", _Q230_CT_XML),
             ("word/document.xml", _Q230_DOC_XML)],
        )),
        (2, build_zip([("word/document.xml", _Q230_NOPREFIX_XML)])),
        (3, build_zip(
            [("word/document.xml", _Q230_DOC_XML)],
            encrypted_names={"word/document.xml"},
        )),
        (4, b"not a zip at all"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "blob_id long, content binary"
    )
    with_text = docx_text(df)  # per-blob text (None at gates)
    return zip_inventory(with_text).select(
        "blob_id", "entry_idx", "entry_name", "method",
        "uncompressed_size", "encrypted", "doc_text",
    )


@query(
    "q231_warc_roundtrip",
    """
    SELECT doc_id,
           'http://site' || CAST(doc_id % 7 AS VARCHAR(8))
             || '.example/doc/' || CAST(doc_id AS VARCHAR(16)) AS url,
           CAST(200 AS INTEGER) AS http_status,
           '<p>' || text || '</p>' AS payload_text
    FROM documents
    """,
)
def q231(spark, sf_dir):
    """WARC write + CDX-J index generation round-trip (sources/warc
    ``write_warc`` + functions/cdx ``cdxj_line_col`` — VERDICT r11 #3,
    closing the archive loop WRITE-side): every document is packed
    into per-record gzip members across 3 archive files (offsets and
    lengths recorded DURING the write, sha1 payload digests in the CC
    convention), the index is emitted as CDX-J TEXT LINES via the
    existing surt_col, parsed BACK through ``cdxj_lines`` (the q227/
    q228 read path — so the round trip crosses the real serialized
    format, not an in-memory shortcut), and a q228-style ranged fetch
    (``fetch_warc_records``) must hand back byte-identical payloads
    for every record. Plan shape: ONE hash shuffle groups records into
    their output files (the file-packing partitioning itself); the
    index collapses to array rows, broadcasts, and the fetch is
    map-only per file — blob bytes never shuffle. FULL value oracle:
    the fetched corpus must equal the source documents exactly."""
    _prep(spark)
    from polars_dataset_spark.functions import cdxj_line_col, cdxj_lines
    from polars_dataset_spark.sources import fetch_warc_records, write_warc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://site"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/doc/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(F.concat(F.lit("<p>"), F.col("text"), F.lit("</p>")), "utf-8")
        .alias("payload"),
        F.concat(
            F.lit("crawl-"), (F.col("doc_id") % 3).cast("string"),
            F.lit(".warc.gz"),
        ).alias("warc_filename"),
    )
    # `files` fans out to TWO consumers (the blob side of the ranged
    # fetch AND the exploded index rows) — without a lineage cut the
    # applyInPandas archive write runs once per consumer (r12 plan
    # audit: 2x FlatMapGroupsInPandas). Non-eager localCheckpoint
    # materializes the (one-row-per-file) frame once.
    files = pin(write_warc(docs))
    blobs = files.select(
        F.col("warc_filename").alias("filename"), "content"
    )
    index_rows = files.select(
        "warc_filename", F.explode("records").alias("r")
    ).select("warc_filename", "r.*")
    # serialize -> parse: the round trip crosses the CDX-J text format
    lines = index_rows.select(
        cdxj_line_col(
            F.col("url"), F.col("ts"), F.col("mime"), F.col("http_status"),
            F.col("digest"), F.col("warc_length"), F.col("warc_offset"),
            F.col("warc_filename"),
        ).alias("value")
    )
    parsed = cdxj_lines(lines)
    fetched = fetch_warc_records(blobs, parsed)
    return fetched.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("target_uri").alias("url"),
        "http_status",
        F.decode(F.col("payload"), "utf-8").alias("payload_text"),
    )


@query(
    "q232_feed_entries",
    """
    SELECT CAST(feed_id AS BIGINT) AS feed_id, kind, feed_title,
           CAST(entry_idx AS INTEGER) AS entry_idx, title, link,
           published, entry_id
    FROM (VALUES
      (0, 'rss', 'Graft News', 0, 'First post', 'https://a.example/p1',
         'Mon, 10 Aug 2026 08:00:00 GMT', 'guid-1'),
      (0, 'rss', 'Graft News', 1, NULL, 'https://a.example/p2',
         NULL, NULL),
      (1, 'atom', 'Graft Blog', 0, 'Entry one', 'https://b.example/e1',
         '2026-08-11T09:00:00Z', 'urn:e1'),
      (1, 'atom', 'Graft Blog', 1, 'Entry two', 'https://b.example/e2',
         NULL, NULL),
      (2, 'rss', 'RDF Channel', 0, 'Old school', 'https://c.example/r1',
         '2026-08-12', NULL),
      (3, 'atom', 'Empty Feed', NULL, NULL, NULL, NULL, NULL),
      (4, NULL, NULL, NULL, NULL, NULL, NULL, NULL)
    ) AS t(feed_id, kind, feed_title, entry_idx, title, link,
           published, entry_id)
    """,
)
def q232(spark, sf_dir):
    """RSS/Atom feed parsing (functions/feeds — VERDICT r11 #5): the
    crawl-seeding channel beside sitemaps (q222); new entry links feed
    the same canonicalize -> robots -> schedule chain. Fixtures built
    from the public formats: RSS 2.0 with title/link/pubDate/guid, a
    minimal item, AND a linkless item that must be skipped (the link
    is the frontier key); a GZIPPED Atom feed (bounded inflate) whose
    first entry carries rel="alternate" + enclosure links (alternate
    must win) and second a bare link; an RDF/RSS-1.0 feed with
    top-level items and dc:date (namespace-tolerant local-name
    matching); an EMPTY Atom feed (one null-entry row); junk (one
    null-kind row — the q205 gate rule). One map-only Arrow pass, zero
    exchanges. Contract oracle: literal expected table."""
    _prep(spark)
    import zlib as _zlib

    from polars_dataset_spark.functions import feed_entries

    rss = (
        b'<?xml version="1.0"?><rss version="2.0"><channel>'
        b"<title>Graft News</title><link>https://a.example/</link>"
        b"<item><title>First post</title><link>https://a.example/p1</link>"
        b"<pubDate>Mon, 10 Aug 2026 08:00:00 GMT</pubDate>"
        b"<guid>guid-1</guid></item>"
        b"<item><link>https://a.example/p2</link></item>"
        b"<item><title>no link, skipped</title></item>"
        b"</channel></rss>"
    )
    atom = (
        b'<?xml version="1.0"?>'
        b'<feed xmlns="http://www.w3.org/2005/Atom">'
        b"<title>Graft Blog</title>"
        b"<entry><title>Entry one</title>"
        b'<link rel="enclosure" href="https://b.example/e1.mp3"/>'
        b'<link rel="alternate" href="https://b.example/e1"/>'
        b"<updated>2026-08-11T09:00:00Z</updated><id>urn:e1</id></entry>"
        b'<entry><title>Entry two</title><link href="https://b.example/e2"/>'
        b"</entry></feed>"
    )
    co = _zlib.compressobj(6, _zlib.DEFLATED, 31)
    atom_gz = co.compress(atom) + co.flush()
    rdf = (
        b'<?xml version="1.0"?>'
        b'<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        b' xmlns="http://purl.org/rss/1.0/"'
        b' xmlns:dc="http://purl.org/dc/elements/1.1/">'
        b"<channel><title>RDF Channel</title></channel>"
        b"<item><title>Old school</title><link>https://c.example/r1</link>"
        b"<dc:date>2026-08-12</dc:date></item>"
        b"</rdf:RDF>"
    )
    empty = (
        b'<feed xmlns="http://www.w3.org/2005/Atom">'
        b"<title>Empty Feed</title></feed>"
    )
    rows = [
        (0, bytearray(rss)),
        (1, bytearray(atom_gz)),
        (2, bytearray(rdf)),
        (3, bytearray(empty)),
        (4, bytearray(b"<html>not a feed</html>")),
    ]
    df = spark.createDataFrame(rows, "feed_id long, content binary")
    return feed_entries(df).select(
        "feed_id", "kind", "feed_title", "entry_idx", "title", "link",
        "published", "entry_id",
    )


# q233 planting expressions — ANSI SQL shared VERBATIM by the Spark
# side (F.expr) and the DuckDB oracle (q221's one-source-of-truth rule)
_Q233_URL_EXPR = """
    'http://' || CASE CAST(doc_id % 3 AS INT)
                   WHEN 0 THEN 'www.' WHEN 1 THEN 'a.' ELSE '' END
    || 'site' || CAST(doc_id % 10 AS VARCHAR(8))
    || '.example/p/' || CAST(doc_id AS VARCHAR(16))
"""
_Q233_TEXT_EXPR = """
    CASE CAST(doc_id % 4 AS INT)
      WHEN 0 THEN 'duplicate boilerplate page body shared across mirror hosts'
      WHEN 1 THEN text || ' contact sales.team@corp-mail.example now'
      ELSE text
    END
"""


@query(
    "q233_domain_quality",
    rf"""
    WITH src AS (
      SELECT doc_id, {_Q233_URL_EXPR} AS url, {_Q233_TEXT_EXPR} AS t0
      FROM documents),
    s1 AS (SELECT *, regexp_replace(t0,
      '{_PII_RX_SQL["email"]}', '[EMAIL]', 'g') AS t1 FROM src),
    s2 AS (SELECT *, regexp_replace(t1,
      '{_PII_RX_SQL["ipv4"]}', '[IP]', 'g') AS t2 FROM s1),
    s3 AS (SELECT *, regexp_replace(t2,
      '{_PII_RX_SQL["ssn"]}', '[SSN]', 'g') AS t3 FROM s2),
    s4 AS (SELECT *, regexp_replace(t3,
      '{_PII_RX_SQL["phone"]}', '[PHONE]', 'g') AS t4 FROM s3),
    feat AS (
      SELECT
        array_to_string(string_split(
          lower(regexp_extract(url,
            '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)),
          '.')[-2:], '.') AS domain,
        regexp_replace(trim(lower(t0)), '\s+', ' ', 'g') AS norm,
        (regexp_matches(t0, '{_PII_RX_SQL["email"]}')
         OR regexp_matches(t1, '{_PII_RX_SQL["ipv4"]}')
         OR regexp_matches(t2, '{_PII_RX_SQL["ssn"]}')
         OR regexp_matches(t3, '{_PII_RX_SQL["phone"]}')
         OR regexp_matches(t4, '{_PII_RX_SQL["cc"]}')) AS has_pii,
        CASE WHEN trim(t0) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(lower(t0)), '\s+')) END AS n_tokens,
        CASE WHEN trim(t0) = '' THEN 0.0
             ELSE length(regexp_replace(trim(t0), '\s+', '', 'g'))::DOUBLE
                  / len(regexp_split_to_array(trim(lower(t0)), '\s+')) END AS mtl,
        coalesce((length(t0) - length(regexp_replace(t0, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
              / nullif(length(t0), 0), 0.0) AS punct,
        coalesce((length(t0) - length(regexp_replace(t0, '[0-9]', '', 'g')))::DOUBLE
              / nullif(length(t0), 0), 0.0) AS digit
      FROM s4),
    q AS (
      SELECT domain, norm, has_pii,
             round(0.4 * (CASE WHEN n_tokens <= 0 THEN 0.0 ELSE least(n_tokens / 20.0, 1.0) END)
                 + 0.3 * (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
                 + 0.3 * (1.0 - least(1.0, punct * 2.0 + digit)), 6) AS quality
      FROM feat),
    agg AS (
      SELECT domain, count(*) AS n_docs,
             round(avg(quality), 6) AS avg_quality,
             round(1.0 - count(DISTINCT norm)::DOUBLE / count(*), 6) AS dup_rate,
             round(sum(has_pii::INT)::DOUBLE / count(*), 6) AS pii_rate
      FROM q GROUP BY domain)
    SELECT domain, n_docs, avg_quality, dup_rate, pii_rate,
           (n_docs < 3) OR (avg_quality >= 0.5 AND dup_rate <= 0.5
                            AND pii_rate <= 0.5) AS keep
    FROM agg
    """,
)
def q233(spark, sf_dir):
    """Host-level quality aggregation (functions/domains — VERDICT r11
    #8): the RefinedWeb-style DOMAIN PRIOR real pipelines apply before
    per-doc filtering — junk concentrates by origin, so per-registered-
    domain (n_docs, avg_quality, dup_rate, pii_rate) plus a volume-
    aware ``keep`` verdict composes the q30 quality, q32 exact-dedup
    and q221 PII signals into the wholesale keep/drop signal. Planted
    fixture: URLs spread over 10 ``siteN.example`` registered domains
    with www/a subdomain variants (the registered-domain rollup must
    merge them); every 4th doc is identical boilerplate (dup planting)
    and every doc at %4==1 carries a planted email (PII planting) —
    planting CASEs shared VERBATIM with the oracle, the PII patterns
    interpolated from the module (one source of truth). Plan: pure
    codegen'd signal projections + ONE two-phase hash aggregate on the
    domain (count_distinct is the only extra exchange — inherent to an
    exact distinct; approx_count_distinct is the documented 100 TB
    swap). Output is dimension-table sized: one row per domain,
    broadcastable back onto the corpus for the drop. FULL value
    oracle."""
    _prep(spark)
    from polars_dataset_spark.functions import domain_quality_profile

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q233_URL_EXPR).alias("url"),
        F.expr(_Q233_TEXT_EXPR).alias("text"),
    )
    return domain_quality_profile(docs).select(
        "domain", "n_docs", "avg_quality", "dup_rate", "pii_rate", "keep"
    )


# q234 fixture XML (module-level so the oracle is one literal table)
_Q234_SS_XML = (
    b'<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
    b'main"><si><t>alpha</t></si><si><r><t>be</t></r><r><t>ta</t></r>'
    b"</si></sst>"
)
_Q234_SHEET_XML = (
    b'<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml'
    b'/2006/main"><sheetData>'
    b'<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>42</v></c></row>'
    b'<row r="2"><c r="A2" t="s"><v>1</v></c>'
    b'<c r="B2" t="inlineStr"><is><t>inline</t></is></c></row>'
    b"</sheetData></worksheet>"
)
_Q234_SLIDE1_XML = (
    b'<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/'
    b'2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/'
    b'2006/main"><p:txBody>'
    b"<a:p><a:r><a:t>Title </a:t></a:r><a:r><a:t>slide</a:t></a:r></a:p>"
    b"<a:p><a:r><a:t>bullet one</a:t></a:r></a:p></p:txBody></p:sld>"
)
_Q234_SLIDE2_XML = (
    b'<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/'
    b'2006/main" xmlns:a="http://schemas.openxmlformats.org/drawingml/'
    b'2006/main"><p:txBody><a:p><a:r><a:t>second</a:t></a:r></a:p>'
    b"</p:txBody></p:sld>"
)


@query(
    "q234_office_text",
    """
    SELECT CAST(blob_id AS BIGINT) AS blob_id, doc_kind, doc_text
    FROM (VALUES
      (0, 'docx', 'Quarterly report' || chr(10) || 'alpha' || chr(9)
          || 'beta' || chr(10) || 'gamma' || chr(10) || 'cell one'),
      (1, 'xlsx', 'alpha' || chr(9) || '42' || chr(10) || 'beta'
          || chr(9) || 'inline'),
      (2, 'pptx', 'Title slide' || chr(10) || 'bullet one' || chr(10)
          || chr(10) || 'second'),
      (3, 'zip',  NULL),
      (4, NULL,   NULL)
    ) AS t(blob_id, doc_kind, doc_text)
    """,
)
def q234(spark, sf_dir):
    """Unified OOXML text routing (functions/ooxml.office_text —
    completing q230's docx with the xlsx/pptx siblings): the router
    reads only the ZIP central directory to classify each blob (docx /
    xlsx / pptx by marker part; plain 'zip'; NULL for non-ZIP), then
    inflates only the text-bearing parts. SpreadsheetML: shared
    strings (rich-text runs concatenated) + per-row tab-joined cells
    (shared, inline, numeric); PresentationML: a:p paragraphs of a:t
    runs per slide in name order, slides blank-line separated. One
    map-only Arrow pass, zero exchanges. Contract oracle: literal
    expected table (fixtures from the in-repo build_zip encoder)."""
    _prep(spark)
    from polars_dataset_spark.functions import build_zip, office_text

    blobs = [
        (0, build_zip(
            [("[Content_Types].xml", _Q230_CT_XML),
             ("word/document.xml", _Q230_DOC_XML)],
        )),
        (1, build_zip(
            [("xl/workbook.xml", b"<workbook/>"),
             ("xl/sharedStrings.xml", _Q234_SS_XML),
             ("xl/worksheets/sheet1.xml", _Q234_SHEET_XML)],
        )),
        (2, build_zip(
            [("ppt/presentation.xml", b"<presentation/>"),
             ("ppt/slides/slide1.xml", _Q234_SLIDE1_XML),
             ("ppt/slides/slide2.xml", _Q234_SLIDE2_XML)],
        )),
        (3, build_zip([("plain.txt", b"not office")])),
        (4, b"not a zip"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "blob_id long, content binary"
    )
    return office_text(df).select("blob_id", "doc_kind", "doc_text")


# q235 EPUB fixture parts (module-level so the oracle is one literal)
_Q235_CONTAINER_XML = (
    b'<?xml version="1.0"?>'
    b'<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container"'
    b' version="1.0"><rootfiles>'
    b'<rootfile full-path="OEBPS/content.opf"'
    b' media-type="application/oebps-package+xml"/></rootfiles></container>'
)
_Q235_OPF_XML = (
    b'<?xml version="1.0"?>'
    b'<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
    b"<manifest>"
    b'<item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>'
    b'<item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>'
    b'<item id="css" href="style.css" media-type="text/css"/>'
    b"</manifest>"
    b'<spine><itemref idref="c1"/><itemref idref="c2"/></spine></package>'
)
_Q235_CH1_XHTML = (
    b"<html><head><title>t</title></head><body><h1>Chapter One</h1>"
    b"<p>It was a dark night.</p></body></html>"
)
_Q235_CH2_XHTML = b"<html><body><p>The second chapter text.</p></body></html>"


@query(
    "q235_epub_text",
    """
    SELECT CAST(blob_id AS BIGINT) AS blob_id, doc_kind, doc_text
    FROM (VALUES
      (0, 'epub', 'Chapter One' || chr(10) || 'It was a dark night.'
          || chr(10) || chr(10) || 'The second chapter text.'),
      (1, 'zip', NULL),
      (2, NULL, NULL)
    ) AS t(blob_id, doc_kind, doc_text)
    """,
)
def q235(spark, sf_dir):
    """EPUB text extraction (functions/ooxml.extract_epub_text — the
    ebook tail of a crawl, EPUB OCF + OPF public specs): the OCF
    ``META-INF/container.xml`` names the OPF package, the OPF manifest
    maps ids to hrefs and the SPINE fixes reading order (the fixture
    declares chapters out of order in the manifest — spine order must
    win), and each XHTML chapter runs through the repo's existing HTML
    extractor (decode ladder + block extraction, boilerplate pruning
    off — book chapters are all content). Routed by the same
    central-directory-only classifier as q234 (docx/xlsx/pptx/epub).
    Composition story: ZIP reader (q230) x HTML extractor (q210) —
    zero new parsing machinery at the text layer. One map-only Arrow
    pass, zero exchanges. Contract oracle: literal expected table."""
    _prep(spark)
    from polars_dataset_spark.functions import build_zip, office_text

    epub = build_zip([
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", _Q235_CONTAINER_XML),
        ("OEBPS/content.opf", _Q235_OPF_XML),
        ("OEBPS/ch1.xhtml", _Q235_CH1_XHTML),
        ("OEBPS/ch2.xhtml", _Q235_CH2_XHTML),
    ])
    blobs = [
        (0, epub),
        (1, build_zip([("plain.txt", b"not a book")])),
        (2, b"junk bytes"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in blobs], "blob_id long, content binary"
    )
    return office_text(df).select("blob_id", "doc_kind", "doc_text")


# q236 planting expressions — shared VERBATIM with the oracle
_Q236_URL_EXPR = """
    'http://m' || CAST(doc_id % 4 AS VARCHAR(8)) || '.example/page/'
    || CAST(doc_id AS VARCHAR(16))
"""
_Q236_TEXT_EXPR = """
    CASE WHEN CAST(doc_id % 5 AS INT) = 0
         THEN 'shared mirror body stored once'
         ELSE text END
"""


@query(
    "q236_warc_revisit_dedup",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q236_URL_EXPR} AS url,
             '<p>' || ({_Q236_TEXT_EXPR}) || '</p>' AS payload_text
      FROM documents),
    g AS (
      SELECT *, min(url) OVER (PARTITION BY payload_text) AS canon
      FROM src)
    SELECT url,
           CASE WHEN url = canon THEN 'response' ELSE 'revisit' END AS kind,
           CASE WHEN url = canon THEN NULL ELSE canon END AS refers_to,
           CASE WHEN url = canon THEN payload_text ELSE '' END AS payload_text
    FROM g
    """,
)
def q236(spark, sf_dir):
    """Dedup-aware WARC writing via ``revisit`` records (sources/warc
    ``mark_revisits`` + ``write_warc(revisit_col=...)`` — the Common
    Crawl payload-dedup convention): within each identical-payload
    group the lexicographically-first URI stores the bytes ONCE; every
    other copy becomes a tiny ``revisit`` record (WARC-Profile
    identical-payload-digest, WARC-Refers-To-Target-URI, payload
    digest, NO body) — at archive scale this is where the storage win
    lives (every 5th fixture doc shares one planted body; mirrors and
    redirect aliases in the wild). The check round-trips through the
    SERIALIZED archive: blobs are re-parsed with ``warc_records``, so
    kind/refers_to/empty-body all come back from real record bytes,
    not the writer's bookkeeping. Plan: one sha1-digest window (the
    dedup grouping itself), the q231 file-packing shuffle, then a
    map-only parse. FULL value oracle: identical-payload groups
    replayed with a window over the payload text."""
    _prep(spark)
    from polars_dataset_spark.sources import mark_revisits, warc_records, write_warc

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q236_URL_EXPR).alias("url"),
        F.encode(
            F.concat(F.lit("<p>"), F.expr(_Q236_TEXT_EXPR), F.lit("</p>")),
            "utf-8",
        ).alias("payload"),
        # one archive file per 32 id-buckets: file COUNT scales with the
        # data (a fixed small count would serialize the writer's gzip
        # work into that many tasks at big SFs — the real-scale shape is
        # many ~1 GB files, never 3 giant ones)
        F.concat(
            F.lit("dedup-"), (F.col("doc_id") % 32).cast("string"),
            F.lit(".warc.gz"),
        ).alias("warc_filename"),
    )
    marked = mark_revisits(docs)
    files = write_warc(marked, revisit_col="revisit_of")
    parsed = warc_records(
        files.select("warc_filename", "content")
    )
    return parsed.select(
        F.col("target_uri").alias("url"),
        F.col("warc_type").alias("kind"),
        "refers_to",
        F.decode(F.col("payload"), "utf-8").alias("payload_text"),
    )


# q237 planting — DOMAIN-DEPENDENT junk so the prior has something to
# ban: domain = site(doc_id%10), so sites 0/1 are pure boilerplate
# mirrors (dup_rate ~1) and site 2 is a PII leaker (pii_rate 1);
# shared VERBATIM with the oracle (q233's one-source-of-truth rule)
_Q237_TEXT_EXPR = """
    CASE WHEN CAST(doc_id % 10 AS INT) IN (0, 1)
         THEN 'duplicate boilerplate body every mirror serves'
         WHEN CAST(doc_id % 10 AS INT) = 2
         THEN text || ' mail bob.leak@corp-mail.example now'
         ELSE text END
"""


@query(
    "q237_domain_prior_drop",
    rf"""
    WITH src AS (
      SELECT doc_id, {_Q233_URL_EXPR} AS url, {_Q237_TEXT_EXPR} AS t0
      FROM documents),
    s1 AS (SELECT *, regexp_replace(t0,
      '{_PII_RX_SQL["email"]}', '[EMAIL]', 'g') AS t1 FROM src),
    s2 AS (SELECT *, regexp_replace(t1,
      '{_PII_RX_SQL["ipv4"]}', '[IP]', 'g') AS t2 FROM s1),
    s3 AS (SELECT *, regexp_replace(t2,
      '{_PII_RX_SQL["ssn"]}', '[SSN]', 'g') AS t3 FROM s2),
    s4 AS (SELECT *, regexp_replace(t3,
      '{_PII_RX_SQL["phone"]}', '[PHONE]', 'g') AS t4 FROM s3),
    feat AS (
      SELECT doc_id, url,
        array_to_string(string_split(
          lower(regexp_extract(url,
            '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)),
          '.')[-2:], '.') AS domain,
        regexp_replace(trim(lower(t0)), '\s+', ' ', 'g') AS norm,
        (regexp_matches(t0, '{_PII_RX_SQL["email"]}')
         OR regexp_matches(t1, '{_PII_RX_SQL["ipv4"]}')
         OR regexp_matches(t2, '{_PII_RX_SQL["ssn"]}')
         OR regexp_matches(t3, '{_PII_RX_SQL["phone"]}')
         OR regexp_matches(t4, '{_PII_RX_SQL["cc"]}')) AS has_pii,
        CASE WHEN trim(t0) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(lower(t0)), '\s+')) END AS n_tokens,
        CASE WHEN trim(t0) = '' THEN 0.0
             ELSE length(regexp_replace(trim(t0), '\s+', '', 'g'))::DOUBLE
                  / len(regexp_split_to_array(trim(lower(t0)), '\s+')) END AS mtl,
        coalesce((length(t0) - length(regexp_replace(t0, '[^a-zA-Z0-9\s]', '', 'g')))::DOUBLE
              / nullif(length(t0), 0), 0.0) AS punct,
        coalesce((length(t0) - length(regexp_replace(t0, '[0-9]', '', 'g')))::DOUBLE
              / nullif(length(t0), 0), 0.0) AS digit
      FROM s4),
    q AS (
      SELECT doc_id, url, domain, norm, has_pii,
             round(0.4 * (CASE WHEN n_tokens <= 0 THEN 0.0 ELSE least(n_tokens / 20.0, 1.0) END)
                 + 0.3 * (CASE WHEN mtl >= 3.0 AND mtl <= 10.0 THEN 1.0 ELSE 0.5 END)
                 + 0.3 * (1.0 - least(1.0, punct * 2.0 + digit)), 6) AS quality
      FROM feat),
    agg AS (
      SELECT domain, count(*) AS n_docs,
             round(avg(quality), 6) AS avg_quality,
             round(1.0 - count(DISTINCT norm)::DOUBLE / count(*), 6) AS dup_rate,
             round(sum(has_pii::INT)::DOUBLE / count(*), 6) AS pii_rate
      FROM q GROUP BY domain),
    verdict AS (
      SELECT domain,
             (n_docs < 3) OR (avg_quality >= 0.5 AND dup_rate <= 0.5
                              AND pii_rate <= 0.5) AS keep
      FROM agg)
    SELECT q.doc_id, q.url, q.domain
    FROM q JOIN verdict USING (domain)
    WHERE verdict.keep
    """,
)
def q237(spark, sf_dir):
    """Domain-prior DROP stage (functions/domains.apply_domain_prior —
    the composition q233's profile exists for): the per-registered-
    domain verdict frame is dimension-sized, so it BROADCASTS back
    onto the corpus and the drop is a map-side hash-join + filter —
    documents never shuffle. Planting is DOMAIN-dependent (domain =
    site(doc_id%10)): sites 0/1 are boilerplate mirrors (dup_rate ~1 —
    banned), site 2 leaks a planted email in every doc (pii_rate 1 —
    banned), sites 3-9 carry natural text and survive — so the oracle
    verifies both the aggregate verdicts AND exactly which documents
    the broadcast drop removes. FULL value oracle: the whole
    profile+drop chain replayed (planting CASEs shared verbatim, PII
    patterns interpolated from the module)."""
    _prep(spark)
    from polars_dataset_spark.functions import domain_quality_profile
    from polars_dataset_spark.functions.domains import apply_domain_prior

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q233_URL_EXPR).alias("url"),
        F.expr(_Q237_TEXT_EXPR).alias("text"),
    )
    profile = domain_quality_profile(docs)
    kept = apply_domain_prior(docs, profile)
    return kept.select(
        "doc_id", "url",
        F.expr(
            "array_join(slice(split(lower(regexp_extract(url,"
            " '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)', 1)),"
            " '\\\\.'), -2, 2), '.')"
        ).alias("domain"),
    )


# q238 planting — a redirect topology whose chains and loops are pure
# doc_id arithmetic (shared VERBATIM with the oracle): chain root
# base = doc_id - doc_id%4 fixes the host, so the path-form Locations
# (absolute-path for %4==2, relative for %4==3) resolve onto the same
# host; docs with doc_id%100 in (98,99) form a planted 2-cycle; %4==0
# docs are the 200 terminals. Host is STAGED into its own column first
# (the q199/q233 inlining rule — the CASE references it five times).
_Q238_HOST_EXPR = """
    'site' || CAST((doc_id - doc_id % 4) % 10 AS VARCHAR(8)) || '.example'
"""
_Q238_URL_EXPR = """
    'http://' || host || '/p' || CAST(doc_id AS VARCHAR(16))
"""
_Q238_STATUS_EXPR = """
    CASE WHEN CAST(doc_id % 100 AS INT) IN (98, 99) THEN 301
         WHEN CAST(doc_id % 4 AS INT) = 1 THEN 301
         WHEN CAST(doc_id % 4 AS INT) = 2 THEN 302
         WHEN CAST(doc_id % 4 AS INT) = 3 THEN 307
         ELSE 200 END
"""
_Q238_LOC_EXPR = """
    CASE WHEN CAST(doc_id % 100 AS INT) = 98
         THEN 'http://' || host || '/p' || CAST(doc_id + 1 AS VARCHAR(16))
         WHEN CAST(doc_id % 100 AS INT) = 99
         THEN 'http://' || host || '/p' || CAST(doc_id - 1 AS VARCHAR(16))
         WHEN CAST(doc_id % 4 AS INT) = 1
         THEN 'http://' || host || '/p' || CAST(doc_id - 1 AS VARCHAR(16))
         WHEN CAST(doc_id % 4 AS INT) = 2
         THEN '/p' || CAST(doc_id - 1 AS VARCHAR(16))
         WHEN CAST(doc_id % 4 AS INT) = 3
         THEN 'p' || CAST(doc_id - 1 AS VARCHAR(16))
         ELSE NULL END
"""


@query(
    "q238_redirect_resolution",
    f"""
    WITH RECURSIVE h AS (
      SELECT doc_id, {_Q238_HOST_EXPR} AS host FROM documents),
    e AS (
      SELECT {_Q238_URL_EXPR} AS src,
             'http://' || host || '/p' || CAST(
               CASE WHEN CAST(doc_id % 100 AS INT) = 98 THEN doc_id + 1
                    ELSE doc_id - 1 END AS VARCHAR(16)) AS dst
      FROM h WHERE CAST(doc_id % 4 AS INT) <> 0),
    m AS (SELECT src, max(dst) AS dst FROM e GROUP BY src),
    walk AS (
      SELECT src, dst AS cur, 1 AS hops FROM m
      UNION ALL
      SELECT w.src, m.dst AS cur, w.hops + 1
      FROM walk w JOIN m ON m.src = w.cur
      WHERE w.hops < 8),
    term AS (
      SELECT w.src, w.cur, w.hops FROM walk w
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.src = w.cur))
    SELECT m.src, t.cur AS final_url, CAST(t.hops AS BIGINT) AS hops,
           (t.cur IS NOT NULL) AS resolved
    FROM m LEFT JOIN term t ON t.src = m.src
    """,
)
def q238(spark, sf_dir):
    """Redirect-chain resolution (functions/redirects + the warc.py
    ``http_location`` surface): the crawl graph's alias edges. The
    whole loop runs on REAL archive bytes — the planted topology is
    written with ``write_warc(status_col=, location_col=)`` (3xx
    records carrying HTTP ``Location``), re-parsed with
    ``warc_records``, the edges extracted by resolving each raw
    Location form (absolute / absolute-path / relative, RFC 9110
    §10.2.2 + RFC 3986 §5.3 merge) against the record's own URI in
    pure codegen, then every source pointer-JUMPED to its terminal:
    log2(max_hops)=3 self-join rounds, each ONE hash shuffle on the
    url key — never one-job-per-hop, never a driver-side walk. Planted
    2-cycles come out ``resolved=false`` with null final/hops (gate,
    not guess). FULL value oracle: planting arithmetic replayed, the
    chain walk as a bounded recursive CTE, terminals by anti-semijoin
    on the source domain."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        extract_redirect_edges,
        resolve_redirects,
    )
    from polars_dataset_spark.sources import warc_records, write_warc

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_Q238_HOST_EXPR).alias("host"))
        .select(
            "doc_id",
            F.expr(_Q238_URL_EXPR).alias("url"),
            F.expr(_Q238_STATUS_EXPR).cast("int").alias("status"),
            F.expr(_Q238_LOC_EXPR).alias("location"),
            F.when(
                F.expr("CAST(doc_id % 4 AS INT) = 0"),
                F.encode(
                    F.concat(
                        F.lit("<p>page "),
                        F.col("doc_id").cast("string"),
                        F.lit("</p>"),
                    ),
                    "utf-8",
                ),
            )
            .otherwise(F.encode(F.lit(""), "utf-8"))
            .alias("payload"),
            # file count scales with the data (the q236 rule)
            F.concat(
                F.lit("redir-"), (F.col("doc_id") % 32).cast("string"),
                F.lit(".warc.gz"),
            ).alias("warc_filename"),
        )
    )
    files = write_warc(docs, status_col="status", location_col="location")
    parsed = warc_records(files.select("warc_filename", "content"))
    edges = extract_redirect_edges(parsed)
    return resolve_redirects(edges, max_hops=8)


# q239 planting — 50 urls, fetch history = doc_id arithmetic (day
# number doc_id//50, STAGED as its own column per the inlining rule);
# url class (url_id % 3): 0 never changes, 1 changes every fetch,
# 2 changes every 3rd fetch. Shared VERBATIM with the oracle.
_Q239_URL_EXPR = """
    'http://r' || CAST(doc_id % 50 AS VARCHAR(8)) || '.example/p'
"""
_Q239_DAY_EXPR = """
    CAST((doc_id - doc_id % 50) / 50 AS BIGINT)
"""
_Q239_DIGEST_EXPR = """
    CASE CAST((doc_id % 50) % 3 AS INT)
      WHEN 0 THEN 'static'
      WHEN 1 THEN 'v' || CAST(day AS VARCHAR(16))
      ELSE 'v' || CAST(CAST((day - day % 3) / 3 AS BIGINT) AS VARCHAR(16))
    END
"""


@query(
    "q239_recrawl_schedule",
    f"""
    WITH d AS (
      SELECT doc_id, {_Q239_DAY_EXPR} AS day FROM documents),
    f AS (
      SELECT {_Q239_URL_EXPR} AS url, day, {_Q239_DIGEST_EXPR} AS digest
      FROM d),
    l AS (
      SELECT url, day, digest,
             lag(digest) OVER (PARTITION BY url ORDER BY day) AS prev
      FROM f),
    a AS (
      SELECT url, count(*) AS n_fetches,
             sum(CASE WHEN prev IS NOT NULL AND digest <> prev
                      THEN 1 ELSE 0 END) AS n_changes,
             (max(day) - min(day))::DOUBLE AS span
      FROM l GROUP BY url),
    r AS (
      SELECT url, n_fetches, n_changes,
             CASE WHEN n_fetches > 1
                  THEN span / (n_fetches - 1) END AS ivl,
             CASE WHEN n_fetches > 1
                  THEN ln((n_fetches - 1 + 0.5)
                          / (n_fetches - 1 - n_changes + 0.5)) END AS rhat
      FROM a),
    x AS (
      SELECT url, n_fetches, n_changes,
             round(ivl, 6) AS avg_interval_days,
             round(rhat, 6) AS change_per_interval,
             round(CASE WHEN rhat IS NULL OR rhat <= 0 OR ivl IS NULL
                        THEN 365.0
                        ELSE least(greatest(ivl / rhat, 1.0), 365.0)
                   END, 6) AS next_fetch_days
      FROM r)
    SELECT url, CAST(n_fetches AS BIGINT) AS n_fetches,
           CAST(n_changes AS BIGINT) AS n_changes,
           avg_interval_days, change_per_interval, next_fetch_days,
           CASE WHEN next_fetch_days <= 2.0 THEN 'daily'
                WHEN next_fetch_days <= 10.0 THEN 'weekly'
                WHEN next_fetch_days <= 45.0 THEN 'monthly'
                ELSE 'quarterly' END AS bucket
    FROM x
    """,
)
def q239(spark, sf_dir):
    """Recrawl scheduling (functions/recrawl.estimate_change_rate —
    Cho & Garcia-Molina 2003): per-URL Poisson change-rate estimate
    from the fetch history the archive already holds (url, ts, payload
    digest), with the bias-corrected r_hat = ln((n+.5)/(n-X+.5)),
    next-fetch spacing ivl/r_hat clamped to [1,365] days, and the
    scheduler tier. ONE shuffle total: the lag window and the
    aggregate share the url key, so Catalyst reuses the partitioning;
    output is frontier-sized (one row per url), broadcastable into
    schedule_frontier. FULL value oracle: planting + lag + estimator
    replayed (same positive-log form — never -0.0)."""
    _prep(spark)
    from polars_dataset_spark.functions import estimate_change_rate

    # 2026-01-01T00:00:00Z epoch; fetch day number scales with SF
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_Q239_DAY_EXPR).alias("day"))
        .select(
            F.expr(_Q239_URL_EXPR).alias("url"),
            F.timestamp_seconds(
                F.lit(1767225600) + F.col("day") * 86400
            ).alias("fetch_ts"),
            F.expr(_Q239_DIGEST_EXPR).alias("digest"),
        )
    )
    return estimate_change_rate(docs)


# q240 planting — a held-out labeled fixture for the language-ID
# confusion audit: pure-language sentences built from the module's own
# STOPWORDS lists (one source of truth — the fixture can never drift
# from the classifier's vocabulary), one planted es→fr bleed class
# (majority-french tokens under an 'es' label) and one en→und junk
# class. Shared VERBATIM with the oracle.
_Q240_SENT = {
    "en": " ".join(STOPWORDS["en"]),
    "de": " ".join(STOPWORDS["de"]),
    "fr": " ".join(STOPWORDS["fr"]),
    "es": " ".join(STOPWORDS["es"]),
    "mix": " ".join(STOPWORDS["fr"][:6] + STOPWORDS["es"][:3]),
}
_Q240_TRUE_EXPR = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'fr'
      WHEN 3 THEN 'es' WHEN 4 THEN 'es' ELSE 'en' END
"""
_Q240_TEXT_EXPR = f"""
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN '{_Q240_SENT["en"]}'
      WHEN 1 THEN '{_Q240_SENT["de"]}'
      WHEN 2 THEN '{_Q240_SENT["fr"]}'
      WHEN 3 THEN '{_Q240_SENT["es"]}'
      WHEN 4 THEN '{_Q240_SENT["mix"]}'
      ELSE 'zzz qqq xxx'
    END
"""


def _q240_oracle() -> str:
    toks = r"regexp_split_to_array(trim(lower(ltext)), '\s+')"
    hit_cols = ",\n             ".join(
        f"len(list_filter({toks}, x -> list_contains({words!r}, x))) AS h_{lang}"
        for lang, words in STOPWORDS.items()
    )
    langs = list(STOPWORDS)
    pred_case = (
        "CASE WHEN best = 0 THEN 'und' "
        + " ".join(f"WHEN h_{l} = best THEN '{l}'" for l in langs)
        + " ELSE 'und' END"
    )
    return f"""
    WITH src AS (
      SELECT doc_id, {_Q240_TRUE_EXPR} AS label_true,
             {_Q240_TEXT_EXPR} AS ltext
      FROM documents),
    h AS (
      SELECT label_true,
             {hit_cols}
      FROM src),
    g AS (SELECT *, greatest({", ".join("h_" + l for l in langs)}) AS best
          FROM h),
    p AS (SELECT label_true, {pred_case} AS label_pred FROM g),
    cm AS (SELECT label_true, label_pred, count(*) AS n
           FROM p GROUP BY 1, 2),
    t AS (SELECT label_true AS label, sum(n) AS n_true FROM cm GROUP BY 1),
    pr AS (SELECT label_pred AS label, sum(n) AS n_pred FROM cm GROUP BY 1),
    tp AS (SELECT label_true AS label, sum(n) AS tp FROM cm
           WHERE label_true = label_pred GROUP BY 1),
    j AS (SELECT coalesce(t.label, pr.label) AS label,
                 coalesce(t.n_true, 0) AS n_true,
                 coalesce(pr.n_pred, 0) AS n_pred
          FROM t FULL JOIN pr ON t.label = pr.label),
    k AS (SELECT j.label, j.n_true, j.n_pred, coalesce(tp.tp, 0) AS tp
          FROM j LEFT JOIN tp ON tp.label = j.label),
    m AS (SELECT label, n_true, n_pred, tp,
                 CASE WHEN n_pred > 0 THEN tp::DOUBLE / n_pred END AS p1,
                 CASE WHEN n_true > 0 THEN tp::DOUBLE / n_true END AS r1
          FROM k)
    SELECT label, CAST(n_true AS BIGINT) AS n_true,
           CAST(n_pred AS BIGINT) AS n_pred, CAST(tp AS BIGINT) AS tp,
           round(p1, 6) AS precision, round(r1, 6) AS recall,
           round(CASE WHEN p1 IS NOT NULL AND r1 IS NOT NULL
                       AND p1 + r1 > 0
                      THEN 2.0 * p1 * r1 / (p1 + r1) END, 6) AS f1
    FROM m
    """


@query("q240_langid_confusion_audit", _q240_oracle())
def q240(spark, sf_dir):
    """Language-ID confusion audit (functions/text.classification_audit
    ∘ with_language_id): run the classifier over a held-out LABELED
    fixture and get the per-class confusion verdict — support,
    prediction count, true positives, precision/recall/F1 — with nulls
    where a metric is undefined (never a fake 0/0 score). The fixture
    sentences are built from the classifier's own STOPWORDS constant
    (one source of truth), with a planted es→fr bleed class and an
    en→und junk class, so the audit provably shows off-diagonal mass.
    ONE full-data pass (the (true,pred) two-phase count); every later
    join runs on the K×K confusion matrix. FULL value oracle: the
    stopword-hit classifier AND the metric derivations replayed."""
    _prep(spark)
    from polars_dataset_spark.functions import classification_audit

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q240_TRUE_EXPR).alias("label_true"),
        F.expr(_Q240_TEXT_EXPR).alias("text"),
    )
    pred = with_language_id(docs, out_col="label_pred")
    return classification_audit(pred)


# q241 planting — head-metadata permutations from doc_id arithmetic
# (canonical on %3==0, OpenGraph pair on %2==0, published_time on
# %4==1, JSON-LD on %5==0, meta description always); shared VERBATIM
# with the oracle, which replays the extraction with anchored regexes
# over the same well-formed synthetic head.
_Q241_HTML_EXPR = """
    '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR(16)) || '</title>'
    || CASE WHEN CAST(doc_id % 3 AS INT) = 0
            THEN '<link rel="canonical" href="http://c.example/d'
                 || CAST(doc_id % 7 AS VARCHAR(8)) || '">'
            ELSE '' END
    || CASE WHEN CAST(doc_id % 2 AS INT) = 0
            THEN '<meta property="og:title" content="OG '
                 || CAST(doc_id % 5 AS VARCHAR(8)) || '">'
                 || '<meta property="og:description" content="od '
                 || CAST(doc_id % 3 AS VARCHAR(8)) || '">'
                 || '<meta property="og:type" content="article">'
            ELSE '' END
    || '<meta name="description" content="desc '
    || CAST(doc_id % 4 AS VARCHAR(8)) || '">'
    || CASE WHEN CAST(doc_id % 4 AS INT) = 1
            THEN '<meta property="article:published_time" content="2026-0'
                 || CAST(1 + doc_id % 9 AS VARCHAR(8)) || '-01T00:00:00Z">'
            ELSE '' END
    || CASE WHEN CAST(doc_id % 5 AS INT) = 0
            THEN '<script type="application/ld+json">{"@type":"Article","headline":"H '
                 || CAST(doc_id % 6 AS VARCHAR(8)) || '","datePublished":"2026-01-0'
                 || CAST(1 + doc_id % 9 AS VARCHAR(8)) || '"}</script>'
            ELSE '' END
    || '</head><body><p>body text here</p></body></html>'
"""


@query(
    "q241_page_metadata",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q241_HTML_EXPR} AS html FROM documents)
    SELECT doc_id,
      nullif(regexp_extract(html,
        'property="og:title" content="([^"]*)"', 1), '') AS og_title,
      nullif(regexp_extract(html,
        'property="og:description" content="([^"]*)"', 1), '') AS og_description,
      nullif(regexp_extract(html,
        'property="og:type" content="([^"]*)"', 1), '') AS og_type,
      nullif(regexp_extract(html,
        'name="description" content="([^"]*)"', 1), '') AS meta_description,
      nullif(regexp_extract(html,
        'rel="canonical" href="([^"]*)"', 1), '') AS canonical,
      nullif(regexp_extract(html,
        'property="article:published_time" content="([^"]*)"', 1), '')
        AS published_time,
      nullif(regexp_extract(html, '"@type":"([^"]*)"', 1), '') AS jsonld_type,
      nullif(regexp_extract(html, '"headline":"([^"]*)"', 1), '')
        AS jsonld_headline,
      nullif(regexp_extract(html, '"datePublished":"([^"]*)"', 1), '')
        AS jsonld_date
    FROM src
    """,
)
def q241(spark, sf_dir):
    """Page-metadata extraction (functions/html.html_page_meta): the
    head fields a curation pipeline filters/dedups on BEFORE reading
    body text — OpenGraph title/description/type, plain meta
    description, canonical link (URL-dedup hint), article publish
    time, and the first JSON-LD block's @type/headline/datePublished
    (stdlib json, tolerant). Same scale shape as html_to_text: ONE
    map-only Arrow pass over the binary bodies, charset ladder per
    row, zero exchanges at any SF. FULL value oracle: the planted
    head permutations re-extracted with anchored regexes in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import html_page_meta

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.expr(_Q241_HTML_EXPR), "utf-8").alias("payload")
    )
    out = html_page_meta(docs)
    return out.select(
        "doc_id", "og_title", "og_description", "og_type",
        "meta_description", "canonical", "published_time",
        "jsonld_type", "jsonld_headline", "jsonld_date",
    )


# q242 planting — the classic normalization hazards, one per class
# (ligatures, circled digits, fullwidth + ideographic space, an NFD
# combining sequence, zero-width sandwich, vulgar fractions, whitespace
# runs, and one already-clean ASCII class). Shared VERBATIM with the
# oracle; the oracle's EXPECTED strings are hand-derived from the
# public NFKC tables (not computed by the library under test).
_Q242_TEXT_EXPR = (
    """
    CASE CAST(doc_id % 8 AS INT)
      WHEN 0 THEN 'ﬁle ﬂow ' || CAST(doc_id % 9 AS VARCHAR(8))
      WHEN 1 THEN '①②③ items'
      WHEN 2 THEN 'ｈｅｌｌｏ　ｗｏｒｌｄ'
      WHEN 3 THEN 'café menu'
      WHEN 4 THEN 'a​b‌c‍d­e'
      WHEN 5 THEN '½ + ¼'
      WHEN 6 THEN '  spaced   out' || chr(9) || 'text'
      ELSE 'plain ascii text'
    END
"""
)
_Q242_EXPECTED_EXPR = (
    """
    CASE CAST(doc_id % 8 AS INT)
      WHEN 0 THEN 'file flow ' || CAST(doc_id % 9 AS VARCHAR(8))
      WHEN 1 THEN '123 items'
      WHEN 2 THEN 'hello world'
      WHEN 3 THEN 'café menu'
      WHEN 4 THEN 'abcde'
      WHEN 5 THEN '1⁄2 + 1⁄4'
      WHEN 6 THEN 'spaced out text'
      ELSE 'plain ascii text'
    END
"""
)


@query(
    "q242_unicode_normalize",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q242_TEXT_EXPR} AS t FROM documents),
    e AS (
      SELECT doc_id, t, {_Q242_EXPECTED_EXPR} AS text_norm FROM src)
    SELECT doc_id, text_norm, (text_norm <> t) AS changed FROM e
    """,
)
def q242(spark, sf_dir):
    """Unicode normalization (functions/text.normalize_unicode): NFKC
    + zero-width strip + whitespace collapse — the step BEFORE any
    fingerprint/hash/token count (two visually identical pages with a
    ligature or a ZWSP otherwise dedup to two clusters). The
    normalization tables live in unicodedata, so this is the family's
    one honest Arrow-batched pandas-UDF operator: still map-only, zero
    exchanges, linear in bytes. FULL value oracle: planted hazard
    classes vs HAND-DERIVED expected strings from the public NFKC
    tables (ﬁ→fi, ①→1, fullwidth→ASCII, NFD→NFC, ½→1⁄2) — the
    library's own normalizer never computes the oracle side."""
    _prep(spark)
    from polars_dataset_spark.functions import normalize_unicode

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q242_TEXT_EXPR).alias("text")
    )
    out = normalize_unicode(docs)
    return out.select(
        "doc_id",
        "text_norm",
        (F.col("text_norm") != F.col("text")).alias("changed"),
    )


# q243 planting — one pure-script class per SCRIPT_RANGES entry plus a
# mixed latin/cyrillic/digit class; class 0 varies with doc_id so the
# fractions aren't constant per class. Shared VERBATIM with the oracle.
_Q243_TEXT_EXPR = """
    CASE CAST(doc_id % 8 AS INT)
      WHEN 0 THEN 'the quick brown fox ' || CAST(doc_id % 9 AS VARCHAR(8))
      WHEN 1 THEN 'привет мир добрый день'
      WHEN 2 THEN 'γειά σου κόσμε'
      WHEN 3 THEN 'مرحبا بالعالم اليوم'
      WHEN 4 THEN 'שלום עולם טוב'
      WHEN 5 THEN 'नमस्ते दुनिया आज'
      WHEN 6 THEN '你好世界 こんにちは 안녕하세요'
      ELSE 'latin текст mix 123'
    END
"""


def _q243_oracle() -> str:
    from polars_dataset_spark.functions.text import SCRIPT_RANGES

    cnt_cols = ",\n             ".join(
        f"length(t) - length(regexp_replace(t, '{pat}', '', 'g')) AS n_{n}"
        for n, pat in SCRIPT_RANGES.items()
    )
    names = list(SCRIPT_RANGES)
    dom_case = (
        "CASE WHEN best = 0 THEN 'und' "
        + " ".join(f"WHEN n_{n} = best THEN '{n}'" for n in names)
        + " ELSE 'und' END"
    )
    frac_cols = ",\n           ".join(
        f"round(n_{n}::DOUBLE / greatest(n_chars_nws, 1), 6) AS frac_{n}"
        for n in names
    )
    n_cols = ", ".join(f"CAST(n_{n} AS BIGINT) AS n_{n}" for n in names)
    return f"""
    WITH src AS (
      SELECT doc_id, {_Q243_TEXT_EXPR} AS t FROM documents),
    c AS (
      SELECT doc_id,
             length(regexp_replace(t, '\\s', '', 'g')) AS n_chars_nws,
             {cnt_cols}
      FROM src),
    g AS (SELECT *, greatest({", ".join("n_" + n for n in names)}) AS best
          FROM c)
    SELECT doc_id, CAST(n_chars_nws AS BIGINT) AS n_chars_nws, {n_cols},
           {dom_case} AS dominant_script,
           {frac_cols}
    FROM g
    """


@query("q243_script_profile", _q243_oracle())
def q243(spark, sf_dir):
    """Writing-script profile (functions/text.with_script_profile):
    the routing stage BEFORE language ID — CJK/Arabic/Cyrillic answer
    from codepoints alone, and stopword langid is only meaningful once
    the script is known. Pure codegen: per script class ONE
    regexp_replace length diff over BMP block ranges written in the
    \\x{{hhhh}} syntax both engines accept, counts staged as columns,
    dominant = argmax with first-in-dict tie-break, fractions of
    non-whitespace chars. Map-only, zero exchanges at any SF. FULL
    value oracle: the IDENTICAL pattern strings replayed in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import with_script_profile
    from polars_dataset_spark.functions.text import SCRIPT_RANGES

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q243_TEXT_EXPR).alias("text")
    )
    out = with_script_profile(docs)
    names = list(SCRIPT_RANGES)
    return out.select(
        "doc_id", "n_chars_nws",
        *[f"n_{n}" for n in names],
        "dominant_script",
        *[f"frac_{n}" for n in names],
    )


_Q244_URL_EXPR = """
    'http://w' || CAST(doc_id % 6 AS VARCHAR(8)) || '.example/t/'
    || CAST(doc_id AS VARCHAR(16))
"""


@query(
    "q244_wet_roundtrip",
    f"""
    SELECT {_Q244_URL_EXPR} AS url, 'conversion' AS kind,
           'text/plain' AS ctype, text
    FROM documents
    """,
)
def q244(spark, sf_dir):
    """WET writing (sources/warc.write_wet): the Common Crawl
    companion format — extracted TEXT packed as ``conversion`` records
    (no HTTP wrapper, text/plain, per-record gzip members with
    (offset, length) + digest recorded during the write), so the text
    corpus ships in the same rangeable, CDX-able framing as the raw
    crawl; a WET sidecar costs one write job off the extracted corpus,
    never a re-crawl. The check round-trips through the SERIALIZED
    archive (write → re-parse with ``warc_records`` → byte-identical
    text back out). Plan: the one file-packing shuffle + a map-only
    parse. FULL value oracle: url/kind/content-type/text replayed
    straight off the planted inputs — any framing or encoding defect
    breaks the hash."""
    _prep(spark)
    from polars_dataset_spark.sources import warc_records, write_wet

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q244_URL_EXPR).alias("url"),
        F.col("text"),
        F.concat(
            F.lit("wet-"), (F.col("doc_id") % 32).cast("string"),
            F.lit(".warc.gz"),
        ).alias("wet_filename"),
    )
    files = write_wet(docs)
    parsed = warc_records(files.select("wet_filename", "content"))
    return parsed.select(
        F.col("target_uri").alias("url"),
        F.col("warc_type").alias("kind"),
        F.col("content_type").alias("ctype"),
        F.decode(F.col("payload"), "utf-8").alias("text"),
    )


# q245 planting — robots-meta permutations incl. the content-first
# attribute order, the 'none' shorthand, a substring trap
# ('noindexing' must NOT trip), a header-only class, and clean pages.
_Q245_HTML_EXPR = """
    CASE CAST(doc_id % 7 AS INT)
      WHEN 0 THEN '<meta name="robots" content="noindex, nofollow"><p>a</p>'
      WHEN 1 THEN '<meta name="robots" content="index, follow"><p>b</p>'
      WHEN 2 THEN '<meta content="nofollow" name="robots"><p>c</p>'
      WHEN 3 THEN '<meta name="robots" content="none"><p>d</p>'
      WHEN 4 THEN '<meta name="robots" content="noindexing,archive"><p>e</p>'
      WHEN 5 THEN '<p>header only</p>'
      ELSE '<meta name="viewport" content="noindex"><p>f</p>'
    END
"""
_Q245_XRT_EXPR = """
    CASE WHEN CAST(doc_id % 7 AS INT) = 5 THEN 'noindex' ELSE NULL END
"""


def _q245_oracle() -> str:
    from polars_dataset_spark.functions.html import (
        ROBOTS_META_CONTENT_FIRST_RE,
        ROBOTS_META_NAME_FIRST_RE,
        ROBOTS_NOFOLLOW_RE,
        ROBOTS_NOINDEX_RE,
    )

    p1 = ROBOTS_META_NAME_FIRST_RE.replace("'", "''")
    p2 = ROBOTS_META_CONTENT_FIRST_RE.replace("'", "''")
    ni = ROBOTS_NOINDEX_RE.replace("'", "''")
    nf = ROBOTS_NOFOLLOW_RE.replace("'", "''")
    return f"""
    WITH src AS (
      SELECT doc_id, {_Q245_HTML_EXPR} AS html, {_Q245_XRT_EXPR} AS xrt
      FROM documents),
    m AS (
      SELECT doc_id, xrt,
             coalesce(nullif(regexp_extract(html, '{p1}', 1), ''),
                      nullif(regexp_extract(html, '{p2}', 1), '')) AS meta
      FROM src)
    SELECT doc_id,
           (coalesce(regexp_matches(meta, '{ni}'), FALSE)
            OR coalesce(regexp_matches(xrt, '{ni}'), FALSE)) AS noindex,
           (coalesce(regexp_matches(meta, '{nf}'), FALSE)
            OR coalesce(regexp_matches(xrt, '{nf}'), FALSE)) AS nofollow
    FROM m
    """


@query("q245_robots_directives", _q245_oracle())
def q245(spark, sf_dir):
    """In-page robots directives (functions/html.
    with_robots_directives): ``<meta name=robots>`` (both attribute
    orders, first tag wins, ``none`` implies both) OR-merged with the
    ``X-Robots-Tag`` header — the page-level half of politeness that
    robots.txt cannot express; a corpus keeping noindex pages
    republishes withdrawn content, and nofollow outlinks must not
    feed the frontier. Pure codegen (two staged regexp_extracts + two
    token-boundary rlikes — 'noindexing' does not trip), map-only,
    zero exchanges. FULL value oracle: the IDENTICAL pattern strings
    replayed in SQL over the planted permutations."""
    _prep(spark)
    from polars_dataset_spark.functions import with_robots_directives

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q245_HTML_EXPR).alias("html"),
        F.expr(_Q245_XRT_EXPR).alias("xrt"),
    )
    out = with_robots_directives(docs, header_col="xrt")
    return out.select("doc_id", "noindex", "nofollow")


@query(
    "q246_bloom_frontier",
    """
    SELECT CAST(count(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS BIGINT)
             AS n_members,
           CAST(count(CASE WHEN doc_id % 2 = 1 THEN 1 END) AS BIGINT)
             AS n_strangers,
           TRUE AS members_all_pass,
           TRUE AS fp_within_bound
    FROM documents
    """,
)
def q246(spark, sf_dir):
    """Partitioned Bloom-filter frontier membership (functions/bloom):
    "have we seen this URL?" without the per-round anti-join shuffle —
    one bitmap per key-space bucket built in a single hash-partitioned
    pass (numpy bit ops per bucket), probed via ONE bucket-id join +
    map-only bit tests; positions come from the SAME JVM-side
    xxhash64 expressions on both paths so build/probe cannot drift.
    At 10 B keys the bitmaps are ~14 GB of ordinary rows — never a
    driver object, never a broadcast. CONTRACT oracle (sketch-family
    precedent): exact member/stranger counts replayed in SQL plus two
    stated guarantees — zero false negatives (structural) and measured
    FP ≤ 3× the 1% target on disjoint keys; the suite pins geometry
    and determinism in tests/test_bloom.py."""
    _prep(spark)
    from polars_dataset_spark.functions import bloom_build, bloom_probe

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 2 == 0).alias("is_member"),
        F.concat(
            F.lit("http://b.example/"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("m")).otherwise(F.lit("s")),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    members = docs.filter("is_member").select("url")
    idx = bloom_build(members, fp_rate=0.01)
    probed = bloom_probe(idx, docs)
    return probed.agg(
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_members"),
        F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_strangers"),
        (
            F.sum(
                F.when(F.col("is_member") & ~F.col("might_contain"), 1).otherwise(0)
            )
            == 0
        ).alias("members_all_pass"),
        (
            F.sum(
                F.when(~F.col("is_member") & F.col("might_contain"), 1).otherwise(0)
            ).cast("double")
            <= 0.03 * F.sum(F.when(~F.col("is_member"), 1).otherwise(0))
        ).alias("fp_within_bound"),
    )


# q247 planting — two snapshots from doc_id arithmetic: every 5th url
# vanishes (removed), every 3rd surviving url changes digest, every
# 5th doc contributes a brand-new url (added); everything else is
# byte-identical. Shared VERBATIM with the oracle.
_Q247_URL_EXPR = """
    'http://d' || CAST(doc_id % 8 AS VARCHAR(8)) || '.example/p'
    || CAST(doc_id AS VARCHAR(16))
"""
_Q247_OLDD_EXPR = """
    'd' || CAST(doc_id % 7 AS VARCHAR(8))
"""
_Q247_NEWD_EXPR = """
    CASE WHEN CAST(doc_id % 3 AS INT) = 0
         THEN 'x' || CAST(doc_id % 7 AS VARCHAR(8))
         ELSE 'd' || CAST(doc_id % 7 AS VARCHAR(8)) END
"""
_Q247_ADDURL_EXPR = """
    'http://d' || CAST(doc_id % 8 AS VARCHAR(8)) || '.example/add'
    || CAST(doc_id AS VARCHAR(16))
"""


@query(
    "q247_crawl_diff",
    f"""
    WITH old AS (
      SELECT {_Q247_URL_EXPR} AS url, {_Q247_OLDD_EXPR} AS d
      FROM documents),
    nw AS (
      SELECT {_Q247_URL_EXPR} AS url, {_Q247_NEWD_EXPR} AS d
      FROM documents WHERE CAST(doc_id % 5 AS INT) <> 0
      UNION ALL
      SELECT {_Q247_ADDURL_EXPR} AS url, 'n0' AS d
      FROM documents WHERE CAST(doc_id % 5 AS INT) = 0)
    SELECT coalesce(old.url, nw.url) AS url,
           old.d AS old_digest, nw.d AS new_digest,
           CASE WHEN old.d IS NULL THEN 'added'
                WHEN nw.d IS NULL THEN 'removed'
                WHEN old.d <> nw.d THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM old FULL JOIN nw ON old.url = nw.url
    """,
)
def q247(spark, sf_dir):
    """Crawl snapshot diff (functions/snapshots.crawl_diff): which
    URLs are added / removed / changed / unchanged between two crawls
    — the verdict that drives every incremental cycle (only added +
    changed re-enter extraction/dedup, removed tombstone the index,
    change ratios feed the recrawl scheduler as fresh evidence).
    Digests come from what the archive already carries (WARC payload
    sha1s, CDX digest fields) — no bytes re-read. ONE full-outer hash
    shuffle on the url key + a codegen status projection; no window,
    no second pass. FULL value oracle: planting + FULL JOIN + status
    CASE replayed."""
    _prep(spark)
    from polars_dataset_spark.functions import crawl_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.select(
        F.expr(_Q247_URL_EXPR).alias("url"),
        F.expr(_Q247_OLDD_EXPR).alias("digest"),
    )
    new = (
        docs.filter("CAST(doc_id % 5 AS INT) <> 0")
        .select(
            F.expr(_Q247_URL_EXPR).alias("url"),
            F.expr(_Q247_NEWD_EXPR).alias("digest"),
        )
        .unionAll(
            docs.filter("CAST(doc_id % 5 AS INT) = 0").select(
                F.expr(_Q247_ADDURL_EXPR).alias("url"),
                F.lit("n0").alias("digest"),
            )
        )
    )
    return crawl_diff(old, new)


# q248 planting — a 60-node link graph from doc_id arithmetic: 50
# source nodes with two deterministic outlink rules plus a class
# whose targets (n50..n59) have NO outlinks — real dangling sinks, so
# the oracle proves the mass-redistribution term, not just the happy
# path. Shared VERBATIM with the oracle.
_Q248_SRC_EXPR = """
    'n' || CAST(doc_id % 50 AS VARCHAR(8))
"""
_Q248_DST_EXPR = """
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN 'n' || CAST(((doc_id % 50) + 1) % 50 AS VARCHAR(8))
      WHEN 1 THEN 'n' || CAST(((doc_id % 50) * 2 + 3) % 50 AS VARCHAR(8))
      ELSE 'n' || CAST(50 + ((doc_id % 50) % 10) AS VARCHAR(8))
    END
"""


def _q248_oracle(iterations: int = 3, damping: float = 0.85) -> str:
    head = f"""
    WITH e AS (
      SELECT DISTINCT {_Q248_SRC_EXPR} AS src, {_Q248_DST_EXPR} AS dst
      FROM documents),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    od AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
    nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / nn.n AS r FROM nodes, nn)"""
    steps = []
    for i in range(1, iterations + 1):
        p = f"r{i - 1}"
        steps.append(f"""
    c{i} AS (SELECT e.dst AS node, sum({p}.r / od.deg) AS m
           FROM e JOIN {p} ON {p}.node = e.src
           JOIN od ON od.src = e.src GROUP BY 1),
    d{i} AS (SELECT coalesce(sum(r), 0.0) AS dm FROM {p}
           WHERE NOT EXISTS (SELECT 1 FROM od WHERE od.src = {p}.node)),
    r{i} AS (SELECT nodes.node,
                (1 - {damping}) / nn.n
                + {damping} * (coalesce(c{i}.m, 0.0) + d{i}.dm / nn.n) AS r
           FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node, nn, d{i})""")
    return (
        head + "," + ",".join(steps)
        + f"\n    SELECT node, round(r, 6) AS rank FROM r{iterations}"
    )


@query("q248_pagerank", _q248_oracle())
def q248(spark, sf_dir):
    """PageRank (functions/graph.pagerank): the crawl-prioritization
    score — power iteration with the dangling-mass term naive
    implementations drop (sink pages hand their mass back uniformly;
    without it totals leak below 1 — pinned by the mass-conservation
    test). Per iteration: ONE ranks⋈edges join on the source + ONE
    hash aggregate on the destination (shuffle ∝ |edges|), plus a
    1-row dangling aggregate broadcast back (the bounded q124-class
    crossJoin, allowlisted). FULL value oracle: the recurrence
    UNROLLED as three chained CTE iterations over the planted graph —
    teleport, damping, dangling redistribution all value-checked at
    round-6."""
    _prep(spark)
    from polars_dataset_spark.functions import pagerank

    edges = load_table(spark, sf_dir, "documents").select(
        F.expr(_Q248_SRC_EXPR).alias("src"),
        F.expr(_Q248_DST_EXPR).alias("dst"),
    )
    out = pagerank(edges, iterations=3, damping=0.85)
    return out.select("node", F.round("rank", 6).alias("rank"))


# q249 planting — Cache-Control permutations incl. the s-maxage
# precedence pair, a varying max-age, a null header, and the
# token-boundary traps. Shared VERBATIM with the oracle.
_Q249_CC_EXPR = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN 'public, max-age=' || CAST(60 + doc_id % 3600 AS VARCHAR(8))
      WHEN 1 THEN 'no-cache, no-store'
      WHEN 2 THEN 's-maxage=600, max-age=60'
      WHEN 3 THEN 'private'
      WHEN 4 THEN NULL
      ELSE 'no-cachex, stale-while-revalidate=30'
    END
"""


def _q249_oracle() -> str:
    from polars_dataset_spark.functions.recrawl import (
        CC_MAX_AGE_RE,
        CC_NO_CACHE_RE,
        CC_NO_STORE_RE,
        CC_S_MAXAGE_RE,
    )

    ma = CC_MAX_AGE_RE.replace("'", "''")
    sma = CC_S_MAXAGE_RE.replace("'", "''")
    ns = CC_NO_STORE_RE.replace("'", "''")
    nc = CC_NO_CACHE_RE.replace("'", "''")
    return f"""
    WITH src AS (
      SELECT doc_id, {_Q249_CC_EXPR} AS cc FROM documents)
    SELECT doc_id,
           CAST(coalesce(nullif(regexp_extract(cc, '{sma}', 1), ''),
                         nullif(regexp_extract(cc, '{ma}', 1), ''))
                AS BIGINT) AS cc_max_age_sec,
           coalesce(regexp_matches(cc, '{ns}'), FALSE) AS cc_no_store,
           coalesce(regexp_matches(cc, '{nc}'), FALSE) AS cc_no_cache
    FROM src
    """


@query("q249_cache_hints", _q249_oracle())
def q249(spark, sf_dir):
    """HTTP freshness hints (functions/recrawl.with_cache_hints): the
    origin's own Cache-Control claims as scheduler EVIDENCE —
    max-age with RFC 9111 s-maxage precedence (a crawler is a shared
    cache), no-store / no-cache token-boundary matched ('no-cachex'
    and 'stale-while-revalidate' never trip). Third evidence source
    beside observed change history (q239) and sitemap changefreq;
    headers lie in both directions, so this emits columns to weigh,
    not a schedule. Pure codegen, map-only, zero exchanges. FULL
    value oracle: identical pattern strings replayed in SQL."""
    _prep(spark)
    from polars_dataset_spark.functions import with_cache_hints

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q249_CC_EXPR).alias("cache_control")
    )
    out = with_cache_hints(docs)
    return out.select("doc_id", "cc_max_age_sec", "cc_no_store", "cc_no_cache")


# q250 planting — one host class per IDN behavior: plain ASCII, a
# real German IDN, the pаypal homograph (one Cyrillic а), a
# cross-label mix (normal IDN usage — must NOT flag), invalid
# punycode (claims IDN, decode must null), and a pure-Greek TLD
# label. Expected strings are HAND-DERIVED from the RFC 3492
# examples, not computed by the library under test (the q242 rule).
_Q250_HOST_EXPR = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN 'www' || CAST(doc_id % 20 AS VARCHAR(8)) || '.example.com'
      WHEN 1 THEN 'xn--bcher-kva.de'
      WHEN 2 THEN 'xn--pypal-4ve.com'
      WHEN 3 THEN 'mixed.xn--p1ai'
      WHEN 4 THEN 'xn--bad-@@@.com'
      ELSE 'xn--qxam.gr'
    END
"""


@query(
    "q250_idn_homograph",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q250_HOST_EXPR} AS host FROM documents)
    SELECT doc_id,
      CASE CAST(doc_id % 6 AS INT)
        WHEN 0 THEN 'www' || CAST(doc_id % 20 AS VARCHAR(8)) || '.example.com'
        WHEN 1 THEN 'bücher.de'
        WHEN 2 THEN 'pаypal.com'
        WHEN 3 THEN 'mixed.рф'
        WHEN 4 THEN NULL
        ELSE 'ελ.gr'
      END AS host_unicode,
      (CAST(doc_id % 6 AS INT) <> 0) AS is_idn,
      CASE CAST(doc_id % 6 AS INT)
        WHEN 2 THEN TRUE
        WHEN 4 THEN NULL
        ELSE FALSE
      END AS mixed_script_label
    FROM src
    """,
)
def q250(spark, sf_dir):
    """IDN decoding + homograph flagging (functions/idn): ``xn--``
    labels decode to their unicode form (RFC 3492 punycode via the
    stdlib codec — the honest pandas-UDF class), so domain priors,
    per-host budgets and dedup key ONE origin instead of two; invalid
    punycode NULLs the decode and keeps the is_idn claim (gate, not
    guess). The homograph flag is pure codegen over the DECODED host:
    a single label mixing two confusable scripts (latin/cyrillic/
    greek) flags — ``pаypal`` yes, ``bücher`` and the cross-label
    ``mixed.рф`` no. Map-only, zero exchanges. FULL value oracle with
    HAND-DERIVED expected strings (the library never computes the
    oracle side)."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        decode_idn_hosts,
        flag_homograph_hosts,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_Q250_HOST_EXPR).alias("host")
    )
    out = flag_homograph_hosts(decode_idn_hosts(docs))
    return out.select("doc_id", "host_unicode", "is_idn", "mixed_script_label")


# q251 planting — 40 urls × fetch history; validator class is
# constant per url ((doc_id%40)%3: ETag-bearing / Last-Modified-only /
# neither), values vary with the fetch day so only the LATEST row's
# validators are correct. Shared VERBATIM with the oracle.
_Q251_URL_EXPR = """
    'http://h' || CAST(doc_id % 40 AS VARCHAR(8)) || '.example/p'
"""
_Q251_DAY_EXPR = """
    CAST((doc_id - doc_id % 40) / 40 AS BIGINT)
"""
_Q251_ETAG_EXPR = """
    CASE WHEN CAST((doc_id % 40) % 3 AS INT) = 0
         THEN '"e-' || CAST(day AS VARCHAR(16)) || '"' END
"""
_Q251_LM_EXPR = """
    CASE WHEN CAST((doc_id % 40) % 3 AS INT) = 1
         THEN 'day-' || CAST(day AS VARCHAR(16)) END
"""


@query(
    "q251_revalidation_headers",
    f"""
    WITH d AS (
      SELECT doc_id, {_Q251_DAY_EXPR} AS day FROM documents),
    f AS (
      SELECT {_Q251_URL_EXPR} AS url, day,
             {_Q251_ETAG_EXPR} AS etag, {_Q251_LM_EXPR} AS lm
      FROM d),
    m AS (SELECT url, max(day) AS dmax FROM f GROUP BY 1)
    SELECT f.url, f.etag AS if_none_match, f.lm AS if_modified_since,
           (f.etag IS NOT NULL OR f.lm IS NOT NULL) AS revalidatable
    FROM f JOIN m ON f.url = m.url AND f.day = m.dmax
    """,
)
def q251(spark, sf_dir):
    """Conditional-GET bookkeeping (functions/recrawl.
    revalidation_headers — RFC 9110 §13.1): the validators the next
    fetch should send per url, taken from the LATEST response only
    (mixing an old ETag with a new Last-Modified revalidates the
    wrong entity — pinned by test). A 304 costs headers instead of a
    body; across a billion-URL refetch wave that is most of the
    bandwidth budget. ONE window shuffle on the url key,
    frontier-sized output. FULL value oracle: planting + max-day
    selection replayed."""
    _prep(spark)
    from polars_dataset_spark.functions import revalidation_headers

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_Q251_DAY_EXPR).alias("day"))
        .select(
            F.expr(_Q251_URL_EXPR).alias("url"),
            F.timestamp_seconds(
                F.lit(1767225600) + F.col("day") * 86400
            ).alias("fetch_ts"),
            F.expr(_Q251_ETAG_EXPR).alias("etag"),
            F.expr(_Q251_LM_EXPR).alias("last_modified"),
        )
    )
    return revalidation_headers(docs)


@query(
    "q252_wat_roundtrip",
    f"""
    WITH src AS (
      SELECT doc_id, {_Q241_HTML_EXPR} AS html FROM documents)
    SELECT 'http://w' || CAST(doc_id % 6 AS VARCHAR(8)) || '.example/m/'
             || CAST(doc_id AS VARCHAR(16)) AS url,
           'metadata' AS kind,
           nullif(regexp_extract(html,
             'property="og:title" content="([^"]*)"', 1), '') AS og_title,
           nullif(regexp_extract(html,
             'rel="canonical" href="([^"]*)"', 1), '') AS canonical,
           nullif(regexp_extract(html, '"@type":"([^"]*)"', 1), '')
             AS jsonld_type
    FROM src
    """,
)
def q252(spark, sf_dir):
    """WAT writing (sources/warc.write_wat): the third Common Crawl
    sidecar — page METADATA as ``metadata`` records with JSON
    payloads, so link-graph and head-field consumers never touch the
    raw crawl. The chain runs END-TO-END: q241's planted HTML →
    html_page_meta extraction → struct → to_json (JVM-side) →
    write_wat (same rangeable gzip-member framing, one file-packing
    shuffle) → re-parse with warc_records → get_json_object pulls the
    fields back off the serialized archive. FULL value oracle: the
    head fields re-derived from the planting with q241's anchored
    regexes — any extraction, serialization or framing defect breaks
    the hash."""
    _prep(spark)
    from polars_dataset_spark.functions import html_page_meta
    from polars_dataset_spark.sources import warc_records, write_wat

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://w"), (F.col("doc_id") % 6).cast("string"),
            F.lit(".example/m/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(F.expr(_Q241_HTML_EXPR), "utf-8").alias("payload"),
        F.concat(
            F.lit("wat-"), (F.col("doc_id") % 32).cast("string"),
            F.lit(".warc.gz"),
        ).alias("wat_filename"),
    )
    meta = html_page_meta(docs).withColumn(
        "meta", F.struct("og_title", "canonical", "jsonld_type")
    )
    files = write_wat(meta.select("wat_filename", "url", "meta"))
    parsed = warc_records(files.select("wat_filename", "content"))
    body = F.decode(F.col("payload"), "utf-8")
    return parsed.select(
        F.col("target_uri").alias("url"),
        F.col("warc_type").alias("kind"),
        F.get_json_object(body, "$.og_title").alias("og_title"),
        F.get_json_object(body, "$.canonical").alias("canonical"),
        F.get_json_object(body, "$.jsonld_type").alias("jsonld_type"),
    )


# q253 planting — declared-vs-predicted language permutations: two
# agreeing classes, an en-declared/french-bodied template
# misconfiguration, a region-subtag declaration (ES-419 → es), a
# missing attribute (filtered), and a declared-but-junk body (→ und).
_Q253_HTML_EXPR = """
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN '<html lang="de"><body>x</body></html>'
      WHEN 1 THEN '<html lang="en"><body>x</body></html>'
      WHEN 2 THEN '<html lang="en"><body>x</body></html>'
      WHEN 3 THEN '<html lang="ES-419"><body>x</body></html>'
      WHEN 4 THEN '<html><body>x</body></html>'
      ELSE '<html lang=fr><body>x</body></html>'
    END
"""
_Q253_TEXT_EXPR = f"""
    CASE CAST(doc_id % 6 AS INT)
      WHEN 0 THEN '{_Q240_SENT["de"]}'
      WHEN 1 THEN '{_Q240_SENT["en"]}'
      WHEN 2 THEN '{_Q240_SENT["fr"]}'
      WHEN 3 THEN '{_Q240_SENT["es"]}'
      WHEN 4 THEN '{_Q240_SENT["en"]}'
      ELSE 'zzz qqq xxx'
    END
"""


def _q253_oracle() -> str:
    from polars_dataset_spark.functions.html import HTML_LANG_RE

    lang_re = HTML_LANG_RE.replace("'", "''")
    toks = r"regexp_split_to_array(trim(lower(ltext)), '\s+')"
    hit_cols = ",\n             ".join(
        f"len(list_filter({toks}, x -> list_contains({words!r}, x))) AS h_{lang}"
        for lang, words in STOPWORDS.items()
    )
    langs = list(STOPWORDS)
    pred_case = (
        "CASE WHEN best = 0 THEN 'und' "
        + " ".join(f"WHEN h_{l} = best THEN '{l}'" for l in langs)
        + " ELSE 'und' END"
    )
    return f"""
    WITH src AS (
      SELECT doc_id, {_Q253_HTML_EXPR} AS html, {_Q253_TEXT_EXPR} AS ltext
      FROM documents),
    d AS (
      SELECT doc_id,
             lower(nullif(regexp_extract(html, '{lang_re}', 1), ''))
               AS declared_lang,
             ltext
      FROM src),
    h AS (
      SELECT declared_lang,
             {hit_cols}
      FROM d WHERE declared_lang IS NOT NULL),
    g AS (SELECT *, greatest({", ".join("h_" + l for l in langs)}) AS best
          FROM h),
    p AS (SELECT declared_lang, {pred_case} AS lang_pred FROM g)
    SELECT declared_lang, lang_pred, count(*) AS n
    FROM p GROUP BY 1, 2
    """


@query("q253_declared_lang_agreement", _q253_oracle())
def q253(spark, sf_dir):
    """Declared-vs-detected language cross-check (functions/html.
    with_declared_lang ∘ functions/text.with_language_id): the
    ``<html lang>`` claim against content-based ID — systematic
    disagreement on a host is a template-misconfiguration signal;
    agreement upgrades confidence where the stopword classifier is
    weak. Declared lang is one codegen regexp (BCP 47 primary subtag,
    ES-419 → es); pages without the attribute are excluded (no claim,
    nothing to audit). ONE full-data pass (the (declared, predicted)
    two-phase count). FULL value oracle: attribute regex + classifier
    + rollup replayed."""
    _prep(spark)
    from polars_dataset_spark.functions import with_declared_lang

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(_Q253_HTML_EXPR).alias("html"),
        F.expr(_Q253_TEXT_EXPR).alias("text"),
    )
    out = with_language_id(with_declared_lang(docs))
    return (
        out.filter(F.col("declared_lang").isNotNull())
        .groupBy("declared_lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


# q254 planting — a redirect topology whose chains CROSS mechanisms:
# %4==1 is an HTTP 301, %4==2 a meta-refresh, %4==3 a relative
# meta-refresh, %4==0 the 200 terminal; base = doc_id - doc_id%4
# fixes the host (the q238 staging rule). Both edge layers must land
# in ONE alias map for the chains to resolve.
_Q254_STATUS_EXPR = """
    CASE WHEN CAST(doc_id % 4 AS INT) = 1 THEN 301 ELSE 200 END
"""
_Q254_LOC_EXPR = """
    CASE WHEN CAST(doc_id % 4 AS INT) = 1
         THEN '/p' || CAST(doc_id - 1 AS VARCHAR(16)) END
"""
_Q254_HTML_EXPR = """
    CASE WHEN CAST(doc_id % 4 AS INT) = 2
         THEN '<meta http-equiv="refresh" content="0;url=/p'
              || CAST(doc_id - 1 AS VARCHAR(16)) || '"><p>x</p>'
         WHEN CAST(doc_id % 4 AS INT) = 3
         THEN '<meta http-equiv="refresh" content="5; url=p'
              || CAST(doc_id - 1 AS VARCHAR(16)) || '"><p>y</p>'
         ELSE '<p>plain page</p>'
    END
"""


@query(
    "q254_soft_redirect_resolution",
    f"""
    WITH RECURSIVE h AS (
      SELECT doc_id, {_Q238_HOST_EXPR} AS host FROM documents),
    e AS (
      SELECT {_Q238_URL_EXPR} AS src,
             'http://' || host || '/p' || CAST(doc_id - 1 AS VARCHAR(16))
               AS dst
      FROM h WHERE CAST(doc_id % 4 AS INT) <> 0),
    m AS (SELECT src, max(dst) AS dst FROM e GROUP BY src),
    walk AS (
      SELECT src, dst AS cur, 1 AS hops FROM m
      UNION ALL
      SELECT w.src, m.dst AS cur, w.hops + 1
      FROM walk w JOIN m ON m.src = w.cur
      WHERE w.hops < 8),
    term AS (
      SELECT w.src, w.cur, w.hops FROM walk w
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.src = w.cur))
    SELECT m.src, t.cur AS final_url, CAST(t.hops AS BIGINT) AS hops,
           (t.cur IS NOT NULL) AS resolved
    FROM m LEFT JOIN term t ON t.src = m.src
    """,
)
def q254(spark, sf_dir):
    """Soft-redirect resolution (functions/redirects.
    extract_meta_refresh_edges ∪ extract_redirect_edges →
    resolve_redirects): the HTML meta-refresh layer 3xx extraction
    can't see (parked pages, legacy CMSes) UNIONED with the HTTP
    Location edges into ONE alias map — the planted chains CROSS
    mechanisms (a 301 landing on a refresh page landing on a
    terminal), so neither layer alone resolves them. Same
    pointer-jumping plan as q238. FULL value oracle: the unified edge
    arithmetic walked by a bounded recursive CTE."""
    _prep(spark)
    from polars_dataset_spark.functions import (
        extract_meta_refresh_edges,
        extract_redirect_edges,
        resolve_redirects,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.expr(_Q238_HOST_EXPR).alias("host"))
        .select(
            "doc_id",
            F.expr(_Q238_URL_EXPR).alias("url"),
            F.expr(_Q254_STATUS_EXPR).cast("int").alias("http_status"),
            F.expr(_Q254_LOC_EXPR).alias("http_location"),
            F.expr(_Q254_HTML_EXPR).alias("html"),
        )
    )
    hard = extract_redirect_edges(
        docs, uri_col="url", status_col="http_status",
        location_col="http_location",
    )
    soft = extract_meta_refresh_edges(docs, uri_col="url", html_col="html")
    return resolve_redirects(hard.unionAll(soft), max_hops=8)


@query(
    "q255_budget_apportionment",
    """
    WITH w AS (
      SELECT 'd' || CAST(doc_id % 40 AS VARCHAR(8)) AS key,
             CAST(sum(1 + doc_id % 7) AS DOUBLE) AS weight
      FROM documents GROUP BY 1),
    t AS (SELECT sum(weight) AS tw FROM w),
    d AS (SELECT key, weight, 1000.0 * weight / t.tw AS ex FROM w, t),
    f AS (SELECT key, weight, ex, CAST(floor(ex) AS BIGINT) AS fl,
                 ex - floor(ex) AS rem
          FROM d),
    s AS (SELECT sum(fl) AS fs FROM f),
    r AS (SELECT f.key, f.weight, f.fl,
                 row_number() OVER (ORDER BY f.rem DESC, f.key) AS rk,
                 s.fs
          FROM f, s)
    SELECT key, weight,
           CAST(fl + CASE WHEN rk <= 1000 - fs THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM r
    """,
)
def q255(spark, sf_dir):
    """Crawl-budget apportionment (functions/budget.allocate_budget —
    Hamilton's largest-remainder method): integer per-domain quotas
    summing to EXACTLY the cycle budget, proportional to weight —
    round-up over-commits the fetch fleet, round-down leaves budget on
    the floor; largest remainders get the leftover units
    (key-ascending tie-break). The remainder RANKING is the repo's
    two-pass distributed prefix sum (range partitions + per-partition
    offsets) — never a single-partition global sort; the two scalar
    totals are bounded 1-row broadcasts (q124 class, allowlisted).
    FULL value oracle: the whole apportionment replayed in SQL (the
    oracle may single-partition sort; the engine may not)."""
    _prep(spark)
    from polars_dataset_spark.functions import allocate_budget

    weights = (
        load_table(spark, sf_dir, "documents")
        .groupBy(
            F.concat(F.lit("d"), (F.col("doc_id") % 40).cast("string")).alias(
                "key"
            )
        )
        .agg(F.sum(F.lit(1) + F.col("doc_id") % 7).alias("weight"))
    )
    return allocate_budget(weights, budget=1000)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry() query: the star join (q06) through the Dataset API —
    construct, join, filter, aggregate, sort in one plan."""
    _prep(spark)
    return (
        q06(spark, sf_dir)
        .orderBy(F.col("revenue").desc())
    )
