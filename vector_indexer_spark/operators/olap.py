"""Relational OLAP queries over the TPC-H-shaped tables.

The classic analytics surface of the engine — pricing summary,
shipping priority, and revenue-rollup shapes (TPC-H Q1/Q3/Q5
patterns) expressed as declarative DataFrame plans so Catalyst owns
the physical strategy:

- **Dimension joins broadcast.** ``region``/``nation`` (and at real
  scale any sub-threshold dim) join via an explicit
  ``F.broadcast`` — no shuffle of the fact table on a dim key, ever.
- **Facts filter before they join.** Date/segment predicates sit
  directly on the scans, so Parquet row-group pruning and pushed
  filters cut I/O before the first join (verify with
  ``.explain``: PushedFilters on the lineitem/orders scans).
- **Aggregates are map-side combinable.** Money is summed as
  integer cents (``floor(price * 100)``) — partial sums combine
  associatively with no float-order nondeterminism, which also makes
  every query bit-reproducible by the SQL oracle.

At 100 TB the fact-fact join (orders ⋈ lineitem) shuffles on
``l_orderkey`` — the natural co-partition key; with both sides
bucketed by orderkey it degrades to a zero-shuffle sort-merge join,
and AQE handles skewed order keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col) -> F.Column:
    """Money as integer cents — associative, order-independent sums."""
    return F.floor(col * F.lit(100)).cast("long")


def pricing_summary(
    lineitem: DataFrame, *, cutoff_date: str = "2000-01-01"
) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) totals over every
    lineitem shipped on/before the cutoff.

    One map-side-combined aggregation over a date-pruned scan; output
    cardinality is |flags|×|statuses| (tiny). Sums are integer cents /
    integer quantities so partials combine exactly.
    """
    disc = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc * (F.lit(1.0) + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff_date))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor("l_quantity")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(_cents(disc)).alias("sum_disc_cents"),
            F.sum(_cents(charge)).alias("sum_charge_cents"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    segment: str = "BUILDING",
    date: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: the ``k`` highest-revenue open orders for one
    market segment — orders placed before ``date`` with lineitems
    shipped after it.

    Plan shape: both fact scans filter on their date column *before*
    joining (pushed to Parquet); the customer side reduces to a
    filtered key list — small enough that AQE turns the join into a
    broadcast at test scale, while at warehouse scale (where even the
    segment slice of customer outgrows the broadcast budget) it stays
    a key-partitioned shuffle join, so no explicit broadcast hint
    here. The orders ⋈ lineitem hash join on ``orderkey`` is the one
    fact-fact shuffle; partial revenue sums combine map-side. Top-k
    is TakeOrdered, not a sort.
    """
    cust = customer.filter(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    ords = orders.filter(F.col("o_orderdate") < F.lit(date)).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    items = lineitem.filter(F.col("l_shipdate") > F.lit(date)).select(
        "l_orderkey",
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    return (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "o_orderkey")
        .limit(k)
    )


def revenue_by_nation(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1998-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: discounted revenue per customer nation within
    one region and order-date year band.

    ``region`` filters ``nation`` (broadcast — dims are always tiny)
    and the surviving nation keys broadcast into ``customer``; the
    customer ⋈ orders join carries no hint (AQE broadcasts the slice
    at test scale, shuffles it at warehouse scale), and the only
    unavoidable fact-fact shuffle is orders ⋈ lineitem on orderkey.
    Revenue sums are integer cents, map-side combinable; output is
    ≤ |nations| rows.
    """
    nat = (
        nation.join(
            F.broadcast(
                region.filter(F.col("r_name") == region_name).select(
                    "r_regionkey"
                )
            ),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(
        F.broadcast(nat), customer.c_nationkey == nat.n_nationkey
    ).select("c_custkey", "n_name")
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    items = lineitem.select(
        "l_orderkey",
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    return (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(items, ords.o_orderkey == items.l_orderkey)
        .groupBy("n_name")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy(F.col("revenue_cents").desc(), "n_name")
    )


def late_order_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    grace_days: int = 30,
) -> DataFrame:
    """TPC-H Q4 shape: per order priority, how many orders have at
    least one lineitem shipped more than ``grace_days`` after the
    order date.

    The EXISTS is a **left-semi join** — each order emits at most
    once no matter how many late lineitems it has, and Spark stops
    probing an order's hash bucket at the first match; a plain join +
    distinct would shuffle every matching lineitem first. The join
    key is the natural ``orderkey`` co-partition key; the date
    comparison rides along as a residual condition on the semi join.
    """
    late = (
        orders.join(
            lineitem,
            (lineitem.l_orderkey == orders.o_orderkey)
            & (
                lineitem.l_shipdate
                > F.col("o_orderdate") + F.expr(f"INTERVAL {int(grace_days)} DAYS")
            ),
            "left_semi",
        )
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def revenue_rollup(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Hierarchical revenue totals via ``ROLLUP (order year, order
    priority)`` — per-(year, priority) revenue, per-year subtotals,
    and the grand total in ONE aggregation pass (Spark expands the
    grouping sets map-side; no self-union of three queries, no second
    scan of the fact table).

    NULL grouping slots are surfaced as ``-1`` / ``'ALL'`` sentinels
    plus explicit ``GROUPING`` flags, so subtotal rows are
    distinguishable from genuine NULL keys and the output is
    hash-stable across engines.
    """
    joined = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("pri"),
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    return (
        joined.rollup("yr", "pri")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count("*").alias("n_items"),
            # grouping() is only legal inside the rollup's agg clause
            F.grouping("yr").cast("int").alias("yr_total"),
            F.grouping("pri").cast("int").alias("pri_total"),
        )
        .select(
            F.coalesce("yr", F.lit(-1)).alias("yr"),
            F.coalesce("pri", F.lit("ALL")).alias("pri"),
            "yr_total",
            "pri_total",
            "revenue_cents",
            "n_items",
        )
    )


def volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    *,
    nation1: str = "NATION_0",
    nation2: str = "NATION_1",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — discounted revenue of
    lineitems a supplier in one nation shipped to a customer in the
    other, by (supp_nation, cust_nation, ship year), both directions.

    Plan shape: the nation pair filter broadcasts down BOTH dimension
    chains (supplier and customer sides each reduce to a key list
    BEFORE touching a fact), the ship-date band is pushed to the
    lineitem scan, and the single fact-fact shuffle is lineitem ⋈
    orders on orderkey — the same one-big-join discipline as Q5. The
    cross-pair predicate (N1→N2 or N2→N1) runs AFTER both nation
    names are attached, on fact-sized rows but as a codegen filter,
    never a join. Revenue sums in integer cents (associative).
    """
    pair = nation.filter(F.col("n_name").isin(nation1, nation2)).select(
        "n_nationkey", "n_name"
    )
    supp = supplier.join(
        F.broadcast(pair.withColumnRenamed("n_name", "supp_nation")),
        supplier.s_nationkey == pair.n_nationkey,
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(pair.withColumnRenamed("n_name", "cust_nation")),
        customer.c_nationkey == pair.n_nationkey,
    ).select("c_custkey", "cust_nation")
    li = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from))
        & (F.col("l_shipdate") < F.lit(date_to))
    ).select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    ords = orders.select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def returned_item_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    *,
    date_from: str = "1996-01-01",
    date_to: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: the ``k`` customers who lost the most revenue
    to returned items (``l_returnflag = 'R'``) for orders placed in a
    quarter — the churn-triage report.

    Plan shape: the return flag + order-date predicates are pushed to
    their fact scans before the one orderkey fact-fact shuffle;
    revenue partially aggregates per customer (map-side combine on the
    custkey shuffle); customer + nation attach AFTER aggregation, so
    the dimension join touches at most |customers| aggregated rows,
    not fact rows; top-k is TakeOrdered, never a global sort.
    """
    li = lineitem.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("rev_cents").alias("revenue_cents"))
    )
    cust = customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
    nat = nation.select("n_nationkey", "n_name")
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            "c_custkey", "c_name", "n_name", "c_acctbal", "revenue_cents"
        )
        .orderBy(F.col("revenue_cents").desc(), "c_custkey")
        .limit(k)
    )


def market_share(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    share_nation: str = "NATION_0",
    market_region: str = "ASIA",
    part_type: str = "ECONOMY",
    date_from: str = "1995-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of a part-type
    market inside a region, by order year — the ratio-of-sums report
    (share = Σ revenue where supp_nation = X / Σ all revenue), which
    MUST be computed as two conditional sums in ONE aggregation, never
    two scans joined.

    Plan shape: part-type and region filters reduce their dimension
    chains to key lists that broadcast; order-date band pushes to the
    orders scan; lineitem ⋈ orders is the one fact-fact shuffle; the
    share divides two map-side-combined integer-cent sums after a
    single (year) group-by. Revenue cents keep the division exact to
    a deterministic double at the very last step.
    """
    p = part.filter(F.col("p_type") == part_type).select("p_partkey")
    reg_nations = nation.join(
        F.broadcast(
            region.filter(F.col("r_name") == market_region).select(
                "r_regionkey"
            )
        ),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(
        F.broadcast(reg_nations),
        customer.c_nationkey == F.col("n_nationkey"),
    ).select("c_custkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    ).select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    li = lineitem.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    base = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
    )
    share_rev = F.sum(
        F.when(
            F.col("supp_nation") == share_nation, F.col("rev_cents")
        ).otherwise(F.lit(0))
    )
    return (
        base.groupBy("o_year")
        .agg(
            share_rev.alias("share_cents"),
            F.sum("rev_cents").alias("total_cents"),
        )
        .select(
            "o_year",
            "share_cents",
            "total_cents",
            (
                F.col("share_cents").cast("double")
                / F.col("total_cents").cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


def brand_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    branches: tuple = (
        ("Brand#1", 10, 1.0, 11.0),
        ("Brand#2", 20, 10.0, 20.0),
        ("Brand#3", 30, 20.0, 30.0),
    ),
) -> DataFrame:
    """TPC-H Q19 shape: revenue from lineitems matching ANY of several
    (brand, max size, quantity band) branches — the disjunctive
    OR-of-ANDs predicate that exercises an optimizer's disjunction
    handling.

    Plan shape: the part side pre-filters to the UNION of the brand/
    size envelopes (the disjunction's part-only projection pushes to
    the part scan) and broadcasts; the mixed part+lineitem conjuncts
    evaluate post-join in codegen. One row out; no shuffle beyond the
    final scalar agg.
    """
    env = None
    for brand, max_size, _, _ in branches:
        c = (F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
        env = c if env is None else (env | c)
    p = part.filter(env).select("p_partkey", "p_brand", "p_size")
    joined = lineitem.join(
        F.broadcast(p), lineitem.l_partkey == p.p_partkey
    )
    pred = None
    for brand, max_size, qlo, qhi in branches:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") <= max_size)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") < qhi)
        )
        pred = c if pred is None else (pred | c)
    return joined.filter(pred).agg(
        F.sum(
            _cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            )
        ).alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    min_quantity: float = 250.0,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, with their customer — the aggregate-HAVING-then-join
    report.

    Plan shape: the quantity sum happens FIRST, on (orderkey) with
    map-side combine, and the HAVING filter shrinks the fact to a
    handful of keys BEFORE any join — the aggregate-then-join
    discipline (joining first would carry every lineitem through the
    customer join). Quantities sum as integer units (the synthetic
    quantities are integral; floor() pins it).
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") >= F.lit(int(min_quantity)))
    )
    ords = orders.select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = customer.select("c_custkey", "c_name")
    return (
        big.join(ords, big.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            _cents(F.col("o_totalprice")).alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(k)
    )


def dormant_rich_customers(
    customer: DataFrame,
    orders: DataFrame,
    *,
    date_from: str = "2001-01-01",
) -> DataFrame:
    """TPC-H Q22 shape (adapted to available columns): customers with
    above-average account balance and NO orders since ``date_from`` —
    the scalar-subquery + anti-join report.

    Plan shape: the global average is ONE scalar (computed in its own
    tiny agg and broadcast via a cross join — never recomputed per
    row); the no-recent-orders condition is a broadcast-able LEFT ANTI
    join against the date-pruned orders key set; output aggregates per
    nation key. Balance sums in integer cents.
    """
    avg_bal = customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit(date_from)
    ).select("o_custkey").distinct()
    rich = customer.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    return (
        rich.join(
            recent, rich.c_custkey == recent.o_custkey, "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_cents(F.col("c_acctbal"))).alias("total_bal_cents"),
        )
        .orderBy("c_nationkey")
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of customers by how many
    orders they placed — INCLUDING zero-order customers, which is the
    whole point (an inner join silently drops them; the LEFT join +
    count(non-null key) is the load-bearing construct).

    Plan shape: group-by-of-group-by — orders first collapse to one
    row per customer (map-side combined on the custkey shuffle), the
    left join attaches zeros, and the second aggregation is
    |distinct order counts|-sized. No row ever carries order payload
    past the first aggregation.
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.count("*").alias("c_count")
    )
    joined = customer.select("c_custkey").join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    )
    return (
        joined.select(
            F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count")
        )
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q14 shape: the share of revenue in a ship-date window
    that came from promotional parts.

    Plan shape: lineitem date-prunes at the scan, then joins the part
    dimension via an explicit broadcast (part is |parts|-sized — tiny
    next to the fact, and at warehouse scale still well under the
    broadcast budget at ~200 B/row × 2×10^8 rows only for SF≥1000;
    beyond that the join degrades to a shuffle on partkey, which AQE
    chooses automatically when the hint is dropped). Both the promo
    and total sums come out of ONE aggregation pass — a conditional
    sum, not two scans. Revenue sums as integer cents; the ratio is a
    single IEEE division of two exact longs, so the oracle matches
    bit-for-bit.
    """
    rev = _cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    joined = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
        )
        .select("l_partkey", rev.alias("rev_cents"))
        .join(
            F.broadcast(part.select("p_partkey", "p_type")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
    )
    return joined.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", F.col("rev_cents")).otherwise(
                F.lit(0)
            )
        ).alias("promo_cents"),
        F.sum("rev_cents").alias("total_cents"),
    ).select(
        "promo_cents",
        "total_cents",
        (
            F.lit(100.0)
            * F.col("promo_cents").cast("double")
            / F.col("total_cents").cast("double")
        ).alias("promo_pct"),
    )


def top_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    date_from: str = "1997-01-01",
    date_to: str = "1997-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with the maximum revenue in a
    quarter — the create-view / scalar-max / equality-join report.

    Plan shape: per-supplier revenue is one map-side-combined
    aggregation over the date-pruned fact (the "revenue view"); the
    global max is a 1-row aggregate of THAT (|suppliers| rows, not
    fact rows) broadcast back via cross join; supplier names attach by
    broadcast. Nothing fact-sized crosses the network twice.
    """
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(date_from))
            & (F.col("l_shipdate") < F.lit(date_to))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                _cents(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                )
            ).alias("total_rev_cents")
        )
    )
    max_rev = revenue.agg(
        F.max("total_rev_cents").alias("__max_rev")
    )
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_rev_cents") == F.col("__max_rev"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_rev_cents")
        .orderBy("s_suppkey")
    )


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    brand: str = "Brand#4",
    max_size: int = 15,
    quantity_fraction: float = 0.5,
    years_spanned: float = 7.0,
) -> DataFrame:
    """TPC-H Q17 shape (container→size adaptation — the synthetic part
    table has no p_container, so the secondary part predicate is a
    size band): average yearly revenue lost if small-quantity orders
    for one brand's small parts were dropped.

    The load-bearing construct is the CORRELATED SUBQUERY — each
    lineitem compares against the average quantity *of its own part* —
    decorrelated the way every warehouse engine does: compute per-part
    averages once as an aggregate, then join. The part-filtered fact
    slice drives both the average and the final sum, so the per-part
    aggregate is over the brand slice only (matching the oracle's
    correlated form, where the subquery's part is equality-bound to
    the outer part).

    Plan shape: broadcast the filtered part dim into the fact scan;
    one partkey-shuffle aggregation for the averages (|brand parts|
    rows — tiny); broadcast those back; one conditional sum. Revenue
    sums as integer cents; the final division by ``years_spanned`` is
    one IEEE op on an exact long.
    """
    pslice = F.broadcast(
        part.filter(
            (F.col("p_brand") == brand) & (F.col("p_size") <= max_size)
        ).select("p_partkey")
    )
    items = lineitem.join(
        pslice, F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = items.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        items.join(
            F.broadcast(avg_qty),
            F.col("l_partkey") == F.col("a_partkey"),
        )
        .filter(
            F.col("l_quantity")
            < F.lit(quantity_fraction) * F.col("__avg_qty")
        )
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("lost_cents"))
        .select(
            "lost_cents",
            (
                F.col("lost_cents").cast("double")
                / F.lit(float(years_spanned))
            ).alias("avg_yearly"),
        )
    )


def waiting_suppliers(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "GERMANY",
    late_days: int = 60,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape (lateness adapted — no l_commitdate/receiptdate
    in the synthetic schema, so "late" is shipping > ``late_days``
    after the order date): suppliers in one nation who were the SOLE
    late supplier on a multi-supplier finalized order.

    The load-bearing constructs are the EXISTS (another supplier
    shipped in the same order) and NOT EXISTS (no OTHER supplier was
    also late) — expressed as a left-semi and a left-anti join on
    orderkey with a suppkey inequality, exactly how Catalyst
    decorrelates the SQL form.

    Plan shape: the fact slice (F-status orders, one nation's
    suppliers) is built once and reused for the probe sides; both
    existence joins shuffle on orderkey — the same key, so the
    exchange is reusable; the final count is per-supplier (tiny). The
    semi/anti probe sides project only (orderkey, suppkey) — no
    payload travels.
    """
    nkey = F.broadcast(
        nation.filter(F.col("n_name") == nation_name).select("n_nationkey")
    )
    supp = supplier.join(
        nkey, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    fords = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    items = lineitem.join(
        fords, F.col("l_orderkey") == F.col("o_orderkey")
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")
        ).alias("is_late"),
    )
    late_mine = items.filter(F.col("is_late")).join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    )
    others = items.select(
        F.col("l_orderkey").alias("e_orderkey"),
        F.col("l_suppkey").alias("e_suppkey"),
    )
    late_others = items.filter(F.col("is_late")).select(
        F.col("l_orderkey").alias("x_orderkey"),
        F.col("l_suppkey").alias("x_suppkey"),
    )
    exists_other = late_mine.join(
        others,
        (F.col("l_orderkey") == F.col("e_orderkey"))
        & (F.col("l_suppkey") != F.col("e_suppkey")),
        "left_semi",
    )
    sole_late = exists_other.join(
        late_others,
        (F.col("l_orderkey") == F.col("x_orderkey"))
        & (F.col("l_suppkey") != F.col("x_suppkey")),
        "left_anti",
    )
    return (
        sole_late.groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_suppkey")
        .limit(k)
    )


def product_type_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    name_like: str = "widget",
    cost_fraction: float = 0.6,
) -> DataFrame:
    """TPC-H Q9 shape (cost adapted — the synthetic schema has no
    partsupp/ps_supplycost, so unit cost is ``cost_fraction`` of the
    part's retail price): profit by supplier nation and order year for
    parts whose name contains a substring.

    Plan shape: the part slice (name LIKE) and supplier→nation map
    broadcast into the fact; the one fact-fact shuffle is
    lineitem ⋈ orders on orderkey (only to read the year); profit
    amounts compute as exact integer cents BEFORE aggregation, so
    partial sums combine associatively and match the oracle
    bit-for-bit. Output is |nations| × |years| rows.
    """
    pslice = F.broadcast(
        part.filter(F.col("p_name").contains(name_like)).select(
            "p_partkey",
            F.floor(
                F.col("p_retailprice") * F.lit(100.0) * F.lit(cost_fraction)
            )
            .cast("long")
            .alias("unit_cost_cents"),
        )
    )
    snation = F.broadcast(
        supplier.join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey", "n_name")
    )
    amount = (
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        )
        - F.col("unit_cost_cents") * F.floor("l_quantity").cast("long")
    ).alias("amount_cents")
    return (
        lineitem.join(pslice, F.col("l_partkey") == F.col("p_partkey"))
        .join(snation, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("n_name", "o_year", amount)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum("amount_cents").alias("profit_cents"))
        .orderBy("nation", F.col("o_year").desc())
    )


def revenue_cube(
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """``CUBE (order year, order priority)`` — the full lattice:
    per-cell, per-year, per-priority, and grand totals in ONE pass.
    The CUBE completes what :func:`revenue_rollup` starts: ROLLUP
    omits the per-priority marginals; a BI layer slicing on either
    axis wants all four grouping sets. Same sentinel + GROUPING-flag
    discipline, same single map-side grouping-set expansion (2× the
    rollup's expand, still one fact scan and one shuffle).
    """
    joined = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderpriority").alias("pri"),
        _cents(
            F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        ).alias("rev_cents"),
    )
    return (
        joined.cube("yr", "pri")
        .agg(
            F.sum("rev_cents").alias("revenue_cents"),
            F.count("*").alias("n_items"),
            F.grouping("yr").cast("int").alias("yr_total"),
            F.grouping("pri").cast("int").alias("pri_total"),
        )
        .select(
            F.coalesce("yr", F.lit(-1)).alias("yr"),
            F.coalesce("pri", F.lit("ALL")).alias("pri"),
            "yr_total",
            "pri_total",
            "revenue_cents",
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# The last five TPC-H shapes (Q2, Q11, Q12, Q16, Q20), completing all 22.
#
# The synthetic schema has no partsupp table and no
# l_shipmode/l_commitdate/l_receiptdate columns, so these adapt the
# published query semantics to what the data carries — each docstring
# names the divergence. The part-supplier catalog is DERIVED from
# lineitem (distinct (l_partkey, l_suppkey) with observed unit costs /
# shipped quantities), which keeps every join-shape and subquery
# pattern of the originals: correlated min (Q2), scalar-fraction
# threshold (Q11), two-class pivot counts (Q12), exclusion-list
# distinct-count (Q16), and the half-of-total dominance test (Q20).
# ---------------------------------------------------------------------------


def min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    size: int = 11,
    type_name: str = "ECONOMY",
    limit: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape: for each part of a given size/type, the
    region's cheapest supplier (observed min unit cost from lineitem
    standing in for ps_supplycost — the schema has no partsupp).

    Plan shape: region→nation→supplier is a broadcast dim chain that
    reduces to a supplier key list BEFORE touching the fact; the
    derived catalog is one map-side-combined MIN per (part, supplier);
    the correlated "= min cost over region suppliers of this part"
    subquery becomes a groupBy-min joined back on equality — two
    shuffles on the part key, no window over corpus-scale data. Unit
    cost is floor(extendedprice / quantity * 100) in integer cents —
    IEEE double division then floor, identical in any engine.
    """
    nat = nation.join(
        F.broadcast(region.filter(F.col("r_name") == region_name)),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    unit_cents = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * F.lit(100)
    ).cast("long")
    catalog = (
        lineitem.select("l_partkey", "l_suppkey", unit_cents.alias("uc"))
        .join(F.broadcast(supp.select("s_suppkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("uc").alias("unit_cost_cents"))
    )
    pts = part.filter(
        (F.col("p_size") == size) & (F.col("p_type") == type_name)
    ).select("p_partkey", "p_name")
    offers = catalog.join(
        F.broadcast(pts), catalog.l_partkey == pts.p_partkey
    )
    best = offers.groupBy("p_partkey").agg(
        F.min("unit_cost_cents").alias("min_cost_cents")
    )
    return (
        offers.join(best, "p_partkey")
        .filter(F.col("unit_cost_cents") == F.col("min_cost_cents"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select(
            _cents(F.col("s_acctbal")).alias("s_acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "unit_cost_cents",
        )
        .orderBy(
            F.col("s_acctbal_cents").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(limit)
    )


def important_stock(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    *,
    nation_name: str = "NATION_0",
    fraction_ppm: int = 2_000,
) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant fraction of
    one nation's total traded value (shipped value from lineitem
    standing in for ps_supplycost*ps_availqty).

    Plan shape: nation→supplier broadcasts to a key list; value per
    part is one map-side-combined SUM of integer cents; the scalar
    "fraction of grand total" subquery is a 1-row aggregate
    cross-joined (broadcast) back — the threshold compare is pure
    integer arithmetic (value*1e6 > total*ppm), bit-exact across
    engines.
    """
    nsup = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey")
    val = (
        lineitem.join(F.broadcast(nsup),
                      F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    total = val.agg(
        F.sum("value_cents").alias("total_cents")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.lit(1_000_000)
            > F.col("total_cents") * F.lit(fraction_ppm)
        )
        .select("l_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "l_partkey")
    )


def shipmode_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    year: int = 1997,
    slow_lag_days: int = 60,
) -> DataFrame:
    """TPC-H Q12 shape: per ship-speed class, how many high- vs
    low-priority orders it carried (ship lag from order date standing
    in for l_shipmode/commitdate/receiptdate, which the schema lacks:
    lag >= ``slow_lag_days`` is 'SLOW', else 'FAST').

    Plan shape: the ship-year predicate pushes to the lineitem scan;
    one fact-fact shuffle on orderkey; the priority split is a
    codegen CASE inside a map-side-combined SUM — the classic
    conditional-pivot aggregation.
    """
    li = lineitem.filter(
        F.year("l_shipdate") == F.lit(year)
    ).select("l_orderkey", "l_shipdate")
    ords = orders.select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    mode = F.when(
        F.datediff("l_shipdate", "o_orderdate") >= slow_lag_days, "SLOW"
    ).otherwise("FAST")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .select(mode.alias("ship_mode"), high.alias("is_high"))
        .groupBy("ship_mode")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias(
                "low_line_count"
            ),
        )
        .orderBy("ship_mode")
    )


def parts_supplier_counts(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    exclude_brand: str = "Brand#1",
    sizes: tuple[int, ...] = (1, 4, 7, 10, 13, 16, 19, 22),
) -> DataFrame:
    """TPC-H Q16 shape: how many suppliers can provide each
    (brand, type, size) bucket, excluding one brand and an exclusion
    list of suppliers (negative account balance standing in for the
    'customer complaints' LIKE subquery).

    Plan shape: the supplier exclusion list is a broadcast anti-join
    (it is tiny by construction); the part filter broadcasts onto the
    derived distinct (part, supplier) catalog; the COUNT(DISTINCT
    suppkey) groups by part attributes — Spark plans it as two
    map-side-combined aggregations (partial distinct then count), no
    row explosion.
    """
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pts = part.filter(
        (F.col("p_brand") != exclude_brand)
        & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    catalog = (
        lineitem.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(bad),
              F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    )
    return (
        catalog.join(F.broadcast(pts),
                     catalog.l_partkey == pts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def excess_stock_suppliers(
    supplier: DataFrame,
    nation: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    *,
    nation_name: str = "NATION_0",
    name_prefix: str = "red",
    year: int = 1997,
) -> DataFrame:
    """TPC-H Q20 shape: a nation's suppliers who dominate the supply
    of some matched part — shipped more than half that part's total
    shipped quantity in the year (observed shipments standing in for
    ps_availqty > 0.5 * sum(l_quantity)).

    Plan shape: the part-name prefix reduces to a broadcast key list;
    per-(part, supplier) and per-part quantity sums share one
    shuffled aggregation each (integer quantity units, associative);
    the dominance test is 2*sp_qty > part_qty in pure integer math;
    the nation filter lands last on an already supplier-sized frame.
    """
    pts = part.filter(F.col("p_name").startswith(name_prefix)).select(
        "p_partkey"
    )
    li = (
        lineitem.filter(F.year("l_shipdate") == F.lit(year))
        .join(F.broadcast(pts), F.col("l_partkey") == pts.p_partkey)
        .select(
            "l_partkey",
            "l_suppkey",
            F.floor("l_quantity").cast("long").alias("qty"),
        )
    )
    sp = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty").alias("sp_qty")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("qty").alias("part_qty"))
    dominant = (
        sp.join(per_part, "l_partkey")
        .filter(F.col("sp_qty") * 2 > F.col("part_qty"))
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n_dominant_parts"))
    )
    nsup = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        supplier.s_nationkey == nation.n_nationkey,
    ).select("s_suppkey", "s_name")
    return (
        dominant.join(nsup, dominant.l_suppkey == nsup.s_suppkey)
        .select("s_suppkey", "s_name", "n_dominant_parts")
        .orderBy("s_suppkey")
    )
