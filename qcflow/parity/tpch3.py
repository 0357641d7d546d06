"""Third TPC-H wave — the multi-way-join / EXISTS-heavy shapes (q2 q7 q8
q9 q11 q12 q20 q21), adapted to the driver star schema.

The driver schema has no partsupp table and lineitem carries no
commitdate/receiptdate/shipmode, so each query keeps its REFERENCE SHAPE
(correlated min, nation-pair volume, market share, profit decomposition,
fraction-of-total HAVING, late-shipment conditional counts, nested
semi-joins, EXISTS + NOT EXISTS) with adapted predicates:

- part-supplier relation  := DISTINCT (l_partkey, l_suppkey) from lineitem
- supply cost             := s_acctbal (q2's correlated MIN target)
- late shipment           := l_shipdate > o_orderdate + 60 days
- availqty threshold      := half of the part's max shipped quantity (q20)

Same exact-decimal float convention as tpch.py. All small dimension joins
are broadcast; the big side shuffles at most once per aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qcflow.parity.registry import query, t
from qcflow.parity.tpch import _SQL_DISC_PRICE, dec, disc_price


@query(
    "tpch_q2",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
                FROM lineitem),
    costed AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
      FROM part JOIN ps ON partkey = p_partkey
           JOIN supplier ON suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
      WHERE p_size = 5 AND p_type = 'STANDARD' AND r_name = 'ASIA'),
    mn AS (SELECT p_partkey AS pk, MIN(s_acctbal) AS min_bal
           FROM costed GROUP BY p_partkey)
    SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
    FROM costed JOIN mn ON p_partkey = pk AND s_acctbal = min_bal
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier: correlated MIN subquery decorrelated into
    per-part aggregate + equality re-join (the Catalyst rewrite, done
    explicitly). The part/supplier/nation/region dims broadcast; the only
    shuffle is the DISTINCT pair extraction from lineitem."""
    ps = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    costed = (
        ps.join(F.broadcast(part), ps.partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    mn = costed.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return costed.join(
        F.broadcast(mn),
        (costed.p_partkey == mn.pk) & (costed.s_acctbal == mn.min_bal),
    ).select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")


@query(
    "tpch_q7",
    oracle=f"""
    SELECT supp_region, cust_region, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
                 EXTRACT(year FROM l_shipdate) AS l_year, {_SQL_DISC_PRICE} AS volume
          FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
              OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1998-01-01')
    GROUP BY supp_region, cust_region, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two trade partners, by year — q7's
    disjunctive two-sided pair filter at region granularity (nation pairs
    are too sparse below sf0.1 and would make the check vacuous). The
    fact table shuffles once for the orders join; every dim broadcasts."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    cust = t(spark, sf_dir, "customer")
    nat, reg = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    s_reg = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", F.col("r_name").alias("supp_region"))
    )
    c_reg = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("c_custkey", F.col("r_name").alias("cust_region"))
    )
    j = (
        li.join(F.broadcast(s_reg), li.l_suppkey == s_reg.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(c_reg), orders.o_custkey == c_reg.c_custkey)
        .filter(
            ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
            | ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
        )
    )
    return (
        j.select(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").alias("l_year"),
            disc_price().alias("volume"),
        )
        .groupBy("supp_region", "cust_region", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@query(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_9' THEN volume
                         ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year, {_SQL_DISC_PRICE} AS volume,
                 n2.n_name AS nation
          FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'ASIA' AND p_type = 'STANDARD'
            AND o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01')
    GROUP BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: conditional-sum ratio per year. Both sums
    stay DECIMAL until the final cast, so the double division is a ratio
    of two exact values — identical in both engines."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    supp, cust = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "customer")
    nat, reg = t(spark, sf_dir, "nation"), t(spark, sf_dir, "region")
    cust_asia = (
        cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            nat.n_regionkey == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nat = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_asia), orders.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
    )
    vol = disc_price()
    zero = F.lit(0).cast("decimal(25,4)")
    rows = j.select(
        F.year("o_orderdate").alias("o_year"),
        vol.alias("volume"),
        F.when(F.col("nation") == "NATION_9", vol).otherwise(zero).alias("nat_volume"),
    )
    return rows.groupBy("o_year").agg(
        (
            F.sum("nat_volume").cast("double") / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "tpch_q9",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
                 {_SQL_DISC_PRICE}
                   - CAST(p_retailprice AS DECIMAL(12,2))
                     * CAST(l_quantity AS DECIMAL(12,2))
                     * CAST(0.10 AS DECIMAL(12,2)) AS amount
          FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
          WHERE p_name LIKE '%gear%')
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit by nation and year; supply cost adapted to
    0.10 * p_retailprice * quantity (no partsupp in the driver schema).
    The profit expression stays DECIMAL end-to-end before the final
    cast."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    orders = t(spark, sf_dir, "orders")
    supp, nat = t(spark, sf_dir, "supplier"), t(spark, sf_dir, "nation")
    supp_nat = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    amount = disc_price() - dec("p_retailprice") * dec("l_quantity") * F.lit(
        "0.10"
    ).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nat), li.l_suppkey == F.col("s_suppkey"))
        .select(
            "nation", F.year("o_orderdate").alias("o_year"), amount.alias("amount")
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )


@query(
    "tpch_q11",
    oracle=f"""
    WITH val AS (
      SELECT l_partkey, SUM({_SQL_DISC_PRICE}) AS v
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation ON s_nationkey = n_nationkey
      WHERE n_regionkey = 2
      GROUP BY l_partkey)
    SELECT l_partkey, CAST(v AS DOUBLE) AS value
    FROM val
    WHERE CAST(v AS DOUBLE) >
          (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) * 2.0 FROM val)
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification: per-part value with HAVING above a
    fraction-of-total scalar subquery. The total re-aggregates the
    part-level partials (not the base table), and the single-row total
    broadcasts onto the filter — q11's plan shape exactly. TPC-H scales
    the fraction by 1/SF; the scale-free equivalent here is 2x the mean
    part value (= total * 2/n_parts), so survivors exist at every SF —
    the fixed 0.001 went vacuous (0 rows) at sf0.1."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    sk = supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey).select(
        "s_suppkey"
    )
    val = (
        li.join(F.broadcast(sk), li.l_suppkey == sk.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(disc_price()).alias("v"))
    )
    total = val.agg(
        (F.sum("v").cast("double") / F.count("*") * 2.0).alias("threshold")
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("v").cast("double").alias("value"))
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority split (q12 with l_linestatus standing in for the
    absent l_shipmode, and ship > order + 60 days standing in for the
    absent receipt/commit dates): join with a cross-table residual
    predicate, then conditional counts."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    orders = t(spark, sf_dir, "orders")
    j = li.join(
        orders,
        (li.l_orderkey == orders.o_orderkey)
        & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "tpch_q20",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey AS pk, l_suppkey AS sk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    pmax AS (SELECT pk, MAX(qty) AS mx FROM shipped GROUP BY pk),
    eligible AS (
      SELECT DISTINCT sk FROM shipped JOIN pmax USING (pk)
                          JOIN part ON p_partkey = pk
      WHERE p_name LIKE 'small%' AND qty > 0.5 * mx)
    SELECT s_suppkey, s_name FROM supplier
    WHERE s_suppkey IN (SELECT sk FROM eligible)
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion: nested IN-subqueries as chained semi
    joins with a correlated half-of-max threshold (availqty adapted to
    the part's max shipped quantity — no partsupp)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.sum(dec("l_quantity")).cast("double").alias("qty"))
    pmax = shipped.groupBy("pk").agg(F.max("qty").alias("mx"))
    eligible = (
        shipped.join(pmax, "pk")
        .join(F.broadcast(part), F.col("pk") == part.p_partkey, "left_semi")
        .filter(F.col("qty") > 0.5 * F.col("mx"))
        .select("sk")
        .distinct()
    )
    nat = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    return (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(eligible), F.col("s_suppkey") == F.col("sk"), "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    SELECT s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.sk
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.ok AND l2.l_suppkey <> l1.sk)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
    GROUP BY s_name
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting — the EXISTS + NOT EXISTS
    multi-join topology: late (order, supplier) pairs where some OTHER
    supplier also fed the order (left_semi with a <> residual) but no
    OTHER supplier was late (left_anti with a <> residual). Lateness
    adapted to ship > order + 60 days."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.date_add(orders.o_orderdate, 60)),
        )
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    l1, l2 = late.alias("l1"), li.alias("l2")
    has_other = l1.join(
        l2,
        (F.col("l1.ok") == F.col("l2.l_orderkey"))
        & (F.col("l1.sk") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    l3 = late.alias("l3")
    sole_late = has_other.alias("l1").join(
        l3,
        (F.col("l1.ok") == F.col("l3.ok")) & (F.col("l1.sk") != F.col("l3.sk")),
        "left_anti",
    )
    supp = t(spark, sf_dir, "supplier")
    return (
        sole_late.join(F.broadcast(supp), F.col("sk") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
