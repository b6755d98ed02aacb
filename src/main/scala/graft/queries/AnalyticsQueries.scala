package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Headline analytics queries over the TPC-H-ish star schema — these are the
  * bench workload (sf0.1) and double as correctness rows for the join/agg
  * operator families at a scale where plan shape matters.
  *
  * Plan notes (verified via `.explain("formatted")`):
  *   - dimension joins (`part`, `supplier`, `nation`, `region`, `customer`)
  *     are explicitly `broadcast()` — at 100 TB the fact table never
  *     shuffles for a dimension join;
  *   - aggregations are partial+final hash aggs (map-side combine) with a
  *     single shuffle on the grouping keys;
  *   - filters sit directly on the scan so parquet pushdown prunes row
  *     groups (`PushedFilters` in the plan), and only referenced columns
  *     are read (`ReadSchema`).
  */
object AnalyticsQueries {

  val all: Seq[Q] = Seq(

    // Q1-style pricing summary: wide scan, 4 groups, heavy partial agg.
    // sum_charge is emitted raw (6-decimal exact value has no safe rounding
    // grid); the driver's canonicalization rounds it on both sides.
    Q("q1_pricing_summary",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax"))).as("sum_charge"),
          (round(sum("l_quantity"), 2) / count("l_quantity")).as("avg_qty"),
          (round(sum("l_extendedprice"), 2) / count("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) AS sum_charge,
        |  round(sum(l_quantity), 2) / count(l_quantity) AS avg_qty,
        |  round(sum(l_extendedprice), 2) / count(l_extendedprice) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // Q6-style forecast revenue: pure filter-scan aggregate — every
    // predicate reaches the parquet scan (PushedFilters), zero joins, one
    // exchange for the single output row. The canonical pushdown probe.
    Q("q6_forecast_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .filter(
          col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01" &&
            col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
            col("l_quantity") < 24.0)
        .agg(
          round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24.0""".stripMargin)),

    // Q3-style shipping priority: fact-fact join (orders⨝lineitem, shuffle
    // on orderkey) with a broadcast customer dimension.
    Q("q3_shipping_priority",
      (s, dir) => {
        val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, dir).filter(col("o_orderdate") < "1999-01-01")
        val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > "1999-01-01")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(
            col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
      },
      Some("""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        |GROUP BY 1, 2, 3""".stripMargin)),

    // Q4-style priority check: orders in a window having at least one
    // returned line item, counted by priority — EXISTS compiled to a
    // LEFT SEMI join (probe side never duplicates, no distinct needed),
    // both scan filters pushed.
    Q("q4_priority_semi",
      (s, dir) => {
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
        val returned = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        ord.join(returned, ord("o_orderkey") === returned("l_orderkey"), "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority""".stripMargin)),

    // Q22-style churned high-balance customers: above-average balance
    // AND no orders in the recent window — NOT EXISTS as a LEFT ANTI
    // join against the date-filtered orders; the corpus-wide average is
    // a broadcast 1-row aggregate expressed round(sum, 2)/count (the
    // catalog's average-parity rule: the 2-dp-grid sum is engine-exact,
    // so both engines divide bit-identical doubles — rounding avg()
    // itself would NOT be deterministic near a rounding boundary).
    Q("q22_churned_customers",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val recent = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "2000-01-01")
        val avgBal = cust.agg(
          (round(sum("c_acctbal"), 2) / count(col("c_acctbal"))).as("avg_bal"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, cust("c_custkey") === recent("o_custkey"), "left_anti")
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_custs"),
            round(sum("c_acctbal"), 2).as("total_bal"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_custs,
        |  round(sum(c_acctbal), 2) AS total_bal
        |FROM customer,
        |  (SELECT round(sum(c_acctbal), 2) / count(c_acctbal) AS avg_bal
        |   FROM customer) t
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY c_mktsegment""".stripMargin)),

    // Q10-style returned-item reporting: which customers returned the
    // most revenue in a quarter. Fact-side filters (returnflag, date
    // window) push to the scans; customer/nation broadcast; ONE shuffle
    // for the group-by; the top-20 runs as TakeOrderedAndProject (no
    // global sort materialization). Ordering is on the ROUNDED revenue +
    // c_custkey, so the selected set is engine-deterministic even under
    // exact revenue ties.
    Q("q10_returned_items",
      (s, dir) => {
        val cust = Tables.customer(s, dir)
        val nation = Tables.nation(s, dir)
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1996-04-01")
        Tables.lineitem(s, dir)
          .filter(col("l_returnflag") === "R")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"),
            round(col("c_acctbal"), 2).as("c_acctbal"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey").asc)
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, n_name, round(c_acctbal, 2) AS c_acctbal,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY 1, 2, 3, 4
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // Q18-style large-volume orders: the classic having-over-aggregate
    // semi-join shape. lineitem aggregates ONCE per order (map-side
    // combine), the having cut shrinks it to the big-order keys, and
    // that SMALL survivor set joins orders/customer — the survivors are
    // the broadcast side, never the fact table.
    Q("q18_large_orders",
      (s, dir) => {
        val bigOrders = Tables.lineitem(s, dir)
          .groupBy("l_orderkey")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"))
          .filter(col("sum_qty") > 150.0)
        val cust = Tables.customer(s, dir)
        Tables.orders(s, dir)
          .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            round(col("o_totalprice"), 2).as("o_totalprice"),
            col("sum_qty"))
      },
      Some("""SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  round(o_totalprice, 2) AS o_totalprice, sum_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        |      FROM lineitem GROUP BY 1
        |      HAVING round(sum(l_quantity), 2) > 150.0) big
        |  ON o_orderkey = big.l_orderkey
        |JOIN customer ON o_custkey = c_custkey""".stripMargin)),

    // Q5-style local-supplier revenue: 5-way join; every dimension
    // broadcast, single shuffle on the grouping key.
    Q("q5_region_revenue",
      (s, dir) => {
        val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
        val nation = Tables.nation(s, dir)
        val supp = Tables.supplier(s, dir)
        val cust = Tables.customer(s, dir)
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
        Tables.lineitem(s, dir)
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
      },
      Some("""SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin)),

    // Q7-style nation volume: the bidirectional trade-flow query. The
    // one unavoidable fact-fact shuffle is lineitem⨝orders on orderkey;
    // both nation sides arrive broadcast (supplier+nation pre-joined on
    // the build side, customer+nation likewise), so the pair filter
    // prunes rows before the fact shuffle on the supplier side.
    Q("q7_nation_volume",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val suppN = Tables.supplier(s, dir)
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val custN = Tables.customer(s, dir)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') s
        |GROUP BY 1, 2, 3""".stripMargin)),

    // Q8-style market share: one nation's share of PROMO-part revenue per
    // order year among one region's customers. Share = ratio of two
    // rounded (grid-exact) sums, so both engines divide bit-identical
    // doubles (parity rule 4). Five broadcast dimensions, one fact-fact
    // shuffle, conditional agg instead of a second pass.
    Q("q8_market_share",
      (s, dir) => {
        val n = Tables.nation(s, dir)
        val custRegion = Tables.customer(s, dir)
          .join(n, col("c_nationkey") === col("n_nationkey"))
          .join(Tables.region(s, dir).filter(col("r_name") === "EUROPE"),
            col("n_regionkey") === col("r_regionkey"))
          .select("c_custkey")
        val suppN = Tables.supplier(s, dir)
          .join(n, col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val natVol = round(sum(when(col("supp_nation") === "NATION_5", vol)
          .otherwise(lit(0.0))), 4)
        val totVol = round(sum(vol), 4)
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir).filter(col("p_type") === "PROMO")
            .select("p_partkey")), col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir)
            .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(natVol.as("nation_volume"), totVol.as("total_volume"),
            (natVol / totVol).as("mkt_share"))
      },
      Some("""SELECT o_year,
        |  round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END), 4)
        |    AS nation_volume,
        |  round(sum(volume), 4) AS total_volume,
        |  round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END), 4)
        |    / round(sum(volume), 4) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume,
        |    n1.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |  JOIN region ON n2.n_regionkey = r_regionkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00') s
        |GROUP BY o_year""".stripMargin)),

    // Q9-style product-line profit by supplier nation and order year
    // (adapted: the corpus has no partsupp, so profit is the discounted
    // revenue of name-matched parts). The LIKE filter lands on the
    // broadcast part build side; lineitem shuffles once for orders.
    Q("q9_product_profit",
      (s, dir) => {
        val suppN = Tables.supplier(s, dir)
          .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name"))
        Tables.lineitem(s, dir)
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_name").like("%widget%")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("profit"))
      },
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2""".stripMargin)),

    // Q13-style customer order-count distribution (the corpus has no
    // o_comment, so the exclusion predicate adapts to o_orderpriority —
    // same left-outer-join-with-filtered-right shape: excluded-only and
    // orderless customers both land in the c_count=0 bucket). Scale shape:
    // orders pre-aggregates to one row per ordering customer BEFORE the
    // join, so the join input shrinks from |orders| to |customers| and the
    // outer join runs key-to-key; the distribution regroup is a second,
    // tiny shuffle on c_count.
    Q("q13_customer_distribution",
      (s, dir) => {
        val ordCnt = Tables.orders(s, dir)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        Tables.customer(s, dir).select("c_custkey")
          .join(ordCnt, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("n_orders"), lit(0L)).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
      },
      Some("""SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin)),

    // Q14-style promo revenue share for one ship month: single broadcast
    // join, conditional agg, one output row. promo_pct divides two
    // grid-rounded sums (parity rule 4).
    Q("q14_promo_revenue",
      (s, dir) => {
        val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val promo = round(sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0.0))), 4)
        val total = round(sum(vol), 4)
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= "1997-09-01" && col("l_shipdate") < "1997-10-01")
          .join(broadcast(Tables.part(s, dir).select("p_partkey", "p_type")),
            col("l_partkey") === col("p_partkey"))
          .agg(promo.as("promo_revenue"), total.as("total_revenue"),
            (lit(100.0) * (promo / total)).as("promo_pct"))
      },
      Some("""SELECT
        |  round(sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4)
        |    AS promo_revenue,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue,
        |  100.0 * (round(sum(CASE WHEN p_type = 'PROMO'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END), 4)
        |    / round(sum(l_extendedprice * (1.0 - l_discount)), 4)) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""".stripMargin)),

    // Q15-style top supplier: quarterly revenue per supplier, then the
    // max-revenue supplier(s). The max arrives as a broadcast single-row
    // join against the grid-rounded totals — ties are kept on both
    // engines because equality is on the rounding grid, and the fact
    // table shuffles once (groupBy suppkey).
    Q("q15_top_supplier",
      (s, dir) => {
        val revenue = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1997-04-01")
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("total_revenue"))
        val top = revenue.agg(max(col("total_revenue")).as("max_revenue"))
        Tables.supplier(s, dir)
          .join(broadcast(revenue), col("s_suppkey") === col("supplier_no"))
          .join(broadcast(top), col("total_revenue") === col("max_revenue"))
          .select("s_suppkey", "s_name", "total_revenue")
      },
      Some("""WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = supplier_no
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin)),

    // Q16-style supplier breadth per (brand, type, size) (adapted: no
    // partsupp, so suppliers are observed from lineitem). countDistinct
    // shuffles once on the composite grouping key after the broadcast
    // part filter prunes the fact rows.
    Q("q16_supplier_breadth",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)
          .filter(col("p_brand") =!= "Brand#5" &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt")),
      Some("""SELECT p_brand, p_type, p_size,
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |GROUP BY 1, 2, 3""".stripMargin)),

    // Q17-style small-quantity revenue: rows below 20% of their part's
    // mean quantity, for one brand. The per-part threshold is
    // 0.2 * (round(sum,2)/count) — grid-exact sum over integral
    // quantities, identical division and multiply on both engines, so
    // the `<` comparison is bit-deterministic (parity rule 4). The
    // threshold frame joins back to lineitem on partkey: fact-fact
    // shuffle on l_partkey, brand filter broadcast.
    Q("q17_small_qty_revenue",
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
        val thresholds = li.groupBy(col("l_partkey").as("agg_partkey"))
          .agg((lit(0.2) * (round(sum("l_quantity"), 2) / count("l_quantity")))
            .as("avg_qty"))
        li.join(broadcast(Tables.part(s, dir)
            .filter(col("p_brand") === "Brand#13").select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .join(thresholds, col("agg_partkey") === col("l_partkey"))
          .filter(col("l_quantity") < col("avg_qty"))
          .agg((round(sum("l_extendedprice"), 2) / lit(7.0)).as("avg_yearly"),
            count(lit(1)).as("n_small"))
      },
      Some("""WITH qty AS (
        |  SELECT l_partkey AS agg_partkey,
        |    0.2 * (round(sum(l_quantity), 2) / count(l_quantity)) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT round(sum(l_extendedprice), 2) / 7.0 AS avg_yearly,
        |  CAST(count(*) AS BIGINT) AS n_small
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN qty ON agg_partkey = l_partkey
        |WHERE p_brand = 'Brand#13' AND l_quantity < avg_qty""".stripMargin)),

    // Q19-style disjunctive predicate revenue: three brand/size/quantity
    // bands OR-ed together. The whole predicate evaluates post-join on
    // broadcast part columns + fact columns — one scan, no shuffle
    // before the single-row agg.
    Q("q19_banded_revenue",
      (s, dir) => {
        val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
        val band1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1.0 && col("l_quantity") <= 11.0
        val band2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity") >= 10.0 && col("l_quantity") <= 20.0
        val band3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity") >= 20.0 && col("l_quantity") <= 30.0
        Tables.lineitem(s, dir)
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(band1 || band2 || band3)
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 1 AND l_quantity <= 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity >= 10 AND l_quantity <= 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |       AND l_quantity >= 20 AND l_quantity <= 30)""".stripMargin)),

    // Q20-style part-promotion candidates (adapted: shipped quantity from
    // lineitem stands in for partsupp availability): suppliers that moved
    // more than 300 units of 'red' parts in 1997. Grid-rounded HAVING
    // keeps the threshold comparison engine-identical.
    Q("q20_promotion_suppliers",
      (s, dir) => {
        val shipped = Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= "1997-01-01" && col("l_shipdate") < "1998-01-01")
          .join(broadcast(Tables.part(s, dir)
            .filter(col("p_name").like("red%")).select("p_partkey")),
            col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey")
          .agg(round(sum("l_quantity"), 2).as("shipped_qty"))
          .filter(col("shipped_qty") > 300.0)
        Tables.supplier(s, dir)
          .join(broadcast(shipped), col("s_suppkey") === col("l_suppkey"))
          .select("s_suppkey", "s_name", "shipped_qty")
      },
      Some("""SELECT s_suppkey, s_name, shipped_qty
        |FROM supplier
        |JOIN (SELECT l_suppkey, round(sum(l_quantity), 2) AS shipped_qty
        |      FROM lineitem JOIN part ON l_partkey = p_partkey
        |      WHERE p_name LIKE 'red%'
        |        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |      GROUP BY 1
        |      HAVING round(sum(l_quantity), 2) > 300.0) q
        |  ON s_suppkey = l_suppkey""".stripMargin)),

    // J2-style broadcast dimension join: revenue by brand.
    Q("j2_brand_revenue",
      (s, dir) => Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("revenue"),
          count(lit(1)).as("n_items")),
      Some("""SELECT p_brand,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand""".stripMargin))
  )
}
