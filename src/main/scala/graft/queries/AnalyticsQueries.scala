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
