package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics extensions beyond reference parity (SURVEY.md §2.4: the
  * reference has no joins/aggs/windows/sorts — these are the north-star
  * additions, designed Spark-first).
  *
  * Determinism/oracle notes: money sums are `round(...,2)` in BOTH engines
  * because double summation order differs between Spark's partial
  * aggregation tree and DuckDB's; `l_quantity` sums are exact (integral
  * doubles). Every output carries a total ORDER BY on a unique key with
  * explicit NULLS FIRST in the oracle (Spark's ascending default).
  *
  * Scale notes (100 TB):
  *  - Dimension joins (region/nation/customer/supplier/part) are
  *    broadcast — no shuffle of the fact table.
  *  - Fact-fact joins (lineitem⋈orders) shuffle on the join key; at
  *    cluster scale both sides would be bucketed by orderkey to make this
  *    a zero-exchange sort-merge join. AQE handles skew splitting.
  *  - GroupBys rely on partial (map-side) aggregation; the exchange only
  *    carries one row per (partition, group).
  *  - Top-k = orderBy+limit → TakeOrderedAndProject (per-partition heap,
  *    never a global sort).
  */
object Analytics {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val defs: Seq[Q] = Seq(

    // TPC-H Q1-flavor scan-heavy aggregation: partial agg before exchange;
    // 4 groups total so the shuffle is negligible at any scale.
    Q("x_agg_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |       sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin, bench = true) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-09-01 00:00:00")))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // Exact distinct + order-stat aggregates (no float arithmetic → exact).
    Q("x_agg_distinct_stats",
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       min(l_shipdate) AS first_ship,
        |       max(l_shipdate) AS last_ship,
        |       max(l_extendedprice) AS max_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("n_orders"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            min(col("l_shipdate")).as("first_ship"),
            max(col("l_shipdate")).as("last_ship"),
            max(col("l_extendedprice")).as("max_price"))
          .orderBy(col("l_returnflag"))
    },

    // HAVING: post-aggregation filter.
    Q("x_agg_having",
      """SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("spend"))
          .filter(col("n") >= 12)
          .orderBy(col("o_custkey"))
    },

    // ROLLUP: hierarchical subtotals. Sums are exact (integral doubles).
    Q("x_rollup",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // CUBE: all grouping combinations.
    Q("x_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },

    // Per-group top-k through the CUSTOM whole-operator path
    // (graft.plans.TopKPerGroup: logical node → TopKStrategy → two-phase
    // heap exec via SparkSessionExtensions) — k best rows per group with a
    // bounded heap per (partition, group) BEFORE the exchange, instead of
    // the window form's full per-group sort. The oracle expresses the same
    // semantics with row_number; the total (price, key) order makes both
    // deterministic.
    Q("x_topk_per_group",
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t WHERE rn <= 3
        |ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""".stripMargin) {
      (s, dir) =>
        graft.plans.TopK.perGroup(
          t(s, dir, "orders")
            .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")),
          Seq("o_orderpriority"),
          Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
          .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
    },

    // Arbitrary GROUPING SETS (the general form rollup/cube specialize) +
    // grouping_id disambiguating which set produced each row — without it
    // a stored NULL key and a superaggregate NULL are indistinguishable.
    // One Expand over one scan, partial-aggregated like any group-by.
    Q("x_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_linestatus")), Seq.empty),
            col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("long").as("gid"),
            sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
          .orderBy(col("gid"),
            col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
    },

    // Broadcast dim join: part is a dimension → broadcast, fact never shuffles.
    Q("x_join_broadcast_dim",
      """SELECT p_brand, sum(l_quantity) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin, bench = true) {
      (s, dir) =>
        t(s, dir, "lineitem")
          .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(col("l_quantity")).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("revenue"),
            count(lit(1)).as("n"))
          .orderBy(col("p_brand"))
    },

    // TPC-H Q3-flavor: fact-fact shuffle join + broadcast dim filter + top-k
    // on rounded revenue (rounded in both engines so ordering agrees).
    Q("x_join_top_orders",
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin, bench = true) {
      (s, dir) => {
        // aggregation pushed BELOW the join: revenue per order is computed
        // on the fact table first (the final grouping is per-orderkey, so
        // the summand sets — and the rounded totals — are identical), then
        // the join moves one row per order instead of one per lineitem.
        // Both facts come from orderkey-BUCKETED projections: the
        // pre-aggregation inherits the bucket partitioning (no exchange)
        // and the fact⋈fact join is co-partitioned (no exchange). The
        // segment filter reads the INGEST-FLATTENED orders_mkt projection
        // (Tables.ordersMkt — c_mktsegment landed on the orders row at
        // ETL time), so the plan has NO broadcast build wave at all: one
        // pushed-filter bucketed scan per fact, one merge join — at
        // 100 TB this removes the two largest shuffles AND the dim-build
        // dispatch round-trip.
        val revenue = Tables.bucketed(s, dir, "lineitem", "l_orderkey")
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        val buildingOrders = Tables.ordersMkt(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        // buildingOrders is ORDERS-DERIVED (a fact side): no broadcast hint —
        // an explicit broadcast would OOM at scale. Instead the fact⋈fact
        // join carries a SHUFFLE_HASH hint: both sides are co-partitioned
        // on the bucket key, so it plans as a per-bucket HASH join with
        // zero exchange at any scale — and unlike the merge form it needs
        // NO Sort on either side (the pre-aggregation destroys the
        // lineitem side's bucket order, so SMJ re-sorted both inputs —
        // measured ~25% of the stage CPU). The build side is the
        // segment-FILTERED orders slice of one bucket; bucket count is a
        // layout knob that scales with the data, so the per-bucket build
        // stays executor-memory-bounded at 100 TB exactly like any
        // shuffled hash join's partition. Without a hint the local
        // planner's size estimate picks a broadcast of a fact-derived side.
        revenue.join(buildingOrders.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }
    },

    // TPC-H Q5-flavor multi-way join: 4 broadcast dims + 1 fact-fact shuffle.
    Q("x_join_multiway",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin, bench = true) {
      (s, dir) => {
        // star-schema dim flattening, done at INGEST: geography lands on
        // the customer row (Tables.customerGeo — customer ⋈ the fixed
        // 25×5 nation⋈region dim, a one-time linear-cost layout
        // decision), so the region-filtered customer dim is a single
        // pruned scan and the query pays exactly ONE broadcast-build
        // wave — no dim chain on the critical path at all (each build
        // wave costs ~50 ms of dispatch floor locally and a scheduling
        // round trip on a cluster). The broadcast ships only
        // (c_custkey, n_name).
        val asiaCust = Tables.customerGeo(s, dir)
          .filter(col("r_name") === "ASIA")
          .select(col("c_custkey"), col("n_name"))
        // facts from the orderkey-bucketed projection: the broadcast dim
        // join preserves the streamed side's bucket partitioning, so the
        // fact⋈fact join below is co-partitioned. The SHUFFLE_HASH hint
        // pins the zero-exchange per-bucket HASH join — no Sort on either
        // side (the registered bucketed scans don't surface their sortBy
        // order, so the MERGE form re-sorted both inputs inside the
        // stage); the build side is one bucket's region-filtered orders
        // slice, bounded by the bucket-count layout knob at any scale. An
        // explicit broadcast of either fact-derived side would OOM at
        // 100 TB, and without any hint the local planner's size estimate
        // broadcasts pruned lineitem.
        val custOrders = Tables.bucketed(s, dir, "orders", "o_orderkey")
          .join(broadcast(asiaCust), col("c_custkey") === col("o_custkey"))
          .select(col("o_orderkey"), col("n_name"))
        Tables.bucketed(s, dir, "lineitem", "l_orderkey")
          .join(custOrders.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("n_name"))
      }
    },

    // RAW-TABLE bench twin of x_join_top_orders: the declared 3-way join
    // over the raw tables, no ETL projections — both engines read the
    // same layout, so this query's bench ratio measures EXECUTION alone
    // while the sibling's measures execution+layout (BASELINE.md's
    // bench-layout note). The execution-side choices that any engine can
    // make stay: aggregation pushed below the join (the final grouping
    // is per-orderkey, so the summand sets are identical) and
    // shuffle-hash joins on the two fact⋈fact edges — broadcasting a
    // customer- or orders-derived side would OOM at 100 TB, and a
    // shuffled hash join's per-partition build is executor-bounded.
    Q("x_join_top_orders_raw",
      """SELECT o_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |              JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin, bench = true) {
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        // segment-filtered customer keys build the hash side of the
        // orders join (the smaller side after the 1-in-5 segment cut)
        val buildingOrders = t(s, dir, "orders")
          .join(cust.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val revenue = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        revenue.join(buildingOrders.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }
    },

    // RAW-TABLE bench twin of x_join_multiway: the declared 5-way join
    // over the raw tables. nation (25 rows) and region (5) are FIXED-size
    // dims at any scale — broadcasting them is scale-safe and exactly
    // what the ETL flattening precomputes; customer and orders are data-
    // sized, so their edges are shuffle-hash with the filtered/narrower
    // side as build. The ratio delta vs the sibling is the LAYOUT term.
    Q("x_join_multiway_raw",
      """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin, bench = true) {
      (s, dir) => {
        val asiaNation = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val asiaCust = t(s, dir, "customer")
          .join(broadcast(asiaNation), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))
        val custOrders = t(s, dir, "orders")
          .join(asiaCust.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("n_name"))
        t(s, dir, "lineitem")
          .join(custOrders.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("n_name"))
      }
    },

    // Left outer join with null-producing side.
    Q("x_join_left_outer",
      """SELECT c_custkey, o_orderkey
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_totalprice > 490000
        |WHERE c_custkey < 100
        |ORDER BY c_custkey, o_orderkey NULLS FIRST""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") < 100)
          .join(t(s, dir, "orders"),
            col("c_custkey") === col("o_custkey") && col("o_totalprice") > 490000,
            "left")
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
    },

    // Full outer join: both unmatched sides survive NULL-extended — the
    // reconciliation-report shape (which customers have no orders AND which
    // orders reference missing customers). Restricted to a key slice on
    // each side so both NULL directions actually occur in the fixture;
    // full-outer cannot broadcast (both sides produce unmatched rows), so
    // it plans as a key-shuffle SMJ — the correct shape at any scale.
    Q("x_join_full_outer",
      """SELECT c_custkey, o_orderkey
        |FROM (SELECT * FROM customer WHERE c_custkey < 50) c
        |FULL JOIN (SELECT * FROM orders WHERE o_orderkey < 200) o
        |  ON c_custkey = o_custkey
        |ORDER BY c_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_custkey") < 50)
          .join(t(s, dir, "orders").filter(col("o_orderkey") < 200),
            col("c_custkey") === col("o_custkey"), "full")
          .select(col("c_custkey"), col("o_orderkey"))
          .orderBy(col("c_custkey").asc_nulls_first, col("o_orderkey").asc_nulls_first)
    },

    // Semi join (EXISTS): customers having an open order. Broadcast-able at
    // dim scale; at fact scale it shuffles only distinct keys.
    Q("x_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders").filter(col("o_orderstatus") === "O"),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
    },

    // Anti join (NOT EXISTS): customers with no orders at all.
    Q("x_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer")
          .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
    },

    // Window: per-group top-3 via row_number (rank/dense_rank alongside).
    Q("x_window_rank",
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER w AS rn,
        |         rank() OVER w AS rnk,
        |         dense_rank() OVER w AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3
        |ORDER BY o_orderpriority, rn""".stripMargin, bench = true) {
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"), rank().over(w).as("rnk"),
            dense_rank().over(w).as("drnk"))
          .filter(col("rn") <= 3)
          .orderBy(col("o_orderpriority"), col("rn"))
      }
    },

    // Window: running sum + lag over a stable ordering (quantity is integral
    // → running double sum is exact).
    Q("x_window_running",
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |       sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
        |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
        |       lag(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS prev_qty
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber, l_quantity, running_qty, prev_qty NULLS FIRST""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_quantity"))
        t(s, dir, "lineitem").filter(col("l_orderkey") < 300)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .as("running_qty"),
            lag(col("l_quantity"), 1).over(w).as("prev_qty"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("running_qty"), col("prev_qty").asc_nulls_first)
      }
    },

    // RANGE window frame: value-bounded band (frame membership depends only
    // on the order value, so ties are frame-identical → deterministic).
    Q("x_window_range_frame",
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |       count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderpriority, o_totalprice, o_orderkey""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice"))
          .rangeBetween(-10000L, Window.currentRow)
        t(s, dir, "orders").filter(col("o_orderkey") < 500)
          .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
            count(lit(1)).over(w).as("n_in_band"))
          .orderBy(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      }
    },

    // first/last over an unbounded frame (order-determined values only).
    Q("x_first_last",
      """SELECT DISTINCT l_returnflag,
        |       first_value(l_orderkey) OVER w AS first_key,
        |       last_value(l_orderkey) OVER w AS last_key
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_returnflag""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            first(col("l_orderkey")).over(w).as("first_key"),
            last(col("l_orderkey")).over(w).as("last_key"))
          .distinct()
          .orderBy(col("l_returnflag"))
      }
    },

    // UNION with DISTINCT semantics (vs the reference's append-only union).
    Q("x_union_distinct",
      """SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT c_custkey AS key FROM customer WHERE c_acctbal < 0
        |ORDER BY key""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("key"))
          .union(t(s, dir, "customer").filter(col("c_acctbal") < 0)
            .select(col("c_custkey").as("key")))
          .distinct()
          .orderBy(col("key"))
    },

    // Global top-k: orderBy+limit compiles to TakeOrderedAndProject (heap),
    // never a full sort — the pattern that survives 100 TB.
    Q("x_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin, bench = true) {
      (s, dir) =>
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
    },

    // DISTINCT (exact dedup on low-cardinality pair).
    Q("x_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) {
      (s, dir) =>
        t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
          .distinct().orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // INTERSECT (distinct semantics in both engines).
    Q("x_intersect",
      """SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY key""".stripMargin) {
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("key"))
          .intersect(o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key")))
          .orderBy(col("key"))
      }
    },

    // EXCEPT (distinct semantics in both engines).
    Q("x_except",
      """SELECT c_custkey AS key FROM customer
        |EXCEPT
        |SELECT o_custkey AS key FROM orders
        |ORDER BY key""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").select(col("c_custkey").as("key"))
          .except(t(s, dir, "orders").select(col("o_custkey").as("key")))
          .orderBy(col("key"))
    },

    // Conditional (FILTER-clause) and boolean aggregates in one pass —
    // one partial-agg shuffle carries every branch.
    Q("x_filtered_bool_aggs",
      """SELECT o_orderpriority,
        |       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
        |       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
        |       round(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 2) AS open_value,
        |       bool_and(o_totalprice > 0) AS all_positive,
        |       bool_or(o_totalprice > 400000) AS any_jumbo
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").groupBy(col("o_orderpriority"))
          .agg(
            count(when(col("o_orderstatus") === "O", 1)).as("n_open"),
            count(when(col("o_orderstatus") === "F", 1)).as("n_done"),
            round(sum(when(col("o_orderstatus") === "O", col("o_totalprice"))), 2)
              .as("open_value"),
            bool_and(col("o_totalprice") > 0).as("all_positive"),
            bool_or(col("o_totalprice") > 400000).as("any_jumbo"))
          .orderBy(col("o_orderpriority"))
    },

    // Multiset set ops: EXCEPT ALL / INTERSECT ALL preserve duplicate
    // cardinality (nation keys appear once per matching customer).
    Q("x_except_all",
      """SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT ALL
        |SELECT c_nationkey AS nk FROM customer WHERE c_acctbal < 0
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey").as("nk"))
          .exceptAll(t(s, dir, "customer").filter(col("c_acctbal") < 0)
            .select(col("c_nationkey").as("nk")))
          .orderBy(col("nk"))
    },

    Q("x_intersect_all",
      """SELECT c_nationkey AS nk FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT ALL
        |SELECT c_nationkey AS nk FROM customer WHERE c_acctbal >= 5000
        |ORDER BY nk""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_nationkey").as("nk"))
          .intersectAll(t(s, dir, "customer").filter(col("c_acctbal") >= 5000)
            .select(col("c_nationkey").as("nk")))
          .orderBy(col("nk"))
    },

    // Positional explode: token with its 1-based position (Spark
    // posexplode; DuckDB reconstructs ordinality through a struct-list
    // transform — same rows either way).
    Q("x_posexplode",
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk
        |              FROM documents WHERE doc_id < 20),
        |z AS (SELECT doc_id,
        |        unnest(list_transform(range(1, len(tk) + 1),
        |               i -> struct_pack(pos := i, tok := tk[i]))) AS s
        |      FROM toks)
        |SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.tok AS tok
        |FROM z ORDER BY doc_id, pos""".stripMargin) {
      (s, dir) =>
        Tables.load(s, dir, "documents").filter(col("doc_id") < 20)
          .select(col("doc_id"),
            posexplode(split(lower(col("text")), " ")).as(Seq("pos0", "tok")))
          .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
          .orderBy(col("doc_id"), col("pos"))
    },

    // Correlated scalar subquery (per-row count) — decorrelates to a
    // left join against the pre-aggregated counts.
    Q("x_correlated_count",
      """SELECT c_custkey,
        |       (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        |FROM customer WHERE c_custkey < 200
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) => {
        val counts = t(s, dir, "orders")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
        t(s, dir, "customer").filter(col("c_custkey") < 200)
          .join(counts, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
          .orderBy(col("c_custkey"))
      }
    },

    // Uncorrelated scalar subquery: compare each row against a global
    // aggregate (Catalyst plans the subquery once and broadcasts the
    // scalar — no per-row re-evaluation).
    Q("x_scalar_subquery",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) => {
        val o = t(s, dir, "orders")
        val threshold = o.agg(avg(col("o_totalprice")).as("a"))
        o.join(broadcast(threshold), col("o_totalprice") > lit(1.9) * col("a"))
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      }
    },

    // IN-subquery over an aggregate (TPC-H Q18 shape): big-quantity orders.
    // Lowered as a semi join against the pre-aggregated key set — the
    // decorrelated plan Catalyst produces for IN (SELECT … HAVING …).
    Q("x_in_subquery_agg",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING sum(l_quantity) > 220)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) => {
        val bigOrders = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sq"))
          .filter(col("sq") > 220)
          .select(col("l_orderkey"))
        t(s, dir, "orders")
          .join(bigOrders, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      }
    },

    // Scalar-function surface: string/math/date functions in one projection
    // (reference has zero function-call syntax — SURVEY.md §2.4).
    Q("x_scalar_functions",
      """SELECT p_partkey,
        |       upper(p_brand) AS brand_up,
        |       lower(p_type) AS type_lo,
        |       substr(p_name, 1, 5) AS name5,
        |       length(p_name) AS name_len,
        |       replace(p_brand, 'Brand#', 'B') AS brand_short,
        |       concat(p_brand, '/', p_type) AS brand_type,
        |       abs(p_size - 25) AS size_dist,
        |       p_partkey % 7 AS pk_mod,
        |       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |       round(p_retailprice / 100.0, 3) AS price_h
        |FROM part WHERE p_partkey < 500
        |ORDER BY p_partkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "part").filter(col("p_partkey") < 500).select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_up"),
          lower(col("p_type")).as("type_lo"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_name")).as("name_len"),
          regexp_replace(col("p_brand"), "Brand#", "B").as("brand_short"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          abs(col("p_size") - 25).as("size_dist"),
          (col("p_partkey") % 7).as("pk_mod"),
          floor(col("p_retailprice")).as("price_floor"),
          ceil(col("p_retailprice")).as("price_ceil"),
          round(col("p_retailprice") / 100.0, 3).as("price_h")
        ).orderBy(col("p_partkey"))
    },

    // Date/time function surface over order dates.
    Q("x_date_functions",
      """SELECT o_orderkey,
        |       year(o_orderdate) AS yr, month(o_orderdate) AS mo, day(o_orderdate) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |       CAST(o_orderdate AS DATE) AS odate
        |FROM orders WHERE o_orderkey < 300
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 300).select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          col("o_orderdate").cast("date").as("odate")
        ).orderBy(col("o_orderkey"))
    },

    // Regex surface: group extraction, backreference replacement, rlike
    // filtering (Spark uses Java-regex `$1` replacements, DuckDB RE2 `\1` —
    // each side written in its own dialect, same results).
    Q("x_regexp_functions",
      """SELECT p_partkey,
        |       regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
        |       regexp_replace(p_brand, '^Brand#(\d+)$', '\1-B') AS brand_flip,
        |       regexp_matches(p_type, '^[A-Z]+ ') AS type_upper_head
        |FROM part
        |WHERE p_partkey < 400 AND regexp_matches(p_name, '^[a-z]+ ')
        |ORDER BY p_partkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_partkey") < 400 && col("p_name").rlike("^[a-z]+ "))
          .select(
            col("p_partkey"),
            regexp_extract(col("p_brand"), "#(\\d+)", 1).as("brand_num"),
            regexp_replace(col("p_brand"), "^Brand#(\\d+)$", "$1-B").as("brand_flip"),
            col("p_type").rlike("^[A-Z]+ ").as("type_upper_head"))
          .orderBy(col("p_partkey"))
    },

    // Padding / trimming / repetition string surface.
    Q("x_string_pad",
      """SELECT s_suppkey,
        |       lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS key_pad,
        |       rpad(s_name, 30, '.') AS name_pad,
        |       reverse(s_name) AS name_rev,
        |       repeat('ab', 3) AS rep,
        |       translate(s_name, '#0', '-_') AS name_tr,
        |       trim(rpad(s_name, 30, ' ')) AS name_trim
        |FROM supplier ORDER BY s_suppkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "supplier").select(
          col("s_suppkey"),
          lpad(col("s_suppkey").cast("string"), 8, "0").as("key_pad"),
          rpad(col("s_name"), 30, ".").as("name_pad"),
          reverse(col("s_name")).as("name_rev"),
          lit("ab" * 3).as("rep"),
          translate(col("s_name"), "#0", "-_").as("name_tr"),
          trim(rpad(col("s_name"), 30, " ")).as("name_trim")
        ).orderBy(col("s_suppkey"))
    },

    // Window navigation surface: lead/lag defaults, ntile, percent_rank,
    // cume_dist — total order (c_acctbal, c_custkey) keeps both engines
    // aligned on ties.
    Q("x_window_navigation",
      """SELECT c_custkey,
        |       lag(c_custkey, 1, -1) OVER w AS prev_key,
        |       lead(c_custkey, 2, -1) OVER w AS next2_key,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS pr,
        |       round(cume_dist() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) => {
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer").select(
          col("c_custkey"),
          lag(col("c_custkey"), 1, -1).over(w).as("prev_key"),
          lead(col("c_custkey"), 2, -1).over(w).as("next2_key"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd")
        ).orderBy(col("c_custkey"))
      }
    },

    // Correlated EXISTS with an aggregate inside: customers having more
    // than two open orders. Lowered as aggregate-below-semi-join — the
    // EXISTS never materializes per-row subqueries, and the orders agg is
    // partial before its one shuffle.
    Q("x_exists_agg_subquery",
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |              AND o.o_orderstatus = 'O'
        |              GROUP BY o.o_custkey HAVING count(*) > 2)
        |ORDER BY c_custkey""".stripMargin) {
      (s, dir) => {
        val busy = t(s, dir, "orders")
          .filter(col("o_orderstatus") === "O")
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
          .filter(col("n") > 2)
          .select(col("o_custkey"))
        t(s, dir, "customer")
          .join(busy, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      }
    },

    // Struct/map construction + field access. Outputs are scalar fields or
    // stringified (the comparator can't hash nested columns); the nested
    // ops themselves are exercised in both engines.
    Q("x_struct_map_functions",
      """WITH b AS (SELECT n_nationkey,
        |             struct_pack(k := n_name, r := n_regionkey) AS st,
        |             map([n_name], [n_regionkey]) AS m
        |           FROM nation)
        |SELECT n_nationkey,
        |       st.k AS s_name,
        |       st.r + 1 AS r_next,
        |       CAST(map_keys(m)[1] AS VARCHAR) AS mk,
        |       CAST(map_values(m)[1] AS BIGINT) AS mv,
        |       CAST(cardinality(m) AS BIGINT) AS msize
        |FROM b ORDER BY n_nationkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "nation")
          .withColumn("st", struct(col("n_name").as("k"), col("n_regionkey").as("r")))
          .withColumn("m", map(col("n_name"), col("n_regionkey")))
          .select(
            col("n_nationkey"),
            col("st.k").as("s_name"),
            (col("st.r") + 1).as("r_next"),
            element_at(map_keys(col("m")), 1).as("mk"),
            element_at(map_values(col("m")), 1).cast("long").as("mv"),
            size(col("m")).cast("long").as("msize"))
          .orderBy(col("n_nationkey"))
    },

    // Bitwise surface over keys (both engines: two's-complement BIGINT).
    Q("x_bitwise_ops",
      """SELECT o_orderkey,
        |       o_orderkey & 255 AS low_byte,
        |       o_orderkey | 4096 AS with_flag,
        |       xor(o_orderkey, o_custkey) AS key_xor,
        |       o_orderkey << 2 AS shl,
        |       o_orderkey >> 3 AS shr,
        |       CAST(bit_count(o_orderkey) AS INTEGER) AS pop
        |FROM orders WHERE o_orderkey < 600
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "orders").filter(col("o_orderkey") < 600).select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("low_byte"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("with_flag"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("key_xor"),
          shiftleft(col("o_orderkey"), 2).as("shl"),
          shiftright(col("o_orderkey"), 3).as("shr"),
          bit_count(col("o_orderkey")).as("pop")
        ).orderBy(col("o_orderkey"))
    },

    // Null handling: coalesce / nullif / CASE.
    Q("x_null_handling",
      """SELECT c_custkey,
        |       coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
        |       CASE WHEN c_acctbal < 0 THEN 'neg'
        |            WHEN c_acctbal < 5000 THEN 'mid'
        |            ELSE 'high' END AS bal_band
        |FROM customer ORDER BY c_custkey""".stripMargin) {
      (s, dir) =>
        t(s, dir, "customer").select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "mid")
            .otherwise("high").as("bal_band")
        ).orderBy(col("c_custkey"))
    }
  )
}
