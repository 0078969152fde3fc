package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity relational operators, re-expressed Spark-first.
  *
  * TytoDB's whole query surface is scan + filter + union + cursor paging
  * (SURVEY.md §2): `search` at reference `src/query.rs:234-306`, predicate
  * evaluation at `src/query_conditions.rs:255-491`, union at
  * `src/query.rs:86-108`, paging at `src/query.rs:9,110-214`. Each maps to a
  * declarative DataFrame plan so Catalyst gets pushdown/pruning for free —
  * the reference's chunk index (`src/indexing.rs`) is subsumed by parquet
  * row-group min/max statistics.
  *
  * We standardize the reference's quirky semantics (reversed comparison
  * operands Q1, no AND/OR precedence Q2, ignored projection Q3 — SURVEY.md
  * §2.8) to ANSI SQL, which the DuckDB oracle encodes.
  *
  * Scale notes (100 TB): every query here is a single scan + optional
  * shuffle-free filter/project, or an aggregation whose partial (map-side)
  * combine reduces data before the exchange. No driver-side loops; the only
  * `ORDER BY`s are for deterministic verification output and are top-k or
  * small-result sorts in practice.
  */
object Relational {
  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")
  private def cust(s: SparkSession, dir: String) = Tables.load(s, dir, "customer")
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")
  private def part(s: SparkSession, dir: String) = Tables.load(s, dir, "part")

  val defs: Seq[Q] = Seq(

    // S1+P1+P2: full scan, real projection (the reference parses but ignores
    // projection — parser.rs:295-308 vs database.rs:636-698; we implement it),
    // predicate reaches the parquet scan as a pushed filter.
    Q("s1_scan_filter",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem WHERE l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber, l_extendedprice""".stripMargin, bench = true) {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_quantity") > 45)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    },

    // S2: point lookup on the first column (reference: Indexed(Strict) path,
    // query_conditions.rs:541-593). Parquet row-group stats + pushed filter
    // give the same skip-scan behavior with zero custom code.
    Q("s2_point_lookup",
      """SELECT * FROM lineitem WHERE l_orderkey = 100
        |ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice,
        |         l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate""".stripMargin,
      bench = true) {
      (s, dir) => li(s, dir).filter(col("l_orderkey") === 100)
        .orderBy(col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
          col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    },

    // S2: range scan on the first column (reference: Indexed(Range)).
    Q("s2_range_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey >= 100 AND l_orderkey < 200
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin, bench = true) {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_orderkey") >= 100 && col("l_orderkey") < 200)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    // P3: the comparison-operator family =, !=, >, <, >=, <= in one predicate
    // (reference operators Equal/Different/Greater/... query_conditions.rs:59-71,
    // with standard operand order — reference quirk Q1 reverses them).
    Q("p3_compare_ops",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_quantity >= 10 AND l_quantity <= 40 AND l_quantity != 25
        |  AND l_linenumber > 1 AND l_linenumber < 6 AND l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin) {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_quantity") >= 10 && col("l_quantity") <= 40
            && col("l_quantity") =!= 25
            && col("l_linenumber") > 1 && col("l_linenumber") < 6
            && col("l_returnflag") === "A")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    },

    // P3 `&>` StringContains (query_conditions.rs:422-440), standard operand order.
    Q("p3_contains",
      """SELECT doc_id, n_chars FROM documents
        |WHERE text LIKE '%vector%' ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        docs(s, dir).filter(col("text").contains("vector"))
          .select(col("doc_id"), col("n_chars")).orderBy(col("doc_id"))
    },

    // P3 `&&>` case-insensitive contains (query_conditions.rs:441-459).
    Q("p3_icontains",
      """SELECT p_partkey, p_type FROM part
        |WHERE lower(p_type) LIKE '%economy%' ORDER BY p_partkey""".stripMargin) {
      (s, dir) =>
        part(s, dir).filter(lower(col("p_type")).contains("economy"))
          .select(col("p_partkey"), col("p_type")).orderBy(col("p_partkey"))
    },

    // P3 `&&&>` regex match (query_conditions.rs:460-479) — standard direction:
    // column value tested against the pattern.
    Q("p3_regex",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE regexp_matches(o_orderpriority, '^[1-3]-')
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        ord(s, dir).filter(col("o_orderpriority").rlike("^[1-3]-"))
          .select(col("o_orderkey"), col("o_orderpriority")).orderBy(col("o_orderkey"))
    },

    // P4: AND/OR chains. The reference folds gates left-to-right with
    // last-atom-wins and no precedence (quirk Q2, query_conditions.rs:480-490);
    // we use SQL precedence (AND binds tighter), as the oracle does.
    Q("p4_and_or",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity < 5
        |   OR l_returnflag = 'N' AND l_quantity > 48
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin) {
      (s, dir) =>
        li(s, dir)
          .filter(col("l_returnflag") === "R" && col("l_quantity") < 5
            || col("l_returnflag") === "N" && col("l_quantity") > 48)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
    },

    // P5: literal→column-type coercion (reference cast matrix
    // alba_types.rs:116-275 applied to condition literals,
    // query_conditions.rs:115-245). String literal compared to numeric col.
    Q("p5_literal_coercion",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > CAST('400000' AS DOUBLE)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        ord(s, dir).filter(col("o_totalprice") > lit("400000").cast("double"))
          .select(col("o_orderkey"), col("o_totalprice")).orderBy(col("o_orderkey"))
    },

    // §2.3: multi-container union — the reference's only multi-table op
    // (Query::join, query.rs:86-108, appends result pages = UNION ALL).
    Q("j_union_all",
      """SELECT o_orderkey AS okey, o_totalprice AS price FROM orders WHERE o_totalprice > 450000
        |UNION ALL
        |SELECT o_orderkey AS okey, o_totalprice AS price FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY okey, price""".stripMargin, bench = true) {
      (s, dir) => {
        val o = ord(s, dir)
        val a = o.filter(col("o_totalprice") > 450000)
          .select(col("o_orderkey").as("okey"), col("o_totalprice").as("price"))
        val b = o.filter(col("o_orderstatus") === "P")
          .select(col("o_orderkey").as("okey"), col("o_totalprice").as("price"))
        a.unionByName(b).orderBy(col("okey"), col("price"))
      }
    },

    // L4: subquery as virtual container (reference `(SEARCH …)` recursion,
    // main.rs:136-140, database.rs:638-647) — a nested filtered scan unioned
    // with a base scan.
    Q("l4_subquery_union",
      """SELECT c_custkey AS key, c_acctbal AS bal FROM customer WHERE c_acctbal > 9900
        |UNION ALL
        |SELECT * FROM (
        |  SELECT c_custkey AS key, c_acctbal AS bal FROM customer
        |  WHERE c_mktsegment = 'BUILDING' AND c_acctbal < -900)
        |ORDER BY key, bal""".stripMargin) {
      (s, dir) => {
        val c = cust(s, dir)
        val base = c.filter(col("c_acctbal") > 9900)
          .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
        val sub = c.filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") < -900)
          .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
        base.unionByName(sub).orderBy(col("key"), col("bal"))
      }
    },

    // S4/L5: cursor pagination — the reference pages results 100 row-ids at a
    // time (PAGE_SIZE, query.rs:9; QYCNNXT/QYCNPVS database.rs:888-921). Page 3
    // of a deterministically ordered result. Spark's global-sort + limit
    // executes as a TakeOrderedAndProject-style top-k, not a full sort.
    Q("s4_pagination",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity
        |LIMIT 100 OFFSET 200""".stripMargin, bench = true) {
      (s, dir) =>
        li(s, dir)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .offset(200).limit(100)
    },

    // D3 read-side semantics: EDIT ROW overlays new values on matching rows
    // (database.rs:700-766; done correctly, not the reference's shifting
    // Vec::insert bug Q6). Copy-on-write projection: matching rows get the new
    // value, others keep theirs.
    Q("d3_edit_overlay",
      """SELECT o_orderkey,
        |       CASE WHEN o_orderstatus = 'P' THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
        |       CASE WHEN o_orderstatus = 'P' THEN 0.0 ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin) {
      (s, dir) => {
        val p = col("o_orderstatus") === "P"
        ord(s, dir).select(
          col("o_orderkey"),
          when(p, lit("F")).otherwise(col("o_orderstatus")).as("o_orderstatus"),
          when(p, lit(0.0)).otherwise(col("o_totalprice")).as("o_totalprice")
        ).orderBy(col("o_orderkey"))
      }
    },

    // D4 read-side semantics: DELETE ROW ... WHERE pred = keep ¬pred
    // (database.rs:767-813); at commit this is an immutable-parquet rewrite.
    Q("d4_delete_filter",
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 100000)
        |ORDER BY o_orderkey""".stripMargin) {
      (s, dir) =>
        ord(s, dir)
          .filter(!(col("o_orderstatus") === "F" && col("o_totalprice") < 100000))
          .select(col("o_orderkey"), col("o_orderstatus")).orderBy(col("o_orderkey"))
    },

    // §1.2 cast matrix (try_from_existing, alba_types.rs:116-275): numeric↔string
    // ↔bool coercions as one projection.
    Q("t_cast_matrix",
      """SELECT l_orderkey, l_linenumber,
        |       CAST(l_quantity AS INTEGER) AS qty_int,
        |       CAST(l_orderkey AS VARCHAR) AS okey_str,
        |       CAST(l_linenumber AS DOUBLE) AS ln_dbl,
        |       CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip,
        |       (l_quantity > 25) AS qty_gt,
        |       CAST(l_quantity > 25 AS INTEGER) AS qty_gt_int
        |FROM lineitem WHERE l_orderkey < 50
        |ORDER BY l_orderkey, l_linenumber, qty_int""".stripMargin) {
      (s, dir) =>
        li(s, dir).filter(col("l_orderkey") < 50).select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("okey_str"),
          col("l_linenumber").cast("double").as("ln_dbl"),
          col("l_quantity").cast("string").cast("double").as("qty_roundtrip"),
          (col("l_quantity") > 25).as("qty_gt"),
          (col("l_quantity") > 25).cast("int").as("qty_gt_int")
        ).orderBy(col("l_orderkey"), col("l_linenumber"), col("qty_int"))
    }
  )
}
