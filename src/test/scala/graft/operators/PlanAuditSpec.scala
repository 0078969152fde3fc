package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audit: the properties that make these queries survive a
  * 100 TB / 1000-executor scale-up, asserted on the actual executed plans.
  * A query can be value-correct and still scale-broken (full scan instead
  * of pushdown, shuffle instead of broadcast) — this spec pins the plan
  * shape so regressions surface as test failures.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.executedPlan.toString()
  }

  test("filters are pushed to the parquet scan (s1_scan_filter)") {
    val p = plan("s1_scan_filter")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"filter not pushed:\n$p")
  }

  test("column pruning reaches the scan: projection reads 4 of 11 columns") {
    val p = plan("s1_scan_filter")
    // ReadSchema must contain only the used columns
    assert(p.contains("l_orderkey") && !p.contains("l_shipdate"),
      s"scan reads unused columns:\n$p")
  }

  test("point lookup pushes an EqualTo on the first (pk-convention) column") {
    val p = plan("s2_point_lookup")
    assert(p.contains("EqualTo(l_orderkey,100)"), s"no pushed EqualTo:\n$p")
  }

  test("AQL arithmetic predicates stay codegen'd with a pruned scan") {
    // col-vs-expression predicates can't reach parquet PushedFilters, but
    // they must remain a codegen'd Filter over a column-pruned scan —
    // never a UDF, never a full-width read
    val p = plan("aql_where_arith")
    assert(!p.contains("BatchEvalPython") && !p.contains("UDF"),
      s"arithmetic predicate left codegen:\n$p")
    assert(p.contains("l_extendedprice") && !p.contains("l_shipdate") &&
      !p.contains("l_comment"),
      s"scan reads columns the query never touches:\n$p")
    // the IsNotNull guards DO push down, pruning all-null row groups
    assert(p.contains("PushedFilters: [IsNotNull("),
      s"null guards not pushed:\n$p")
  }

  test("literal IN lists push an In filter to the parquet scan") {
    val p = plan("aql_search_in_list")
    assert(p.contains("In(lang, [de,en])") || p.contains("In(lang,[de,en]"),
      s"IN list not pushed to the scan:\n$p")
  }

  test("dimension join broadcasts (x_join_broadcast_dim)") {
    val p = plan("x_join_broadcast_dim")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact table should not sort-merge with a dim:\n$p")
  }

  test("multiway join: dims broadcast; the fact⋈fact join is a zero-exchange bucket merge") {
    val p = plan("x_join_multiway")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    // exactly ONE dim broadcast: the whole nation⋈region chain is
    // flattened onto customer at ingest (Tables.customerGeo), so the
    // query-time critical path carries a single pruned-customer build —
    // no dim-chain joins left to find in the plan
    assert(broadcasts >= 1, s"the customer dim should broadcast:\n$p")
    assert(!p.contains("nation.parquet") && !p.contains("region.parquet"),
      s"the dim chain must be resolved at ingest, not in-plan:\n$p")
    // both facts come from the orderkey-bucketed projection: the join is
    // a co-partitioned per-bucket HASH join — no Sort on either fact
    // input (the merge form re-sorted both inside the stage) — and the
    // ONLY hash exchanges left are the aggregation's partial→final (on
    // n_name), never a fact-key shuffle
    assert(p.contains("ShuffledHashJoin"),
      s"fact⋈fact should be the sort-free bucket hash join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the re-sorting merge form must not come back:\n$p")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed fact⋈fact join must not shuffle on the join key:\n$p")
  }

  test("top-orders: pre-agg and fact⋈fact join ride the bucketed layout (no key shuffle)") {
    val p = plan("x_join_top_orders")
    assert(!p.contains("Exchange hashpartitioning(l_orderkey") &&
      !p.contains("Exchange hashpartitioning(o_orderkey"),
      s"orderkey shuffle survived despite the bucketed projection:\n$p")
  }

  test("raw-table join twins: fact edges shuffle-hash, only fixed-size dims broadcast") {
    // the raw twins measure execution over the UNDERIVED layout — their
    // fact⋈fact edges legitimately shuffle on the join keys (that is the
    // layout cost the ETL projections remove), but they must stay
    // scale-safe: hash joins with the filtered/narrower side as build
    // (no data-sized broadcast, no re-sorting merge form)
    val pTop = plan("x_join_top_orders_raw")
    assert(pTop.contains("ShuffledHashJoin"),
      s"raw top-orders fact edges should be shuffled hash joins:\n$pTop")
    assert(!pTop.contains("SortMergeJoin"),
      s"raw top-orders must not pay the re-sorting merge form:\n$pTop")
    assert(!pTop.contains("BroadcastHashJoin"),
      s"every side of raw top-orders is data-sized — nothing may broadcast:\n$pTop")
    val pMulti = plan("x_join_multiway_raw")
    // exactly the two FIXED-size dim builds broadcast (region onto
    // nation, the 25-row asia chain onto customer); orders and lineitem
    // edges are shuffled hash joins
    val broadcasts = "BroadcastHashJoin".r.findAllIn(pMulti).length
    assert(broadcasts == 2,
      s"expected exactly the nation⋈region and customer dim broadcasts:\n$pMulti")
    assert("ShuffledHashJoin".r.findAllIn(pMulti).length == 2,
      s"orders and lineitem edges should both be shuffled hash joins:\n$pMulti")
    assert(!pMulti.contains("SortMergeJoin"),
      s"raw multiway must not pay the re-sorting merge form:\n$pMulti")
  }

  test("full outer join never broadcasts (both sides produce unmatched rows)") {
    val p = plan("x_join_full_outer")
    assert(p.contains("FullOuter"), s"expected a full-outer join:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"full outer must not broadcast — unmatched build-side rows would need " +
        s"per-executor dedup at scale:\n$p")
  }

  test("global top-k plans as TakeOrderedAndProject, never a full sort (x_topk)") {
    val p = plan("x_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("aggregation is partial (map-side combine) before the exchange") {
    val p = plan("x_agg_pricing_summary")
    val hashAggs = "HashAggregate".r.findAllIn(p).length
    assert(hashAggs >= 2, s"expected partial+final HashAggregate:\n$p")
    assert(p.contains("partial_sum"), s"no map-side combine before exchange:\n$p")
  }

  test("FUSE: side scans prune to query terms; the fused ranking ends in TakeOrderedAndProject") {
    // the hybrid statement's 100 TB shape: the BM25 side reads only its
    // literal terms' postings (pushed In filter — lookup cost ∝ the
    // terms' document frequency, never the corpus), the ivf side only
    // its probed cells, and the final (rrf desc, pk) LIMIT lowers to
    // TakeOrderedAndProject — never a full sort. Side ranks are windows
    // over LIMIT-bounded side results, so no data-sized exchange exists
    // anywhere in the fusion itself.
    val df = SparkEntry.queries("aql_fuse_rrf")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("TakeOrderedAndProject"),
      s"fused top-k must not be a full sort:\n$p")
    assert(p.contains("In(term"),
      s"BM25 side must prune postings to the literal query terms:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unconstrained product anywhere in the fusion:\n$p")
  }

  test("SHOW DEDUP: candidates ride a shuffle-hash band self-join over the index — never all-pairs") {
    // the funnel's 100 TB shape: candidate pairs come from the persisted
    // band table joined to itself on (band, bk) — a pinned shuffle-hash
    // equi-join whose exchange carries (band, bk, id), never text, and
    // never a cartesian candidate product; the 1-row report dimensions
    // combine via broadcast loop joins (cardinality-1 sides).
    // Round 17: the statement MATERIALIZES the id-only pairs once
    // (localCheckpoint), so the self-join lives in the checkpoint's
    // lineage — pinned via the EXPLAIN plan (the lazy verify composition
    // over the same funnel) — and under the bounded-pairs driver path
    // the SERVED summary is ONE corpus scan (the fused md5 group-by)
    // plus driver-side dimensions: no re-derived funnel, no join at all.
    val eng = AqlQueries.engine(spark, dir)
    val explained = eng.execute("EXPLAIN SHOW DEDUP docs_ft USING nd") match {
      case graft.aql.Engine.Done(text) => text
      case other => fail(s"unexpected EXPLAIN result $other")
    }
    assert(explained.contains("ShuffledHashJoin"),
      s"band self-join must be the pinned shuffle-hash equi-join:\n$explained")
    assert(!explained.contains("CartesianProduct"),
      s"no all-pairs product anywhere in the funnel:\n$explained")
    val df = SparkEntry.queries("aql_show_dedup")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"served summary must scan the corpus exactly once (fused " +
        s"n_docs/exact_dup group-by) with driver-side dimensions:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs product anywhere in the served summary:\n$p")
  }

  test("SHOW OVERLAP: each side partial-aggregates to a sketch before the exchange") {
    // the statement's 100 TB shape: per-partition theta sketches (KB)
    // cross the exchange, never rows — the plan must show partial+final
    // ObjectHashAggregate on both scan subtrees, and the pair combine is
    // a 1×1 cross join (cardinality-1 sides, not a data-sized product)
    val df = SparkEntry.queries("aql_show_overlap")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    val objAggs = "ObjectHashAggregate".r.findAllIn(p).length
    assert(objAggs >= 4, s"expected partial+final sketch aggregates on both sides:\n$p")
    assert(p.contains("partial_theta_sketch_agg"),
      s"no map-side sketch combine before the exchange:\n$p")
  }

  test("SHOW OVERLAP BY: per-group sketches still partial-aggregate before the exchange") {
    // grouped form: KB per (side, group) crosses the exchange — partial
    // sketch agg on both scan subtrees, paired by a group-key join of
    // group-cardinality-sized sides (never a data-sized exchange)
    val df = SparkEntry.queries("aql_show_overlap_by")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    val objAggs = "ObjectHashAggregate".r.findAllIn(p).length
    assert(objAggs >= 4, s"expected partial+final sketch aggregates on both sides:\n$p")
    assert(p.contains("partial_theta_sketch_agg"),
      s"no map-side sketch combine before the exchange:\n$p")
  }

  test("SHOW OVERLAP matrix: one partial sketch agg per source; pair fan-out is broadcast-sized") {
    // the N-way form's 100 TB shape: each source scans ONCE into a
    // partial+final theta agg (KB across its exchange); the pair
    // expansion crossJoins a broadcast N-row index dim and joins
    // sketch-row-sized sides — never a data-sized product
    val df = SparkEntry.queries("aql_show_overlap_matrix")(spark, dir)
    val p = df.queryExecution.executedPlan.toString()
    // scan-ONCE is the 100 TB property: the sketch union is referenced
    // twice (A-side and B-side expansion), so without exchange reuse
    // every source would scan and partial-aggregate twice — pin exactly
    // one scan per source and the ReusedExchange that guarantees it
    assert("Scan parquet".r.findAllIn(p).length == 3,
      s"each of the 3 sources must scan exactly once:\n$p")
    assert(p.contains("ReusedExchange"),
      s"the pair fan-out must reuse the per-source sketch exchanges, " +
        s"not recompute them:\n$p")
    assert("partial_theta_sketch_agg".r.findAllIn(p).length == 3,
      s"one map-side sketch combine per source before the exchange:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"pair fan-out must ride broadcast joins, not a cartesian product:\n$p")
  }

  test("t_bigram_logppl builds bigrams as a projection — no window sort, no self-join") {
    // the adjacent-pair transform must stay a pure Generate/Project over
    // the scan: a lead()-window or positional self-join formulation
    // would add a per-doc sort exchange the projection form avoids
    val p = plan("t_bigram_logppl")
    assert(!p.contains("Window"), s"bigram construction regressed to a window:\n$p")
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).length
    assert(joins <= 2, s"expected only the two corpus-count joins:\n$p")
  }

  test("aggregation stays inside whole-stage codegen") {
    val df = SparkEntry.queries("x_agg_pricing_summary")(spark, dir)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.CodegenMode)
    assert(p.contains("WholeStageCodegen subtree"), s"agg fell out of codegen:\n$p")
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti, not materialized joins") {
    assert(plan("x_semi_join").contains("LeftSemi"))
    assert(plan("x_anti_join").contains("LeftAnti"))
  }

  test("pagination pushes the limit (no full materialization)") {
    val p = plan("s4_pagination")
    assert(p.contains("TakeOrderedAndProject") || p.contains("GlobalLimit"),
      s"offset/limit not pushed:\n$p")
  }

  test("BROADCAST hints sit only on true dimensions; fact sides carry at most MERGE/SHUFFLE_HASH") {
    // An explicit broadcast() hint is honored regardless of runtime size, so
    // a BROADCAST hint on an orders/lineitem-derived side would OOM at
    // cluster scale. MERGE / SHUFFLE_HASH hints on a fact side are the
    // opposite: they pin the zero-exchange bucketed join (per-bucket merge
    // or per-bucket hash build — both bounded by bucket size, safe at any
    // scale) where the local planner's size estimate would otherwise
    // broadcast a fact.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (name <- Seq("x_join_top_orders", "x_join_multiway",
        "x_join_top_orders_raw", "x_join_multiway_raw")) {
      val lp = SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
      val hints = lp.collect { case h: ResolvedHint => h }
      assert(hints.nonEmpty, s"$name: dimension sides should still be hinted")
      hints.foreach { h =>
        val isBroadcast = h.hints.strategy.exists(
          _ == org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
        if (isBroadcast) {
          val leaves = h.child.collectLeaves().map(_.toString).mkString("\n")
          assert(!leaves.contains("orders") && !leaves.contains("lineitem"),
            s"$name: broadcast hint covers a fact table:\n$leaves")
        }
      }
    }
  }

  test("simhash near-dup pairs join on banded keys — equi-join, not O(n²)") {
    val p = plan("dd_simhash_neardup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"banded simhash join degenerated to an all-pairs join:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), s"expected a hash/sort-merge equi-join:\n$p")
  }

  test("minhash-LSH candidate join is an equi-join on (band, bucket-key)") {
    val p = plan("dd_minhash_lsh")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"LSH bucket join degenerated to an all-pairs join:\n$p")
  }

  test("multi-probe near-dup candidates come from equi-joins on both hash families") {
    val p = plan("sim_neardup_multiprobe")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"multi-probe candidate generation degenerated to an all-pairs join:\n$p")
  }

  test("EXISTS-with-aggregate lowers to a semi join over a pre-aggregated side") {
    val p = plan("x_exists_agg_subquery")
    assert(p.contains("LeftSemi"), s"expected a semi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"EXISTS degenerated to a per-row scan:\n$p")
  }

  test("range join is a bucketed equi-join, as-of join is window+equi — no nested loops") {
    for (name <- Seq("e_range_join", "e_asof_join")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name degenerated to an all-pairs join:\n$p")
    }
  }

  test("no inferred generate-filter recomputes the shingle array (dd_minhash_lsh)") {
    // InferFiltersFromGenerate would duplicate the full shingle-transform
    // expression into a Filter and push it below the parallelizing
    // exchange (measured 8.9s -> 0.3s on the sf0.1 explode when excluded —
    // see GraftSession). Pin the exclusion: no Filter node may contain the
    // transform/sequence shingle expression.
    val p = plan("dd_minhash_lsh")
    val filterRecompute = p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("transform(sequence"))
    assert(!filterRecompute, s"shingle expression duplicated into a Filter:\n$p")
  }

  test("decontamination probes via a broadcast of the benchmark gram set") {
    // the eval-suite side is the broadcast dimension; the corpus grams
    // must never sort-merge against it
    val p = plan("t_decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$p")
  }

  test("k-means assignment is a k-row broadcast, not a shuffled cross product") {
    // crossJoin(broadcast(k seeds)) must plan as BroadcastNestedLoopJoin —
    // constant-size build side — never CartesianProduct (which shuffles
    // both sides)
    val p = plan("km_lloyd_assign")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected broadcast seeds:\n$p")
    assert(!p.contains("CartesianProduct"), s"cross product would shuffle the corpus:\n$p")
  }

  test("int8 quantization joins per-dim bounds by broadcast") {
    val p = plan("sim_quantize_int8")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast bounds join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"64-row bounds must not sort-merge:\n$p")
  }

  test("ordered funnel shuffles the events table exactly once (on user_id)") {
    // both windows and the final aggregate share hashpartitioning(user_id)
    // — one Exchange total; a per-stage self-join design would need three
    val p = plan("e_funnel_stages")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly one user_id exchange, got $exchanges:\n$p")
  }

  test("sequence packing plans one window exchange, partitioned by source") {
    val p = plan("t_seq_packing")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected one source-partitioned exchange, got $exchanges:\n$p")
    assert(p.contains("hashpartitioning(source"), s"window must partition by source:\n$p")
  }

  test("unpivot lowers to a single Expand over one scan, not a self-union") {
    val p = plan("x_unpivot")
    assert(p.contains("Expand"), s"expected Expand operator:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"unpivot must read lineitem once, got $scans scans:\n$p")
    assert(!p.contains("Union"), s"unpivot must not plan as a union of scans:\n$p")
  }

  test("z-score anomaly scan broadcasts the per-type moments, never shuffles events rows") {
    val p = plan("e_anomaly_zscore")
    assert(p.contains("BroadcastHashJoin"), s"stats side should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"events rows must not shuffle for the probe:\n$p")
  }

  test("TF-IDF carries no broadcast hint on the corpus-derived df side") {
    // document frequencies are corpus-derived: a hard broadcast hint would
    // OOM at 100 TB vocabulary scale. AQE may still broadcast at runtime —
    // the pin is on the LOGICAL plan carrying no hint for the df join.
    val df = SparkEntry.queries("t_tfidf_top_terms")(spark, dir)
    val logical = df.queryExecution.optimizedPlan.toString()
    val hints = "ResolvedHint".r.findAllIn(logical).length
    // exactly one hint: the one-row corpus count N
    assert(hints <= 1, s"unexpected broadcast hints in:\n$logical")
  }

  test("unigram log-ppl: term-total side is hint-free (corpus-derived vocabulary)") {
    // same stance as TF-IDF: the corpus term-count relation grows with the
    // corpus — only the one-row grand total may carry a hint.
    val df = SparkEntry.queries("t_unigram_logppl")(spark, dir)
    val logical = df.queryExecution.optimizedPlan.toString()
    assert("ResolvedHint".r.findAllIn(logical).length <= 1,
      s"corpus-derived side must stay hint-free:\n$logical")
  }

  test("OOV rate probes through a broadcast of the rank-bounded vocabulary") {
    // the top-1000 vocab is bounded regardless of corpus size — a true
    // dimension; the token stream must not shuffle for the membership probe
    val p = plan("t_oov_rate")
    assert(p.contains("BroadcastHashJoin"), s"vocab should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"token stream must not shuffle for the vocab probe:\n$p")
  }

  test("rolling 1h window shuffles once on event_type, no self-join") {
    val p = plan("e_rolling_1h")
    assert(!p.contains("Join"), s"rolling window must not self-join:\n$p")
    assert("hashpartitioning\\(event_type".r.findAllIn(p).length >= 1,
      s"window must partition by event_type:\n$p")
  }

  test("price histogram aggregates map-side before one tiny exchange") {
    val p = plan("x_histogram_price")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"histogram must partial-aggregate:\n$p")
    assert("Exchange".r.findAllIn(p).length <= 2, // bucket agg + final sort
      s"histogram should need at most bucket + order exchanges:\n$p")
  }

  test("PII scrub is a pure projection: no exchange, no join") {
    val p = plan("t_pii_scrub")
    assert(!p.contains("Join"), s"pii scrub must not join:\n$p")
    // only the ORDER BY may add an exchange
    assert("Exchange".r.findAllIn(p).length <= 1,
      s"pii scrub should scan + project only:\n$p")
  }
}
