package graft

/** Whole-surface plan hygiene: no registered query may plan a
  * CartesianProduct — every pair-producing path must go through a bounded
  * bucket/block/broadcast join (the 100-TB discipline the operator docs
  * claim, asserted here for all of them at once). Building the physical
  * plan executes any plan-time constant folding (k-means fits, bucketed
  * writes, streaming drains), so this runs at sf0.001.
  */
class PlanHygieneSpec extends SparkSpec {

  // Why CartesianProduct and not also BroadcastNestedLoopJoin: a sweep run
  // against BNLJ flagged 44 queries, ALL of them deliberate bounded
  // fan-outs — generator grids (crossJoin of tiny spark.range sides: every
  // (series, t) pair MUST exist, that cross product is the operator's
  // semantics) and the brute-force ANN baseline (bounded 100-query side
  // broadcast against the partitioned corpus, the declared ground-truth
  // path). BNLJ with a literal/range broadcast side is O(n·k) with k a
  // plan-time constant — not a scale cliff. CartesianProduct is the planner
  // telling us NEITHER side was broadcastable: that is the unbounded
  // data×data explosion this spec exists to ban.
  test("no registered query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  /** No `broadcast()` hint may sit on a subtree whose row count scales with
    * base-table rows (VERDICT r8 findings #1/#2: a corpus-sized pivot and
    * user-sized norms were hint-broadcast — correct at sf0.1, OOM at 100×).
    * Planner/AQE-chosen broadcasts are size-adaptive and safe by definition;
    * the structural hazard is exactly the EXPLICIT hint, which forces the
    * exchange at any scale. Sweep: every ResolvedHint(BROADCAST) child in
    * every registered query's analyzed plan must be plan-time bounded —
    *   (a) a Limit somewhere in the subtree (top-k panels, query samples),
    *   (b) a grand-total aggregate (groupingExpressions.isEmpty — 1-row
    *       stats, thresholds),
    *   (c) a literal upper bound on an `*_id` column (the `vec_id < 100`
    *       ANN query-panel convention),
    *   (d) no fact-table scan and no checkpointed RDD among its leaves
    *       (dimension tables, spark.range grids, literal schedules) —
    *       LogicalRDD is treated as fact-like because localCheckpoint erases
    *       provenance, so anything derived from a checkpoint must re-bound
    *       itself via the other rules,
    *   (e) an Aggregate or Deduplicate whose keys are all VOCABULARY-shaped
    *       (no `*_id`/`*key` attribute): event types, words, labels, score
    *       grids, days — key spaces bounded by the domain, not by row count.
    *       An id-keyed aggregate keeps one row per ENTITY and entities scale
    *       with the data, so ids disqualify,
    * or the query is in the documented whitelist below.
    */
  test("no broadcast hint on a subtree that scales with base-table rows") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

    val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
    // Broadcast panels the rules above cannot see structurally but whose
    // bound is by construction. Each entry names why. (Keep this list SHORT:
    // a new offender should first try to express its bound via (a)-(e).)
    val whitelist: Map[String, String] = Map(
      // itemN / deg: one row per part (catalog entity) of the co-purchase
      // graph — bounded by the catalog, keyed by p/node/u (id-shaped)
      "items_cf_topk" -> "item marginals keyed by p_partkey (catalog)",
      "graph_degree_stats" -> "degree table keyed by part node (catalog)",
      "graph_link_predict" -> "degree table keyed by part node (catalog)",
      // Misra-Gries candidates: ≤ k × partitions rows by construction,
      // though keyed (deduped) by user_id
      "events_heavy_hitters" -> "MG summary bounded by k x partitions",
      // checkpointed plan-time constants (LogicalRDD hides the bound):
      // type×hash-grid for LDP, driver-fitted BPE merge list
      "events_ldp_freq" -> "checkpointed type x hash-grid constants",
      "text_bpe_apply" -> "checkpointed BPE merge table (vocab budget)",
      // per-iteration checkpointed rank vector: one row per part (catalog),
      // keyed by node id — the checkpoint erases the grand-total-n bound
      "graph_pagerank" -> "checkpointed rank vector keyed by part (catalog)"
    )

    def isBoundedIdCap(e: Expression): Boolean = e.exists {
      // analysis wraps the literal in a Cast, so match any foldable bound
      case LessThan(a: AttributeReference, r) => r.foldable && a.name.endsWith("_id")
      case LessThanOrEqual(a: AttributeReference, r) => r.foldable && a.name.endsWith("_id")
      case _ => false
    }
    def idShaped(name: String): Boolean =
      name.endsWith("_id") || name.endsWith("key") || name == "qid" || name == "vid"
    def vocabKeyed(keys: Seq[Expression]): Boolean =
      keys.nonEmpty && keys.forall(_.references.forall(a => !idShaped(a.name)))
    def factLeafy(p: LogicalPlan): Boolean = p.collectLeaves().exists {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          val name = h.location.rootPaths.headOption.map(_.getName).getOrElse("")
          factTables.exists(name.startsWith)
        case _ => true // unknown relation kind: conservative
      }
      case _: LogicalRDD => true // checkpoint erased provenance: conservative
      case _ => false // Range / LocalRelation / OneRowRelation
    }
    def bounded(p: LogicalPlan): Boolean = {
      val capped = p.collectFirst {
        case _: GlobalLimit => ()
        case _: LocalLimit => ()
        case a: Aggregate if a.groupingExpressions.isEmpty || vocabKeyed(a.groupingExpressions) => ()
        case d: Deduplicate if vocabKeyed(d.keys) => ()
        case f: Filter if isBoundedIdCap(f.condition) => ()
      }.nonEmpty
      capped || !factLeafy(p)
    }

    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (whitelist.contains(name)) None
      else {
        val analyzed = fn(spark, sf).queryExecution.analyzed
        val unbounded = analyzed.collectWithSubqueries {
          case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) && !bounded(h.child) => h
        }
        if (unbounded.nonEmpty) Some(s"$name (${unbounded.size})") else None
      }
    }
    assert(offenders.isEmpty, s"unbounded broadcast hints in: $offenders")
    // every whitelist entry must still exist — stale entries hide regressions
    val stale = whitelist.keys.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"stale whitelist entries: $stale")
  }

  /** No registered query may put a whole fact-scale series in ONE window
    * task: a Window whose partition keys are all drawn from a known
    * low-cardinality VOCABULARY column (event_type — 5 values at any scale)
    * over input that descends from a fact scan with no intervening
    * Aggregate/Limit sorts ~20% of the fact table in a single task (the
    * VERDICT r9 `weak`: `trendedOf`'s per-key moving average measured 47.8 s
    * at sf10 while its block-parallel form reads ~9 s). The r10 fix block-
    * decomposes those windows ([[graft.operators.EventsOps.series]] /
    * `trendedOf`); this sweep makes reintroducing the old shape structurally
    * impossible, the same move as the broadcast sweep above. An Aggregate or
    * Limit between the window and the scan bounds the rows (per-key spectra,
    * count tables), so those windows stay legal; LogicalRDD leaves are
    * fact-like because localCheckpoint erases provenance.
    */
  test("no vocabulary-partitioned window directly over fact-scale input") {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

    // every known low-cardinality VOCABULARY column across the fixture
    // tables, not just the one that already bit (VERDICT r10 #5): events'
    // event_type (5 values), documents' lang/source (handfuls), media `kind`
    // (3), embeddings' label (glyph classes) — a window partitioned solely by
    // any of these puts ~1/|vocab| of the fact table in one task at any scale
    val vocabCols = Set("event_type", "lang", "source", "kind", "label")
    val factTables = Seq("lineitem", "orders", "events", "documents", "embeddings")
    def factLeaf(p: LogicalPlan): Boolean = p match {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation =>
          val name = h.location.rootPaths.headOption.map(_.getName).getOrElse("")
          factTables.exists(name.startsWith)
        case _ => true
      }
      case _: LogicalRDD => true
      case _ => false
    }
    // true iff some path from p down to a fact-like leaf crosses no
    // row-bounding operator
    def unboundedFactBelow(p: LogicalPlan): Boolean = p match {
      case _: Aggregate | _: Deduplicate | _: GlobalLimit | _: LocalLimit => false
      case l if l.children.isEmpty => factLeaf(l)
      case _ => p.children.exists(unboundedFactBelow)
    }
    // rank-filter ≤ k windows plan a WindowGroupLimit (per-partition k-row
    // heaps — the bound the top-k sweep below asserts for each entry here),
    // so the vocab partition key is k-bounded despite the fact-scale input
    val whitelist = Set("emb_class_sample")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(kv => whitelist(kv._1)).flatMap { case (name, fn) =>
      val bad = fn(spark, sf).queryExecution.analyzed.collectWithSubqueries {
        case w: Window
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references).nonEmpty &&
            w.partitionSpec.flatMap(_.references).forall(a => vocabCols(a.name)) &&
            unboundedFactBelow(w.child) => w
      }
      if (bad.nonEmpty) Some(s"$name (${bad.size})") else None
    }
    assert(offenders.isEmpty, s"vocab-partitioned fact-scale windows in: $offenders")
    // every whitelist entry must still exist — stale entries hide regressions
    val stale = whitelist.filterNot(SparkEntry.queries.contains)
    assert(stale.isEmpty, s"stale vocab-window whitelist entries: $stale")
  }

  /** Top-k rank filters must plan a WindowGroupLimit: Catalyst rewrites
    * `row_number().over(w) <= k` into a per-partition group-limit BEFORE the
    * window sort, so each map task keeps only k rows per key instead of
    * shuffling and sorting every scored row — at 100 TB the difference
    * between a bounded heap per task and a full sort of the candidate set.
    * A refactor that hides the rank filter behind a non-pushable expression
    * would silently lose this; asserting the physical plan keeps it loud.
    */
  test("top-k rank filters push down to WindowGroupLimit") {
    // emb_class_sample is ALSO the justification for its vocab-window
    // whitelist entry above: the per-label sort must stay k-bounded
    val topk = Seq("ann_bruteforce_topk", "ann_sq8_topk", "ann_pq_topk",
      "ann_bq_topk", "ts_topk_bins", "top_customers_per_nation", "text_zipf_fit",
      "emb_class_sample")
    val bad = topk.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      if (!plan.contains("WindowGroupLimit")) Some(name) else None
    }
    assert(bad.isEmpty, s"no WindowGroupLimit in: $bad")
  }

  /** Dimension-side joins must stay broadcast: a dim that silently outgrows
    * `spark.sql.autoBroadcastJoinThreshold` (or a hint lost in a refactor)
    * would fall back to a full SortMergeJoin — correct results, but a shuffle
    * of the FACT table that costs hours at 100 TB. Asserting the physical
    * plan keeps that regression loud. (events_bucketed_join is the deliberate
    * exception: its exchange-free SMJ is asserted by OperatorSpecs.)
    */
  test("dimension joins plan a BroadcastHashJoin") {
    val mustBroadcast = Seq(
      "tpch_q3",            // customer (dim) ⋈ orders ⋈ lineitem
      "tpch_q5",            // region/nation/customer/supplier dims ⋈ facts
      "revenue_rollup",     // nation/region dims ⋈ orders rollup
      "diff_qsample",       // J1 schedule gather: 500-row schedule ⋈ states
      "class_embed_lookup", // J2 embedding-table lookup
      "label_family_map",   // J3 label→family dim map
      "tpch_q10",           // customer/nation dims ⋈ the returns join
      "tpch_q16",           // bad-supplier anti-join + part dim
      "tpch_q21",           // supplier dim ⋈ the flagged pairs
      "tpch_q2",            // part/supplier/nation dims ⋈ the min-cost pairs
      "tpch_q9",            // part/supplier/nation arms ⋈ the profit star
      "tpch_q15",           // 1-row max + supplier dim ⋈ the revenue view
      "tpch_q20",           // part filter + supplier dim ⋈ the pair aggs
      "graph_pagerank")     // rank vector broadcasts; the edge table never shuffles
    // (events_asof_join is deliberately absent: its whole point is that the
    // as-of is a union + LOCF window with NO join operator in the plan)
    val bad = mustBroadcast.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      if (!plan.contains("BroadcastHashJoin")) Some(name) else None
    }
    assert(bad.isEmpty, s"no BroadcastHashJoin in: $bad")
  }

  /** Global orderBy+limit must plan as TakeOrderedAndProject (per-partition
    * size-K heaps merged at the driver) — a refactor that drops the limit
    * under the sort would silently become a full global Sort, the
    * sort-the-world shape these operators exist to avoid.
    */
  test("global top-k plans TakeOrderedAndProject, not a global sort") {
    val mustTakeOrdered = Seq(
      "events_weighted_sample", // A-ES weighted draw: top-K smallest keys
      "graph_pagerank",         // top-100 ranks
      "market_basket_pairs",    // top-50 by support
      "text_pmi_collocations",  // top-50 by PMI
      "events_session_paths",   // top-20 session paths
      "tpch_q18")               // top-100 orders
    val bad = mustTakeOrdered.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      if (!plan.contains("TakeOrderedAndProject")) Some(name) else None
    }
    assert(bad.isEmpty, s"no TakeOrderedAndProject in: $bad")
  }
}
