package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the scale-critical operators must keep
  * their intended physical shapes (no nested-loop joins, partitioned
  * windows, broadcast dims). A future edit that degrades the plan fails
  * here, not at 100 TB.
  */
class PlanShapeSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("temporal joins never fall back to nested-loop") {
    for (q <- Seq("q_asof_join", "q_range_join", "q_exists")) {
      assert(!planOf(q).contains("NestedLoop"), s"$q plan degraded to NestedLoopJoin")
    }
  }

  test("dedup and ANN candidate generation never cross-joins the fact side") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
      "dedup_embedding_cosine", "ann_lsh_topk")) {
      val p = planOf(q)
      assert(!p.contains("CartesianProduct"), s"$q plan contains a CartesianProduct")
    }
  }

  test("event browse seek: the keyset cursor predicate reaches the scan") {
    // formatted mode: the simple plan string truncates scan metadata, so
    // PushedFilters is only visible here
    val p = SparkEntry.queries("cdc_event_browse_seek")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the row-value cursor (ts, event_id) < (literal, literal) must land
    // in PushedFilters — that is the whole point of keyset over OFFSET
    assert(p.contains("PushedFilters: [Or(LessThan(ts,"), s"cursor not pushed:\n$p")
    assert(p.contains("LessThan(event_id,1000000)"), "id tiebreak not pushed")
    assert(p.contains("TakeOrderedAndProject"), "page must be one TakeOrdered pass")
    assert(!p.contains("Exchange hashpartitioning"), "seek page must not shuffle")
  }

  test("audit browse seek: cursor AND facet predicate reach the scan") {
    val p = SparkEntry.queries("cdc_audit_browse_seek")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("EqualTo(event_type,purchase)"), "facet not pushed as source predicate")
    assert(p.contains("Or(LessThan(ts,"), "cursor not pushed")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange hashpartitioning"), "seek page must not shuffle")
  }

  test("log browse seek: cursor AND level facet reach the scan") {
    val p = SparkEntry.queries("cdc_log_browse_seek")(spark, dir)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // the DEBUG level facet rewrites to a NOT-IN on the source column
    assert(p.contains("Not(In(event_type"), "level facet not pushed as source predicate")
    assert(p.contains("Or(LessThan(ts,"), "cursor not pushed")
    assert(p.contains("LessThan(event_id,1000000)"), "id tiebreak not pushed")
    assert(p.contains("TakeOrderedAndProject"), "page must be one TakeOrdered pass")
    assert(!p.contains("Exchange hashpartitioning"), "seek page must not shuffle")
  }

  test("q1 keeps pushdown, pruning, and partial aggregation") {
    val p = planOf("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(!p.contains("l_orderkey"), "scan reads columns q1 does not need")
    assert(p.contains("HashAggregate"))
  }

  test("q5 broadcasts every dimension") {
    val p = planOf("q5_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p).length === 5)
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 1)
  }

  test("top-k uses TakeOrderedAndProject, not a global sort") {
    assert(planOf("q3_topk").contains("TakeOrderedAndProject"))
  }

  test("knn join: AQE picks broadcast for the small query side, no cross-join") {
    val df = SparkEntry.queries("ann_knn_join")(spark, dir)
    df.collect() // run so AQE finalizes the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("knn join stays cartesian-free when the query side cannot broadcast") {
    // at lake scale the query side can exceed the broadcast threshold —
    // simulate by disabling auto-broadcast entirely and assert the
    // bucket-equality join degrades to a shuffled equi-join, never a
    // cartesian/nested-loop scan of corpus × queries
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SparkEntry.queries("ann_knn_join")(spark, dir)
      df.collect() // run so AQE finalizes the adaptive plan
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), "knn join fell back to a cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"), "knn join fell back to nested-loop")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        "bucket join should shuffle on the bucket key when broadcast is off")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("update-diff window is key-partitioned and aggregation is partial") {
    val p = planOf("cdc_update_diff")
    assert(p.contains("Exchange hashpartitioning"))
    assert(p.contains("HashAggregate"))
  }

  test("time travel stays one hash shuffle over the filtered changelog") {
    val p = planOf("cdc_time_travel")
    // high-watermark scalar broadcasts; the state agg is the only wide exchange
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(p.contains("HashAggregate"))
  }

  test("cube/grouping-sets run one Expand, not one scan per level") {
    for (q <- Seq("q_cube", "q_grouping_sets")) {
      assert("Expand".r.findAllIn(planOf(q)).length === 1, s"$q lost its single Expand")
    }
    // single-table cube: grouping levels never add scans
    assert("FileScan".r.findAllIn(planOf("q_cube")).length === 1)
  }

  test("q10 pushes the returnflag filter to the scan and broadcasts dims") {
    val p = planOf("q10_returns")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)"))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2)
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q7 broadcasts both filtered nation sides") {
    val p = planOf("q7_volume")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3) // supplier + n1 + n2
    assert(!p.contains("CartesianProduct"))
  }

  test("quality bins: no unpartitioned window over the corpus, exact ntile parity") {
    val df = SparkEntry.queries("text_quality_bins")(spark, dir)
    // every Window that reads raw (non-aggregated) rows must be partitioned;
    // the only unpartitioned window allowed is the prefix sum over the
    // ≤ numShufflePartitions per-partition count rows (child is an Aggregate)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window over raw rows:\n${bad.mkString("\n")}")
    // distributed rank + bucket formula must reproduce SQL ntile exactly
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // bucketing must be a pure function of the sort key — no SAMPLED range
    // partitioning of the corpus (the output sort over the 10 aggregated
    // decile rows may still range-partition; that one is harmless)
    assert(!df.queryExecution.executedPlan.toString.contains("rangepartitioning(quality_score"),
      "deciles must not rely on sampled range-partition boundaries over the corpus")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(org.apache.spark.sql.functions.col("quality_score"),
        org.apache.spark.sql.functions.col("doc_id"))
    import org.apache.spark.sql.functions._
    val expected = graft.text.TextFunctions.qualityScore(Tables.load(spark, dir, "documents"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"), min("quality_score").as("min_score"),
        max("quality_score").as("max_score"))
      .orderBy("decile")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.toSeq === expected.toSeq)
  }

  test("chunking is shuffle-free until the output sort") {
    val p = planOf("pipe_chunk_documents")
    assert(!p.contains("Exchange hashpartitioning"),
      "chunk explode should not shuffle")
  }

  test("native as-of join: custom exec node, one hash exchange per side") {
    val df = SparkEntry.queries("q_asof_join_native")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), "the custom strategy must plan the custom node")
    // the merge itself adds nothing beyond what sort-merge join would pay:
    // each side hash-partitions on the key and sorts within partitions
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 3,
      "expected only the two child exchanges (plus the orders dedup)")
    assert(!p.contains("WindowExec") || !p.contains("last("),
      "the native path must not fall back to the union+window form")
    // results are bit-identical to the composed union+window form
    val native = df.collect().map(_.toString).sorted
    val composed = SparkEntry.queries("q_asof_join_composed")(spark, dir).collect().map(_.toString).sorted
    assert(native.sameElements(composed), "native and composed as-of joins must agree")
  }

  test("PQ ADC search: codegen'd scoring, partial-aggregated exchanges, bounded take") {
    // the r10 shape: the nested-lambda encode (which never codegens) is
    // restructured as explode-subvectors → broadcast 64-row codebook →
    // codegen'd graft_l2sq → per-(vec, s) argmin → ADC lookup join →
    // per-vec ordered fold. Exactly TWO hash exchanges are the contract —
    // the argmin and the rollup — and both must be map-side combined
    // (partial aggregate below the exchange), so they carry |corpus|·m
    // and |corpus| rows, never the ·nCodes scored pairs.
    val p = planOf("ann_pq_topk")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2,
      "the argmin + rollup exchanges, nothing else — a third exchange " +
        "means the scored pairs or the codebook stopped broadcasting")
    // the argmin runs as HashAggregate (min of a struct), the rollup as
    // ObjectHashAggregate (collect_list) — each must appear twice
    // (partial below its exchange, final above it)
    assert("(?<!Object)HashAggregate".r.findAllIn(p).length >= 2,
      "the argmin must be partial (map-side combine below its exchange)")
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      "the rollup must be partial (map-side combine below its exchange)")
    assert(p.contains("TakeOrderedAndProject"), "top-k must not globally sort")
    assert(p.contains("graft_l2sq"), "scoring must use the codegen'd native distance")
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the codebook attaches via broadcast joins")
  }

  test("linearized gram-df ops build their fan-out exactly once") {
    // the r8 rewrite: df attached via a gh-partitioned window, not a
    // self-join of the fan-out with its own groupBy — a regression back
    // to the join shape shows up as a SECOND parquet scan (Spark only
    // reuses identical exchanges) and doubles the shingle pipeline
    for (q <- Seq("text_dup_gram_share", "text_novelty")) {
      val p = planOf(q)
      assert("Scan parquet".r.findAllIn(p).length === 1,
        s"$q must scan the corpus once — the gram fan-out may not be rebuilt per side")
      assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
        s"$q must attach df via the partitioned window, not a join-back")
    }
  }

  test("centroid separation pairs within the collected per-dimension slice — one corpus scan") {
    val p = planOf("ann_centroid_separation")
    assert("Scan parquet".r.findAllIn(p).length === 1,
      "a centroid self-join would rebuild the aggregate per side")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"))
  }

  test("offset-lag family: broadcast hwm, no row-level joins") {
    // two scans are the accepted high-watermark shape (the 1-row hwm
    // aggregate reads its own reduced scan); what must never appear is a
    // shuffle join of the event rows against anything
    for (q <- Seq("cdc_consumer_lag", "cdc_slot_retention")) {
      val p = planOf(q)
      assert("Scan parquet".r.findAllIn(p).length <= 2, s"$q rescans events beyond the hwm twin")
      assert(!p.contains("SortMergeJoin"), s"$q must broadcast the 1-row hwm, never shuffle-join")
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"$q must attach the hwm via a broadcast")
    }
  }

  test("deployment CMS build: the ONLY exchange carries the <=depth*width cell keys") {
    import org.apache.spark.sql.functions._
    // the 100 TB claim made executable (r15 verdict item 1): however many
    // distinct keys the stream has, the build plan's single shuffle
    // groups by (row, bucket) — at most 4*1024 keys — map-side combined.
    // A per-item groupBy sneaking back in would add a second hash
    // exchange (on `item`) and fail here.
    val items = Tables.load(TestSpark.spark, TestSpark.dir, "events")
      .select(col("user_id").as("item"))
    val p = graft.analytics.Sketches.cmsCellCounts(items)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"build must shuffle exactly once, saw $exchanges:\n$p")
    assert("hashpartitioning\\(row#\\d+L?, bucket#\\d+".r.findFirstIn(p).isDefined,
      s"the one exchange must partition by the CMS cell key, not the item:\n$p")
    assert(!"hashpartitioning\\(item".r.findFirstIn(p).isDefined,
      "no per-item shuffle may exist in the deployment build")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      "cell counts must combine map-side before the exchange")
  }

  test("deployment CMS probe: cells broadcast, the raw stream is never re-grouped") {
    import org.apache.spark.sql.functions._
    val items = Tables.load(TestSpark.spark, TestSpark.dir, "events")
      .select(col("user_id").as("item"))
    val cells = graft.analytics.Sketches.cmsCellCounts(items)
    val candidates = TestSpark.spark.range(20).select(col("id").as("item"))
    val p = graft.analytics.Sketches.cmsProbe(cells, candidates)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the <=4096-row cell table must broadcast to the candidates")
    assert(!p.contains("SortMergeJoin"),
      "probing must never shuffle-join candidates against cells")
    // the only hash exchanges allowed: the build's (row,bucket) one and
    // the per-CANDIDATE min fold — both bounded; never one on the raw
    // stream's item column upstream of the join
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2, s"probe plan over-shuffles ($exchanges exchanges):\n$p")
  }

  test("IVF-PQ: the probe prunes via a broadcast equi-join, scan spine shuffle-free") {
    val p = planOf("ann_ivfpq_topk")
    // cell pruning must be a broadcast hash join on the label (2-row
    // probe set) — a shuffled or nested-loop label join would move the
    // corpus to prune it
    assert(p.contains("BroadcastHashJoin"), "label pruning must broadcast the probe set")
    assert(!p.contains("SortMergeJoin"), "the corpus must not shuffle to meet a 2-row probe set")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("TakeOrderedAndProject"), "top-k must not globally sort")
    assert(p.contains("graft_l2sq"), "ADC scoring must use the codegen'd native distance")
  }
}
