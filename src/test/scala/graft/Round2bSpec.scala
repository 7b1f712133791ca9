package graft

import graft.analytics.Relational
import graft.cdc.{Cdc, Materialize, Monitoring}
import graft.multimodal.Binary
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-2b operator batch. */
class Round2bSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private def mkChangelog(rows: Seq[(String, Long, Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("op", "pk", "ms", "seq", "value")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
  }

  test("update diff: no-op and changed updates classified, deltas exact") {
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 1L, 10.0),
      ("u", 1L, t0 + 1000, 2L, 10.0),  // no-op
      ("u", 1L, t0 + 2000, 3L, 12.5),  // +2.50
      ("c", 2L, t0, 4L, 5.0),
      ("u", 2L, t0 + 1000, 5L, 4.0)))  // -1.00
    val got = Monitoring.updateDiff(cl).collect()
      .map(r => r.getAs[Long]("pk_bucket") -> r).toMap
    assert(got(1L).getAs[Long]("n_noop") === 1L)
    assert(got(1L).getAs[Long]("n_changed") === 1L)
    assert(got(1L).getAs[Double]("sum_abs_delta") === 2.5)
    assert(got(2L).getAs[Long]("n_updates") === 1L)
    assert(got(2L).getAs[Double]("max_abs_delta") === 1.0)
  }

  test("txn group: seq-derived transactions report span and key counts") {
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 0L, 1.0), ("u", 2L, t0 + 9000, 49L, 1.0),   // txn 0
      ("u", 1L, t0 + 20000, 50L, 1.0), ("d", 1L, t0 + 21000, 99L, 1.0))) // txn 1
    val got = Monitoring.txnGroup(cl).collect()
      .map(r => r.getAs[Long]("txn_id") -> r).toMap
    assert(got(0L).getAs[Long]("n_events") === 2L)
    assert(got(0L).getAs[Long]("n_keys") === 2L)
    assert(got(0L).getAs[Long]("span_ms") === 9000L)
    assert(got(0L).getAs[Long]("n_deletes") === 0L)
    assert(got(1L).getAs[Long]("n_keys") === 1L)
    assert(got(1L).getAs[Long]("n_deletes") === 1L)
  }

  test("offset gaps: missing offsets and largest gap per topic") {
    import spark.implicits._
    val wire = Seq(
      ("t.a", 1L), ("t.a", 2L), ("t.a", 5L), ("t.a", 9L), // missing 3,4,6,7,8
      ("t.b", 10L), ("t.b", 11L))
      .toDF("topic", "offset").withColumn("value", lit("{}"))
    val got = Monitoring.offsetGaps(wire).collect()
      .map(r => r.getAs[String]("topic") -> r).toMap
    assert(got("t.a").getAs[Long]("n_missing") === 5L)
    assert(got("t.a").getAs[Long]("max_gap") === 3L)
    assert(got("t.a").getAs[Long]("n_gaps") === 2L)
    assert(got("t.b").getAs[Long]("n_missing") === 0L)
    assert(got("t.b").getAs[Long]("max_gap") === 0L)
  }

  test("time travel: changes inside the last day are excluded from the as-of state") {
    val day = 86400000L
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 1L, 10.0),
      ("u", 1L, t0 + day, 2L, 99.0),        // after cutoff (hw = t0+day)
      ("c", 2L, t0 - 1000, 3L, 7.0),        // just inside the cutoff (hw−1d = t0)
      ("c", 3L, t0 + day, 4L, 5.0)))        // born after cutoff
    val got = Materialize.timeTravel(cl).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("last_value")).toMap
    assert(got === Map(1L -> 10.0, 2L -> 7.0)) // key 3 absent, key 1 pre-update
  }

  test("cube: four grouping levels, grand total matches table count") {
    val got = Relational.cubeAgg(spark, dir).collect()
    val gids = got.map(_.getAs[Long]("gid")).toSet
    assert(gids === Set(0L, 1L, 2L, 3L))
    val total = Tables.load(spark, dir, "orders").count()
    val grand = got.filter(_.getAs[Long]("gid") == 3L)
    assert(grand.length === 1 && grand.head.getAs[Long]("n_orders") === total)
    // detail level sums back to the grand total
    assert(got.filter(_.getAs[Long]("gid") == 0L).map(_.getAs[Long]("n_orders")).sum === total)
  }

  test("percentile_cont: ordered quantiles, groups cover the table") {
    val got = Relational.percentileCont(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (p25, p50, p90, p100) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"),
        r.getAs[Double]("p90"), r.getAs[Double]("p100"))
      assert(p25 <= p50 && p50 <= p90 && p90 <= p100)
    }
    assert(got.map(_.getAs[Long]("n_orders")).sum ===
      Tables.load(spark, dir, "orders").count())
  }

  test("cume/ntile: ranks bounded, top of each segment reaches 1.0") {
    val got = Relational.cumeNtile(spark, dir).collect()
    got.foreach { r =>
      assert(r.getAs[Double]("pr") >= 0.0 && r.getAs[Double]("pr") <= 1.0)
      assert(r.getAs[Double]("cd") > 0.0 && r.getAs[Double]("cd") <= 1.0)
      assert(r.getAs[Long]("quartile") >= 1L && r.getAs[Long]("quartile") <= 4L)
    }
    val bySeg = got.groupBy(_.getAs[String]("c_mktsegment"))
    bySeg.values.foreach { rs => assert(rs.map(_.getAs[Double]("cd")).max === 1.0) }
  }

  test("knn join: per-query top-k ranked by cosine, self excluded") {
    val got = Ann.knnJoin(spark, dir).collect()
    assert(got.nonEmpty)
    val byQ = got.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to rs.length).toSeq)
      val cos = sorted.map(_.getAs[Double]("cosine"))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("pii scan: tallies are internally consistent") {
    val got = TextFunctions.piiScan(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, dir, "documents").count())
    got.foreach { r =>
      assert(r.getAs[Long]("n_digit_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("total_digit_runs") >= r.getAs[Long]("n_digit_docs"))
    }
  }

  test("chunking: windows tile every document with the configured overlap") {
    val docs = Tables.load(spark, dir, "documents").count()
    val chunks = TextFunctions.chunkDocuments(spark, dir).collect()
    assert(chunks.map(_.getAs[Long]("doc_id")).distinct.length.toLong === docs)
    chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
      assert(sorted.map(_.getAs[Long]("chunk_idx")).toSeq === (0L until rs.length).toSeq)
      sorted.foreach { r =>
        assert(r.getAs[Long]("start_word") === r.getAs[Long]("chunk_idx") * 75)
        assert(r.getAs[Long]("chunk_words") >= 1 && r.getAs[Long]("chunk_words") <= 100)
      }
      // consecutive chunks overlap by 25 words (except a short tail)
      if (sorted.length > 1)
        assert(sorted.init.forall(_.getAs[Long]("chunk_words") === 100L))
    }
  }

  test("stratified sampling: realized rate tracks the per-source target") {
    val got = TextFunctions.sampleStratified(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, dir, "documents").count())
    got.foreach { r =>
      val rate = r.getAs[Long]("rate_pct")
      assert(rate >= 25 && rate < 75)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("realized_pct") ===
        r.getAs[Long]("n_kept").toDouble * 100.0 / r.getAs[Long]("n_docs").toDouble)
    }
  }

  test("token budget: projected tokens never exceed share or supply") {
    val got = TextFunctions.tokenBudget(spark, dir).collect()
    assert(got.nonEmpty)
    val share = got.head.getAs[Long]("share")
    got.foreach { r =>
      assert(r.getAs[Long]("share") === share) // equal split
      assert(r.getAs[Long]("projected_tokens") <=
        math.min(share, r.getAs[Long]("total_tokens")))
      val kp = r.getAs[Double]("keep_prob")
      assert(kp > 0.0 && kp <= 1.0)
      if (r.getAs[Long]("total_tokens") <= share) assert(kp === 1.0)
    }
  }

  test("watermark advice: lateness percentiles reflect injected disorder") {
    val t0 = 1700000000000L
    // key 1 arrives in order; key 2 has one event 90s late (seq order = arrival)
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 1L, 1.0), ("u", 1L, t0 + 1000, 2L, 1.0),
      ("c", 2L, t0 + 100000, 3L, 1.0), ("u", 2L, t0 + 10000, 4L, 1.0))) // 90s behind
    val r = Monitoring.watermarkAdvise(cl).collect().head
    assert(r.getAs[Long]("n_events") === 4L)
    assert(r.getAs[Long]("n_late") === 1L)
    assert(r.getAs[Double]("p99_ms") <= 90000.0)
    assert(r.getAs[Long]("advised_watermark_ms") % 60000 === 0L)
    assert(r.getAs[Long]("advised_watermark_ms") >= r.getAs[Double]("p99_ms").toLong)
  }

  test("string agg: sorted CSV is partition-order independent") {
    val got = Relational.stringAgg(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val parts = r.getAs[String]("nations_csv").split(",").toSeq
      assert(parts.length.toLong === r.getAs[Long]("n_nations"))
      assert(parts === parts.sorted)
    }
  }

  test("recall eval: lsh recall is a valid fraction and counts agree") {
    val r = Ann.recallEval(spark, dir).collect().head
    assert(r.getAs[Long]("n_brute") === 10L)
    // self-matches are excluded, so a bucket holding only the query
    // legitimately yields zero LSH results (recall 0 — the honest reading)
    assert(r.getAs[Long]("n_lsh") >= 0L && r.getAs[Long]("n_lsh") <= 10L)
    assert(r.getAs[Long]("n_common") <= math.max(r.getAs[Long]("n_lsh"), 0L))
    assert(r.getAs[Double]("recall_at_k") ===
      r.getAs[Long]("n_common").toDouble / 10.0)
  }

  test("interleave: consecutive positions rotate through sources") {
    val got = TextFunctions.interleave(spark, dir).collect()
    assert(got.map(_.getAs[Long]("global_pos")).distinct.length === got.length)
    val nSources = got.map(_.getAs[String]("source")).distinct.length
    // the first n_sources positions are n_sources distinct sources
    val head = got.sortBy(_.getAs[Long]("global_pos")).take(nSources)
    assert(head.map(_.getAs[String]("source")).distinct.length === nSources)
  }

  test("q7: both nation directions present, volumes positive") {
    val got = Relational.q7Volume(spark, dir).collect()
    assert(got.nonEmpty)
    val pairs = got.map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    assert(pairs.forall { case (a, b) => a != b })
    got.foreach(r => assert(r.getAs[Double]("volume") > 0.0))
  }

  test("q10: top-20 by lost revenue, strictly ordered") {
    val got = Relational.q10Returns(spark, dir).collect()
    assert(got.length <= 20 && got.nonEmpty)
    val rev = got.map(_.getAs[Double]("lost_revenue"))
    assert(rev.zip(rev.tail).forall { case (a, b) => a >= b })
  }

  test("frame dedup: recurring signatures span multiple documents") {
    val got = graft.multimodal.Video.frameDedup(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_docs") >= 2L)
      assert(r.getAs[Long]("n_frames") >= r.getAs[Long]("n_docs"))
    }
  }

  test("contamination: injected benchmark copies are detected") {
    val r = graft.dedup.Dedup.contamination(spark, dir).collect().head
    assert(r.getAs[Long]("n_benchmark") > 0L)
    assert(r.getAs[Long]("n_train") > r.getAs[Long]("n_benchmark"))
    // copies of doc_id ≡ 0 (mod 350) are benchmark docs replicated into train
    assert(r.getAs[Long]("n_contaminated") >= 1L)
    assert(r.getAs[Long]("n_affected_bench") >= 1L)
    assert(r.getAs[Long]("n_contaminated") >= r.getAs[Long]("n_affected_bench"))
  }

  test("burst detect: a known spike minute is flagged, quiet ones are not") {
    val t0 = 1700000000000L
    // 10 quiet minutes of 2 events + one minute with 40
    val quiet = (0 until 10).flatMap(m => Seq(
      ("u", 1L, t0 + m * 60000L, m * 2L, 1.0),
      ("u", 2L, t0 + m * 60000L + 1000, m * 2L + 1, 1.0)))
    val burst = (0 until 40).map(i => ("u", 3L, t0 + 600000L + i * 100L, 100L + i, 1.0))
    val got = Monitoring.burstDetect(mkChangelog(quiet ++ burst)).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_events") === 40L)
    assert(got.head.getAs[Double]("zscore") > 2.0)
  }

  test("gdpr erasure: deleted keys purge their history, state is disjoint") {
    val r = graft.cdc.Quality.gdprErasure(spark, dir).collect().head
    val nKeys = Cdc.changelog(spark, dir).select("pk").distinct().count()
    assert(r.getAs[Long]("n_erased_keys") + r.getAs[Long]("n_state_rows_remaining") === nKeys)
    assert(r.getAs[Long]("n_history_rows_purged") >= r.getAs[Long]("n_erased_keys"))
  }

  test("dataset card: internally consistent headline numbers") {
    val r = TextFunctions.datasetCard(spark, dir).collect().head
    assert(r.getAs[Long]("n_docs") === Tables.load(spark, dir, "documents").count())
    assert(r.getAs[Long]("n_sources") >= 1L && r.getAs[Long]("n_langs") >= 1L)
    assert(r.getAs[Long]("total_words") > r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("n_exact_dup_docs") >= 0L)
    assert(r.getAs[Long]("n_pii_docs") <= r.getAs[Long]("n_docs"))
  }

  test("scd3: current + previous side by side, delete drops the key") {
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 1L, 10.0), ("u", 1L, t0 + 1000, 2L, 20.0), ("u", 1L, t0 + 2000, 3L, 30.0),
      ("c", 2L, t0, 4L, 5.0),                       // single change: prev NULL
      ("c", 3L, t0, 5L, 1.0), ("d", 3L, t0 + 1000, 6L, 0.0))) // deleted
    val got = Materialize.scd3(cl).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Double]("current_value"), Option(r.get(2))))).toMap
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((30.0, Some(20.0))))
    assert(got(2L)._2.isEmpty)
  }

  test("ivf build: centroid table covers every partition with plausible norms") {
    val got = Ann.ivfBuild(spark, dir).collect()
    assert(got.nonEmpty)
    val emb = Tables.load(spark, dir, "embeddings")
    assert(got.map(_.getAs[Long]("n_vectors")).sum === emb.count())
    got.foreach { r =>
      assert(r.getAs[Long]("n_dims") === 64L)
      assert(r.getAs[Double]("centroid_norm") >= 0.0)
    }
  }

  test("audit chain: any edit or reorder flips the key's chain hash") {
    val t0 = 1700000000000L
    val base = Seq(
      ("c", 1L, t0, 1L, 10.0), ("u", 1L, t0 + 1000, 2L, 20.0), ("u", 1L, t0 + 2000, 3L, 30.0))
    def chainOf(rows: Seq[(String, Long, Long, Long, Double)]): String =
      Monitoring.auditChain(mkChangelog(rows)).collect().head.getAs[String]("chain_hash")
    val h0 = chainOf(base)
    // tamper: change one value
    assert(chainOf(base.updated(1, ("u", 1L, t0 + 1000, 2L, 21.0))) !== h0)
    // tamper: drop a link
    assert(chainOf(base.take(2)) !== h0)
    // reorder of arrival does NOT change the chain (it folds event order)
    assert(chainOf(base.reverse) === h0)
  }

  test("gap fill: synthesized gaps are filled from the key's prior value") {
    val got = Relational.gapFill(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_present") <= r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_after_fill") >= r.getAs[Long]("n_present"))
      assert(r.getAs[Long]("n_after_fill") ===
        r.getAs[Long]("n_present") + r.getAs[Long]("n_filled_in"))
    }
    // at least one gap actually got filled somewhere
    assert(got.map(_.getAs[Long]("n_filled_in")).sum > 0L)
  }

  test("conflict resolve: last writer wins across sites, conflicts flagged") {
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 2L, 10.0),          // site A (even seq)
      ("u", 1L, t0 + 1000, 3L, 20.0),   // site B wins (later ts)
      ("c", 2L, t0, 4L, 5.0)))          // only site A
    val got = Materialize.conflictResolve(cl).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(got(1L).getAs[String]("winner_site") === "B")
    assert(got(1L).getAs[Boolean]("had_conflict"))
    assert(got(1L).getAs[Double]("resolved_value") === 20.0)
    assert(!got(2L).getAs[Boolean]("had_conflict"))
  }

  test("histogram: buckets cover the table, bounds ordered") {
    val got = Relational.histogram(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_orders")).sum ===
      Tables.load(spark, dir, "orders").count())
    got.foreach { r =>
      assert(r.getAs[Long]("bucket") >= 0L && r.getAs[Long]("bucket") <= 19L)
      assert(r.getAs[Double]("min_price") <= r.getAs[Double]("max_price"))
    }
  }

  test("cooccurrence: pairs are ordered, bounded by the vocabulary cap") {
    val got = TextFunctions.cooccurrence(spark, dir).collect()
    assert(got.nonEmpty && got.length <= 30)
    got.foreach { r =>
      assert(r.getAs[String]("term_a") < r.getAs[String]("term_b"))
      assert(r.getAs[Long]("n_docs") >= 1L)
    }
    val counts = got.map(_.getAs[Long]("n_docs"))
    assert(counts.zip(counts.tail).forall { case (x, y) => x >= y })
  }

  test("cohort retention: offsets non-negative, cohort sizes peak at offset 0") {
    val got = Relational.cohortRetention(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getAs[Long]("week_offset") >= 0L))
    val byCohort = got.groupBy(_.getAs[java.sql.Timestamp]("cohort_week"))
    byCohort.values.foreach { rs =>
      val at0 = rs.find(_.getAs[Long]("week_offset") == 0L).map(_.getAs[Long]("n_active"))
      assert(at0.nonEmpty) // every cohort is active in its own first week
      assert(rs.map(_.getAs[Long]("n_active")).max === at0.get)
    }
  }

  test("funnel: monotone step counts") {
    val r = Relational.funnel(spark, dir).collect().head
    assert(r.getAs[Long]("n_users") >= r.getAs[Long]("n_signup"))
    assert(r.getAs[Long]("n_signup") >= r.getAs[Long]("n_signup_click"))
    assert(r.getAs[Long]("n_signup_click") >= r.getAs[Long]("n_full_funnel"))
    assert(r.getAs[Long]("n_full_funnel") >= 0L)
  }

  test("shard plan: shards cover the corpus, sizes near the target") {
    val got = TextFunctions.shardPlan(spark, dir).collect()
    val nShards = got.head.getAs[Long]("n_shards")
    assert(got.length.toLong <= nShards)
    assert(got.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, dir, "documents").count())
    // digest assignment balances: no shard more than 4x the mean
    val sizes = got.map(_.getAs[Long]("shard_bytes"))
    assert(sizes.max <= 4 * (sizes.sum / sizes.length))
  }

  test("backfill ranges: each range matches the injected gaps exactly") {
    import spark.implicits._
    val wire = Seq(("t", 1L), ("t", 2L), ("t", 5L), ("t", 9L), ("u", 3L), ("u", 4L))
      .toDF("topic", "offset").withColumn("value", lit("{}"))
    val got = Monitoring.backfillRanges(wire).collect()
      .map(r => (r.getAs[String]("topic"), r.getAs[Long]("gap_from"),
        r.getAs[Long]("gap_to"), r.getAs[Long]("n_missing")))
    assert(got.toSeq === Seq(("t", 3L, 4L, 2L), ("t", 6L, 8L, 3L)))
  }

  test("quality drift: shares sum to one per snapshot, drift bounded") {
    val rows = TextFunctions.qualityDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    val s0 = rows.map(_.getAs[Double]("share_t0")).sum
    val s1 = rows.map(_.getAs[Double]("share_t1")).sum
    assert(math.abs(s0 - 1.0) < 1e-9 && math.abs(s1 - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(r.getAs[Double]("abs_drift") >= 0.0 && r.getAs[Double]("abs_drift") <= 1.0)
    }
  }

  test("pack sequences: packs respect the budget boundary in digest order") {
    val got = TextFunctions.packSequences(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, dir, "documents").count())
    got.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      val ids = rs.map(_.getAs[Long]("pack_id")).sorted
      assert(ids.head === 0L)               // packing starts at pack 0
      assert(ids.zip(ids.tail).forall { case (a, b) => b == a + 1 }) // contiguous
    }
    got.foreach(r => assert(r.getAs[Double]("fill_ratio") > 0.0))
  }

  test("interval overlap: overlapping intervals counted, touching ones not") {
    val got = Relational.intervalOverlap(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("max_concurrent") >= 1L)
      assert(r.getAs[Long]("max_concurrent") <= r.getAs[Long]("n_intervals"))
    }
  }

  test("yoy growth: first year has null prior, ratios match revenues") {
    val got = Relational.yoyGrowth(spark, dir).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[String]("o_orderpriority")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("o_year"))
      assert(sorted.head.isNullAt(sorted.head.fieldIndex("prev_revenue")))
      sorted.tail.zip(sorted.init).foreach { case (cur, prev) =>
        assert(cur.getAs[Double]("prev_revenue") === prev.getAs[Double]("revenue"))
        assert(math.abs(cur.getAs[Double]("yoy_growth") -
          (cur.getAs[Double]("revenue") / prev.getAs[Double]("revenue") - 1.0)) < 1e-12)
      }
    }
  }

  test("state size: per-key stats and byte projections are consistent") {
    val r = Monitoring.stateSize(Cdc.changelog(spark, dir)).collect().head
    assert(r.getAs[Long]("n_keys") > 0L)
    assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_keys"))
    assert(r.getAs[Double]("p50_history") <= r.getAs[Double]("p99_history"))
    assert(r.getAs[Double]("p99_history") <= r.getAs[Long]("max_history").toDouble)
    assert(r.getAs[Long]("projected_state_bytes") === r.getAs[Long]("n_keys") * 64L)
  }

  test("market basket: pairs ordered, co-purchase counts positive") {
    val got = Relational.marketBasket(spark, dir).collect()
    assert(got.nonEmpty && got.length <= 30)
    got.foreach { r =>
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(r.getAs[Long]("n_orders") >= 1L)
    }
  }

  test("table checksum: moves on any row change, stable under reordering") {
    val got = graft.cdc.Quality.tableChecksum(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("checksum")).toMap
    assert(got.keySet === Set("orders", "customer", "part"))
    // recompute = identical (deterministic); repartitioned input too
    val again = graft.cdc.Quality.tableChecksum(spark, dir).collect()
      .map(r => r.getAs[String]("table_name") -> r.getAs[Long]("checksum")).toMap
    assert(again === got)
  }

  test("order violations: only regressed events reported, size exact") {
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 1L, 1.0),
      ("u", 1L, t0 + 5000, 2L, 1.0),
      ("u", 1L, t0 + 2000, 3L, 1.0),  // arrives after hw t0+5000 -> 3000ms late
      ("u", 2L, t0, 4L, 1.0)))        // in order
    val got = Monitoring.orderViolations(cl).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("user_id") === 1L)
    assert(got.head.getAs[Long]("seq") === 3L)
    assert(got.head.getAs[Long]("regression_ms") === 3000L)
  }

  test("char stats: class counts partition within totals, ratios consistent") {
    val got = TextFunctions.charStats(spark, dir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val chars = r.getAs[Long]("n_chars")
      assert(r.getAs[Long]("n_letters") + r.getAs[Long]("n_digits") <= chars)
      assert(r.getAs[Double]("letter_ratio") ===
        r.getAs[Long]("n_letters").toDouble / chars.toDouble)
    }
  }

  test("trigger advise: interval shrinks as target shrinks, floors at 1s") {
    val cl = Cdc.changelog(spark, dir)
    val big = Monitoring.triggerAdvise(cl, targetRows = 100000L).collect().head
    val small = Monitoring.triggerAdvise(cl, targetRows = 10L).collect().head
    assert(big.getAs[Long]("advised_trigger_sec") >= small.getAs[Long]("advised_trigger_sec"))
    assert(small.getAs[Long]("advised_trigger_sec") >= 1L)
    assert(big.getAs[Double]("p50_per_min") <= big.getAs[Double]("p95_per_min"))
  }

  test("lapse cohorts: user counts sum to the distinct-user total") {
    val got = Relational.lapseCohorts(spark, dir).collect()
    val users = Tables.load(spark, dir, "events").select("user_id").distinct().count()
    assert(got.map(_.getAs[Long]("n_users")).sum === users)
  }

  test("volume forecast: exact fit on synthetic linear data") {
    val t0 = 1700000000000L
    val day = 86400000L
    // y = 10 + 2*dayIndex exactly
    val rows = (0 until 10).flatMap { d =>
      (0 until 10 + 2 * d).map(i => ("u", i.toLong, t0 + d * day, (d * 100 + i).toLong, 1.0))
    }
    val r = Monitoring.volumeForecast(mkChangelog(rows)).collect().head
    assert(r.getAs[Long]("n_days") === 10L)
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 1e-9)
    // forecast at last_x + 7 continues the line
    val lastY = 10 + 2 * 9
    assert(math.abs(r.getAs[Double]("forecast_plus_7d") - (lastY + 2 * 7)) < 1e-6)
  }

  test("percent of total: shares sum to one") {
    val got = Relational.percentOfTotal(spark, dir).collect()
    assert(got.nonEmpty)
    assert(math.abs(got.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-9)
  }

  test("key lifecycle: resurrection recognized, classes partition keys") {
    val t0 = 1700000000000L
    val cl = mkChangelog(Seq(
      ("c", 1L, t0, 1L, 1.0),                                    // insert_only
      ("c", 2L, t0, 2L, 1.0), ("u", 2L, t0 + 1000, 3L, 1.0),     // updated
      ("c", 3L, t0, 4L, 1.0), ("d", 3L, t0 + 1000, 5L, 1.0),     // deleted
      ("c", 4L, t0, 6L, 1.0), ("d", 4L, t0 + 1000, 7L, 1.0),
      ("c", 4L, t0 + 2000, 8L, 1.0)))                            // resurrected
    val got = Monitoring.keyLifecycle(cl).collect()
      .map(r => r.getAs[String]("lifecycle") -> r.getAs[Long]("n_keys")).toMap
    assert(got === Map("insert_only" -> 1L, "updated" -> 1L,
      "deleted" -> 1L, "resurrected" -> 1L))
  }

  test("minhash accuracy: exact copies estimate 1.0, errors bounded") {
    val got = graft.dedup.Dedup.minhashAccuracy(spark, dir).collect()
    assert(got.nonEmpty)
    // exact copies (+1M ids) must have identical signatures -> estimate 1.0
    val copies = got.filter(r => r.getAs[Long]("id_a") < 1000000L &&
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L)
    assert(copies.nonEmpty)
    copies.foreach(r => assert(r.getAs[Double]("est_jaccard") === 1.0))
    got.foreach(r => assert(r.getAs[Double]("abs_err") >= 0.0 && r.getAs[Double]("abs_err") <= 1.0))
  }

  test("dow seasonality: seven ISO weekdays, shares sum to one") {
    val got = Relational.dowSeasonality(spark, dir).collect()
    assert(got.map(_.getAs[Long]("isodow")).toSet === (1L to 7L).toSet)
    assert(math.abs(got.map(_.getAs[Double]("revenue_share")).sum - 1.0) < 1e-9)
    assert(got.map(_.getAs[Long]("n_orders")).sum ===
      Tables.load(spark, dir, "orders").count())
  }

  test("dup rate by source: distinct never exceeds docs, rate consistent") {
    val got = TextFunctions.dupRateBySource(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, dir, "documents").count())
    got.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dups") === r.getAs[Long]("n_docs") - r.getAs[Long]("n_distinct"))
      assert(r.getAs[Double]("dup_rate") >= 0.0 && r.getAs[Double]("dup_rate") < 1.0)
    }
  }

  test("retention impact: longer horizons purge monotonically less") {
    val r = Monitoring.retentionImpact(Cdc.changelog(spark, dir)).collect().head
    assert(r.getAs[Long]("purged_1d") >= r.getAs[Long]("purged_7d"))
    assert(r.getAs[Long]("purged_7d") >= r.getAs[Long]("purged_30d"))
    assert(r.getAs[Long]("purged_1d") <= r.getAs[Long]("n_events"))
    assert(r.getAs[Double]("share_7d") ===
      r.getAs[Long]("purged_7d").toDouble / r.getAs[Long]("n_events").toDouble)
  }

  test("frame stats: totals agree with the decoded clips") {
    val r = graft.multimodal.Video.frameStats(spark, dir).collect().head
    val clips = graft.multimodal.Video.videoDecode(spark, dir)
      .agg(sum(col("n_frames").cast("long")), sum(col("n_pixels")), sum(col("n_bytes")))
      .collect().head
    assert(r.getAs[Long]("total_frames") === clips.getLong(0))
    assert(r.getAs[Long]("total_pixels") === clips.getLong(1))
    assert(r.getAs[Long]("total_bytes") === clips.getLong(2))
    assert(r.getAs[Double]("p50_frames") <= r.getAs[Double]("p95_frames"))
    assert(r.getAs[Double]("p95_frames") <= r.getAs[Long]("max_frames").toDouble)
  }

  test("modality stats: three classes partition the corpus, avg consistent") {
    val got = Binary.modalityStats(spark, dir).collect()
    assert(got.map(_.getAs[String]("modality")).toSet === Set("image", "audio", "video"))
    assert(got.map(_.getAs[Long]("n_blobs")).sum ===
      Tables.load(spark, dir, "documents").count())
    got.foreach { r =>
      assert(r.getAs[Double]("avg_bytes") ===
        r.getAs[Long]("total_bytes").toDouble / r.getAs[Long]("n_blobs").toDouble)
    }
  }
}
