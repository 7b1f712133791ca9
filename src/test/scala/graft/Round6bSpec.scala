package graft

import graft.analytics.Relational
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the late-round-6 operator batch. */
class Round6bSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("component stats: histogram accounts for every cluster member and prices the deletions") {
    val members = Dedup.cluster(spark, dir).collect()
    val hist = Dedup.componentStats(spark, dir).collect()
    // every dup-cluster member appears in exactly one size bucket
    assert(hist.map(_.getAs[Long]("n_docs")).sum === members.length.toLong)
    val clusters = members.map(_.getAs[Long]("canonical_id")).distinct.length.toLong
    assert(hist.map(_.getAs[Long]("n_clusters")).sum === clusters)
    hist.foreach { r =>
      // the collapse keeps one survivor per cluster
      assert(r.getAs[Long]("n_redundant_docs") ===
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters"))
      // deleting a non-empty doc reclaims characters
      if (r.getAs[Long]("n_redundant_docs") > 0) assert(r.getAs[Long]("reclaim_chars") > 0L)
      // bucket label is the member count per cluster in that bucket
      assert(r.getAs[Long]("n_docs") === r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters"))
    }
  }

  test("sq8: 8-bit scalar quantization preserves the L2 neighborhood") {
    val rec = Ann.sq8Recall(spark, dir).collect().head
    assert(rec.getAs[Long]("n_exact") === 10L)
    assert(rec.getAs[Long]("n_sq") === 10L)
    // SQ8 keeps ~2 decimal digits per dimension — on 64-dim unit-scale
    // vectors the top-10 should be nearly intact (PQ's 4-byte codes are
    // the lossy option; SQ8 missing most of the neighborhood means the
    // affine coding is broken, not "expected loss")
    assert(rec.getAs[Double]("recall_at_k") >= 0.8)
    // distances are squared L2 over dequantized points: non-negative and ordered
    val top = Ann.sq8TopK(spark, dir).collect()
    assert(top.length === 10)
    assert(top.forall(_.getAs[Double]("sq_dist") >= 0.0))
    assert(top.map(_.getAs[Double]("sq_dist")).toSeq === top.map(_.getAs[Double]("sq_dist")).sortBy(identity).toSeq)
  }

  test("sq8: ADC distances track the true L2 within the quantization budget") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val truth = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("d")).toMap
    Ann.sq8TopK(spark, dir).collect().foreach { r =>
      val t = truth(r.getAs[Long]("vec_id"))
      val adc = r.getAs[Double]("sq_dist")
      // 8-bit cells on unit-scale dims keep per-dim reconstruction error
      // below half a cell — the squared distance cannot drift by more
      // than a few percent of its own magnitude
      assert(math.abs(adc - t) <= 0.05 * math.max(t, 1.0),
        s"vec ${r.getAs[Long]("vec_id")}: adc $adc vs true $t")
    }
  }

  test("dup-gram share: every document lands in exactly one decile bin") {
    val nDocs = Tables.load(spark, dir, "documents").count()
    val hist = TextFunctions.dupGramShare(spark, dir).collect()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === nDocs)
    hist.foreach { r =>
      val bin = r.getAs[Long]("dup_bin")
      assert(bin >= 0L && bin <= 9L)
      // a doc's duplicated grams are a subset of its grams
      assert(r.getAs[Long]("n_dup_grams") <= r.getAs[Long]("n_grams"))
    }
  }

  test("order gaps: segment rollup is consistent with the raw order timelines") {
    val orders = Tables.load(spark, dir, "orders")
    val nCust = orders.select("o_custkey").distinct().count()
    val got = Relational.orderGaps(spark, dir).collect()
    assert(got.map(_.getAs[Long]("n_customers")).sum === nCust)
    got.foreach { r =>
      assert(r.getAs[Long]("n_repeat_customers") <= r.getAs[Long]("n_customers"))
      // each repeat customer contributes >= 1 gap; gaps are whole days >= 0
      assert(r.getAs[Long]("n_gaps") >= r.getAs[Long]("n_repeat_customers"))
      assert(r.getAs[Double]("avg_gap_days") >= 0.0)
      assert(r.getAs[Long]("max_gap_days") >= 0L)
    }
  }

  test("mix drift: total variation bounded and consistent with the worst offender") {
    val row = TextFunctions.mixDrift(spark, dir).collect().head
    val tv = row.getAs[Double]("tv_distance")
    val maxGap = row.getAs[Double]("max_gap")
    assert(tv >= 0.0 && tv <= 1.0)
    // tv = sum(gaps)/2, so the largest single gap cannot exceed 2*tv
    assert(maxGap <= 2.0 * tv + 1e-9)
    assert(row.getAs[String]("max_gap_source").nonEmpty)
    assert(row.getAs[Long]("n_sources") ===
      TextFunctions.domainMix(spark, dir).count())
  }

  test("tokenizer fertility: exact volumes and finite ratios per source-lang cell") {
    val rows = TextFunctions.tokenizerFertility(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0L)
      assert(r.getAs[Long]("n_bpe_tokens") > 0L)
      val fert = r.getAs[Double]("fertility")
      assert(fert > 0.0 && !fert.isNaN && !fert.isInfinite)
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
    // volumes add up to the corpus totals measured without grouping
    val tot = Tables.load(spark, dir, "documents")
      .agg(sum(length(col("text")).cast("long"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("n_chars")).sum === tot)
  }
}
