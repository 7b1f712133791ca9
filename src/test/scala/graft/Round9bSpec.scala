package graft

import graft.dedup.Dedup
import graft.multimodal.Binary
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-9 second operator batch. */
class Round9bSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("substring dedup: spans are disjoint, within bounds, and coverage is consistent") {
    val rows = Dedup.substringDup(spark, dir).collect()
    assert(rows.nonEmpty, "the derived corpus has exact copies — spans must exist")
    rows.foreach { r =>
      val docChars = r.getAs[Long]("doc_chars")
      val nSpans = r.getAs[Long]("n_spans")
      val nGrams = r.getAs[Long]("n_dup_grams")
      val dupChars = r.getAs[Long]("dup_chars")
      val share = r.getAs[Double]("dup_share")
      // a merged span covers at least one 32-gram and spans never overlap,
      // so coverage is bounded below by 32·n_spans is wrong (spans can be
      // exactly 32) — the tight invariants:
      assert(dupChars >= 32L * nSpans || nSpans == 0L)
      assert(dupChars <= docChars, "coverage cannot exceed the document")
      assert(nGrams >= nSpans, "every span holds >= 1 duplicated gram")
      assert(share >= 0.0 && share <= 1.0)
    }
    // exact copies (corpus ids +1M) must be 100% covered: every gram of an
    // exact copy also occurs in its source document
    val copies = rows.filter(r => r.getAs[Long]("doc_id") >= 1000000L &&
      r.getAs[Long]("doc_id") < 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      assert(r.getAs[Double]("dup_share") === 1.0,
        s"exact copy ${r.getAs[Long]("doc_id")} must be fully covered")
    }
  }

  test("unigram surprisal: whole-bit values match an independent log2 check") {
    // the integer-comparison k must equal floor(log2(N/c)) computed the
    // obvious double way (safe to cross-check here: values are tiny)
    val rows = TextFunctions.unigramSurprisal(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val sum = r.getAs[Long]("sum_bits")
      val mx = r.getAs[Long]("max_bits")
      assert(n > 0 && sum >= 0 && mx >= 0 && mx <= 40)
      assert(sum <= mx * n)
      assert(math.abs(r.getAs[Double]("mean_bits") - sum.toDouble / n) < 1e-12)
    }
  }

  test("image resize: halved dims, and resized pixels match a direct box filter") {
    val rows = Binary.imageResize(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("src_w"), r.getAs[Int]("src_h"))
      assert(r.getAs[Int]("out_w") === (w + 1) / 2)
      assert(r.getAs[Int]("out_h") === (h + 1) / 2)
      assert(r.getAs[Long]("n_out_pixels") === ((w + 1) / 2).toLong * ((h + 1) / 2))
    }
    // direct check against the closed-form pixel function for one image
    val r0 = rows.find(_.getAs[Long]("doc_id") == 5L).get
    val id = 5L
    val (w, h, c) = ((id % 16 + 8).toInt, (id % 13 + 8).toInt, (id % 256).toInt)
    var sr = 0L
    for (bx <- 0 until (w + 1) / 2; by <- 0 until (h + 1) / 2) {
      var s = 0L; var n = 0L
      for (dx <- 0 until 2; dy <- 0 until 2
           if 2 * bx + dx < w && 2 * by + dy < h) {
        s += (c + 2 * (2 * bx + dx) + 3 * (2 * by + dy)) % 256; n += 1
      }
      sr += s / n
    }
    assert(r0.getAs[Long]("sum_red") === sr, "red channel must match the direct box filter")
  }

  test("video resize: halved dims per frame, pixel counts consistent") {
    val rows = graft.multimodal.Video.videoResize(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("src_w"), r.getAs[Int]("src_h"))
      assert(r.getAs[Int]("out_w") === (w + 1) / 2)
      assert(r.getAs[Int]("out_h") === (h + 1) / 2)
      assert(r.getAs[Long]("n_out_pixels") ===
        ((w + 1) / 2).toLong * ((h + 1) / 2) * r.getAs[Int]("n_frames"))
      // box means of byte pixels stay in byte range
      val mean = r.getAs[Double]("mean_red")
      assert(mean >= 0.0 && mean <= 255.0)
    }
  }

  test("audio resample: halved rate and counts, values within PCM16 range") {
    val rows = Binary.audioResample(spark, dir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Int]("in_rate") === 8000 && r.getAs[Int]("out_rate") === 4000)
      assert(r.getAs[Long]("n_out") === r.getAs[Long]("n_in") / 2)
      assert(r.getAs[Long]("min_pcm") >= -32768L && r.getAs[Long]("max_pcm") <= 32767L)
      assert(r.getAs[Long]("min_pcm") <= r.getAs[Long]("max_pcm"))
    }
  }

  test("nn-descent round: the expansion never loses ground and bounds hold") {
    val rows = Ann.nnDescentRound(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = 5L
      val nInit = r.getAs[Long]("n_init")
      val nCand = r.getAs[Long]("n_cand")
      assert(nInit >= 1L && nInit <= k)
      // candidates = initial neighbors ∪ their neighbors: superset of the
      // initial set, bounded by k + k² (self-edges excluded)
      assert(nCand >= nInit && nCand <= k + k * k)
      // the initial best is still a candidate, so the round cannot regress
      assert(r.getAs[Double]("best_cos_1") >= r.getAs[Double]("best_cos_0"))
      val improved = r.getAs[Long]("improved")
      assert(improved === (if (r.getAs[Double]("best_cos_1") > r.getAs[Double]("best_cos_0")) 1L else 0L))
    }
    // on a clustered embedding table SOME node must improve via a
    // neighbor-of-neighbor — otherwise the round was a no-op and the
    // operator proves nothing
    assert(rows.exists(_.getAs[Long]("improved") == 1L),
      "at least one node should find a better neighbor through the expansion")
  }

  test("nn-descent converge: monotone trajectory, k-bounded graph, consistent flags") {
    val rows = Ann.nnDescentConverge(spark, dir).collect().sortBy(_.getAs[Long]("round"))
    assert(rows.length === 3)
    val k = 5L
    rows.foreach { r =>
      assert(r.getAs[Long]("n_edges") <= k * r.getAs[Long]("n_nodes"))
      assert(r.getAs[Long]("converged") ===
        (if (r.getAs[Long]("n_new_edges") == 0L) 1L else 0L))
    }
    // round 0 charges the whole seed graph as new
    assert(rows.head.getAs[Long]("n_new_edges") === rows.head.getAs[Long]("n_edges"))
    assert(rows.head.getAs[Long]("n_improved") === 0L)
    // each expansion keeps prior candidates available, so the mean best-k
    // cosine can only rise; on clustered embeddings it must strictly rise
    val means = rows.map(_.getAs[Double]("mean_cos"))
    assert(means(1) > means(0) && means(2) > means(1),
      s"trajectory must climb: ${means.mkString(" -> ")}")
  }

  test("pca power: unit-norm loadings, positive Rayleigh growth, partition independence") {
    val rows = Ann.pcaPower(spark, dir).collect()
    assert(rows.length === 64, "one row per dimension")
    val norm2 = rows.map(_.getAs[Double]("loading")).map(x => x * x).sum
    assert(math.abs(norm2 - 1.0) < 1e-9, s"loadings must be unit norm, got $norm2")
    val l1 = rows.head.getAs[Double]("lambda1")
    val l2 = rows.head.getAs[Double]("lambda2")
    // power iteration's Rayleigh estimates are nondecreasing toward λ_max
    assert(l1 > 0.0 && l2 > 0.0 && l2 >= l1 * 0.999,
      s"second-round estimate must not collapse: $l1 -> $l2")
    // bit-stability under a different shuffle layout
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = Ann.pcaPower(spark, dir).collect().map(_.toString)
      assert(again.sameElements(rows.map(_.toString)),
        "quantized sums must make loadings partition-order independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("embedding outliers: shares bounded, stats positive, partition independent") {
    val rows = Ann.outlierShare(spark, dir).collect()
    assert(rows.nonEmpty)
    val emb = Tables.load(spark, dir, "embeddings")
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === emb.count())
    rows.foreach { r =>
      assert(r.getAs[Double]("mean_d2") > 0.0)
      assert(r.getAs[Double]("std_d2") >= 0.0)
      val share = r.getAs[Double]("outlier_share")
      // Chebyshev/Cantelli: beyond mean+2σ can hold at most 1/(1+4) of mass
      assert(share >= 0.0 && share <= 0.2 + 1e-9)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_vecs"))
    }
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val again = Ann.outlierShare(spark, dir).collect().map(_.toString)
      assert(again.sameElements(rows.map(_.toString)),
        "quantized sums must make outlier stats partition-order independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("dataset diff: statuses partition both snapshots exactly") {
    val rows = TextFunctions.datasetDiff(spark, dir).collect()
    val docs = Tables.load(spark, dir, "documents")
    val total = docs.count()
    val added = rows.map(_.getAs[Long]("n_added")).sum
    val removed = rows.map(_.getAs[Long]("n_removed")).sum
    val changed = rows.map(_.getAs[Long]("n_changed")).sum
    val unchanged = rows.map(_.getAs[Long]("n_unchanged")).sum
    // v1 = removed + changed + unchanged; v2 = added + changed + unchanged
    assert(removed + changed + unchanged === total)
    val expectedAdded = docs.where(col("doc_id") % 13 === 0).count()
    assert(added === expectedAdded)
    val expectedRemoved = docs.where(col("doc_id") % 23 === 0).count()
    assert(removed === expectedRemoved)
    // every mod-17 doc not also removed is changed (truncation shrinks:
    // all test docs are > 20 chars, so the digest must differ)
    val expectedChanged = docs
      .where(col("doc_id") % 17 === 0 && col("doc_id") % 23 =!= 0).count()
    assert(changed === expectedChanged)
  }

  test("connection test history: newest-first, limited, per-connection isolated") {
    val h = new graft.cdc.Discovery.TestHistory
    val good = Map("database_type" -> "parquet_dir", "path" -> dir)
    val bad = Map("database_type" -> "parquet_dir", "path" -> "/no/such/dir")
    h.recordTest("conn_a", good)
    h.recordTest("conn_a", bad)
    h.recordTest("conn_b", good)
    (1 to 10).foreach(_ => h.recordTest("conn_a", good))
    val full = h.history("conn_a", limit = 100)
    assert(full.length === 12)
    // newest-first ordering by the monotone sequence
    assert(full.map(_.testedSeq) === full.map(_.testedSeq).sorted.reverse)
    // the endpoint's limit shape
    assert(h.history("conn_a").length === 10)
    assert(h.history("conn_a", 3).map(_.testedSeq) === full.take(3).map(_.testedSeq))
    // outcome content mirrors the reference's record fields
    val failRec = full.find(_.status == "FAILED").get
    assert(failRec.errorMessage.exists(_.contains("No graft tables")))
    assert(full.count(_.status == "SUCCESS") === 11)
    // other connections never bleed in
    assert(h.history("conn_b").length === 1)
    assert(h.history("conn_missing").isEmpty)
  }

  test("table mapping and selection validation mirror the reference's precedence") {
    import graft.cdc.Discovery.{mapTables, validateTableSelection}
    // custom mapping wins; absent entries fall back to the source name
    assert(mapTables(Seq("a", "b"), Seq("x"), Map("a" -> "t_a")) ===
      Seq("a" -> "t_a", "b" -> "b"))
    // index pairing with a shorter target list falls back per-table
    assert(mapTables(Seq("a", "b", "c"), Seq("x", "y")) ===
      Seq("a" -> "x", "b" -> "y", "c" -> "c"))
    // identity when nothing is provided
    assert(mapTables(Seq("a", "b")) === Seq("a" -> "a", "b" -> "b"))

    val ok = validateTableSelection(Seq("lineitem", "events", "documents"))
    assert(ok.valid && ok.errors.isEmpty)
    assert(ok.tableDetails.forall(d => d.exists && d.hasPrimaryKey))
    val bad = validateTableSelection(Seq("lineitem", "no_such_table"))
    assert(!bad.valid)
    assert(bad.errors.exists(_.contains("no_such_table")))
    assert(bad.tableDetails.map(_.exists) === Seq(true, false))
  }

  test("log browse: page respects the endpoint caps and the horizon total") {
    val rows = graft.cdc.Monitoring.logBrowse(spark, dir).collect()
    assert(rows.length <= 50, "the endpoint caps limit at 50")
    assert(rows.nonEmpty)
    val totals = rows.map(_.getAs[Long]("total_7d")).distinct
    assert(totals.length === 1, "one horizon total attached to every page row")
    rows.foreach { r =>
      assert(r.getAs[String]("level") === "DEBUG")
      assert(r.getAs[String]("message").contains("7"))
    }
    // newest-first
    val ids = rows.map(_.getAs[Long]("event_id"))
    val ts = rows.map(_.getAs[java.sql.Timestamp]("ts").getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b }, "page must be newest-first")
    assert(ids.length === ids.distinct.length)
  }
}
