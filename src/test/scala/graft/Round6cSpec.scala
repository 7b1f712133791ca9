package graft

import graft.analytics.Relational
import graft.cdc.{Cdc, Monitoring}
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the second late-round-6 operator batch. */
class Round6cSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("ivf-pq: results come from at most 2 probed cells with ordered ADC distances") {
    val rows = Ann.ivfpqTopK(spark, dir).collect()
    assert(rows.length === 10)
    assert(rows.map(_.getAs[Int]("label")).distinct.length <= 2)
    val d = rows.map(_.getAs[Double]("adc_dist"))
    assert(d.forall(_ >= 0.0))
    assert(d.toSeq === d.sortBy(identity).toSeq)
    // inside the probed cells the ADC scores are the SAME codes pqTopK
    // assigns, so any vec returned by both paths must carry one distance
    val pq = Ann.pqTopK(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("adc_dist")).toMap
    rows.foreach { r =>
      pq.get(r.getAs[Long]("vec_id")).foreach { pd =>
        assert(pd === r.getAs[Double]("adc_dist"))
      }
    }
  }

  test("lang confusion: cells partition the corpus and the diagonal matches the per-doc agreement rate") {
    val cells = TextFunctions.langConfusion(spark, dir).collect()
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(cells.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val diag = cells.filter(r => r.getAs[String]("labeled_lang") == r.getAs[String]("pred_lang"))
      .map(_.getAs[Long]("n_docs")).sum
    val agrees = TextFunctions.langId(spark, dir)
      .where(col("agrees")).count()
    assert(diag === agrees)
    cells.foreach { r =>
      val share = r.getAs[Double]("cell_share")
      assert(share > 0.0 && share <= 1.0)
    }
  }

  test("robust anomaly: every flagged day actually exceeds the Hampel bound") {
    val daily = Cdc.changelog(spark, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val flagged = Monitoring.robustAnomaly(Cdc.changelog(spark, dir)).collect()
    flagged.foreach { r =>
      val med = r.getAs[Double]("med"); val mad = r.getAs[Double]("mad")
      assert(mad > 0.0)
      assert(math.abs(r.getAs[Long]("n_events").toDouble - med) > 3.0 * mad)
      assert(r.getAs[Double]("deviation") > 3.0)
      // the flagged count is the real daily count
      assert(daily(r.getTimestamp(0)) === r.getAs[Long]("n_events"))
    }
  }

  test("rfm: the segment cube partitions the customer base with scores in 1..4") {
    val cube = Relational.rfm(spark, dir).collect()
    val nCust = Tables.load(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(cube.map(_.getAs[Long]("n_customers")).sum === nCust)
    cube.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Long](c); assert(s >= 1L && s <= 4L)
      }
      assert(r.getAs[Long]("n_customers") > 0L)
      assert(r.getAs[Double]("segment_spend") > 0.0)
    }
  }

  test("band occupancy: each band's buckets account for every signature exactly once") {
    val hist = Dedup.bandOccupancy(spark, dir).collect()
    val corpusSize = Dedup.corpus(spark, dir).count()
    hist.groupBy(_.getAs[Long]("band_id")).foreach { case (_, rows) =>
      // every doc contributes exactly one key per band
      assert(rows.map(r => r.getAs[Long]("occupancy") * r.getAs[Long]("n_buckets")).sum === corpusSize)
    }
    hist.foreach { r =>
      val k = r.getAs[Long]("occupancy")
      assert(r.getAs[Long]("cand_pairs") === k * (k - 1) / 2 * r.getAs[Long]("n_buckets"))
    }
  }

  test("pack efficiency: totals reconcile with the pack table and fill bounds hold") {
    val packs = TextFunctions.packSequences(spark, dir).collect()
    val eff = TextFunctions.packEfficiency(spark, dir).collect()
    assert(eff.map(_.getAs[Long]("n_packs")).sum === packs.length.toLong)
    assert(eff.map(_.getAs[Long]("total_tokens")).sum ===
      packs.map(_.getAs[Long]("pack_tokens")).sum)
    eff.foreach { r =>
      val e = r.getAs[Double]("efficiency")
      assert(e > 0.0)
      assert(r.getAs[Double]("min_fill") <= r.getAs[Double]("max_fill"))
      // mean fill IS the efficiency, so it sits inside the fill envelope
      assert(e >= r.getAs[Double]("min_fill") - 1e-9 && e <= r.getAs[Double]("max_fill") + 1e-9)
    }
  }

  test("mode: the argmax cell is consistent with its group's row total") {
    val rows = Relational.modeReturnflag(spark, dir).collect()
    val liRows = Tables.load(spark, dir, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === liRows)
    rows.foreach { r =>
      assert(r.getAs[Long]("mode_count") <= r.getAs[Long]("n_rows"))
      val share = r.getAs[Double]("mode_share")
      // the mode is at least as common as a uniform split over the
      // 3 return-flag values
      assert(share > 1.0 / 3.0 - 1e-9 && share <= 1.0)
    }
  }

  test("first/last: priority changes only happen to repeat customers") {
    val rows = Relational.firstLast(spark, dir).collect()
    val nCust = Tables.load(spark, dir, "orders").select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === nCust)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_priority_changed") <= r.getAs[Long]("n_repeat"))
      assert(r.getAs[Long]("n_repeat") <= r.getAs[Long]("n_customers"))
    }
  }

  test("simhash tables: 28 tables, keys bounded by the corpus, candidates cover the verified pairs") {
    val stats = Dedup.simhashTableStats(spark, dir).collect()
    assert(stats.length === 28)
    val corpusSize = Dedup.corpus(spark, dir).count()
    stats.foreach { r =>
      assert(r.getAs[Long]("n_keys") <= corpusSize)
      assert(r.getAs[Long]("max_occupancy") >= 1L)
    }
    // every verified near-dup pair collided in >= 1 table, so the summed
    // per-table pair counts bound the verified set from above
    val verified = Dedup.simhash(spark, dir).count()
    assert(stats.map(_.getAs[Long]("cand_pairs")).sum >= verified)
  }

  test("dedup waterfall: stages are disjoint, survivors strictly account for every removal") {
    val stages = Dedup.dedupWaterfall(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r).toMap
    assert(stages.keySet === Set("1_exact", "2_near_dup", "3_containment"))
    val total = Dedup.corpus(spark, dir).count()
    val n1 = stages("1_exact").getAs[Long]("n_removed")
    val n2 = stages("2_near_dup").getAs[Long]("n_removed")
    val n3 = stages("3_containment").getAs[Long]("n_removed")
    // the injected corpus plants exact copies (doc_id%7) and truncated
    // near-copies (doc_id%11): stages 1 and 2 must both fire
    assert(n1 > 0L && n2 > 0L)
    assert(stages("1_exact").getAs[Long]("survivors") === total - n1)
    assert(stages("2_near_dup").getAs[Long]("survivors") === total - n1 - n2)
    assert(stages("3_containment").getAs[Long]("survivors") === total - n1 - n2 - n3)
    stages.values.foreach { r =>
      if (r.getAs[Long]("n_removed") > 0) assert(r.getAs[Long]("chars_removed") > 0L)
    }
  }

  test("mix anneal: phase allocations respect their budgets and the boost tracks the mix weight") {
    val mix = TextFunctions.domainMix(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("mix_weight")).toMap
    val rows = TextFunctions.mixAnneal(spark, dir).collect()
    val corpusTokens = TextFunctions.domainMix(spark, dir)
      .agg(sum(col("total_tokens"))).collect().head.getLong(0)
    val b1 = corpusTokens * 4 / 5; val b2 = corpusTokens - b1
    // floor-allocation never overshoots a phase budget
    assert(rows.map(_.getAs[Long]("alloc_phase1")).sum <= b1)
    assert(rows.map(_.getAs[Long]("alloc_phase2")).sum <= b2)
    rows.foreach { r =>
      val boost = r.getAs[Double]("anneal_boost")
      val w = mix(r.getAs[String]("source"))
      // the anneal up-weights exactly the sources the mix planner does
      // (floor rounding keeps the ratio within a hair of mix_weight)
      if (w > 1.05) assert(boost > 1.0)
      if (w < 0.95) assert(boost < 1.0)
    }
  }

  test("token histogram: buckets partition the corpus and respect their power-of-two walls") {
    val hist = TextFunctions.tokenHistogram(spark, dir).collect()
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(hist.map(_.getAs[Long]("n_docs")).sum === nDocs)
    hist.foreach { r =>
      val b = r.getAs[Long]("log2_bucket")
      val floor = r.getAs[Long]("bucket_floor")
      assert(floor === (1L << b.toInt))
      assert(r.getAs[Long]("min_tokens") >= floor || b === 0L)
      assert(r.getAs[Long]("max_tokens") < (floor << 1) || b === 17L)
    }
  }

  test("vocab growth: cumulative vocabulary lands exactly on the corpus vocabulary") {
    val rows = TextFunctions.vocabGrowth(spark, dir).collect().sortBy(_.getAs[Long]("decile"))
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split(graft.text.TextFunctions.normText(col("text")), " ")).as("t"))
      .where(length(col("t")) >= 1).select("t").distinct().count()
    assert(rows.last.getAs[Long]("vocab_cum") === vocab)
    assert(rows.last.getAs[Long]("docs_cum") ===
      Tables.load(spark, dir, "documents").count())
    // cumulative columns are running sums of the per-decile columns
    rows.foldLeft((0L, 0L)) { case ((docs, voc), r) =>
      val d = docs + r.getAs[Long]("n_docs"); val v = voc + r.getAs[Long]("new_terms")
      assert(r.getAs[Long]("docs_cum") === d)
      assert(r.getAs[Long]("vocab_cum") === v)
      (d, v)
    }
    ()
  }

  test("salted join: bucket replication neither loses nor duplicates events") {
    val rows = Relational.saltedJoin(spark, dir).collect()
    val nEvents = Tables.load(spark, dir, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === nEvents)
    assert(rows.map(_.getAs[Long]("k")).toSet === Set(0L, 1L, 2L, 3L, 4L))
    rows.foreach(r => assert(r.getAs[Long]("w") === r.getAs[Long]("k") * 100L + 7L))
  }

  test("zipf check: full head, non-negative spread, envelope contains the mean") {
    val r = TextFunctions.zipfCheck(spark, dir).collect().head
    // head covers min(100, |vocab|) — the smoke corpus has a tiny vocabulary
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split(graft.text.TextFunctions.normText(col("text")), " ")).as("t"))
      .where(length(col("t")) >= 1).select("t").distinct().count()
    assert(r.getAs[Long]("n_terms") === math.min(100L, vocab))
    val mean = r.getAs[Double]("mean_rf")
    assert(r.getAs[Long]("min_rf").toDouble <= mean && mean <= r.getAs[Long]("max_rf").toDouble)
    assert(r.getAs[Double]("cv_rf") >= 0.0)
  }
}
