package graft

import graft.analytics.Relational
import graft.cdc.Monitoring
import graft.multimodal.Binary
import graft.similarity.Ann
import graft.text.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics checks for the round-10 second operator batch (corpus
  * analytics + operational telemetry).
  */
class Round10bSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("sentence stats: counts are consistent and a known shape segments right") {
    val rows = TextFunctions.sentenceStats(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_sentences")
      val nw = r.getAs[Long]("n_words")
      val mx = r.getAs[Long]("max_words_per_sentence")
      assert(ns >= 0 && nw >= 0)
      assert(mx * ns >= nw, "max*count bounds the total")
      if (ns > 0)
        assert(math.abs(r.getAs[Double]("mean_words_per_sentence") - nw.toDouble / ns) < 1e-12)
    }
    // independent recount on one doc
    val doc = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect().head
    val expected = doc.getAs[String]("text").split("[.!?]+")
      .map(_.trim).count(_.nonEmpty)
    val got = rows.find(_.getAs[Long]("doc_id") == doc.getAs[Long]("doc_id")).get
    assert(got.getAs[Long]("n_sentences") == expected)
  }

  test("hapax: shares bounded, hapax terms really occur once corpus-wide") {
    val rows = TextFunctions.hapax(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hapax") <= r.getAs[Long]("n_vocab"))
      assert(r.getAs[Long]("n_vocab") <= r.getAs[Long]("n_tokens"))
      val ts = r.getAs[Double]("hapax_token_share")
      val vs = r.getAs[Double]("hapax_vocab_share")
      assert(ts >= 0.0 && ts <= 1.0 && vs >= ts - 1e-12)
    }
    // cross-check the corpus hapax count against an independent derivation
    val toks = Tables.load(spark, dir, "documents")
      .select(explode(split(TextFunctions.normText(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 1)
    val nHapax = toks.groupBy("term").count().where(col("count") === 1).count()
    assert(rows.map(_.getAs[Long]("n_hapax")).sum == nHapax)
  }

  test("readability: formulas reproduce from the counts") {
    val rows = TextFunctions.readability(spark, dir).collect()
    rows.foreach { r =>
      val wps = r.getAs[Long]("n_words").toDouble / r.getAs[Long]("n_sentences")
      val spw = r.getAs[Long]("n_syllables").toDouble / r.getAs[Long]("n_words")
      assert(r.getAs[Double]("fk_grade") == (0.39 * wps + 11.8 * spw) - 15.59)
      assert(r.getAs[Double]("flesch_ease") == (206.835 - 1.015 * wps) - 84.6 * spw)
      assert(r.getAs[Long]("n_sentences") >= 1)
    }
  }

  test("quality by lang: partitions the corpus, pass share matches the score rule") {
    val rows = TextFunctions.qualityByLang(spark, dir).collect()
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val share = r.getAs[Double]("pass_share")
      assert(share >= 0.0 && share <= 1.0)
      assert(r.getAs[Long]("n_pass") <= r.getAs[Long]("n_docs"))
    }
  }

  test("dml mix trend: shares partition each day, deltas telescope") {
    val rows = Monitoring.dmlMixTrend(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_ins") + r.getAs[Long]("n_upd") + r.getAs[Long]("n_del")
        == r.getAs[Long]("n_total"))
    }
    // first day's delta is pinned to zero (no prior day)
    assert(rows.head.getAs[Double]("upd_share_delta") == 0.0)
  }

  test("event size percentiles: order statistics are ordered and within range") {
    val rows = Monitoring.eventSizePercentiles(spark, dir).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (mn, p50, p90, p99, mx) = (r.getAs[Long]("min_bytes"), r.getAs[Long]("p50_bytes"),
        r.getAs[Long]("p90_bytes"), r.getAs[Long]("p99_bytes"), r.getAs[Long]("max_bytes"))
      assert(mn <= p50 && p50 <= p90 && p90 <= p99 && p99 <= mx)
    }
  }

  test("hot key share: count-of-counts tail matches a brute-force top-1% computation") {
    val r = Monitoring.hotKeyShare(spark, dir).collect().head
    val perKey = Tables.load(spark, dir, "events")
      .groupBy("user_id").count().collect().map(_.getAs[Long]("count")).sortBy(-_)
    val kTop = math.ceil(perKey.length * 0.01).toLong.toInt
    assert(r.getAs[Long]("n_keys") == perKey.length)
    assert(r.getAs[Long]("n_top_keys") == kTop)
    assert(r.getAs[Long]("max_events_per_key") == perKey.head)
    assert(r.getAs[Long]("top_key_events") == perKey.take(kTop).sum,
      "cumulative count-of-counts tail must equal the brute-force top-k sum")
    assert(r.getAs[Double]("top_key_share") >= kTop.toDouble / perKey.length - 1e-12,
      "top keys carry at least their uniform share")
  }

  test("cumulative uniques: monotone, capped by total uniques, news sum to the cap") {
    val rows = Relational.cumulativeUniques(spark, dir).collect()
    val total = Tables.load(spark, dir, "events")
      .select(countDistinct(col("user_id"))).collect().head.getLong(0)
    val cums = rows.map(_.getAs[Long]("cum_uniques"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "cumulative is monotone")
    assert(cums.last == total)
    assert(rows.map(_.getAs[Long]("n_new")).sum == total)
    rows.foreach(r => assert(r.getAs[Long]("n_active") >= r.getAs[Long]("n_new")))
  }

  test("lsh occupancy: shares sum to 1, expected probe cost >= uniform baseline") {
    val rows = Ann.lshOccupancy(spark, dir).collect()
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    val n = rows.map(_.getAs[Long]("n_vectors")).sum
    val probeCost = rows.map(_.getAs[Double]("expected_probe_cost")).sum
    assert(probeCost >= n.toDouble / 256 - 1e-6,
      "sum n_b^2/N is minimized by uniform occupancy")
  }

  test("exact dup vectors: totals reconcile") {
    val r = Ann.exactDupVectors(spark, dir).collect().head
    val n = Tables.load(spark, dir, "embeddings").count()
    assert(r.getAs[Long]("n_vectors") == n)
    assert(r.getAs[Long]("n_distinct") <= n)
    assert(r.getAs[Long]("n_clone_vectors") >= 2 * r.getAs[Long]("n_dup_groups")
      || r.getAs[Long]("n_dup_groups") == 0)
    assert(r.getAs[Long]("max_group") >= 1)
  }

  test("event attribution: every purchase is counted once, gaps are non-negative") {
    val rows = Monitoring.dmlMixTrend(spark, dir) // warm-up shared scan
    assert(rows.collect().nonEmpty)
    val att = Relational.eventAttribution(spark, dir).collect()
    val nPurch = Tables.load(spark, dir, "events")
      .where(col("event_type") === "purchase").count()
    assert(att.map(_.getAs[Long]("n_purchases")).sum == nPurch)
    att.foreach { r =>
      assert(Set("click", "view", "signup", "error", "none")(r.getAs[String]("touch_type")))
      assert(r.getAs[Double]("mean_gap_ms") >= 0.0)
      assert(r.getAs[Long]("max_gap_ms") >= 0L)
    }
    // a purchase's touch can never be a purchase
    assert(!att.exists(_.getAs[String]("touch_type") == "purchase"))
  }

  test("lsh tune: S-curve behaves (more rows per band = fewer false catches)") {
    val rows = graft.dedup.Dedup.lshTune(spark, dir).collect()
      .sortBy(_.getAs[Long]("rows_per_band"))
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Double]("exp_recall") >= 0.0 && r.getAs[Double]("exp_recall") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("exp_precision") >= 0.0 && r.getAs[Double]("exp_precision") <= 1.0)
    }
    // monotonicity of the S-curve family: raising r (at b·r = 16) can only
    // cut the expected false catches, and recall never increases
    val falses = rows.map(_.getAs[Double]("exp_false_caught"))
    assert(falses.zip(falses.tail).forall { case (a, b) => b <= a + 1e-9 })
    val recalls = rows.map(_.getAs[Double]("exp_recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a + 1e-9 })
  }

  test("table activity: freshest table is not idle, idle math reconciles") {
    val rows = Monitoring.tableActivity(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.exists(_.getAs[Long]("idle_ms") == 0L), "the hwm topic has zero staleness")
    rows.foreach { r =>
      assert(r.getAs[Long]("idle_ms") >= 0L)
      assert(r.getAs[Boolean]("idle") == (r.getAs[Long]("idle_ms") > 3600000L))
      assert(r.getAs[Double]("events_per_hour") > 0.0)
    }
  }

  test("recall curve: k=10 point matches recall_eval, curve values are sane") {
    val curve = Ann.recallCurve(spark, dir).collect().sortBy(_.getAs[Long]("k"))
    assert(curve.length == 10)
    curve.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("k"))
      val rc = r.getAs[Double]("recall_at_k")
      assert(rc >= 0.0 && rc <= 1.0)
    }
    val eval = Ann.recallEval(spark, dir).collect().head
    val evalRecall = eval.getAs[Long]("n_common").toDouble / eval.getAs[Long]("n_brute")
    assert(math.abs(curve.last.getAs[Double]("recall_at_k") - evalRecall) < 1e-12,
      "the curve's k=10 point must equal the scalar recall_eval")
  }

  test("audio silence: run bookkeeping is internally consistent") {
    val rows = Binary.audioSilence(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_samples")
      val silent = r.getAs[Long]("n_silent")
      val longest = r.getAs[Long]("longest_run")
      val lead = r.getAs[Long]("lead_silence")
      val trail = r.getAs[Long]("trail_silence")
      assert(silent <= n)
      assert(longest <= silent)
      assert(lead <= silent && trail <= silent,
        "leading/trailing silence are silent samples")
      assert(longest >= math.max(lead, trail) || silent == n,
        "the longest run bounds the edge runs")
    }
  }
}
