package graft

import org.scalatest.funsuite.AnyFunSuite

/** Parallelism-invariance sweep — the determinism property that matters
  * at cluster scale: the SAME query must produce the SAME rows whether it
  * runs over 4 shuffle partitions or 7 (or 20,000 on a real cluster), and
  * with AQE's runtime re-planning on or off. Floating-point aggregation
  * is the classic violator (sum order changes with partitioning) — the
  * repo's quantized-exact conventions (decimal sums, 2^40-quantized float
  * folds) exist precisely so this holds, and this spec pins it over a
  * cross-family sample of the float-heaviest registry entries.
  *
  * The sample deliberately avoids the memoized dedup shared builds: a
  * cached DataFrame pins its plan at cache time, which would make the
  * comparison vacuous rather than meaningful.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  private val sample = Seq(
    // relational: decimal-sum ratios, regression, robust stats
    "q1_agg", "q_agg_stats", "q_corr_ols", "q_mad", "q_percent_of_total",
    "q9_product_profit", "q_dow_anova", "q_yoy_growth", "q6_forecast_revenue",
    "q_runs_test", "q_benford_audit", "q_revenue_concentration",
    // cdc monitors: rate/score panels over event volumes
    "cdc_throughput", "cdc_health_score", "cdc_lag_trend",
    "cdc_robust_anomaly", "cdc_volume_forecast", "cdc_salt_advisor",
    "cdc_materialize_latest", "cdc_materialize_composite",
    // text/pipe: tf-idf, surprisal, mix math
    "text_tfidf", "text_unigram_surprisal", "text_readability",
    "pipe_temperature_mix", "pipe_mix_anneal", "pipe_domain_mix",
    // embeddings/ann: dot-product folds, quantized means
    "emb_anisotropy", "emb_pca_power", "ann_ivf_topk", "ann_pq_topk",
    "ann_kmeans_refine", "dedup_minhash_accuracy",
    // multimodal: codec reductions
    "mm_image_stats", "mm_audio_stats",
    // r12 additions: packed-argmin paragraph dedup + the advised apply
    "dedup_paragraph", "dedup_paragraph_rewrite", "cdc_materialize_advised",
    // r13 additions: the sketch twins — a GK summary's merge tree changes
    // with the layout, so these pin that Spark's QuantileSummaries
    // compaction is deterministic under it
    "emb_dim_quantiles_approx", "cdc_event_size_pcts_approx",
    "cdc_watermark_advise_approx",
    // r13 additions: sliced-vector cosine top-k + two-detector union apply
    "emb_matryoshka_recall", "pipe_decontaminate", "emb_whitening_effect")

  private def fingerprint(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq

  private def withConf(key: String, value: String)(body: => Unit): Unit = {
    val old = spark.conf.get(key)
    spark.conf.set(key, value)
    try body finally spark.conf.set(key, old)
  }

  test("results are invariant to the shuffle partition count") {
    sample.foreach { name =>
      var a: Seq[String] = null
      var b: Seq[String] = null
      withConf("spark.sql.shuffle.partitions", "4") { a = fingerprint(name) }
      withConf("spark.sql.shuffle.partitions", "7") { b = fingerprint(name) }
      assert(a == b,
        s"$name changes rows with the shuffle partition count: " +
          s"${a.diff(b).take(2)} vs ${b.diff(a).take(2)}")
    }
  }

  test("results are invariant to AQE on/off") {
    sample.foreach { name =>
      var a: Seq[String] = null
      var b: Seq[String] = null
      withConf("spark.sql.adaptive.enabled", "true") { a = fingerprint(name) }
      withConf("spark.sql.adaptive.enabled", "false") { b = fingerprint(name) }
      assert(a == b,
        s"$name changes rows with AQE: ${a.diff(b).take(2)} vs ${b.diff(a).take(2)}")
    }
  }
}
