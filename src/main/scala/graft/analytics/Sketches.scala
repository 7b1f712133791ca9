package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch-based forms of the exact operators — the 100 TB path.
  *
  * The oracle-gated queries (q_percentile_cont, q_agg_stats, text token
  * stats) are EXACT: right for the correctness gate, but exact
  * percentiles need the full value set per group and exact distinct
  * counts need a full dedup shuffle. At lake scale the drop-ins here
  * trade bounded relative error for one-pass mergeable state:
  *   - HyperLogLog++ (`approx_count_distinct`) — fixed-size sketch per
  *     group, merged map-side like any partial aggregate.
  *   - KLL/GK quantiles (`approx_percentile` with an accuracy knob).
  *
  * Both are Spark built-ins with map-side partial aggregation, so the
  * shuffle carries sketches, not values. Accuracy contracts are asserted
  * against the exact operators in SketchesSpec.
  */
object Sketches {

  /** Per-priority order-value quantiles via approx_percentile: the
    * sketch form of Relational.percentileCont. `accuracy` ≈ 1/ε. */
  def approxOrderPercentiles(spark: SparkSession, dir: String, accuracy: Int = 10000): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).as("n_orders"),
        expr(s"approx_percentile(o_totalprice, array(0.25, 0.5, 0.9), $accuracy)").as("qs"))
      .select(col("o_orderpriority"), col("n_orders"),
        element_at(col("qs"), 1).as("p25"),
        element_at(col("qs"), 2).as("p50"),
        element_at(col("qs"), 3).as("p90"))
      .orderBy("o_orderpriority")

  /** Per-source distinct-user and distinct-token estimates via HLL++:
    * the sketch form of the exact countDistinct aggregations. `rsd` is
    * the target relative standard deviation. */
  def approxCorpusDistinct(spark: SparkSession, dir: String, rsd: Double = 0.02): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        approx_count_distinct(col("token"), rsd).as("approx_distinct_tokens"))
      .orderBy("source")

  /** Exact twin used by the accuracy contract in SketchesSpec. */
  private[graft] def exactCorpusDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("source"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .groupBy("source")
      .agg(countDistinct(col("token")).as("exact_distinct_tokens"))

  /** Heavy hitters via a Count-Min structure built in DataFrame algebra:
    * `depth` hash rows × `width` buckets, counts aggregated map-side, the
    * estimate for a probe term = min over rows of its bucket counts.
    * At lake scale the exact term table needs a full (term) shuffle with
    * |vocabulary| keys; the CMS shuffle carries at most depth×width keys
    * (4096 here) regardless of corpus size, and rows merge additively —
    * the same property that makes it a streaming-state fit. CMS only
    * OVERcounts (collisions add), so estimate ≥ exact always; SketchesSpec
    * pins that bound and the N·depth/width error ceiling.
    *
    * The probe set here is the exact top-k (so the accuracy contract can
    * compare); a deployment probes whatever candidate stream it wants. */
  def approxHeavyHitters(spark: SparkSession, dir: String, topK: Int = 20,
                         depth: Int = 4, width: Int = 1024): DataFrame = {
    val tokens = Tables.load(spark, dir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .where(length(col("token")) >= 3)
    def rowBuckets = array((0 until depth).map { i =>
      struct(lit(i).as("row"), pmod(xxhash64(col("token"), lit(i)), lit(width)).as("bucket"))
    }: _*)
    val cms = tokens
      .select(explode(rowBuckets).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val exact = tokens.groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("token"))
      .limit(topK)
    exact
      .select(col("token"), col("exact_cnt"), explode(rowBuckets).as("rb"))
      .select(col("token"), col("exact_cnt"),
        col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("row", "bucket"))
      .groupBy("token", "exact_cnt")
      .agg(min(col("cnt")).as("cms_cnt"))
      .orderBy(col("exact_cnt").desc, col("token"))
  }
}
