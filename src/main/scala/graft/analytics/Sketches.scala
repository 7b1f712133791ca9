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
}
