package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming monitoring aggregates: the continuous form of
  * graft.cdc.Monitoring (reference: metrics_collector / dashboard
  * events-over-time / alert_engine), as watermarked window aggregations.
  */
object WindowedMetrics {

  /** Events-per-minute over a watermarked stream — the dashboard
    * events-over-time series, continuously maintained. */
  def eventsPerWindow(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("op"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("bucket"), col("op"), col("n_events"))

  /** Streaming threshold alert: windows whose delete/error count exceeds
    * the rule threshold (alert_engine._evaluate_rule, continuous form). */
  def alertStream(events: DataFrame, threshold: Long = 5,
                  watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .where(col("op") === "d")
      .groupBy(window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_errors"))
      .where(col("n_errors") > threshold)
      .select(col("window.start").as("bucket"), col("n_errors"),
        lit("r_error_burst").as("rule_id"), lit("critical").as("severity"))
}
