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

  /** Continuous sessionization: Spark's native session_window — gap-based
    * sessions maintained incrementally with watermarked state eviction
    * (the streaming form of Relational.sessionize). State per open
    * session, keyed (pk, session) — scales with live keys. */
  def sessionStream(events: DataFrame, gap: String = "30 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("pk"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("pk"),
        col("session_window.start").as("t_start"),
        col("session_window.end").as("t_end"),
        col("n_events"))

  /** Stream-stream interval join: change events enriched with the alerts
    * active in the preceding hour — both sides watermarked so join state
    * is evicted once the interval can no longer match (the canonical
    * bounded-state stream join; unbounded joins are rejected by Spark).
    * `alerts` columns: (rule_ts, rule_pk_cohort); events join on cohort
    * with rule_ts ∈ [ts − 1h, ts]. */
  def enrichWithAlerts(changes: DataFrame, alerts: DataFrame): DataFrame = {
    val c = changes.withWatermark("ts", "1 hour")
    val a = alerts.withWatermark("rule_ts", "2 hours")
    c.join(a,
      col("pk") % 10 === col("rule_pk_cohort") &&
        col("rule_ts") >= col("ts") - expr("INTERVAL 1 HOUR") &&
        col("rule_ts") <= col("ts"),
      "inner")
      .select(col("pk"), col("seq"), col("ts"), col("rule_ts"), col("rule_pk_cohort"))
  }
}
