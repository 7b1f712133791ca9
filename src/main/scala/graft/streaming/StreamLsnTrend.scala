package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Continuous LSN-latency trend — the streaming twin of the batch
  * `cdc_lsn_latency_trend` (graft.cdc.Monitoring.lsnLatencyTrend; the
  * reference serves the same chart live from api.py:8261's
  * lsn-latency-trend endpoint): after every micro-batch, per 10-minute
  * bucket, the source log position (running max LSN), the position a
  * 6-bucket-behind consumer has processed, their gap, and the pending
  * count — the dashboard trend, updated as events arrive instead of
  * recomputed over the whole history.
  *
  * The telescoping trick ([[JitterMonitor]]'s pattern, simpler here
  * because the per-bucket grain needs no boundary recovery): each batch
  * reduces to (bucket_id, bucket_max LSN, n_arrived) rows; max and count
  * are associative, so folding all batch deltas with a bucket-keyed
  * re-aggregation reproduces the batch operator's per-bucket aggregate
  * EXACTLY, and the spine/running-max/lag windows then run over the same
  * bounded |buckets|-row trend — the emitted report matches the batch op
  * bit-for-bit on an in-order replay (the spec pins that equality).
  *
  * Scale shape: state rows per batch are bounded by the batch's bucket
  * span (≤ |buckets| total after folding); writes are batch_id-partitioned
  * dynamic overwrite and the report folds only batches ≤ its own id — the
  * [[ConsumerLag]]/[[LagSla]] idempotency pattern, so an at-least-once
  * replay overwrites its own partition and never double-counts.
  */
object StreamLsnTrend {

  final case class Config(
      wirePath: String,
      statePath: String,
      checkpointPath: String,
      bucketMs: Long = 600000L,
      horizonBuckets: Int = 6)

  private def deltasPath(cfg: Config) = s"${cfg.statePath}/deltas"
  private def reportPath(cfg: Config) = s"${cfg.statePath}/report"

  private val deltaSchema = StructType(Seq(
    StructField("bucket_id", LongType),
    StructField("bucket_max", LongType),
    StructField("n_arrived", LongType)))

  private def readStateOr(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(schema.add("batch_id", LongType)).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema.add("batch_id", LongType))
  }

  /** One batch of (ts_ms, lsn) arrivals reduced to the per-bucket grain:
    * the bucket's max LSN and arrival count — everything the fold needs. */
  private[graft] def batchDeltas(batch: DataFrame, bucketMs: Long): DataFrame =
    batch
      .select(expr(s"ts_ms div $bucketMs").as("bucket_id"), col("lsn"))
      .groupBy("bucket_id")
      .agg(max(col("lsn")).as("bucket_max"), count(lit(1)).as("n_arrived"))

  def start(spark: SparkSession, cfg: Config): StreamingQuery =
    graft.sources.WireSource.readStream(spark, cfg.wirePath)
      .writeStream
      .option("checkpointLocation", cfg.checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        monitorBatch(spark, cfg,
          batch.select(col("ts_ms"), col("offset").as("lsn")), batchId)
      }
      .start()

  /** One micro-batch: persist this batch's per-bucket deltas, then fold
    * every delta with batch_id ≤ this one into the cumulative trend.
    * Exposed for direct batch use (replay tests drive it directly). */
  private[graft] def monitorBatch(
      spark: SparkSession, cfg: Config, batch: DataFrame, batchId: Long): Unit = {
    val deltas = batchDeltas(batch, cfg.bucketMs).withColumn("batch_id", lit(batchId))
    def writePartitioned(df: DataFrame, path: String): Unit =
      df.write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(path)
    writePartitioned(deltas, deltasPath(cfg))
    // fold: max/count are associative, so the bucket re-aggregation over
    // all deltas IS the batch operator's per-bucket aggregate
    val agg = readStateOr(spark, deltasPath(cfg), deltaSchema)
      .where(col("batch_id") < batchId)
      .unionByName(deltas)
      .groupBy("bucket_id")
      .agg(max(col("bucket_max")).as("bucket_max"),
        sum(col("n_arrived")).as("n_arrived"))
    // identical spine + window tail to Monitoring.lsnLatencyTrend — over
    // the bounded pre-aggregated trend only (the window-audit exception)
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket_id")
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val spine = agg.agg(min(col("bucket_id")).as("lo"), max(col("bucket_id")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("bucket_id"))
    val report = spine.join(agg, Seq("bucket_id"), "left")
      .withColumn("n_arrived", coalesce(col("n_arrived"), lit(0L)))
      .withColumn("source_lsn", max(col("bucket_max")).over(cum))
      .withColumn("processed_lsn", lag(col("source_lsn"), cfg.horizonBuckets).over(w))
      .withColumn("cum_n", sum(col("n_arrived")).over(cum))
      .withColumn("n_pending",
        col("cum_n") - coalesce(lag(col("cum_n"), cfg.horizonBuckets).over(w), lit(0L)))
      .select(
        timestamp_millis(col("bucket_id") * cfg.bucketMs).as("bucket"),
        col("source_lsn"),
        coalesce(col("processed_lsn"), lit(0L)).as("processed_lsn"),
        (col("source_lsn") - coalesce(col("processed_lsn"), lit(0L))).as("lsn_gap"),
        col("n_arrived"), col("n_pending"))
      .withColumn("batch_id", lit(batchId))
    writePartitioned(report, reportPath(cfg))
  }

  /** Read back the per-batch cumulative trend report. */
  def trend(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(reportPath(cfg))
      .withColumn("batch_id", col("batch_id").cast("long"))
      .orderBy("batch_id", "bucket")
}
