package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Continuous salt advisor — the streaming twin of the batch
  * `cdc_salt_advisor` (graft.cdc.Monitoring.saltAdvisor): the apply-
  * topology decision panel (key counts, skew ratio, p99, recommended
  * salt), maintained incrementally as changes arrive instead of
  * recomputed over the whole changelog. A live pipeline reads the latest
  * row to decide when the hot-key materializer needs re-salting — the
  * panel that is consulted BEFORE the decision the reference's sink
  * config hard-codes.
  *
  * The telescoping trick ([[StreamLsnTrend]]'s pattern at the per-key
  * grain): each micro-batch reduces to (pk, n_events) rows; counts are
  * associative, so folding all batch deltas with a pk-keyed sum
  * reproduces the batch operator's per-key count table EXACTLY, and the
  * count-of-counts + window tail (SHARED code:
  * Monitoring.saltAdvisorFromPerKey) then emits the identical panel —
  * streamed ≡ batch bit-for-bit on any replay split (spec-pinned).
  *
  * Scale shape: delta rows per batch are bounded by the batch's key
  * span; the fold is one map-side-combined sum keyed by pk (the same
  * shuffle the batch op pays once) and the decision tail runs over the
  * count-of-counts table, bounded by distinct count VALUES. Writes are
  * batch_id-partitioned dynamic overwrite and the fold takes only
  * batches ≤ its own id — the [[ConsumerLag]]/[[LagSla]] idempotency
  * pattern, so an at-least-once replay overwrites its own partition and
  * never double-counts.
  */
object StreamSaltAdvisor {

  final case class Config(
      wirePath: String,
      statePath: String,
      checkpointPath: String,
      targetPerTask: Long = 10000L)

  private def deltasPath(cfg: Config) = s"${cfg.statePath}/deltas"
  private def reportPath(cfg: Config) = s"${cfg.statePath}/report"

  private val deltaSchema = StructType(Seq(
    StructField("pk", LongType),
    StructField("n_events", LongType)))

  private def readStateOr(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p))
      spark.read.schema(schema.add("batch_id", LongType)).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema.add("batch_id", LongType))
  }

  /** One batch of pk arrivals reduced to the per-key grain. */
  private[graft] def batchDeltas(batch: DataFrame): DataFrame =
    batch.groupBy("pk").agg(count(lit(1)).as("n_events"))

  def start(spark: SparkSession, cfg: Config): StreamingQuery =
    graft.sources.WireSource.readStream(spark, cfg.wirePath)
      .writeStream
      .option("checkpointLocation", cfg.checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // pk off the parsed envelope: a delete carries only `before`
        monitorBatch(spark, cfg,
          batch.select(coalesce(col("after.user_id"), col("before.user_id")).as("pk")),
          batchId)
      }
      .start()

  /** One micro-batch: persist this batch's per-key deltas, fold every
    * delta with batch_id ≤ this one into the per-key count table, and
    * emit the advisor panel through the SHARED batch decision tail.
    * Exposed for direct batch use (replay tests drive it directly). */
  private[graft] def monitorBatch(
      spark: SparkSession, cfg: Config, batch: DataFrame, batchId: Long): Unit = {
    val deltas = batchDeltas(batch).withColumn("batch_id", lit(batchId))
    def writePartitioned(df: DataFrame, path: String): Unit =
      df.write.partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(path)
    writePartitioned(deltas, deltasPath(cfg))
    // fold: counts are associative — the pk-keyed sum over all deltas IS
    // the batch operator's per-key count table
    val perKey = readStateOr(spark, deltasPath(cfg), deltaSchema)
      .where(col("batch_id") < batchId)
      .unionByName(deltas)
      .groupBy("pk")
      .agg(sum(col("n_events")).as("cnt"))
    val report = graft.cdc.Monitoring
      .saltAdvisorFromPerKey(perKey, cfg.targetPerTask)
      .withColumn("batch_id", lit(batchId))
    writePartitioned(report, reportPath(cfg))
  }

  /** The emitted per-batch panel history (one row per micro-batch). */
  private[graft] def panel(spark: SparkSession, cfg: Config): DataFrame = {
    val schema = StructType(Seq(
      StructField("n_keys", LongType),
      StructField("n_events", LongType),
      StructField("mean_events_per_key", DoubleType),
      StructField("p99_events_per_key", LongType),
      StructField("max_events_per_key", LongType),
      StructField("skew_ratio", DoubleType),
      StructField("recommended_salt", LongType),
      StructField("needs_salting", BooleanType)))
    readStateOr(spark, reportPath(cfg), schema)
  }
}
