package graft.sinks

import graft.cdc.Materialize
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-backed table sink with the reference's JDBC-sink apply semantics
  * (reference: backend/ingestion/sink_config.py — insert.mode=upsert,
  * delete.enabled, pk.mode=record_key), expressed as parquet state.
  *
  * Scale notes: the snapshot is written hash-distributed by PK so a later
  * upsert merge co-partitions without a sort; the merge itself is one
  * shuffle by PK. Against a warehouse this maps to `df.write.jdbc` or a
  * MERGE INTO on a lakehouse table — the changelog algebra is identical.
  */
object TableSink {

  /** Full-load snapshot write (transfer.py equivalent): hash-distributed
    * by key for later co-partitioned merges. */
  def writeSnapshot(df: DataFrame, keyCol: String, path: String, nBuckets: Int = 32): Unit =
    df.repartition(nBuckets, col(keyCol))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Apply a changelog increment to the stored state: latest change per
    * key wins across {stored state ∪ increment}; deletes drop keys.
    * Writes the new state and returns it.
    *
    * Precondition: increments are at-or-after the applied watermark (true
    * when seq is the apply order and the checkpoint advances monotonically)
    * — the clean state table keeps no tombstones, so an increment older
    * than an applied delete would resurrect the key. For unordered replays
    * use [[graft.cdc.Materialize.snapshotHandoff]]'s compacted-changelog
    * form, which retains tombstones. */
  def upsert(spark: SparkSession, path: String, changes: DataFrame, nBuckets: Int = 32): DataFrame = {
    val existing = readState(spark, path)
      // stored state re-enters the merge as a synthetic "create" older than
      // any increment row at the same (ts, seq); its weight carries the
      // cumulative per-key change count so n_changes matches a one-shot
      // batch materialization after any number of micro-batches
      .select(col("user_id").as("pk"), lit("c").as("op"),
        col("last_value").cast("double").as("value"),
        col("updated_at").as("ts"), lit(Long.MinValue).as("seq"),
        col("n_changes").as("weight"))
    val merged = Materialize.latestSnapshotWeighted(
      existing.unionByName(
        changes.select("pk", "op", "value", "ts", "seq").withColumn("weight", lit(1L))))
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    merged.repartition(nBuckets, col("user_id"))
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // Crash-safe swap: move the old state aside, then the new one in. A
    // crash between the renames leaves .bak, which readState falls back
    // to — never a window with no recoverable state. (A lakehouse table
    // format would make this a transactional commit.)
    val dst = new org.apache.hadoop.fs.Path(path)
    // path-resolved FS: FileSystem.get(conf) is the DEFAULT filesystem and
    // throws "Wrong FS" for state on s3a://… when the default is hdfs/local
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    fs.delete(bak, true)
    if (fs.exists(dst)) fs.rename(dst, bak)
    fs.rename(tmp, dst)
    fs.delete(bak, true)
    spark.read.parquet(path)
  }

  /** True when recoverable state exists at `path` — either the live table
    * or the `.bak` left by a swap that crashed between its two renames.
    * Seeding decisions MUST use this (not a bare exists(path)): after such
    * a crash the live path is absent but `.bak` holds the real state, and
    * seeding over it would orphan then delete the only copy. */
  def stateExists(spark: SparkSession, path: String): Boolean = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(live) || fs.exists(new org.apache.hadoop.fs.Path(path + ".bak"))
  }

  /** Read the state table, falling back to the `.bak` left by a swap that
    * crashed between its two renames. */
  private def readState(spark: SparkSession, path: String): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val src = if (fs.exists(live)) path else path + ".bak"
    spark.read.parquet(src)
  }

  /** Time-partitioned lake write (the reference's S3 sink with time-based
    * partitioning): rows land under dt=YYYY-MM-DD directories so readers
    * prune by date. */
  def writeTimePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", date_format(col(tsCol), "yyyy-MM-dd"))
      .repartition(col("dt"))
      .write.partitionBy("dt").mode(SaveMode.Overwrite).parquet(path)

  /** Append-only audit sink (pipeline_runs equivalent). */
  def appendAudit(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)
}
