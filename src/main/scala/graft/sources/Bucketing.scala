package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table materialization — the storage-level co-location that
  * turns repeated equi-joins and aggregations on a hot key into
  * shuffle-free scans.
  *
  * At lake scale the same join keys recur across every pipeline run
  * (customer key, document id, PK of the replicated table). Writing both
  * sides bucketed by that key with the same bucket count pins a
  * hash-partitioning INTO THE FILES: Spark's scan reports the bucketing as
  * its output partitioning, so a sort-merge join or groupBy on the key
  * plans with zero Exchange — the shuffle is paid once at write time and
  * amortized over every subsequent read (the reference re-replicates into
  * its warehouse once per pipeline for the same reason; here it is the
  * Spark-native equivalent of that landing layout).
  *
  * Bucket-count guidance at 100 TB: buckets ≈ table size / target file
  * size (e.g. 512 MB) rounded to a power of two shared by BOTH sides of
  * the hot join; mismatched counts fall back to a shuffle on one side.
  */
object Bucketing {

  /** Materialize `df` as a parquet table bucketed (and sorted) by `key`.
    * The explicit `path` keeps the data outside the warehouse dir; the
    * catalog entry is what carries the bucket spec to later readers. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, path: String, nBuckets: Int = 32): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on the join key: with
    * equal bucket counts both scans already satisfy the join's required
    * distribution, so the plan contains no Exchange. */
  def colocatedJoin(
      spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** Aggregation on the bucket key is likewise pre-distributed: one scan,
    * no exchange before the final aggregate. */
  def bucketLocalAgg(spark: SparkSession, table: String, key: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.table(table).groupBy(key).agg(count(lit(1)).as("n"))
  }
}
