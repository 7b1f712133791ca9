package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FROZEN multi-stage sentinel queries (r15 verdict item 3).
  *
  * The 10 single-stage sentinels estimate ambient drift well for
  * single-stage plans, but the r15 profiling finding is that ambient
  * load amplifies PER-STAGE: a 4-exchange plan drifts roughly as the
  * per-stage factor compounded, so the single-stage ratio under-prices
  * multi-stage drift and the 1.4–1.6× watch band was unadjudicable —
  * code creep and stage-coupled weather looked identical.
  *
  * These three queries sample the multi-stage regime: SNAPSHOTS of
  * three registered operators' r16 plans, fully inlined (no calls into
  * operator modules beyond Tables.load), to be left untouched forever —
  * an edit would re-point the yardstick the way operator edits never
  * move the frozen single-stage set. Bench times them every pass and
  * emits `sentinel_ratio_multi` beside the single-stage ratio; a
  * watch-band query's drift is judged against the sentinel class
  * matching its own stage count. Frozen medians:
  * BASELINE_SENTINELS_MULTI.json (r16 clean window).
  */
object SentinelsMulti {

  private val frozenStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")

  private def frozenNormText(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Snapshot of text_tfidf @ r16: one (source,term) aggregation, a
    * term-partitioned df window, a source-partitioned mass window, a
    * broadcast scalar, and a rank window — the 2-window text shape the
    * verdict asked for (4 exchanges + 3 window sorts). */
  def msTextTfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tf = docs
      .select(col("source"), explode(split(frozenNormText(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 3 && !col("term").isInCollection(frozenStopwords))
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val bySource = org.apache.spark.sql.expressions.Window.partitionBy("source")
    val byTerm = org.apache.spark.sql.expressions.Window.partitionBy("term")
    val nSources = docs.agg(countDistinct(col("source")).as("n_sources"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("score").desc, col("term"))
    tf.withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("source_terms", sum(col("tf")).over(bySource))
      .crossJoin(broadcast(nSources))
      .withColumn("score",
        (col("tf").cast("double") / col("source_terms").cast("double")) *
          (col("n_sources").cast("double") / col("df").cast("double")))
      .withColumn("rank", row_number().over(rk).cast("long"))
      .where(col("rank") <= 3)
      .select("source", "term", "tf", "df", "score", "rank")
      .orderBy("source", "rank")
  }

  /** A 3-exchange dedup shape (the dedup_shingle_df_hist family's
    * spine): 5-gram digest fan-out → per-digest document frequency →
    * per-doc dup-gram share → share-decile histogram. */
  def msDedupShingleDf(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(frozenNormText(col("text")), " ").as("w"))
      .select(col("doc_id"), explode(array_distinct(transform(
        sequence(lit(1), greatest(size(col("w")) - 4, lit(1))),
        i => conv(substring(md5(concat_ws(" ", slice(col("w"), i, lit(5)))), 1, 15), 16, 10)
          .cast("long")))).as("gh"))
    val withDf = grams
      .withColumn("gdf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("gh")))
    withDf
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(floor(col("n_dup") * 10L / greatest(col("n_grams"), lit(1L))).as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("n_docs"))
      .orderBy("decile")
  }

  /** A CDC latest+rollup shape: per-key argmax materialization (one pk
    * shuffle), a daily rollup (one day shuffle), and a cumulative
    * window over the bounded day table. */
  def msCdcLatestRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id").as("pk"), col("ts"), col("event_id").as("seq"),
        col("event_type"))
    val latest = ev
      .groupBy("pk")
      .agg(max(struct(col("seq"), col("ts"), col("event_type"))).as("m"))
      .select(col("pk"), col("m.ts").as("ts"), col("m.event_type").as("event_type"))
    val daily = latest
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_keys"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    daily
      .withColumn("cum_keys", sum(col("n_keys")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .orderBy("day")
  }

  /** Registry for Bench: name → query. Never reordered, never edited. */
  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "ms_text_tfidf" -> ((s, d) => msTextTfidf(s, d)),
    "ms_dedup_shingle_df" -> ((s, d) => msDedupShingleDf(s, d)),
    "ms_cdc_latest_rollup" -> ((s, d) => msCdcLatestRollup(s, d)))
}
