package graft.cdc

import graft.dec
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog → table-state operators: the Spark-native equivalent of the
  * reference's JDBC-sink apply semantics (upsert on PK, delete removes —
  * reference: backend/ingestion/sink_config.py insert.mode=upsert +
  * delete.enabled) and its full-load snapshot copy
  * (reference: backend/ingestion/transfer.py:193-1150).
  *
  * Scale notes: [[latestSnapshot]] is a HASH aggregation — graft_max_by
  * ([[graft.functions.MaxByHash]]) plans through ObjectHashAggregate, so
  * partial aggregation runs map-side and AQE can split skewed keys; one
  * shuffle by PK is all it costs at 100 TB. (The previous
  * `max(struct(...))` shape planned SortAggregate: struct aggregation
  * buffers are not UnsafeRow-mutable, so HashAggregateExec refused it and
  * every task sorted its whole partition by PK first.)
  */
object Materialize {

  /** `graft_max_by(payload, ord)` — latest-row argmax, hash-aggregable.
    * Registration is idempotent; every public operator entry point calls
    * it so DataFrames from any session resolve the function. */
  private def latestBy(df: DataFrame, payload: Column, ord: Column): Column =
    graft.functions.GraftFunctions.maxByCol(df, payload, ord)

  /** Advisor-wired materializer — the salt-advisor decision panel
    * ([[Monitoring.saltAdvisor]]'s `recommended_salt` formula) connected
    * to the apply topology it exists to choose, the same
    * panels-get-wired pattern as the containment blocking switch:
    * ONE bounded aggregation prices the hottest key
    * (max events-per-key, map-side combined — the panel input), the
    * advisor's ⌈max/targetPerTask⌉ clamp picks the salt, and the apply
    * runs [[latestSnapshot]] (salt 1 — no skew worth paying for; the
    * uniform test corpora land here) or [[latestSnapshotSalted]] with
    * exactly that salt. Result is provably salt-independent (both
    * operators materialize the identical last-writer-wins state), so
    * the oracle is the plain window form.
    *
    * Scale shape: the pricing pass is one per-key count collapsed to a
    * 1-row max — strictly cheaper than the apply it steers; at 100 TB it
    * is the difference between paying the two-phase shuffle always
    * (SCALE_r12: pure premium on uniform keys) and paying it exactly
    * when a straggler would otherwise exist. */
  def latestSnapshotAdvised(changelog: DataFrame, targetPerTask: Long = 10000L): DataFrame = {
    // coalesce: an empty changelog has a null max — degenerate case is
    // salt 1 (latestSnapshot of nothing = nothing), matching latestSnapshot's
    // own empty-input behavior instead of NPE-ing at plan construction
    val maxPerKey = changelog.groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
      .agg(coalesce(max(col("cnt")), lit(0L)).as("m")).collect()(0).getLong(0)
    // the advisor's exact clamp (Monitoring.saltAdvisor recommended_salt)
    val salt = math.min(32L, math.max(1L, (maxPerKey + targetPerTask - 1) / targetPerTask)).toInt
    if (salt <= 1) latestSnapshot(changelog)
    else latestSnapshotSalted(changelog, salt)
  }

  /** Current-state snapshot: last change per PK wins; a final delete drops
    * the row. Equivalent SQL: row_number() OVER (PARTITION BY pk ORDER BY
    * ts DESC, seq DESC) = 1 AND op <> 'd'. */
  def latestSnapshot(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("pk").as("user_id"))
      .agg(
        latestBy(changelog,
          struct(col("op"), col("value"), col("ts")),
          struct(col("ts"), col("seq"))).as("last"),
        count(lit(1)).as("n_changes"))
      .where(col("last.op") =!= "d")
      .select(
        col("user_id"),
        // round-to-cents in exact decimal, DOUBLE in the projection (see
        // package doc: final outputs are float64 for oracle bit-parity)
        dec(col("last.value"), 18, 2).cast("double").as("last_value"),
        col("last.ts").as("updated_at"),
        col("n_changes"))

  /** [[latestSnapshot]] with a per-row `weight` column summed into
    * n_changes — lets a compacted state row re-enter an incremental merge
    * carrying the change count it already absorbed, so incremental and
    * one-shot materialization agree on n_changes (sum is associative the
    * same way the struct max is). */
  def latestSnapshotWeighted(changelog: DataFrame): DataFrame =
    latestStateWeighted(changelog)
      .where(!col("is_deleted")).drop("is_deleted")

  /** [[latestSnapshotWeighted]] WITHOUT the tombstone drop: every key the
    * merge has ever seen stays in the output, deletes flagged
    * `is_deleted` — the batch-boundary-INDEPENDENT state form. Dropping
    * deleted keys from stored state forgets their applied watermark and
    * cumulative change count, so a delete-then-recreate split across two
    * micro-batches would materialize differently from the same events in
    * one batch; keeping the tombstone row makes the final state a pure
    * function of the event log, wherever the boundaries fell. */
  def latestStateWeighted(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("pk").as("user_id"))
      .agg(
        latestBy(changelog,
          struct(col("op"), col("value"), col("ts")),
          struct(col("ts"), col("seq"))).as("last"),
        sum(col("weight")).as("n_changes"),
        // per-key applied watermark: lets the incremental sink drop
        // micro-batch replays (seq ≤ max_seq) instead of re-counting them
        max(col("seq")).as("max_seq"))
      .select(
        col("user_id"),
        dec(col("last.value"), 18, 2).cast("double").as("last_value"),
        col("last.ts").as("updated_at"),
        col("n_changes"),
        col("max_seq"),
        (col("last.op") === "d").as("is_deleted"))

  /** Generic form of [[latestSnapshot]] for arbitrary tables: composite
    * keys, arbitrary ordering columns, arbitrary payload. `orderCols`
    * lead the struct so lexicographic max picks the latest change. */
  def latestSnapshotKeyed(
      changelog: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      payloadCols: Seq[String]): DataFrame = {
    val payload = struct((col(opCol) +: payloadCols.map(col)) ++ orderCols.map(col): _*)
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(
        latestBy(changelog, payload, struct(orderCols.map(col): _*)).as("last"),
        count(lit(1)).as("n_changes"))
      .where(col(s"last.$opCol") =!= "d")
      .select(keyCols.map(col) ++ payloadCols.map(c => col(s"last.$c").as(c)) ++
        orderCols.map(c => col(s"last.$c").as(c)) :+ col("n_changes"): _*)
  }

  /** Multi-table fan-out apply: one change stream carrying several tables
    * (the reference's table.include.list pipelines) materialized in one
    * pass — the grouping key simply extends with the routing column, so
    * it is still a single hash aggregation. */
  def fanoutApply(envelopes: DataFrame): DataFrame = {
    val changelog = envelopes.select(
      col("table_name"),
      coalesce(col("after.user_id"), col("before.user_id")).as("pk"),
      col("op"),
      timestamp_millis(col("ts_ms")).as("ts"),
      col("offset").as("seq"),
      coalesce(col("after.value"), col("before.value")).as("value"))
    latestSnapshotKeyed(changelog,
      keyCols = Seq("table_name", "pk"),
      orderCols = Seq("ts", "seq"),
      opCol = "op",
      payloadCols = Seq("value"))
      .select(col("table_name"), col("pk").as("user_id"),
        dec(col("value"), 18, 2).cast("double").as("last_value"),
        col("ts").as("updated_at"), col("n_changes"))
  }

  /** Skew-safe variant of [[latestSnapshot]]: two-phase struct max with a
    * deterministic salt, for changelogs where a handful of keys absorb a
    * disproportionate share of changes (hot rows — common in CDC). Phase 1
    * reduces each (key, salt) cell; phase 2 reduces the ≤`salt` survivors
    * per key. Exactly equal to [[latestSnapshot]]; AQE's skew splitting
    * plus map-side partials make phase 1 balance regardless of key skew. */
  def latestSnapshotSalted(changelog: DataFrame, salt: Int = 16): DataFrame =
    changelog
      .groupBy(col("pk"), pmod(col("seq"), lit(salt)).as("salt"))
      .agg(
        latestBy(changelog,
          struct(col("op"), col("value"), col("ts"), col("seq")),
          struct(col("ts"), col("seq"))).as("last"),
        count(lit(1)).as("n"))
      .groupBy(col("pk").as("user_id"))
      .agg(
        latestBy(changelog, col("last"),
          struct(col("last.ts"), col("last.seq"))).as("last"),
        sum(col("n")).as("n_changes"))
      .where(col("last.op") =!= "d")
      .select(
        col("user_id"),
        dec(col("last.value"), 18, 2).cast("double").as("last_value"),
        col("last.ts").as("updated_at"),
        col("n_changes"))

  /** SCD type-3 dimension: current value + previous value side by side —
    * the "limited history" warehouse pattern (one prior version retained
    * as a column, not a row). Last two changes per key via a rank window;
    * a key whose latest op is a delete drops out, and a key with only one
    * change has a NULL previous. Same single key-shuffle as SCD-2. */
  def scd3(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("pk").orderBy(col("ts").desc, col("seq").desc)
    changelog
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
      .groupBy(col("pk").as("user_id"))
      .agg(
        // the delete test as an INT aggregate, not max(op): a string
        // buffer slot is not UnsafeRow-mutable and would push this
        // whole-changelog aggregation onto SortAggregate. rn = 1 is
        // unique per key, so the max IS that row's predicate value.
        max(when(col("rn") === 1, (col("op") === "d").cast("int"))).as("last_is_delete"),
        max(when(col("rn") === 1, dec(col("value"), 18, 2))).as("cur_d"),
        max(when(col("rn") === 2, dec(col("value"), 18, 2))).as("prev_d"),
        max(when(col("rn") === 1, col("ts"))).as("updated_at"))
      .where(col("last_is_delete") === 0)
      .select(
        col("user_id"),
        col("cur_d").cast("double").as("current_value"),
        col("prev_d").cast("double").as("previous_value"),
        col("updated_at"))
  }

  def scd3Sql(changelogSql: String): String =
    s"""$changelogSql, ranked AS (
       |  SELECT pk, op, value, ts,
       |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn
       |  FROM changelog)
       |SELECT pk AS user_id,
       |       CAST(max(CASE WHEN rn = 1 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS current_value,
       |       CAST(max(CASE WHEN rn = 2 THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS previous_value,
       |       max(CASE WHEN rn = 1 THEN ts END) AS updated_at
       |FROM ranked WHERE rn <= 2
       |GROUP BY pk
       |HAVING max(CASE WHEN rn = 1 THEN op END) <> 'd'
       |ORDER BY user_id""".stripMargin

  /** Multi-master conflict resolution: two replication sites (derived
    * here by seq parity) write the same key space; the merge is
    * last-writer-wins on (ts, seq) with the winning site reported and a
    * conflict flag for keys both sites touched — the bidirectional-
    * replication merge a CDC product needs when a table is writable on
    * both ends. Same one-shuffle aggregation shape as the materializer. */
  def conflictResolve(changelog: DataFrame): DataFrame = {
    val site = when(col("seq") % 2 === 0, "A").otherwise("B")
    changelog
      .withColumn("site", site)
      .groupBy(col("pk").as("user_id"))
      .agg(
        latestBy(changelog,
          struct(col("op"), col("value"), col("site"), col("ts")),
          struct(col("ts"), col("seq"))).as("last"),
        countDistinct(col("site")).as("sites_touched"))
      .where(col("last.op") =!= "d")
      .select(
        col("user_id"),
        dec(col("last.value"), 18, 2).cast("double").as("resolved_value"),
        col("last.site").as("winner_site"),
        col("sites_touched"),
        (col("sites_touched") > 1).as("had_conflict"))
      .orderBy("user_id")
  }

  def conflictResolveSql(changelogSql: String): String =
    s"""$changelogSql, sited AS (
       |  SELECT pk, op, value, ts, seq,
       |         CASE WHEN seq % 2 = 0 THEN 'A' ELSE 'B' END AS site
       |  FROM changelog),
       |ranked AS (
       |  SELECT pk, op, value, site,
       |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn,
       |         count(DISTINCT site) OVER (PARTITION BY pk) AS sites_touched
       |  FROM sited)
       |SELECT pk AS user_id,
       |       CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS resolved_value,
       |       site AS winner_site, sites_touched,
       |       sites_touched > 1 AS had_conflict
       |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin

  /** SCD-2 history: each non-delete change opens a version; the next change
    * (of any op, including the delete) closes it. */
  def scd2(changelog: DataFrame): DataFrame = {
    val w = Window.partitionBy("pk").orderBy("ts", "seq")
    changelog
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .where(col("op") =!= "d")
      .select(
        col("pk").as("user_id"),
        dec(col("value"), 18, 2).cast("double").as("value"),
        col("ts").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("seq"))
  }

  /** Append-only audit records, one per change event
    * (reference: cdc_event_logger.py:544+ _commit_batch → pipeline_runs). */
  def appendAudit(changelog: DataFrame): DataFrame =
    changelog.select(
      col("seq").as("run_seq"),
      lit("CDC").as("run_type"),
      Cdc.normalizeOp(col("op")).as("event_type"),
      lit("completed").as("status"),
      col("ts").as("started_at"),
      lit(1L).as("rows_processed"),
      lit("events").as("table_name"))

  /** Exactly-once replay dedup: redelivered messages (same offset) must
    * apply once. The 10% redelivery is simulated deterministically. */
  def dedupReplay(changelog: DataFrame): DataFrame = {
    val redelivered = changelog.where(col("seq") % 10 === 0)
    // min over the CLASS RANK, not the class string: a string-valued
    // min/max buffer is not UnsafeRow-mutable and forces the per-seq
    // aggregation (over the full delivery stream) onto SortAggregate.
    // Ranks follow the normalized class names' alphabetical order, so the
    // decode below computes exactly min(normalizeOp(op)).
    val opRank = when(col("op") === "d", 0)
      .when(col("op").isin("c", "r"), 1)
      .when(col("op") === "t", 2)
      .when(col("op") === "u", 4)
      .otherwise(3)
    changelog.unionAll(redelivered)
      .groupBy(col("seq"))
      .agg(
        count(lit(1)).as("deliveries"),
        min(opRank).as("class_rank"))
      .withColumn("event_class",
        when(col("class_rank") === 0, "delete")
          .when(col("class_rank") === 1, "insert")
          .when(col("class_rank") === 2, "truncate")
          .when(col("class_rank") === 4, "update")
          .otherwise("unknown"))
      .groupBy(col("event_class"))
      .agg(
        count(lit(1)).as("unique_events"),
        sum(col("deliveries")).as("total_deliveries"))
      .orderBy("event_class")
  }

  /** Log compaction (Kafka-style): retain only the newest `keep` changes
    * per key — the changelog stays replayable to the same final state
    * while storage stays bounded. */
  def compact(changelog: DataFrame, keep: Int = 3): DataFrame = {
    val w = Window.partitionBy("pk").orderBy(col("ts").desc, col("seq").desc)
    changelog
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= keep)
      .select(col("pk").as("user_id"), col("op"), dec(col("value"), 18, 2).cast("double").as("value"),
        col("ts"), col("seq"), col("rn").cast("long").as("rn"))
  }

  /** Tombstone garbage collection: compact to one row per key, then drop
    * tombstones older than the retention horizon (hwm − retention). Keys
    * deleted recently keep their tombstone (late out-of-order events must
    * still lose to it); old tombstones are safe to forget once no event
    * older than them can still arrive. */
  /** Compact to the single latest change per key — KEEPING tombstones and
    * the winner's original (ts, seq). Shared by [[tombstoneGc]] and
    * [[snapshotHandoff]] so the (correctness-critical) ordering key can
    * never silently diverge between them. */
  private def lastChangePerKey(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("pk"))
      .agg(latestBy(changelog,
        struct(col("op"), col("value"), col("ts"), col("seq")),
        struct(col("ts"), col("seq"))).as("last"))
      .select(col("pk"), col("last.op").as("op"), col("last.value").as("value"),
        col("last.ts").as("ts"), col("last.seq").as("seq"))

  def tombstoneGc(changelog: DataFrame, retentionMs: Long = 7L * 24 * 3600 * 1000): DataFrame = {
    val hwm = changelog.agg(max(col("ts")).as("hwm"))
    lastChangePerKey(changelog)
      .crossJoin(broadcast(hwm))
      .where(col("op") =!= "d" ||
        unix_millis(col("hwm")) - unix_millis(col("ts")) <= retentionMs)
      .select(
        col("pk").as("user_id"),
        col("op"),
        dec(col("value"), 18, 2).cast("double").as("value"),
        col("ts"),
        col("seq"))
  }

  /** Snapshot→CDC handoff (the reference's full-load-then-stream start:
    * cdc_manager.start_pipeline with enable_full_load): compact the
    * changelog prefix to one row per key — KEEPING tombstones and the
    * original (ts, seq) — then apply the tail on top. Because per-key max
    * is associative, this equals one-shot materialization for ANY cutover,
    * even when tail events arrive with timestamps older than a pre-cutover
    * delete. (A tombstone-free snapshot would resurrect such keys — a bug
    * this operator's property test caught.) */
  def snapshotHandoff(changelog: DataFrame, cutoverSeq: Long): DataFrame = {
    val compactedPrefix = lastChangePerKey(changelog.where(col("seq") < cutoverSeq))
    val tail = changelog.where(col("seq") >= cutoverSeq)
      .select("pk", "op", "value", "ts", "seq")
    latestSnapshot(compactedPrefix.unionByName(tail))
      .select(col("user_id"), col("last_value"), col("updated_at"))
  }

  /** Full-load snapshot with deterministic chunking: per-chunk stats mirror
    * transfer.py's chunked copy accounting. Chunk id is a pure key function
    * (no global sort), so chunks are computable map-side at any scale. */
  def snapshotChunked(spark: SparkSession, dir: String, nChunks: Int = 8): DataFrame = {
    val orders = graft.Tables.load(spark, dir, "orders")
    orders
      .groupBy((col("o_orderkey") % nChunks).as("chunk_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sum(dec(col("o_totalprice"))).cast(org.apache.spark.sql.types.DecimalType(28, 2)).cast("double").as("chunk_total"))
      .orderBy("chunk_id")
  }

  /** Snapshot progress report (the reference's transfer-progress UI:
    * chunks completed / rows copied / percent done, assuming chunks
    * complete in id order). Cumulative window runs over the ALREADY
    * aggregated nChunks-row table — bounded by chunk count, never by
    * data volume. */
  def snapshotProgress(spark: SparkSession, dir: String, nChunks: Int = 8): DataFrame = {
    val w = Window.orderBy("chunk_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(lit(1))
    graft.Tables.load(spark, dir, "orders")
      .groupBy((col("o_orderkey") % nChunks).as("chunk_id"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("cum_rows", sum(col("n_rows")).over(w))
      .withColumn("pct_complete",
        col("cum_rows").cast("double") / sum(col("n_rows")).over(wAll).cast("double"))
      .select("chunk_id", "n_rows", "cum_rows", "pct_complete")
      .orderBy("chunk_id")
  }

  def snapshotProgressSql(nChunks: Int = 8): String =
    s"""WITH c AS (
       |  SELECT o_orderkey % $nChunks AS chunk_id, count(*) AS n_rows
       |  FROM orders GROUP BY chunk_id)
       |SELECT chunk_id, n_rows,
       |       CAST(sum(n_rows) OVER (ORDER BY chunk_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rows,
       |       CAST(sum(n_rows) OVER (ORDER BY chunk_id ROWS UNBOUNDED PRECEDING) AS DOUBLE)
       |         / CAST(sum(n_rows) OVER () AS DOUBLE) AS pct_complete
       |FROM c ORDER BY chunk_id""".stripMargin

  /** Point-in-time reconstruction (time travel): the table state as of a
    * cutoff — here the stream's high watermark minus one day, so the
    * cutoff derives from the data and both engines compute it identically.
    * Changes after the cutoff are filtered BEFORE the per-key aggregation,
    * so this costs exactly one scan + one hash shuffle, same as
    * [[latestSnapshot]]; the 1-row high-watermark aggregate broadcasts. */
  def timeTravel(changelog: DataFrame): DataFrame = {
    val hw = changelog.agg(max(col("ts")).as("hw"))
    val asOf = changelog
      .crossJoin(broadcast(hw))
      .where(col("ts") <= col("hw") - expr("INTERVAL 1 DAY"))
      .drop("hw")
    latestSnapshot(asOf)
  }

  def timeTravelSql(changelogSql: String): String =
    s"""$changelogSql, hw AS (SELECT max(ts) - INTERVAL 1 DAY AS cutoff FROM changelog),
       |asofst AS (SELECT c.* FROM changelog c, hw WHERE c.ts <= hw.cutoff),
       |ranked AS (
       |  SELECT pk, op, value, ts,
       |         row_number() OVER (PARTITION BY pk ORDER BY ts DESC, seq DESC) AS rn,
       |         count(*) OVER (PARTITION BY pk) AS n_changes
       |  FROM asofst)
       |SELECT pk AS user_id, CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value,
       |       ts AS updated_at, n_changes
       |FROM ranked WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin
}
