package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One change event in the canonical changelog (see graft.cdc.Cdc). */
case class ChangeEvent(op: String, pk: Long, ts: java.sql.Timestamp, seq: Long, value: Double)

/** Current materialized state for one key. `deleted = true` is a retained
  * tombstone: it keeps ordering information so an out-of-order event older
  * than the delete cannot resurrect the key, and it is emitted downstream
  * as an explicit retraction. */
case class KeyState(pk: Long, value: Double, ts: java.sql.Timestamp, seq: Long,
                    nChanges: Long, deleted: Boolean)

/** Structured-Streaming form of the CDC apply path: what the reference's
  * Kafka-Connect sink does continuously (consume → upsert/delete by PK),
  * re-expressed as a stateful streaming query
  * (reference: backend/ingestion/cdc_event_logger.py consumer loop +
  * JDBC sink upsert semantics).
  *
  * State is partitioned by PK (hash), so it scales horizontally; at
  * 100 TB key-space an RocksDB state store backend would be configured,
  * but the operator shape is identical.
  */
object CdcStream {

  /** Continuous changelog upsert: emits the post-apply state of every key
    * touched in each micro-batch — live rows as upserts, deletes as
    * explicit tombstone records (`deleted = true`, the retract-stream
    * shape a downstream sink needs to delete rows). Tombstones stay in
    * state so a late out-of-order event older than the delete cannot
    * resurrect the key; `tombstoneTtl` (e.g. `"1 hour"`, sized to the
    * source's max disorder) evicts them after that long with no new
    * activity, so a delete-heavy keyspace cannot grow state without
    * bound — live keys are the materialized table and never expire.
    * Late or replayed events (ts, seq) ≤ current state are ignored —
    * apply is idempotent, which makes at-least-once delivery from the
    * bus exactly-once in the table. */
  def applyChanges(
      events: Dataset[ChangeEvent],
      tombstoneTtl: Option[String] = None): Dataset[KeyState] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (tombstoneTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.pk)
      .flatMapGroupsWithState[KeyState, KeyState](
        OutputMode.Update(), timeoutConf) {
        (pk: Long, changes: Iterator[ChangeEvent], state: GroupState[KeyState]) =>
          if (state.hasTimedOut) {
            // the tombstone outlived the configured max disorder — evict
            state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.orNull
            var changed = false
            changes.toSeq.sortBy(c => (c.ts.getTime, c.seq)).foreach { c =>
              val newer = cur == null ||
                Ordering[(Long, Long)].gt((c.ts.getTime, c.seq), (cur.ts.getTime, cur.seq))
              if (newer) {
                val n = if (cur == null) 1L else cur.nChanges + 1L
                cur = KeyState(pk, if (c.op == "d") 0.0 else c.value, c.ts, c.seq, n,
                  deleted = c.op == "d")
                changed = true
              }
            }
            if (changed) {
              state.update(cur)
              // timeouts reset on every invocation for the key: only a
              // tombstone re-arms one, so a re-created key lives forever
              if (cur.deleted) tombstoneTtl.foreach(state.setTimeoutDuration)
              Iterator.single(cur)
            } else {
              // stale replay against an existing tombstone still cancelled
              // this invocation's timeout — re-arm it or the tombstone
              // escapes its TTL and leaks state forever
              if (cur != null && cur.deleted) {
                tombstoneTtl.foreach(state.setTimeoutDuration)
              }
              Iterator.empty
            }
          }
      }
  }

  /** Stateless per-message parse guard for the streaming ingest: wire
    * messages whose envelope fails to parse are routed to 'dlq' instead of
    * poisoning (or killing) the apply query — the streaming form of
    * [[graft.cdc.Cdc.dlqRoute]], matching the reference consumer's
    * per-message try/except. Pure projection: no state, no shuffle; the
    * caller splits by `route` into the main apply and a DLQ sink. */
  def routeStream(wire: DataFrame): DataFrame =
    wire
      .withColumn("envelope", from_json(col("value"), graft.cdc.Cdc.envelopeSchema))
      .withColumn("route",
        when(col("envelope").isNull || col("envelope.op").isNull, "dlq")
          .otherwise("main"))

  /** Update-mode running aggregates per key: the continuously-maintained
    * metrics table (n events, exact running sum, latest ts) a dashboard
    * reads — Structured Streaming's incarnation of incremental view
    * maintenance (the batch twin is cdc_incremental_agg). State is the
    * aggregation buffer itself, partitioned by key. */
  def runningAggStream(events: Dataset[ChangeEvent]): DataFrame =
    events.toDF()
      .groupBy(col("pk"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).as("running_sum"),
        max(col("ts")).as("latest_ts"))

  /** Content-digest dedup within the watermark: the streaming "don't
    * ingest the same document twice" guard (the content twin of
    * [[dedupStream]]'s offset-replay dedup). State holds one digest per
    * distinct payload inside the watermark horizon — bounded, unlike a
    * forever-growing seen-set. */
  def contentDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_sig", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_sig")

  /** Exactly-once replay dedup within the watermark: redelivered messages
    * (same seq) are dropped before apply. */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("seq")

  /** Continuous SCD-2: every change CLOSES the key's open version (emitting
    * it with valid_to set) and — unless it is a delete — opens a new one.
    * State holds the open version per key; closed versions stream out
    * append-only, exactly what a history-table sink wants.
    *
    * A delete does NOT clear state: it leaves a tombstone carrying the
    * delete's (ts, seq), so a later-arriving stale event (older than the
    * delete) loses the `newer` check instead of re-opening a version —
    * the same resurrection bug [[applyChanges]] guards against.
    *
    * Tombstone retention is bounded in EVENT time: `tombstoneTtlMs` is
    * the source's maximum disorder horizon, used both as the watermark
    * delay and as the tombstone's event-time timeout. Once the watermark
    * passes delete-ts + TTL, no event older than the delete can still
    * arrive, so the tombstone times out and is removed — state stays
    * O(live keys + recently-deleted keys), which is what survives at
    * 100 TB key cardinality. (Processing-time timeouts are deliberately
    * NOT used: FlatMapGroupsWithStateExec.shouldRunAnotherBatch is always
    * true under them, so the micro-batch engine spins batches nonstop.) */
  def scd2Stream(
      events: Dataset[ChangeEvent],
      tombstoneTtlMs: Long = 24L * 3600 * 1000): Dataset[Scd2Version] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$tombstoneTtlMs milliseconds")
      .groupByKey(_.pk)
      .flatMapGroupsWithState[Scd2State, Scd2Version](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (pk: Long, changes: Iterator[ChangeEvent], state: GroupState[Scd2State]) =>
          if (state.hasTimedOut) {
            // Only tombstones arm the timeout; a live version that later
            // superseded one keeps its stale deadline, so double-check.
            if (state.getOption.exists(_.deleted)) state.remove()
            Iterator.empty
          } else {
            var cur = state.getOption.orNull
            val closed = scala.collection.mutable.ArrayBuffer.empty[Scd2Version]
            changes.toSeq.sortBy(c => (c.ts.getTime, c.seq)).foreach { c =>
              val newer = cur == null ||
                Ordering[(Long, Long)].gt((c.ts.getTime, c.seq), (cur.ts, cur.seq))
              if (newer) {
                if (cur != null && !cur.deleted)
                  closed += Scd2Version(pk, cur.value, new java.sql.Timestamp(cur.ts),
                    Some(c.ts), isCurrent = false)
                cur = Scd2State(pk, if (c.op == "d") 0.0 else c.value,
                  c.ts.getTime, c.seq, deleted = c.op == "d")
                state.update(cur)
                if (cur.deleted)
                  // must stay ahead of the watermark or Spark rejects it
                  state.setTimeoutTimestamp(
                    math.max(cur.ts + tombstoneTtlMs,
                      state.getCurrentWatermarkMs() + tombstoneTtlMs))
              }
            }
            closed.iterator
          }
      }
  }
}

/** Open-version (or retained-tombstone) state for streaming SCD-2
  * (ts as epoch millis). */
case class Scd2State(pk: Long, value: Double, ts: Long, seq: Long, deleted: Boolean)

/** One closed (or open) SCD-2 version emitted downstream. */
case class Scd2Version(pk: Long, value: Double, validFrom: java.sql.Timestamp,
                       validTo: Option[java.sql.Timestamp], isCurrent: Boolean)
