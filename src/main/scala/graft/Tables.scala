package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated test data.
  *
  * Table set mirrors the star schema the reference replicates (TPC-H-ish
  * operational tables) plus `events` (the change-stream surrogate),
  * `documents` and `embeddings` (LLM-pipeline tables).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Columns written as parquet TIMESTAMP(NANOS) (Spark can't read them
    * natively). Read as long nanos, truncate to micros — identical to what
    * DuckDB's ns→µs truncation yields, so oracle results line up. */
  private val nanosCols = Map("events" -> Seq("ts"))

  /** Scan confs every graft read depends on. The generated parquet stores
    * NAIVE timestamps (no timezone): read them as session-zone instants (the
    * session is pinned to UTC) rather than TIMESTAMP_NTZ — epoch math
    * (`unix_millis`) only accepts instants, and UTC-instant reads are
    * value-identical to DuckDB's naive-epoch oracle. Done via the scan conf,
    * not a cast, so the column keeps its scan type and timestamp filter
    * pushdown still reaches the parquet reader. Both are SQLConf-only (no
    * per-read parquet option exists — verified against Spark 4.1's
    * ParquetOptions), so graft-owned sessions pin them at BUILD time
    * (localSession below) and load() only repairs an externally-built
    * session that lacks them. */
  val scanConfs: Seq[(String, String)] = Seq(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
    // InferFiltersFromGenerate synthesizes `size(arr) > 0` from every
    // explode and pushes it toward the scan. When the array is COMPUTED
    // (every corpus fan-out here: shingles, grams, chunk spans), that
    // filter re-evaluates the whole construction pipeline a second time —
    // below the parallelism-guard exchange, i.e. serially on the scan
    // task (measured: the trigram fan-out spent 3.4 of its 3.8 s inside
    // the duplicated Filter). The inference only ever saves work when the
    // generator input is a STORED column that can be pruned early, which
    // no graft operator relies on — the explode itself already drops
    // empty arrays.
    "spark.sql.optimizer.excludedRules" ->
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    // graft_max_by (ObjectHashAggregate) keeps one tiny (ord, value) row
    // per group, so the collect_list-guarding default of 128 in-memory
    // groups would push the latest-row materializers straight back to the
    // sort-based path this aggregate exists to avoid. 2M groups × ~100 B
    // ≈ 200 MB per task worst case — bounded; beyond that the sort-based
    // fallback still protects memory. This sizing assumes FIXED-SIZE
    // buffers: plans that hold UNBOUNDED per-group collect buffers
    // (kept-paragraph lists, per-key history chains) must NOT run under
    // it — they opt back into a sized guard via [[collectAggGuard]],
    // which rebinds the terminal plan onto a per-query session clone.
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "2000000")

  /** Per-query memory guard for collect-shaped ObjectHashAggregates.
    *
    * The session-wide fallback threshold above is sized for graft_max_by's
    * ~100 B fixed buffers; a collect_list whose per-group payload is a
    * document's kept paragraphs or a key's full change history would, at
    * 2M in-flight groups, hold gigabytes in one task's hash map before the
    * engine's sort-based (spilling) fallback ever engaged. This helper
    * rebinds `df` onto a session clone whose threshold is re-sized for
    * those shapes: 65,536 groups × the ~1 KB payloads observed in the
    * guarded queries ≈ 64 MB per task before spill — bounded at any data
    * scale, while still far above the per-task group counts the local
    * corpora produce (so the guarded queries' plans and timings are
    * unchanged at test SFs; the clamp only exists for the 100 TB case).
    *
    * The clone is MEMOIZED per parent session (cloneSession costs real
    * session-state work — measured ~0.3 s of the paragraph-rewrite
    * median when cloned per call), and every call re-mirrors the
    * parent's CURRENT runtime conf onto it before re-applying the guard,
    * so harness layout overrides (shuffle partitions, AQE) set after the
    * clone was born still carry through — the invariance sweep stays
    * meaningful. Only the session is memoized, never data: plans built
    * on the clone re-execute fully, and the shared CacheManager means
    * catalog.clearCache() on the parent clears the clone's view too. */
  def collectAggGuard(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.SessionBridge
    // evict entries for stopped parents: the map would otherwise strongly
    // retain dead sessions (and their clones) for the JVM's lifetime
    guardSessions.keySet.removeIf(s => s.sparkContext.isStopped)
    val parent = df.sparkSession
    val clone = guardSessions.computeIfAbsent(parent, p => SessionBridge.cloneSession(p))
    parent.conf.getAll.foreach { case (k, v) =>
      if (!clone.conf.getOption(k).contains(v))
        scala.util.Try(clone.conf.set(k, v)) // static/non-settable confs: keep the clone's
    }
    // the clone's function registry SNAPSHOTS the parent at clone time —
    // graft functions registered on the parent afterwards would not
    // resolve when a guarded plan re-analyzes on the clone; registration
    // is cheap and idempotent, so re-mirror it per call like the confs
    graft.functions.GraftFunctions.register(clone)
    clone.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
    SessionBridge.rebind(clone, df)
  }

  private val guardSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  /** Tables whose operators do real per-row compute (JSON parse, shingle
    * fan-out, codecs, vector folds) — [[load]] applies the [[spread]]
    * parallelism guard to these. Dimension tables stay unspread: they
    * broadcast into joins, and a pre-broadcast shuffle is pure waste.
    *
    * Per-operator opt-out: a pure hash-agg consumer — ONE narrow per-row
    * expression feeding straight into a groupBy/sort, no fan-out — pays
    * more for the round-robin exchange than for the per-row work it
    * parallelizes, so those operators take [[loadSerial]] (or
    * Dedup.corpusSerial) explicitly. Measured at sf0.1: text_tokens
    * 0.57 → 0.44 s, dedup_exact 0.56 → 0.53 s serial. The heavy
    * fan-out ops (shingles, grams, codecs) keep the spread — it is worth
    * 35× on the ×50 gram-df smoke. */
  private val spreadTables: Set[String] =
    Set("documents")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = loadSerial(spark, dir, name)
    if (spreadTables(name)) spread(df) else df
  }

  /** [[load]] without the parallelism guard — for consumers where the
    * spread is provably wrong: serial-by-design codecs (the audio path's
    * synchronized AudioSystem registry — fan-out buys lock contention,
    * measured 2-3× slower) and bounded takes (a preview shuffling the
    * whole table to take 10 rows). */
  def loadSerial(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Idempotent repair for sessions not built by localSession (the driver
    // smoke-check hands entry() its own session). Writes a constant, and
    // only when the live value differs, so steady state mutates nothing and
    // concurrent loads are benign.
    scanConfs.foreach { case (k, v) =>
      if (!spark.conf.getOption(k).contains(v)) spark.conf.set(k, v)
    }
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val instants = df.schema.fields.foldLeft(df) { (d, f) =>
      // defensive: if a future writer forces NTZ at the file level anyway
      if (f.dataType == TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast(TimestampType))
      else d
    }
    nanosCols.getOrElse(name, Nil).foldLeft(instants) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        // integer `div`, not `/`: nanos exceed double's 2^53 exact range
        d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      else d
    }
  }

  /** Compute-stage parallelism guard. Parquet splits only at row-group
    * boundaries, so a small single-row-group file (the driver's testdata is
    * one row group per table) scans as ONE task — and Catalyst pipelines
    * everything up to the first exchange into that scan stage, serializing
    * heavy per-row compute (codecs, shingle fan-outs) on one core.
    * Redistribute the rows across the cluster when the scan has fewer
    * splits than cores; at production scale any real table has orders of
    * magnitude more row groups than cores and this is a no-op, so the
    * shuffle is never paid where it would be expensive. Round-robin, so no
    * hash skew; callers must not rely on partition-local ordering (every
    * registered operator already aggregates order-independently). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Keyed variant of [[spread]]: redistribute an under-parallel input by
    * HASH of `keys` instead of round-robin, so the heavy per-row compute
    * downstream parallelizes AND every later aggregation/join clustered on
    * a superset of `keys` is satisfied without its own exchange (hash
    * partitioning on a subset of the grouping keys satisfies the
    * ClusteredDistribution). Same guard as [[spread]]: fires only when the
    * scan has fewer splits than cores (the single-row-group test corpus),
    * a no-op at production split counts. Callers must key on a column that
    * is unique or near-uniform per row (vec_id here) so the hash cannot
    * skew. */
  def spreadBy(df: DataFrame, keys: Column*): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target, keys: _*) else df
  }

  /** Materialize a multiply-referenced intermediate ONCE and truncate its
    * lineage (eager executor-local checkpoint). For plans whose branches
    * would otherwise each re-derive an expensive subtree — per-row-heavy
    * scoring feeding both a count branch and a rank branch, or unrolled
    * iteration rounds — correctness must not hinge on the optional
    * exchange-reuse rewrite finding the duplication. Consumers must
    * aggregate order-independently (a checkpoint re-read has no row-order
    * guarantee). On a cluster, executor-local blocks are the standard
    * iterative-refinement pattern (MLlib ALS); swap `checkpoint()` against
    * a checkpoint dir where executor loss must be survivable. */
  private[graft] def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Local session with the defaults every entry point shares. */
  def localSession(appName: String, cpus: Int = 4): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
    scanConfs.foldLeft(b) { case (b, (k, v)) => b.config(k, v) }.getOrCreate()
  }
}
