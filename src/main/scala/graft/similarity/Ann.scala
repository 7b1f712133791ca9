package graft.similarity

import graft.Tables
import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the `embeddings` table (Array[Float], 64 dims).
  *
  * Float math portability: a dot product is computed as a LEFT FOLD over
  * the array in index order — Spark `aggregate` and DuckDB `list_reduce`
  * both fold sequentially, and float→double conversion is exact, so both
  * engines produce bit-identical IEEE doubles. Cross-row float sums (IVF
  * centroids) instead quantize each addend to floor(x·2^40) and sum them
  * EXACTLY — as DECIMAL(38,0) on Spark (a long sum would silently wrap
  * past ~2M vectors per group) and HUGEINT on DuckDB — order-independent
  * on both engines.
  *
  * Scale design: brute force is the correctness baseline (one scan, no
  * shuffle before the top-k); LSH bounds candidates to one sign-bucket;
  * IVF probes the top-2 of |labels| partitions. All cosine scoring is
  * per-row whole-stage-codegen expressions — no explode, no shuffle.
  */
object Ann {

  /** 2^40 quantization scale for cross-row float sums. */
  private val Q = 1099511627776.0

  /** Materialize an iteration-trajectory intermediate ONCE and truncate
    * its lineage (eager `localCheckpoint`, executor-local blocks).
    * Unrolled fixed-round loops (kmeans_converge, nndescent_converge)
    * reference each round's output at least twice — without truncation
    * the static plan re-derives every prior round per reference and its
    * size grows exponentially in the round count (r9 evidence: 632
    * parquet scans / 866 exchanges / 2,559 nodes in one plan). With it,
    * each round computes once and the driver optimizes a bounded plan.
    * On a real cluster the same call holds — executor-local checkpoint
    * blocks are the standard iterative-algorithm pattern (MLlib's ALS /
    * GraphX use periodic checkpointing for exactly this); a
    * reliability-critical deployment would swap in `checkpoint()` against
    * the cluster checkpoint dir with identical semantics. Every consumer
    * aggregates order-independently (2⁴⁰-quantized sums), so the
    * partition order a checkpoint re-read yields cannot change a bit. */
  private def pin(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Index-ordered fold: Σ a[i]·b[i] as exact-ordered double ops. */
  private def dotFold(a: Column, b: Column): Column =
    aggregate(
      transform(sequence(lit(1), size(a)),
        i => element_at(a, i).cast("double") * element_at(b, i).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def dotFoldSql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"

  /** Portable reference form (kept for spec-level equivalence checks). */
  private[graft] def cosineFold(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))

  /** Hot-path form: the native codegen'd expression — bit-identical to
    * [[cosineFold]] (same index-ordered accumulation). */
  private def cosine(spark: SparkSession, a: String, b: String): Column = {
    GraftFunctions.register(spark)
    expr(s"graft_cosine($a, $b)")
  }

  /** Codegen'd Σx² (graft_norm2) — bit-identical to dotFold(c, c) (same
    * index-ordered accumulation), one generated loop instead of an
    * interpreted HOF tree (~1.5 ms/row at d = 64 interpreted). */
  private def norm2(spark: SparkSession, c: String): Column = {
    GraftFunctions.register(spark)
    expr(s"graft_norm2($c)")
  }

  private def cosineSql(a: String, b: String): String =
    s"${dotFoldSql(a, b)} / (sqrt(${dotFoldSql(a, a)}) * sqrt(${dotFoldSql(b, b)}))"

  /** Embedding hygiene — the pre-training sanity gate over the vector
    * table: per label, the vector count, degenerate rows (zero / low
    * norm), and the norm envelope. Broken embedding exports (all-zero
    * rows, scale blow-ups from a bad normalization step) surface here
    * before they poison ANN search or cosine dedup. One scan + one
    * partial-aggregated shuffle on the small label key; norms use the
    * same index-ordered fold + sqrt as every cosine in this module, so
    * both engines agree bit-for-bit. */
  def normStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    emb
      .select(col("label"), sqrt(norm2(spark, "embedding")).as("norm"))
      .groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        count(when(col("norm") === 0.0, 1)).as("n_zero"),
        count(when(col("norm") < 0.5, 1)).as("n_low"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"))
      .orderBy("label")
  }

  val normStatsSql: String =
    s"""WITH n AS (
       |  SELECT label, sqrt(${dotFoldSql("embedding", "embedding")}) AS norm FROM embeddings)
       |SELECT label, count(*) AS n_vecs,
       |       count(CASE WHEN norm = 0.0 THEN 1 END) AS n_zero,
       |       count(CASE WHEN norm < 0.5 THEN 1 END) AS n_low,
       |       min(norm) AS min_norm, max(norm) AS max_norm
       |FROM n GROUP BY label ORDER BY label""".stripMargin

  /** Norm distribution histogram — the normalize-or-not decision detail
    * under [[normStats]]'s min/max envelope: vector norms bucketed at
    * 1/16 granularity (capped at the 1024 tail bucket) with shares and
    * cumulative shares. A clean unit-normalized export is one spike at
    * bucket 16; two modes mean two encoder versions are mixed in the
    * same table — the failure [[centroidDrift]] only catches per label.
    *
    * Exactness: the bucket is floor(norm·16) over the same index-
    * ordered norm fold every cosine in this module uses — identical
    * IEEE ops on both engines; shares are ratios of exact counts.
    *
    * Scale shape: one scan into a ≤1025-key aggregation; windows only
    * over that bounded histogram. */
  def normHist(spark: SparkSession, dir: String): DataFrame = {
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy("norm_bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.load(spark, dir, "embeddings")
      .select(sqrt(norm2(spark, "embedding")).as("norm"))
      .select(least(floor(col("norm") * 16.0), lit(1024.0)).cast("long").as("norm_bucket"))
      .groupBy("norm_bucket")
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("share",
        col("n_vecs").cast("double") / sum(col("n_vecs")).over(tot).cast("double"))
      .withColumn("cum_share",
        sum(col("n_vecs")).over(cum).cast("double")
          / sum(col("n_vecs")).over(tot).cast("double"))
      .select(col("norm_bucket"),
        (col("norm_bucket").cast("double") / 16.0).as("norm_lo"),
        col("n_vecs"), col("share"), col("cum_share"))
      .orderBy("norm_bucket")
  }

  val normHistSql: String =
    s"""WITH n AS (
       |  SELECT CAST(least(floor(sqrt(${dotFoldSql("embedding", "embedding")}) * 16.0), 1024.0) AS BIGINT) AS norm_bucket
       |  FROM embeddings),
       |h AS (SELECT norm_bucket, count(*) AS n_vecs FROM n GROUP BY norm_bucket)
       |SELECT norm_bucket,
       |       CAST(norm_bucket AS DOUBLE) / 16.0 AS norm_lo,
       |       n_vecs,
       |       CAST(n_vecs AS DOUBLE) / CAST(sum(n_vecs) OVER () AS DOUBLE) AS share,
       |       CAST(sum(n_vecs) OVER (ORDER BY norm_bucket
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         / CAST(sum(n_vecs) OVER () AS DOUBLE) AS cum_share
       |FROM h ORDER BY norm_bucket""".stripMargin

  /** Norm–length correlation — the embedding-artifact screen for the
    * best-known encoder bug: unnormalized exports where vector NORM
    * encodes document LENGTH, so cosine-ranked retrieval and semantic
    * dedup silently prefer long documents. Joins each vector to its
    * document (vec_id ≡ doc_id, the [[semanticJoin]] identity) and
    * reports the Pearson correlation between ‖v‖ and the token count.
    * |r| near 0 is healthy; large |r| means normalize before indexing.
    *
    * Exactness: Pearson r is affine-invariant, so the norm is quantized
    * to floor(‖v‖·2²⁰) and ALL five moment sums (Σx, Σy, Σx², Σy²,
    * Σxy) accumulate as DECIMAL-cast integers — order-independent and
    * bit-identical across engines; r is then fixed-order double math
    * over the exact sums, NULL when either variance degenerates.
    *
    * Scale shape: one equi-join on the id key (AQE-splittable), one
    * single-row aggregate; nothing else. */
  def normLengthCorr(spark: SparkSession, dir: String): DataFrame = {
    val q20 = 1048576.0
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        floor(sqrt(norm2(spark, "embedding")) * q20)
          .cast("long").as("x"))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(graft.text.TextFunctions.normText(col("text")), " "))
          .cast("long").as("y"))
    val j = emb.join(docs, col("vec_id") === col("doc_id"))
    val d38 = "decimal(38,0)"
    val agg = j.agg(
      count(lit(1)).as("n"),
      sum(col("x").cast(d38)).as("sx"),
      sum(col("y").cast(d38)).as("sy"),
      sum((col("x") * col("x")).cast(d38)).as("sxx"),
      sum((col("y") * col("y")).cast(d38)).as("syy"),
      sum((col("x") * col("y")).cast(d38)).as("sxy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    agg.select(col("n").as("n_docs"),
      (col("sx").cast("double") / (nD * lit(q20))).as("mean_norm"),
      (col("sy").cast("double") / nD).as("mean_tokens"),
      when(vx > 0.0 && vy > 0.0, cov / (sqrt(vx) * sqrt(vy))).as("norm_length_corr"))
  }

  val normLengthCorrSql: String =
    s"""WITH e AS (
       |  SELECT vec_id,
       |         CAST(floor(sqrt(${dotFoldSql("embedding", "embedding")}) * 1048576.0) AS BIGINT) AS x
       |  FROM embeddings),
       |d AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS BIGINT) AS y
       |  FROM documents),
       |s AS (
       |  SELECT count(*) AS n,
       |         sum(CAST(x AS DECIMAL(38,0))) AS sx,
       |         sum(CAST(y AS DECIMAL(38,0))) AS sy,
       |         sum(CAST(x * x AS DECIMAL(38,0))) AS sxx,
       |         sum(CAST(y * y AS DECIMAL(38,0))) AS syy,
       |         sum(CAST(x * y AS DECIMAL(38,0))) AS sxy
       |  FROM e JOIN d ON vec_id = doc_id)
       |SELECT n AS n_docs,
       |       CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 1048576.0) AS mean_norm,
       |       CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_tokens,
       |       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
       |             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
       |            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
       |                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       |                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
       |                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
       |                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
       |                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       |       END AS norm_length_corr
       |FROM s""".stripMargin

  /** Exact cosine top-k against the vec_id=0 query vector. */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    // the query never ranks against itself: a guaranteed cosine-1.0
    // self-match would waste a result slot and bias recall gates by 1/k
    emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(spark, "embedding", "qe").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  val bruteForceSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |FROM embeddings CROSS JOIN q
       |WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT 20""".stripMargin

  /** Filtered (predicate-constrained) top-k — the "vector search WHERE
    * label = x" shape every production vector store exposes: exact
    * cosine top-k against the query vector restricted to one metadata
    * label, with the result annotated by its UNFILTERED global rank so
    * the caller can see how deep the filtered answer reaches into the
    * global ranking (rank ≫ k means the predicate is starving recall
    * and a label-partitioned index would pay for itself).
    *
    * Scale shape: the label predicate is pushed INTO the parquet scan
    * (pre-filter, not post-filter — at a 1/|labels| selectivity the
    * scan does |labels|× less distance work); the global-rank
    * annotation joins only the k result rows back against a scored
    * scan, and both branches end in TakeOrderedAndProject. */
  def filteredTopK(spark: SparkSession, dir: String, label: Int = 1, k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val filtered = emb.where(col("vec_id") =!= 0 && col("label") === label)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), cosine(spark, "embedding", "qe").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
    // global rank of each filtered hit: 1 + the number of strictly better
    // unfiltered candidates (ties broken on vec_id, same order as topk)
    val scoredAll = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id").as("g_id"), cosine(spark, "embedding", "qe").as("g_cos"))
    // right-outer with the k-row page as the BROADCAST side: the scored
    // corpus streams, the bounded page replicates — never the reverse
    scoredAll.join(broadcast(filtered),
      col("g_cos") > col("cosine")
        || (col("g_cos") === col("cosine") && col("g_id") < col("vec_id")), "right")
      .groupBy("vec_id", "label", "cosine")
      .agg((count(col("g_id")) + 1L).as("global_rank"))
      .orderBy(col("cosine").desc, col("vec_id"))
  }

  def filteredTopKSql(label: Int = 1, k: Int = 10): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |f AS (
       |  SELECT vec_id, label, ${cosineSql("embedding", "qe")} AS cosine
       |  FROM embeddings CROSS JOIN q
       |  WHERE vec_id <> 0 AND label = $label
       |  ORDER BY cosine DESC, vec_id LIMIT $k),
       |s AS (
       |  SELECT vec_id AS g_id, ${cosineSql("embedding", "qe")} AS g_cos
       |  FROM embeddings CROSS JOIN q WHERE vec_id <> 0)
       |SELECT f.vec_id, f.label, f.cosine,
       |       CAST(count(s.g_id) + 1 AS BIGINT) AS global_rank
       |FROM f LEFT JOIN s
       |  ON s.g_cos > f.cosine OR (s.g_cos = f.cosine AND s.g_id < f.vec_id)
       |GROUP BY f.vec_id, f.label, f.cosine
       |ORDER BY f.cosine DESC, f.vec_id""".stripMargin

  /** Radius (range) search: every vector whose cosine against the query
    * vector meets the threshold — the "find all near misses" complement
    * of top-k. Same single-scan shape as [[bruteForceTopK]]: the query
    * vector broadcasts, scoring is one codegen'd expression per row, and
    * the selective filter means only matches reach the output sort. */
  def rangeSearch(spark: SparkSession, dir: String, threshold: Double = 0.25): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"), cosine(spark, "embedding", "qe").as("cosine"))
      .where(col("cosine") >= threshold && col("vec_id") =!= 0)
      .orderBy("vec_id")
  }

  val rangeSearchSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |FROM embeddings CROSS JOIN q
       |WHERE ${cosineSql("embedding", "qe")} >= 0.25 AND vec_id <> 0
       |ORDER BY vec_id""".stripMargin

  /** Cross-modal retrieval: cosine top-k against the query vector, joined
    * back to the documents table for human-readable metadata — the
    * "semantic search over the corpus" surface. The top-k side is k rows
    * after TakeOrderedAndProject, so the metadata join broadcasts it. */
  def semanticJoin(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val top = bruteForceTopK(spark, dir, k)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    docs.join(broadcast(top), col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"), col("cosine"))
      .orderBy(col("cosine").desc, col("doc_id"))
  }

  val semanticJoinSql: String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |top AS (
       |  SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |  FROM embeddings CROSS JOIN q
       |  WHERE vec_id <> 0
       |  ORDER BY cosine DESC, vec_id LIMIT 10)
       |SELECT doc_id, source, lang, n_chars, cosine
       |FROM documents JOIN top ON doc_id = vec_id
       |ORDER BY cosine DESC, doc_id""".stripMargin

  /** 8-bit sign-hyperplane bucket code over dims 1,9,…,57 (1-based). */
  private[graft] def signCode(emb: Column): Column =
    (0 until 8).map { k =>
      when(element_at(emb, 1 + 8 * k) >= 0f, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def signCodeSql(e: String): String =
    (0 until 8).map { k =>
      s"CASE WHEN $e[${1 + 8 * k}] >= 0 THEN ${1L << k} ELSE 0 END"
    }.mkString(" + ")

  /** 16-bit sign-hyperplane code over dims 1,5,…,61 — the DEDUP blocking
    * code. Twice the bits of the probe code: dedup self-joins pay
    * occupancy² per bucket, so the bucket count must scale ahead of the
    * corpus (65k cells per partition vs 256), while probe-side search
    * (lshTopK) keeps 8 bits so a single bucket still holds enough
    * candidates to fill a top-k. */
  private def signCode16(emb: Column): Column =
    (0 until 16).map { k =>
      when(element_at(emb, 1 + 4 * k) >= 0f, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  private def signCode16Sql(e: String): String =
    (0 until 16).map { k =>
      s"CASE WHEN $e[${1 + 4 * k}] >= 0 THEN ${1L << k} ELSE 0 END"
    }.mkString(" + ")

  /** Sign-LSH candidate top-k: only the query's bucket is scored —
    * expected candidate count is |data| / 256 (the 100 TB path). */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val q = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    emb.where(col("vec_id") =!= 0)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"), cosine(spark, "embedding", "qe").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  def lshTopKSql: String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM coded WHERE vec_id = 0)
       |SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |FROM coded JOIN q ON bucket = qbucket
       |WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Multi-probe sign-LSH: probe the query's bucket plus all Hamming-1
    * neighbor buckets (9 of 256) — recovers most of the recall LSH loses
    * at ~9/256 of the brute-force cost. */
  def multiprobeTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val qRow = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    val probeCodes = explode(array(
      col("qbucket") +: (0 until 8).map(j => col("qbucket").bitwiseXOR(lit(1L << j))): _*)).as("probe")
    val probes = qRow.select(col("qe"), probeCodes)
    emb.where(col("vec_id") =!= 0)
      .join(broadcast(probes), col("bucket") === col("probe"))
      .select(col("vec_id"), cosine(spark, "embedding", "qe").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  def multiprobeTopKSql: String = {
    val flips = (0 until 8).map(j => s"SELECT qe, xor(qbucket, ${1L << j}) AS probe FROM q")
      .mkString("\n  UNION ALL ")
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM coded WHERE vec_id = 0),
       |probes AS (
       |  SELECT qe, qbucket AS probe FROM q
       |  UNION ALL $flips)
       |SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |FROM coded JOIN probes ON bucket = probe
       |WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin
  }

  /** IVF-style: partitions = the `label` column. Centroids are computed
    * with quantized-exact sums, the query probes the top-2 partitions by
    * centroid score, and only those partitions are exact-scored. */
  def ivfTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))

    val centroids = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(
        sum(floor(col("x").cast("double") * Q).cast("long").cast(DecimalType(38, 0))).as("snum"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("snum").cast("double") / Q / col("n")).as("c"))

    val qLong = q.select(posexplode(col("qe")).as(Seq("pos", "y")))
    val probes = centroids
      .join(broadcast(qLong), "pos")
      .groupBy("label")
      .agg(
        sum(floor(col("y").cast("double") * col("c") * Q).cast("long").cast(DecimalType(38, 0))).as("sn"),
        sum(floor(col("c") * col("c") * Q).cast("long").cast(DecimalType(38, 0))).as("ncn"))
      .select(col("label"),
        ((col("sn").cast("double") / Q) / sqrt(col("ncn").cast("double") / Q)).as("score"))
      .orderBy(col("score").desc, col("label"))
      .limit(2)
      .select(col("label").as("probe_label"))

    emb.where(col("vec_id") =!= 0)
      .join(broadcast(probes), col("label") === col("probe_label"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"), cosine(spark, "embedding", "qe").as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF index BUILD surface: the centroid table itself — per partition
    * (label): vector count, dimensionality, centroid norm. This is the
    * artifact a 100 TB ANN deployment persists and re-probes; means use
    * the same 2^40 quantization as the probe path, so build and search
    * agree bit-for-bit. One explode + two aggregations. */
  def ivfBuild(spark: SparkSession, dir: String): DataFrame = {
    val long = Tables.load(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
    val centroids = long
      .groupBy("label", "pos")
      .agg(
        sum(floor(col("x").cast("double") * Q).cast("long").cast(DecimalType(38, 0))).as("snum"),
        count(lit(1)).as("n"))
      .select(col("label"), col("n"),
        (col("snum").cast("double") / Q / col("n")).as("c"))
    centroids
      .groupBy(col("label").cast("long").as("label"))
      .agg(
        max(col("n")).as("n_vectors"),
        count(lit(1)).as("n_dims"),
        sqrt(sum(floor(col("c") * col("c") * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q)
          .as("centroid_norm"))
      .orderBy("label")
  }

  val ivfBuildSql: String =
    s"""WITH longf AS (
       |  SELECT label, unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |centroids AS (
       |  SELECT label, pos, count(*) AS n,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0 / count(*) AS c
       |  FROM longf GROUP BY label, pos)
       |SELECT CAST(label AS BIGINT) AS label,
       |       max(n) AS n_vectors,
       |       count(*) AS n_dims,
       |       sqrt(CAST(sum(CAST(floor(c * c * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0) AS centroid_norm
       |FROM centroids GROUP BY label ORDER BY label""".stripMargin

  /** One exact Lloyd (k-means) refinement step over the IVF partitions —
    * the index-maintenance operator that lets cluster count track the
    * corpus (SemDeDup's k ∝ corpus; a drifting corpus re-balances its
    * partitions instead of accreting into stale ones). Assign every
    * vector to its nearest current centroid (squared-L2, ties to the
    * lower label), then report per label: population before/after,
    * inbound movers, and how far the centroid moved.
    *
    * Scale shape: assignment is the inherent |data|·k·d work of Lloyd —
    * here a pos-equi-join against the ≤ k·d-row centroid table (broadcast)
    * followed by one (vec, cand) aggregation; every floating sum is
    * per-term 2⁴⁰-quantized then exactly summed (the ivf_build pattern),
    * so both engines agree bit-for-bit regardless of partition order. */
  def kmeansRefine(spark: SparkSession, dir: String): DataFrame =
    // examined r19, left UN-spread deliberately: the one-round assignment
    // partial-aggregates map-side before any exchange, and the interleaved
    // A/B read raw 1.74 s vs spreadBy(vec_id) 2.18 s median — the extra
    // exchange costs more than the single-task scan it parallelizes here
    // (three separate references to `long` each re-pay the repartition).
    kmeansRefineOf(spark,
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding")))

  def kmeansRefineOf(spark: SparkSession, embSrc: DataFrame): DataFrame = {
    val emb = embSrc.select(col("vec_id"), col("label"), col("embedding"))
    val long = emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("pos", "x")))
    def qMean(c: Column): Column =
      sum(floor(c * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q / count(lit(1))
    val oldC = long.groupBy("label", "pos").agg(qMean(col("x").cast("double")).as("c"))
    val dist = long.select(col("vec_id"), col("label").as("old_label"), col("pos"), col("x"))
      .join(broadcast(oldC.select(col("label").as("cand_label"), col("pos"), col("c"))), "pos")
      .withColumn("dq",
        floor((col("x").cast("double") - col("c")) * (col("x").cast("double") - col("c")) * Q)
          .cast("long").cast(DecimalType(38, 0)))
      .groupBy("vec_id", "old_label", "cand_label")
      .agg(sum(col("dq")).as("d2q"))
    val assigned = dist
      .groupBy("vec_id", "old_label")
      .agg(GraftFunctions.minByCol(dist, col("cand_label"),
        struct(col("d2q"), col("cand_label"))).as("m"))
      .select(col("vec_id"), col("old_label"), col("m").as("new_label"))
    val newC = long.join(assigned.select(col("vec_id"), col("new_label")), "vec_id")
      .groupBy(col("new_label").as("label"), col("pos"))
      .agg(qMean(col("x").cast("double")).as("c2"))
    val shift = oldC.join(newC, Seq("label", "pos"))
      .withColumn("sq",
        floor((col("c2") - col("c")) * (col("c2") - col("c")) * Q)
          .cast("long").cast(DecimalType(38, 0)))
      .groupBy("label")
      .agg(sqrt(sum(col("sq")).cast("double") / Q).as("centroid_shift"))
    val before = emb.groupBy("label").agg(count(lit(1)).as("n_before"))
    val after = assigned.groupBy(col("new_label").as("label"))
      .agg(
        count(lit(1)).as("n_after"),
        sum(when(col("new_label") =!= col("old_label"), 1L).otherwise(0L)).as("n_moved_in"))
    // LEFT joins from `before`: a cluster whose population empties after
    // reassignment (a dominated/stale centroid — exactly the drift this
    // operator exists to surface) must report n_after = 0, not vanish;
    // its centroid shift is NULL (no new centroid exists to measure)
    before.join(after, Seq("label"), "left").join(shift, Seq("label"), "left")
      .select(col("label").cast("long").as("label"),
        col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("n_moved_in"), lit(0L)).as("n_moved_in"),
        col("centroid_shift"))
      .orderBy("label")
  }

  val kmeansRefineSql: String =
    s"""WITH longf AS (
       |  SELECT vec_id, label, unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |oldc AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |           / 1099511627776.0 / count(*) AS c
       |  FROM longf GROUP BY label, pos),
       |dist AS (
       |  SELECT v.vec_id, v.label AS old_label, c.label AS cand_label,
       |         sum(CAST(floor((CAST(v.x AS DOUBLE) - c.c) * (CAST(v.x AS DOUBLE) - c.c)
       |                         * 1099511627776.0) AS BIGINT)) AS d2q
       |  FROM longf v JOIN oldc c ON v.pos = c.pos
       |  GROUP BY v.vec_id, v.label, c.label),
       |assigned AS (
       |  SELECT vec_id, old_label, cand_label AS new_label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cand_label) AS rn
       |    FROM dist)
       |  WHERE rn = 1),
       |newc AS (
       |  SELECT a.new_label AS label, v.pos,
       |         CAST(sum(CAST(floor(CAST(v.x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |           / 1099511627776.0 / count(*) AS c2
       |  FROM longf v JOIN assigned a ON v.vec_id = a.vec_id
       |  GROUP BY a.new_label, v.pos),
       |shift AS (
       |  SELECT o.label,
       |         sqrt(CAST(sum(CAST(floor((n.c2 - o.c) * (n.c2 - o.c) * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |              / 1099511627776.0) AS centroid_shift
       |  FROM oldc o JOIN newc n ON o.label = n.label AND o.pos = n.pos
       |  GROUP BY o.label),
       |before_c AS (SELECT label, count(*) AS n_before FROM embeddings GROUP BY label),
       |after_c AS (
       |  SELECT new_label AS label, count(*) AS n_after,
       |         CAST(sum(CASE WHEN new_label <> old_label THEN 1 ELSE 0 END) AS BIGINT) AS n_moved_in
       |  FROM assigned GROUP BY new_label)
       |SELECT CAST(b.label AS BIGINT) AS label, b.n_before,
       |       coalesce(a.n_after, 0) AS n_after,
       |       coalesce(a.n_moved_in, 0) AS n_moved_in,
       |       s.centroid_shift
       |FROM before_c b LEFT JOIN after_c a ON b.label = a.label
       |LEFT JOIN shift s ON b.label = s.label
       |ORDER BY label""".stripMargin

  /** Lloyd iteration to a fixed point — the index-refresh loop between
    * [[ivfBuild]] and a rebuilt IVF: run [[kmeansRefine]]'s exact
    * assign-then-recenter step for a FIXED number of rounds and report the
    * per-round convergence trajectory (vectors moved, max centroid shift,
    * surviving cluster count, converged flag). The round count is fixed —
    * not data-dependent — so both engines execute the identical unrolled
    * computation and the oracle stays exact; once a round moves zero
    * vectors every later round is a no-op (Lloyd is idempotent at a fixed
    * point), so `converged` reads the fixed point off the trajectory.
    *
    * Scale shape: per round, the same |data|·k·d pos-equi-join against the
    * broadcast centroid table as [[kmeansRefine]], then two bounded
    * aggregations; all floating sums 2⁴⁰-quantized-exact, so the
    * trajectory is partition-order independent bit-for-bit. */
  def kmeansConverge(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame =
    // examined r19: spreadBy(vec_id) on the source was FLAT interleaved
    // (3.67 raw vs 3.71 s spread median) — the per-round partial
    // aggregations combine map-side before any exchange and AQE resolves
    // the checkpoint-table joins at runtime, so the single-split scan is
    // not the binding cost here (the 7 eager pin jobs are). Left raw.
    kmeansConvergeOf(spark,
      Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding")),
      rounds)

  def kmeansConvergeOf(spark: SparkSession, embSrc: DataFrame, rounds: Int = 3): DataFrame = {
    val emb = embSrc.select(col("vec_id"), col("label"), col("embedding"))
    val long = pin(emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x")))
    def qMean(c: Column): Column =
      sum(floor(c * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q / count(lit(1))
    def centroidsOf(assign: DataFrame): DataFrame =
      long.join(assign, "vec_id").groupBy("label", "pos").agg(qMean(col("x")).as("c"))
    def assignTo(cents: DataFrame): DataFrame =
      long.join(broadcast(cents.select(col("label").as("cand_label"), col("pos"), col("c"))), "pos")
        .withColumn("dq",
          floor((col("x") - col("c")) * (col("x") - col("c")) * Q)
            .cast("long").cast(DecimalType(38, 0)))
        .groupBy("vec_id", "cand_label").agg(sum(col("dq")).as("d2q"))
        .groupBy("vec_id").agg(GraftFunctions.minByCol(long, col("cand_label"),
          struct(col("d2q"), col("cand_label"))).as("m"))
        .select(col("vec_id"), col("m").as("label"))
    // Every round's assignment and centroid table is REFERENCED at least
    // twice (stats for round r, inputs of round r+1). Without truncation
    // the unrolled plan re-derives each prior round per reference — the
    // static plan grows exponentially in the round count (r9: 632 scans /
    // 866 exchanges for 3 rounds). [[pin]] materializes each round once
    // and truncates lineage; all downstream sums are 2⁴⁰-quantized exact,
    // so the partition order a checkpoint re-read yields cannot move a bit.
    var assign = emb.select(col("vec_id"), col("label"))
    var cents = pin(centroidsOf(assign))
    val stats = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val newAssign = pin(assignTo(cents))
      val newCents = pin(centroidsOf(newAssign))
      val moved = assign.select(col("vec_id"), col("label").as("old_label"))
        .join(newAssign.select(col("vec_id"), col("label").as("new_label")), "vec_id")
        .agg(sum(when(col("old_label") =!= col("new_label"), 1L).otherwise(0L)).as("n_moved"))
      val shift = cents.select(col("label"), col("pos"), col("c"))
        .join(newCents.select(col("label"), col("pos"), col("c").as("c2")), Seq("label", "pos"))
        .withColumn("sq",
          floor((col("c2") - col("c")) * (col("c2") - col("c")) * Q)
            .cast("long").cast(DecimalType(38, 0)))
        .groupBy("label").agg(sqrt(sum(col("sq")).cast("double") / Q).as("s"))
        .agg(max(col("s")).as("max_shift"))
      val active = newAssign.agg(countDistinct(col("label")).as("n_active_labels"))
      stats += moved.crossJoin(broadcast(shift)).crossJoin(broadcast(active))
        .select(lit(r).cast("long").as("round"), col("n_moved"), col("max_shift"),
          col("n_active_labels"), (col("n_moved") === 0L).as("converged"))
      assign = newAssign
      cents = newCents
    }
    stats.result().reduce(_ unionAll _).orderBy("round")
  }

  /** Oracle twin of [[kmeansConverge]]: the identical unrolled rounds,
    * generated from the same round count. */
  def kmeansConvergeSql(rounds: Int = 3): String = {
    val Qs = "1099511627776.0" // 2^40, as a SQL literal (not Scala's E-notation)
    val sb = new StringBuilder
    sb.append(
      s"""WITH longf AS (
         |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
         |         unnest(generate_series(1, len(embedding))) AS pos
         |  FROM embeddings),
         |assign_0 AS (SELECT vec_id, label FROM embeddings),
         |cents_0 AS (
         |  SELECT a.label, v.pos,
         |         CAST(sum(CAST(floor(v.x * $Qs) AS BIGINT)) AS DOUBLE) / $Qs / count(*) AS c
         |  FROM longf v JOIN assign_0 a USING (vec_id) GROUP BY a.label, v.pos)""".stripMargin)
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(
        s""",
           |dist_$r AS (
           |  SELECT v.vec_id, c.label AS cand_label,
           |         sum(CAST(floor((v.x - c.c) * (v.x - c.c) * $Qs) AS BIGINT)) AS d2q
           |  FROM longf v JOIN cents_$p c ON v.pos = c.pos GROUP BY v.vec_id, c.label),
           |assign_$r AS (
           |  SELECT vec_id, cand_label AS label FROM (
           |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2q, cand_label) AS rn
           |    FROM dist_$r) WHERE rn = 1),
           |cents_$r AS (
           |  SELECT a.label, v.pos,
           |         CAST(sum(CAST(floor(v.x * $Qs) AS BIGINT)) AS DOUBLE) / $Qs / count(*) AS c
           |  FROM longf v JOIN assign_$r a USING (vec_id) GROUP BY a.label, v.pos),
           |stats_$r AS (
           |  SELECT $r AS round,
           |    (SELECT CAST(sum(CASE WHEN o.label <> n.label THEN 1 ELSE 0 END) AS BIGINT)
           |     FROM assign_$p o JOIN assign_$r n USING (vec_id)) AS n_moved,
           |    (SELECT max(s) FROM (
           |       SELECT o.label,
           |              sqrt(CAST(sum(CAST(floor((n.c - o.c) * (n.c - o.c) * $Qs) AS BIGINT)) AS DOUBLE) / $Qs) AS s
           |       FROM cents_$p o JOIN cents_$r n ON o.label = n.label AND o.pos = n.pos
           |       GROUP BY o.label)) AS max_shift,
           |    (SELECT count(DISTINCT label) FROM assign_$r) AS n_active_labels)""".stripMargin)
    }
    sb.append("\n" +
      (1 to rounds).map(r =>
        s"SELECT CAST(round AS BIGINT) AS round, n_moved, max_shift, n_active_labels, " +
          s"n_moved = 0 AS converged FROM stats_$r").mkString("\nUNION ALL\n"))
    sb.append("\nORDER BY round")
    sb.toString
  }

  def ivfTopKSql: String =
    s"""WITH longf AS (
       |  SELECT vec_id, label, unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |qlong AS (SELECT pos, x AS y FROM longf WHERE vec_id = 0),
       |centroids AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |           / 1099511627776.0 / count(*) AS c
       |  FROM longf GROUP BY label, pos),
       |probes AS (
       |  SELECT label FROM (
       |    SELECT ct.label,
       |           (CAST(sum(CAST(floor(CAST(ql.y AS DOUBLE) * ct.c * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0)
       |             / sqrt(CAST(sum(CAST(floor(ct.c * ct.c * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0) AS score
       |    FROM centroids ct JOIN qlong ql ON ct.pos = ql.pos GROUP BY ct.label)
       |  ORDER BY score DESC, label LIMIT 2)
       |SELECT vec_id, label, ${cosineSql("embedding", "qe")} AS cosine
       |FROM embeddings JOIN probes USING (label) CROSS JOIN q
       |WHERE vec_id <> 0
       |ORDER BY cosine DESC, vec_id LIMIT 10""".stripMargin

  /** Embedding-cosine near-dup pairs: 16-bit sign-bucket candidates, exact
    * cosine ≥ 0.999. Exact copies (vec_id%11==0, +100k id) are injected so
    * the operator has work to find. */
  def embeddingDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val copies = emb.where(col("vec_id") % 11 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val all = emb.unionAll(copies).withColumn("bucket", signCode16(col("embedding")))

    val l = all.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val r = all.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    l.join(r, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(spark, "e_a", "e_b").as("cosine"))
      .where(col("cosine") >= 0.999)
      .orderBy("id_a", "id_b")
  }

  def embeddingDupSql: String = {
    val code = signCode16Sql("embedding")
    s"""WITH allv AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 11 = 0),
       |coded AS (SELECT vec_id, embedding, $code AS bucket FROM allv),
       |cands AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
       |  FROM coded a JOIN coded b ON a.bucket = b.bucket WHERE a.vec_id < b.vec_id)
       |SELECT id_a, id_b, ${cosineSql("ea", "eb")} AS cosine
       |FROM cands
       |WHERE ${cosineSql("ea", "eb")} >= 0.999
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Embedding-level benchmark contamination — the SEMANTIC complement of
    * the exact-digest and n-gram checks (`pipe_contamination`,
    * `pipe_contamination_ngram`): a training vector that cosine-matches a
    * held-out benchmark vector at ≥ 0.999 is an embedding-space
    * (near-)copy the text-level scans can miss (paraphrase, translation,
    * format shuffle). Benchmark = every 50th vector plus injected copies
    * of train vectors (vec_id % 37, +200k id) so contamination provably
    * exists and is found; sign-preserving copies guarantee bucket-level
    * recall by construction.
    *
    * Scale shape: bench × train only within equal 16-bit sign buckets —
    * never train×train (the incremental-admission candidate discipline);
    * expected candidates = |bench|·|train|/65536 per-bucket-balanced.
    * One summary row. */
  def contaminationSemantic(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val injected = emb
      .where(col("vec_id") % 37 === 0 && col("vec_id") % 50 =!= 0)
      .select((col("vec_id") + 200000L).as("vec_id"), col("embedding"))
    val isBench = col("vec_id") % 50 === 0 || col("vec_id") >= 200000L
    val all = emb.unionAll(injected)
      .withColumn("bucket", signCode16(col("embedding")))
    val bench = all.where(isBench)
      .select(col("bucket"), col("vec_id").as("bench_id"), col("embedding").as("e_b"))
    val train = all.where(!isBench)
      .select(col("bucket"), col("vec_id").as("train_id"), col("embedding").as("e_t"))
    val hits = train.join(bench, Seq("bucket"))
      .where(cosine(spark, "e_t", "e_b") >= 0.999)
    bench.agg(count(lit(1)).as("n_benchmark"))
      .crossJoin(train.agg(count(lit(1)).as("n_train")))
      .crossJoin(hits.agg(
        countDistinct(col("train_id")).as("n_contaminated"),
        countDistinct(col("bench_id")).as("n_affected_bench")))
  }

  def contaminationSemanticSql: String = {
    val code = signCode16Sql("embedding")
    s"""WITH allv AS (
       |  SELECT vec_id, embedding FROM embeddings
       |  UNION ALL SELECT vec_id + 200000, embedding FROM embeddings
       |  WHERE vec_id % 37 = 0 AND vec_id % 50 <> 0),
       |coded AS (SELECT vec_id, embedding, $code AS bucket FROM allv),
       |bench AS (SELECT bucket, vec_id, embedding FROM coded
       |          WHERE vec_id % 50 = 0 OR vec_id >= 200000),
       |train AS (SELECT bucket, vec_id, embedding FROM coded
       |          WHERE NOT (vec_id % 50 = 0 OR vec_id >= 200000)),
       |hits AS (
       |  SELECT t.vec_id AS train_id, b.vec_id AS bench_id
       |  FROM train t JOIN bench b ON t.bucket = b.bucket
       |  WHERE ${cosineSql("t.embedding", "b.embedding")} >= 0.999)
       |SELECT (SELECT count(*) FROM bench) AS n_benchmark,
       |       (SELECT count(*) FROM train) AS n_train,
       |       (SELECT count(DISTINCT train_id) FROM hits) AS n_contaminated,
       |       (SELECT count(DISTINCT bench_id) FROM hits) AS n_affected_bench""".stripMargin
  }

  /** SemDeDup-style semantic dedup: candidate pairs come from the IVF
    * partition (label) refined by the 16-bit sign bucket, and any vector
    * whose cosine to a lower-id cluster-mate clears the threshold is
    * dropped in favor of that keeper — the "same meaning, different
    * bytes" dedup that exact/minhash text dedup can't see.
    *
    * The corpus has no natural semantic dups (max within-bucket cosine
    * ≈ 0.38), so deterministic near-copies are injected: every 7th
    * vector re-appears (+200k id) with dims i≡1 (mod 3) rescaled ×1.4 —
    * a direction change small enough that cosine ≥ 0.986 for ANY energy
    * split across dims (worst case at 5/12 of energy on the scaled
    * dims), so the 0.95 threshold always fires. The perturbation rounds
    * double→float identically on both engines.
    *
    * Scale shape: pairs exist only within (label, sign-bucket) — |data|
    * /(labels·65536) expected bucket size; the ×1.4 rescale is sign-
    * preserving, so injected near-copies share all 16 bucket bits with
    * their originals by construction — and the keeper reduction is one
    * more shuffle keyed by the dropped id, proportional to the dup
    * population. */
  /** The deterministic semantic-near-copy injection shared by
    * [[semanticDedup]] and [[semanticIncremental]]: every 7th vector
    * re-appears (+200k id) with dims i≡1 (mod 3) rescaled ×1.4. */
  private def perturbedCopies(emb: DataFrame): DataFrame =
    emb.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 200000L).as("vec_id"), col("label"),
        transform(sequence(lit(1), size(col("embedding"))),
          i => when(i % 3 === 1,
            (element_at(col("embedding"), i).cast("double") * lit(1.4)).cast("float"))
            .otherwise(element_at(col("embedding"), i))).as("embedding"))

  def semanticDedup(spark: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val all = emb.unionAll(perturbedCopies(emb)).withColumn("bucket", signCode16(col("embedding")))
    val l = all.select(col("label"), col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val r = all.select(col("label"), col("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    l.join(r, Seq("label", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(spark, "e_a", "e_b").as("cos"))
      .where(col("cos") >= threshold)
      .groupBy(col("id_b").as("drop_id"))
      .agg(
        min(col("id_a")).as("keeper_id"),
        count(lit(1)).as("n_near"),
        max(col("cos")).as("max_cosine"))
      .orderBy("drop_id")
  }

  def semanticDedupSql(threshold: Double = 0.95): String =
    s"""WITH pert AS (
       |  SELECT vec_id + 200000 AS vec_id, label,
       |         list_transform(generate_series(1, len(embedding)),
       |           i -> CASE WHEN i % 3 = 1
       |                THEN CAST(CAST(embedding[i] AS DOUBLE) * CAST(1.4 AS DOUBLE) AS FLOAT)
       |                ELSE embedding[i] END) AS embedding
       |  FROM embeddings WHERE vec_id % 7 = 0),
       |allv AS (
       |  SELECT vec_id, label, embedding FROM embeddings
       |  UNION ALL SELECT vec_id, label, embedding FROM pert),
       |coded AS (
       |  SELECT vec_id, label, embedding, ${signCode16Sql("embedding")} AS bucket FROM allv),
       |cands AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
       |  FROM coded a JOIN coded b
       |    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT id_b AS drop_id, min(id_a) AS keeper_id, count(*) AS n_near,
       |       max(${cosineSql("ea", "eb")}) AS max_cosine
       |FROM cands
       |WHERE ${cosineSql("ea", "eb")} >= $threshold
       |GROUP BY id_b ORDER BY drop_id""".stripMargin

  /** Incremental (batch-vs-index) SEMANTIC admission — the embedding twin
    * of [[graft.dedup.Dedup.incremental]], and the production shape at
    * 100 TB: today's embedded batch is admitted against the persisted
    * corpus index without ever re-pairing the index with itself. The
    * index is the original vectors; the "new batch" is the injected
    * perturbed copies (+200k id). Each batch vector reports its
    * best-matching index vector and an admit verdict at cosine <
    * `threshold`.
    *
    * Scale shape: candidates come ONLY from the (label × 16-bit
    * sign-bucket) equi-join of batch against index — cost scales with the
    * batch's bucket overlap, never |index|²; the best-match window
    * partitions on the batch id. In a deployed pipeline the index side is
    * a persisted bucketed table and only the batch is embedded fresh. */
  def semanticIncremental(spark: SparkSession, dir: String, threshold: Double = 0.95): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val idx = emb.withColumn("bucket", signCode16(col("embedding")))
      .select(col("label"), col("bucket"), col("vec_id").as("match_id"), col("embedding").as("e_i"))
    val batch = perturbedCopies(emb).withColumn("bucket", signCode16(col("embedding")))
    val cands = batch
      .select(col("label"), col("bucket"), col("vec_id"), col("embedding").as("e_b"))
      .join(idx, Seq("label", "bucket"))
      .select(col("vec_id"), col("match_id"), cosine(spark, "e_i", "e_b").as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cosine").desc, col("match_id"))
    val best = cands.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
    batch.select(col("vec_id")).join(best, Seq("vec_id"), "left")
      .withColumn("admitted", when(col("cosine") >= threshold, 0L).otherwise(1L))
      .orderBy("vec_id")
  }

  def semanticIncrementalSql(threshold: Double = 0.95): String =
    s"""WITH pert AS (
       |  SELECT vec_id + 200000 AS vec_id, label,
       |         list_transform(generate_series(1, len(embedding)),
       |           i -> CASE WHEN i % 3 = 1
       |                THEN CAST(CAST(embedding[i] AS DOUBLE) * CAST(1.4 AS DOUBLE) AS FLOAT)
       |                ELSE embedding[i] END) AS embedding
       |  FROM embeddings WHERE vec_id % 7 = 0),
       |idx AS (
       |  SELECT vec_id AS match_id, label, embedding AS e_i,
       |         ${signCode16Sql("embedding")} AS bucket
       |  FROM embeddings),
       |bat AS (
       |  SELECT vec_id, label, embedding AS e_b,
       |         ${signCode16Sql("embedding")} AS bucket
       |  FROM pert),
       |cand AS (
       |  SELECT b.vec_id, i.match_id, ${cosineSql("i.e_i", "b.e_b")} AS cosine
       |  FROM bat b JOIN idx i ON b.label = i.label AND b.bucket = i.bucket),
       |best AS (
       |  SELECT vec_id, match_id, cosine,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, match_id) AS rn
       |  FROM cand)
       |SELECT p.vec_id, b.match_id, b.cosine,
       |       CAST(CASE WHEN b.cosine >= $threshold THEN 0 ELSE 1 END AS BIGINT) AS admitted
       |FROM (SELECT vec_id FROM pert) p
       |LEFT JOIN (SELECT vec_id, match_id, cosine FROM best WHERE rn = 1) b USING (vec_id)
       |ORDER BY p.vec_id""".stripMargin

  /** ANN quality evaluation: recall@k of the sign-LSH candidate search
    * against the exact brute-force top-k — the measurement that decides
    * whether an index's bucket width is acceptable before it ships. Both
    * top-k sets are k rows, so the compare is a tagged union + one tiny
    * aggregation; the expensive parts are the two searches themselves. */
  def recallEval(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val brute = bruteForceTopK(spark, dir, k)
      .select(col("vec_id"), lit(1).as("b"), lit(0).as("l"))
    val lsh = lshTopK(spark, dir, k)
      .select(col("vec_id"), lit(0).as("b"), lit(1).as("l"))
    brute.unionAll(lsh)
      .groupBy("vec_id")
      .agg(max(col("b")).as("in_brute"), max(col("l")).as("in_lsh"))
      .agg(
        sum(col("in_brute")).as("n_brute"),
        sum(col("in_lsh")).as("n_lsh"),
        count(when(col("in_brute") === 1 && col("in_lsh") === 1, 1)).as("n_common"))
      .withColumn("recall_at_k",
        col("n_common").cast("double") / col("n_brute").cast("double"))
  }

  def recallEvalSql(k: Int = 10): String =
    s"""WITH q AS (SELECT embedding AS qe, ${signCodeSql("embedding")} AS qbucket
       |           FROM embeddings WHERE vec_id = 0),
       |brute AS (
       |  SELECT vec_id FROM embeddings CROSS JOIN q
       |  WHERE vec_id <> 0
       |  ORDER BY ${cosineSql("embedding", "qe")} DESC, vec_id LIMIT $k),
       |lsh AS (
       |  SELECT e.vec_id
       |  FROM (SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings) e
       |  JOIN q ON e.bucket = q.qbucket
       |  WHERE e.vec_id <> 0
       |  ORDER BY ${cosineSql("e.embedding", "q.qe")} DESC, e.vec_id LIMIT $k),
       |tagged AS (
       |  SELECT vec_id, 1 AS b, 0 AS l FROM brute
       |  UNION ALL SELECT vec_id, 0 AS b, 1 AS l FROM lsh),
       |flags AS (
       |  SELECT vec_id, max(b) AS in_brute, max(l) AS in_lsh FROM tagged GROUP BY vec_id)
       |SELECT CAST(sum(in_brute) AS BIGINT) AS n_brute,
       |       CAST(sum(in_lsh) AS BIGINT) AS n_lsh,
       |       count(CASE WHEN in_brute = 1 AND in_lsh = 1 THEN 1 END) AS n_common,
       |       CAST(count(CASE WHEN in_brute = 1 AND in_lsh = 1 THEN 1 END) AS DOUBLE)
       |         / CAST(sum(in_brute) AS DOUBLE) AS recall_at_k
       |FROM flags""".stripMargin

  /** Matryoshka (prefix-truncation) retrieval curve — recall@k of
    * brute-force search over the embedding's FIRST d/den dimensions
    * (den ∈ {4, 2, 1}) against the full-dimension top-k. The question a
    * modern embedding pipeline asks of an MRL-trained model (Kusupati et
    * al., "Matryoshka Representation Learning", NeurIPS 2022): how many
    * prefix dimensions does retrieval actually need? Serving the d/4
    * prefix costs a quarter of every dot product AND of the index's
    * memory, so this curve prices the cheapest prefix that clears a
    * recall target — the same read as [[probeSweep]], on the storage
    * axis instead of the probe axis.
    *
    * Scale shape: each level is one broadcast-query scan over a SLICED
    * column + TakeOrderedAndProject (k rows) — never a corpus-wide rank
    * window; the recall join handles ≤ 4k rows total. The den=1 row is a
    * built-in sanity check (recall 1.0 by construction). */
  def matryoshkaRecall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val full = bruteForceTopK(spark, dir, k).select(col("vec_id"), lit(1L).as("in_full"))
    val levels = Seq(4, 2, 1)
    val perLevel = levels.map { den =>
      val trunc = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
        .select(col("vec_id"),
          expr(s"graft_cosine(slice(embedding, 1, size(embedding) DIV $den), " +
            s"slice(qe, 1, size(qe) DIV $den))").as("c"))
        .orderBy(col("c").desc, col("vec_id"))
        .limit(k)
      trunc.join(full, Seq("vec_id"), "left")
        .agg(count(lit(1)).as("n_retrieved"),
          sum(coalesce(col("in_full"), lit(0L))).as("n_common"))
        .select(lit(den.toLong).as("prefix_den"), col("n_retrieved"), col("n_common"),
          (col("n_common").cast("double") / lit(k.toDouble)).as("recall_at_k"))
    }
    perLevel.reduce(_.unionAll(_)).orderBy(col("prefix_den").desc)
  }

  def matryoshkaRecallSql(k: Int = 10): String = {
    def level(den: Int): String = {
      val e = s"embedding[1:len(embedding)//$den]"
      val qq = s"qe[1:len(qe)//$den]"
      s"""lv$den AS (
         |  SELECT vec_id FROM embeddings CROSS JOIN q
         |  WHERE vec_id <> 0
         |  ORDER BY ${cosineSql(e, qq)} DESC, vec_id LIMIT $k),
         |r$den AS (
         |  SELECT CAST($den AS BIGINT) AS prefix_den,
         |         count(*) AS n_retrieved,
         |         CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         |         CAST(sum(CASE WHEN f.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / $k AS recall_at_k
         |  FROM lv$den l LEFT JOIN full_k f ON l.vec_id = f.vec_id)""".stripMargin
    }
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |full_k AS (
       |  SELECT vec_id FROM embeddings CROSS JOIN q
       |  WHERE vec_id <> 0
       |  ORDER BY ${cosineSql("embedding", "qe")} DESC, vec_id LIMIT $k),
       |${level(4)},
       |${level(2)},
       |${level(1)}
       |SELECT * FROM r4 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r1
       |ORDER BY prefix_den DESC""".stripMargin
  }

  /** Probe-count tuning sweep: recall@k of multi-probe sign-LSH at 1, 3,
    * 5, and 9 probes (query bucket + the first p−1 Hamming-1 flips)
    * against the exact brute-force top-k — the curve an operator reads
    * to pick the cheapest probe count that clears a recall target.
    *
    * Scale shape: each probe level is its own bounded bucket join +
    * TakeOrderedAndProject (never a corpus-wide rank window); the levels
    * union k-row results, so the recall join handles ≤ 4k+k rows. */
  def probeSweep(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val levels = Seq(1, 3, 5, 9)
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val q = emb.where(col("vec_id") === 0).limit(1)
      .select(col("embedding").as("qe"), col("bucket").as("qbucket"))
    val brute = bruteForceTopK(spark, dir, k).select(col("vec_id"), lit(1).as("in_brute"))
    val tagged = levels.map { p =>
      val probeCols = col("qbucket") +:
        (0 until (p - 1)).map(j => col("qbucket").bitwiseXOR(lit(1L << j)))
      val probes = q.select(col("qe"), explode(array(probeCols: _*)).as("probe"))
      emb.where(col("vec_id") =!= 0)
        .join(broadcast(probes), col("bucket") === col("probe"))
        .select(col("vec_id"), cosine(spark, "embedding", "qe").as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
        .limit(k)
        .select(lit(p).cast("long").as("n_probes"), col("vec_id"))
    }.reduce(_ unionAll _)
    val counted = tagged.join(broadcast(brute), Seq("vec_id"), "left")
      .groupBy("n_probes")
      .agg(
        count(lit(1)).as("n_returned"),
        sum(coalesce(col("in_brute"), lit(0))).cast("long").as("n_common"))
    // a probe level whose buckets hold nothing but the query itself
    // returns zero candidates — the sweep must still report that level
    // (recall 0), not silently drop the row
    val allLevels = emb.sparkSession.createDataFrame(levels.map(p => Tuple1(p.toLong)))
      .toDF("n_probes")
    allLevels.join(counted, Seq("n_probes"), "left")
      .select(col("n_probes"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("recall_at_k", col("n_common").cast("double") / lit(k.toDouble))
      .orderBy("n_probes")
  }

  def probeSweepSql(k: Int = 10): String = {
    val levels = Seq(1, 3, 5, 9)
    val levelCtes = levels.map { p =>
      val flips = (0 until (p - 1)).map(j => s"SELECT qe, xor(qbucket, ${1L << j}) AS probe FROM q")
      val probes = (s"SELECT qe, qbucket AS probe FROM q" +: flips).mkString("\n    UNION ALL ")
      s"""lsh$p AS (
         |  SELECT $p AS n_probes, vec_id
         |  FROM coded JOIN ($probes) pr ON coded.bucket = pr.probe
         |  WHERE vec_id <> 0
         |  ORDER BY ${cosineSql("embedding", "qe")} DESC, vec_id LIMIT $k)"""
        .stripMargin
    }.mkString(",\n")
    val unions = levels.map(p => s"SELECT n_probes, vec_id FROM lsh$p").mkString("\n  UNION ALL ")
    val levelRows = levels.map(p => s"SELECT $p AS n_probes").mkString(" UNION ALL ")
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM coded WHERE vec_id = 0),
       |brute AS (
       |  SELECT vec_id, 1 AS in_brute FROM coded CROSS JOIN q
       |  WHERE vec_id <> 0
       |  ORDER BY ${cosineSql("embedding", "qe")} DESC, vec_id LIMIT $k),
       |$levelCtes,
       |tagged AS (
       |  $unions),
       |counted AS (
       |  SELECT t.n_probes, count(*) AS n_returned,
       |         CAST(sum(coalesce(b.in_brute, 0)) AS BIGINT) AS n_common
       |  FROM tagged t LEFT JOIN brute b USING (vec_id)
       |  GROUP BY t.n_probes),
       |lvls AS ($levelRows)
       |SELECT CAST(lvls.n_probes AS BIGINT) AS n_probes,
       |       coalesce(counted.n_returned, 0) AS n_returned,
       |       coalesce(counted.n_common, 0) AS n_common,
       |       CAST(coalesce(counted.n_common, 0) AS DOUBLE) / CAST($k AS DOUBLE) AS recall_at_k
       |FROM lvls LEFT JOIN counted USING (n_probes)
       |ORDER BY n_probes""".stripMargin
  }

  /** Batch k-NN join: every query vector (vec_id ≡ 0 mod 100) gets its
    * top-k neighbors from the corpus, candidates bounded to the query's
    * sign-LSH bucket. This is the many-queries form of [[lshTopK]]:
    * candidate scoring is one bucket-equality join (AQE broadcasts the
    * bare (id, vec, bucket) query side when it fits, shuffles when it
    * doesn't) with per-row codegen'd cosine; ranking is a window
    * partitioned by query id (the join key — no extra shuffle). */
  def knnJoin(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val q = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cosine").desc, col("neighbor_id"))
    // no forced broadcast: the query set is |corpus|/100 — unbounded at
    // lake scale. AQE picks broadcast at runtime whenever it actually fits.
    emb.join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        cosine(spark, "embedding", "qe").as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .orderBy("q_id", "rank")
  }

  def knnJoinSql(k: Int = 3): String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS qe, bucket FROM coded WHERE vec_id % 100 = 0),
       |scored AS (
       |  SELECT q.q_id, e.vec_id AS neighbor_id,
       |         ${cosineSql("e.embedding", "q.qe")} AS cosine
       |  FROM coded e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id),
       |ranked AS (
       |  SELECT q_id, neighbor_id, cosine,
       |         CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, neighbor_id, cosine, rank FROM ranked
       |WHERE rank <= $k ORDER BY q_id, rank""".stripMargin

  /** Product-quantization top-k (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search", TPAMI 2011) — the compressed-domain scale
    * path: 64-dim vectors split into 4 subspaces of 16 dims, each
    * subvector coded to its nearest of 16 codebook entries (L2), and the
    * query scored against CODES ONLY via the asymmetric distance
    * Σ_s d²(query_s, codebook[s][code_s]). At 100 TB the corpus stores
    * 4 bytes/vector instead of 256 and never re-reads raw floats at
    * query time.
    *
    * Determinism: the codebook is the seed vectors vec_id 1..16 (sampled
    * init — no iterative k-means, so no float-order dependence); every
    * distance is an index-ordered fold; code assignment ties break to
    * the lowest code on both engines (first-occurrence array_position).
    *
    * Scale shape: the codebook (64 small rows → one nested-array row)
    * and the query broadcast; encode + ADC scoring are pure per-row
    * expressions — one corpus scan, ZERO shuffles before
    * TakeOrderedAndProject. */
  def pqTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    pqTopKOf(spark, Tables.load(spark, dir, "embeddings"), k)

  private[graft] def pqTopKOf(spark: SparkSession, emb: DataFrame, k: Int): DataFrame =
    pqTopKOver(spark, emb, emb, k).drop("label")

  /** Embedding centroid drift between two interleaved snapshots (even
    * vs odd vec_ids stand in for "yesterday's export vs today's"): per
    * label, the cosine between the two snapshot centroids — the
    * index-staleness monitor that decides when an ANN index or PQ
    * codebook must be rebuilt because the distribution moved. All
    * cross-row sums (centroid means and the centroid dot products) use
    * the module's 2⁴⁰ quantize-to-long trick, so the drift score is
    * bit-identical on any engine and partitioning.
    *
    * Scale shape: one posexplode + a (label, half, pos) partial-agg
    * shuffle, then a co-partitioned self-join on (label, pos) over the
    * |labels|×dims centroid rows — never touches raw-vector pairs. */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val long = Tables.load(spark, dir, "embeddings")
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
    val cent = long
      .groupBy("label", "half", "pos")
      .agg(
        sum(floor(col("x").cast("double") * Q).cast("long").cast(DecimalType(38, 0))).as("snum"),
        count(lit(1)).as("n"))
      .select(col("label"), col("half"), col("pos"), col("n"),
        (col("snum").cast("double") / Q / col("n")).as("c"))
    val a = cent.where(col("half") === 0)
      .select(col("label"), col("pos"), col("n").as("n_a"), col("c").as("ca"))
    val b = cent.where(col("half") === 1)
      .select(col("label"), col("pos"), col("n").as("n_b"), col("c").as("cb"))
    a.join(b, Seq("label", "pos"))
      .groupBy(col("label").cast("long").as("label"))
      .agg(
        max(col("n_a")).as("n_a"),
        max(col("n_b")).as("n_b"),
        sum(floor(col("ca") * col("cb") * Q).cast("long").cast(DecimalType(38, 0))).as("sab"),
        sum(floor(col("ca") * col("ca") * Q).cast("long").cast(DecimalType(38, 0))).as("saa"),
        sum(floor(col("cb") * col("cb") * Q).cast("long").cast(DecimalType(38, 0))).as("sbb"))
      .select(col("label"), col("n_a"), col("n_b"),
        ((col("sab").cast("double") / Q) /
          (sqrt(col("saa").cast("double") / Q) * sqrt(col("sbb").cast("double") / Q)))
          .as("drift_cosine"))
      .orderBy("label")
  }

  val centroidDriftSql: String =
    s"""WITH longf AS (
       |  SELECT label, vec_id % 2 AS half, unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |cent AS (
       |  SELECT label, half, pos, count(*) AS n,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |           / 1099511627776.0 / count(*) AS c
       |  FROM longf GROUP BY label, half, pos),
       |j AS (
       |  SELECT a.label, a.n AS n_a, b.n AS n_b, a.c AS ca, b.c AS cb
       |  FROM cent a JOIN cent b ON a.label = b.label AND a.pos = b.pos
       |  WHERE a.half = 0 AND b.half = 1)
       |SELECT CAST(label AS BIGINT) AS label, max(n_a) AS n_a, max(n_b) AS n_b,
       |       (CAST(sum(CAST(floor(ca * cb * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0)
       |         / (sqrt(CAST(sum(CAST(floor(ca * ca * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0)
       |            * sqrt(CAST(sum(CAST(floor(cb * cb * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0)) AS drift_cosine
       |FROM j GROUP BY label ORDER BY label""".stripMargin

  /** PQ quality evaluation: recall@k of the compressed-domain ADC search
    * against the exact L2 top-k — the fidelity gate that decides whether
    * a 64:1-compression codebook is acceptable before the raw vectors
    * are archived. (ADC approximates L2, so L2 — not cosine — is the
    * honest baseline.) Both top-k sets are k rows; the compare is a
    * tagged union + one tiny aggregation, like [[recallEval]]. */
  def pqRecall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val exact = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(k)
      .select(col("vec_id"), lit(1).as("e"), lit(0).as("p"))
    val pq = pqTopK(spark, dir, k).select(col("vec_id"), lit(0).as("e"), lit(1).as("p"))
    exact.unionAll(pq)
      .groupBy("vec_id")
      .agg(max(col("e")).as("in_exact"), max(col("p")).as("in_pq"))
      .agg(
        sum(col("in_exact")).as("n_exact"),
        sum(col("in_pq")).as("n_pq"),
        count(when(col("in_exact") === 1 && col("in_pq") === 1, 1)).as("n_common"))
      .withColumn("recall_at_k",
        col("n_common").cast("double") / col("n_exact").cast("double"))
  }

  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  def pqRecallSql(k: Int = 10): String =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |exact AS (
       |  SELECT vec_id FROM embeddings CROSS JOIN q
       |  WHERE vec_id <> 0
       |  ORDER BY ${l2Sql("embedding", "qe")} ASC, vec_id LIMIT $k),
       |pqk AS (SELECT vec_id FROM (${pqTopKSql(k)}) pqt),
       |tagged AS (
       |  SELECT vec_id, 1 AS e, 0 AS p FROM exact
       |  UNION ALL SELECT vec_id, 0 AS e, 1 AS p FROM pqk),
       |flags AS (
       |  SELECT vec_id, max(e) AS in_exact, max(p) AS in_pq FROM tagged GROUP BY vec_id)
       |SELECT CAST(sum(in_exact) AS BIGINT) AS n_exact,
       |       CAST(sum(in_pq) AS BIGINT) AS n_pq,
       |       count(CASE WHEN in_exact = 1 AND in_pq = 1 THEN 1 END) AS n_common,
       |       CAST(count(CASE WHEN in_exact = 1 AND in_pq = 1 THEN 1 END) AS DOUBLE)
       |         / CAST(sum(in_exact) AS DOUBLE) AS recall_at_k
       |FROM flags""".stripMargin

  def pqTopKSql(k: Int = 10): String =
    s"""WITH cbrows AS (
       |  SELECT ss.s, vec_id - 1 AS c, embedding[ss.s*16+1 : ss.s*16+16] AS v
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss
       |  WHERE vec_id BETWEEN 1 AND 16),
       |cbs AS (SELECT s, list(v ORDER BY c) AS vs FROM cbrows GROUP BY s),
       |cbrow AS (SELECT list(vs ORDER BY s) AS cbl FROM cbs),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |scored AS (
       |  SELECT vec_id, qe, cbl,
       |    list_transform(range(0, 4), s ->
       |      list_transform(range(1, 17), c ->
       |        list_reduce(list_transform(range(1, 17), i ->
       |          (CAST(embedding[s*16+i] AS DOUBLE) - CAST(cbl[s+1][c][i] AS DOUBLE)) *
       |          (CAST(embedding[s*16+i] AS DOUBLE) - CAST(cbl[s+1][c][i] AS DOUBLE))),
       |          (x, y) -> x + y))) AS dls
       |  FROM embeddings CROSS JOIN cbrow CROSS JOIN q WHERE vec_id <> 0),
       |enc AS (
       |  SELECT vec_id, qe, cbl,
       |    list_transform(range(0, 4), s -> list_position(dls[s+1], list_min(dls[s+1]))) AS codes
       |  FROM scored)
       |SELECT vec_id,
       |  list_reduce(list_transform(range(0, 4), s ->
       |    list_reduce(list_transform(range(1, 17), i ->
       |      (CAST(qe[s*16+i] AS DOUBLE) - CAST(cbl[s+1][codes[s+1]][i] AS DOUBLE)) *
       |      (CAST(qe[s*16+i] AS DOUBLE) - CAST(cbl[s+1][codes[s+1]][i] AS DOUBLE))),
       |      (x, y) -> x + y)),
       |    (x, y) -> x + y) AS adc_dist
       |FROM enc ORDER BY adc_dist, vec_id LIMIT $k""".stripMargin

  /** Per-dimension variance profile — the dead-dimension detector that
    * completes [[normStats]]'s embedding-hygiene gate: a dimension whose
    * variance collapsed (dead ReLU path, truncated export, constant
    * padding) silently wastes index bits in every PQ/SQ8 codebook built
    * on it. Per dimension: mean, variance, and a dead flag (variance
    * below 1e-6). All cross-row sums 2⁴⁰-quantized to longs, so the
    * profile is bit-identical on any engine and partitioning; variance
    * uses the E[x²]−E[x]² form over the quantized sums.
    *
    * Scale shape: one posexplode + ONE (pos) partial-agg shuffle of
    * |dims| rows — never a vector pair. */
  def dimVariance(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * Q).cast("long")
          .cast(DecimalType(38, 0))).as("s1"),
        sum(floor(col("x").cast("double") * col("x").cast("double") * Q)
          .cast("long").cast(DecimalType(38, 0))).as("s2"))
      .select(col("pos"), col("n"),
        (col("s1").cast("double") / Q / col("n").cast("double")).as("mean"),
        ((col("s2").cast("double") / Q / col("n").cast("double")) -
          (col("s1").cast("double") / Q / col("n").cast("double")) *
          (col("s1").cast("double") / Q / col("n").cast("double"))).as("variance"))
      .withColumn("dead", col("variance") < 1e-6)
      .orderBy("pos")

  val dimVarianceSql: String =
    """WITH longf AS (
      |  SELECT unnest(embedding) AS x,
      |         unnest(generate_series(0, len(embedding) - 1)) AS pos
      |  FROM embeddings),
      |g AS (
      |  SELECT pos, count(*) AS n,
      |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0 AS s1,
      |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0 AS s2
      |  FROM longf GROUP BY pos)
      |SELECT CAST(pos AS BIGINT) AS pos, n,
      |       s1 / n AS mean,
      |       s2 / n - (s1 / n) * (s1 / n) AS variance,
      |       s2 / n - (s1 / n) * (s1 / n) < 1e-6 AS dead
      |FROM g ORDER BY pos""".stripMargin

  /** Two-stage retrieval: PQ ADC shortlist → EXACT rerank — the canonical
    * production pattern (shortlist from the compressed domain, then true
    * L2 over the raw vectors of ONLY the shortlist). The shortlist size
    * (5k) is the recall/IO dial: the final answer costs `shortlist`
    * raw-vector fetches instead of a whole-corpus float scan, and any
    * shortlist member the codebook mis-ranked is repaired by the exact
    * stage as long as the true neighbor made the shortlist at all. At
    * 100 TB the raw vectors live in cold storage keyed by vec_id; this
    * join IS the fetch. Output is exact distances — downstream consumers
    * never see quantization error, only quantization RECALL loss (priced
    * by [[pqRecall]]).
    *
    * r17 ProfileAB adjudication (r16 verdict item 8) vs
    * [[pqRerankFused]], which carries the raw vector through the ADC
    * shortlist so no second corpus scan exists: same-window interleaved,
    * 7 passes, sf0.1 — fused median 0.584 s / min 0.515 vs this form's
    * 0.690 / 0.586 (~15% faster at driver scale, where re-scanning a
    * resident 10 MB corpus costs more than padding a small shuffle).
    * KEPT UNREGISTERED as the measured counter-example: carrying the
    * 256-byte vector through the |corpus|·m-row ADC exchange multiplies
    * the plan's dominant shuffle ~9× in bytes, and at 100 TB it requires
    * the raw floats to be resident in the compressed-domain scan at all
    * — exactly the memory/IO budget PQ exists to avoid. Round17Spec pins
    * output identity and that no ADC exchange of THIS form ships the
    * vector. The 1.50× clean-window watch flag on this query is
    * environment drift (§8m r12-binary burn-down), not a wrong shape. */
  def pqRerank(spark: SparkSession, dir: String, k: Int = 10, shortlist: Int = 50): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val short = pqTopK(spark, dir, shortlist).select("vec_id")
    short.join(emb, "vec_id") // raw-vector fetch for the shortlist only
      .crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("l2sq"))
      .orderBy(col("l2sq").asc, col("vec_id")).limit(k)
  }

  def pqRerankSql(k: Int = 10, shortlist: Int = 50): String =
    s"""WITH short AS (SELECT vec_id FROM (${pqTopKSql(shortlist)}) s),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT e.vec_id, ${l2Sql("e.embedding", "qe")} AS l2sq
       |FROM embeddings e JOIN short USING (vec_id) CROSS JOIN q
       |ORDER BY l2sq ASC, e.vec_id LIMIT $k""".stripMargin

  /** IVF-PQ top-k — the production composition of the two index halves
    * (the default faiss shape for billion-vector search): the query
    * probes its best 2 IVF cells exactly as [[ivfTopK]] does (quantized
    * centroid cosine, deterministic ties), and the PQ asymmetric scan of
    * [[pqTopK]] then runs ONLY inside the probed cells. At 100 TB this
    * is the index that makes compressed-domain search tractable: the
    * corpus is label-partitioned on disk, a probe prunes the scan to
    * nprobe/nlist of the data, and each scanned vector costs a 4-byte
    * code distance, never a raw-float read.
    *
    * Scale shape: probe selection aggregates |labels|×dims centroid
    * rows; the probe set (2 rows), codebook row, and query broadcast;
    * the scan is partition-pruned per-row expression work with ZERO
    * shuffles before TakeOrderedAndProject. */
  def ivfpqTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    ivfpqTopKOf(spark, Tables.load(spark, dir, "embeddings"), k)

  private[graft] def ivfpqTopKOf(spark: SparkSession, emb: DataFrame, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val centroids = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(
        sum(floor(col("x").cast("double") * Q).cast("long").cast(DecimalType(38, 0))).as("snum"),
        count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("snum").cast("double") / Q / col("n")).as("c"))
    val qLong = q.select(posexplode(col("qe")).as(Seq("pos", "y")))
    val probes = centroids
      .join(broadcast(qLong), "pos")
      .groupBy("label")
      .agg(
        sum(floor(col("y").cast("double") * col("c") * Q).cast("long").cast(DecimalType(38, 0))).as("sn"),
        sum(floor(col("c") * col("c") * Q).cast("long").cast(DecimalType(38, 0))).as("ncn"))
      .select(col("label"),
        ((col("sn").cast("double") / Q) / sqrt(col("ncn").cast("double") / Q)).as("score"))
      .orderBy(col("score").desc, col("label"))
      .limit(2)
      .select(col("label").as("probe_label"))
    val restricted = emb
      .join(broadcast(probes), col("label") === col("probe_label"))
      .select(emb.columns.toIndexedSeq.map(col): _*)
    pqTopKOver(spark, emb, restricted, k)
  }

  /** PQ asymmetric scan with a separate codebook/query source and scan
    * corpus — the shared core of [[pqTopKOf]] (corpus = everything) and
    * [[ivfpqTopK]] (corpus = the probed IVF cells). */
  /** `carryEmbedding` is the [[pqRerankFused]] A/B variant: the raw
    * vector rides the ADC pipeline as a first()-aggregate through BOTH
    * shuffles, so the shortlist emerges with vectors attached and the
    * rerank needs no second corpus scan — at the price of a 256-byte
    * payload per row in the |corpus|·m-row exchange that the
    * compressed-domain scan exists to avoid. Default off (the
    * registered form). */
  private def pqTopKOver(
      spark: SparkSession, cbSource: DataFrame, corpus: DataFrame, k: Int,
      carryEmbedding: Boolean = false): DataFrame = {
    val m = 4; val subDim = 16; val nCodes = 16
    GraftFunctions.register(spark)
    // The encode loop is the index-build hot path: 256·(d/m) float ops per
    // vector. The nested-lambda form (transform × transform × graft_l2sq
    // over a broadcast nested-array codebook) does NOT whole-stage-codegen
    // (higher-order functions fall back to interpreted eval — measured
    // 10.1 s/100k vectors in the ×50 smoke), so the scan is restructured
    // relationally: explode each vector into its m subvectors, broadcast-
    // join the 64-row (s, c, v) codebook table, score every pair with the
    // CODEGEN'd graft_l2sq, and take the per-(vec, s) argmin as a map-side
    // partial min — the 16 candidates of one subvector never leave their
    // partition, so the exchange carries |corpus|·m rows, not ·m·nCodes.
    // Bit-parity: the scored distances are the identical graft_l2sq calls
    // on identical slices; min(struct(d, c)) ties to the lowest code
    // exactly like array_position-of-array_min; and the final ADC sum
    // folds the m per-subspace lookups in s-order via an ordered
    // collect+aggregate, matching the oracle's sequential list_reduce.
    val cb = cbSource.where(col("vec_id").between(1, nCodes))
      .select((col("vec_id") - 1).as("c"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("s"))
      .select(col("s"), col("c"),
        slice(col("embedding"), col("s") * subDim + 1, lit(subDim)).as("v"))
    val q = cbSource.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    // ADC lookup table: query-subvector distance to every codebook entry
    // (m·nCodes = 64 rows, broadcast back)
    val qdist = cb.crossJoin(broadcast(q))
      .select(col("s"), col("c"),
        expr(s"graft_l2sq(slice(qe, s * $subDim + 1, $subDim), v)").as("qd"))
    // argmin by (distance, code) as a PLAIN min over a packed integer
    // key: for the non-negative l2sq distances, IEEE bits are
    // order-isomorphic to the value (graft_dbits), so
    // min(bits(d)·nCodes + c) ranks exactly like min(struct(d, c)) —
    // equal distances have equal bits and ties fall to the lower code —
    // but runs as a map-side-combined HashAggregate where the struct min
    // falls back to SortAggregate and SORTS the full scored pair set.
    // bits(d)·16 exceeds a long, so the key is DECIMAL(38,0).
    val carryIn: Seq[org.apache.spark.sql.Column] =
      if (carryEmbedding) Seq(col("embedding")) else Seq.empty
    def carryAgg: Seq[org.apache.spark.sql.Column] =
      if (carryEmbedding) Seq(first(col("embedding")).as("embedding")) else Seq.empty
    val coded = corpus.where(col("vec_id") =!= 0)
      .select(Seq(col("vec_id"), col("label"),
        explode(sequence(lit(0), lit(m - 1))).as("s"), col("embedding")): _*)
      .select(Seq(col("vec_id"), col("label"), col("s"),
        slice(col("embedding"), col("s") * subDim + 1, lit(subDim)).as("sv")) ++ carryIn: _*)
      .join(broadcast(cb), "s")
      .select(Seq(col("vec_id"), col("label"), col("s"),
        (expr("graft_dbits(graft_l2sq(sv, v))").cast(DecimalType(38, 0))
          * nCodes + col("c")).as("key")) ++ carryIn: _*)
      .groupBy("vec_id", "label", "s")
      .agg(min(col("key")).as("mk"), carryAgg: _*)
      .select(Seq(col("vec_id"), col("label"), col("s"),
        (col("mk") % nCodes).cast("long").as("c")) ++ carryIn: _*)
    coded.join(broadcast(qdist), Seq("s", "c"))
      .groupBy("vec_id", "label")
      .agg(sort_array(collect_list(struct(col("s"), col("qd")))).as("qds"), carryAgg: _*)
      .select(Seq(col("vec_id"), col("label"),
        aggregate(transform(col("qds"), e => e.getField("qd")),
          lit(0.0), (acc, x) => acc + x).as("adc_dist")) ++ carryIn: _*)
      .orderBy(col("adc_dist").asc, col("vec_id"))
      .limit(k)
  }

  /** The r17 ProfileAB variant of [[pqRerank]] (r16 verdict item 8):
    * fuse the exact rerank into the ADC scan by carrying the raw vector
    * through the shortlist TakeOrderedAndProject, so no second corpus
    * scan or fetch-join exists. Same output contract as pqRerank. Not
    * registered: see the A/B verdict in pqRerank's docstring — carrying
    * a 256-byte payload through the |corpus|·m-row exchange prices worse
    * than re-fetching `shortlist` rows, and at 100 TB it defeats the
    * compressed-domain memory budget outright. */
  private[graft] def pqRerankFused(spark: SparkSession, dir: String,
                                   k: Int = 10, shortlist: Int = 50): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    pqTopKOver(spark, emb, emb, shortlist, carryEmbedding = true)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("l2sq"))
      .orderBy(col("l2sq").asc, col("vec_id")).limit(k)
  }

  def ivfpqTopKSql(k: Int = 10): String =
    s"""WITH longf AS (
       |  SELECT vec_id, label, unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |qlong AS (SELECT pos, x AS y FROM longf WHERE vec_id = 0),
       |centroids AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |           / 1099511627776.0 / count(*) AS c
       |  FROM longf GROUP BY label, pos),
       |probes AS (
       |  SELECT label FROM (
       |    SELECT ct.label,
       |           (CAST(sum(CAST(floor(CAST(ql.y AS DOUBLE) * ct.c * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0)
       |             / sqrt(CAST(sum(CAST(floor(ct.c * ct.c * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0) AS score
       |    FROM centroids ct JOIN qlong ql ON ct.pos = ql.pos GROUP BY ct.label)
       |  ORDER BY score DESC, label LIMIT 2),
       |cbrows AS (
       |  SELECT ss.s, vec_id - 1 AS c, embedding[ss.s*16+1 : ss.s*16+16] AS v
       |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 4)) AS s) ss
       |  WHERE vec_id BETWEEN 1 AND 16),
       |cbs AS (SELECT s, list(v ORDER BY c) AS vs FROM cbrows GROUP BY s),
       |cbrow AS (SELECT list(vs ORDER BY s) AS cbl FROM cbs),
       |scored AS (
       |  SELECT vec_id, label, qe, cbl,
       |    list_transform(range(0, 4), s ->
       |      list_transform(range(1, 17), c ->
       |        list_reduce(list_transform(range(1, 17), i ->
       |          (CAST(embedding[s*16+i] AS DOUBLE) - CAST(cbl[s+1][c][i] AS DOUBLE)) *
       |          (CAST(embedding[s*16+i] AS DOUBLE) - CAST(cbl[s+1][c][i] AS DOUBLE))),
       |          (x, y) -> x + y))) AS dls
       |  FROM embeddings JOIN probes USING (label) CROSS JOIN cbrow CROSS JOIN q
       |  WHERE vec_id <> 0),
       |enc AS (
       |  SELECT vec_id, label, qe, cbl,
       |    list_transform(range(0, 4), s -> list_position(dls[s+1], list_min(dls[s+1]))) AS codes
       |  FROM scored)
       |SELECT vec_id, label,
       |  list_reduce(list_transform(range(0, 4), s ->
       |    list_reduce(list_transform(range(1, 17), i ->
       |      (CAST(qe[s*16+i] AS DOUBLE) - CAST(cbl[s+1][codes[s+1]][i] AS DOUBLE)) *
       |      (CAST(qe[s*16+i] AS DOUBLE) - CAST(cbl[s+1][codes[s+1]][i] AS DOUBLE))),
       |      (x, y) -> x + y)),
       |    (x, y) -> x + y) AS adc_dist
       |FROM enc ORDER BY adc_dist, vec_id LIMIT $k""".stripMargin

  /** The index menu — one decision table across the four vector-storage
    * formats this module implements: per format, bytes per vector, total
    * index bytes at this corpus size, and measured recall@10 against the
    * exact L2 top-k. This is the artifact an operator reads to pick the
    * 100 TB trade-off (raw floats for recall 1.0 at 256 B/vec, SQ8 at
    * 64 B, PQ/IVF-PQ at 4 B) — the same sweep faiss users run by hand,
    * as a single oracle-checked query.
    *
    * Scale shape: each recall cell joins two k-row top-k results; the
    * only corpus-sized work is the scans the underlying searches already
    * do, and the menu rows come from broadcast scalar aggregates. */
  def indexMenu(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val nRow = emb.agg(count(lit(1)).as("n_vectors"))
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    // pin (r19, guide §2.4): the exact top-k is joined by ALL THREE
    // recall cells, and each reference re-planned the corpus scan +
    // L2 TakeOrdered subtree. k rows, materialized once.
    val exact = pin(emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(k).select("vec_id"))
    def recallOf(topk: DataFrame, name: String) =
      topk.select("vec_id").join(exact, "vec_id")
        .agg((count(lit(1)).cast("double") / lit(k.toDouble)).as(name))
    nRow
      .crossJoin(broadcast(recallOf(pqTopK(spark, dir, k), "r_pq")))
      .crossJoin(broadcast(recallOf(sq8TopK(spark, dir, k), "r_sq8")))
      .crossJoin(broadcast(recallOf(ivfpqTopK(spark, dir, k), "r_ivfpq")))
      .select(explode(array(
        struct(lit("1_raw_float32").as("format"), lit(256L).as("bytes_per_vector"),
          (col("n_vectors") * 256L).as("total_bytes"), lit(1.0).as("recall_at_k")),
        struct(lit("2_sq8").as("format"), lit(64L).as("bytes_per_vector"),
          (col("n_vectors") * 64L).as("total_bytes"), col("r_sq8").as("recall_at_k")),
        struct(lit("3_pq").as("format"), lit(4L).as("bytes_per_vector"),
          (col("n_vectors") * 4L).as("total_bytes"), col("r_pq").as("recall_at_k")),
        struct(lit("4_ivfpq").as("format"), lit(4L).as("bytes_per_vector"),
          (col("n_vectors") * 4L).as("total_bytes"), col("r_ivfpq").as("recall_at_k")))).as("m"))
      .select(col("m.format").as("format"), col("m.bytes_per_vector").as("bytes_per_vector"),
        col("m.total_bytes").as("total_bytes"), col("m.recall_at_k").as("recall_at_k"))
      .orderBy("format")
  }

  def indexMenuSql(k: Int = 10): String =
    s"""WITH qm AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |ex AS (
       |  SELECT vec_id FROM embeddings CROSS JOIN qm
       |  WHERE vec_id <> 0
       |  ORDER BY ${l2Sql("embedding", "qe")} ASC, vec_id LIMIT $k),
       |nvec AS (SELECT count(*) AS n_vectors FROM embeddings),
       |rpq AS (
       |  SELECT CAST(count(*) AS DOUBLE) / CAST($k AS DOUBLE) AS r
       |  FROM (${pqTopKSql(k)}) p JOIN ex USING (vec_id)),
       |rsq AS (
       |  SELECT CAST(count(*) AS DOUBLE) / CAST($k AS DOUBLE) AS r
       |  FROM (${sq8TopKSql(k)}) s JOIN ex USING (vec_id)),
       |rivf AS (
       |  SELECT CAST(count(*) AS DOUBLE) / CAST($k AS DOUBLE) AS r
       |  FROM (${ivfpqTopKSql(k)}) i JOIN ex USING (vec_id))
       |SELECT format, bytes_per_vector, total_bytes, recall_at_k FROM (
       |  SELECT '1_raw_float32' AS format, CAST(256 AS BIGINT) AS bytes_per_vector,
       |         n_vectors * 256 AS total_bytes, CAST(1.0 AS DOUBLE) AS recall_at_k FROM nvec
       |  UNION ALL
       |  SELECT '2_sq8', 64, n_vectors * 64, r FROM nvec, rsq
       |  UNION ALL
       |  SELECT '3_pq', 4, n_vectors * 4, r FROM nvec, rpq
       |  UNION ALL
       |  SELECT '4_ivfpq', 4, n_vectors * 4, r FROM nvec, rivf)
       |ORDER BY format""".stripMargin

  /** Scalar-quantization (SQ8) top-k — the OTHER compressed-domain scale
    * path, complementing [[pqTopK]]: each dimension is independently
    * affine-coded to 8 bits against the corpus' per-dimension min/max
    * (64 bytes/vector = 4:1 over float32, much higher fidelity than
    * PQ's 4 bytes), and the query is scored asymmetrically against the
    * dequantized cell midpoints lo + (code+0.5)·(hi−lo)/255. This is
    * the faiss `SQ8` / Lucene int8-HNSW storage format, Spark-native.
    *
    * Determinism: per-dimension min/max are exact order-independent
    * aggregates; encode and ADC are index-ordered per-row folds with
    * the identical operation order on both engines (floor-of-affine,
    * then midpoint dequantize), so the distances are bit-equal.
    *
    * Scale shape: the stats pass is one posexplode + a 64-key
    * partially-aggregated shuffle; the one-row (los, his) table and the
    * query broadcast; encode + scoring are pure per-row expressions —
    * one corpus scan, ZERO shuffles before TakeOrderedAndProject. */
  def sq8TopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val statsRow = emb
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min(col("x").cast("double")).as("lo"), max(col("x").cast("double")).as("hi"))
      .agg(sort_array(collect_list(struct(col("pos"), col("lo"), col("hi")))).as("sl"))
      .select(
        expr("transform(sl, e -> e.lo)").as("los"),
        expr("transform(sl, e -> e.hi)").as("his"))
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    emb.where(col("vec_id") =!= 0)
      .crossJoin(broadcast(statsRow)).crossJoin(broadcast(q))
      .withColumn("codes", expr(
        """transform(sequence(1, 64), i ->
          |  CASE WHEN element_at(his, i) = element_at(los, i) THEN cast(0.0 as double)
          |  ELSE cast(floor((cast(element_at(embedding, i) as double) - element_at(los, i))
          |                  / (element_at(his, i) - element_at(los, i)) * 255.0D) as double)
          |  END)""".stripMargin))
      .withColumn("sq_dist", expr(
        """aggregate(sequence(1, 64), cast(0.0 as double), (acc, i) ->
          |  acc + (cast(element_at(qe, i) as double)
          |         - (element_at(los, i)
          |            + (element_at(codes, i) + 0.5D) * (element_at(his, i) - element_at(los, i)) / 255.0D))
          |      * (cast(element_at(qe, i) as double)
          |         - (element_at(los, i)
          |            + (element_at(codes, i) + 0.5D) * (element_at(his, i) - element_at(los, i)) / 255.0D)))""".stripMargin))
      .select(col("vec_id"), col("sq_dist"))
      .orderBy(col("sq_dist").asc, col("vec_id"))
      .limit(k)
  }

  /** Shared CTE chain ending in `sq(vec_id, sq_dist)` — the SQ8 encode +
    * asymmetric scoring, mirroring [[sq8TopK]] operation-for-operation. */
  private def sq8Cte: String =
    s"""WITH longf AS (
       |  SELECT unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |stats AS (
       |  SELECT pos, min(CAST(x AS DOUBLE)) AS lo, max(CAST(x AS DOUBLE)) AS hi
       |  FROM longf GROUP BY pos),
       |srow AS (SELECT list(lo ORDER BY pos) AS los, list(hi ORDER BY pos) AS his FROM stats),
       |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |enc AS (
       |  SELECT vec_id, qe, los, his,
       |    list_transform(range(1, 65), i ->
       |      CASE WHEN his[i] = los[i] THEN CAST(0.0 AS DOUBLE)
       |      ELSE floor((CAST(embedding[i] AS DOUBLE) - los[i]) / (his[i] - los[i]) * 255.0)
       |      END) AS codes
       |  FROM embeddings CROSS JOIN srow CROSS JOIN q WHERE vec_id <> 0),
       |sq AS (
       |  SELECT vec_id,
       |    list_reduce(list_transform(range(1, 65), i ->
       |      (CAST(qe[i] AS DOUBLE) - (los[i] + (codes[i] + 0.5) * (his[i] - los[i]) / 255.0)) *
       |      (CAST(qe[i] AS DOUBLE) - (los[i] + (codes[i] + 0.5) * (his[i] - los[i]) / 255.0))),
       |      (x, y) -> x + y) AS sq_dist
       |  FROM enc)""".stripMargin

  def sq8TopKSql(k: Int = 10): String =
    s"""$sq8Cte
       |SELECT vec_id, sq_dist FROM sq
       |ORDER BY sq_dist, vec_id LIMIT $k""".stripMargin

  /** SQ8 quality evaluation: recall@k of the 8-bit asymmetric search
    * against the exact L2 top-k — read alongside [[pqRecall]] to pick
    * the storage format: SQ8 pays 16× more space than PQ for (typically)
    * near-perfect recall. Both top-k sets are k rows; the compare is a
    * tagged union + one tiny aggregation. */
  def sq8Recall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val exact = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(k)
      .select(col("vec_id"), lit(1).as("e"), lit(0).as("p"))
    val sq = sq8TopK(spark, dir, k).select(col("vec_id"), lit(0).as("e"), lit(1).as("p"))
    exact.unionAll(sq)
      .groupBy("vec_id")
      .agg(max(col("e")).as("in_exact"), max(col("p")).as("in_sq"))
      .agg(
        sum(col("in_exact")).as("n_exact"),
        sum(col("in_sq")).as("n_sq"),
        count(when(col("in_exact") === 1 && col("in_sq") === 1, 1)).as("n_common"))
      .withColumn("recall_at_k",
        col("n_common").cast("double") / col("n_exact").cast("double"))
  }

  def sq8RecallSql(k: Int = 10): String =
    s"""WITH q2 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |exact AS (
       |  SELECT vec_id FROM embeddings CROSS JOIN q2
       |  WHERE vec_id <> 0
       |  ORDER BY ${l2Sql("embedding", "qe")} ASC, vec_id LIMIT $k),
       |sqk AS (SELECT vec_id FROM (${sq8TopKSql(k)}) sqt),
       |tagged AS (
       |  SELECT vec_id, 1 AS e, 0 AS p FROM exact
       |  UNION ALL SELECT vec_id, 0 AS e, 1 AS p FROM sqk),
       |flags AS (
       |  SELECT vec_id, max(e) AS in_exact, max(p) AS in_sq FROM tagged GROUP BY vec_id)
       |SELECT CAST(sum(in_exact) AS BIGINT) AS n_exact,
       |       CAST(sum(in_sq) AS BIGINT) AS n_sq,
       |       count(CASE WHEN in_exact = 1 AND in_sq = 1 THEN 1 END) AS n_common,
       |       CAST(count(CASE WHEN in_exact = 1 AND in_sq = 1 THEN 1 END) AS DOUBLE)
       |         / CAST(sum(in_exact) AS DOUBLE) AS recall_at_k
       |FROM flags""".stripMargin

  /** IVF cell occupancy — the index-health view next to [[ivfBuild]]'s
    * centroid table (and the ANN twin of dedup_band_occupancy): per cell
    * its population, share of the corpus, and load factor against the
    * uniform ideal (n·k/total; 1.0 = perfectly balanced). A skewed cell
    * breaks the pruning economics — probing it costs its load factor
    * times the uniform estimate — so this table is what decides when
    * [[kmeansRefine]] must run. All ratios are integer-count divisions
    * in float64, bit-identical on both engines.
    *
    * Scale shape: one scan, one tiny groupBy(label), then window totals
    * over the ≤ k-row aggregate (bounded input — the pre-aggregated
    * exception the window audit allows); |cells| output rows. */
  def ivfOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.load(spark, dir, "embeddings")
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n_vectors"))
      .withColumn("total", sum(col("n_vectors")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("label"), col("n_vectors"),
        (col("n_vectors").cast("double") / col("total").cast("double")).as("share"),
        (col("n_vectors").cast("double") * col("k").cast("double")
          / col("total").cast("double")).as("load_factor"))
      .orderBy("label")
  }

  val ivfOccupancySql: String =
    """WITH c AS (
      |  SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vectors
      |  FROM embeddings GROUP BY label)
      |SELECT label, n_vectors,
      |       CAST(n_vectors AS DOUBLE) / CAST(sum(n_vectors) OVER () AS DOUBLE) AS share,
      |       CAST(n_vectors AS DOUBLE) * CAST(count(*) OVER () AS DOUBLE)
      |         / CAST(sum(n_vectors) OVER () AS DOUBLE) AS load_factor
      |FROM c ORDER BY label""".stripMargin

  /** SQ8 quantizer BUILD surface — the persisted parameter table behind
    * [[sq8TopK]]'s inline stats (the [[ivfBuild]] pattern applied to the
    * scalar quantizer): per dimension, the corpus min/max, the derived
    * affine scale ((hi−lo)/255 — the value one 8-bit step represents),
    * and a degenerate flag for collapsed dimensions (hi = lo codes to a
    * constant; [[dimVariance]]'s dead dims surface here as wasted code
    * range). A 100 TB deployment persists THIS table once and encodes
    * every shard against it; search and build agreeing on these exact
    * doubles is what makes the codes portable. Float min/max are exact
    * (no summation), so both engines agree bit-for-bit.
    *
    * Scale shape: one |vecs|·d explode, one |dims|-key partial-agg
    * shuffle; |dims| output rows. */
  def sq8Build(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos").cast("long").as("dim"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x").cast("double")).as("lo"),
        max(col("x").cast("double")).as("hi"))
      .withColumn("scale", (col("hi") - col("lo")) / 255.0)
      .withColumn("degenerate", col("hi") === col("lo"))
      .orderBy("dim")

  val sq8BuildSql: String =
    """WITH longf AS (
      |  SELECT CAST(unnest(generate_series(0, len(embedding) - 1)) AS BIGINT) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings)
      |SELECT dim, count(*) AS n, min(x) AS lo, max(x) AS hi,
      |       (max(x) - min(x)) / 255.0 AS scale,
      |       max(x) = min(x) AS degenerate
      |FROM longf GROUP BY dim ORDER BY dim""".stripMargin

  /** Inter-centroid separation — the GEOMETRY leg of the index-health
    * triad ([[ivfBuild]] = the centroids, [[ivfOccupancy]] = their
    * populations, this = their spacing): per cell, the L2 distance to
    * its nearest other centroid and the mean distance to all others.
    * Cells whose centroids sit close together split their true neighbor
    * sets across the boundary, so probe-1 recall collapses exactly
    * there — low min_dist is the signal to either merge cells or raise
    * nprobe. Distances use the same 2^40 per-term quantization as the
    * build, so both engines agree bit-for-bit.
    *
    * Scale shape: ONE corpus scan. A centroid self-JOIN would build the
    * aggregate twice (the sides canonicalize differently once one is
    * broadcast, so the exchange is not reused) — instead the ≤ k-row
    * per-dimension centroid slice is collected into an array
    * (collect_list after the pos shuffle, bounded by k) and the k²
    * pairs exploded from it; per-(pair) distance sums stay 2^40
    * quantized. Production would read the persisted [[ivfBuild]]
    * artifact and join that instead. */
  def centroidSeparation(spark: SparkSession, dir: String): DataFrame = {
    val centroids = Tables.load(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(
        sum(floor(col("x").cast("double") * Q).cast("long").cast(DecimalType(38, 0))).as("snum"),
        count(lit(1)).as("n"))
      .select(col("label").cast("long").as("label"), col("pos"),
        (col("snum").cast("double") / Q / col("n")).as("c"))
    val pairs = centroids
      .groupBy("pos")
      .agg(collect_list(struct(col("label"), col("c"))).as("cs"))
      .select(col("pos"), explode(col("cs")).as("a"), col("cs"))
      .select(col("a.label").as("la"), col("a.c").as("ca"), explode(col("cs")).as("b"))
      .where(col("la") =!= col("b.label"))
      .select(col("la"), col("b.label").as("lb"),
        floor((col("ca") - col("b.c")) * (col("ca") - col("b.c")) * Q)
          .cast("long").cast(DecimalType(38, 0)).as("dq"))
      .groupBy("la", "lb")
      .agg(sqrt(sum(col("dq")).cast("double") / Q).as("dist"))
    pairs
      .groupBy(col("la").as("label"))
      .agg(
        GraftFunctions.minByCol(pairs, struct(col("dist"), col("lb")),
          struct(col("dist"), col("lb"))).as("m"),
        count(lit(1)).as("n_others"),
        // quantized-exact mean: a plain avg() sums doubles in partition
        // order — the one nondeterminism this file exists to avoid
        (sum(floor(col("dist") * Q).cast("long").cast(DecimalType(38, 0))).cast("double")
          / Q / count(lit(1))).as("mean_dist"))
      .select(col("label"),
        col("m.lb").as("nearest_label"),
        col("m.dist").as("min_dist"),
        col("mean_dist"), col("n_others"))
      .orderBy("label")
  }

  val centroidSeparationSql: String =
    s"""WITH longf AS (
       |  SELECT label, unnest(embedding) AS x,
       |         unnest(generate_series(1, len(embedding))) AS pos
       |  FROM embeddings),
       |centroids AS (
       |  SELECT CAST(label AS BIGINT) AS label, pos,
       |         CAST(sum(CAST(floor(CAST(x AS DOUBLE) * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0 / count(*) AS c
       |  FROM longf GROUP BY label, pos),
       |pairs AS (
       |  SELECT a.label AS la, b.label AS lb,
       |         sqrt(CAST(sum(CAST(floor((a.c - b.c) * (a.c - b.c) * 1099511627776.0) AS BIGINT)) AS DOUBLE) / 1099511627776.0) AS dist
       |  FROM centroids a JOIN centroids b USING (pos)
       |  WHERE a.label <> b.label
       |  GROUP BY a.label, b.label),
       |ranked AS (
       |  SELECT la, lb, dist,
       |         row_number() OVER (PARTITION BY la ORDER BY dist, lb) AS rn
       |  FROM pairs),
       |agg AS (
       |  SELECT la, min(dist) AS min_dist,
       |         CAST(sum(CAST(floor(dist * 1099511627776.0) AS BIGINT)) AS DOUBLE)
       |           / 1099511627776.0 / count(*) AS mean_dist,
       |         count(*) AS n_others
       |  FROM pairs GROUP BY la)
       |SELECT a.la AS label, r.lb AS nearest_label,
       |       a.min_dist, a.mean_dist, a.n_others
       |FROM agg a JOIN ranked r ON a.la = r.la AND r.rn = 1
       |ORDER BY label""".stripMargin

  /** Per-dimension quantile clip bounds — the embedding-normalization
    * prep table (feature clipping before SQ8/PQ quantization wants
    * p01/p99, not min/max, so one outlier can't stretch a dimension's
    * code range): exact interpolated p01/p50/p99 per dimension plus the
    * clip range. Spark `percentile` and DuckDB `quantile_cont` both
    * interpolate linearly at (n−1)·p over sorted float64 — bit-identical
    * (the [[graft.analytics.Relational.percentileCont]] precedent).
    *
    * Scale shape: one |vecs|·d explode, one shuffle keyed by dimension.
    * Exact percentiles need the full per-dim value set; at 100 TB the
    * approx_percentile sketch is the drop-in when exactness is
    * negotiable — same trade the relational percentile op documents. */
  def dimQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"), col("x").cast("double").as("x"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(x, 0.01)").as("p01"),
        expr("percentile(x, 0.5)").as("p50"),
        expr("percentile(x, 0.99)").as("p99"))
      .withColumn("clip_range", col("p99") - col("p01"))
      .orderBy("dim")

  val dimQuantilesSql: String =
    """WITH longf AS (
      |  SELECT CAST(unnest(generate_series(0, len(embedding) - 1)) AS BIGINT) AS dim,
      |         CAST(unnest(embedding) AS DOUBLE) AS x
      |  FROM embeddings)
      |SELECT dim, count(*) AS n,
      |       quantile_cont(x, 0.01) AS p01,
      |       quantile_cont(x, 0.5) AS p50,
      |       quantile_cont(x, 0.99) AS p99,
      |       quantile_cont(x, 0.99) - quantile_cont(x, 0.01) AS clip_range
      |FROM longf GROUP BY dim ORDER BY dim""".stripMargin

  /** Per-label embedding OUTLIERS by distance-to-centroid — the
    * cluster-relative hygiene screen that completes the embedding-QA
    * family (norm_stats catches broken exports globally; this catches
    * rows that do not belong to their own label: mislabeled vectors,
    * cross-domain leaks, the points SemDeDup-style pruning drops
    * first). Per label: the exact quantized centroid, each member's
    * squared L2 distance to it (index-ordered per-row fold), the
    * label's mean/σ of that distance from exact quantized sums, and
    * the count/share beyond mean + 2σ — every float either a
    * deterministic per-row fold or a ratio of exactly-summed
    * quantities, so both engines agree bit-for-bit.
    *
    * Scale shape: one |vecs|·d explode + ONE shuffle keyed by
    * (label, dim) for centroids (≤ |labels|·d rows, broadcast back),
    * distances per-row against the broadcast centroid, then two
    * |labels|-key aggregations with a broadcast join between them.
    * Never an all-pairs anything. */
  def outlierShare(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val long = emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("pos", "x")))
    def qSum(c: Column): Column =
      sum(floor(c * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q
    // NOTE (r15): tried windows-over-the-explode here to avoid planning
    // the fan-out twice — measured flat at sf0.1 and strictly WORSE at
    // scale: the (label, pos) window must shuffle+sort the entire
    // |vecs|·d exploded table, while this groupBy map-side-combines it
    // to ≤|labels|·d partials and broadcasts the tiny result back. The
    // duplicate-subtree cut only pays when the re-planned subtree costs
    // more than the extra shuffle it avoids.
    val centroids = long.groupBy("label", "pos")
      .agg((qSum(col("x").cast("double")) / count(lit(1))).as("c"))
    val dist = long
      .join(broadcast(centroids), Seq("label", "pos"))
      .withColumn("dq",
        floor((col("x").cast("double") - col("c")) * (col("x").cast("double") - col("c")) * Q)
          .cast("long").cast(DecimalType(38, 0)))
      .groupBy("vec_id", "label")
      .agg((sum(col("dq")).cast("double") / Q).as("d2"))
    val stats = dist.groupBy("label")
      .agg(
        count(lit(1)).as("n_vecs"),
        (qSum(col("d2")) / count(lit(1))).as("mean_d2"),
        (qSum(col("d2") * col("d2")) / count(lit(1))).as("mean_d4"))
      // clamp: the quantized sums pass through float division, so a
      // degenerate label (all d2 identical) can yield a tiny negative
      // variance — Spark's sqrt would return NaN while DuckDB raises,
      // so both engines clamp at zero before the sqrt
      .withColumn("std_d2",
        sqrt(greatest(col("mean_d4") - col("mean_d2") * col("mean_d2"), lit(0.0))))
    dist.join(broadcast(stats), "label")
      .groupBy(col("label").cast("long").as("label"))
      .agg(
        max(col("n_vecs")).as("n_vecs"),
        max(col("mean_d2")).as("mean_d2"),
        max(col("std_d2")).as("std_d2"),
        sum(when(col("d2") > col("mean_d2") + lit(2.0) * col("std_d2"), 1L).otherwise(0L))
          .as("n_outliers"))
      .withColumn("outlier_share",
        col("n_outliers").cast("double") / col("n_vecs").cast("double"))
      .orderBy("label")
  }

  val outlierShareSql: String = {
    val Qs = "1099511627776.0"
    s"""WITH longf AS (
       |  SELECT vec_id, label,
       |         unnest(generate_series(1, len(embedding))) AS pos,
       |         CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |centroids AS (
       |  SELECT label, pos,
       |         CAST(sum(CAST(floor(x * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs / count(*) AS c
       |  FROM longf GROUP BY label, pos),
       |dist AS (
       |  SELECT vec_id, l.label,
       |         CAST(sum(CAST(floor((x - c) * (x - c) * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs AS d2
       |  FROM longf l JOIN centroids ct ON l.label = ct.label AND l.pos = ct.pos
       |  GROUP BY vec_id, l.label),
       |stats AS (
       |  SELECT label, count(*) AS n_vecs,
       |         CAST(sum(CAST(floor(d2 * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs / count(*) AS mean_d2,
       |         CAST(sum(CAST(floor(d2 * d2 * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs / count(*) AS mean_d4
       |  FROM dist GROUP BY label)
       |SELECT CAST(s.label AS BIGINT) AS label, s.n_vecs, s.mean_d2,
       |       sqrt(greatest(s.mean_d4 - s.mean_d2 * s.mean_d2, 0.0)) AS std_d2,
       |       CAST(sum(CASE WHEN d.d2 > s.mean_d2 + 2.0 * sqrt(greatest(s.mean_d4 - s.mean_d2 * s.mean_d2, 0.0))
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       |       CAST(sum(CASE WHEN d.d2 > s.mean_d2 + 2.0 * sqrt(greatest(s.mean_d4 - s.mean_d2 * s.mean_d2, 0.0))
       |                     THEN 1 ELSE 0 END) AS DOUBLE) / CAST(s.n_vecs AS DOUBLE) AS outlier_share
       |FROM dist d JOIN stats s ON d.label = s.label
       |GROUP BY s.label, s.n_vecs, s.mean_d2, s.mean_d4
       |ORDER BY label""".stripMargin
  }

  /** Per-bucket seed fan-out cap for the NN-Descent sign-LSH seed join.
    * Without it the bucket self-join is bucket-bounded only for
    * well-spread sign codes: an anisotropic embedding export where most
    * vectors share one code would degenerate the seed to near all-pairs
    * — the exact blowup the op family exists to avoid. Every node still
    * joins to the bucket's FIRST [[SeedCap]] members (deterministic by
    * vec_id, so the oracle is exact); nodes beyond the cap keep their
    * outbound seed edges plus the ring edges, and the expansion rounds
    * recover the rest transitively. */
  private val SeedCap = 32

  /** Sign-LSH bucket seed edges, fan-out-capped at [[SeedCap]] peers per
    * bucket (see there). `coded` must carry vec_id + bucket. */
  private def seedEdges(coded: DataFrame): DataFrame = {
    val peers = coded.select(col("vec_id").as("nbr"), col("bucket"))
      .withColumn("rnb", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("nbr")))
      .where(col("rnb") <= SeedCap).drop("rnb")
    coded.select(col("vec_id"), col("bucket"))
      .join(peers, "bucket")
      .where(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("nbr"))
  }

  /** SQL twin of [[seedEdges]] as a CTE body over `coded`. */
  private def seedEdgesSql: String =
    s"""SELECT a.vec_id, p.nbr
       |  FROM coded a JOIN (
       |    SELECT nbr, bucket FROM (
       |      SELECT vec_id AS nbr, bucket,
       |             row_number() OVER (PARTITION BY bucket ORDER BY vec_id) AS rnb
       |      FROM coded)
       |    WHERE rnb <= $SeedCap) p
       |  ON a.bucket = p.bucket AND a.vec_id <> p.nbr""".stripMargin

  /** One NN-DESCENT refinement round over the all-nodes k-NN graph
    * (Dong et al., WWW 2011 — the graph-ANN construction HNSW-class
    * indexes descend from, in its MapReduce form): the initial graph is
    * each node's top-k within its sign-LSH bucket (the cheap seed), and
    * the round exploits the paper's observation that "a neighbor of a
    * neighbor is likely a neighbor" — candidates are the node's current
    * neighbors plus its neighbors' neighbors, exact-rescored, and the
    * per-node report shows what the round bought: candidate volume,
    * best cosine before/after, and the improved flag. Iterating this
    * round to fixed point IS the index build; one round exposes the
    * whole machinery and keeps the oracle exact.
    *
    * Scale shape: the seed join is bucket-bounded (never all-pairs);
    * the expansion is two self-equi-joins of the k·|V|-row edge list on
    * node ids (candidates ≤ k² per node by construction); rescoring is
    * two hash joins against the vector table; per-node top state via a
    * window partitioned on vec_id. All shuffles are on node ids —
    * uniform by construction. */
  def nnDescentRound(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // the vector table is joined against every edge/candidate set below
    // (score + rescore legs) — pin it once instead of re-scanning per join
    val emb = pin(Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding")))
    val coded = emb.withColumn("bucket", signCode(col("embedding")))
    // seed edges, two kinds — both are essential: sign-LSH bucket peers
    // give LOCALLY good neighbors, and deterministic "ring" partners
    // ((v + j·97) mod |V|, the reproducible stand-in for the paper's
    // random initialization) give CROSS-BUCKET reach. A bucket-only seed
    // would trap the whole expansion inside one bucket (a neighbor of a
    // bucket peer is another bucket peer) and the round could never
    // improve anything.
    val nv = emb.agg(count(lit(1)).as("nv"))
    val bucketEdges = seedEdges(coded)
    val ringEdges = emb.select(col("vec_id"))
      .crossJoin(broadcast(nv))
      .select(col("vec_id"), explode(array(lit(1), lit(2))).as("j"), col("nv"))
      .select(col("vec_id"), ((col("vec_id") + col("j") * 97L) % col("nv")).as("nbr"))
      .where(col("vec_id") =!= col("nbr"))
    val p0 = bucketEdges.union(ringEdges).distinct()
      .join(emb, "vec_id")
      .join(emb.select(col("vec_id").as("nbr"), col("embedding").as("ne")), "nbr")
      .select(col("vec_id"), col("nbr"), cosine(spark, "embedding", "ne").as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cos").desc, col("nbr"))
    // pin (r19, guide §2.4): g0 is referenced FOUR times below (both
    // sides of the nn2 self-join, the cands union and the b0 stats), and
    // without truncation each reference re-derives the whole seed
    // scoring + top-k window subtree — the same repeated-subtree shape
    // nnDescentConverge already pins per round. Interleaved A/B at
    // sf0.1: 1.20 → 0.93 s median. Consumers aggregate/window on
    // explicit keys, so checkpoint row order cannot change a bit.
    val g0 = pin(p0.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn"))
    val nn2 = g0.select(col("vec_id"), col("nbr").as("mid"))
      .join(g0.select(col("vec_id").as("mid"), col("nbr").as("cand")), "mid")
      .where(col("cand") =!= col("vec_id"))
      .select(col("vec_id"), col("cand"))
    val cands = g0.select(col("vec_id"), col("nbr").as("cand"))
      .union(nn2).distinct()
    val scored = cands
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .join(emb.select(col("vec_id").as("cand"), col("embedding").as("ce")), "cand")
      .select(col("vec_id"), col("cand"), cosine(spark, "embedding", "ce").as("cos"))
    val b0 = g0.groupBy("vec_id")
      .agg(count(lit(1)).as("n_init"), max(col("cos")).as("best_cos_0"))
    val b1 = scored.groupBy("vec_id")
      .agg(count(lit(1)).as("n_cand"), max(col("cos")).as("best_cos_1"))
    b0.join(b1, "vec_id")
      .select(col("vec_id"), col("n_init"), col("n_cand"),
        col("best_cos_0"), col("best_cos_1"),
        when(col("best_cos_1") > col("best_cos_0"), 1L).otherwise(0L).as("improved"))
      .orderBy("vec_id")
  }

  def nnDescentRoundSql(k: Int = 5): String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |n AS (SELECT count(*) AS nv FROM embeddings),
       |edges AS (
       |  $seedEdgesSql
       |  UNION
       |  SELECT e.vec_id, (e.vec_id + j * 97) % n.nv AS nbr
       |  FROM embeddings e CROSS JOIN n CROSS JOIN (SELECT unnest([1, 2]) AS j)
       |  WHERE e.vec_id <> (e.vec_id + j * 97) % n.nv),
       |p0 AS (
       |  SELECT c.vec_id, c.nbr,
       |         ${cosineSql("x.embedding", "y.embedding")} AS cos
       |  FROM edges c JOIN coded x ON c.vec_id = x.vec_id
       |                JOIN coded y ON c.nbr = y.vec_id),
       |g0 AS (
       |  SELECT vec_id, nbr, cos FROM (
       |    SELECT vec_id, nbr, cos,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nbr) AS rn
       |    FROM p0)
       |  WHERE rn <= $k),
       |nn2 AS (
       |  SELECT e1.vec_id, e2.nbr AS cand
       |  FROM g0 e1 JOIN g0 e2 ON e1.nbr = e2.vec_id
       |  WHERE e2.nbr <> e1.vec_id),
       |cands AS (
       |  SELECT vec_id, nbr AS cand FROM g0
       |  UNION
       |  SELECT vec_id, cand FROM nn2),
       |scored AS (
       |  SELECT c.vec_id, c.cand,
       |         ${cosineSql("x.embedding", "y.embedding")} AS cos
       |  FROM cands c JOIN coded x ON c.vec_id = x.vec_id
       |                JOIN coded y ON c.cand = y.vec_id),
       |b0 AS (SELECT vec_id, count(*) AS n_init, max(cos) AS best_cos_0 FROM g0 GROUP BY vec_id),
       |b1 AS (SELECT vec_id, count(*) AS n_cand, max(cos) AS best_cos_1 FROM scored GROUP BY vec_id)
       |SELECT vec_id, n_init, n_cand, best_cos_0, best_cos_1,
       |       CAST(CASE WHEN best_cos_1 > best_cos_0 THEN 1 ELSE 0 END AS BIGINT) AS improved
       |FROM b0 JOIN b1 USING (vec_id) ORDER BY vec_id""".stripMargin

  /** The NN-DESCENT loop ITERATED — the index-build trajectory between
    * [[nnDescentRound]]'s single step and a finished k-NN graph (the
    * Dong et al. construction converges in a handful of rounds; the
    * per-round row here is the convergence telemetry an index build
    * publishes). Two expansion rounds unrolled over the same seed graph
    * (fixed unroll keeps the oracle exact, as in kmeans_converge), each
    * round reporting: graph size, the quantized-exact mean best cosine
    * (floor(c·2⁴⁰) summed exactly — partition-order independent), nodes
    * whose best neighbor improved, edges replaced since the previous
    * round, and the converged flag (no edge changed).
    *
    * Scale shape: per round ONE ≤(k+k²)·|V|-row candidate expansion via
    * two edge-list self-equi-joins, two hash joins to rescore, and a
    * vec_id-partitioned top-k window. No all-pairs anywhere — recall
    * telemetry against brute force lives in ann_recall_eval, which is
    * why this op can stay linear. */
  def nnDescentConverge(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    // pin the vector table once (it is joined 2× per round) and each
    // round's top-k graph (referenced by the next round's expansion AND
    // two rounds of stats) — see the lineage note in [[kmeansConverge]];
    // without this the 3-round static plan held 632 parquet scans
    val emb = pin(Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding")))
    val coded = emb.withColumn("bucket", signCode(col("embedding")))
    val nv = emb.agg(count(lit(1)).as("nv"))
    val bucketEdges = seedEdges(coded)
    val ringEdges = emb.select(col("vec_id"))
      .crossJoin(broadcast(nv))
      .select(col("vec_id"), explode(array(lit(1), lit(2))).as("j"), col("nv"))
      .select(col("vec_id"), ((col("vec_id") + col("j") * 97L) % col("nv")).as("nbr"))
      .where(col("vec_id") =!= col("nbr"))
    def score(edges: DataFrame): DataFrame = edges
      .join(emb, "vec_id")
      .join(emb.select(col("vec_id").as("nbr"), col("embedding").as("ne")), "nbr")
      .select(col("vec_id"), col("nbr"), cosine(spark, "embedding", "ne").as("cos"))
    def topK(scored: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("cos").desc, col("nbr"))
      scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
    }
    def expand(g: DataFrame): DataFrame =
      g.select(col("vec_id"), col("nbr"))
        .union(
          g.select(col("vec_id"), col("nbr").as("mid"))
            .join(g.select(col("vec_id").as("mid"), col("nbr").as("cand")), "mid")
            .where(col("cand") =!= col("vec_id"))
            .select(col("vec_id"), col("cand").as("nbr")))
        .distinct()
    val g0 = pin(topK(score(bucketEdges.union(ringEdges).distinct())))
    val g1 = pin(topK(score(expand(g0))))
    val g2 = pin(topK(score(expand(g1))))
    def best(g: DataFrame): DataFrame =
      g.groupBy("vec_id").agg(max(col("cos")).as("best"))
    def roundStats(round: Int, g: DataFrame, prev: Option[DataFrame]): DataFrame = {
      val base = g.agg(
        countDistinct(col("vec_id")).as("n_nodes"),
        count(lit(1)).as("n_edges"),
        (sum(floor(col("cos") * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q
          / count(lit(1))).as("mean_cos"))
      val (nImproved, nNew) = prev match {
        case None =>
          (g.agg(lit(0L).as("n_improved")),
            g.agg(count(lit(1)).as("n_new_edges")))
        case Some(p) =>
          (best(g).join(best(p).select(col("vec_id"), col("best").as("pb")), "vec_id")
            .agg(count(when(col("best") > col("pb"), 1)).as("n_improved")),
            g.join(p.select(col("vec_id"), col("nbr")), Seq("vec_id", "nbr"), "left_anti")
              .agg(count(lit(1)).as("n_new_edges")))
      }
      // round 0 (the seed) is definitionally not converged — hard-coded
      // on BOTH sides so an empty embeddings table (n_new_edges = 0)
      // still agrees with the oracle, which pins round-0 converged to 0
      val converged =
        if (prev.isEmpty) lit(0L)
        else (col("n_new_edges") === 0L).cast("long")
      base.crossJoin(broadcast(nImproved)).crossJoin(broadcast(nNew))
        .select(lit(round.toLong).as("round"), col("n_nodes"), col("n_edges"),
          col("mean_cos"), col("n_improved"), col("n_new_edges"),
          converged.as("converged"))
    }
    roundStats(0, g0, None)
      .unionAll(roundStats(1, g1, Some(g0)))
      .unionAll(roundStats(2, g2, Some(g1)))
      .orderBy("round")
  }

  def nnDescentConvergeSql(k: Int = 5): String = {
    val Qs = "1099511627776.0"
    def expandCte(prev: String, cand: String): String =
      s"""$cand AS (
         |  SELECT vec_id, nbr FROM $prev
         |  UNION
         |  SELECT e1.vec_id, e2.nbr
         |  FROM $prev e1 JOIN $prev e2 ON e1.nbr = e2.vec_id
         |  WHERE e2.nbr <> e1.vec_id)""".stripMargin
    def scoreTopCte(cand: String, g: String): String =
      s"""$g AS (
         |  SELECT vec_id, nbr, cos FROM (
         |    SELECT c.vec_id, c.nbr,
         |           ${cosineSql("x.embedding", "y.embedding")} AS cos,
         |           row_number() OVER (PARTITION BY c.vec_id
         |                              ORDER BY ${cosineSql("x.embedding", "y.embedding")} DESC, c.nbr) AS rn
         |    FROM $cand c JOIN coded x ON c.vec_id = x.vec_id
         |                  JOIN coded y ON c.nbr = y.vec_id)
         |  WHERE rn <= $k)""".stripMargin
    def statCte(round: Int, g: String, prev: Option[String]): String = prev match {
      case None =>
        s"""SELECT $round AS round,
           |       count(DISTINCT vec_id) AS n_nodes, count(*) AS n_edges,
           |       CAST(sum(CAST(floor(cos * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs / count(*) AS mean_cos,
           |       CAST(0 AS BIGINT) AS n_improved,
           |       count(*) AS n_new_edges,
           |       CAST(0 AS BIGINT) AS converged
           |FROM $g""".stripMargin
      case Some(p) =>
        s"""SELECT $round AS round,
           |       (SELECT count(DISTINCT vec_id) FROM $g) AS n_nodes,
           |       (SELECT count(*) FROM $g) AS n_edges,
           |       (SELECT CAST(sum(CAST(floor(cos * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs / count(*) FROM $g) AS mean_cos,
           |       (SELECT count(*) FROM
           |          (SELECT vec_id, max(cos) AS b FROM $g GROUP BY vec_id) cg
           |          JOIN (SELECT vec_id, max(cos) AS pb FROM $p GROUP BY vec_id) pg USING (vec_id)
           |        WHERE cg.b > pg.pb) AS n_improved,
           |       (SELECT count(*) FROM $g
           |        WHERE NOT EXISTS (SELECT 1 FROM $p
           |                          WHERE $p.vec_id = $g.vec_id AND $p.nbr = $g.nbr)) AS n_new_edges,
           |       CAST(CASE WHEN (SELECT count(*) FROM $g
           |                       WHERE NOT EXISTS (SELECT 1 FROM $p
           |                                         WHERE $p.vec_id = $g.vec_id AND $p.nbr = $g.nbr)) = 0
           |                 THEN 1 ELSE 0 END AS BIGINT) AS converged""".stripMargin
    }
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |n AS (SELECT count(*) AS nv FROM embeddings),
       |seed AS (
       |  $seedEdgesSql
       |  UNION
       |  SELECT e.vec_id, (e.vec_id + j * 97) % n.nv AS nbr
       |  FROM embeddings e CROSS JOIN n CROSS JOIN (SELECT unnest([1, 2]) AS j)
       |  WHERE e.vec_id <> (e.vec_id + j * 97) % n.nv),
       |${scoreTopCte("seed", "g0")},
       |${expandCte("g0", "cand1")},
       |${scoreTopCte("cand1", "g1")},
       |${expandCte("g1", "cand2")},
       |${scoreTopCte("cand2", "g2")}
       |${statCte(0, "g0", None)}
       |UNION ALL
       |${statCte(1, "g1", Some("g0"))}
       |UNION ALL
       |${statCte(2, "g2", Some("g1"))}
       |ORDER BY round""".stripMargin
  }

  /** Top principal direction of the embedding table by POWER ITERATION —
    * the spectral-health probe (anisotropy check, whitening input,
    * rogue-dimension detector) run before cosine retrieval is trusted:
    * embedding exports whose mass collapses onto one direction (the
    * classic "rogue dimension" failure) show a dominant λ here long
    * before recall gates degrade. Two unrolled iterations of
    * v ← Xᵀ(Xv)/‖Xᵀ(Xv)‖ on the UNCENTERED second-moment matrix,
    * seeded with the deterministic first basis vector; outputs one row
    * per dimension with the final loading and both per-round Rayleigh
    * estimates (their ratio is the usual convergence telltale).
    *
    * Determinism: per-vector projections are index-ordered folds
    * (bit-stable doubles); every cross-ROW sum quantizes addends to
    * floor(x·2⁴⁰) and sums exactly as DECIMAL(38,0)/HUGEINT — the
    * kmeans_refine pattern — so loadings are bit-identical on any
    * engine and partitioning. Fixed unroll keeps the oracle exact.
    *
    * Scale shape: each round is one |vecs|·d explode + ONE shuffle keyed
    * by dimension (d keys, map-side combined); the d-row spectral state
    * collapses to a single broadcast row between rounds. At 100 TB this
    * is the textbook distributed power method — no Gram matrix is ever
    * materialized. */
  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    // spread: both rounds pipeline a |vecs|·d explode into the scan stage
    // (measured 1.7 → 0.75 s on the single-row-group test file; no-op at
    // production split counts)
    val emb = Tables.spread(
      Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding")))
    def qSum(c: Column): Column =
      sum(floor(c * Q).cast("long").cast(DecimalType(38, 0))).cast("double") / Q
    // round 1: v0 = e1, so the projection is just the first component
    val r1 = emb
      .select(element_at(col("embedding"), 1).cast("double").as("s"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(qSum(col("x").cast("double") * col("s")).as("c"))
    val v1 = r1
      .agg(sort_array(collect_list(struct(col("j"), col("c")))).as("a"))
      .select(transform(col("a"), e => e.getField("c")).as("ca"))
      .select(col("ca"), sqrt(dotFold(col("ca"), col("ca"))).as("lambda1"))
      .select(transform(col("ca"), x => x / col("lambda1")).as("v1"), col("lambda1"))
    // round 2: project on v1 (index-ordered fold), re-aggregate per dim
    val r2 = emb.crossJoin(broadcast(v1))
      .select(col("lambda1"), dotFold(col("embedding"), col("v1")).as("s"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(max(col("lambda1")).as("lambda1"), qSum(col("x").cast("double") * col("s")).as("c"))
    r2
      .agg(max(col("lambda1")).as("lambda1"),
        sort_array(collect_list(struct(col("j"), col("c")))).as("a"))
      .select(col("lambda1"), transform(col("a"), e => e.getField("c")).as("ca"))
      .select(col("lambda1"), col("ca"), sqrt(dotFold(col("ca"), col("ca"))).as("lambda2"))
      .select(posexplode(transform(col("ca"), x => x / col("lambda2"))).as(Seq("j", "loading")),
        col("lambda1"), col("lambda2"))
      .select((col("j") + 1).cast("long").as("dim"), col("loading"),
        col("lambda1"), col("lambda2"))
      .orderBy("dim")
  }

  val pcaPowerSql: String = {
    val Qs = "1099511627776.0"
    s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |l1 AS (
       |  SELECT CAST(embedding[1] AS DOUBLE) AS s,
       |         unnest(generate_series(1, len(embedding))) AS j,
       |         CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM e),
       |r1 AS (
       |  SELECT j, CAST(sum(CAST(floor(x * s * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs AS c
       |  FROM l1 GROUP BY j),
       |a1 AS (SELECT list(c ORDER BY j) AS ca FROM r1),
       |n1 AS (
       |  SELECT ca, sqrt(list_reduce(list_transform(ca, x -> x * x), (a, b) -> a + b)) AS lambda1
       |  FROM a1),
       |vv AS (SELECT list_transform(ca, x -> x / lambda1) AS v1, lambda1 FROM n1),
       |l2 AS (
       |  SELECT lambda1,
       |         list_reduce(list_transform(generate_series(1, len(embedding)),
       |                                    i -> CAST(embedding[i] AS DOUBLE) * v1[i]),
       |                     (a, b) -> a + b) AS s,
       |         unnest(generate_series(1, len(embedding))) AS j,
       |         CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM e CROSS JOIN vv),
       |r2 AS (
       |  SELECT j, max(lambda1) AS lambda1,
       |         CAST(sum(CAST(floor(x * s * $Qs) AS HUGEINT)) AS DOUBLE) / $Qs AS c
       |  FROM l2 GROUP BY j),
       |a2 AS (SELECT max(lambda1) AS lambda1, list(c ORDER BY j) AS ca FROM r2),
       |n2 AS (
       |  SELECT lambda1, ca,
       |         sqrt(list_reduce(list_transform(ca, x -> x * x), (a, b) -> a + b)) AS lambda2
       |  FROM a2),
       |fin AS (
       |  SELECT unnest(generate_series(1, len(ca))) AS j,
       |         unnest(list_transform(ca, x -> x / lambda2)) AS loading,
       |         lambda1, lambda2
       |  FROM n2)
       |SELECT CAST(j AS BIGINT) AS dim, loading, lambda1, lambda2
       |FROM fin ORDER BY dim""".stripMargin
  }

  /** Recall@k CURVE — [[recallEval]] unrolled over every k ≤ 10 in one
    * query: how fast single-probe LSH recall decays as the result page
    * deepens (recall@1 is usually fine — the nearest neighbor shares the
    * query's sign bucket — while recall@10 pays for every cross-bucket
    * neighbor). The curve, not the point, is what picks k for a
    * multiprobe fallback.
    *
    * Scale shape: both top-k sides are bounded takes (brute force one
    * scan → TakeOrdered; LSH bucket-pruned); everything after operates
    * on two ≤k-row tables — the rank windows and the k-fan-out are over
    * bounded inputs by construction. */
  def recallCurve(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("vec_id"))
    val brute = bruteForceTopK(spark, dir, k)
      .withColumn("er", row_number().over(w).cast("long")).select("vec_id", "er")
    val lsh = lshTopK(spark, dir, k)
      .withColumn("lr", row_number().over(w).cast("long")).select("vec_id", "lr")
    val joined = brute.join(lsh, Seq("vec_id"), "full_outer")
    joined
      // k fan-out as a per-row explode over the ≤2k-row joined table —
      // no join, so nothing for the BNLJ audit to even inspect
      .select(col("er"), col("lr"),
        explode(sequence(lit(1L), lit(k.toLong))).as("k"))
      .groupBy("k")
      .agg(count(when(col("er") <= col("k") && col("lr") <= col("k"), 1)).as("n_hits"))
      .select(col("k"), col("n_hits"),
        (col("n_hits").cast("double") / col("k").cast("double")).as("recall_at_k"))
      .orderBy("k")
  }

  def recallCurveSql(k: Int = 10): String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |q AS (SELECT embedding AS qe, bucket AS qbucket FROM coded WHERE vec_id = 0),
       |brute AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS er
       |  FROM (
       |    SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |    FROM coded CROSS JOIN q WHERE vec_id <> 0
       |    ORDER BY cosine DESC, vec_id LIMIT $k)),
       |lsh AS (
       |  SELECT vec_id, row_number() OVER (ORDER BY cosine DESC, vec_id) AS lr
       |  FROM (
       |    SELECT vec_id, ${cosineSql("embedding", "qe")} AS cosine
       |    FROM coded JOIN q ON bucket = qbucket WHERE vec_id <> 0
       |    ORDER BY cosine DESC, vec_id LIMIT $k)),
       |j AS (SELECT coalesce(b.vec_id, l.vec_id) AS vec_id, b.er, l.lr
       |      FROM brute b FULL OUTER JOIN lsh l ON b.vec_id = l.vec_id)
       |SELECT k, count(CASE WHEN er <= k AND lr <= k THEN 1 END) AS n_hits,
       |       CAST(count(CASE WHEN er <= k AND lr <= k THEN 1 END) AS DOUBLE)
       |         / CAST(k AS DOUBLE) AS recall_at_k
       |FROM j CROSS JOIN (SELECT unnest(generate_series(1, $k)) AS k)
       |GROUP BY k ORDER BY k""".stripMargin

  /** Sign-LSH bucket occupancy — the flood gauge for the LSH probe path,
    * mirroring [[ivfOccupancy]] for the hyperplane index: per 8-bit sign
    * bucket, the vector count, corpus share, and load factor (share ×
    * bucket count — 1.0 = perfectly balanced), plus the expected
    * candidate volume a single-probe query pays (the occupancy of ITS
    * bucket, in expectation Σ n_b²/N — reported per bucket as n²/N so
    * the tail is visible, not averaged away). Anisotropic exports show
    * up here as a handful of buckets holding most of the corpus — the
    * exact condition the NN-Descent seed cap guards against.
    *
    * Scale shape: one per-row code expression into a ≤256-key map-side
    * combined aggregation; the total attaches via a tiny window over the
    * pre-aggregated bucket rows. */
  def lshOccupancy(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    Tables.load(spark, dir, "embeddings")
      .select(signCode(col("embedding")).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_vectors"))
      .withColumn("total", sum(col("n_vectors")).over(w))
      .withColumn("k", count(lit(1)).over(w))
      .select(col("bucket"), col("n_vectors"),
        (col("n_vectors").cast("double") / col("total").cast("double")).as("share"),
        (col("n_vectors").cast("double") * col("k").cast("double")
          / col("total").cast("double")).as("load_factor"),
        (col("n_vectors").cast("double") * col("n_vectors").cast("double")
          / col("total").cast("double")).as("expected_probe_cost"))
      .orderBy("bucket")
  }

  val lshOccupancySql: String =
    s"""WITH coded AS (
       |  SELECT ${signCodeSql("embedding")} AS bucket FROM embeddings),
       |b AS (SELECT bucket, count(*) AS n_vectors FROM coded GROUP BY bucket)
       |SELECT bucket, n_vectors,
       |       CAST(n_vectors AS DOUBLE) / CAST(sum(n_vectors) OVER () AS DOUBLE) AS share,
       |       CAST(n_vectors AS DOUBLE) * CAST(count(*) OVER () AS DOUBLE)
       |         / CAST(sum(n_vectors) OVER () AS DOUBLE) AS load_factor,
       |       CAST(n_vectors AS DOUBLE) * CAST(n_vectors AS DOUBLE)
       |         / CAST(sum(n_vectors) OVER () AS DOUBLE) AS expected_probe_cost
       |FROM b ORDER BY bucket""".stripMargin

  /** Exact-duplicate vector scan — embedding-export hygiene: byte-equal
    * vectors (grouped on the raw float array, no hashing, no tolerance)
    * indicate collapsed embeddings (an encoder emitting a constant for
    * empty inputs) or upstream doc duplication that survived text dedup.
    * One summary row: corpus size, distinct vectors, duplicated-group
    * count, the largest clone family, and how many vectors are clones
    * (member of a group of ≥2).
    *
    * Scale shape: one groupBy on the array key (hash-partitioned on the
    * vector bytes — uniform by construction), then a single-row rollup
    * of the ≤|distinct| group table. */
  def exactDupVectors(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .groupBy(col("embedding"))
      .agg(count(lit(1)).as("n"))
      .agg(
        sum(col("n")).as("n_vectors"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n") > 1L, 1L).otherwise(0L)).as("n_dup_groups"),
        max(col("n")).as("max_group"),
        sum(when(col("n") > 1L, col("n")).otherwise(0L)).as("n_clone_vectors"))
      .select(
        col("n_vectors").cast("long").as("n_vectors"),
        col("n_distinct"), col("n_dup_groups"), col("max_group"),
        col("n_clone_vectors"),
        (col("n_clone_vectors").cast("double") / col("n_vectors").cast("double"))
          .as("clone_share"))

  val exactDupVectorsSql: String =
    """WITH g AS (
      |  SELECT embedding, count(*) AS n FROM embeddings GROUP BY embedding)
      |SELECT CAST(sum(n) AS BIGINT) AS n_vectors,
      |       count(*) AS n_distinct,
      |       CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |       CAST(max(n) AS BIGINT) AS max_group,
      |       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS n_clone_vectors,
      |       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
      |         / CAST(sum(n) AS DOUBLE) AS clone_share
      |FROM g""".stripMargin

  /** IVF nlist elbow — total inertia (sum of squared distance to the
    * nearest seed centroid) and cell balance at nlist ∈ {4, 8, 16, 32},
    * in ONE pass: the tuning curve that picks the partition count
    * [[ivfBuild]] then persists, read next to [[ivfOccupancy]] (health
    * of the chosen nlist) and the recall gates (quality at the chosen
    * probe budget). Seeds are the deterministic lowest-vec_id prefix
    * per k, so both engines score the identical configuration.
    *
    * Scale shape: the assignment join is Lloyd's inherent |data|·Σk·d
    * work — a pos-equi-join against a broadcast ≤(Σk)·d-row seed table,
    * then per-(k, vec, cand) map-side-combined quantized sums. The
    * argmin is hash-aggregable end-to-end: distances are exact
    * non-negative 2⁴⁰-quantized decimals, so `min(d2q·64 + cand)`
    * (ties to the lower seed, the kmeans_refine convention) replaces a
    * struct-min that would sort-aggregate, and the winning distance is
    * the plain `min(d2q)` of the same group. Rollups are ≤Σk keys. */
  def nlistElbow(spark: SparkSession, dir: String): DataFrame =
    // spreadBy (r19, guide §2.5 single-split input): the |data|·Σk·d
    // distance arithmetic below pipelines into the scan stage, and the
    // single-row-group test file scans as ONE task; hash-redistributing
    // the narrow (vec_id, embedding) rows by vec_id parallelizes it AND
    // lets the (kk, vec_id, cand) / (kk, vec_id) aggregations reuse the
    // partitioning (subset rule) instead of exchanging the fan-out.
    // No-op at production split counts; result identical (the quantized
    // sums are order-independent).
    nlistElbowOf(spark,
      Tables.spreadBy(Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")), col("vec_id")))

  def nlistElbowOf(spark: SparkSession, embSrc: DataFrame): DataFrame = {
    val ks = Seq(4, 8, 16, 32)
    val emb = embSrc.select(col("vec_id"), col("embedding"))
    val seeds = emb.where(col("vec_id") < ks.max)
      .select(col("vec_id").as("cand"), posexplode(col("embedding")).as(Seq("pos", "c")))
      .withColumn("kk", explode(array(ks.map(lit(_)): _*)))
      .where(col("cand") < col("kk"))
    val long = emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
    val d2 = long
      .join(broadcast(seeds), "pos")
      .withColumn("dq",
        floor((col("x").cast("double") - col("c").cast("double"))
          * (col("x").cast("double") - col("c").cast("double")) * Q)
          .cast("long").cast(DecimalType(38, 0)))
      .groupBy("kk", "vec_id", "cand")
      .agg(sum(col("dq")).as("d2q"))
    val assigned = d2
      .groupBy("kk", "vec_id")
      .agg(
        min(col("d2q") * 64 + col("cand")).as("mq"),
        min(col("d2q")).as("dmin"))
      .select(col("kk"), col("vec_id"),
        pmod(col("mq"), lit(64)).cast("long").as("cell"), col("dmin"))
    val cells = assigned
      .groupBy("kk", "cell")
      .agg(count(lit(1)).as("n"), sum(col("dmin")).as("cq"))
    cells
      .groupBy(col("kk").cast("long").as("n_clusters"))
      .agg(
        (sum(col("cq")).cast("double") / Q).as("inertia"),
        count(lit(1)).as("n_used_cells"),
        max(col("n")).as("largest_cell"),
        sum(col("n")).as("n_vectors"))
      .select(col("n_clusters"), col("inertia"), col("n_used_cells"),
        (col("largest_cell").cast("double") / col("n_vectors").cast("double"))
          .as("largest_cell_share"))
      .orderBy("n_clusters")
  }

  val nlistElbowSql: String =
    """WITH seeds AS (
      |  SELECT kk, vec_id AS cand, unnest(embedding) AS c,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings, (SELECT unnest([4, 8, 16, 32]) AS kk)
      |  WHERE vec_id < kk),
      |longf AS (
      |  SELECT vec_id, unnest(embedding) AS x,
      |         unnest(generate_series(1, len(embedding))) AS pos
      |  FROM embeddings),
      |d2 AS (
      |  SELECT kk, l.vec_id, s.cand,
      |         sum(CAST(floor((CAST(l.x AS DOUBLE) - CAST(s.c AS DOUBLE))
      |                        * (CAST(l.x AS DOUBLE) - CAST(s.c AS DOUBLE))
      |                        * 1099511627776.0) AS BIGINT)) AS d2q
      |  FROM longf l JOIN seeds s USING (pos)
      |  GROUP BY kk, l.vec_id, s.cand),
      |a AS (
      |  SELECT kk, vec_id,
      |         min(d2q * 64 + cand) % 64 AS cell,
      |         min(d2q) AS dmin
      |  FROM d2 GROUP BY kk, vec_id),
      |cells AS (
      |  SELECT kk, cell, count(*) AS n, sum(dmin) AS cq
      |  FROM a GROUP BY kk, cell)
      |SELECT CAST(kk AS BIGINT) AS n_clusters,
      |       CAST(sum(cq) AS DOUBLE) / 1099511627776.0 AS inertia,
      |       count(*) AS n_used_cells,
      |       CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS largest_cell_share
      |FROM cells GROUP BY kk ORDER BY n_clusters""".stripMargin

  /** PQ subquantizer-count (m) sweep — the storage-axis twin of
    * [[nlistElbow]]: total encode distortion at m ∈ {2, 4, 8, 16}
    * subspaces (16 codes each, the corpus's own vectors 1..16 as the
    * deterministic codebook — the [[pqTopKOver]] convention) against
    * the code size and compression each m buys. More subspaces always
    * reconstruct at least as well (each subvector gets its own code),
    * so the distortion column is provably non-increasing in m — the
    * spec pins it — and the designer reads the knee next to
    * ann_index_menu's recall column.
    *
    * Scale shape: the scoring join is PQ-build's inherent
    * |data|·Σ(m)·nCodes subvector arithmetic — codegen'd graft_l2sq
    * against a broadcast codebook, per-(m, vec, s) argmin as a
    * map-side-combined plain `min` over non-negative doubles (hash-
    * aggregable; no struct min), distortions 2⁴⁰-quantized then
    * exactly summed into a ≤|m-grid|-row result. */
  def pqMSweep(spark: SparkSession, dir: String): DataFrame =
    // examined r19, left UN-spread deliberately: the (m, vec_id, s) argmin
    // partial-aggregates map-side before the exchange, and the interleaved
    // A/B read raw 1.01 s vs spreadBy(vec_id) 1.37 s median — the guard
    // exchange is pure cost for this shape.
    pqMSweepOf(spark, Tables.load(spark, dir, "embeddings"))

  def pqMSweepOf(spark: SparkSession, embSrc: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    val nCodes = 16
    val ms = Seq(2, 4, 8, 16)
    val sub = embSrc.select(col("vec_id"), col("embedding"))
      .withColumn("m", explode(array(ms.map(lit(_)): _*)))
      .withColumn("s", explode(expr("sequence(0, m - 1)")))
      .select(col("vec_id"), col("m"), col("s"),
        expr("slice(embedding, CAST(s * (64 div m) + 1 AS INT), CAST(64 div m AS INT))").as("sv"))
    val cb = sub.where(col("vec_id").between(1, nCodes))
      .select(col("m"), col("s"), col("sv").as("v"))
    val dmin = sub.where(col("vec_id") =!= 0)
      .join(broadcast(cb), Seq("m", "s"))
      .select(col("m"), col("vec_id"), col("s"), expr("graft_l2sq(sv, v)").as("d"))
      .groupBy("m", "vec_id", "s")
      .agg(min(col("d")).as("dmin"))
    dmin
      .select(col("m"),
        floor(col("dmin") * Q).cast("long").cast(DecimalType(38, 0)).as("dq"))
      .groupBy(col("m").cast("long").as("m"))
      .agg(sum(col("dq")).as("sq"), count(lit(1)).as("n_subvectors"))
      .select(col("m"), (col("m") * 4).as("code_bits"),
        (lit(2048.0) / (col("m") * 4).cast("double")).as("compression_x"),
        (col("sq").cast("double") / Q).as("total_distortion"),
        col("n_subvectors"))
      .orderBy("m")
  }

  val pqMSweepSql: String =
    """WITH ms AS (SELECT unnest([2, 4, 8, 16]) AS m),
      |sp AS (
      |  SELECT m, vec_id, embedding,
      |         unnest(generate_series(0, m - 1)) AS s
      |  FROM embeddings, ms),
      |d AS (
      |  SELECT c.m, c.vec_id, c.s,
      |         min(list_reduce(list_transform(generate_series(1, 64 // c.m), i ->
      |           (CAST(c.embedding[c.s * (64 // c.m) + i] AS DOUBLE)
      |              - CAST(b.embedding[b.s * (64 // b.m) + i] AS DOUBLE))
      |           * (CAST(c.embedding[c.s * (64 // c.m) + i] AS DOUBLE)
      |              - CAST(b.embedding[b.s * (64 // b.m) + i] AS DOUBLE))),
      |           (x, y) -> x + y)) AS dmin
      |  FROM sp c JOIN sp b ON c.m = b.m AND c.s = b.s
      |  WHERE c.vec_id <> 0 AND b.vec_id BETWEEN 1 AND 16
      |  GROUP BY c.m, c.vec_id, c.s),
      |agg AS (
      |  SELECT m, sum(CAST(floor(dmin * 1099511627776.0) AS BIGINT)) AS sq,
      |         count(*) AS n_subvectors
      |  FROM d GROUP BY m)
      |SELECT CAST(m AS BIGINT) AS m,
      |       CAST(m * 4 AS BIGINT) AS code_bits,
      |       CAST(2048 AS DOUBLE) / CAST(m * 4 AS DOUBLE) AS compression_x,
      |       CAST(sq AS DOUBLE) / 1099511627776.0 AS total_distortion,
      |       n_subvectors
      |FROM agg ORDER BY m""".stripMargin

  /** Per-label kNN purity — the embedding-quality audit that asks
    * whether geometry agrees with labels: for every vector, do its k
    * nearest bucket-neighbors share its label? Low purity for one label
    * means that region of the space is mixed — SemDeDup-style pruning
    * and IVF routing will both bleed across it. Completes the embedding
    * QA family: norm_stats (broken exports), outlier_share (mislabeled
    * points), centroid_drift (staleness), purity (label-geometry
    * agreement).
    *
    * Scale shape: the [[knnJoin]] algebra over the full corpus — the
    * kNN-graph build job — with candidates bounded to sign-code buckets
    * (|n|²/256 pairs, never all-pairs), ranking windows partitioned on
    * the query key, and the rollup ≤|labels| keys with exact integer
    * match counts. */
  def labelPurity(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val nb = emb.select(col("vec_id").as("n_id"), col("label").as("n_label"),
      col("embedding").as("ne"), col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cosine").desc, col("n_id"))
    emb.join(nb, Seq("bucket"))
      .where(col("n_id") =!= col("vec_id"))
      .select(col("vec_id"), col("label"), col("n_id"), col("n_label"),
        cosine(spark, "embedding", "ne").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .groupBy(col("label").cast("long").as("label"))
      .agg(
        countDistinct(col("vec_id")).as("n_evaluated"),
        count(lit(1)).as("n_neighbors"),
        sum(when(col("n_label") === col("label"), 1L).otherwise(0L)).as("n_matched"))
      .select(col("label"), col("n_evaluated"), col("n_neighbors"), col("n_matched"),
        (col("n_matched").cast("double") / col("n_neighbors").cast("double")).as("purity"))
      .orderBy("label")
  }

  def labelPuritySql(k: Int = 3): String =
    s"""WITH coded AS (
       |  SELECT vec_id, label, embedding, ${signCodeSql("embedding")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id, a.label, b.label AS n_label,
       |         ${cosineSql("a.embedding", "b.embedding")} AS cosine, b.vec_id AS n_id
       |  FROM coded a JOIN coded b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT vec_id, label, n_label,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, n_id) AS rank
       |  FROM scored)
       |SELECT CAST(label AS BIGINT) AS label,
       |       count(DISTINCT vec_id) AS n_evaluated,
       |       count(*) AS n_neighbors,
       |       CAST(sum(CASE WHEN n_label = label THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       |       CAST(sum(CASE WHEN n_label = label THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS purity
       |FROM ranked WHERE rank <= $k
       |GROUP BY label ORDER BY label""".stripMargin

  /** kNN-graph hubness audit (Radovanović et al., "Hubs in Space", JMLR
    * 2010) — the curse-of-dimensionality diagnostic: in high intrinsic
    * dimension a few "hub" vectors appear in a disproportionate share of
    * other vectors' k-NN lists while "anti-hubs" appear in none. Hubs
    * distort ANN recall (they crowd out true neighbors) and semantic
    * dedup (they over-merge); a fat hub tail says distance concentration
    * is biting and cosine rankings carry less information. Reports the
    * in-degree envelope of the k=3 graph: mean/variance, max, hub count
    * and edge share (deg ≥ 2k — the standard threshold), anti-hub share.
    *
    * Determinism: every statistic derives from exact integer sums
    * (Σdeg, Σdeg², conditional counts) through fixed-order double
    * ratios — no float accumulation order anywhere. Σdeg² stays in
    * BIGINT: deg ≤ n and Σdeg = k·n, and a bucket flooded enough to
    * push it further trips [[lshOccupancy]] first.
    *
    * Scale shape: the same bucket-bounded kNN-graph build as
    * [[labelPurity]] (never all-pairs), in-degree one count-by-key,
    * the zero-degree completion a left join on vec_id, the fold a
    * single-row aggregate. The all-nodes candidate count is n²/2^bits —
    * at corpus scale widen the sign code (16+ hyperplanes, the
    * ScaleSmoke line) so per-bucket populations stay bounded, or run
    * the same in-degree algebra over the [[nnDescentRound]] graph. */
  def hubness(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val nb = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
      col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("cosine").desc, col("n_id"))
    val edges = emb.join(nb, Seq("bucket"))
      .where(col("n_id") =!= col("vec_id"))
      .select(col("vec_id"), col("n_id"),
        cosine(spark, "embedding", "ne").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    val indeg = edges.groupBy(col("n_id").as("vec_id"))
      .agg(count(lit(1)).as("deg"))
    val degs = Tables.load(spark, dir, "embeddings").select("vec_id")
      .join(indeg, Seq("vec_id"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("deg"))
    val mean = col("n_edges").cast("double") / col("n_vectors").cast("double")
    degs.agg(
      count(lit(1)).as("n_vectors"),
      sum(col("deg")).as("n_edges"),
      max(col("deg")).as("max_indeg"),
      sum(col("deg") * col("deg")).as("s2"),
      sum(when(col("deg") >= 2L * k, 1L).otherwise(0L)).as("n_hubs"),
      sum(when(col("deg") >= 2L * k, col("deg")).otherwise(0L)).as("hub_edges"),
      sum(when(col("deg") === 0L, 1L).otherwise(0L)).as("n_antihubs"))
      .select(col("n_vectors"), col("n_edges"), col("max_indeg"),
        when(col("n_vectors") > 0L, mean).as("mean_indeg"),
        when(col("n_vectors") > 0L,
          col("s2").cast("double") / col("n_vectors").cast("double")
            - mean * mean).as("var_indeg"),
        col("n_hubs"),
        when(col("n_vectors") > 0L,
          col("n_hubs").cast("double") / col("n_vectors").cast("double"))
          .as("hub_share"),
        when(col("n_edges") > 0L,
          col("hub_edges").cast("double") / col("n_edges").cast("double"))
          .as("hub_edge_share"),
        col("n_antihubs"),
        when(col("n_vectors") > 0L,
          col("n_antihubs").cast("double") / col("n_vectors").cast("double"))
          .as("antihub_share"))
  }

  def hubnessSql(k: Int = 3): String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id, b.vec_id AS n_id,
       |         ${cosineSql("a.embedding", "b.embedding")} AS cosine
       |  FROM coded a JOIN coded b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT vec_id, n_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, n_id) AS rank
       |  FROM scored),
       |indeg AS (
       |  SELECT n_id AS vec_id, count(*) AS deg FROM ranked WHERE rank <= $k GROUP BY 1),
       |degs AS (
       |  SELECT CAST(coalesce(i.deg, 0) AS BIGINT) AS deg
       |  FROM embeddings e LEFT JOIN indeg i ON e.vec_id = i.vec_id),
       |f AS (
       |  SELECT count(*) AS n_vectors,
       |         CAST(sum(deg) AS BIGINT) AS n_edges,
       |         max(deg) AS max_indeg,
       |         CAST(sum(deg * deg) AS BIGINT) AS s2,
       |         CAST(sum(CASE WHEN deg >= ${2 * k} THEN 1 ELSE 0 END) AS BIGINT) AS n_hubs,
       |         CAST(sum(CASE WHEN deg >= ${2 * k} THEN deg ELSE 0 END) AS BIGINT) AS hub_edges,
       |         CAST(sum(CASE WHEN deg = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_antihubs
       |  FROM degs)
       |SELECT n_vectors, n_edges, max_indeg,
       |       CASE WHEN n_vectors > 0
       |            THEN CAST(n_edges AS DOUBLE) / CAST(n_vectors AS DOUBLE) END AS mean_indeg,
       |       CASE WHEN n_vectors > 0
       |            THEN CAST(s2 AS DOUBLE) / CAST(n_vectors AS DOUBLE)
       |                 - (CAST(n_edges AS DOUBLE) / CAST(n_vectors AS DOUBLE))
       |                 * (CAST(n_edges AS DOUBLE) / CAST(n_vectors AS DOUBLE)) END AS var_indeg,
       |       n_hubs,
       |       CASE WHEN n_vectors > 0
       |            THEN CAST(n_hubs AS DOUBLE) / CAST(n_vectors AS DOUBLE) END AS hub_share,
       |       CASE WHEN n_edges > 0
       |            THEN CAST(hub_edges AS DOUBLE) / CAST(n_edges AS DOUBLE) END AS hub_edge_share,
       |       n_antihubs,
       |       CASE WHEN n_vectors > 0
       |            THEN CAST(n_antihubs AS DOUBLE) / CAST(n_vectors AS DOUBLE) END AS antihub_share
       |FROM f""".stripMargin

  /** Candidate-pair cosine histogram — the threshold-setting
    * distribution for the embedding dedup/search radius (the vector-
    * space twin of `dedup_threshold_curve`'s Jaccard axis): all
    * sign-LSH bucket candidate pairs scored with the codegen'd cosine
    * and bucketed at 0.05 granularity (floor(cos·20), clamped to
    * [−20, 20]) with shares and cumulative shares. Read the knee before
    * picking the [[dedup.Dedup.semantic]] radius: mass above a
    * candidate threshold is what it admits, the plateau below is what
    * banding let through for nothing. [[anisotropy]] gives the exact
    * all-pairs MEAN; this shows the candidate-visible SHAPE.
    *
    * Scale shape: pairs bounded to sign buckets (never all-pairs,
    * the [[hubness]]/[[twonnRatio]] scale knob applies), one ≤41-key
    * histogram with windows over that bounded table. */
  def pairSimHist(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val nb = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
      col("bucket"))
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy("cos_bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    emb.join(nb, Seq("bucket"))
      .where(col("vec_id") < col("n_id"))
      .select(expr("graft_cosine(embedding, ne)").as("c"))
      .select(greatest(least(floor(col("c") * 20.0), lit(20.0)), lit(-20.0))
        .cast("long").as("cos_bucket"))
      .groupBy("cos_bucket")
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("share",
        col("n_pairs").cast("double") / sum(col("n_pairs")).over(tot).cast("double"))
      .withColumn("cum_share",
        sum(col("n_pairs")).over(cum).cast("double")
          / sum(col("n_pairs")).over(tot).cast("double"))
      .select(col("cos_bucket"),
        (col("cos_bucket").cast("double") / 20.0).as("cosine_lo"),
        col("n_pairs"), col("share"), col("cum_share"))
      .orderBy("cos_bucket")
  }

  val pairSimHistSql: String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT ${cosineSql("a.embedding", "b.embedding")} AS c
       |  FROM coded a JOIN coded b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
       |b AS (
       |  SELECT CAST(greatest(least(floor(c * 20.0), 20.0), -20.0) AS BIGINT) AS cos_bucket
       |  FROM scored),
       |h AS (SELECT cos_bucket, count(*) AS n_pairs FROM b GROUP BY cos_bucket)
       |SELECT cos_bucket,
       |       CAST(cos_bucket AS DOUBLE) / 20.0 AS cosine_lo,
       |       n_pairs,
       |       CAST(n_pairs AS DOUBLE) / CAST(sum(n_pairs) OVER () AS DOUBLE) AS share,
       |       CAST(sum(n_pairs) OVER (ORDER BY cos_bucket
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         / CAST(sum(n_pairs) OVER () AS DOUBLE) AS cum_share
       |FROM h ORDER BY cos_bucket""".stripMargin

  /** Embedding anisotropy — the Ethayarajh-style cone check: the EXACT
    * mean pairwise cosine over ALL n·(n−1) vector pairs, computed with
    * ZERO pair enumeration via the norm-of-sum identity
    * mean cos = (‖Σu‖² − Σ‖u‖²) / (n(n−1)) over unit vectors u. A mean
    * near 0 is an isotropic export; a large positive mean says the
    * vectors live in a narrow cone — cosine thresholds stop separating
    * and every dedup/ANN radius in the registry needs re-tuning. Also
    * reports the centroid norm (the cone axis length) and the quantized
    * self-similarity (≈1, the quantization sanity line).
    *
    * Exactness: unit coordinates quantize to floor(u·2²⁰) so Σu per
    * dimension, its square, and Σ‖u‖² are all integer-exact DECIMAL
    * sums; the outputs are fixed-order double ratios on the 2⁴⁰ basis —
    * deterministic and engine-identical (documented as exact over the
    * quantized grid).
    *
    * Scale shape: one per-dimension aggregation (|dims| keys) and a
    * single-row fold — O(n·d) with no joins, no windows, no pairs. */
  /** Whitening effect — [[anisotropy]] re-measured after per-dimension
    * standardization (x − μ)/σ, the cheapest isotropy fix an embedding
    * pipeline applies before cosine retrieval (Su et al., "Whitening
    * Sentence Representations", 2021 — the diagonal special case). One
    * row: the corpus's mean pairwise cosine RAW vs WHITENED; a large
    * drop = the anisotropy was mostly per-dimension offset/scale and the
    * cheap fix suffices; a small drop = rotation (full ZCA/PCA) would be
    * needed.
    *
    * Scale shape: the per-dim (μ, σ) table is d rows (exact decimal sums
    * over 2²⁰-quantized coords), folded into ONE broadcast row of
    * arrays; standardization is a per-row transform against that
    * broadcast; both cosine means use the norm-of-sum identity — exact
    * over ALL n(n−1) pairs with ZERO pair enumeration, O(n·d) total,
    * same as [[anisotropy]]. Every cross-row float sum is quantized →
    * layout-invariant. */
  def whiteningEffect(spark: SparkSession, dir: String): DataFrame = {
    val q20 = 1048576.0
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val emb = Tables.load(spark, dir, "embeddings")
    // ONE explode serves both raw-side measurements: per-dim raw moments
    // (→ μ, σ over ALL vectors) and per-dim unit-coordinate sums (→ the
    // raw mean-pairwise-cosine identity, over nonzero-norm vectors) —
    // at scale this halves the raw-side passes and the stage count.
    // All cross-row sums are exact integers over 2^20-quantized coords.
    GraftFunctions.register(spark)
    val sharedPerDim = emb
      // graft_norm2: the codegen'd Σx² (same index-ordered accumulation
      // as the portable fold — bit-identical); the interpreted HOF fold
      // measures ~1.5 ms/row at d=64 and dominated this operator
      .select(sqrt(expr("graft_norm2(embedding)")).as("norm"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x").cast("double") * q20).cast("long").as("xq"),
        when(col("norm") > 0.0,
          floor(col("x").cast("double") / col("norm") * q20).cast("long")).as("uq"))
      .groupBy("pos")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xq").cast(d19)).cast(d19).as("s1"),
        sum((col("xq") * col("xq")).cast(d38)).cast(d38).as("s2"),
        count(col("uq")).as("cnt_nz"),
        sum(col("uq").cast(d19)).cast(d19).as("su"),
        sum((col("uq") * col("uq")).cast(d38)).cast(d38).as("sq2"))
      // d rows, consumed by TWO branches (the μ/σ broadcast and the raw
      // identity) — checkpoint so the n·d explode pass runs once, the
      // per-round-state precedent of the kmeans loops
      .localCheckpoint(true)
    val stats = sharedPerDim
      .select(col("pos"),
        (col("s1").cast("double") / col("n") / q20).as("mu"),
        sqrt(greatest(
          col("s2").cast("double") / col("n") / (q20 * q20)
            - pow(col("s1").cast("double") / col("n") / q20, 2.0),
          lit(0.0))).as("sigma"))
    // ONE broadcast row of (mu[d], sigma[d]) arrays, index-ordered
    val statsRow = stats
      .agg(sort_array(collect_list(struct(col("pos"), col("mu"), col("sigma")))).as("st"))
      .select(transform(col("st"), s => s.getField("mu")).as("mu"),
        transform(col("st"), s => s.getField("sigma")).as("sigma"))
    // standardized coords: (x − μ_j)/σ_j, constant dims (σ = 0) → 0.
    // spread: the transform is an interpreted higher-order expression
    // (HOFs don't codegen), and downstream projection collapse would
    // otherwise re-evaluate it once in the norm fold, once in the filter
    // and once in the explode — the exchange materializes `w` exactly
    // once per row (measured ~2× on the whitened leg)
    val white = graft.Tables.spread(emb.crossJoin(broadcast(statsRow))
      .select(transform(sequence(lit(1), size(col("embedding"))),
        i => when(element_at(col("sigma"), i) > 0.0,
          (element_at(col("embedding"), i).cast("double") - element_at(col("mu"), i))
            / element_at(col("sigma"), i)).otherwise(lit(0.0))).as("w")))
    def mpc(vecs: DataFrame, vcol: String): DataFrame = {
      val nz = vecs
        .select(col(vcol).as("v"), sqrt(expr(s"graft_norm2($vcol)")).as("norm"))
        .where(col("norm") > 0.0)
      val perDim = nz
        .select(col("norm"), posexplode(col("v")).as(Seq("pos", "x")))
        .select(col("pos"),
          floor(col("x").cast("double") / col("norm") * q20).cast("long").as("uq"))
        .groupBy("pos")
        // cnt rides along so the vector count needs NO second execution
        // of the upstream pipeline (every pos carries all n vectors —
        // arrays are uniformly d-long and the norm filter is per-vector)
        .agg(count(lit(1)).as("cnt"),
          sum(col("uq").cast(d19)).cast(d19).as("su"),
          sum((col("uq") * col("uq")).cast(d38)).cast(d38).as("sq2"))
      val nD = col("n_vectors").cast("double")
      perDim.agg(
        max(col("cnt")).as("n_vectors"),
        sum((col("su") * col("su")).cast(d38)).cast(d38).as("s2sum"),
        sum(col("sq2")).cast(d38).as("qn"))
        .select(col("n_vectors"),
          ((col("s2sum").cast("double") - col("qn").cast("double"))
            / (nD * (nD - lit(1.0)) * lit(1099511627776.0))).as("mpc"))
    }
    // raw mean pairwise cosine straight off the shared per-dim sums
    val nD = col("n_vectors").cast("double")
    val raw = sharedPerDim.agg(
      max(col("cnt_nz")).as("n_vectors"),
      sum((col("su") * col("su")).cast(d38)).cast(d38).as("s2sum"),
      sum(col("sq2")).cast(d38).as("qn"))
      .select(col("n_vectors"),
        ((col("s2sum").cast("double") - col("qn").cast("double"))
          / (nD * (nD - lit(1.0)) * lit(1099511627776.0))).as("mpc_raw"))
    val whitened = mpc(white, "w")
      .select(col("mpc").as("mpc_whitened"))
    raw.crossJoin(broadcast(whitened))
      .withColumn("isotropy_gain", col("mpc_raw") - col("mpc_whitened"))
  }

  val whiteningEffectSql: String = {
    def mpcSql(src: String, vcol: String, outName: String): String =
      s"""nz_$outName AS (
         |  SELECT $vcol AS v, sqrt(${dotFoldSql(vcol, vcol)}) AS norm FROM $src
         |  WHERE sqrt(${dotFoldSql(vcol, vcol)}) > 0.0),
         |longf_$outName AS (
         |  SELECT unnest(generate_series(0, len(v) - 1)) AS pos,
         |         CAST(floor(CAST(unnest(v) AS DOUBLE) / norm * 1048576.0) AS BIGINT) AS uq
         |  FROM nz_$outName),
         |perdim_$outName AS (
         |  SELECT pos,
         |         CAST(sum(CAST(uq AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS su,
         |         CAST(sum(CAST(uq * uq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq2
         |  FROM longf_$outName GROUP BY pos),
         |agg_$outName AS (
         |  SELECT (SELECT count(*) FROM nz_$outName) AS nv,
         |         CAST(sum(CAST(su * su AS DECIMAL(38,0))) AS DOUBLE) AS s2sum,
         |         CAST(sum(sq2) AS DOUBLE) AS qn
         |  FROM perdim_$outName),
         |$outName AS (
         |  SELECT nv AS n_vectors,
         |         (s2sum - qn) / (CAST(nv AS DOUBLE) * (CAST(nv AS DOUBLE) - 1.0)
         |           * 1099511627776.0) AS mpc
         |  FROM agg_$outName)""".stripMargin
    s"""WITH qraw AS (
       |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1048576.0) AS BIGINT) AS xq
       |  FROM embeddings),
       |dstats AS (
       |  SELECT pos, count(*) AS n,
       |         CAST(sum(CAST(xq AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS s1,
       |         CAST(sum(CAST(xq * xq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |  FROM qraw GROUP BY pos),
       |dims AS (
       |  SELECT pos,
       |         CAST(s1 AS DOUBLE) / n / 1048576.0 AS mu,
       |         sqrt(greatest(CAST(s2 AS DOUBLE) / n / 1099511627776.0
       |           - pow(CAST(s1 AS DOUBLE) / n / 1048576.0, 2.0), 0.0)) AS sigma
       |  FROM dstats),
       |srow AS (
       |  SELECT list(mu ORDER BY pos) AS mu, list(sigma ORDER BY pos) AS sigma FROM dims),
       |whitened_vecs AS (
       |  SELECT list_transform(generate_series(1, len(embedding)),
       |           i -> CASE WHEN srow.sigma[i] > 0.0
       |                     THEN (CAST(embedding[i] AS DOUBLE) - srow.mu[i]) / srow.sigma[i]
       |                     ELSE 0.0 END) AS w
       |  FROM embeddings, srow),
       |${mpcSql("embeddings", "embedding", "raws")},
       |${mpcSql("whitened_vecs", "w", "whites")}
       |SELECT r.n_vectors, r.mpc AS mpc_raw, w.mpc AS mpc_whitened,
       |       r.mpc - w.mpc AS isotropy_gain
       |FROM raws r CROSS JOIN whites w""".stripMargin
  }

  def anisotropy(spark: SparkSession, dir: String): DataFrame = {
    val q20 = 1048576.0
    val d19 = DecimalType(19, 0)
    val d38 = DecimalType(38, 0)
    val nz = Tables.load(spark, dir, "embeddings")
      .select(col("embedding"),
        sqrt(norm2(spark, "embedding")).as("norm"))
      .where(col("norm") > 0.0)
    val perDim = nz
      .select(col("norm"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("pos"),
        floor(col("x").cast("double") / col("norm") * q20).cast("long").as("uq"))
      .groupBy("pos")
      .agg(
        sum(col("uq").cast(d19)).cast(d19).as("su"),
        sum((col("uq") * col("uq")).cast(d38)).cast(d38).as("sq2"))
    val folded = perDim.agg(
      sum((col("su") * col("su")).cast(d38)).cast(d38).as("s2sum"),
      sum(col("sq2")).cast(d38).as("qn"))
    val n = nz.agg(count(lit(1)).as("n_vectors"))
    val nD = col("n_vectors").cast("double")
    n.crossJoin(broadcast(folded))
      .select(col("n_vectors"),
        ((col("s2sum").cast("double") - col("qn").cast("double"))
          / (nD * (nD - lit(1.0)) * lit(1099511627776.0)))
          .as("mean_pairwise_cosine"),
        (sqrt(col("s2sum").cast("double")) / (nD * lit(1048576.0)))
          .as("centroid_norm"),
        (col("qn").cast("double") / (nD * lit(1099511627776.0)))
          .as("mean_self_similarity"))
  }

  val anisotropySql: String =
    s"""WITH nz AS (
       |  SELECT embedding, sqrt(${dotFoldSql("embedding", "embedding")}) AS norm
       |  FROM embeddings
       |  WHERE sqrt(${dotFoldSql("embedding", "embedding")}) > 0.0),
       |longf AS (
       |  SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) / norm * 1048576.0) AS BIGINT) AS uq
       |  FROM nz),
       |perdim AS (
       |  SELECT pos,
       |         CAST(sum(CAST(uq AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS su,
       |         CAST(sum(CAST(uq * uq AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sq2
       |  FROM longf GROUP BY pos),
       |s AS (
       |  SELECT CAST(sum(CAST(su * su AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2sum,
       |         CAST(sum(sq2) AS DECIMAL(38,0)) AS qn
       |  FROM perdim),
       |f AS (SELECT count(*) AS n_vectors FROM nz)
       |SELECT n_vectors,
       |       (CAST(s2sum AS DOUBLE) - CAST(qn AS DOUBLE))
       |         / (CAST(n_vectors AS DOUBLE) * (CAST(n_vectors AS DOUBLE) - 1.0)
       |            * 1099511627776.0) AS mean_pairwise_cosine,
       |       sqrt(CAST(s2sum AS DOUBLE))
       |         / (CAST(n_vectors AS DOUBLE) * 1048576.0) AS centroid_norm,
       |       CAST(qn AS DOUBLE)
       |         / (CAST(n_vectors AS DOUBLE) * 1099511627776.0) AS mean_self_similarity
       |FROM f, s""".stripMargin

  /** TwoNN nearest-neighbor ratio distribution — the intrinsic-dimension
    * screen (Facco et al., Scientific Reports 2017): per vector the
    * ratio d₂²/d₁² of its two nearest neighbors, bucketed at 1/16
    * granularity into a bounded histogram with cumulative shares. Ratios
    * piling up near 1 mean high intrinsic dimension (distance
    * concentration — ANN recall and cosine dedup both degrade); a wide
    * ratio spread means low-dimensional structure ANN indexes can
    * exploit. The downstream TwoNN ID estimate is ln2/ln(median μ) —
    * left to the caller so this table stays libm-free. Bucket −1 counts
    * vectors whose nearest neighbor is an EXACT duplicate (d₁ = 0, the
    * [[exactDup]] population — infinite ratio, excluded from the grid).
    *
    * Exactness: pair distances are the codegen'd index-ordered
    * `graft_l2sq` fold (bit-identical in DuckDB's list_reduce form);
    * the bucket floor((d₂/d₁)·16) is the same two IEEE ops on both
    * engines; shares are ratios of exact counts.
    *
    * Scale shape: candidates bounded to sign-LSH buckets (never
    * all-pairs; widen the code at corpus scale as in [[hubness]]),
    * ranking window partitioned on vec_id, then a ≤513-key histogram
    * with its windows over that bounded table. */
  def twonnRatio(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("bucket", signCode(col("embedding")))
    val nb = emb.select(col("vec_id").as("n_id"), col("embedding").as("ne"),
      col("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("d").asc, col("n_id"))
    val ranked = emb.join(nb, Seq("bucket"))
      .where(col("n_id") =!= col("vec_id"))
      .select(col("vec_id"), col("n_id"),
        expr("graft_l2sq(embedding, ne)").as("d"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 2)
    val per = ranked.groupBy("vec_id")
      .agg(count(lit(1)).as("n_nb"),
        min(when(col("rn") === 1, col("d"))).as("d1"),
        min(when(col("rn") === 2, col("d"))).as("d2"))
      .where(col("n_nb") === 2)
    val tot = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = org.apache.spark.sql.expressions.Window.partitionBy()
      .orderBy("ratio_bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    per
      .select(when(col("d1") === 0.0, lit(-1L))
        .otherwise(least(floor(col("d2") / col("d1") * 16.0), lit(511.0))
          .cast("long")).as("ratio_bucket"))
      .groupBy("ratio_bucket")
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("share",
        col("n_vecs").cast("double") / sum(col("n_vecs")).over(tot).cast("double"))
      .withColumn("cum_share",
        sum(col("n_vecs")).over(cum).cast("double")
          / sum(col("n_vecs")).over(tot).cast("double"))
      .select(col("ratio_bucket"),
        when(col("ratio_bucket") >= 0L,
          col("ratio_bucket").cast("double") / 16.0).as("ratio_sq_lo"),
        col("n_vecs"), col("share"), col("cum_share"))
      .orderBy("ratio_bucket")
  }

  val twonnRatioSql: String =
    s"""WITH coded AS (
       |  SELECT vec_id, embedding, ${signCodeSql("embedding")} AS bucket
       |  FROM embeddings),
       |scored AS (
       |  SELECT a.vec_id, b.vec_id AS n_id,
       |         ${l2Sql("a.embedding", "b.embedding")} AS d
       |  FROM coded a JOIN coded b ON a.bucket = b.bucket AND b.vec_id <> a.vec_id),
       |ranked AS (
       |  SELECT vec_id, d,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, n_id) AS rn
       |  FROM scored),
       |per AS (
       |  SELECT vec_id, count(*) AS n_nb,
       |         min(CASE WHEN rn = 1 THEN d END) AS d1,
       |         min(CASE WHEN rn = 2 THEN d END) AS d2
       |  FROM ranked WHERE rn <= 2 GROUP BY vec_id),
       |b AS (
       |  SELECT CASE WHEN d1 = 0.0 THEN CAST(-1 AS BIGINT)
       |              ELSE CAST(least(floor(d2 / d1 * 16.0), 511.0) AS BIGINT)
       |         END AS ratio_bucket
       |  FROM per WHERE n_nb = 2),
       |h AS (SELECT ratio_bucket, count(*) AS n_vecs FROM b GROUP BY ratio_bucket)
       |SELECT ratio_bucket,
       |       CASE WHEN ratio_bucket >= 0
       |            THEN CAST(ratio_bucket AS DOUBLE) / 16.0 END AS ratio_sq_lo,
       |       n_vecs,
       |       CAST(n_vecs AS DOUBLE) / CAST(sum(n_vecs) OVER () AS DOUBLE) AS share,
       |       CAST(sum(n_vecs) OVER (ORDER BY ratio_bucket
       |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         / CAST(sum(n_vecs) OVER () AS DOUBLE) AS cum_share
       |FROM h ORDER BY ratio_bucket""".stripMargin

  /** Binary-quantized (1-bit-per-dimension) Hamming top-k — the last
    * rung of the storage ladder (PQ = 4 bits/dim-group, SQ8 = 8
    * bits/dim, binary = 1 bit/dim, 32:1 over float32): each vector
    * collapses to two 32-bit sign words, the query likewise, and the
    * scan ranks by popcount of the XOR — the binary-quantization scan
    * every production vector store ships as its cheapest tier. Ties (a
    * 65-value distance can't help but tie) break on vec_id, so the
    * page is deterministic.
    *
    * Scale shape: the signature build and the XOR/popcount scoring are
    * pure per-row integer codegen (no floats touched at scan time —
    * two longs per vector is all a 100 TB scan reads); the query
    * signature broadcasts as one row; zero shuffles before
    * TakeOrderedAndProject. The oracle scores the mathematically
    * identical per-dimension sign-disagreement count — bit-packing is
    * the ENGINE's storage trick, not part of the answer. */
  def binaryTopK(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    def signWord(src: String, lo: Int): String =
      s"""aggregate(sequence($lo, ${lo + 31}), cast(0 as bigint), (acc, i) ->
         |  acc + IF(element_at($src, i) >= cast(0.0 as float),
         |           shiftleft(cast(1 as bigint), i - $lo), cast(0 as bigint)))""".stripMargin
    val q = emb.where(col("vec_id") === 0).limit(1)
      .select(expr(signWord("embedding", 1)).as("q_lo"),
        expr(signWord("embedding", 33)).as("q_hi"))
    emb.where(col("vec_id") =!= 0)
      .select(col("vec_id"),
        expr(signWord("embedding", 1)).as("s_lo"),
        expr(signWord("embedding", 33)).as("s_hi"))
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (expr("bit_count(s_lo ^ q_lo)") + expr("bit_count(s_hi ^ q_hi)"))
          .cast("long").as("hamming"))
      .orderBy(col("hamming").asc, col("vec_id"))
      .limit(k)
  }

  private def binaryCte(k: Int): String =
    s"""WITH qb AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |bink AS (
       |  SELECT vec_id,
       |         CAST(list_reduce(list_transform(range(1, 65), i ->
       |           CASE WHEN (CAST(embedding[i] AS DOUBLE) >= 0.0)
       |                     <> (CAST(qe[i] AS DOUBLE) >= 0.0) THEN 1 ELSE 0 END),
       |           (x, y) -> x + y) AS BIGINT) AS hamming
       |  FROM embeddings CROSS JOIN qb WHERE vec_id <> 0
       |  ORDER BY hamming ASC, vec_id LIMIT $k)""".stripMargin

  def binaryTopKSql(k: Int = 10): String =
    s"""${binaryCte(k)}
       |SELECT vec_id, hamming FROM bink ORDER BY hamming, vec_id""".stripMargin

  /** Binary-quantization fidelity gate: recall@k of the 1-bit Hamming
    * scan against the exact L2 top-k — the third row of the
    * storage-vs-recall read-out next to [[pqRecall]] and [[sq8Recall]]
    * (32:1 compression is free to TRY; this table says what it costs).
    * Same tagged-union compare as the other gates. */
  def binaryRecall(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    GraftFunctions.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val exact = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(k)
      .select(col("vec_id"), lit(1).as("e"), lit(0).as("p"))
    val bin = binaryTopK(spark, dir, k).select(col("vec_id"), lit(0).as("e"), lit(1).as("p"))
    exact.unionAll(bin)
      .groupBy("vec_id")
      .agg(max(col("e")).as("in_exact"), max(col("p")).as("in_bin"))
      .agg(
        sum(col("in_exact")).as("n_exact"),
        sum(col("in_bin")).as("n_bin"),
        count(when(col("in_exact") === 1 && col("in_bin") === 1, 1)).as("n_common"))
      .withColumn("recall_at_k",
        col("n_common").cast("double") / col("n_exact").cast("double"))
  }

  def binaryRecallSql(k: Int = 10): String =
    s"""${binaryCte(k)},
       |q2 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |exact AS (
       |  SELECT vec_id FROM embeddings CROSS JOIN q2
       |  WHERE vec_id <> 0
       |  ORDER BY ${l2Sql("embedding", "qe")} ASC, vec_id LIMIT $k),
       |tagged AS (
       |  SELECT vec_id, 1 AS e, 0 AS p FROM exact
       |  UNION ALL SELECT vec_id, 0 AS e, 1 AS p FROM bink),
       |flags AS (
       |  SELECT vec_id, max(e) AS in_exact, max(p) AS in_bin FROM tagged GROUP BY vec_id)
       |SELECT CAST(sum(in_exact) AS BIGINT) AS n_exact,
       |       CAST(sum(in_bin) AS BIGINT) AS n_bin,
       |       count(CASE WHEN in_exact = 1 AND in_bin = 1 THEN 1 END) AS n_common,
       |       CAST(count(CASE WHEN in_exact = 1 AND in_bin = 1 THEN 1 END) AS DOUBLE)
       |         / CAST(sum(in_exact) AS DOUBLE) AS recall_at_k
       |FROM flags""".stripMargin
}
