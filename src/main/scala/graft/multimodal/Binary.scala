package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata. The actual codec step is STUBBED
  * (this container has no image/audio libraries) with a deterministic fake
  * decode — but the Spark-side plumbing (binary columns, schema, batched
  * per-partition decode via mapPartitions, frame-sampling fan-out) is real
  * and tested.
  *
  * The binary payloads are derived from `documents.text` (utf-8 bytes) so
  * both engines construct identical blobs.
  */
object Binary {

  /** Binary payload + typed metadata extraction: size, magic prefix, and a
    * stubbed decode producing deterministic fake dimensions. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"),
        substring(hex(col("payload")), 1, 8).as("magic_hex"),
        // STUB decode: real impl would parse the container header here.
        (col("doc_id") % 1920 + 1).cast("int").as("fake_width"),
        (length(col("payload")) % 1080 + 1).cast("int").as("fake_height"),
        (length(col("payload")) % 3 === 0).as("fake_has_audio"))
      .orderBy("doc_id")

  val binaryMetaSql: String =
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       substr(hex(encode(text)), 1, 8) AS magic_hex,
      |       CAST(doc_id % 1920 + 1 AS INTEGER) AS fake_width,
      |       CAST(octet_length(encode(text)) % 1080 + 1 AS INTEGER) AS fake_height,
      |       octet_length(encode(text)) % 3 = 0 AS fake_has_audio
      |FROM documents ORDER BY doc_id""".stripMargin

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_offset", LongType, nullable = false),
    StructField("frame_sig", StringType, nullable = false)))

  /** Frame-sampling plumbing: each binary payload fans out to
    * ceil(n_bytes/1000) frames, decoded per-partition in batches via
    * mapPartitions — the batch shape a real codec UDF would use. The
    * "decode" is a deterministic stub (md5 of doc_id:frame_idx). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    val withPayload = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), col("payload"), length(col("payload")).cast("long").as("n_bytes"))

    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(frameSchema)
    val frames = withPayload.mapPartitions { rows =>
      // Batched per-partition decode: one digest instance per partition,
      // the shape a real codec (decode buffer, model handle) would reuse.
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val docId = r.getLong(0)
        val nBytes = r.getLong(2)
        val nFrames = ((nBytes + 999L) / 1000L).toInt
        (0 until nFrames).iterator.map { i =>
          digest.reset()
          val sig = digest.digest(s"$docId:$i".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString
          Row(docId, i, i * 4096L % math.max(nBytes, 1L), sig)
        }
      }
    }(enc)
    frames.orderBy("doc_id", "frame_idx")
  }

  val frameSampleSql: String =
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
      |       CAST(i AS BIGINT) * 4096 % greatest(octet_length(encode(text)), 1) AS frame_offset,
      |       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)) AS frame_sig
      |FROM (SELECT doc_id, text,
      |             unnest(generate_series(0, CAST((octet_length(encode(text)) + 999) // 1000 AS INTEGER) - 1)) AS i
      |      FROM documents)
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Cross-document frame dedup: fingerprints from [[frameSample]] that
    * recur across documents — the frame-level dedup a video pipeline runs
    * before feature extraction (intro cards, black frames, shared stock
    * footage dedupe at the frame, not the file). Hash-groupBy on the
    * frame signature, same one-shuffle shape as exact text dedup. The
    * deterministic stub signature collides exactly when (doc_id % 100,
    * frame_idx) collide, giving the operator real work to find. */
  def frameDedup(spark: SparkSession, dir: String): DataFrame = {
    // frame fan-out straight from the byte length (same derivation as
    // frameStats) — routing through frameSample would pay its per-frame
    // stub-decode digest and ordered output, then throw both away
    val frames = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        ((length(encode(col("text"), "UTF-8")).cast("long") + 999L) / 1000L)
          .cast("int").as("n_frames"))
      // empty payloads fan out to zero frames; Spark's sequence(0, -1)
      // would auto-descend to [0, -1] instead of empty, so guard first
      .where(col("n_frames") > 0)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      // stub collision domain: docs congruent mod 100 produce identical
      // frame signatures (a real pipeline would use a perceptual hash)
      .withColumn("sig", md5(concat_ws(":",
        (col("doc_id") % 100).cast("string"), col("frame_idx").cast("string"))))
    frames
      .groupBy("sig")
      .agg(
        count(lit(1)).as("n_frames"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("canonical_doc"))
      .where(col("n_docs") > 1)
      .orderBy("sig")
  }

  val frameDedupSql: String =
    """WITH frames AS (
      |  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx
      |  FROM (SELECT doc_id, text,
      |               unnest(generate_series(0, CAST((octet_length(encode(text)) + 999) // 1000 AS INTEGER) - 1)) AS i
      |        FROM documents)),
      |sigs AS (
      |  SELECT doc_id,
      |         md5(CAST(doc_id % 100 AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)) AS sig
      |  FROM frames)
      |SELECT sig, count(*) AS n_frames, count(DISTINCT doc_id) AS n_docs,
      |       min(doc_id) AS canonical_doc
      |FROM sigs GROUP BY sig HAVING count(DISTINCT doc_id) > 1
      |ORDER BY sig""".stripMargin

  /** Frame-count distribution across blobs: total/percentile frames per
    * payload — the decode-capacity plan (how many frame-decode tasks a
    * corpus fans out to, and how skewed the per-blob work is). Exact
    * integer counts + portable interpolated percentiles. */
  def frameStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(((length(encode(col("text"), "UTF-8")).cast("long") + 999L) / 1000L)
        .cast("long").as("n_frames"))
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("n_frames")).as("total_frames"),
        max(col("n_frames")).as("max_frames"),
        expr("percentile(n_frames, 0.5)").as("p50_frames"),
        expr("percentile(n_frames, 0.95)").as("p95_frames"))

  val frameStatsSql: String =
    """WITH f AS (
      |  SELECT (octet_length(encode(text)) + 999) // 1000 AS n_frames FROM documents)
      |SELECT count(*) AS n_blobs,
      |       CAST(sum(n_frames) AS BIGINT) AS total_frames,
      |       max(n_frames) AS max_frames,
      |       quantile_cont(n_frames, 0.5) AS p50_frames,
      |       quantile_cont(n_frames, 0.95) AS p95_frames
      |FROM f""".stripMargin

  /** Per-modality payload statistics: blob counts, byte volumes and
    * magic-prefix diversity for each modality class — the storage-planning
    * slice (partition sizing, codec routing) a multimodal lake needs.
    * Modality is the typed-metadata column (derived deterministically here
    * since blobs are synthetic). One scan + one 3-group aggregation. */
  def modalityStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("modality"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        substring(hex(encode(col("text"), "UTF-8")), 1, 8).as("magic_hex"))
      .groupBy("modality")
      .agg(
        count(lit(1)).as("n_blobs"),
        sum(col("n_bytes")).as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"),
        countDistinct(col("magic_hex")).as("n_magics"))
      .withColumn("avg_bytes", col("total_bytes").cast("double") / col("n_blobs").cast("double"))
      .orderBy("modality")

  val modalityStatsSql: String =
    """WITH b AS (
      |  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
      |         octet_length(encode(text)) AS n_bytes,
      |         substr(hex(encode(text)), 1, 8) AS magic_hex
      |  FROM documents)
      |SELECT modality, count(*) AS n_blobs, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |       max(n_bytes) AS max_bytes, count(DISTINCT magic_hex) AS n_magics,
      |       CAST(sum(n_bytes) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_bytes
      |FROM b GROUP BY modality ORDER BY modality""".stripMargin
}
