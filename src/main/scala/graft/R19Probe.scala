package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Ann
import graft.cdc.Materialize

/** r19 optimization-round A/B variants (NOT registered). Each pair is the
  * r18 registered shape ("…_raw") against the r19 candidate, run
  * interleaved in one JVM window (ProfileR19) so ambient drift hits both
  * sides equally; candidates are promoted only after an interleaved win
  * AND an oracle-equivalence pass (tools/selfcheck.py).
  */
object R19Variants {

  /** r18 shapes of the ANN iterative/sweep family: the embeddings source
    * NOT redistributed, so on the single-row-group test corpus the
    * |data|·k·d distance arithmetic pipelines into one scan task
    * (guide §2.5). The r19 registered forms pass
    * Tables.spreadBy(…, vec_id) instead. */
  def kmeansConvergeRaw(s: SparkSession, d: String): DataFrame =
    Ann.kmeansConvergeOf(s, Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")))
  def kmeansRefineRaw(s: SparkSession, d: String): DataFrame =
    Ann.kmeansRefineOf(s, Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")))
  def nlistElbowRaw(s: SparkSession, d: String): DataFrame =
    Ann.nlistElbowOf(s, Tables.load(s, d, "embeddings"))
  def pqMSweepRaw(s: SparkSession, d: String): DataFrame =
    Ann.pqMSweepOf(s, Tables.load(s, d, "embeddings"))

  /** cdc_materialize_composite changelog projection (the registered inline
    * shape in SparkEntry), with the loader strategy parameterized:
    * r18 registered = spread the FULL-width lineitem then project
    * (round-robin exchange carries all 16 columns — guide §2.3 "project
    * before the exchange"); candidates = project THEN spread, and serial
    * (no spread — the op is one narrow projection into a groupBy, the
    * pure-hash-agg-consumer profile where the spread exchange costs more
    * than the per-row work it parallelizes). */
  private def compositeOf(li: DataFrame): DataFrame = {
    import graft.dec
    val cl = li.select(
      when(col("l_returnflag") === "R", "d").otherwise("u").as("op"),
      col("l_suppkey"), col("l_partkey"),
      col("l_shipdate"), col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
      dec(col("l_extendedprice"), 18, 2).cast("double").as("price"))
    Materialize.latestSnapshotKeyed(cl,
        keyCols = Seq("l_suppkey", "l_partkey"),
        orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber"),
        opCol = "op",
        payloadCols = Seq("price"))
      .orderBy("l_suppkey", "l_partkey")
  }
  private val compositeCols = Seq(
    "l_returnflag", "l_suppkey", "l_partkey", "l_shipdate", "l_orderkey",
    "l_linenumber", "l_extendedprice")
  def compositeRaw(s: SparkSession, d: String): DataFrame =
    compositeOf(Tables.spread(Tables.load(s, d, "lineitem")))
  def compositeProjected(s: SparkSession, d: String): DataFrame =
    compositeOf(Tables.spread(
      Tables.load(s, d, "lineitem").select(compositeCols.map(col): _*)))
  def compositeSerial(s: SparkSession, d: String): DataFrame =
    compositeOf(Tables.load(s, d, "lineitem").select(compositeCols.map(col): _*))

  /** kmeans_converge with carry-forward fusion: each round's pinned
    * assignment carries old_label and each pinned centroid table carries
    * c_prev, so the per-round moved/shift stats become plain aggregations
    * over the pinned tables instead of checkpoint ⋈ checkpoint SMJs in
    * the final stats query (guide §2.4: two ops keyed the same way share
    * one pass). Equivalence: the moved join (old ⋈ new on vec_id, both
    * total over the same vec set) and the shift join (cents_old ⋈
    * cents_new on (label, pos); new labels ⊆ old labels since assignment
    * targets the old centroid set, so the inner join keeps every new
    * row) are relocated verbatim into the pin, not changed. */
  def kmeansConvergeFused(s: SparkSession, d: String, rounds: Int = 3): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.GraftFunctions
    val Q = 1099511627776.0
    val emb = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    val long = emb
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos"), col("x").cast("double").as("x"))
      .localCheckpoint(true)
    def qMean(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
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
    var assign = emb.select(col("vec_id"), col("label"))
    var cents = centroidsOf(assign).localCheckpoint(true)
    val stats = Seq.newBuilder[DataFrame]
    for (r <- 1 to rounds) {
      val newAssign = assignTo(cents.select("label", "pos", "c"))
        .join(assign.select(col("vec_id"), col("label").as("old_label")), "vec_id")
        .localCheckpoint(true)
      val newCents = centroidsOf(newAssign.select("vec_id", "label"))
        .join(cents.select(col("label"), col("pos"), col("c").as("c_prev")), Seq("label", "pos"))
        .localCheckpoint(true)
      val moved = newAssign
        .agg(sum(when(col("old_label") =!= col("label"), 1L).otherwise(0L)).as("n_moved"))
      val shift = newCents
        .withColumn("sq",
          floor((col("c") - col("c_prev")) * (col("c") - col("c_prev")) * Q)
            .cast("long").cast(DecimalType(38, 0)))
        .groupBy("label").agg(sqrt(sum(col("sq")).cast("double") / Q).as("s"))
        .agg(max(col("s")).as("max_shift"))
      val active = newAssign.agg(countDistinct(col("label")).as("n_active_labels"))
      stats += moved.crossJoin(broadcast(shift)).crossJoin(broadcast(active))
        .select(lit(r).cast("long").as("round"), col("n_moved"), col("max_shift"),
          col("n_active_labels"), (col("n_moved") === 0L).as("converged"))
      assign = newAssign.select(col("vec_id"), col("label"))
      cents = newCents
    }
    stats.result().reduce(_ unionAll _).orderBy("round")
  }

  /** q_mad_approx_gate r18 shape: the exact side re-computed inside the
    * gate (vs the r19 memoized shared build). */
  def madGateUnshared(s: SparkSession, d: String, tol: Double = 0.02): DataFrame = {
    val e = graft.analytics.Relational.madByFlag(s, d)
      .select(col("l_returnflag"), col("n_rows"),
        col("median_price").as("e_med"), col("mad").as("e_mad"))
    val a = graft.analytics.Sketches.approxMad(s, d)
      .select(col("l_returnflag"), col("n_rows").as("a_n"),
        col("median_price").as("a_med"), col("mad").as("a_mad"))
    def within(x: org.apache.spark.sql.Column, ex: org.apache.spark.sql.Column) =
      (abs(x - ex) / greatest(abs(ex), lit(1.0)) < tol).cast("long")
    e.join(a, "l_returnflag")
      .select(col("l_returnflag"), col("n_rows"),
        (col("a_n") === col("n_rows")).cast("long").as("n_equal"),
        within(col("a_med"), col("e_med")).as("median_within_2pct"),
        within(col("a_mad"), col("e_mad")).as("mad_within_2pct"))
      .orderBy("l_returnflag")
  }
}

object R19Variants2 {
  import graft.dedup.Dedup
  import graft.text.TextFunctions.normText
  import org.apache.spark.sql.expressions.Window

  /** q_repeat_purchase_rate with ONE data exchange (guide §2.4 "two
    * operations keyed the same way can share one exchange"): an explicit
    * hash repartition on l_partkey before the 3-column distinct — the
    * distinct, the (part, cust) rollup and the per-part rollup are all
    * clustered on supersets of {l_partkey}, so hash(l_partkey) satisfies
    * every one of them and the r18 plan's three exchanges collapse to
    * one. l_partkey is near-uniform (|parts| ≈ |lineitem|/30).
    * Equivalence: repartition changes row placement only; distinct and
    * the counts are set/multiset functions of the same input. */
  def repeatPurchaseOneEx(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val li = Tables.load(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.load(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
    val perBuyer = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), col("o_custkey"), col("o_orderkey"))
      .repartition(col("l_partkey"))
      .distinct()
      .groupBy("l_partkey", "o_custkey")
      .agg(count(lit(1)).as("n_orders"))
    perBuyer.groupBy("l_partkey")
      .agg(count(lit(1)).as("n_buyers"),
        sum(when(col("n_orders") > 1L, 1L).otherwise(0L)).as("n_repeat_buyers"),
        sum(col("n_orders")).as("n_orders"))
      .where(col("n_buyers") >= 5L)
      .select(col("l_partkey"), col("n_buyers"), col("n_repeat_buyers"),
        (col("n_repeat_buyers").cast("double") / col("n_buyers").cast("double"))
          .as("repeat_rate"),
        (col("n_orders").cast("double") / col("n_buyers").cast("double"))
          .as("orders_per_buyer"))
      .orderBy(col("repeat_rate").desc, col("l_partkey"))
      .limit(k)
  }

  /** text_unigram_surprisal with the token fan-out repartitioned on TERM
    * before the (doc, term) rollup: hash(term) satisfies the (doc_id,
    * term) aggregation (subset rule) AND the per-term window, so the
    * plan's separate (doc,term)-exchange and term-exchange collapse into
    * one. */
  def surprisalTermPart(s: SparkSession, d: String): DataFrame = {
    val pows = array((0 to 40).map(kk => lit(1L << kk)): _*)
    val toks = Tables.load(s, d, "documents")
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 1)
    val docTypes = toks.repartition(col("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cdoc"))
    val n = Tables.load(s, d, "documents")
      .select(size(filter(split(normText(col("text")), " "),
        w => length(w) >= 1)).cast("long").as("k"))
      .agg(sum(col("k")).as("n_total"))
    docTypes
      .withColumn("c", sum(col("cdoc")).over(Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .withColumn("maxp", expr("n_total DIV c"))
      .withColumn("bits",
        (size(filter(pows, p => p <= col("maxp"))) - 1).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("cdoc")).as("n_tokens"), sum(col("cdoc") * col("bits")).as("sum_bits"),
        max("bits").as("max_bits"))
      .select(col("doc_id"), col("n_tokens"), col("sum_bits"), col("max_bits"),
        (col("sum_bits").cast("double") / col("n_tokens").cast("double")).as("mean_bits"))
      .orderBy("doc_id")
  }

  /** text_hapax r18 shape (instance-level join) for A/B. */
  def hapaxRaw(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.load(s, d, "documents")
      .select(col("source"), col("doc_id"),
        explode(split(normText(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 1)
    val cnt = toks.groupBy("term").agg(count(lit(1)).as("c"))
    toks.join(cnt, "term")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_tokens"),
        countDistinct(col("term")).as("n_vocab"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_tokens"), col("n_vocab"), col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_tokens").cast("double"))
          .as("hapax_token_share"),
        (col("n_hapax").cast("double") / col("n_vocab").cast("double"))
          .as("hapax_vocab_share"))
      .orderBy("source")
  }

  /** q_rfm r18 shape (perCust NOT pinned) for A/B. */
  def rfmRaw(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    import graft.dec
    val orders = Tables.load(s, d, "orders")
    val horizon = orders.agg(max(col("o_orderdate")).as("max_date"))
    val perCust = orders
      .groupBy("o_custkey")
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(dec(col("o_totalprice"))).cast(DecimalType(28, 2)).as("monetary_d"))
      .crossJoin(broadcast(horizon))
      .select(
        col("o_custkey"),
        datediff(col("max_date").cast("date"), col("last_order").cast("date"))
          .cast("long").as("recency"),
        col("frequency"),
        col("monetary_d"),
        col("monetary_d").cast("double").as("monetary"))
    val qs = perCust.agg(
      expr("percentile(recency, 0.25)").as("r1"),
      expr("percentile(recency, 0.5)").as("r2"),
      expr("percentile(recency, 0.75)").as("r3"),
      expr("percentile(frequency, 0.25)").as("f1"),
      expr("percentile(frequency, 0.5)").as("f2"),
      expr("percentile(frequency, 0.75)").as("f3"),
      expr("percentile(monetary, 0.25)").as("m1"),
      expr("percentile(monetary, 0.5)").as("m2"),
      expr("percentile(monetary, 0.75)").as("m3"))
    def score(x: org.apache.spark.sql.Column, q1: String, q2: String, q3: String) =
      when(x <= col(q1), 1L).when(x <= col(q2), 2L).when(x <= col(q3), 3L).otherwise(4L)
    perCust.crossJoin(broadcast(qs))
      .select(
        score(col("recency").cast("double"), "r1", "r2", "r3").as("r_score"),
        score(col("frequency").cast("double"), "f1", "f2", "f3").as("f_score"),
        score(col("monetary"), "m1", "m2", "m3").as("m_score"),
        col("monetary_d"))
      .groupBy("r_score", "f_score", "m_score")
      .agg(
        count(lit(1)).as("n_customers"),
        sum(col("monetary_d")).cast(DecimalType(28, 2)).cast("double").as("segment_spend"))
      .orderBy("r_score", "f_score", "m_score")
  }

  /** text_source_divergence r18 shape (cf NOT pinned) for A/B. */
  def sourceDivergenceRaw(s: SparkSession, d: String): DataFrame = {
    val Q = 1099511627776.0
    val cf = Tables.load(s, d, "documents")
      .select(col("source"), explode(split(normText(col("text")), " ")).as("term"))
      .where(length(col("term")) >= 1)
      .groupBy("source", "term")
      .agg(count(lit(1)).as("cf"))
    val totals = cf.groupBy("source").agg(sum(col("cf")).cast("long").as("n"))
    val p = cf.join(broadcast(totals), "source")
      .select(col("source"), col("term"),
        (col("cf").cast("double") / col("n").cast("double")).as("p"))
    val a = p.select(col("source").as("source_a"), col("term"), col("p").as("pa"))
    val b = p.select(col("source").as("source_b"), col("term"), col("p").as("pb"))
    a.join(b, "term")
      .where(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        floor((abs(col("pa") - col("pb")) - col("pa") - col("pb")) * Q)
          .cast("long").cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("dq"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_common_terms"), sum(col("dq")).as("sq"))
      .select(col("source_a"), col("source_b"), col("n_common_terms"),
        ((col("sq").cast("double") / Q + 2.0) * 0.5).as("tv_distance"))
      .orderBy("source_a", "source_b")
  }

  /** ann_index_menu r18 shape (exact top-k NOT pinned) for A/B. */
  def indexMenuRaw(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    import graft.similarity.Ann
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.load(s, d, "embeddings")
    val nRow = emb.agg(count(lit(1)).as("n_vectors"))
    val q = emb.where(col("vec_id") === 0).limit(1).select(col("embedding").as("qe"))
    val exact = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), expr("graft_l2sq(embedding, qe)").as("d"))
      .orderBy(col("d").asc, col("vec_id")).limit(k).select("vec_id")
    def recallOf(topk: DataFrame, name: String) =
      topk.select("vec_id").join(exact, "vec_id")
        .agg((count(lit(1)).cast("double") / lit(k.toDouble)).as(name))
    nRow
      .crossJoin(broadcast(recallOf(Ann.pqTopK(s, d, k), "r_pq")))
      .crossJoin(broadcast(recallOf(Ann.sq8TopK(s, d, k), "r_sq8")))
      .crossJoin(broadcast(recallOf(Ann.ivfpqTopK(s, d, k), "r_ivfpq")))
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

  /** ann_nndescent_round r18 shape (g0 NOT pinned) for A/B. */
  def nndRoundRaw(s: SparkSession, d: String, k: Int = 5): DataFrame = {
    import graft.similarity.Ann
    val emb = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val coded = emb.withColumn("bucket", Ann.signCode(col("embedding")))
    val nv = emb.agg(count(lit(1)).as("nv"))
    val peers = coded.select(col("vec_id").as("nbr"), col("bucket"))
      .withColumn("rnb", row_number().over(
        Window.partitionBy("bucket").orderBy("nbr")))
      .where(col("rnb") <= 32).drop("rnb")
    val bucketEdges = coded.select(col("vec_id"), col("bucket"))
      .join(peers, "bucket")
      .where(col("vec_id") =!= col("nbr"))
      .select(col("vec_id"), col("nbr"))
    val ringEdges = emb.select(col("vec_id"))
      .crossJoin(broadcast(nv))
      .select(col("vec_id"), explode(array(lit(1), lit(2))).as("j"), col("nv"))
      .select(col("vec_id"), ((col("vec_id") + col("j") * 97L) % col("nv")).as("nbr"))
      .where(col("vec_id") =!= col("nbr"))
    graft.functions.GraftFunctions.register(s)
    def cosine(a: String, b: String) = expr(s"graft_cosine($a, $b)")
    val p0 = bucketEdges.union(ringEdges).distinct()
      .join(emb, "vec_id")
      .join(emb.select(col("vec_id").as("nbr"), col("embedding").as("ne")), "nbr")
      .select(col("vec_id"), col("nbr"), cosine("embedding", "ne").as("cos"))
    val w = Window.partitionBy("vec_id").orderBy(col("cos").desc, col("nbr"))
    val g0 = p0.withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
    val nn2 = g0.select(col("vec_id"), col("nbr").as("mid"))
      .join(g0.select(col("vec_id").as("mid"), col("nbr").as("cand")), "mid")
      .where(col("cand") =!= col("vec_id"))
      .select(col("vec_id"), col("cand"))
    val cands = g0.select(col("vec_id"), col("nbr").as("cand"))
      .union(nn2).distinct()
    val scored = cands
      .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
      .join(emb.select(col("vec_id").as("cand"), col("embedding").as("ce")), "cand")
      .select(col("vec_id"), col("cand"), cosine("embedding", "ce").as("cos"))
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

  /** text_bigram_coherence r18 shape (no w1 repartition) for A/B. */
  def bigramRaw(s: SparkSession, d: String): DataFrame = {
    val Q = 1099511627776.0
    val toks = Tables.load(s, d, "documents")
      .select(col("doc_id"), split(normText(col("text")), " ").as("w"))
    val pairs = toks
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("w")) - 1, lit(1))),
        i => struct(element_at(col("w"), i).as("w1"), element_at(col("w"), i + 1).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .where(col("w2").isNotNull)
    val docTypes = pairs.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("cdoc"))
    docTypes
      .withColumn("c12", sum(col("cdoc")).over(Window.partitionBy("w1", "w2")))
      .withColumn("c1", sum(col("cdoc")).over(Window.partitionBy("w1")))
      .withColumn("q", floor(col("c12").cast("double") / col("c1").cast("double") * lit(Q)).cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("cdoc")).as("n_bigrams"), sum(col("cdoc") * col("q")).as("sq"))
      .select(col("doc_id"), col("n_bigrams"),
        ((col("sq").cast("double") / Q) / col("n_bigrams").cast("double")).as("mean_bigram_p"))
      .orderBy("doc_id")
  }

  /** text_cooccurrence with the head-term sliver PINNED (the lake-scale
    * shape the r16 adjudication note itself proposes): the self-join's two
    * sides and the df cap currently re-plan the corpus explode; pinning
    * the ≤vocab-per-doc docTerms table runs it once. */
  def cooccurrencePinned(s: SparkSession, d: String,
      vocab: Int = 20, topK: Int = 30): DataFrame = {
    val top = graft.text.TextFunctions.termDocFreq(s, d, vocab).select(col("term"))
    val docTerms = Tables.pin(Tables.load(s, d, "documents")
      .select(col("doc_id"), explode(array_distinct(split(normText(col("text")), " "))).as("term"))
      .where(length(col("term")) >= 3)
      .join(broadcast(top), "term"))
    val a = docTerms.select(col("doc_id"), col("term").as("term_a"))
    val b = docTerms.select(col("doc_id"), col("term").as("term_b"))
    a.join(b, Seq("doc_id"))
      .where(col("term_a") < col("term_b"))
      .groupBy("term_a", "term_b")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("term_a"), col("term_b"))
      .limit(topK)
  }

  // r18 shapes of the wave-2 dedup changes, for interleaved A/B
  def blockingHealthRaw(s: SparkSession, d: String): DataFrame =
    Dedup.blockingHealthImpl(s, d, pinDigests = false)
  def clusterLssRaw(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.verifiedPairs(s, d)
      .where(col("jaccard") >= 0.6).select(col("id_a"), col("id_b"))
    Dedup.clusterEdgesLargeStarImpl(pairs, 20, lean = false)
  }
  def substringRaw(s: SparkSession, d: String): DataFrame =
    Dedup.substringDupImpl(s, d, 32, narrowDigest = false)
}

/** Formatted-plan dump for UNREGISTERED A/B variants (PlanDump covers only
  * registered queries): runMain graft.VariantPlan <sfDir> <outPath> <name>. */
object VariantPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath, name) = args.take(3)
    val spark = Tables.localSession("graft-variant-plan",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val fns: Map[String, (SparkSession, String) => DataFrame] = Map(
      "bigram_raw" -> (R19Variants2.bigramRaw _),
      "nndr_raw" -> ((s, d) => R19Variants2.nndRoundRaw(s, d)),
      "divergence_raw" -> (R19Variants2.sourceDivergenceRaw _),
      "hapax_raw" -> (R19Variants2.hapaxRaw _),
      "blocking_raw" -> (R19Variants2.blockingHealthRaw _),
      "substring_raw" -> (R19Variants2.substringRaw _),
      "repeat_raw" -> ((s, d) => graft.analytics.Relational.repeatPurchaseRate(s, d)))
    val plan = fns(name)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[variantplan] wrote $name -> $outPath")
    spark.stop()
  }
}

/** Attribution probe for kmeans_converge: where do its ~3.6 s go — the
  * eager per-round pins (construction-time jobs) or the final stats
  * query? */
object KmeansAttrib {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Tables.localSession("graft-kmeans-attrib",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val builders: Map[String, (SparkSession, String) => DataFrame] = Map(
      "kmeans" -> ((s, d) => Ann.kmeansConverge(s, d)),
      "nndr" -> ((s, d) => Ann.nnDescentRound(s, d)),
      "nndc" -> ((s, d) => Ann.nnDescentConverge(s, d)))
    val chosen = if (args.nonEmpty) args.toSeq else Seq("kmeans")
    (1 to 4).foreach { p =>
      chosen.foreach { name =>
        val t0 = System.nanoTime()
        val df = builders(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"$name pass $p construct(pins) ${(t1 - t0) / 1e9}%.3f  final ${(t2 - t1) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}

/** Interleaved A/B runner (the ProfileAB discipline): each pass times every
  * chosen variant once, suite order fixed, so registered/candidate
  * alternate within one JVM/window. Report = median + min + raws. */
object ProfileR19 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "5").toInt
    val spark = Tables.localSession("graft-profile-r19",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val pairs: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "kmeans_converge_raw" -> (R19Variants.kmeansConvergeRaw _),
      "kmeans_converge_spread" -> ((s, d) => Ann.kmeansConverge(s, d)),
      "kmeans_converge_fused" -> ((s, d) => R19Variants.kmeansConvergeFused(s, d)),
      "kmeans_refine_raw" -> (R19Variants.kmeansRefineRaw _),
      "kmeans_refine_spread" -> ((s, d) => Ann.kmeansRefine(s, d)),
      "nlist_elbow_raw" -> (R19Variants.nlistElbowRaw _),
      "nlist_elbow_spread" -> ((s, d) => Ann.nlistElbow(s, d)),
      "pq_m_sweep_raw" -> (R19Variants.pqMSweepRaw _),
      "pq_m_sweep_spread" -> ((s, d) => Ann.pqMSweep(s, d)),
      "composite_raw" -> (R19Variants.compositeRaw _),
      "composite_projected" -> (R19Variants.compositeProjected _),
      "composite_serial" -> (R19Variants.compositeSerial _),
      "mad_gate_unshared" -> ((s, d) => R19Variants.madGateUnshared(s, d)),
      "mad_gate_shared" -> ((s, d) => graft.analytics.SketchGates.madGate(s, d)),
      "repeat_raw" -> ((s, d) => graft.analytics.Relational.repeatPurchaseRate(s, d)),
      "repeat_onex" -> ((s, d) => R19Variants2.repeatPurchaseOneEx(s, d)),
      "surprisal_raw" -> ((s, d) => graft.text.TextFunctions.unigramSurprisal(s, d)),
      "surprisal_termpart" -> ((s, d) => R19Variants2.surprisalTermPart(s, d)),
      "blocking_raw" -> (R19Variants2.blockingHealthRaw _),
      "blocking_pinned" -> ((s, d) => graft.dedup.Dedup.blockingHealth(s, d)),
      "cluster_lss_raw" -> (R19Variants2.clusterLssRaw _),
      "cluster_lss_lean" -> ((s, d) => graft.dedup.Dedup.clusterLargeStar(s, d)),
      "substring_raw" -> (R19Variants2.substringRaw _),
      "substring_narrow" -> ((s, d) => graft.dedup.Dedup.substringDup(s, d)),
      "nndr_raw" -> ((s, d) => R19Variants2.nndRoundRaw(s, d)),
      "nndr_pinned" -> ((s, d) => Ann.nnDescentRound(s, d)),
      "bigram_raw" -> (R19Variants2.bigramRaw _),
      "bigram_w1part" -> ((s, d) => graft.text.TextFunctions.bigramCoherence(s, d)),
      "cooc_selfjoin" -> ((s, d) => graft.text.TextFunctions.cooccurrence(s, d)),
      "cooc_pinned" -> ((s, d) => R19Variants2.cooccurrencePinned(s, d)),
      "divergence_raw" -> (R19Variants2.sourceDivergenceRaw _),
      "divergence_pinned" -> ((s, d) => graft.text.TextFunctions.sourceDivergence(s, d)),
      "index_menu_raw" -> ((s, d) => R19Variants2.indexMenuRaw(s, d)),
      "index_menu_pinned" -> ((s, d) => Ann.indexMenu(s, d)),
      "rfm_raw" -> (R19Variants2.rfmRaw _),
      "rfm_pinned" -> ((s, d) => graft.analytics.Relational.rfm(s, d)),
      "hapax_raw" -> (R19Variants2.hapaxRaw _),
      "hapax_onepass" -> ((s, d) => graft.text.TextFunctions.hapax(s, d)))
    val chosen = if (args.nonEmpty) pairs.filter(p => args.contains(p._1)) else pairs
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    (1 to passes).foreach { _ =>
      chosen.foreach { case (n, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(n) = times(n) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    chosen.foreach { case (n, _) =>
      val ts = times(n).sorted
      println(f"$n%-26s median ${ts(ts.length / 2)}%.3f  min ${ts.head}%.3f  " +
        times(n).map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
