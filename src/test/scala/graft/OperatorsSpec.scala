package graft

import graft.analytics.Relational
import graft.dedup.Dedup
import graft.similarity.Ann
import graft.text.TextFunctions
import graft.multimodal.Binary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  import TestSpark.{spark, dir}

  test("q1 pricing summary covers all lineitems under the cutoff") {
    val q1 = Relational.q1Agg(spark, dir).collect()
    assert(q1.nonEmpty)
    val n = q1.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp_ntz")).count()
    assert(n === expected)
  }

  test("rollup grand total equals customer count") {
    val roll = Relational.rollupAgg(spark, dir).collect()
    val grand = roll.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(grand.getAs[Long]("n_customers") === 150)
  }

  test("semi+anti partition the customers") {
    val sa = Relational.semiAnti(spark, dir).collect()
    val total = sa.map(r => r.getAs[Long]("n_with_orders") + r.getAs[Long]("n_without_orders")).sum
    assert(total === 150)
  }

  test("normalized-corpus cache unpersists the old dir when sweeping dirs") {
    import org.apache.spark.storage.StorageLevel
    val a = Dedup.normCorpus(spark, dir)
    assert(a.storageLevel !== StorageLevel.NONE)
    val b = Dedup.normCorpus(spark, "/root/testdata/sf0.01")
    assert(a.storageLevel === StorageLevel.NONE,
      "first dir's cached corpus must be unpersisted when a new dir is admitted")
    assert(b.storageLevel !== StorageLevel.NONE)
    // re-admit the shared test dir so later suites start from the usual state
    Dedup.normCorpus(spark, dir)
    assert(b.storageLevel === StorageLevel.NONE)
  }

  test("exact dedup finds exactly the injected copies") {
    val groups = Dedup.exact(spark, dir).collect()
    val injected = Tables.load(spark, dir, "documents").where(col("doc_id") % 7 === 0).count()
    assert(groups.length === injected)
    assert(groups.forall(_.getAs[Long]("n_copies") === 2L))
    assert(groups.forall(r => r.getAs[Long]("max_id") === r.getAs[Long]("canonical_id") + 1000000L))
  }

  test("chunk duplication histogram counts the injected copy chunks") {
    val hist = Dedup.chunkDupHist(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // corpus = docs ∪ exact copies (×2 chunks) ∪ truncated near-copies:
    // multiplicity 1 dominates, and some chunks must repeat
    assert(hist.contains(1L))
    assert(hist.keys.exists(_ >= 2L), "injected copies must produce repeated chunks")
    // histogram accounts for every chunk exactly once per distinct hash
    assert(hist.values.forall(_ > 0L))
  }

  test("novelty ratios are valid shares and cover every source") {
    val nov = TextFunctions.novelty(spark, dir).collect()
    val sources = Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    assert(nov.length === sources)
    nov.foreach { r =>
      val ratio = r.getAs[Double]("novelty_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_unique") <= r.getAs[Long]("n_shingles"))
    }
  }

  test("minhash-lsh recovers every exact-copy pair at jaccard 1.0") {
    val pairs = Dedup.minhashLsh(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(4)))
    val exactPairs = pairs.filter { case (a, b, _) => a < 1000000L && b == a + 1000000L }
    val injected = Tables.load(spark, dir, "documents").where(col("doc_id") % 7 === 0).count()
    assert(exactPairs.length === injected)
    assert(exactPairs.forall(_._3 === 1.0))
  }

  test("simhash pairs exact copies at hamming 0") {
    val pairs = Dedup.simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exactPairs = pairs.filter { case (a, b, _) => a < 1000000L && b == a + 1000000L }
    assert(exactPairs.nonEmpty)
    assert(exactPairs.forall(_._3 === 0L))
  }

  test("simhash banded recall is exact: blocking finds every pair at hamming <= 6") {
    // the pigeonhole guarantee, checked empirically: brute-force all
    // fingerprint pairs on the small corpus and assert the banded join
    // returned exactly the Hamming <= 6 set (no recall loss from blocking)
    val fps = Dedup.simhashFingerprints(spark, dir).collect()
      .map(r => (r.getLong(0), (1 to 8).map(r.getLong).toArray))
    val expected = (for {
      (ida, fa) <- fps; (idb, fb) <- fps if ida < idb
      h = fa.zip(fb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
      if h <= 6
    } yield (ida, idb, h.toLong)).toSet
    val got = Dedup.simhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "corpus with injected copies must produce near-dup pairs")
  }

  test("semantic incremental admission rejects every injected perturbed copy") {
    val rows = Ann.semanticIncremental(spark, dir).collect()
    assert(rows.nonEmpty)
    // every batch vector is a perturbed near-copy of an index original
    // (cosine >= 0.986 by construction) — none may be admitted
    assert(rows.forall(_.getAs[Long]("admitted") === 0L))
    // and its best index match is the original it was perturbed from
    // (max natural within-bucket cosine ~0.38 is far below threshold)
    assert(rows.forall(r => r.getAs[Long]("match_id") === r.getAs[Long]("vec_id") - 200000L))
  }

  test("threshold curve is monotone and degree profile accounts for every pair") {
    val curve = Dedup.thresholdCurve(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getAs[Long]("n_pairs"), r.getAs[Long]("n_droppable")))
    assert(curve.map(_._1).toSeq === Seq(0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
    // raising the threshold can only shrink what a dedup pass would drop
    assert(curve.sliding(2).forall { case Array(lo, hi) => hi._2 <= lo._2 && hi._3 <= lo._3 })
    val degrees = Dedup.pairDegree(spark, dir).collect()
      .map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_docs")).sum
    val nPairs = Dedup.minhashLsh(spark, dir).count()
    assert(degrees === 2 * nPairs, "sum of degrees must be twice the pair count")
  }

  test("large-star clustering converges on a long chain where 3-round propagation cannot") {
    import spark.implicits._
    // a 40-node chain: diameter 39 — min-label propagation needs ~39
    // rounds; large-star/small-star must collapse it in O(log n)
    val chain = (0L until 39L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val rows = Dedup.clusterEdgesLargeStar(chain, maxRounds = 12).collect()
    assert(rows.length === 40)
    assert(rows.forall(_.getAs[Long]("canonical_id") === 0L),
      "every chain member must label to the component min")
    assert(rows.forall(_.getAs[Long]("cluster_size") === 40L))
    // and two disjoint components never merge
    val two = (Seq((0L, 1L), (1L, 2L)) ++ Seq((10L, 11L), (11L, 12L))).toDF("id_a", "id_b")
    val labels = Dedup.clusterEdgesLargeStar(two, maxRounds = 8).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
    assert(labels.filter(_._1 < 10).values.toSet === Set(0L))
    assert(labels.filter(_._1 >= 10).values.toSet === Set(10L))
  }

  test("large-star clustering matches union-find on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    for (_ <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val edges = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
        .filter { case (a, b) => a != b }
      // in-memory union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map(x => x -> find(x))
        .groupBy(_._2).filter(_._2.size > 1)
        .flatMap { case (_, members) =>
          val canon = members.map(_._1).min
          members.map(m => m._1 -> canon)
        }.toMap
      val got = Dedup.clusterEdgesLargeStar(
        edges.toDF("id_a", "id_b"), maxRounds = 12).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("canonical_id")).toMap
      assert(got === expected)
    }
  }

  test("ngram contamination flags benchmark docs with injected train copies") {
    val rows = Dedup.contaminationNgram(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_flagged_train"), r.getAs[Long]("max_shared")))
      .toMap
    // every benchmark doc appears exactly once, flagged or not
    val nBench = Dedup.corpus(spark, dir)
      .where(col("doc_id") % 50 === 0 && col("doc_id") < 1000000L).count()
    assert(rows.size.toLong === nBench)
    // a benchmark doc with an injected exact copy (id%7==0 → +1M twin in
    // the train side) must be flagged with a substantial gram overlap
    val withCopies = rows.filter { case (id, _) => id % 7 == 0 }
    assert(withCopies.nonEmpty)
    withCopies.foreach { case (id, (flagged, shared)) =>
      assert(flagged >= 1L, s"bench doc $id has an exact train copy but was not flagged")
      assert(shared >= 3L)
    }
  }

  test("kmeans refinement conserves the corpus and moves centroids") {
    val rows = Ann.kmeansRefine(spark, dir).collect()
    val before = rows.map(_.getAs[Long]("n_before")).sum
    val after = rows.map(_.getAs[Long]("n_after")).sum
    assert(before === after, "reassignment must conserve the vector population")
    assert(rows.forall(_.getAs[Double]("centroid_shift") >= 0.0))
  }

  test("embedding near-dup finds the injected vector copies at cosine ~1") {
    val pairs = Ann.embeddingDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val injected = Tables.load(spark, dir, "embeddings").where(col("vec_id") % 11 === 0).count()
    val copies = pairs.filter { case (a, b, _) => b == a + 100000L }
    assert(copies.length === injected)
    assert(copies.forall(_._3 >= 0.999999))
  }

  test("brute-force ANN never ranks the query against itself") {
    val top = Ann.bruteForceTopK(spark, dir).collect()
    assert(top.forall(_.getLong(0) !== 0L),
      "a guaranteed cosine-1.0 self-match would waste a result slot")
    val cosines = top.map(_.getDouble(1))
    assert(cosines.sameElements(cosines.sortBy(-_)))
  }

  test("LSH ANN searches the query's bucket without the query itself") {
    val top = Ann.lshTopK(spark, dir).collect()
    assert(top.forall(_.getLong(0) !== 0L))
  }

  test("IVF ANN scores only the probed partitions, properly ranked") {
    val top = Ann.ivfTopK(spark, dir).collect()
    assert(top.nonEmpty)
    assert(top.map(_.getInt(1)).distinct.length <= 2) // at most 2 probed labels
    val cosines = top.map(_.getDouble(2))
    assert(cosines.sameElements(cosines.sortBy(-(_: Double))))
  }

  test("text metrics are internally consistent") {
    val t = TextFunctions.tokens(spark, dir).collect()
    assert(t.forall(r => r.getAs[Long]("ws_tokens") > 0))
    assert(t.forall(r => r.getAs[Long]("bpe_tokens") >= r.getAs[Long]("ws_tokens")))
    val q = TextFunctions.quality(spark, dir).collect()
    assert(q.forall(r => r.getAs[Double]("stopword_ratio") >= 0 && r.getAs[Double]("stopword_ratio") <= 1))
    val l = TextFunctions.langId(spark, dir).collect()
    assert(l.forall(r => Set("en", "es", "de", "fr").contains(r.getAs[String]("pred_lang"))))
  }

  test("frame sampling takes every 2nd frame of the parsed clip, dims from the decoded JPEGs") {
    import graft.multimodal.Video
    val frames = Video.frameSample(spark, dir)
      .groupBy("doc_id").count()
    val clips = Video.videoDecode(spark, dir).select("doc_id", "n_frames", "width", "height")
    // every-2nd-frame sampling of an n-frame clip yields ceil(n/2) frames
    val joined = frames.join(clips, "doc_id")
      .where(col("count") =!= expr("(n_frames + 1) div 2"))
    assert(joined.count() === 0)
    // the MJPEG leg's decoded dimensions must agree with the DIB leg's headers
    val dims = Video.frameSample(spark, dir).join(clips.withColumnRenamed("width", "w")
      .withColumnRenamed("height", "h"), "doc_id")
      .where(col("width") =!= col("w") || col("height") =!= col("h"))
    assert(dims.count() === 0)
  }

  test("semantic dedup drops exactly the injected perturbed copies") {
    val drops = Ann.semanticDedup(spark, dir).collect()
    val injected = Tables.load(spark, dir, "embeddings").where(col("vec_id") % 7 === 0).count()
    assert(drops.length === injected)
    drops.foreach { r =>
      val dropId = r.getAs[Long]("drop_id")
      assert(dropId >= 200000L, "only perturbed copies may be dropped")
      assert(r.getAs[Long]("keeper_id") === dropId - 200000L,
        "the keeper must be the copy's own original")
      assert(r.getAs[Double]("max_cosine") >= 0.95 && r.getAs[Double]("max_cosine") < 1.0)
    }
  }

  test("keep-best picks the max-quality member of every dup cluster") {
    val kept = Dedup.keepBest(spark, dir).collect()
    assert(kept.nonEmpty)
    val members = Dedup.cluster(spark, dir)
    val scores = graft.text.TextFunctions.qualityScore(Dedup.corpus(spark, dir))
    val best = members.join(scores, "doc_id").collect()
      .groupBy(_.getAs[Long]("canonical_id"))
      .map { case (cid, rs) =>
        cid -> rs.map(r => (-r.getAs[Double]("quality_score"), r.getAs[Long]("doc_id"))).min._2
      }
    assert(kept.length === best.size)
    kept.foreach { r =>
      assert(r.getAs[Long]("kept_doc") === best(r.getAs[Long]("canonical_id")))
      assert(r.getAs[Long]("n_dropped") === r.getAs[Long]("n_members") - 1L)
    }
  }

  test("repetition fractions are valid shares and consistent per doc") {
    val rep = TextFunctions.repetition(spark, dir).collect()
    assert(rep.length === Tables.load(spark, dir, "documents").count())
    rep.foreach { r =>
      assert(r.getAs[Long]("n_distinct_words") <= r.getAs[Long]("n_words"))
      val share = r.getAs[Double]("top_word_share")
      assert(share > 0.0 && share <= 1.0)
      Seq("dup_word_frac", "dup_gram_frac").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v < 1.0)
      }
    }
  }

  test("tfidf yields top-3 distinctive non-stopword terms per source") {
    val rows = TextFunctions.tfidf(spark, dir).collect()
    val sources = Tables.load(spark, dir, "documents").select("source").distinct().count()
    assert(rows.length === sources * 3)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(Array(1L, 2L, 3L)))
      val scores = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
      assert(scores.sameElements(scores.sortBy(-_)), "scores must be rank-ordered")
    }
    assert(rows.forall(r => !TextFunctions.stopwords.contains(r.getAs[String]("term"))))
  }

  test("domain mix shares sum to 1 and weights are consistent ratios") {
    val mix = TextFunctions.domainMix(spark, dir).collect()
    assert(mix.nonEmpty)
    assert(math.abs(mix.map(_.getAs[Double]("current_share")).sum - 1.0) < 1e-9)
    assert(math.abs(mix.map(_.getAs[Double]("target_share")).sum - 1.0) < 1e-9)
    mix.foreach { r =>
      val expected = r.getAs[Double]("target_share") / r.getAs[Double]("current_share")
      assert(math.abs(r.getAs[Double]("mix_weight") - expected) < 1e-12)
    }
  }

  test("epochs plan repeats exactly the budget shortfall per source") {
    val plan = TextFunctions.epochsPlan(spark, dir).collect()
    assert(plan.nonEmpty)
    plan.foreach { r =>
      val total = r.getAs[Long]("total_tokens")
      val alloc = r.getAs[Long]("alloc_tokens")
      val epochs = r.getAs[Long]("epochs")
      assert(epochs >= 1L)
      assert(epochs === (alloc + total - 1L) / total)
      assert(r.getAs[Long]("repeated_tokens") === math.max(0L, alloc - total))
      val frac = r.getAs[Double]("final_pass_frac")
      assert(frac > 0.0 && frac <= 1.0)
      if (epochs === 1L) assert(r.getAs[Long]("repeated_tokens") === 0L)
    }
  }

  test("curriculum schedule covers the corpus best-quality-first") {
    val sched = TextFunctions.curriculum(spark, dir).collect()
    assert(sched.length === 10)
    assert(sched.map(_.getAs[Long]("phase")).sameElements(1L to 10L))
    val deciles = sched.sortBy(_.getAs[Long]("phase")).map(_.getAs[Long]("decile"))
    assert(deciles.sameElements(deciles.sorted.reverse), "phase 1 must be the top decile")
    assert(sched.map(_.getAs[Long]("n_docs")).sum ===
      Tables.load(spark, dir, "documents").count())
    val shares = sched.sortBy(_.getAs[Long]("phase")).map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b })
    assert(math.abs(shares.last - 1.0) < 1e-12)
  }

  test("probe sweep recall is monotone in the probe count") {
    val rows = Ann.probeSweep(spark, dir).collect().sortBy(_.getAs[Long]("n_probes"))
    assert(rows.map(_.getAs[Long]("n_probes")).sameElements(Array(1L, 3L, 5L, 9L)))
    val common = rows.map(_.getAs[Long]("n_common"))
    assert(common.zip(common.tail).forall { case (a, b) => a <= b },
      "more probes can only add candidates, never lose them")
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_at_k") === r.getAs[Long]("n_common").toDouble / 10.0)
      assert(r.getAs[Long]("n_returned") <= 10L)
    }
  }

  test("corr/OLS moments are consistent and bounded") {
    val rows = Relational.corrOls(spark, dir).collect()
    assert(rows.map(_.getAs[String]("l_returnflag")).toSet === Set("A", "N", "R"))
    rows.foreach { r =>
      val corr = r.getAs[Double]("corr_qty_price")
      assert(corr >= -1.0 && corr <= 1.0)
      // slope and corr must agree in sign (same covariance numerator)
      assert(corr.sign === r.getAs[Double]("ols_slope").sign)
    }
  }

  test("MAD is positive and below the median for this distribution") {
    val rows = Relational.madByFlag(spark, dir).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") > 0.0)
      assert(r.getAs[Double]("rel_mad") ===
        r.getAs[Double]("mad") / r.getAs[Double]("median_price"))
    }
  }

  test("PQ ADC top-k sorts ascending and selects closer-than-average vectors") {
    val pq = Ann.pqTopK(spark, dir, k = 10).collect()
    assert(pq.length === 10)
    val dists = pq.map(_.getAs[Double]("adc_dist"))
    assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    assert(dists.forall(_ >= 0.0))
    // 16 codes is a coarse quantizer, so exact-top-k recall is not a
    // stable contract on unclustered synthetic data — the honest floor is
    // that PQ's picks beat the corpus average in EXACT L2 distance.
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
    val l2 = aggregate(
      transform(sequence(lit(1), lit(64)), i => {
        val d = element_at(col("embedding"), i).cast("double") -
          element_at(col("qe"), i).cast("double")
        d * d
      }), lit(0.0), (acc, x) => acc + x)
    val exact = emb.where(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .select(col("vec_id"), l2.as("l2")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("l2")).toMap
    val pqIds = pq.map(_.getAs[Long]("vec_id"))
    val pqMean = pqIds.map(exact).sum / pqIds.length
    val allMean = exact.values.sum / exact.size
    assert(pqMean < allMean,
      s"PQ selection (mean L2 $pqMean) must beat the corpus average ($allMean)")
  }

  test("incremental dedup rejects exact copies against the index") {
    val rows = Dedup.incremental(spark, dir).collect()
    val nNew = Dedup.corpus(spark, dir).where(col("doc_id") >= 1000000L).count()
    assert(rows.length === nNew)
    val exactCopies = rows.filter(r =>
      r.getAs[Long]("doc_id") >= 1000000L && r.getAs[Long]("doc_id") < 2000000L)
    assert(exactCopies.nonEmpty)
    exactCopies.foreach { r =>
      assert(r.getAs[Double]("jaccard") === 1.0)
      assert(r.getAs[Long]("admitted") === 0L)
    }
    // verdict is total: every new doc gets exactly one row, 0/1 admitted
    assert(rows.forall(r => Set(0L, 1L)(r.getAs[Long]("admitted"))))
  }

  test("rarity ratios are bounded and df-consistent") {
    val rows = TextFunctions.rarity(spark, dir).collect()
    assert(rows.length === Tables.load(spark, dir, "documents").count())
    rows.foreach { r =>
      val ratio = r.getAs[Double]("rare_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_rare") <= r.getAs[Long]("n_terms"))
      // every term occurs in at least this document
      assert(r.getAs[Double]("mean_df") >= 1.0)
    }
  }

  test("bigram coherence probabilities are bounded and positionally complete") {
    val rows = TextFunctions.bigramCoherence(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p = r.getAs[Double]("mean_bigram_p")
      // quantization floors each addend, so 0 < p ≤ 1 with tiny downward bias
      assert(p > 0.0 && p <= 1.0)
    }
    // every bigram position of a sampled doc is scored: n_bigrams = words-1
    val doc0Words = Tables.load(spark, dir, "documents").where(col("doc_id") === 0)
      .select(split(lower(col("text")), "\\s+")).collect()(0).getSeq[String](0).length
    val doc0 = rows.find(_.getAs[Long]("doc_id") == 0L).get
    assert(doc0.getAs[Long]("n_bigrams") === (doc0Words - 1).toLong)
  }

  test("PQ recall eval compares two full top-k sets") {
    val r = Ann.pqRecall(spark, dir).collect()(0)
    assert(r.getAs[Long]("n_exact") === 10L)
    assert(r.getAs[Long]("n_pq") === 10L)
    val recall = r.getAs[Double]("recall_at_k")
    assert(recall >= 0.0 && recall <= 1.0)
    assert(recall === r.getAs[Long]("n_common").toDouble / 10.0)
  }

  test("BPE pairs: descending counts, two-char pairs, totals bounded by corpus") {
    val rows = TextFunctions.bpePairs(spark, dir).collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getAs[String]("pair").length === 2))
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }

  test("centroid drift: cosine bounded, halves cover every label, bit-deterministic") {
    val rows = Ann.centroidDrift(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[Double]("drift_cosine")
      // zero-mean synthetic vectors give near-zero half-centroids whose
      // direction is noise — the honest reading is LOW cosine; the
      // contract is boundedness, full coverage, and exact determinism
      assert(c >= -1.0 && c <= 1.0 + 1e-12)
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    }
    val again = Ann.centroidDrift(spark, dir).collect()
      .map(r => r.getAs[Long]("label") -> r.getAs[Double]("drift_cosine")).toMap
    rows.foreach { r =>
      assert(again(r.getAs[Long]("label")) === r.getAs[Double]("drift_cosine"),
        "quantized sums must make the score bit-stable across runs")
    }
  }

  test("temperature mix boosts the under-represented and sums to one") {
    val rows = TextFunctions.temperatureMix(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getAs[Double]("sampling_p")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val boost = r.getAs[Double]("boost")
      val share = r.getAs[Double]("natural_share")
      // √-scaling pulls every source toward the mean share: below-average
      // sources gain probability, above-average ones give it up
      val meanShare = 1.0 / rows.length.toDouble
      if (share < meanShare * 0.95) assert(boost > 1.0, s"${r.getString(0)}: $boost")
      if (share > meanShare * 1.05) assert(boost < 1.0, s"${r.getString(0)}: $boost")
    }
  }

  test("image decode round-trips real PNG bytes: decoded stats match an independent pixel loop") {
    val got = Binary.imageDecode(spark, dir).where(col("doc_id") < 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.keySet === Set(0L, 1L, 2L))
    // independent reference: same closed-form pixel function, NO codec —
    // the operator's numbers come from javax.imageio-decoded PNG bytes,
    // so agreement proves a faithful container round trip
    (0L until 3L).foreach { id =>
      val w = (id % 16 + 8).toInt; val h = (id % 13 + 8).toInt; val c = (id % 256).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (x <- 0 until w; y <- 0 until h) {
        sr += (c + 2 * x + 3 * y) % 256
        sg += (5 * x + 7 * y) % 256
        sb += (3 * c + x + 2 * y) % 256
      }
      val r = got(id)
      assert(r.getAs[Int]("width") === w && r.getAs[Int]("height") === h, s"doc $id dims")
      assert(r.getAs[Long]("n_pixels") === w.toLong * h)
      assert((r.getAs[Long]("sum_red"), r.getAs[Long]("sum_green"),
        r.getAs[Long]("sum_blue")) === ((sr, sg, sb)), s"doc $id channel sums")
    }
    // corpus rollup agrees with the per-doc frame it aggregates
    val stats = Binary.imageStats(spark, dir).collect().head
    val perDoc = Binary.imageDecode(spark, dir).collect()
    assert(stats.getAs[Long]("n_images") === perDoc.length.toLong)
    assert(stats.getAs[Long]("total_pixels") === perDoc.map(_.getAs[Long]("n_pixels")).sum)
    assert(stats.getAs[Long]("total_red") === perDoc.map(_.getAs[Long]("sum_red")).sum)
  }

  test("every query has a matching oracle or is explicitly rows-only") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // the approx-sketch twins are the only declared rows-only entries
    // (approx_percentile's rank pick is engine-specific — accuracy
    // contracts vs the exact twins live in SketchesSpec); everything
    // else carries a full DuckDB oracle
    val rowsOnly = Set("q_mad_approx", "cdc_lag_percentiles_approx",
      "emb_dim_quantiles_approx", "cdc_event_size_pcts_approx",
      "cdc_watermark_advise_approx",
      // r15: the CMS/HLL twins (same rows-only + SketchesSpec pattern)
      "cdc_hot_key_share_approx", "text_doc_freq_approx",
      "q_cumulative_uniques_approx")
    assert(SparkEntry.queries.keySet -- rowsOnly === SparkEntry.oracleSql.keySet)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
