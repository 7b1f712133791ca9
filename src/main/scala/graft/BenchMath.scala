package graft

/** The pure logic behind [[Bench]]'s instrument, extracted so the pieces
  * the per-round artifacts depend on — frozen-baseline parsing, the
  * retime-median statistic, the distinct-shuffle exchange count — carry
  * unit coverage (BenchMathSpec) instead of living untested inside a
  * main that only ever runs against 368 real queries. */
object BenchMath {

  /** Parse a frozen-baseline file: flat JSON of shape
    * `{..., "queries": {"name": num, ...}}`. Regex-based by design (no
    * JSON library dependency): finds the object after the LITERAL
    * `"queries"` key (quote-delimited, so a `"n_queries"` metadata field
    * or the word queries inside a comment string does not match) and
    * reads name→number pairs from it. Missing/garbled file → empty. */
  def parseBaseline(txt: String): Map[String, Double] =
    try {
      val key = txt.indexOf("\"queries\"")
      // guard: indexOf('{', -1) would silently restart at 0 and read
      // stray name:number pairs out of a file with NO queries key
      if (key < 0) return Map.empty
      val open = txt.indexOf('{', key)
      val body = txt.substring(open, txt.indexOf('}', open) + 1)
      "\"([A-Za-z0-9_]+)\":\\s*([0-9]+\\.?[0-9]*)".r.findAllMatchIn(body)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case _: Throwable => Map.empty }

  def readBaseline(path: String): Map[String, Double] =
    try parseBaseline(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => Map.empty }

  /** Median of the non-NaN passes (upper median, the Bench convention
    * since r1 — for 3 passes this is the true median). None if all
    * passes failed. */
  def median(passes: Seq[Double]): Option[Double] = {
    val ok = passes.filterNot(_.isNaN).sorted
    if (ok.isEmpty) None else Some(ok(ok.length / 2))
  }

  /** The r17 retime statistic: when a bounded end-of-run retime exists,
    * recompute the median over passes+retime and keep it only when
    * CLEANER (lower) — a retime can repair a load-inflated median but
    * never worsen a clean one. */
  def medianWithRetime(passes: Seq[Double], retime: Option[Double]): Option[Double] =
    median(passes).map { med =>
      retime.filterNot(_.isNaN)
        .flatMap(r => median(passes :+ r)).filter(_ < med).getOrElse(med)
    }

  /** Whether a query's pass spread warrants the one bounded retime:
    * at least one pass grossly off (max/min > 3) AND the spread is
    * absolute-material (max − min > 0.3 s). Needs ≥2 successful passes
    * — a single pass has no spread to judge. */
  def retimeWorthy(passes: Seq[Double]): Boolean = {
    val ok = passes.filterNot(_.isNaN)
    ok.size >= 2 && ok.max / math.max(ok.min, 1e-9) > 3.0 && ok.max - ok.min > 0.3
  }

  /** Operator family of a registry query name: the prefix before the
    * first underscore, folding the relational variants (`q1_agg`,
    * `q10_returns`, `q_mad`, …) into one `q` family. */
  def familyOf(name: String): String = {
    val p = name.takeWhile(_ != '_')
    if (p.matches("q\\d*")) "q" else p
  }

  /** Per-family common-subset ratios vs a frozen baseline (r17 verdict
    * item 3): for each family, sum of this run's medians over the
    * family's frozen subset ÷ the frozen sum, plus the subset size.
    * The per-query watch bar (1.45× + 0.2 s) cannot see a family-wide
    * creep of a few percent per query (r17 clean window: text 1.16,
    * pipe 1.11 — computed only when a judge re-derived them); emitting
    * these per round gives the creep a time series. Families with no
    * frozen queries are absent. */
  def familyRatios(results: Map[String, Double], frozen: Map[String, Double])
      : Map[String, (Double, Int)] =
    frozen.keySet.intersect(results.keySet).groupBy(familyOf).map { case (fam, qs) =>
      fam -> (qs.toSeq.map(results).sum / qs.toSeq.map(frozen).sum, qs.size)
    }

  /** Watch-adjudication pair (frozen median, ambient class ratio) for one
    * query — class-matched AND epoch-matched (r16 verdict item 1). A
    * multi-stage (3+-shuffle) query is adjudicated against its r16-epoch
    * freeze with the r16-frozen multi-stage sentinel ratio. When a
    * multi-stage query has NO same-epoch freeze entry (or the multi
    * ratio itself is absent), dividing its r12/r14-epoch frozen median
    * by the r16-epoch multi ratio would re-create exactly the
    * cross-epoch mismatch this design retired (ADVICE r17) — so it
    * falls back to the single-stage pair: its own addendum freeze with
    * the r12-referenced single-stage ratio. A class approximation,
    * never an epoch mismatch. None → no adjudication for this query. */
  def watchPair(isMulti: Boolean, multiFreeze: Option[Double],
                frozen: Option[Double], singleRatio: Option[Double],
                multiRatio: Option[Double]): Option[(Double, Double)] =
    if (isMulti && multiFreeze.isDefined && multiRatio.isDefined)
      Some((multiFreeze.get, multiRatio.get))
    else frozen.zip(singleRatio)

  /** Count DISTINCT shuffle Exchange nodes in a FORMATTED explain: node
    * ids dedupe the re-prints a cached InMemoryRelation gets (once per
    * referencing scan), and the preceding-letter guard drops
    * BroadcastExchange / ReusedExchange, which move no shuffle data.
    * (The r16 raw substring count read dedup_pair_degree at 67 where
    * the plan executes 7 distinct shuffles.) */
  def distinctShuffleExchanges(formattedPlan: String): Int =
    "(?<![A-Za-z])Exchange \\((\\d+)\\)".r
      .findAllMatchIn(formattedPlan).map(_.group(1)).toSet.size
}
