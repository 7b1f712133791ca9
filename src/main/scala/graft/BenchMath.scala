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
