import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the graft engine.
  *
  * Decimal convention: every SUM runs over DECIMAL inputs so the result is
  * exact and independent of partial-aggregation order — Spark and the DuckDB
  * oracle then agree bit-for-bit. Ratios are double divisions of those exact
  * decimals (identical operands → identical IEEE results on both engines).
  */
package object graft {
  /** Cast to DECIMAL(p,s) — the oracle SQL mirrors with CAST(x AS DECIMAL(p,s)). */
  def dec(c: Column, p: Int = 12, s: Int = 2): Column = c.cast(DecimalType(p, s))
}
