package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-agnostic exact summation of doubles — the ONE definition of
  * the quantize-then-sum idiom used by every order-dependent aggregate
  * (MtmEngine 1e-9 pnl units, Analytics/StreamingJobs 1e-6 price units,
  * SignalCompression's closed-form cumulative).
  *
  * Why this shape: floor(x·scale + 0.5) is pure IEEE arithmetic and
  * therefore bit-identical in every engine, unlike a double→DECIMAL cast
  * (Spark rounds the double's shortest decimal representation half-up;
  * DuckDB rounds the exact binary expansion — tie-boundary values
  * diverge, observed live at sf0.1). The DECIMAL(30,0) accumulator keeps
  * the sum exact AND overflow-safe: an int64 accumulator would silently
  * wrap around 2^63 (≈9.2e18 units — reachable by a mega-symbol at
  * 100 TB), while DuckDB's BIGINT sums promote to HUGEINT; both engines'
  * wide accumulators agree exactly.
  */
private[graft] object ExactNum {

  /** floor(x·scale + 0.5) as a DECIMAL(30,0) unit count.
    *
    * Per-row range: |x|·scale must stay below 2^63 — Spark's long-valued
    * `floor` would silently saturate at Long.MaxValue there while the
    * DuckDB oracle's DECIMAL cast raises. A value that large is already
    * corrupt at every supported scale (1e9 units ⇒ |x| ≥ 9.2e9 of a
    * price-normalized ratio), so fail loudly on both engines instead.
    */
  def units(c: Column, scale: Double): Column = {
    val scaled = c * lit(scale) + lit(0.5)
    when(abs(scaled) >= lit(9.223372036854776e18),
      raise_error(concat(
        lit(s"ExactNum.units overflow at scale $scale: "), scaled.cast("string"))))
      .otherwise(floor(scaled))
      .cast("decimal(30,0)")
  }

  /** An exact unit sum back to double — one division at the end. */
  def toDouble(sumUnits: Column, scale: Double): Column =
    sumUnits.cast("double") / lit(scale)

  /** Exact, order-independent, engine-agnostic sum of a double column. */
  def sumExact(c: Column, scale: Double): Column =
    toDouble(sum(units(c, scale)), scale)
}
