package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Width policy for exact fixed-point (integer-unit) SUM accumulators.
  *
  * The engine's money/metric sums run on quantized integer terms (cents,
  * 1e-4 units — see SCALE.md "exact money"): BIGINT accumulation is exact
  * and fast, but only while the per-group total stays below 2^63. At
  * 1e-4-unit price terms (~1e9/row) that bounds a group at ~9e9 rows — a
  * 100 TB fact table's biggest groups (~1e11 rows) would overflow: ANSI
  * mode fails the job, ANSI-off wraps SILENTLY. This object makes the
  * width decision a declared, plan-time policy instead of a latent bug.
  */
object FixedPoint {

  /** Headroom guard: choose long only if rows·term < 2^62 (half the space,
    * so a single stray double-magnitude term cannot tip an "in-policy"
    * sum over the edge).
    */
  def longIsSafe(rowsPerGroupBound: Long, termMagnitudeBound: Long): Boolean = {
    require(rowsPerGroupBound > 0 && termMagnitudeBound > 0,
      s"bounds must be positive: rows=$rowsPerGroupBound term=$termMagnitudeBound")
    rowsPerGroupBound <= (Long.MaxValue / 2) / termMagnitudeBound
  }

  /** Exact SUM of an integer-unit column under DECLARED magnitude bounds:
    * BIGINT accumulation while `rows·term` fits comfortably in 63 bits,
    * DECIMAL(38,0) accumulation beyond (exact to 10^38; Spark and DuckDB
    * both sum decimals exactly, and decimal sums stay map-side
    * combinable — the cost is ~2× long arithmetic, paid only when the
    * declared scale requires it).
    *
    * The result type follows the policy (LongType or DecimalType(38,0));
    * callers emitting a fixed schema cast the result explicitly — an
    * overflow in that final cast is then an ANSI error at the seam, never
    * a silent wrap inside the accumulator.
    *
    * ANSI PRECONDITION, enforced: the long path's fail-loudly guarantee
    * on a LYING bound (declared bound too small → overflow) is ANSI
    * overflow checking. With `spark.sql.ansi.enabled=false` the long sum
    * would wrap SILENTLY — the exact latent bug this object exists to
    * eliminate — so choosing the long path under ANSI-off throws here at
    * plan time instead. The decimal path needs no such check (decimal
    * sums can't wrap; they fail or stay exact in either mode).
    */
  def sumExact(c: Column, rowsPerGroupBound: Long,
               termMagnitudeBound: Long): Column =
    if (longIsSafe(rowsPerGroupBound, termMagnitudeBound)) {
      val ansiOn = org.apache.spark.sql.SparkSession.getActiveSession
        .forall(_.conf.get("spark.sql.ansi.enabled", "true").toBoolean)
      require(ansiOn,
        "FixedPoint.sumExact long path requires spark.sql.ansi.enabled=true " +
          "(with ANSI off a lying magnitude bound would wrap silently); " +
          "enable ANSI or declare bounds that select the decimal path")
      sum(c)
    } else sum(c.cast(DecimalType(38, 0)))
}
