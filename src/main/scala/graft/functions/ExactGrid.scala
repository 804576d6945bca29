package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-grid emission of integer ratios (OVERFLOW_AUDIT r14).
  *
  * `round(a/b, n)` over two exact integers is build-sensitive in the
  * last ulp: the double division may land a hair off the true ratio,
  * and `round`'s half-up tie behavior then differs between engines
  * (Spark: shortest-repr BigDecimal HALF_UP; DuckDB: scale-multiply +
  * nearbyint, changed across releases). The deterministic form is
  * integer half-up onto the 10^-s grid — half_up(a/b · 10^s) =
  * (2a·10^s + b) div (2b) for a, b ≥ 0 — followed by ONE exact
  * division. Subtracting pmod makes the long→double division exact
  * (numerator divisible by denominator), and the final division by a
  * power of ten is correctly rounded under IEEE-754, hence
  * build-invariant. A NULL denominator (nullif'd zero) propagates to
  * NULL exactly like the `round(a/NULL, n)` it replaces.
  *
  * Bounds: inputs must satisfy 2·a·10^s < 2^63 — every call site on
  * the query surface has |a| ≤ ~10^9 row counts at the 10× fixture
  * with s ≤ 6, i.e. ≥400× headroom.
  */
object ExactGrid {
  def eRatio(a: Column, b: Column, scale: Long): Column = {
    val num = a.cast("long") * lit(2L * scale) + b.cast("long")
    val den = b.cast("long") * lit(2L)
    ((num - pmod(num, den)) / den) / lit(scale.toDouble)
  }
}
