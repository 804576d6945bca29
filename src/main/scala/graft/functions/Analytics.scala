package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form statistical analytics over exact scaled-integer inputs:
  * per-group simple linear regression and Pearson correlation from the
  * classic sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy).
  *
  * Determinism at scale: every sufficient statistic is a sum of exact
  * integers accumulated in DECIMAL(38,0) — associative and overflow-free
  * for any realistic corpus (Σx² at 10¹² rows of 10⁷-scaled values is
  * ~10²⁶ of the 10³⁸ headroom) — so the statistics are identical under
  * any partitioning/aggregation order. The handful of final double
  * operations (subtract, divide, sqrt) run once per GROUP on exact
  * integer inputs, in a fixed association mirrored by the oracle SQL, so
  * IEEE semantics make the result bit-reproducible.
  *
  * Scale shape: one scan, one map-side-combined shuffle of (group, 6
  * decimals); no window, no second pass. Adding a statistic column is
  * free at the shuffle (the row stays O(1) wide vs the corpus).
  */
object Analytics {

  private val D = "decimal(38,0)"

  /** Weighted isotonic (PAVA) fit over a binned reliability frame via
    * the exact minimax identity g(p) = max_{i≤p} min_{j≥p} rate(i..j)
    * — no sequential pool-adjacent-violators loop, no driver
    * iteration: on a B-bin frame the identity is three bounded joins
    * over O(B³) rows, and with integer-ppm interval rates the result
    * is engine-independent (any two engines truncating the same
    * intervals produce the same fit). `fitted_ppm` is non-decreasing
    * in `bin` by construction.
    *
    * Input frame: one row per bin with (binCol: long, `n`: long count,
    * `p`: long positives). Output: (binCol, n_docs, raw_ppm,
    * fitted_ppm).
    */
  def isotonicFitPpm(bins: DataFrame, binCol: String = "bin"): DataFrame = {
    val b = bins.localCheckpoint(true) // interval + fit joins reuse it
    val pairs = b.as("a").join(b.as("b"),
        col(s"a.$binCol") <= col(s"b.$binCol"))
      .select(col(s"a.$binCol").as("lo"), col(s"b.$binCol").as("hi"))
    val iv = pairs.join(b.as("m"),
        col(s"m.$binCol") >= col("lo") && col(s"m.$binCol") <= col("hi"))
      .groupBy("lo", "hi")
      .agg(expr("sum(p) * 1000000 div sum(n)").as("rate_ppm"))
    val f1 = b.select(col(binCol))
      .join(iv, col("lo") <= col(binCol) && col(binCol) <= col("hi"))
      .groupBy(col(binCol), col("lo")).agg(min("rate_ppm").as("minj"))
    val fit = f1.groupBy(binCol).agg(max("minj").as("fitted_ppm"))
    b.select(col(binCol), col("n").as("n_docs"),
        expr("p * 1000000 div n").as("raw_ppm"))
      .join(fit, Seq(binCol))
      .select(col(binCol), col("n_docs"), col("raw_ppm"),
        col("fitted_ppm"))
  }

  /** Per-group OLS fit y = slope·x + intercept over scaled-integer
    * columns `xInt`/`yInt` (e.g. cents, basis points). Emits slope
    * (6 dp) and intercept (2 dp) in the y-unit.
    */
  def linregByGroup(df: DataFrame, groupCol: String,
                    xInt: Column, yInt: Column): DataFrame = {
    val x = xInt.cast(D)
    val y = yInt.cast(D)
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast(D).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val slope = num / den
    val intercept =
      (col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n").cast("double")
    stats.select(col(groupCol),
      col("n").cast("long").as("n"),
      round(slope, 6).as("slope"),
      round(intercept, 2).as("intercept"))
  }

  /** Sample autocorrelation function of an integer-valued series at
    * lags 1..maxLag: Pearson r between (v_t, v_{t-lag}) over the pairs
    * both sides cover, the pairwise-complete estimator pandas'
    * `Series.autocorr` uses. Input is an already-aggregated
    * (period, value) frame — the corpus-sized work (rolling 100 TB of
    * raw events up to one row per period) happens BEFORE this call, so
    * the lag joins here touch a calendar-bounded frame: maxLag narrow
    * self-joins over ≤ one row per period, never the raw data. Exact
    * DECIMAL sufficient statistics + one fixed-association double
    * division per lag keep the result bit-reproducible (see object
    * doc).
    */
  def autocorrelation(series: DataFrame, periodCol: String,
                      valueCol: Column, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val base = series.select(col(periodCol).cast("long").as("p"),
      valueCol.cast(D).as("v"))
    val lagged = (1 to maxLag).map { l =>
      base.as("a").join(base.as("b"), col("a.p") === col("b.p") + l)
        .select(lit(l).as("lag"), col("a.v").as("x"), col("b.v").as("y"))
    }.reduce(_ unionAll _)
    val st = lagged.groupBy("lag")
      .agg(count(lit(1)).cast(D).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    // greatest(·,1) clamp (the repo's divisor convention, ADVICE r11):
    // a constant-valued side has EXACTLY zero variance (all integer
    // sums), which would put NaN/Inf in r divergently across engines;
    // the clamp makes it a defined r = 0 in both (numerator is exactly
    // 0 whenever either variance is — Cauchy–Schwarz on integers).
    // Non-degenerate variances are ≥ n ≥ 1, so the clamp never alters
    // a live value.
    val dx = greatest((col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double"), lit(1.0))
    val dy = greatest((col("n") * col("syy") - col("sy") * col("sy"))
      .cast("double"), lit(1.0))
    st.select(col("lag"), col("n").cast("long").as("n_pairs"),
      round(num / sqrt(dx * dy), 6).as("r"))
  }

  /** Pearson correlation for each named pair of scaled-integer columns,
    * computed in ONE pass: a single global aggregate collects every
    * distinct column's moments and cross-moments, then the long-form
    * (pair, r) rows are derived from that one row — three correlations
    * never cost three scans.
    */
  def correlationPairs(df: DataFrame,
                       cols: Seq[(String, Column)],
                       pairs: Seq[(String, String)]): DataFrame = {
    val named = cols.map { case (n, c) => n -> c.cast(D) }.toMap
    val aggs =
      cols.map { case (n, _) => sum(named(n)).as(s"s_$n") } ++
        pairs.flatMap { case (a, b) => Seq(a -> a, b -> b, a -> b) }
          .distinct
          .map { case (a, b) => sum(named(a) * named(b)).as(s"s_${a}_$b") }
    val stats = df.agg(count(lit(1)).cast(D).as("n"), aggs: _*)
    def rFor(a: String, b: String): Column = {
      val num = (col("n") * col(s"s_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
        .cast("double")
      val da = (col("n") * col(s"s_${a}_$a") - col(s"s_$a") * col(s"s_$a"))
        .cast("double")
      val db = (col("n") * col(s"s_${b}_$b") - col(s"s_$b") * col(s"s_$b"))
        .cast("double")
      round(num / sqrt(da * db), 6)
    }
    val rows = pairs.map { case (a, b) =>
      struct(lit(s"${a}_$b").as("pair"), rFor(a, b).as("r"))
    }
    stats.select(explode(array(rows: _*)).as("pr"))
      .select(col("pr.pair").as("pair"), col("pr.r").as("r"))
  }
}
