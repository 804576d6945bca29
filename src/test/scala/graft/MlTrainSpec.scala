package graft

/** `ml_logreg_train` — in-engine full-batch GD. The oracle proves
  * bit-stability; this proves the training MOVES: 3 rounds must beat
  * the untrained model's log loss (n·ln 2) on the fixture.
  */
class MlTrainSpec extends SparkSpec {

  test("3 GD rounds reduce log loss below the untrained baseline") {
    val row = SparkEntry.queries("ml_logreg_train")(spark, sf("sf0.01"))
      .head()
    val n = row.getAs[Long]("n")
    val loss = row.getAs[Long]("loss_e6")
    assert(n > 0)
    val untrained = n * 693147L // e6-scaled ln 2 per sample at w = 0
    assert(loss < untrained,
      s"loss_e6 $loss did not improve on untrained $untrained")
    // weights moved off the origin
    assert(row.getAs[Long]("w1_e6") != 0L ||
      row.getAs[Long]("w2_e6") != 0L || row.getAs[Long]("w3_e6") != 0L)
  }

  test("conformal radius is the exact rank statistic and coverage holds") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("ml_conformal_interval")(
      spark, sf("sf0.01")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(out.size == 3)

    // driver-side replay of the calibration ranks from the raw table
    val base = spark.read.parquet(sf("sf0.01") + "/lineitem.parquet")
      .select(col("l_returnflag").as("flag"), col("l_orderkey"),
        col("l_quantity").cast("long").as("qty"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val slope = base.filter(r => r._2 % 4 == 0 || r._2 % 4 == 3)
      .groupBy(_._1).map { case (f, rs) =>
        f -> rs.map(_._4).sum / rs.map(_._3).sum }
    out.foreach { case (f, row) =>
      val res = base.filter(r => r._1 == f && r._2 % 4 == 1)
        .map(r => math.abs(r._4 - r._3 * slope(f))).sorted
      val n = res.length
      val k = (9 * (n + 1) + 9) / 10
      assert(row.getAs[Long]("n_cal") == n)
      assert(row.getAs[Long]("slope") == slope(f))
      assert(row.getAs[Long]("q_cents") == res(k - 1),
        s"flag $f: radius must be the $k-th smallest residual")
      // split-conformal marginal coverage: >= 90% up to finite-sample
      // slack (the guarantee is >= ceil(0.9(n+1))/(n+1) in expectation)
      val cov = row.getAs[Long]("coverage_ppm")
      assert(cov >= 880000L && cov <= 960000L,
        s"flag $f: coverage $cov outside the plausible conformal band")
    }
  }
}
