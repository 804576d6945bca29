package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {
  test("extensions expose native expressions to SQL") {
    // getOrCreate may return the suite-shared session (extensions only
    // apply to fresh contexts), so register on it at runtime — the same
    // function set GraftExtensions injects at build time
    val spark = GraftSession.builder("local[2]", Some(2))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(spark)
    try {
      val row = spark.sql(
        """SELECT simhash64('hello world hello') AS sh,
          |       cosine_sim(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS cs,
          |       sorted_array_jaccard(array(1L, 2L), array(2L, 3L)) AS j,
          |       sorted_array_overlap(array(1L, 2L, 3L), array(2L, 3L, 4L))
          |         AS ov,
          |       size(minhash_sig('a b c d e')) AS nsig,
          |       size(shingle_hashes('a b c d e')) AS nsh
          |""".stripMargin).head()
      assert(row.getLong(0) != 0L)
      assert(row.getDouble(1) == 1.0)
      assert(math.abs(row.getDouble(2) - 1.0 / 3.0) < 1e-12)
      assert(row.getLong(3) == 2L)
      assert(row.getInt(4) == 16)
      assert(row.getInt(5) == 3)
      // aggregate registration: top-2 values by key per group
      spark.range(10).selectExpr("id % 2 AS g", "id AS k", "id * 10 AS v")
        .createOrReplaceTempView("tkb")
      val agg = spark.sql(
        "SELECT g, top_k_by(k, v, 2) AS t FROM tkb GROUP BY g ORDER BY g")
        .collect()
      assert(agg(0).getSeq[Long](1) == Seq(80L, 60L))
      assert(agg(1).getSeq[Long](1) == Seq(90L, 70L))
      // sketch-family SQL surface: cms, kq, zorder round-trips
      spark.range(1000).selectExpr("id", "concat('t', id % 7) AS tok",
        "CAST(id % 100 AS DOUBLE) AS v")
        .createOrReplaceTempView("sk_in")
      val sk = spark.sql(
        """SELECT cms_estimate((SELECT cms_state(tok, 4, 64) FROM sk_in),
          |         't0', 4) AS est,
          |       kq_quantile((SELECT kq_state(v, 64, id) FROM sk_in),
          |         0.5) AS p50,
          |       zorder_key(8, 3, 5) AS z""".stripMargin).head()
      assert(sk.getLong(0) >= 143L, s"cms lost mass: ${sk.getLong(0)}")
      assert(sk.getDouble(1) >= 0.0 && sk.getDouble(1) <= 99.0)
      assert(sk.getLong(2) == ZOrderImplRef.interleave2(3L, 5L, 8))
    } finally ()
  }

  private object ZOrderImplRef {
    def interleave2(x: Long, y: Long, bits: Int): Long = {
      var out = 0L
      for (b <- 0 until bits) {
        out |= ((x >>> b) & 1L) << (2 * b)
        out |= ((y >>> b) & 1L) << (2 * b + 1)
      }
      out
    }
  }

  test("SQL functions honor optional literal args and reject over-arity") {
    val spark = GraftSession.builder("local[2]", Some(2))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT size(minhash_sig('a b c d e', 2, 32)) AS nsig,
        |       size(shingle_hashes('a b c d e', 2)) AS nsh
        |""".stripMargin).head()
    assert(row.getInt(0) == 32)
    assert(row.getInt(1) == 4) // 5 tokens, 2-shingles
    // over-arity must error, not silently ignore the extra args
    intercept[Exception] {
      spark.sql("SELECT simhash64('x', 3)").head()
    }
    intercept[Exception] {
      spark.sql("SELECT minhash_sig('x', 2, 16, 99)").head()
    }
    // barrier is a SQL-visible identity
    assert(spark.sql("SELECT pushdown_barrier(21 * 2)").head().getInt(0)
      == 42)
    intercept[Exception] {
      spark.sql("SELECT pushdown_barrier(1, 2)").head()
    }
  }
}
