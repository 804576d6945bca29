package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bit-exactness guards for the native encode/assign expressions: each
  * must reproduce its composed-Column formulation EXACTLY, because the
  * DuckDB oracles were written against the composed semantics (per-code
  * `|c|² − 2·x·c` left-to-right double folds; one-loop cosine; ties to
  * the smaller index). A one-ulp drift here shows up as a hash mismatch
  * in the driver's correctness gate.
  */
class PqExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  test("kmeans_assign equals the composed cosine argmax, bit for bit") {
    val cents: Seq[Array[Float]] = emb.orderBy(col("vec_id")).limit(7)
      .select(col("embedding").cast("array<float>"))
      .as[Seq[Float]].collect().toSeq.map(_.toArray)
    val v = col("embedding").cast("array<float>")
    val sims = array(cents.map(c =>
      exprs.cosine_sim(v, typedLit(c.toSeq))): _*)
    val composed = emb.select(col("vec_id"),
      (array_position(sims, array_max(sims)).cast("int") - 1)
        .as("cluster"),
      array_max(sims).as("sim"))
    val native = emb.select(col("vec_id"),
      exprs.kmeans_assign(v, cents.toArray).getField("cluster")
        .as("cluster"),
      exprs.kmeans_assign(v, cents.toArray).getField("sim").as("sim"))
    val diff = composed.as[(Long, Int, Double)].collect().toSet
      .diff(native.as[(Long, Int, Double)].collect().toSet)
    assert(diff.isEmpty, s"native/composed disagree on ${diff.size} rows")
  }

  test("int8_quantize equals the composed transform+round form") {
    val v = col("embedding").cast("array<double>")
    val absMax = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    val scale = when(absMax > 0, lit(127.0) / absMax).otherwise(lit(1.0))
    val composed = transform(v, x => round(x * scale).cast("int"))
    val nDiff = emb
      .withColumn("c", composed)
      .withColumn("n", exprs.int8_quantize(v))
      .filter(col("c") =!= col("n")).count()
    assert(nDiff == 0, s"$nDiff vectors disagree")
  }

  test("int8_cosine_sim equals the composed zip_with/aggregate form") {
    val (_, q) = graft.functions.Similarity.quantize(col("embedding"))
    val pairs = emb.select(col("vec_id"), q.as("qa"))
      .crossJoin(emb.filter(col("vec_id") < 4)
        .select(col("vec_id").as("qid"), q.as("qb")))
    def agg(v: org.apache.spark.sql.Column) =
      aggregate(v, lit(0L), _ + _).cast("double")
    val dot = agg(zip_with(col("qa"), col("qb"),
      (x, y) => (x * y).cast("long")))
    val na = agg(transform(col("qa"), x => (x * x).cast("long")))
    val nb = agg(transform(col("qb"), x => (x * x).cast("long")))
    val composed = when(na > 0 && nb > 0,
      dot / sqrt(na) / sqrt(nb)).otherwise(lit(0.0))
    val nDiff = pairs
      .withColumn("c", composed)
      .withColumn("n", exprs.int8_cosine_sim(col("qa"), col("qb")))
      .filter(col("c") =!= col("n")).count()
    assert(nDiff == 0, s"$nDiff pairs disagree")
  }

  test("pq_encode_codes equals the composed per-subspace argmin") {
    val m = 4
    val sub = 16
    val books = graft.functions.ProductQuantization.trainCodebooks(
      emb, "vec_id", "embedding", m = m, k = 8, iters = 1)
    val tensor = books.map(_.toArray).toArray
    val v = col("embedding").cast("array<float>")
    def dotLocal(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
      d
    }
    val composed = emb.select(col("vec_id"), array((0 until m).map { mi =>
      val x = slice(v, mi * sub + 1, sub)
      val dists = array(books(mi).map { c =>
        lit(dotLocal(c, c)) - lit(2.0) *
          exprs.dot_product(x, typedLit(c.toSeq))
      }: _*)
      array_position(dists, array_min(dists)).cast("int") - 1
    }: _*).as("codes"))
    val native = emb.select(col("vec_id"),
      exprs.pq_encode_codes(v, tensor).as("codes"))
    val diff = composed.as[(Long, Seq[Int])].collect().toSet
      .diff(native.as[(Long, Seq[Int])].collect().toSet)
    assert(diff.isEmpty, s"native/composed disagree on ${diff.size} rows")
  }

  test("int8_sqdist equals the zip_with fold, exactly") {
    val q = emb.select($"vec_id",
      exprs.int8_quantize($"embedding".cast("array<double>")).as("qv"))
    val a = q.select($"vec_id".as("ia"), $"qv".as("qa"))
    val b = q.select($"vec_id".as("ib"), $"qv".as("qb"))
    val pairs = a.crossJoin(b).filter($"ia" < $"ib").limit(500)
    val composed = expr("aggregate(zip_with(qa, qb, (x, y) ->" +
      " (cast(x as long) - y) * (cast(x as long) - y)), 0L," +
      " (acc, e) -> acc + e)")
    val nDiff = pairs
      .filter(composed =!= exprs.int8_sqdist($"qa", $"qb")).count()
    assert(nDiff == 0, s"$nDiff pairs disagree")
  }

  test("sign_pack equals the zip_with fold, bit for bit") {
    val v = col("embedding").cast("array<double>")
    val composed = emb.select(col("vec_id"),
      expr("aggregate(zip_with(cast(embedding as array<double>)," +
        " sequence(0, 63)," +
        " (x, i) -> IF(x > 0D, shiftleft(1L, cast(i as int)), 0L))," +
        " 0L, (acc, b) -> acc | b)").as("bits"))
    val native = emb.select(col("vec_id"),
      exprs.sign_pack(v).as("bits"))
    val diff = composed.as[(Long, Long)].collect().toSet
      .diff(native.as[(Long, Long)].collect().toSet)
    assert(diff.isEmpty, s"sign_pack disagrees on ${diff.size} rows")
    // sanity: codes are non-degenerate on the fixture
    val distinct = native.select("bits").distinct().count()
    assert(distinct > 10, s"only $distinct distinct codes")
  }

  test("null array elements are rejected loudly, not read as garbage") {
    // aggregate-built arrays are nullable-typed even when no element
    // ever is; toDoubleArray/toIntArray on a null slot reads undefined
    // bits — the same failure class DtwDistanceImpl.rejectNulls closed
    // (ADVICE r8 flagged signPack/sqdist as still exposed)
    val withNull = Seq((1L, Seq[java.lang.Double](1.0, null, 3.0)))
      .toDF("id", "v")
    for (bad <- Seq(
        exprs.sign_pack(col("v")),
        exprs.int8_quantize(col("v")),
        exprs.int8_sqdist(
          exprs.int8_quantize(col("v")), exprs.int8_quantize(col("v"))))) {
      val e = intercept[Exception] {
        withNull.select(bad).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("null element")),
        s"expected a loud null-element error, got: ${msgs(e)}")
    }
  }
}
