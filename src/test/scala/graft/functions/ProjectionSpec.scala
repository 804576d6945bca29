package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ProjectionSpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = Tables.load(spark, sf("sf0.001"), "embeddings")

  test("project: hand-computed dot on a basis vector, scaled") {
    val planes = Projection.gaussianMatrix(k = 4, dim = 3, seed = 11L)
    // e1 picks out component 0 of each plane
    val df = Seq((1L, Array(1f, 0f, 0f))).toDF("id", "v")
    val out = df.select(Projection.project(col("v"), planes).as("p"))
      .as[Seq[Double]].head()
    assert(out.length == 4)
    val scale = 1.0 / math.sqrt(4.0)
    (0 until 4).foreach { j =>
      assert(math.abs(out(j) - planes(j)(0) * scale) < 1e-12)
    }
  }

  test("project separates near-dups from unrelated pairs (JL)") {
    // The JL promise at feasible k is separation, not noise-level
    // ranking: pairs that are near-duplicates in 64-d (cos ~ 0.99) must
    // stay clearly closer in 16-d than unrelated pairs (cos ~ 0).
    val planes = Projection.gaussianMatrix(k = 16, dim = 64, seed = 42L)
    val rnd = new scala.util.Random(7)
    def gauss(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val rows = (0 until 200).map { i =>
      val v = gauss()
      val dup = v.zip(gauss()).map { case (a, n) => a + 0.1f * n }
      (i.toLong, v, dup)
    }
    val df = rows.toDF("id", "v", "dup")
    val projCos = Similarity.cosine(
      Projection.project(col("v"), planes),
      Projection.project(col("dup"), planes))
    val nearMean = df.select(avg(projCos)).as[Double].head()
    // unrelated pairs: vector i against the dup of i+1
    val far = rows.indices.dropRight(1)
      .map(i => (rows(i)._1, rows(i)._2, rows(i + 1)._3)).toDF("id", "v", "dup")
    val farMean = far.select(avg(abs(projCos))).as[Double].head()
    assert(nearMean > 0.8, s"near-dup projected cosine mean: $nearMean")
    assert(farMean < 0.3, s"unrelated projected |cosine| mean: $farMean")
    assert(nearMean - farMean > 0.4, s"no separation: $nearMean vs $farMean")
  }

  test("project norm-preservation: mean squared norm ratio near 1") {
    val planes = Projection.gaussianMatrix(k = 16, dim = 64, seed = 42L)
    val ratio = embeddings
      .select((Similarity.l2Norm(Projection.project(col("embedding"), planes))
        / Similarity.l2Norm(col("embedding"))).as("r"))
      .agg(avg(col("r") * col("r"))).as[Double].head()
    assert(math.abs(ratio - 1.0) < 0.15, s"E[|Pv|^2/|v|^2] = $ratio")
  }

  test("truncateRenorm: unit norm, proportional prefix, zero-safe") {
    val df = Seq((1L, Array(3f, 4f, 5f, 6f)), (2L, Array(0f, 0f, 0f, 0f)))
      .toDF("id", "v")
    val out = df.select(col("id"),
        Projection.truncateRenorm(col("v"), 2).as("t"))
      .as[(Long, Seq[Double])].collect().toMap
    // [3,4] renormed -> [0.6, 0.8]
    assert(math.abs(out(1L)(0) - 0.6) < 1e-12)
    assert(math.abs(out(1L)(1) - 0.8) < 1e-12)
    // zero vector stays zero, no NaN
    assert(out(2L) == Seq(0.0, 0.0))
    intercept[IllegalArgumentException] {
      Projection.truncateRenorm(col("v"), 0)
    }
  }
}
