package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.exprs

/** Vector-similarity operators over an `array<float>` embedding column.
  *
  * All arithmetic is done in DOUBLE (elements cast before multiplying) so
  * results are reproducible across engines and run-to-run: a left-to-right
  * fold over the array is order-deterministic, unlike a shuffle-order
  * dependent aggregation.
  *
  * Scale design: [[bruteForceTopK]] broadcasts the (small) query set and
  * scans the corpus once — at 100 TB this is a map-only pass, no shuffle
  * except the final per-query top-k (tiny). [[lshTopK]] cuts the candidate
  * set with random-hyperplane buckets for the many-query / all-pairs case.
  */
object Similarity {

  /** Dot product of two float-array columns, computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), _ * _),
      lit(0.0), _ + _)

  /** L2 norm in double. */
  def l2Norm(a: Column): Column = {
    val d = a.cast("array<double>")
    sqrt(aggregate(zip_with(d, d, _ * _), lit(0.0), _ + _))
  }

  /** Cosine similarity in double; 0.0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Exact brute-force top-k cosine neighbors for a set of query vectors.
    *
    * @param corpus   (idCol, vecCol) table — the full embedding corpus
    * @param queries  (idCol, vecCol) table — small; broadcast
    * @return (query_id, neighbor_id, rank, score) — self-matches excluded,
    *         rank by (score desc, neighbor_id asc) for determinism.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec")))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"))
      .crossJoin(q)
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", exprs.cosine_sim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 4).as("score"))
  }

  /** Random-hyperplane signature: `planes(p)(d)` dotted with the vector,
    * sign bit per plane packed into a long. Deterministic given the
    * caller's seeded plane matrix.
    */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(lit): _*)
      val d = aggregate(
        zip_with(vec.cast("array<double>"), planeCol, _ * _), lit(0.0), _ + _)
      when(d >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k: bucket corpus and queries by hyperplane signature
    * (`nBits` planes over `dim` dims, seeded), join on bucket, exact-rank
    * within candidates. Trades recall for a candidate set ~corpus/2^nBits
    * per query — the scale path when the query set is large.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, nBits: Int = 8,
              seed: Long = 42L): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val planes = Array.fill(nBits, dim)(rnd.nextGaussian())
    val sig = (c: Column) => hyperplaneSignature(c, planes)

    val q = broadcast(queries.select(
      col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      sig(col(vecCol)).as("bucket")))
    val cand = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      sig(col(vecCol)).as("bucket"))

    val scored = cand.join(q, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("score", exprs.cosine_sim(col("q_vec"), col("c_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("score"), 4).as("score"))
  }
}
