package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding dimensionality reduction: seeded Gaussian random projection
  * (the Johnson–Lindenstrauss route — distance/angle preserving in
  * expectation, data-independent, so it needs NO training pass) and
  * matryoshka-style prefix truncation (for embedding models trained so
  * nested prefixes are themselves usable embeddings).
  *
  * Scale design: both transforms are map-only column expressions — a
  * 100 TB corpus re-embeds in one scan with no shuffle, no driver
  * state, and no model artifact to ship (the projection matrix is
  * derived from a seed). Downstream ANN over the reduced vectors moves
  * `k/dim` of the bytes through every subsequent shuffle/broadcast —
  * the point of reducing at all. The matrix generator is shared with
  * [[Similarity.hyperplanes]], so an external oracle can reproduce the
  * exact planes from the seed the same way the LSH oracles do.
  */
object Projection {

  /** k×dim Gaussian projection matrix — row j is plane j. Same seeded
    * stream-split generator as the LSH hyperplane family (deterministic,
    * external-oracle reproducible).
    */
  def gaussianMatrix(k: Int, dim: Int, seed: Long): Array[Array[Double]] =
    Similarity.hyperplanes(1, k, dim, seed)(0)

  /** Project a float-array column to `planes.length` dims:
    * `out[j] = <v, P_j> / sqrt(k)`. The `1/sqrt(k)` scaling makes the
    * projection norm-preserving in expectation (E‖Pv‖² = ‖v‖²), so
    * cosine/L2 thresholds tuned on full vectors stay meaningful.
    */
  def project(vec: Column, planes: Array[Array[Double]]): Column = {
    require(planes.nonEmpty, "projection needs at least one plane")
    val scale = 1.0 / math.sqrt(planes.length.toDouble)
    array(planes.map(p => Similarity.dot(vec, lit(p)) * lit(scale)): _*)
  }

  /** Matryoshka truncation: keep the first `k` components and
    * re-normalize to unit length (zero vectors stay zero). Meaningful
    * when the embedding model was trained with nested-prefix loss;
    * for arbitrary embeddings prefer [[project]], which mixes every
    * input dimension instead of discarding most of them.
    */
  def truncateRenorm(vec: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1: $k")
    val prefix = slice(vec.cast("array<double>"), 1, k)
    val n = sqrt(aggregate(zip_with(prefix, prefix, _ * _), lit(0.0), _ + _))
    when(n > 0, transform(prefix, _ / n)).otherwise(prefix)
  }
}
