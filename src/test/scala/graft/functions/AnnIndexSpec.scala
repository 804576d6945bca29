package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.VersionedTable

/** Persistent ANN index artifacts (VERDICT r13 #7): commit/load
  * round-trips must be bit-exact (float32 end-to-end), loads must
  * reject malformed foreign tables loudly, and the serve path fed a
  * LOADED index must equal the in-session result row-for-row.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpRoot(tag: String): String =
    Files.createTempDirectory(tag).resolve("idx").toString

  // deterministic tiny corpus: 64 vectors in 8 dims, ids 0..63
  private def corpus() = {
    val rows = (0 until 64).map { i =>
      (i.toLong,
        Array.tabulate(8)(d => ((i * 31 + d * 7) % 13 - 6).toFloat / 6f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("centroids: commit → load is bit-exact and versioned") {
    val root = tmpRoot("annc")
    val cents = Seq(
      Array(1.0f, 2.5f, -3.25f), Array(0.1f, 0.2f, 0.3f),
      Array(-1.5f, 0.0f, 7.75f))
    val v = AnnIndex.commitCentroids(spark, cents, root, () => 1000L)
    assert(v == 1L)
    val loaded = AnnIndex.loadCentroids(spark, root)
    assert(loaded.length == 3)
    loaded.zip(cents).foreach { case (a, b) =>
      // float bit-exactness, not approximate equality
      assert(a.map(java.lang.Float.floatToIntBits).toSeq ==
        b.map(java.lang.Float.floatToIntBits).toSeq)
    }
    // a rebuild is a NEW version; pinned reads still see v1
    val cents2 = cents.map(_.map(_ * 2f))
    assert(AnnIndex.commitCentroids(spark, cents2, root, () => 2000L) == 2L)
    assert(AnnIndex.loadCentroids(spark, root).head.head == 2.0f)
    assert(AnnIndex.loadCentroids(spark, root, Some(1L)).head.head == 1.0f)
  }

  test("centroids: non-contiguous foreign table is rejected loudly") {
    val root = tmpRoot("annbad")
    val bad = Seq((0, Seq(1.0f)), (2, Seq(2.0f)))
      .toDF("cell", "centroid") // hole at cell 1
    VersionedTable.commit(bad, root, () => 1000L)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.loadCentroids(spark, root)
    }
    assert(e.getMessage.contains("not contiguous"))
  }

  test("codebooks: commit → load is bit-exact; ragged grids rejected") {
    val root = tmpRoot("annpq")
    val books: ProductQuantization.Codebooks = Seq(
      IndexedSeq(Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      IndexedSeq(Array(-1.0f, 0.5f), Array(0.25f, -8.0f)))
    assert(AnnIndex.commitCodebooks(spark, books, root, () => 1000L) == 1L)
    val loaded = AnnIndex.loadCodebooks(spark, root)
    assert(loaded.length == 2 && loaded.forall(_.length == 2))
    for (m <- 0 until 2; c <- 0 until 2)
      assert(loaded(m)(c).map(java.lang.Float.floatToIntBits).toSeq ==
        books(m)(c).map(java.lang.Float.floatToIntBits).toSeq)

    val sparseRoot = tmpRoot("annpq2")
    val sparse = Seq((0, 0, Seq(1.0f)), (0, 1, Seq(2.0f)), (1, 0, Seq(3.0f)))
      .toDF("m", "code", "centroid") // missing (1,1)
    VersionedTable.commit(sparse, sparseRoot, () => 1000L)
    val e = intercept[IllegalArgumentException] {
      AnnIndex.loadCodebooks(spark, sparseRoot)
    }
    assert(e.getMessage.contains("dense"))
  }

  test("ivfKmeansTopK served from a loaded index equals in-session") {
    val emb = corpus()
    val queries = emb.filter(col("vec_id") < 3)
    val cents = Clustering.trainKmeans(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val inSession = Similarity.ivfKmeansTopK(emb, queries, "vec_id",
      "embedding", k = 3, nProbe = 2, centroids = Some(cents))
      .orderBy("query_id", "rank").collect().toSeq

    val root = tmpRoot("annivf")
    AnnIndex.commitCentroids(spark, cents, root)
    val loaded = AnnIndex.loadCentroids(spark, root)
    val served = Similarity.ivfKmeansTopK(emb, queries, "vec_id",
      "embedding", k = 3, nProbe = 2, centroids = Some(loaded))
      .orderBy("query_id", "rank").collect().toSeq
    assert(served == inSession)
  }

  test("centroidsOrTrain trains exactly once, then serves the artifact") {
    val root = tmpRoot("annonce")
    var trained = 0
    def train() = { trained += 1; Seq(Array(1.0f), Array(2.0f)) }
    val first = AnnIndex.centroidsOrTrain(spark, root)(train())
    val second = AnnIndex.centroidsOrTrain(spark, root)(train())
    assert(trained == 1) // second call loads, never re-trains
    assert(first.map(_.toSeq) == second.map(_.toSeq))
    assert(VersionedTable.versions(spark, root) == Seq(1L))
  }

  test("adcTopK served from loaded codebooks equals in-session") {
    val emb = corpus()
    val queries = emb.filter(col("vec_id") < 3)
    val books = ProductQuantization.trainCodebooks(emb, "vec_id",
      "embedding", m = 2, k = 4, iters = 1)
    val inSession = ProductQuantization.adcTopK(spark, emb, queries,
      "vec_id", "embedding", m = 2, k = 4, iters = 1, topK = 3,
      books = Some(books)).orderBy("query_id", "rank").collect().toSeq

    val root = tmpRoot("annadc")
    AnnIndex.commitCodebooks(spark, books, root)
    val loaded = AnnIndex.loadCodebooks(spark, root)
    val served = ProductQuantization.adcTopK(spark, emb, queries,
      "vec_id", "embedding", m = 2, k = 4, iters = 1, topK = 3,
      books = Some(loaded)).orderBy("query_id", "rank").collect().toSeq
    assert(served == inSession)
  }
}
