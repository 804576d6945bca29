package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet(sf("sf0.001") + "/embeddings.parquet")

  test("kmeansAssign: every vector assigned, clusters in [0, k)") {
    val asg = Clustering.kmeansAssign(emb, "vec_id", "embedding",
      k = 4, iters = 2)
    val n = emb.count()
    assert(asg.count() == n)
    val cl = asg.select("cluster").as[Int].collect()
    assert(cl.forall(c => c >= 0 && c < 4))
    assert(cl.toSet.size > 1, "degenerate single-cluster assignment")
  }

  test("kmeansAssign is deterministic under repartitioning") {
    def run(parts: Int): Map[Long, Int] =
      Clustering.kmeansAssign(emb.repartition(parts), "vec_id",
          "embedding", k = 4, iters = 2)
        .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(run(2) == run(7),
      "assignment must not depend on partitioning")
  }

  test("Lloyd rounds do not increase within-cluster dispersion") {
    // monotonicity sanity: mean cosine-to-centroid after 3 rounds is at
    // least what the seed assignment (iters=0) achieves
    def meanSim(iters: Int): Double =
      Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 4,
          iters = iters)
        .agg(avg("sim")).head().getDouble(0)
    assert(meanSim(3) >= meanSim(0) - 1e-9,
      "k-means iterations should not worsen mean similarity")
  }

  test("adaptiveK grows with the corpus and floors at minK") {
    assert(Clustering.adaptiveK(500, 256, 8) == 8)
    assert(Clustering.adaptiveK(2048, 256, 8) == 8)
    assert(Clustering.adaptiveK(20000, 256, 8) == 79)
    assert(Clustering.adaptiveK(2560000, 256, 8) == 10000)
    // integer-exact ceil: one row past a boundary adds a cluster
    assert(Clustering.adaptiveK(2049, 256, 8) == 9)
  }

  test("kmeansAssignAdaptive matches explicit k at the adaptive count") {
    val n = emb.count()
    val k = Clustering.adaptiveK(n, 256, 4)
    val a = Clustering.kmeansAssignAdaptive(emb, "vec_id", "embedding",
        iters = 2, targetClusterSize = 256, minK = 4)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val b = Clustering.kmeansAssign(emb, "vec_id", "embedding", k,
        iters = 2)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(a == b)
  }

  test("semanticDedup drops only within-cluster ids with a smaller witness") {
    val asg = Clustering.kmeansAssign(emb, "vec_id", "embedding",
      k = 4, iters = 2).select(col("vec_id"), col("cluster"))
    val dropped = Clustering.semanticDedup(emb, "vec_id", "embedding",
      k = 4, iters = 2, minCos = 0.4)
    val joined = dropped.join(asg.withColumnRenamed("cluster", "cl2"),
      Seq("vec_id"))
    assert(joined.filter(col("cluster") =!= col("cl2")).isEmpty,
      "dropped row reports a cluster its id is not assigned to")
    assert(dropped.filter(col("dup_of") >= col("vec_id")).isEmpty,
      "witness must have the smaller id")
    // every reported witness pair really clears the threshold
    val vecs = emb.select(col("vec_id").as("wid"),
      col("embedding").as("wv"))
    val check = dropped
      .join(vecs.withColumnRenamed("wid", "vec_id")
        .withColumnRenamed("wv", "v_b"), Seq("vec_id"))
      .join(vecs.withColumnRenamed("wid", "dup_of")
        .withColumnRenamed("wv", "v_a"), Seq("dup_of"))
      .withColumn("cos",
        round(graft.expressions.exprs.cosine_sim(col("v_a"), col("v_b")), 4))
    assert(check.filter(col("cos") < 0.4).isEmpty,
      "reported witness below the cosine threshold")
  }
}
