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

  test("adaptiveK grows with the corpus, floors at minK, caps at maxK") {
    assert(Clustering.adaptiveK(500, 256, 8) == 8)
    assert(Clustering.adaptiveK(2048, 256, 8) == 8)
    assert(Clustering.adaptiveK(20000, 256, 8) == 79)
    // the cap bounds per-row assignment cost; past it the IVF/PQ
    // operators are the intended billion-vector path
    assert(Clustering.adaptiveK(2560000, 256, 8) == 4096)
    assert(Clustering.adaptiveK(2560000, 256, 8, maxK = 16384) == 10000)
    // integer-exact ceil: one row past a boundary adds a cluster
    assert(Clustering.adaptiveK(2049, 256, 8) == 9)
  }

  test("trainSampleMod bounds the training slice at ~budget rows") {
    assert(Clustering.trainSampleMod(500, 4096) == 1)
    assert(Clustering.trainSampleMod(4096, 4096) == 1)
    assert(Clustering.trainSampleMod(8192, 4096) == 2)
    assert(Clustering.trainSampleMod(50000, 4096) == 12)
    assert(Clustering.trainSampleMod(1L << 40, 4096) == 268435456)
  }

  test("kmeansAssign trains only on the 1-in-mod sample (seed gate)") {
    // iters = 0 makes centroids == seeds, so the assignment reveals
    // which vectors seeded the build: with sampleMod = 10 over ids
    // 0..19 and k = 2 the seeds must be vectors 0 and 10 — NOT the two
    // lowest ids of the full corpus (0 and 1)
    val e1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val e2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val mid = Array(0.9f, 0.1f, 0.0f, 0.0f) // close to e1, not to e2
    val rows = (0L until 20L).map { id =>
      val v = if (id == 0L) e1 else if (id == 10L) e2
              else if (id == 1L) mid else e1.map(x => x * 0.5f)
      (id, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val asg = Clustering.kmeansAssign(df, "vec_id", "embedding", k = 2,
        iters = 0, sampleMod = 10)
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    // seeds sampled => cluster 0 = vec 0's direction, cluster 1 = vec 10
    assert(asg(0L) == 0 && asg(10L) == 1)
    // id 1 aligns with e1: under sampled seeds it joins cluster 0; if
    // training had NOT been gated it would have seeded cluster 1 itself
    assert(asg(1L) == 0,
      "id 1 seeded a cluster — training was not sample-gated")
  }

  test("full corpus is still assigned when training is sampled") {
    val asg = Clustering.kmeansAssign(emb, "vec_id", "embedding", k = 4,
      iters = 2, sampleMod = 7)
    assert(asg.count() == emb.count(),
      "sampled training must not drop rows from the final assignment")
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
