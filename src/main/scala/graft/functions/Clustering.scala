package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.exprs

/** Embedding clustering for large-scale corpus organization: Lloyd's
  * k-means with cosine assignment, plus the SemDeDup-style semantic
  * near-duplicate pass that runs WITHIN clusters — the published recipe
  * for pruning semantically redundant training data
  * (Abbas et al., "SemDeDup", arXiv:2303.09540) without an O(n²)
  * all-pairs cosine.
  *
  * Scale shape per Lloyd iteration: the k centroids are a few KB, so
  * assignment is a broadcast-literal map pass over the corpus (no
  * shuffle of vectors); the update aggregates (cluster, dim, mean) —
  * k·dim rows — with map-side partials. The only driver-side state is
  * the k·dim float centroid matrix (the same contract as
  * [[Similarity.trainCentroids]]: a metadata-sized aggregate, not a
  * data collect). The adaptive entry points train on a bounded
  * systematic sample (~`trainBudget` rows, `id % mod == 0`) and assign
  * the full corpus exactly once, so total FLOPs are
  * O(budget·k·iters + n·k) with k capped at `maxK` — linear in the
  * corpus at scale, never n·k·iters.
  *
  * Determinism contract (what makes the DuckDB oracle exact): seeds are
  * the k lowest-id vectors; per-dim means are cast to FLOAT each round
  * (absorbing summation-order ulps exactly like the IVF centroid
  * oracle); cosine similarity folds dims left-to-right in double; the
  * argmax breaks ties toward the smaller cluster index via
  * `array_position(sims, array_max(sims))`.
  */
object Clustering {

  /** One Lloyd assignment pass against a literal centroid matrix:
    * `cluster` = first index attaining the max cosine sim (0-based),
    * `sim` = that cosine. One native plan node (see
    * [[graft.expressions.KmeansOps]]) — the vector is copied once per
    * row, not once per centroid, which is what makes the full-corpus
    * assign pass affordable at adaptive k.
    */
  private def assignCol(vec: Column, cents: Seq[Array[Float]])
      : (Column, Column) = {
    val a = exprs.kmeans_assign(vec, cents.toArray)
    (a.getField("cluster"), a.getField("sim"))
  }

  /** Count-adaptive cluster count: `min(maxK, max(minK, ceil(n /
    * target)))` — the cluster count must grow WITH the corpus so
    * expected per-cluster membership (and with it [[semanticDedup]]'s
    * within-cluster pair work, which is quadratic in membership) stays
    * ~constant. The same dial as the count-adaptive LSH bucket
    * resolution: a fixed k at 10× the corpus means 10× members per
    * cluster and 100× pair work. The `maxK` cap bounds the per-row
    * assignment cost (rows × k × dim FLOPs): past the cap, flat k-means
    * stops being the right index and the IVF/PQ operators
    * ([[Similarity.ivfTopK]], [[ProductQuantization]]) are the
    * billion-vector hand-off.
    */
  def adaptiveK(n: Long, targetClusterSize: Int, minK: Int,
                maxK: Int = 4096): Int = {
    require(targetClusterSize > 0 && minK > 0 && maxK >= minK)
    math.min(maxK.toLong, math.max(minK.toLong,
      math.ceil(n.toDouble / targetClusterSize).toLong)).toInt
  }

  /** 1-in-`mod` systematic training sample: `max(1, n / budget)` by
    * integer division, so Lloyd rounds touch ~`budget` rows regardless
    * of corpus size. Deterministic (`id % mod == 0`) so the oracle can
    * reproduce the exact training set.
    */
  def trainSampleMod(n: Long, trainBudget: Int): Int = {
    require(trainBudget > 0)
    math.max(1L, n / trainBudget).toInt
  }

  /** [[kmeansAssign]] with corpus-adaptive k (one narrow count scan up
    * front; see [[adaptiveK]]) and a bounded training sample: Lloyd
    * rounds run over ~`trainBudget` systematically-sampled rows, then
    * ONE full-corpus assignment pass. Total cost is
    * O(budget·k·dim·iters + n·k·dim) — linear in n once k hits `maxK` —
    * instead of the super-linear n·k·iters of full-corpus training.
    */
  def kmeansAssignAdaptive(corpus: DataFrame, idCol: String,
                           vecCol: String, iters: Int,
                           targetClusterSize: Int = 256,
                           minK: Int = 8, maxK: Int = 4096,
                           trainBudget: Int = 4096): DataFrame = {
    val n = corpus.count()
    kmeansAssign(corpus, idCol, vecCol,
      adaptiveK(n, targetClusterSize, minK, maxK), iters,
      trainSampleMod(n, trainBudget))
  }

  /** [[semanticDedup]] with corpus-adaptive k and sampled training
    * (see [[kmeansAssignAdaptive]]).
    */
  def semanticDedupAdaptive(corpus: DataFrame, idCol: String,
                            vecCol: String, iters: Int, minCos: Double,
                            targetClusterSize: Int = 256,
                            minK: Int = 8, maxK: Int = 4096,
                            trainBudget: Int = 4096): DataFrame = {
    val n = corpus.count()
    semanticDedup(corpus, idCol, vecCol,
      adaptiveK(n, targetClusterSize, minK, maxK), iters, minCos,
      trainSampleMod(n, trainBudget))
  }

  /** Train `k` cosine k-means centroids for `iters` Lloyd rounds and
    * return the final assignment: (idCol, cluster, sim) with `sim` the
    * 4-decimal-rounded cosine to the winning centroid.
    *
    * Seeds: the `k` lowest-id vectors OF THE TRAINING SAMPLE
    * (deterministic and cheap — a bounded sorted-limit, not a
    * sample-dependent init). Empty clusters keep their previous
    * centroid.
    *
    * `sampleMod` > 1 gates the Lloyd rounds to the 1-in-`sampleMod`
    * systematic slice (`id % sampleMod == 0`); the FULL corpus is
    * still assigned, exactly once, at the end. The full frame is read
    * once, so only the (much smaller) training slice is cached.
    */
  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int, sampleMod: Int = 1): DataFrame = {
    val cents = trainKmeans(corpus, idCol, vecCol, k, iters, sampleMod)
    val vecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("v"))
    val (cl, best) = assignCol(col("v"), cents)
    vecs.select(col("id").as(idCol), cl.as("cluster"),
      round(best, 4).as("sim"))
  }

  /** The Lloyd training loop alone: returns the final centroid matrix
    * without assigning the corpus. The coarse-quantizer build for
    * learned-cell IVF ([[Similarity.ivfKmeansTopK]]) — train once on
    * the sample, reuse the centroids across probes.
    */
  def trainKmeans(corpus: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int,
                  sampleMod: Int = 1): Seq[Array[Float]] = {
    require(k > 0 && iters >= 0 && sampleMod >= 1,
      s"need k > 0, iters >= 0, sampleMod >= 1; got $k/$iters/$sampleMod")
    val vecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("v"))
    val train =
      if (sampleMod == 1) vecs
      else vecs.filter(col("id") % sampleMod === 0)
    // one cache for the iters+1 passes the Lloyd loop makes over the
    // TRAINING slice; callers read the full frame once afterwards
    train.persist()
    try {
      val seedRows = train.orderBy(col("id")).limit(k).collect()
      require(seedRows.length == k,
        s"training sample has < $k vectors (sampleMod=$sampleMod)")
      var cents: Seq[Array[Float]] = seedRows.map(
        _.getSeq[Float](1).toArray).toSeq
      val dim = cents.head.length
      for (_ <- 1 to iters) {
        val (cl, _) = assignCol(col("v"), cents)
        // update: (cluster, dim, float-cast mean) — k·dim rows to the
        // driver; empty clusters fall back to the previous centroid
        val means = train.withColumn("cluster", cl)
          .select(col("cluster"), posexplode(col("v")).as(Seq("d", "x")))
          .groupBy("cluster", "d").agg(avg("x").cast("float").as("m"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (c, rows) =>
            val arr = new Array[Float](dim)
            rows.foreach(r => arr(r.getInt(1)) = r.getFloat(2))
            c -> arr
          }
        cents = cents.indices.map(c => means.getOrElse(c, cents(c)))
      }
      cents
    } finally train.unpersist()
  }

  /** SemDeDup-style semantic near-dup removal: within each k-means
    * cluster, a vector is dropped when a SMALLER-id cluster-mate sits
    * above `minCos` cosine. Returns the dropped rows:
    * (idCol, cluster, dup_of = smallest witness id, n_witnesses).
    *
    * Scale shape: pairs only materialize within a cluster (the k-means
    * partition bounds the candidate set — grow k with the corpus so
    * per-cluster membership stays constant, the same dial as the
    * count-adaptive LSH buckets); the pair join shuffles each side's
    * vectors once, keyed by cluster.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int, minCos: Double,
                    sampleMod: Int = 1): DataFrame = {
    val asg = kmeansAssign(corpus, idCol, vecCol, k, iters, sampleMod)
      .select(col(idCol).as("id"), col("cluster"))
    val members = asg.join(
      corpus.select(col(idCol).as("id"),
        col(vecCol).cast("array<float>").as("v")), Seq("id"))
    val a = members.select(col("cluster"), col("id").as("id_a"),
      col("v").as("v_a"))
    val b = members.select(col("cluster"), col("id").as("id_b"),
      col("v").as("v_b"))
    a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", round(exprs.cosine_sim(col("v_a"), col("v_b")), 4))
      .filter(col("cos") >= minCos)
      .groupBy(col("id_b").as(idCol), col("cluster"))
      .agg(min("id_a").as("dup_of"),
        count(lit(1)).as("n_witnesses"))
  }

  /** Semantic-diversity quota: at most `k` members per cluster, chosen
    * by deterministic id-hash order — an unbiased, reproducible
    * within-cluster subsample ("keep a representative slice of every
    * semantic neighborhood" corpus pruning, the coverage-preserving
    * complement of [[semanticDedup]]'s redundancy pruning).
    *
    * Winner selection rides [[Curation.capPerGroup]]'s bounded top-k
    * aggregate — map-side partials reduce each partition to ≤k ids per
    * cluster before the shuffle; never a full window sort. The hash
    * ordering key is unique for practical purposes (a 64-bit collision
    * WITHIN one cluster would make that one pair's tie arrival-order
    * dependent — odds ~n²/2⁶⁵ per cluster).
    */
  def clusterQuota(assigned: DataFrame, idCol: String,
                   clusterCol: String, k: Int): DataFrame =
    Curation.capPerGroup(assigned, clusterCol, idCol,
      ord = xxhash64(col(idCol)), k = k)

  /** Embedding outlier screen: per-cluster z-score of each vector's
    * centroid cosine — vectors far below their own neighborhood's
    * cohesion are corrupt embeddings, mislabeled shards, or genuinely
    * novel content; either way the rows to quarantine before they skew
    * a training mix.
    *
    * Determinism: the per-cluster moments accumulate integer sums of
    * the already-4-decimal-rounded cosine (`floor(sim·10⁴)` as long),
    * so the sums are aggregation-order independent; mean/σ/z derive
    * from those integers by a fixed IEEE formula both engines evaluate
    * identically. A double `sum(sim)` would be shuffle-order dependent.
    *
    * Scale shape: assignment is the k-means map pass, materialized ONCE
    * (`localCheckpoint`) because both the moments aggregation and the
    * final join consume it — without that the full assignment lineage
    * would recompute per branch; moments are one narrow
    * map-side-combined aggregation to k rows, broadcast back.
    * Degenerate clusters (σ = 0) flag nothing.
    */
  def embeddingOutliers(corpus: DataFrame, idCol: String, vecCol: String,
                        iters: Int = 3, targetClusterSize: Int = 256,
                        minK: Int = 8, zThresh: Double = 2.0,
                        maxK: Int = 4096,
                        trainBudget: Int = 4096): DataFrame = {
    val asg = kmeansAssignAdaptive(corpus, idCol, vecCol, iters,
      targetClusterSize, minK, maxK, trainBudget)
      .withColumn("s4", floor(col("sim") * 10000).cast("long"))
      .localCheckpoint(true)
    val st = asg.groupBy("cluster")
      .agg(count(lit(1)).as("n"), sum(col("s4")).as("s1"),
        sum(col("s4") * col("s4")).as("s2"))
    asg.join(broadcast(st), Seq("cluster"))
      .withColumn("mu", col("s1").cast("double") / col("n"))
      .withColumn("sigma",
        sqrt(col("s2").cast("double") / col("n") - col("mu") * col("mu")))
      .withColumn("zscore",
        when(col("sigma") > 0,
          round((col("s4").cast("double") - col("mu")) / col("sigma"), 4))
          .otherwise(lit(0.0)))
      .select(col(idCol), col("cluster"), col("sim"), col("zscore"),
        (col("zscore") <= -zThresh).as("is_outlier"))
  }
}
