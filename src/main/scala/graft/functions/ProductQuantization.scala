package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.exprs

/** Product quantization for embedding search — the memory side of the
  * standard IVF+PQ recipe (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split the vector into M
  * subspaces, k-means each subspace into K codes, store M small codes
  * per vector, and answer queries with asymmetric distance computation
  * (ADC) — a per-query lookup table of partial inner products, summed
  * per code. 64 floats (256 B) become M bytes; at 100 TB that is the
  * difference between an in-memory index and not having one.
  *
  * Scale shape: codebook training touches only subvector means
  * (M·K·(dim/M) rows per round — metadata-sized, same contract as
  * [[Clustering.kmeansAssign]]); encoding is one broadcast-literal map
  * pass; the query-time join moves only (id, m, code) triples against a
  * broadcast LUT of M·K partials per query — the corpus vectors
  * themselves are read exactly once, at encode time.
  *
  * Determinism contract: subspace argmin uses `|c|² − 2·x·c` with both
  * terms computed by the same left-to-right double folds in both
  * engines, ties toward the smaller code; per-round means are
  * float-cast; the ADC sum folds partials in subspace order.
  */
object ProductQuantization {

  /** Left-to-right double dot product of two float arrays — must match
    * [[graft.expressions.DotProduct]] and DuckDB's sequential
    * `list_inner_product` exactly.
    */
  private def dotLocal(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    while (i < a.length) { d += a(i).toDouble * b(i).toDouble; i += 1 }
    d
  }

  /** Codebooks: `codebooks(m)(code)` = centroid of subspace `m`. */
  type Codebooks = Seq[IndexedSeq[Array[Float]]]

  private def subCol(vec: Column, m: Int, sub: Int): Column =
    slice(vec, m * sub + 1, sub)

  /** Argmin-code column for subspace `m` against its codebook:
    * `argmin_code (|c|² − 2·x·c)`, ties toward the smaller code.
    */
  private def codeCol(vec: Column, m: Int, sub: Int,
                      cb: IndexedSeq[Array[Float]]): Column = {
    val x = subCol(vec, m, sub)
    val dists = array(cb.map { c =>
      lit(dotLocal(c, c)) -
        lit(2.0) * exprs.dot_product(x, typedLit(c.toSeq))
    }: _*)
    array_position(dists, array_min(dists)).cast("int") - 1
  }

  /** Train per-subspace codebooks: seeds = the K lowest-id subvectors,
    * `iters` Lloyd rounds with float-cast per-dim means; empty codes
    * keep their previous centroid. One update shuffle per round covers
    * ALL subspaces (the M assignment columns ride one projection).
    */
  def trainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int): Codebooks = {
    val vecs = corpus.select(col(idCol).as("id"),
      col(vecCol).cast("array<float>").as("v"))
    vecs.persist()
    try {
      val dim = vecs.head().getSeq[Float](1).length
      require(dim % m == 0, s"dim $dim not divisible by $m subspaces")
      val sub = dim / m
      val seedRows = vecs.orderBy(col("id")).limit(k).collect()
      require(seedRows.length == k, s"corpus has < $k vectors")
      var books: Codebooks = (0 until m).map { mi =>
        seedRows.map(r => r.getSeq[Float](1)
          .slice(mi * sub, (mi + 1) * sub).toArray).toIndexedSeq
      }
      for (_ <- 1 to iters) {
        // one frame holding every (subspace, code, dim, x): M narrow
        // unions -> a single (m, code, d) mean aggregate
        val parts = (0 until m).map { mi =>
          vecs.select(lit(mi).as("m"),
            codeCol(col("v"), mi, sub, books(mi)).as("code"),
            posexplode(subCol(col("v"), mi, sub)).as(Seq("d", "x")))
        }
        val means = parts.reduce(_ unionByName _)
          .groupBy("m", "code", "d").agg(avg("x").cast("float").as("mu"))
          .collect()
          .groupBy(r => (r.getInt(0), r.getInt(1)))
          .map { case ((mi, code), rows) =>
            val arr = new Array[Float](sub)
            rows.foreach(r => arr(r.getInt(2)) = r.getFloat(3))
            (mi, code) -> arr
          }
        books = books.zipWithIndex.map { case (cb, mi) =>
          cb.zipWithIndex.map { case (c, code) =>
            means.getOrElse((mi, code), c)
          }
        }
      }
      books
    } finally vecs.unpersist()
  }

  /** Encode each vector as its M subspace codes: (idCol, codes). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             books: Codebooks): DataFrame = {
    val m = books.size
    val sub = books.head.head.length
    val v = col(vecCol).cast("array<float>")
    corpus.select(col(idCol),
      array((0 until m).map(mi => codeCol(v, mi, sub, books(mi))): _*)
        .as("codes"))
  }

  /** ADC top-k: approximate inner-product search over PQ codes.
    * Returns (query_id, rank, neighbor_id, score) with the approximate
    * dot rounded to 4 decimals, rank by (score desc, id asc).
    */
  def adcTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, m: Int, k: Int, iters: Int,
              topK: Int): DataFrame = {
    import spark.implicits._
    val books = trainCodebooks(corpus, idCol, vecCol, m, k, iters)
    val sub = books.head.head.length

    // per-query LUT: M·K partial dots, built from the tiny query set
    val cbDf = books.zipWithIndex.flatMap { case (cb, mi) =>
      cb.zipWithIndex.map { case (c, code) => (mi, code, c.toSeq) }
    }.toDF("m", "code", "centroid")
    // the slice offset depends on m, so compute the partial with a
    // conditional chain over the M known subspaces
    val qv = col("qv")
    val pdExpr = (0 until m).foldLeft(lit(0.0)) { (acc, mi) =>
      when(col("m") === mi,
        exprs.dot_product(subCol(qv, mi, sub), col("centroid")))
        .otherwise(acc)
    }
    val lutFull = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<float>").as("qv"))
      .crossJoin(broadcast(cbDf))
      .select(col("query_id"), col("m"), col("code"), pdExpr.as("pd"))

    val codes = encode(corpus, idCol, vecCol, books)
      .select(col(idCol).as("neighbor_id"),
        posexplode(col("codes")).as(Seq("m", "code")))

    val scored = codes
      .join(broadcast(lutFull), Seq("m", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(round(aggregate(
        sort_array(collect_list(struct(col("m"), col("pd")))),
        lit(0.0), (acc, x) => acc + x.getField("pd")), 4).as("score"))

    val ord = round(col("score") * 10000).cast("long") * lit(1L << 40) -
      col("neighbor_id")
    scored.groupBy("query_id")
      .agg(graft.expressions.TopKBy.top_k_by(ord, col("neighbor_id"),
        topK).as("ids"))
      .select(col("query_id"),
        posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .withColumn("rank", col("pos") + 1)
      .join(scored, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("score"))
  }

  /** ADC shortlist + exact rerank — the production PQ pattern: the
    * quantized index nominates `shortlist` candidates per query (all
    * the corpus-vector bytes stay out of it), then the exact inner
    * product is computed for candidates ONLY (a |shortlist|-sized
    * vector join, not a corpus scan) and the final top-k is ranked on
    * it. Recovers most of the recall PQ distortion loses while keeping
    * query cost independent of corpus width.
    */
  def adcTopKRefined(spark: SparkSession, corpus: DataFrame,
                     queries: DataFrame, idCol: String, vecCol: String,
                     m: Int, k: Int, iters: Int, topK: Int,
                     shortlist: Int): DataFrame = {
    require(shortlist >= topK)
    val cand = adcTopK(spark, corpus, queries, idCol, vecCol, m, k,
        iters, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val qv = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<float>").as("qv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<float>").as("cv"))
    val exact = cand
      .join(cv, Seq("neighbor_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("score",
        round(exprs.dot_product(col("qv"), col("cv")), 4))
      .select("query_id", "neighbor_id", "score")
    val ord = round(col("score") * 10000).cast("long") * lit(1L << 40) -
      col("neighbor_id")
    exact.groupBy("query_id")
      .agg(graft.expressions.TopKBy.top_k_by(ord, col("neighbor_id"),
        topK).as("ids"))
      .select(col("query_id"),
        posexplode(col("ids")).as(Seq("pos", "neighbor_id")))
      .withColumn("rank", col("pos") + 1)
      .join(exact, Seq("query_id", "neighbor_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("score"))
  }
}
