package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Clustering, Curation, Dedup, Packing,
  Sampling, TextFunctions}

/** Stage-attributed wall clock for the composed training-set pipelines
  * (VERDICT r9 #5): `training_mix` (minhash dedup → langid/quality
  * gate → stratified sample → pack) and `training_mix_semantic`
  * (semantic dedup → linear gate → pack), measured as CUMULATIVE
  * prefixes — stage K's attributed cost is wall(prefix K) −
  * wall(prefix K−1), each prefix forced end-to-end with a noop write
  * so column pruning can't skip work. One JSON line to stdout.
  *
  * Env: SPARK_GRAFT_SF_DIR (fixture), SPARK_GRAFT_CPUS (default 32).
  */
object MixBench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs = Tables.load(spark, sfDir, "documents")
    def embs = Tables.load(spark, sfDir, "embeddings")

    // by-name: stages like connectedComponents do EAGER work (persist
    // + count + label-prop rounds) at construction — that work must
    // land inside the timer, so the frame is built here, not at the
    // call site
    def force(mk: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val df = mk
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1000000L
    }

    // ---- training_mix prefixes (each rebuilt from scratch) ----------
    def mixDrops = Dedup.connectedComponents(
        Dedup.minHashCandidates(docs, "doc_id", "text")
          .filter(col("est_jaccard") >= 0.5), "id_a", "id_b")
      .filter(col("rep_id") =!= col("doc_id")).select("doc_id")
    def mixGated = docs.select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("lang_pred"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .join(mixDrops, Seq("doc_id"), "left_anti")
      .filter(col("quality") >= 0.5)
    def mixSampled = Sampling.sampleStratified(mixGated, "doc_id",
      col("lang_pred"), Map("en" -> 0.5), defaultRate = 0.9)
    def mixPacked = Packing.packForTraining(mixSampled, "doc_id",
        TextFunctions.subwordCount(col("text")),
        budgetTokens = 2048, shardSize = 100)
      .select("doc_id", "lang_pred", "quality", "n_tokens", "shard",
        "pack_in_shard", "pack_offset")

    val m1 = force(mixDrops)
    val m2 = force(mixGated)
    val m3 = force(mixSampled)
    val m4 = force(mixPacked)
    val outRows = mixPacked.count()

    // ---- training_mix_semantic prefixes -----------------------------
    def semDrops = Clustering.semanticDedupAdaptive(embs, "vec_id",
        "embedding", iters = 3, minCos = 0.4,
        targetClusterSize = 256, minK = 8)
      .select(col("vec_id").as("doc_id"))
    def semGated = {
      val quality = TextFunctions.qualityScore(col("text"))
      val lenNorm = least(TextFunctions.tokenCount(col("text"))
        .cast("double") / lit(256.0), lit(1.0))
      docs.join(semDrops, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("text"),
          Curation.linearKeepProb(-1.4, quality -> 2.2,
            lenNorm -> 1.1).as("keep_prob"))
        .filter(col("keep_prob") >= 0.5)
    }
    def semPacked = Packing.packForTraining(semGated, "doc_id",
        TextFunctions.subwordCount(col("text")),
        budgetTokens = 2048, shardSize = 100)
      .select("doc_id", "keep_prob", "n_tokens", "shard",
        "pack_in_shard", "pack_offset")

    val s1 = force(semDrops)
    val s2 = force(semGated)
    val s3 = force(semPacked)
    val semRows = semPacked.count()

    // raw differences — a small negative stage at tiny SF is honest
    // JIT/warmup noise, not something to clamp away
    def sec(ms: Long): Double = ms / 1000.0
    println(
      s"""{"metric":"mix_stages","sf":"$sfDir",""" +
      s""""training_mix":{"total_sec":${sec(m4)},"out_rows":$outRows,""" +
      s""""stages":{"dedup":${sec(m1)},"gate":${sec(m2 - m1)},""" +
      s""""sample":${sec(m3 - m2)},"pack":${sec(m4 - m3)}},""" +
      s""""prefix_walls":{"dedup":${sec(m1)},"gate":${sec(m2)},""" +
      s""""sample":${sec(m3)},"pack":${sec(m4)}}},""" +
      s""""training_mix_semantic":{"total_sec":${sec(s3)},""" +
      s""""out_rows":$semRows,""" +
      s""""stages":{"semdedup":${sec(s1)},"gate":${sec(s2 - s1)},""" +
      s""""pack":${sec(s3 - s2)}},""" +
      s""""prefix_walls":{"semdedup":${sec(s1)},"gate":${sec(s2)},""" +
      s""""pack":${sec(s3)}}}}""")
    spark.stop()
  }
}
