package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

import graft.expressions.{CosineSim, MinHashSig, ShingleHashes, SimHash64, SortedArrayJaccard, TopKByAgg}

/** Session extension registering the engine's native expressions for SQL
  * use (`SELECT simhash64(text) FROM docs`), via the standard
  * `SparkSessionExtensions` hook:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)

    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      exprs => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      exprs => MinHashSig(exprs.head, 3, 16)))
    e.injectFunction((FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes"), exprs => ShingleHashes(exprs.head, 3)))
    e.injectFunction((FunctionIdentifier("sorted_array_jaccard"),
      info("sorted_array_jaccard"),
      exprs => SortedArrayJaccard(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      exprs => CosineSim(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("top_k_by"), info("top_k_by"),
      exprs => TopKByAgg(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue())))
  }
}

/** Runtime registration for an already-running session (notebooks,
  * shells) — same functions as [[GraftExtensions]], no restart needed.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      exprs => MinHashSig(exprs.head, 3, 16), "scala_udf")
    reg.createOrReplaceTempFunction("shingle_hashes",
      exprs => ShingleHashes(exprs.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction("sorted_array_jaccard",
      exprs => SortedArrayJaccard(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("top_k_by",
      exprs => TopKByAgg(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue())
        .toAggregateExpression(), "scala_udf")
  }
}

/** Canonical session factory with the engine's scale-tuned defaults.
  * Local mode sizes shuffle partitions to the core count; cluster mode
  * (any non-local master) keeps AQE coalescing in charge instead of a
  * static 200.
  */
object GraftSession {
  def builder(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val cores =
      if (master.startsWith("local")) Runtime.getRuntime.availableProcessors()
      else 200
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long + convert
      // (Tables.load) instead of failing the scan
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
