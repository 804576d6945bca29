package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Pins the fused single-pass gate statistics (VERDICT r12 #8) to the
  * legacy column formulas: on adversarial random strings — mixed ASCII
  * whitespace classes (space/tab/newline/VT/FF/CR), marker words in
  * mixed case, punctuation runs, non-ASCII code points, empties — the
  * [[TextGateStats]] struct must reproduce exactly
  * `length`, the regex alpha/punct counts, `tokenCount`, and the
  * per-language padded-contains marker scores, and the fused
  * quality/langid columns must equal the legacy ones bit-for-bit.
  * Output-invariance is what lets the hot gate queries switch to the
  * fused pass without touching any DuckDB oracle.
  */
class GateStatsSpec extends SparkSpec {

  import spark.implicits._

  private val markers = TextFunctions.DefaultMarkers

  private def legacyScores(text: org.apache.spark.sql.Column) = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    array(markers.map { case (_, ws) =>
      ws.map(w => when(padded.contains(s" $w "), 1).otherwise(0))
        .reduce(_ + _)
    }: _*)
  }

  private def randomCorpus(seed: Long, nRows: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val wsPool = " \t\n\f\r"
    val words = Seq("the", "The", "THE", "and", "der", "die", "el",
      "le", "les", "und", "que", "est", "is", "ist", "una", "une",
      "los", "das", "of", "to", "in", "thé", "Σthe", "theΣ", "résumé",
      "naïve", "foo", "bar", "baz123", "!!", "a.b,c;d:e!f?", "...",
      "x", "thekla", "android", "1234", "", "日本語", "tHe")
    (0 until nRows).map { _ =>
      val n = rnd.nextInt(30)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        sb.append(words(rnd.nextInt(words.length)))
        val wsRun = rnd.nextInt(3)
        (0 to wsRun).foreach(_ =>
          sb.append(wsPool(rnd.nextInt(wsPool.length))))
      }
      // random leading/trailing whitespace incl. pure-whitespace rows
      val lead = wsPool.take(rnd.nextInt(wsPool.length))
      val trail = wsPool.drop(rnd.nextInt(wsPool.length))
      lead + sb.toString + trail
    } ++ Seq("", " ", "\t", "\t\t", " \t ", "the", " the ", "\tthe\n",
      "the.", ".the", "der die und das ist", "el la que los una",
      "ΣΑΣ the ΒΣ", "İ the", "ｔｈｅ the")
  }

  test("fused struct reproduces every legacy count and marker score") {
    val docs = randomCorpus(20260816L, 400).toDF("text")
    val st = TextFunctions.gateStats(col("text"))
    val cmp = docs.select(
      col("text"),
      st.as("st"),
      length(col("text")).cast("long").as("n0"),
      length(regexp_replace(col("text"), "[^A-Za-z]", ""))
        .cast("long").as("alpha0"),
      length(regexp_replace(col("text"), "[^.,;:!?]", ""))
        .cast("long").as("punct0"),
      TextFunctions.tokenCount(col("text")).as("toks0"),
      legacyScores(col("text")).as("scores0"))
    val bad = cmp.filter(
      col("st.n") =!= col("n0") ||
      col("st.alpha") =!= col("alpha0") ||
      col("st.punct") =!= col("punct0") ||
      col("st.toks") =!= col("toks0") ||
      col("st.scores") =!= col("scores0"))
    val rows = bad.collect()
    assert(rows.isEmpty,
      s"fused/legacy divergence on ${rows.length} rows, e.g. " +
        rows.take(3).mkString("; "))
  }

  test("fused quality and langid equal the legacy columns bit-for-bit") {
    val docs = randomCorpus(7L, 400).toDF("text")
    val st = TextFunctions.gateStats(col("text"))
    val bad = docs.select(
        col("text"),
        TextFunctions.qualityScoreRegex(col("text")).as("q0"),
        TextFunctions.qualityScoreFromStats(st).as("q1"),
        TextFunctions.langIdContains(col("text")).as("l0"),
        TextFunctions.langIdFromStats(st).as("l1"))
      .filter(col("q0") =!= col("q1") || col("l0") =!= col("l1"))
      .collect()
    assert(bad.isEmpty, s"fused quality/langid diverged: ${bad.take(3)
      .mkString("; ")}")
  }

  test("gate stats run on the real documents fixture without diffs") {
    val docs = spark.read
      .parquet(sf("sf0.01") + "/documents.parquet")
    val st = TextFunctions.gateStats(col("text"))
    val bad = docs.select(
        TextFunctions.qualityScoreRegex(col("text")).as("q0"),
        TextFunctions.qualityScoreFromStats(st).as("q1"),
        TextFunctions.langIdContains(col("text")).as("l0"),
        TextFunctions.langIdFromStats(st).as("l1"))
      .filter(col("q0") =!= col("q1") || col("l0") =!= col("l1"))
      .count()
    assert(bad == 0L)
  }
}
