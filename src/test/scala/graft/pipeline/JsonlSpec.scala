package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl read splits good rows from corrupt lines, losing neither") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr", "extra": 9}""",
      """{"doc_id": "NaN-ish", "text": "bad id type"}""",
      """not json at all""",
      """{"doc_id": 4, "text": null, "lang": "de"}""",
      """{"truncated": """)
    Files.writeString(
      java.nio.file.Paths.get(s"$dir/part0.jsonl"), lines.mkString("\n"))

    val (good, bad) = Ingest.readJsonl(spark, s"$dir/part0.jsonl", schema,
      s"$dir/stage")
    val ids = good.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 4L),
      "well-typed rows parse (unknown extra fields ignored, nulls kept)")
    assert(good.columns.toSeq == Seq("doc_id", "text", "lang"))
    val rawBad = bad.as[String].collect().toSeq
    assert(rawBad.size == 3, s"3 corrupt lines routed, got $rawBad")
    assert(rawBad.exists(_.contains("not json at all")))
    // conservation: every input line is in exactly one side
    assert(good.count() + bad.count() == lines.size)
  }

  test("predeclared _corrupt_record is rejected") {
    val dir = Files.createTempDirectory("graft-jsonl2").toString
    intercept[IllegalArgumentException] {
      Ingest.readJsonl(spark, s"$dir/x.jsonl",
        StructType(Seq(StructField("_corrupt_record", StringType))),
        s"$dir/stage")
    }
  }
}
