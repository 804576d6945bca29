package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a many-file table, content-identical") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(10000).select(col("id"),
      (col("id") % 97).as("v"))
    df.repartition(64).write.parquet(dir) // fragmented layout
    assert(Compaction.dataFileCount(spark, dir) == 64)

    val after = Compaction.compact(spark, dir,
      targetFileBytes = Compaction.dataBytes(spark, dir) / 4)
    assert(after <= 8 && after >= 1,
      s"expected ~4-file layout, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty,
      "compaction must be content-identical")
  }

  test("already-compact layouts are left untouched (no churn)") {
    val dir = Files.createTempDirectory("compact2").toString + "/t"
    spark.range(100).coalesce(1).write.parquet(dir)
    val fileBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val mtime = fileBefore.lastModified()
    val n = Compaction.compact(spark, dir, targetFileBytes = 1L << 30)
    assert(n == 1)
    val fileAfter = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    assert(fileAfter.lastModified() == mtime &&
      fileAfter.getName == fileBefore.getName,
      "no-op compaction must not rewrite files")
  }
}
