package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CommitWriterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("commit-writer").toString

  test("overwriteAtomic replaces contents; reader sees new data") {
    val dir = tmpDir()
    val path = s"$dir/dim"
    Seq((1L, "a"), (2L, "b")).toDF("pk", "v").write.parquet(path)
    CommitWriter.overwriteAtomic(
      Seq((1L, "a2"), (3L, "c")).toDF("pk", "v"), path)
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a2"), (3L, "c")))
    // no temp/trash leftovers
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(".dim."))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("mid-write failure leaves the original dimension readable") {
    val dir = tmpDir()
    val path = s"$dir/dim"
    Seq((1L, "orig")).toDF("pk", "v").write.parquet(path)
    // a frame that fails at EXECUTION time (after the write job starts)
    val poison = spark.range(10).select(
      col("id").as("pk"),
      assert_true(col("id") < 5).cast("string").as("v"))
    intercept[Exception] {
      CommitWriter.overwriteAtomic(poison, path)
    }
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "orig")), "original must survive a failed write")
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(".dim."))
    assert(leftovers.isEmpty, s"temp not cleaned: ${leftovers.mkString(",")}")
  }

  test("scd1InPlace: read-modify-overwrite against the same path") {
    val dir = tmpDir()
    val path = s"$dir/dim"
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("pk", "name", "bal")
      .write.parquet(path)
    val updates = Seq((2L, "b2", 25.0), (3L, "c", 30.0))
      .toDF("pk", "name", "bal")
    CommitWriter.scd1InPlace(spark, path, updates, "pk")
    val got = spark.read.parquet(path)
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
  }

  test("recover restores a displaced original after a swap-window crash") {
    val dir = tmpDir()
    val path = s"$dir/dim"
    Seq((1L, "orig")).toDF("pk", "v").write.parquet(path)
    // simulate a crash between the two renames: target displaced to
    // trash, temp still present, nothing published
    val f = new java.io.File(path)
    assert(f.renameTo(new java.io.File(s"$dir/.dim.old-deadbeef")))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/.dim.tmp-deadbeef"))
    assert(CommitWriter.recover(spark, path))
    val got = spark.read.parquet(path).as[(Long, String)].collect().toSet
    assert(got == Set((1L, "orig")))
    val leftovers = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith(".dim."))
    assert(leftovers.isEmpty)
    // idempotent when healthy
    assert(!CommitWriter.recover(spark, path))
  }
}
