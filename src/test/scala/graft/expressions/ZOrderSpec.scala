package graft.expressions

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Scale

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zorder_key matches a reference bit-interleave") {
    def ref(x: Long, y: Long, bits: Int): Long = {
      val m = (1L << bits) - 1
      var out = 0L
      for (b <- 0 until bits) {
        out |= (((x & m) >>> b) & 1L) << (2 * b)
        out |= (((y & m) >>> b) & 1L) << (2 * b + 1)
      }
      out
    }
    val rows = spark.range(1000)
      .select((col("id") * 7919 % 1024).as("x"), (col("id") * 104729 % 1024).as("y"))
      .withColumn("z", ZOrder.zorder_key(10, col("x"), col("y")))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, z) =>
      assert(z == ref(x, y, 10), s"($x,$y): got $z, want ${ref(x, y, 10)}")
    }
  }

  test("z-key ordering is monotone in the top interleaved bits") {
    // quadrant structure: both coords in the low half => key below both-high
    val lowLow = ZOrderImpl.interleave(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(3L, 5L)), 8)
    val highHigh = ZOrderImpl.interleave(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(200L, 220L)), 8)
    assert(lowLow < highHigh)
  }

  test("writeZOrdered keeps per-file min-max tight on BOTH dimensions") {
    // full 256x256 grid, comparable bit-widths (the documented caller
    // contract: pre-scale dimensions into comparable ranges)
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"),
        (col("id") / 256).cast("long").as("y"))
    val zdir = Files.createTempDirectory("zorder").toString
    val ldir = Files.createTempDirectory("linear").toString
    Scale.writeZOrdered(grid, zdir, bitsPerCol = 8, files = 16, "x", "y")
    // contrast layout: single-column sort — tight on x only
    grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
      .write.mode("overwrite").parquet(ldir)

    def avgFileSpread(dir: String, c: String): Double = {
      val spreads = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          spark.read.parquet(f.getAbsolutePath)
            .agg(max(col(c)) - min(col(c))).head().getLong(0).toDouble
        }
      spreads.sum / spreads.length
    }
    // 16 files over a 256x256 z-curve ~ 64x64-ish blocks: both
    // dimensions stay well under the 255 global spread
    val zX = avgFileSpread(zdir, "x")
    val zY = avgFileSpread(zdir, "y")
    val linY = avgFileSpread(ldir, "y")
    assert(zX < 0.6 * 255 && zY < 0.6 * 255,
      s"z-layout not clustered: x spread $zX, y spread $zY vs global 255")
    assert(linY > 0.9 * 255,
      s"contrast layout should leave y unclustered, got $linY")
    assert(zY < 0.6 * linY,
      s"z-layout y spread $zY not better than linear $linY")
    assert(spark.read.parquet(zdir).count() == 65536L)
  }

  test("out-of-range bits config is rejected") {
    intercept[Exception] {
      spark.range(3).select(ZOrder.zorder_key(40,
        col("id"), col("id"))).collect() // 2*40 > 63
    }
  }
}
