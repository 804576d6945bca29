package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the lakehouse maintenance op every
  * long-running ingest needs: streaming/incremental writers leave
  * thousands of KB-sized files per table, and at 100 TB the resulting
  * task-per-file scheduling and footer-read overhead dominate scan cost
  * long before the data does.
  *
  * [[compact]] rewrites a parquet directory into
  * `ceil(totalBytes / targetFileBytes)` files via
  * [[CommitWriter.overwriteAtomic]], so a crash mid-compaction leaves
  * either the old layout or the new one, never a mix — readers are
  * isolated to the commit's 2-rename metadata window. Row-identical by
  * construction (a repartition is a pure exchange); the spec asserts
  * content equality and the file-count bound.
  *
  * Sizing note: file count comes from the CURRENT on-disk bytes, which
  * for parquet→parquet round-trips is the right estimator (same
  * encoder, same compression family). A `sortBy` layout concern is
  * [[Scale.writeZOrdered]]'s job — compaction deliberately only fixes
  * file granularity.
  */
object Compaction {

  /** Bytes of data files currently under `path` (ignores hidden/_ files). */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else
      fs.listStatus(p).iterator
        .filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getLen).sum
  }

  /** Number of data files currently under `path`. */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else
      fs.listStatus(p).count(s => s.isFile &&
        !s.getPath.getName.startsWith(".") &&
        !s.getPath.getName.startsWith("_"))
  }

  /** Rewrite `path` into ~`targetFileBytes` files. Returns the new file
    * count. No-op (returns current count) when the layout is already at
    * or below the target count — don't churn bytes for nothing.
    */
  def compact(spark: SparkSession, path: String,
              targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0)
    val bytes = dataBytes(spark, path)
    val targetFiles =
      math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val current = dataFileCount(spark, path)
    if (current <= targetFiles) current
    else {
      val df = spark.read.parquet(path).repartition(targetFiles)
      CommitWriter.overwriteAtomic(df, path)
      dataFileCount(spark, path)
    }
  }
}
