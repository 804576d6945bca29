package graft

import org.apache.spark.sql.SparkSession

/** Plan diagnostics: executes named queries at a fixture and prints the
  * POST-EXECUTION (AQE-final) physical-plan lines for joins, exchanges
  * and scans — the tool behind the scale notes' "which joins did AQE
  * flip to sort-merge at 10×" observations. AQE's strategy choices are
  * only visible AFTER execution (`isFinalPlan=true`), which is why this
  * runs the plan instead of calling `explain` on the logical one.
  *
  * Usage: runMain graft.PlanDiag <sfDir> <name1,name2,...>
  */
object PlanDiag {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, nameCsv) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- nameCsv.split(",").map(_.trim).filter(_.nonEmpty)) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count() // run it so AQE finalizes
      println(s"===== $name =====")
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan parquet") || l.contains("isFinalPlan"))
        .foreach(l => println(l.replaceAll("#\\d+[L]?", "").take(160)))
    }
    spark.stop()
  }
}
