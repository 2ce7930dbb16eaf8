package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <q1,q2,...> [sfDir] [outDir]`
  * prints the formatted physical plan — the review loop for checking
  * pushdown (PushedFilters/ReadSchema), join strategy (broadcast vs
  * shuffle), and WholeStageCodegen spans before trusting a query at
  * scale. With `outDir`, each plan is also written to
  * `<outDir>/<name>.txt` (one Spark session for the whole list, so
  * dumping a dozen plans costs one JVM, not twelve).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q01_pricing_summary")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    outDir.foreach(d => new java.io.File(d).mkdirs())
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // queryExecution.explainString is what explain() prints; capture
      // it so the same text can go to stdout and the plan file
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"==== $name ====")
      println(txt)
      outDir.foreach { d =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/$name.txt"), txt)
      }
      // operators that persist/localCheckpoint during CONSTRUCTION
      // leave state behind — clear it so the next plan is independent
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
