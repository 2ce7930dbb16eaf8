package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection: `runMain graft.Explain <queryName> [sfDir]`
  * prints the formatted physical plan — the review loop for checking
  * pushdown (PushedFilters/ReadSchema), join strategy (broadcast vs
  * shuffle), and WholeStageCodegen spans before trusting a query at
  * scale.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q01_pricing_summary")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
