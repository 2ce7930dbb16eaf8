package graft

import org.apache.spark.sql.SparkSession

/** Repeat-timing harness: `runMain graft.Profile <q1,q2,...> [sfDir] [reps]`
  * runs each named query `reps` times in one session and prints every
  * wall time. Separates per-query fixed cost (first run: codegen,
  * footer reads) from steady-state cost (later runs) — the number that
  * actually projects to a long-lived cluster.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq("q01_pricing_summary")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    // validate names up front: a typo should list what IS available,
    // not abort the whole run with a bare key-not-found
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      System.err.println("available: " +
        SparkEntry.queries.keySet.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    // same default as Bench so steady-state times are comparable to
    // BENCH_r*.json; override via SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // one failing rep records the failure and moves on (same
        // contract as Bench) instead of dropping remaining queries
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[profile] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")} s")
    }
    spark.stop()
  }
}
