package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adversarial scale probe for the exact-substring family's hot-gram
  * cap: prepends ONE fixed 16-token boilerplate block (a license-
  * header / templated-HTML analogue) to EVERY document of a corpus,
  * then runs [[graft.operators.Dedup.exactSubstringSpans]] with the
  * default cap plus the [[graft.operators.Dedup.exactSubstringOversized]]
  * companion report. On an n-document corpus each boilerplate gram
  * occurs n times, so the UNCAPPED positional match join would
  * produce 9·n² match rows (5M docs → 2.25e14 — unrunnable); with
  * the cap those grams are excluded before the join and the probe
  * must complete in roughly the UNPLANTED corpus's time. Run against
  * /tmp/sf100 (ScaleGen copies=1000, documents-only) for the ×1000
  * BENCH_NOTES point.
  *
  * Prints one JSON line per phase: the oversized report (grams and
  * positions the cap excluded — the no-silent-caps evidence) and the
  * capped span run (row count + wall seconds).
  *
  * Usage: runMain graft.HotGramProbe [sfDir=/tmp/sf100] [maxGramFreq=1000]
  */
object HotGramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/tmp/sf100")
    val cap = args.lift(1).map(_.toInt).getOrElse(1000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val boiler = (1 to 16).map(i => s"boilergram$i").mkString(" ")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        concat(lit(boiler), lit(" "), coalesce(col("text"), lit("")))
          .as("text"))
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val over = graft.operators.Dedup.exactSubstringOversized(
      docs, "doc_id", "text", n = 8, maxGramFreq = cap).collect()(0)
    println(s"""{"probe":"oversized","docs":$nDocs,"cap":$cap,""" +
      s""""grams_dropped":${over.getAs[Long]("n_grams_dropped")},""" +
      s""""positions_dropped":${over.getAs[Long]("n_positions_dropped")},""" +
      f""""sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    val t1 = System.nanoTime()
    val spans = graft.operators.Dedup.exactSubstringSpans(
      docs, "doc_id", "text", n = 8, minTokens = 16, maxGramFreq = cap)
      .count()
    println(s"""{"probe":"capped_spans","docs":$nDocs,"cap":$cap,""" +
      s""""span_rows":$spans,""" +
      f""""sec":${(System.nanoTime() - t1) / 1e9}%.1f}""")
    spark.catalog.clearCache()
    // the documented 100-TB recompute trade (cachePositions = false:
    // no O(positions × 12 B) cache, the codegen gram pass re-runs per
    // consumer) — measured against the cached run above
    val t2 = System.nanoTime()
    val spans2 = graft.operators.Dedup.exactSubstringSpans(
      docs, "doc_id", "text", n = 8, minTokens = 16, maxGramFreq = cap,
      cachePositions = false).count()
    require(spans2 == spans,
      s"cache knob changed results: $spans2 vs $spans")
    println(s"""{"probe":"capped_spans_nocache","docs":$nDocs,""" +
      s""""cap":$cap,"span_rows":$spans2,""" +
      f""""sec":${(System.nanoTime() - t2) / 1e9}%.1f}""")
    spark.stop()
  }
}
