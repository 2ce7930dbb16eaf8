package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Smoke: every SparkEntry query runs at sf0.001 and returns rows;
  * oracle keys are a subset of query keys; the flagship entry works.
  * (Value-level correctness is the driver's DuckDB compare —
  * replayed locally via scripts/check.py.)
  */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val sfDir = "/root/testdata/sf0.001"

  test("oracleSql keys ⊆ queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs and returns rows at sf0.001") {
      assert(fn(spark, sfDir).count() > 0, s"$name returned no rows")
    }
  }

  test("q55 fixture shape: props is uniform unquoted-int {\"k\": n}") {
    // q55's Spark/DuckDB parity depends on the props column never
    // holding quoted numbers or malformed JSON (see EventsQ q55
    // comment). Assert the typed parse succeeds on EVERY row so a
    // future datagen change fails here, loudly, not as a silent
    // oracle divergence.
    import org.apache.spark.sql.functions._
    val ev = graft.queries.QueryUtil.tbl(spark, sfDir, "events")
      .select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
        .getField("k").as("k"), col("props"))
    assert(ev.filter(col("k").isNull).count() == 0L,
      "events.props no longer parses as typed {k: BIGINT} on every row")
  }
}
