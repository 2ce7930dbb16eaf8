package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.{DirBacking, FileBacking, KvFilePartition, KvRunsPartition, KvScanBuilder, KvSegment, KvStore}

/** DataSource V2 connector spec: key predicates push into the source
  * and prune the scan to the matched range (the reference's
  * SeekType::UsingTheIndex, reader_util.rs:263-415), projection
  * pushdown reaches the reader, and the matched range splits into
  * parallel partitions (the reference leaf was 1-partition).
  */
class KvSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val df = {
    KvStore.register("t", (0L until 100000L).map(i => i -> s"v$i"))
    spark.read.format("graft.sources.KvSource").option("name", "t").load()
  }

  test("key range predicates prune the scan to the matched slice") {
    val got = df.filter(col("k") >= 1000 && col("k") < 2000)
      .agg(count(lit(1)), min(col("k")), max(col("k"))).head()
    assert(got.getLong(0) == 1000 && got.getLong(1) == 1000L &&
      got.getLong(2) == 1999L)
    assert(KvStore.lastScan("t") == (("UsingTheIndex", 1000L)))
  }

  test("equality predicate reads exactly one key; value filters stay residual") {
    val r = df.filter(col("k") === 42 && col("v").startsWith("v4")).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(42L))
    assert(KvStore.lastScan("t") == (("UsingTheIndex", 1L)))
  }

  test("unbounded scan is a full table scan with parallel partitions") {
    assert(df.count() == 100000L)
    assert(KvStore.lastScan("t") == (("FullTableScan", 100000L)))
    assert(df.rdd.getNumPartitions == 4) // matched slice splits 4-way
  }

  test("strict bounds at Long extremes match zero rows, not the full table") {
    // k > Long.MaxValue can match nothing; a wrapping `v + 1` fold
    // would widen this pushed range to the whole table
    assert(df.filter(col("k") > Long.MaxValue).count() == 0L)
    assert(KvStore.lastScan("t")._2 == 0L)
    assert(df.filter(col("k") < Long.MinValue).count() == 0L)
    assert(KvStore.lastScan("t")._2 == 0L)
  }

  test("readers consume slices shipped in the partition, not driver state") {
    // matched rows ride inside each InputPartition: values come back
    // correct even though the executor-side reader never calls KvStore
    val rows = df.filter(col("k") >= 7 && col("k") <= 9).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq ==
      Seq((7L, "v7"), (8L, "v8"), (9L, "v9")))
  }

  test("projection pushdown reaches the reader") {
    val plan = df.select(col("k")).filter(col("k") < 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangeScan") && plan.contains("cols=k"), plan)
  }

  // ---- durable segment backing --------------------------------------

  private lazy val segPath = {
    val dir = java.nio.file.Files.createTempDirectory("gkvseg").toString
    val p = s"$dir/t.seg"
    KvSegment.write(p, (0L until 50000L).map(i =>
      i -> (if (i % 1000 == 7) null else s"v$i")))
    p
  }

  private lazy val fdf = spark.read.format("graft.sources.KvSource")
    .option("path", segPath).load()

  test("durable segment: range scan prunes and survives a fresh planner") {
    val got = fdf.filter(col("k") >= 300 && col("k") < 700)
      .agg(count(lit(1)), min(col("k")), max(col("k"))).head()
    assert(got.getLong(0) == 400 && got.getLong(1) == 300L && got.getLong(2) == 699L)
    assert(KvStore.lastScan(segPath) == (("UsingTheIndex", 400L)))
    // Simulate a driver restart: drop every cached key index and
    // re-plan purely from the file on disk.
    KvSegment.invalidate()
    assert(fdf.filter(col("k") === 123).select(col("v")).head().getString(0) == "v123")
    assert(KvStore.lastScan(segPath) == (("UsingTheIndex", 1L)))
  }

  test("durable segment: NULL values round-trip and full scans parallelize") {
    assert(fdf.count() == 50000L)
    assert(KvStore.lastScan(segPath) == (("FullTableScan", 50000L)))
    assert(fdf.rdd.getNumPartitions == 4)
    val nulls = fdf.filter(col("v").isNull).agg(count(lit(1)), min(col("k"))).head()
    assert(nulls.getLong(0) == 50L && nulls.getLong(1) == 7L)
  }

  test("durable segment: task payload is (path, range), never rows") {
    val b = new KvScanBuilder(FileBacking(segPath))
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThan}
    b.pushFilters(Array(GreaterThanOrEqual("k", 10L), LessThan("k", 40010L)))
    val parts = b.build().toBatch.planInputPartitions()
    assert(parts.length == 4)
    val fps = parts.map(_.asInstanceOf[KvFilePartition])
    assert(fps.map(p => p.until - p.from).sum == 40000)
    assert(fps.forall(_.path == segPath))
    // Serialized partition stays O(1) no matter how wide the range is.
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(fps.head); oos.close()
    assert(bos.size() < 1024, s"partition payload ${bos.size()} bytes")
  }

  // ---- multi-segment tables (growth path) ---------------------------

  private def threeSegments(): String = {
    val dir = java.nio.file.Files.createTempDirectory("gkvdir").toString
    KvSegment.appendSegment(dir, (0L until 100L).map(i => i -> s"a$i"))
    KvSegment.appendSegment(dir, (50L until 150L).map(i => i -> s"b$i"))
    KvSegment.appendSegment(dir, (120L until 130L).map(i => i -> s"c$i"))
    dir
  }

  private lazy val segDir = threeSegments()
  private lazy val ddf = spark.read.format("graft.sources.KvSource")
    .option("dir", segDir).load()

  test("multi-segment: newest segment shadows older ones per key") {
    assert(ddf.count() == 150L)
    assert(KvStore.lastScan(segDir) == (("FullTableScan", 150L)))
    val m = ddf.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m.size == 150)
    assert(m(10L) == "a10")   // only in oldest
    assert(m(60L) == "b60")   // seg2 shadows seg1
    assert(m(125L) == "c125") // seg3 shadows seg2
    assert(m(149L) == "b149") // seg3's narrow range doesn't over-shadow
  }

  test("multi-segment: range scan reads only matching slices of " +
      "matching segments") {
    val got = ddf.filter(col("k") >= 55 && col("k") <= 124).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // 55..119 visible from seg2, 120..124 from seg3; seg1's 55..99 are
    // all shadowed by seg2
    assert(got.size == 70)
    assert(got(55L) == "b55" && got(119L) == "b119" &&
      got(120L) == "c120" && got(124L) == "c124")
    assert(KvStore.lastScan(segDir) == (("UsingTheIndex", 70L)))
    // plan-level: the fully-shadowed oldest segment contributes NO
    // partition, and the runs cover exactly the 70 visible rows
    val b = new KvScanBuilder(DirBacking(segDir))
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
    b.pushFilters(Array(GreaterThanOrEqual("k", 55L),
      LessThanOrEqual("k", 124L)))
    val parts = b.build().toBatch.planInputPartitions()
      .map(_.asInstanceOf[KvRunsPartition])
    val names = parts.map(p => new java.io.File(p.path).getName).toSet
    assert(names == Set("000002.seg", "000003.seg"), names)
    val rows = parts.map(p =>
      p.starts.zip(p.ends).map { case (s, e) => e - s }.sum).sum
    assert(rows == 70)
  }

  test("multi-segment: compaction folds to one segment preserving the " +
      "merged view, crash-safely ordered") {
    val dir = threeSegments()
    def load() = spark.read.format("graft.sources.KvSource")
      .option("dir", dir).load()
    val before = load().collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val merged = KvSegment.compact(dir)
    // publish-then-delete: the merged file is the next sequence number,
    // so even a crash before the deletes reads the same state
    assert(new java.io.File(merged).getName == "000004.seg")
    assert(KvSegment.listSegments(dir) == Seq(merged))
    KvSegment.invalidate() // fresh-driver replan from disk
    // scans planned AFTER compaction read the identical merged view
    // (an already-planned scan pins the old files — see compact's
    // scaladoc; that is the parquet-rewrite contract too)
    val d = load()
    val after = d.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(after == before)
    assert(d.filter(col("k") === 125).head().getString(1) == "c125")
    assert(KvStore.lastScan(dir) == (("UsingTheIndex", 1L)))
  }

  test("durable segment: write is atomic-publish and rewrite invalidates the cache") {
    val dir = java.nio.file.Files.createTempDirectory("gkvseg2").toString
    val p = s"$dir/u.seg"
    KvSegment.write(p, Seq(1L -> "a", 2L -> "b"))
    val d = spark.read.format("graft.sources.KvSource").option("path", p).load()
    assert(d.count() == 2L)
    assert(!new java.io.File(p + ".tmp").exists())
    KvSegment.write(p, (0L until 10L).map(i => i -> s"w$i"))
    assert(d.count() == 10L) // (length, mtime)-stamped cache re-reads
  }
}
