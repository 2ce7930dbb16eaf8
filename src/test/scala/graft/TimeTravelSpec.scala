package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.engine._

/** Time travel over the engine's versioned COW tables: snapshot reads
  * via `tableAsOf` and `SELECT … VERSION AS OF n`, the
  * `SHOW VERSIONS FOR t` history listing, the retention window
  * (default 2 = reader grace only; raised via `setVersionRetention`),
  * and durability of retained history across an engine restart.
  * The reference has no versioned storage at all — this is a pure
  * scale extension: retained snapshots cost O(changed files) because
  * the file-pruned COW path hard-links carried files. */
class TimeTravelSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshEngine(): (GraftEngine, String) = {
    val dir = Files.createTempDirectory("graft_tt_").toString
    val e = new GraftEngine(spark, dir)
    e.sql("create schema tt")
    e.sql("use tt")
    (e, dir)
  }

  private def ids(e: GraftEngine, q: String): Seq[Long] =
    e.query(q).collect().map(_.getLong(0)).toSeq.sorted

  test("snapshots capture each mutation; VERSION AS OF replays them") {
    val (e, _) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table t (id int, v int, PRIMARY KEY(id))")
    e.sql("insert into t values (1, 10), (2, 20), (3, 30)") // v1
    e.sql("update t set v = 99 where id = 2")               // v2
    e.sql("delete from t where id = 3")                     // v3
    // current image
    assert(ids(e, "select id from t") == Seq(1L, 2L))
    // v1: all three rows, pre-update value
    assert(ids(e, "select id from t version as of 1") == Seq(1L, 2L, 3L))
    assert(e.query("select v from t version as of 1 where id = 2")
      .collect().head.getLong(0) == 20L)
    // v2: update applied, delete not yet
    assert(e.query("select v from t version as of 2 where id = 2")
      .collect().head.getLong(0) == 99L)
    assert(ids(e, "select id from t version as of 2") == Seq(1L, 2L, 3L))
    // API twin
    assert(e.tableAsOf("t", 1).count() == 3L)
    assert(e.tableAsOf("tt.t", 3).count() == 2L)
  }

  test("snapshot diff: join a table against its own past version") {
    val (e, _) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table d (id int, v int, PRIMARY KEY(id))")
    e.sql("insert into d values (1, 1), (2, 2)")
    e.sql("update d set v = 7 where id = 1")
    val diff = e.query(
      """select cur.id from d cur
        |join d version as of 1 old on cur.id = old.id
        |where cur.v <> old.v""".stripMargin).collect()
    assert(diff.map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("default retention keeps reader grace only; GC'd version errors") {
    val (e, _) = freshEngine()
    e.sql("create table g (id int, v int, PRIMARY KEY(id))")
    // at the floor, INSERT appends in place (no version churn) —
    // only COW mutations commit versions
    e.sql("insert into g values (1, 0), (2, 0), (3, 0)") // still v0
    assert(e.query("show versions for g").collect().length == 1)
    e.sql("update g set v = 1 where id = 1") // v1
    e.sql("update g set v = 2 where id = 2") // v2 -> v0 GC'd (retain 2)
    val err = intercept[GraftException] {
      e.query("select * from g version as of 0").collect()
    }
    assert(err.getMessage.contains("retention"))
    // the grace version (v1) is still readable
    assert(ids(e, "select id from g version as of 1") == Seq(1L, 2L, 3L))
    // future versions never resolve
    intercept[GraftException] { e.tableAsOf("g", 99) }
  }

  test("retention floor is 2") {
    val (e, _) = freshEngine()
    intercept[GraftException] { e.setVersionRetention(1) }
  }

  test("SHOW VERSIONS lists the window, newest first, current marked") {
    val (e, _) = freshEngine()
    e.setVersionRetention(3)
    e.sql("create table h (id int, PRIMARY KEY(id))")
    (1 to 4).foreach(i => e.sql(s"insert into h values ($i)")) // v1..v4
    val r = e.query("show versions for h").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(4L, 3L, 2L)) // v1 GC'd
    assert(r.head.getString(4) == "YES") // newest is current
    assert(r.tail.forall(_.getString(4) == "NO"))
    assert(r.forall(_.getString(1) == "YES")) // all committed
    assert(r.forall(_.getLong(2) > 0L))       // each has data files
  }

  test("retained history survives an engine restart") {
    val (e, wh) = freshEngine()
    e.setVersionRetention(5)
    e.sql("create table r (id int, v int, PRIMARY KEY(id))")
    e.sql("insert into r values (1, 1)")   // v1
    e.sql("update r set v = 2 where id = 1") // v2
    e.sql("update r set v = 3 where id = 1") // v3
    // retention is a constructor option so load-time reconcile
    // already honors it (a setter would run too late)
    val e2 = new GraftEngine(spark, wh, initialRetention = 5)
    e2.sql("use tt")
    assert(e2.query("select v from r version as of 1").collect()
      .head.getLong(0) == 1L)
    assert(e2.query("select v from r version as of 2").collect()
      .head.getLong(0) == 2L)
    assert(e2.query("select v from r").collect().head.getLong(0) == 3L)
  }

  test("restart with default retention trims history to the window") {
    val (e, wh) = freshEngine()
    e.setVersionRetention(5)
    e.sql("create table w (id int, PRIMARY KEY(id))")
    (1 to 4).foreach(i => e.sql(s"insert into w values ($i)")) // v1..v4
    // new engine, default retention 2: reconcile GCs v1, v2
    val e2 = new GraftEngine(spark, wh)
    e2.sql("use tt")
    assert(e2.query("show versions for w").collect()
      .map(_.getLong(0)).toSeq == Seq(4L, 3L))
    intercept[GraftException] {
      e2.query("select * from w version as of 2").collect()
    }
  }

  test("snapshot presents the schema as written (pre-ALTER)") {
    val (e, _) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table s (id int, PRIMARY KEY(id))")
    e.sql("insert into s values (1)")          // v1: (id)
    e.sql("alter table s add column extra int")
    e.sql("insert into s values (2, 22)")      // v2 catalog-only; insert -> new v
    val v1 = e.tableAsOf("s", 1)
    assert(v1.columns.toSeq == Seq("id"))
    assert(!v1.columns.contains("rowid"))
    assert(e.query("select id, extra from s").collect().length == 2)
  }

  test("changes(): row-level CDC between retained versions") {
    val (e, _) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table c (id int, v int, PRIMARY KEY(id))")
    e.sql("insert into c values (1, 10), (2, 20), (3, 30)") // v1
    e.sql("update c set v = 99 where id = 2")               // v2
    e.sql("delete from c where id = 3")                     // v3
    e.sql("insert into c values (4, 40)")                   // v4
    def ch(a: Long, b: Long): Seq[(String, Long, Long)] =
      e.changes("c", a, b).collect()
        .map(r => (r.getAs[String]("_change_type"),
          r.getAs[Long]("id"), Option(r.getAs[Any]("v"))
            .map(_.asInstanceOf[Long]).getOrElse(-1L)))
        .sortBy(t => (t._2, t._1)).toSeq
    assert(ch(1, 2) == Seq(("update_postimage", 2L, 99L),
      ("update_preimage", 2L, 20L)))
    assert(ch(2, 3) == Seq(("delete", 3L, 30L)))
    assert(ch(3, 4) == Seq(("insert", 4L, 40L)))
    // spanning diff: unchanged id=1 emits nothing
    assert(ch(1, 4) == Seq(("update_postimage", 2L, 99L),
      ("update_preimage", 2L, 20L), ("delete", 3L, 30L),
      ("insert", 4L, 40L)))
    // update preserves rowid: the pre/post pair shares the key
    val pair = e.changes("c", 1, 2).collect()
    assert(pair.map(_.getAs[String]("rowid")).distinct.length == 1)
    intercept[GraftException] { e.changes("c", 2, 2) }
    intercept[GraftException] { e.changes("c", 3, 1) }
  }

  test("changes() across an ALTER: new column reads NULL pre-image") {
    val (e, _) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table a (id int, PRIMARY KEY(id))")
    e.sql("insert into a values (1)")          // v1
    e.sql("alter table a add column w int")
    e.sql("insert into a values (2, 9)")       // v2
    val r = e.changes("a", 1, 2).collect()
    // id=1 is unchanged on the common column -> no row; id=2 inserts
    assert(r.length == 1)
    assert(r.head.getAs[String]("_change_type") == "insert" &&
      r.head.getAs[Long]("id") == 2L && r.head.getAs[Long]("w") == 9L)
  }

  test("OPTIMIZE compacts small files into a new version commit") {
    val (e, _) = freshEngine()
    e.setVersionRetention(6)
    e.sql("create table o (id int, PRIMARY KEY(id))")
    (1 to 4).foreach(i => e.sql(s"insert into o values ($i)")) // v1..v4
    def current = e.query("show versions for o").collect()
      .find(_.getString(4) == "YES").get
    val filesBefore = current.getLong(2)
    assert(filesBefore >= 4L) // one file per insert commit
    val r = e.sql("optimize o")
    assert(r == AffectedRows(filesBefore - 1)) // compacted to 1 file
    assert(current.getLong(2) == 1L)
    assert(ids(e, "select id from o") == Seq(1L, 2L, 3L, 4L))
    // pre-compaction history still readable
    assert(ids(e, "select id from o version as of 4") ==
      Seq(1L, 2L, 3L, 4L))
    // already compact: no-op, no version churn
    val vBefore = e.query("show versions for o").collect().length
    assert(e.sql("optimize table o") == AffectedRows(0))
    assert(e.query("show versions for o").collect().length == vBefore)
  }

  test("external tables and string literals are left alone") {
    val (e, _) = freshEngine()
    val ext = Files.createTempDirectory("graft_ext_").toString
    spark.range(3).toDF("id").write.mode("overwrite").parquet(ext)
    e.sql(s"create external table x using parquet location '$ext'")
    intercept[GraftException] { e.tableAsOf("x", 0) }
    intercept[GraftException] { e.query("show versions for x") }
    e.sql("create table lit (id int, PRIMARY KEY(id))")
    e.sql("insert into lit values (5)")
    // the phrase inside a literal must NOT trigger the rewrite
    val r = e.query(
      "select 'lit version as of 1' as s, id from lit").collect()
    assert(r.head.getString(0) == "lit version as of 1" &&
      r.head.getLong(1) == 5L)
  }

  test("RESTORE rewinds data as a new version; history and DDL survive") {
    val (e, dir) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table rt (id int, v int, PRIMARY KEY(id))")
    e.sql("insert into rt values (1, 10), (2, 20), (3, 30)") // v1
    e.sql("update rt set v = 99 where id = 2")               // v2
    e.sql("delete from rt where id = 3")                     // v3
    // restore commits a NEW version (v4) whose image is v1
    assert(e.sql("restore rt to version as of 1") == AffectedRows(3))
    val cur = e.query("select id, v from rt order by id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cur.toSeq == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    // history preserved: the pre-restore image still time-travels
    assert(e.query("select count(*) from rt version as of 3")
      .head().getLong(0) == 2L)
    assert(e.query("show versions for rt").count() == 5) // v0..v4
    // CDF across the restore shows what the rewind undid
    val cdf = e.changes("rt", 3, 4).collect()
      .map(r => r.getAs[String]("_change_type")).sorted
    assert(cdf.toSeq == Seq("insert", "update_postimage", "update_preimage"))
    // restore-to-current is a no-op: no version committed
    assert(e.sql("restore rt to version as of 4") == AffectedRows(0))
    assert(e.query("show versions for rt").count() == 5)
    // data-only: a column added AFTER the target version stays
    // declared and reads NULL from the restored image
    e.sql("alter table rt add column w int")                 // v5
    e.sql("update rt set w = 7 where id = 1")                // v6
    assert(e.sql("restore rt to version as of 1") == AffectedRows(3))
    val w = e.query("select w from rt where id = 1").head()
    assert(w.isNullAt(0))
    // guard rails: out-of-retention / unknown versions, external reject
    assertThrows[GraftException](e.sql("restore rt to version as of 99"))
    assertThrows[GraftException](e.sql("restore no_such to version as of 1"))
  }

  test("VACUUM reclaims old versions now, keeps policy and current image") {
    val (e, dir) = freshEngine()
    e.setVersionRetention(10)
    e.sql("create table vt (id int, v int, PRIMARY KEY(id))")
    e.sql("insert into vt values (1, 10), (2, 20)")   // v1
    e.sql("update vt set v = 21 where id = 2")        // v2
    e.sql("update vt set v = 22 where id = 2")        // v3
    e.sql("update vt set v = 23 where id = 2")        // v4
    assert(e.query("show versions for vt").count() == 5) // v0..v4
    // retain 2 => v0..v2 go
    assert(e.sql("vacuum vt retain 2 versions") == AffectedRows(3))
    assert(e.query("show versions for vt").count() == 2)
    // current image intact; vacuumed snapshot now errors with the
    // standard retention message; retained one still reads
    assert(e.query("select v from vt where id = 2").head().getLong(0) == 23L)
    assert(e.query("select v from vt version as of 3 where id = 2")
      .head().getLong(0) == 22L)
    val ex = intercept[GraftException](
      e.query("select * from vt version as of 1").collect())
    assert(ex.msg.contains("retention") || ex.msg.contains("does not exist"))
    // idempotent: nothing left to reclaim
    assert(e.sql("vacuum vt retain 2 versions") == AffectedRows(0))
    // guard rails: floor of 2, external tables rejected, 1146 unknown
    assertThrows[GraftException](e.sql("vacuum vt retain 1 versions"))
    assertThrows[GraftException](e.sql("vacuum no_such_table"))
    // policy unchanged: the NEXT commit still retains 10
    e.sql("update vt set v = 24 where id = 2") // v5
    assert(e.query("show versions for vt").count() == 3) // v3, v4, v5
  }
}
