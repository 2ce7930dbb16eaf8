package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators._

/** Unit specs for the pipeline operators not covered by the DuckDB
  * oracle (hash-based dedup, LSH ANN, multimodal stub), plus sanity
  * properties of the oracle-covered ones.
  */
class OperatorSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def docs() = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
      (4L, "completely different content about spark shuffles and joins here"),
      (5L, "short text")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val r = Dedup.exact(docs(), "doc_id", "text")
      .orderBy(col("keep_id")).collect()
    assert(r.length == 4) // 1&2 merge
    assert(r.head.getAs[Long]("keep_id") == 1L &&
      r.head.getAs[Long]("n_copies") == 2L)
  }

  test("minhash: identical texts get identical signatures, near-dups collide") {
    val sigs = Dedup.minhashSignatures(docs(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    // signature agreement between near-dups ≈ jaccard > 0 matches
    assert(sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b } > 0)

    val cand = Dedup.minhashCandidates(docs(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L))) // exact dup must be a candidate
    assert(!cand.exists { case (a, b) => Set(a, b).contains(4L) && Set(a, b).intersect(Set(1L, 2L, 3L)).nonEmpty })
  }

  test("simhash: identical → hamming 0; unrelated → large hamming") {
    val fp = Dedup.simhash(docs(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <
      java.lang.Long.bitCount(fp(1L) ^ fp(4L)))
    // the portable (oracle-replayable) variant has the same properties
    val pf = Dedup.simhashPortable(docs(), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pf(1L) == pf(2L))
    assert(java.lang.Long.bitCount(pf(1L) ^ pf(3L)) <
      java.lang.Long.bitCount(pf(1L) ^ pf(4L)))
  }

  test("near-dup pipeline: band candidates + exact jaccard for pairs") {
    val fp = Dedup.simhashPortable(docs(), "doc_id", "text")
    val cand = Dedup.simhashBandCandidates(fp, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // identical docs agree on every band; near-dups share at least one
    assert(cand.contains((1L, 2L)))
    assert(cand.contains((1L, 3L)) || cand.contains((2L, 3L)))
    // the portable MinHash miner (p17's candidate stage) agrees
    val mcand = Dedup.minhashCandidatesPortable(docs(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mcand.contains((1L, 2L)))
    assert(!mcand.exists { case (x, y) => Set(x, y) == Set(1L, 4L) })
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a_id", "b_id")
    val j = Dedup.jaccardForPairs(pairs, docs(), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.0 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) == 0.0)
    // matches the array-formulation jaccard on the same pairs
    val sh = Dedup.withShingles(docs(), "doc_id", "text")
    val ref = sh.toDF("a_id", "a_sh")
      .join(sh.toDF("b_id", "b_sh"), col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        Dedup.jaccard(col("a_sh"), col("b_sh")).as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    j.keys.foreach(k => assert(j(k) == ref(k), s"pair $k"))
  }

  test("jaccard shingle similarity: dup=1.0, near-dup in (0,1)") {
    val sh = Dedup.withShingles(docs(), "doc_id", "text")
    val a = sh.toDF("a_id", "a_sh")
    val b = sh.toDF("b_id", "b_sh")
    val j = a.join(b, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        Dedup.jaccard(col("a_sh"), col("b_sh")).as("jac"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.0 && j((1L, 3L)) < 1.0)
    assert(j((1L, 4L)) == 0.0)
  }

  test("fingerprint is the documented rolling hash") {
    import spark.implicits._
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df, "doc_id", "text").collect()
    // (0*31+97)=97; (97*31+98)=3105
    assert(fp.head.getLong(1) == 3105L)
  }

  test("language id picks the language with most marker words") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the house is big"),
      (2L, "der hund und die katze ist das tier"),
      (3L, "xyzzy qwerty asdf")).toDF("doc_id", "text")
    val r = TextAnalysis.languageId(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "en" && r(2L) == "de" && r(3L) == "und")
  }

  test("mixture: weights become copies + hash-sampled fractions, deterministically") {
    import spark.implicits._
    val src = (0L until 1000L).map(i => (i, s"doc $i")).toDF("id", "text")
    val mixed = Sampling.mixture(Seq(
      ("a", src, 1.0), ("b", src, 0.25), ("c", src, 2.0)), "id")
    val bySrc = mixed.groupBy("source", "copy").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(bySrc(("a", 0)) == 1000L)         // weight 1.0 = one full copy
    assert(bySrc(("c", 0)) == 1000L && bySrc(("c", 1)) == 1000L)
    val frac = bySrc(("b", 0)).toDouble / 1000
    assert(frac > 0.18 && frac < 0.32, s"0.25-weight sample kept $frac")
    assert(!bySrc.contains(("b", 1)) && !bySrc.contains(("c", 2)))
    // deterministic under repartitioning
    val again = Sampling.mixture(Seq(("b", src.repartition(7), 0.25)), "id")
      .select("id").collect().map(_.getLong(0)).sorted
    val first = mixed.filter(col("source") === "b")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(again.toSeq == first.toSeq)
  }

  test("weighted sample matches the E-S formula computed locally") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, 1.0 + (i % 5).toDouble))
      .toDF("id", "wt")
    val got = Sampling.weightedSample(df, "id", "wt", 10)
      .collect().map(r => (r.getAs[Number]("rnk").longValue,
        r.getAs[Long]("id"), r.getAs[Long]("key_micro")))
      .sortBy(_._1)
    // replay the exact selection-key formula in plain Scala
    val expected = (0L until 1000L).map { id =>
      val u = ((id * 2654435761L + 40503L) % 1000000007L + 0.5) /
        1000000007.0
      val w = 1.0 + (id % 5).toDouble
      (math.round(1e6 * math.log(u) / w), id)
    }.sortBy(t => (-t._1, t._2)).take(10)
    assert(got.map(_._2).toSeq == expected.map(_._2).toSeq)
    assert(got.map(_._3).toSeq == expected.map(_._1).toSeq)
    // deterministic under repartitioning
    val again = Sampling.weightedSample(df.repartition(7), "id", "wt", 10)
      .collect().map(_.getAs[Long]("id")).sorted
    assert(again.toSeq == got.map(_._2).sorted.toSeq)
  }

  test("weighted sample: strata quotas and weight monotonicity") {
    import spark.implicits._
    // stratum a: uniform weights; stratum b: ids >= 900 get 50x the
    // weight of the rest — they should dominate b's quota
    val df = (0L until 1000L).map { i =>
      val s = if (i % 2 == 0) "a" else "b"
      val w = if (s == "b" && i >= 900) 50.0 else 1.0
      (i, s, w)
    }.toDF("id", "s", "wt")
    val r = Sampling.weightedSample(df, "id", "wt", 15, Seq("s"))
      .collect().map(x => (x.getAs[String]("s"), x.getAs[Long]("id")))
    assert(r.count(_._1 == "a") == 15 && r.count(_._1 == "b") == 15)
    val heavy = r.filter(_._1 == "b").count(_._2 >= 900)
    assert(heavy >= 10, s"50x-weighted ids won only $heavy of 15 slots")
  }

  test("HITS importance matches a local replay; degree drives authority") {
    import spark.implicits._
    // star item 10 (3 hubs) vs leaf item 11 (1 hub, shared with 10)
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("u", "i")
    val got = graft.operators.Graph.hitsMicro(edges, "u", "i", rounds = 3)
      .collect().map(r => (r.getAs[Long]("i"),
        r.getAs[Long]("auth_micro"), r.getAs[Long]("degree"))).sortBy(_._1)
    // replay the exact integer/L-inf trajectory locally
    val es = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
    var a = Map(10L -> 1000000L, 11L -> 1000000L)
    var h = Map.empty[Long, Long]
    def norm(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max.toDouble
      m.map { case (k, v) => k -> math.round(v.toDouble * 1000000.0 / mx) }
    }
    (1 to 3).foreach { _ =>
      // hub half-step is raw; only the authority side is normalized
      // (once per full iteration — see hitsMicro scaladoc)
      h = es.groupBy(_._1).map { case (u, ps) =>
        u -> ps.map(p => a(p._2)).sum }
      a = norm(es.groupBy(_._2).map { case (i, ps) =>
        i -> ps.map(p => h(p._1)).sum })
    }
    assert(got.map(x => x._1 -> x._2).toMap == a)
    assert(got.find(_._1 == 10L).get._3 == 3L)
    // the star item ends at the normalization ceiling, the leaf below
    assert(a(10L) == 1000000L && a(11L) < a(10L))
    // deterministic under repartitioning
    val again = graft.operators.Graph
      .hitsMicro(edges.repartition(5), "u", "i", rounds = 3)
      .collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("auth_micro")))
      .sortBy(_._1)
    assert(again.toSeq == got.map(x => (x._1, x._2)).toSeq)
  }

  test("PageRank matches a hand-computed integer trajectory; keeps self-loop-only nodes") {
    import spark.implicits._
    // cycle 1->2->3->1 plus chord 1->3; node 4 has only a self-loop
    // (must appear with teleport-only rank and out_degree 0)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 4L))
      .toDF("s", "d")
    val got = graft.operators.Graph.pageRankMicro(edges, "s", "d", rounds = 3)
      .collect().map(r => (r.getAs[Long]("node"),
        r.getAs[Long]("pr_micro"), r.getAs[Long]("out_degree"))).sortBy(_._1)
    // hand replay: share = pr div od; next = 150000 + inc*85 div 100
    // r1: pr=(1e6, 575000, 1425000, 150000)
    // r2: pr=(1361250, 575000, 1063750, 150000)
    // r3: pr=(1054187, 728531, 1217281, 150000)
    assert(got.toSeq == Seq(
      (1L, 1054187L, 2L), (2L, 728531L, 1L),
      (3L, 1217281L, 1L), (4L, 150000L, 0L)))
    val again = graft.operators.Graph
      .pageRankMicro(edges.repartition(5), "s", "d", rounds = 3)
      .collect().map(r => (r.getAs[Long]("node"),
        r.getAs[Long]("pr_micro"), r.getAs[Long]("out_degree"))).sortBy(_._1)
    assert(again.toSeq == got.toSeq, "trajectory not repartition-invariant")
  }

  test("triangle counts match a hand graph; keeps self-loop-only nodes") {
    import spark.implicits._
    // triangle 1-2-3, pendant 3-4, node 5 only a self-loop; edge
    // direction and duplicates must not matter (canonicalized)
    val edges = Seq((1L, 2L), (3L, 1L), (2L, 3L), (3L, 4L), (5L, 5L),
      (2L, 1L)).toDF("s", "d")
    val got = graft.operators.Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => (r.getAs[Long]("node"),
        r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 1L),
      (4L, 1L, 0L), (5L, 0L, 0L)))
    val again = graft.operators.Graph
      .triangleCounts(edges.repartition(4), "s", "d")
      .collect().map(r => (r.getAs[Long]("node"),
        r.getAs[Long]("degree"), r.getAs[Long]("n_triangles"))).sortBy(_._1)
    assert(again.toSeq == got.toSeq, "counts not repartition-invariant")
  }

  test("BFS reachability: min hops, multi-seed, bounded depth, no revisit") {
    import spark.implicits._
    // chain 1->2->3->4->5 with branch 2->6, back-edge 7->1 (7 itself
    // unreachable), self-loop 3->3 (must not affect distances)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L),
      (7L, 1L), (3L, 3L)).toDF("s", "d")
    val seeds1 = Seq(1L).toDF("n")
    val got = graft.operators.Graph
      .reachability(edges, "s", "d", seeds1, "n", maxHops = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("hops")))
      .sortBy(_._1)
    // 5 is 4 hops away (excluded); 7 unreachable (excluded)
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (6L, 2L)))
    // multi-seed: distance is the MIN over seeds
    val got2 = graft.operators.Graph
      .reachability(edges, "s", "d", Seq(1L, 4L).toDF("n"), "n", maxHops = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("hops")))
      .sortBy(_._1)
    assert(got2.toSeq == Seq(
      (1L, 0L), (2L, 1L), (3L, 2L), (4L, 0L), (5L, 1L), (6L, 2L)))
    val again = graft.operators.Graph
      .reachability(edges.repartition(5), "s", "d", seeds1, "n", maxHops = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("hops")))
      .sortBy(_._1)
    assert(again.toSeq == got.toSeq, "BFS not repartition-invariant")
  }

  test("k-core peel cascades: pendant chain unravels, triangle survives") {
    import spark.implicits._
    // triangle 1-2-3, pendant path 3-4-5; k=2: round 1 drops 5
    // (deg 1), round 2 drops 4 (deg fell to 1), round 3 is a fixpoint
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val got = graft.operators.Graph.kCorePeel(edges, "s", "d", k = 2, rounds = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("degree")))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // one round only: 4 still present (its degree was 2 before 5 left)
    val one = graft.operators.Graph.kCorePeel(edges, "s", "d", k = 2, rounds = 1)
      .collect().map(_.getAs[Long]("node")).sorted
    assert(one.toSeq == Seq(1L, 2L, 3L, 4L))
    val again = graft.operators.Graph
      .kCorePeel(edges.repartition(4), "s", "d", k = 2, rounds = 3)
      .collect().map(r => (r.getAs[Long]("node"), r.getAs[Long]("degree")))
      .sortBy(_._1)
    assert(again.toSeq == got.toSeq, "peel not repartition-invariant")
  }

  test("count-min: exact when wide, one-sided overestimate when tight") {
    import spark.implicits._
    val rows = (1L to 5L).flatMap(k => Seq.fill(k.toInt * 3)(k)).toDF("k")
    val wide = Sketches.countMinTopK(rows, "k", w = 1024, d = 4, topK = 5)
      .collect().map(r => (r.getAs[Long]("key"),
        r.getAs[Long]("true_count"), r.getAs[Long]("est_count")))
    assert(wide.length == 5)
    assert(wide.forall { case (_, t, e) => e == t },
      "wide sketch must be collision-free on 5 keys")
    val tight = Sketches.countMinTopK(rows, "k", w = 1, d = 4, topK = 5)
      .collect().map(r => (r.getAs[Long]("true_count"),
        r.getAs[Long]("est_count")))
    // w=1: every key hashes to the single cell = total row count
    assert(tight.forall { case (_, e) => e == 45L })
    assert(tight.forall { case (t, e) => e >= t },
      "count-min error must be one-sided")
  }

  test("skip-gram pairs: full window, ordered, count-ranked") {
    import spark.implicits._
    val d = Seq("a b c d", "a b x y").toDF("text")
    val got = TextAnalysis.skipgramTopK(d, "text", window = 2, k = 10,
        minCount = 1L)
      .collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b"),
        r.getAs[Long]("cnt")))
    // (a,b) twice; every other within-2 pair once
    assert(got.head == (("a", "b", 2L)))
    assert(got.toSet == Set(("a", "b", 2L), ("a", "c", 1L), ("a", "x", 1L),
      ("b", "c", 1L), ("b", "d", 1L), ("b", "x", 1L), ("b", "y", 1L),
      ("c", "d", 1L), ("x", "y", 1L)))
  }

  test("incremental LSH mines new-vs-index only, never new-vs-new") {
    import spark.implicits._
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val newB = Seq((10L, t), (20L, t), (30L, "nothing alike here at all " +
      "completely disjoint shingle stream")).toDF("doc_id", "text")
    val idx = Seq((1L, t), (2L, "other unrelated index content words " +
      "spread wide apart")).toDF("doc_id", "text")
    val got = Dedup.minhashCandidatesIncremental(newB, idx, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("index_id")))
      .toSet
    // both new dups of the index doc surface; the (10, 20) new-vs-new
    // pair and the disjoint docs never do
    assert(got == Set((10L, 1L), (20L, 1L)), got.toString)
  }

  test("calibration report: fixed bins, rates and means per bin") {
    import spark.implicits._
    val scored = Seq((-15L, 1L), (-5L, -1L), (5L, 1L), (15L, 1L), (12L, -1L))
      .toDF("score", "y")
    val got = Curation.calibrationReport(scored, "score", "y", binWidth = 10L)
      .collect().map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pos"), r.getAs[Double]("pos_rate"),
        r.getAs[Double]("mean_score")))
    // floor(-15/10) = -2, floor(-5/10) = -1, floor(5/10) = 0,
    // floor(15/10) = floor(12/10) = 1
    assert(got.toSeq == Seq(
      (-2L, 1L, 1L, 1.0, -15.0), (-1L, 1L, 0L, 0.0, -5.0),
      (0L, 1L, 1L, 1.0, 5.0), (1L, 2L, 1L, 0.5, 13.5)))
  }

  test("novelty rate: first doc owns its grams, exact dup has zero novelty") {
    import spark.implicits._
    val d = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"), // 2 distinct 8-grams, all new
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"), // exact dup: novelty 0
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8"),    // 1 gram, new
      (4L, "too short")                    // < 8 tokens: absent
    ).toDF("doc_id", "text")
    val got = TextAnalysis.noveltyRate(d, "doc_id", "text", n = 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty"))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 1L, 1L, 1.0)))
  }

  test("cluster quality sizes agree with kmeansAssign; cohesion bounded") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.95f, 0.05f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(0.1f, 0.9f)), (5L, Array(0.05f, 0.95f))
    ).toDF("vec_id", "embedding")
    val q = Similarity.clusterQuality(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("n_members"),
        r.getAs[Double]("mean_cos")))
    assert(q.map(_._2).sum == 6L)
    assert(q.forall { case (_, _, c) => c >= -1.0 && c <= 1.0001 })
    val sizes = Similarity.kmeansAssign(vecs, "vec_id", "embedding", k = 2, iters = 2)
      .select(col("cell"), col("n_members")).distinct()
      .collect().map(r => (r.getAs[Long]("cell"), r.getAs[Long]("n_members")))
      .toSet
    assert(q.map(x => (x._1, x._2)).toSet == sizes,
      "clusterQuality sizes disagree with kmeansAssign")
  }

  test("quant recall: lossless at high levels, bounded always") {
    import spark.implicits._
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.0f, 0.9f, 0.2f)),
      (4L, Array(0.5f, 0.5f, 0.1f))).toDF("vec_id", "embedding")
    val r = Similarity.quantRecall(vecs, vecs.filter(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2, levels = 127)
      .collect().map(x => (x.getAs[Long]("q_id"),
        x.getAs[Long]("n_overlap"), x.getAs[Double]("recall")))
    assert(r.toSeq == Seq((0L, 2L, 1.0)))
    val coarse = Similarity.quantRecall(vecs, vecs, "vec_id", "embedding",
        k = 2, levels = 1)
      .collect().map(x => (x.getAs[Long]("n_overlap"), x.getAs[Double]("recall")))
    assert(coarse.forall { case (n, rec) =>
      n >= 0L && n <= 2L && rec >= 0.0 && rec <= 1.0 })
  }

  test("repetition signals: duplicate token/3-gram/line fractions") {
    import spark.implicits._
    val d = Seq(
      // "spam spam spam spam": 4 tokens 1 distinct → dup_token 0.75;
      // 2 3-grams both "spam spam spam" → dup_3gram 0.5; 1 line → 0
      (1L, "spam spam spam spam"),
      // all distinct tokens and grams, two distinct lines
      (2L, "one two three four\nfive six seven eight"),
      // 6 tokens 4 distinct → 1/3; 4 3-grams all distinct → 0;
      // 3 lines 2 distinct → 1/3
      (3L, "alpha beta\nalpha beta\ngamma delta"),
      (4L, "")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(d, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
      .map(x => (x.getDouble(1), x.getDouble(2), x.getDouble(3)))
    assert(r(0) == ((0.75, 0.5, 0.0)))
    assert(r(1) == ((0.0, 0.0, 0.0)))
    assert(r(2) == ((0.3333, 0.0, 0.3333)))
    assert(r(3) == ((0.0, 0.0, 0.0)))
  }

  test("bpeMerges learns canonical merges with deterministic tie-breaks") {
    import spark.implicits._
    // hand-derived BPE on {low×3, lower×2, newest×1}:
    // r1: (l,o)=5 ties (o,w)=5 → lexicographic 'l'<'o' picks (l,o)
    // r2: (lo,w)=5  r3: (e,r)=2 ties (low,e)=2 → 'e'<'low'
    // r4: (low,er)=2
    val d = Seq("low low low lower lower newest").toDF("text")
    val m = TextAnalysis.bpeMerges(d, "text", 4)
    assert(m == Seq(("l", "o", 5L), ("lo", "w", 5L),
      ("e", "r", 2L), ("low", "er", 2L)))
    // canonical non-overlapping application: [a,a,a,a] + (a,a) →
    // [aa,aa], so the SECOND merge must be (aa,aa), not (aa,a)
    val rep = TextAnalysis.bpeMerges(Seq("aaaa").toDF("text"), "text", 2)
    assert(rep == Seq(("a", "a", 3L), ("aa", "aa", 1L)))
  }

  test("token counts: ws vs bpe-ish segmentation") {
    import spark.implicits._
    val df = Seq((1L, "hello world42 foo!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, "doc_id", "text").collect().head
    assert(r.getAs[Long]("ws_tokens") == 3L)
    // hello | world | 42 | foo | !
    assert(r.getAs[Long]("bpe_tokens") == 5L)
  }

  test("ANN: lsh scores agree with brute force for shared pairs; top-k ordered") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 3)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .collect()
    assert(bf.length == 30)
    // per query: scores non-increasing
    bf.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", 10)
    val bfAll = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 500)
    val joined = lsh.as("l").join(bfAll.as("b"),
      col("l.q_id") === col("b.q_id") &&
      col("l.neighbor_id") === col("b.neighbor_id"))
      .select(col("l.score").as("ls"), col("b.score").as("bs"))
      .collect()
    // every LSH hit's cosine equals the exhaustive cosine
    assert(joined.nonEmpty)
    joined.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("PQ ANN: rerank recall beats raw ADC; both deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (bf & got).size.toDouble / bf.size
    }
    // random gaussian vectors are PQ's WORST case (no cluster
    // structure for the codebook to exploit); measured on this
    // corpus: ADC@10 ≈ 0.24, shortlist-100 + exact rerank ≈ 0.835.
    // Bounds sit under the measured values to allow testdata
    // regeneration drift, and the ordering assertion is the real
    // claim: reranking a shortlist beats trusting raw ADC.
    val adc = recallOf(Similarity.pqTopK(e, q, "vec_id", "embedding", 10,
      codes = 64))
    val rer = recallOf(Similarity.pqRerankTopK(e, q, "vec_id", "embedding", 10))
    assert(rer > adc, s"rerank $rer should beat raw ADC $adc")
    assert(rer >= 0.7, s"rerank recall $rer below floor")
    // determinism: same output under a different input partitioning
    val a = Similarity.pqRerankTopK(e.repartition(7), q, "vec_id",
      "embedding", 10).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Similarity.pqRerankTopK(e.repartition(2), q, "vec_id",
      "embedding", 10).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("IVF+PQ ANN: recall floor vs brute force; deterministic; prunes to probed cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10)
      .select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 10,
      nlist = 16, nprobe = 8)
    val got = ivfpq.select(col("q_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & got).size.toDouble / bf.size
    // gaussian-random vectors are the worst case for BOTH tiers
    // (no cluster structure for centroids, no subspace structure for
    // codes); the floor documents measured behavior minus drift slack
    assert(recall >= 0.45, s"IVF+PQ recall $recall below floor")
    // probing half the cells must not return more than the flat ADC
    // scan path would; candidate sets stay query-bounded
    assert(got.size <= 20 * 10)
    // determinism under repartitioning
    val a = Similarity.ivfPqTopK(e.repartition(7), q, "vec_id",
      "embedding", 10, nlist = 16, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Similarity.ivfPqTopK(e.repartition(3), q, "vec_id",
      "embedding", 10, nlist = 16, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("IVF ANN: scores agree with brute force; bounded candidates") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter(col("vec_id") < 5)
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", 10,
      nlist = 8, nprobe = 3).collect()
    assert(ivf.nonEmpty && ivf.forall(_.getInt(3) <= 10))
    val bf = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 500)
    val joined = Similarity.ivfTopK(e, q, "vec_id", "embedding", 10, 8, 3).as("l")
      .join(bf.as("b"), col("l.q_id") === col("b.q_id") &&
        col("l.neighbor_id") === col("b.neighbor_id"))
      .select(col("l.score"), col("b.score")).collect()
    joined.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
  }

  test("approx_count_distinct is within the configured error of exact") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey"), 0.02).as("a"),
      countDistinct(col("l_partkey")).as("e")).collect().head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.1)
  }

  test("approx_percentile tracks the exact percentile within accuracy") {
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("cents", expr("CAST(round(o_totalprice*100) AS BIGINT)"))
    val r = ord.agg(
      expr("approx_percentile(cents, array(0.5D, 0.95D), 10000)").as("a"),
      expr("percentile(cents, array(0.5D, 0.95D))").as("e")).collect().head
    val a = r.getSeq[Long](0)
    val e = r.getSeq[Double](1)
    // GK with accuracy 10000 → rank error ≤ n/10000; on this data the
    // value error stays well under 1%
    a.zip(e).foreach { case (approx, exact) =>
      assert(math.abs(approx - exact) / exact < 0.01,
        s"approx $approx vs exact $exact")
    }
  }

  test("salted two-phase aggregate equals the straight groupBy") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("v", (col("l_quantity") * 100).cast("long"))
    val salted = Skew.saltedSumCount(li, Seq("l_returnflag"), "v", 16)
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val straight = li.groupBy("l_returnflag")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq == straight.toSeq)
  }

  test("CosineSim expression matches the HOF formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(-1.0, 0.5, 2.0)))
      .toDF("a", "b")
    val r = df.select(
      graft.functions.CosineSim(col("a"), col("b")).as("fast"),
      (Similarity.dotExpr("a", "b") /
        (sqrt(Similarity.dotExpr("a", "a")) * sqrt(Similarity.dotExpr("b", "b"))))
        .as("hof")).collect().head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("audio WAV payloads decode for real: magnitude histogram features") {
    import spark.implicits._
    def wavBytes(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val raw = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(raw.putShort)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw.array()), fmt,
        samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // amplitude 20000 → |s|>>12 = bucket 4; amplitude 1000 → bucket 0
    val rows = Seq(
      (1L, "audio/wav", wavBytes(Array.fill(100)(20000.toShort))),
      (2L, "audio/wav", wavBytes(Array.fill(100)(1000.toShort))),
      (3L, "application/bin", Array[Byte](1, 2, 3)))
      .toDF("media_id", "media_type", "content")
    val f = MultiModal.extractFeatures(rows).collect()
      .map(x => x.media_id -> x.feature).toMap
    assert(f(1L)(4) == 1.0 && f(1L)(0) == 0.0, f(1L).toSeq)
    assert(f(2L)(0) == 1.0, f(2L).toSeq)
    // a non-RIFF payload keeps the byte-histogram fallback
    assert(math.abs(f(3L).sum - 1.0) < 1e-9)
  }

  test("audio near-dup: volume-scaled twin collides, reversed signal separates") {
    import spark.implicits._
    def wavOf(amp: Int => Int): Array[Byte] = {
      val samples = Array.tabulate[Short](6500)(i => amp(i / 100).toShort)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val raw = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(raw.putShort)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw.array()), fmt, 6500L),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // even per-window amplitudes so a ÷2 volume change is EXACT and
    // preserves every energy comparison
    def base(w: Int) = ((w * 37) % 97 + 1) * 4
    val rows = Seq(
      (1L, "audio/wav", wavOf(base)),
      (2L, "audio/wav", wavOf(w => base(w) / 2)),   // half volume
      (3L, "audio/wav", wavOf(w => base(64 - w))),  // reversed
      (4L, "text/plain", "not audio".getBytes))
      .toDF("media_id", "media_type", "content")
    val h = MultiModal.audioEnergyHash(rows).collect()
      .map(x => x.media_id -> x.ahash).toMap
    assert(h(1L).isDefined && h(1L) == h(2L)) // volume-invariant
    assert(h(3L) != h(1L))
    assert(h(4L).isEmpty) // undecodable → NULL, row preserved
    val pairs = MultiModal.audioNearDup(rows, maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => Set(p._1, p._2).contains(3L)))
  }

  test("multimodal stub features are deterministic and well-formed") {
    import spark.implicits._
    val docsDf = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val media = MultiModal.asMedia(docsDf, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ==
      MultiModal.mediaSchema.fieldNames.toSeq)
    val f = MultiModal.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).byte_len == 11L)
    assert(math.abs(f(1L).feature.sum - 1.0) < 1e-9)
    assert(f(2L).byte_len == 0L && f(2L).mean_byte == 0.0)
    // deterministic across runs
    val f2 = MultiModal.extractFeatures(media).collect()
      .map(x => x.media_id -> x.feature.toSeq).toMap
    assert(f2(1L) == f(1L).feature.toSeq)
  }

  // 2×2 PNG with two black and two white pixels, built through the
  // same JDK encoder the operators decode with
  private def tinyPng(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("extractFeatures decodes a real PNG into a pixel-luminance histogram") {
    import spark.implicits._
    val media = Seq((1L, "image/png", tinyPng()))
      .toDF("media_id", "media_type", "content")
    val f = MultiModal.extractFeatures(media).collect().head
    // 2 black pixels → luma bin 0, 2 white → bin 7; a byte-histogram
    // fallback over PNG bytes could never produce exactly this split
    assert(f.feature(0) == 0.5 && f.feature(7) == 0.5,
      f.feature.mkString(", "))
    assert(f.feature.slice(1, 7).forall(_ == 0.0))
    assert(f.byte_len == tinyPng().length.toLong)
  }

  test("resize decodes, downsamples and re-encodes a real image") {
    import spark.implicits._
    val media = Seq((1L, "image/png", tinyPng(), 2, 2))
      .toDF("media_id", "media_type", "content", "width", "height")
    val r = MultiModal.resize(media, 2).collect().head
    assert(r.width == 1 && r.height == 1)
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.content))
    assert(out != null, "resized payload is not a decodable image")
    assert(out.getWidth == 1 && out.getHeight == 1)
    // nearest-neighbor anchors at the top-left (black) pixel
    assert((out.getRGB(0, 0) & 0xffffff) == 0x000000)
  }

  test("TopK.perKey matches window row_number semantics, ties broken by id") {
    import spark.implicits._
    val scored = Seq(
      (1L, 10L, 0.9), (1L, 11L, 0.9), (1L, 12L, 0.5), (1L, 13L, 0.99),
      (2L, 20L, 0.1), (2L, 21L, 0.2),
      (3L, 30L, 0.3)
    ).toDF("q_id", "neighbor_id", "score")
      .repartition(4) // force multi-partition partial aggregation
    val got = graft.operators.TopK
      .perKey(scored, Seq("q_id"), "neighbor_id", "score", 2)
      .orderBy("q_id", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSeq
    assert(got == Seq(
      (1L, 13L, 0.99, 1), (1L, 10L, 0.9, 2), // tie 0.9: lower id wins
      (2L, 21L, 0.2, 1), (2L, 20L, 0.1, 2),
      (3L, 30L, 0.3, 1)))
  }

  test("Ranks.withGlobalRank equals a single-partition global rank") {
    import spark.implicits._
    val df = Seq(17, 3, 99, 3, 42, 8, 55, 8, 8, 100, 1)
      .zipWithIndex.map { case (v, i) => (i.toLong, v.toDouble) }
      .toDF("id", "v").repartition(4)
    val ranked = graft.operators.Ranks.withGlobalRank(df,
        expr("CAST(floor(v / 10) AS LONG)"), Seq(col("v"), col("id")))
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("rank"),
        r.getAs[Long]("n_total")))
    // expected: sort by (v, id), rank = position
    val expected = Seq(17, 3, 99, 3, 42, 8, 55, 8, 8, 100, 1)
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .sortBy(identity).zipWithIndex
      .map { case ((_, id), r) => (id, r.toLong + 1, 11L) }
    assert(ranked.toSeq == expected)
    // ntile/percent_rank/cume_dist derivations match Spark's built-ins
    // computed on the same total order
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(lit(0)).orderBy(col("v"), col("id"))
    val ref = df.coalesce(1).select(col("id"),
        ntile(4).over(w).as("q"), percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2),
        r.getDouble(3))).toMap
    val derived = graft.operators.Ranks.withGlobalRank(df,
        expr("CAST(floor(v / 10) AS LONG)"), Seq(col("v"), col("id")))
      .select(col("id"),
        graft.operators.Ranks.ntileFromRank(col("rank"), col("n_total"), 4).as("q"),
        graft.operators.Ranks.percentRankFromRank(col("rank"), col("n_total")).as("pr"),
        graft.operators.Ranks.cumeDistFromRank(col("rank"), col("n_total")).as("cd"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(derived == ref)
  }

  test("normalize-at-load turns cosine into a plain dot product") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(3.0, 4.0, 0.0)), (2L, Seq(0.0, 5.0, 12.0)))
      .toDF("id", "v")
    val n = df.select(col("id"), Similarity.normalizeExpr("v").as("nv"))
    val a = n.toDF("a_id", "a")
    val b = n.toDF("b_id", "b")
    val viaDot = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(Similarity.dotExpr("a", "b").as("d")).head().getDouble(0)
    val raw = df.toDF("a_id", "a").crossJoin(df.toDF("b_id", "b"))
      .filter(col("a_id") < col("b_id"))
      .select(Similarity.cosineExpr("a", "b").as("c")).head().getDouble(0)
    assert(math.abs(viaDot - raw) < 1e-12)
    // unit length after normalization
    val len = n.select(Similarity.dotExpr("nv", "nv").as("l"))
      .collect().map(_.getDouble(0))
    len.foreach(l => assert(math.abs(l - 1.0) < 1e-12))
  }

  test("vector codegen expressions == their HOF formulations (r17)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val dims = 16
    val vecs = (1 to 150).map { i =>
      (i.toLong, (1 to dims).map(_ =>
        (rnd.nextInt(2001) - 1000).toFloat / 100f))
    }
    val df = vecs.toDF("id", "fv")
    // asDouble == transform cast (bit-identical doubles)
    val cast = df.select(col("id"),
      Similarity.asDouble(col("fv")).as("got"),
      transform(col("fv"), x => x.cast("double")).as("want"))
    assert(cast.filter(expr("to_json(got) != to_json(want)"))
      .count() == 0L)
    // L2Normalize == per-element HOF normalize (same IEEE ops)
    val nrm = cast.select(col("id"), col("want").as("v"))
      .select(col("id"),
        Similarity.normalizeExpr("v").as("got"),
        expr("""transform(v, x -> x / sqrt(aggregate(
          |  zip_with(v, v, (p, q) -> p * q),
          |  CAST(0 AS DOUBLE), (acc, w) -> acc + w)))""".stripMargin)
          .as("want"))
    assert(nrm.filter(expr("to_json(got) != to_json(want)"))
      .count() == 0L)
    // HyperplaneBucket == per-bit HOF fold, several bit widths
    val (pA, pB, pP) = Similarity.PlaneParams
    for (bits <- Seq(1, 8, 16)) {
      val hof = (0 until bits).map { j =>
        s"""(CASE WHEN aggregate(
           |   zip_with(v, sequence(0, ${dims - 1}),
           |     (x, d) -> x * (CAST(($pA * (${j * dims} + d + 1) + $pB) % $pP AS DOUBLE)
           |                    / $pP.0 - 0.5)),
           |   CAST(0 AS DOUBLE), (acc, w) -> acc + w) >= 0
           | THEN ${1L << j} ELSE 0 END)""".stripMargin
      }.mkString("(", " + ", ")")
      val bk = cast.select(col("id"), col("want").as("v"))
        .select(col("id"),
          Similarity.lshBucketExpr("v", bits, dims).as("got"),
          expr(hof).cast("long").as("want"))
      assert(bk.filter(col("got") =!= col("want")).count() == 0L,
        s"bucket ids diverge at $bits bits")
    }
    // DenseCounts == the concat(transform(sequence…)) map-probe HOF,
    // including out-of-range keys (ignored) and the bias slot
    val maps = Seq(
      Map(0L -> 3L, 5L -> 1L, 15L -> 9L),
      Map.empty[Long, Long],
      Map(99L -> 7L, -1L -> 2L, 7L -> 4L))
    val mdf = maps.zipWithIndex.map { case (m, i) => (i.toLong, m) }
      .toDF("id", "m")
    val dc = mdf.select(col("id"),
      graft.functions.DenseCounts(col("m"), 16).as("got"),
      expr("""concat(transform(sequence(0, 15),
        |  bb -> coalesce(element_at(m, CAST(bb AS BIGINT)),
        |                 CAST(0 AS BIGINT))),
        |  array(CAST(1 AS BIGINT)))""".stripMargin).as("want"))
    assert(dc.filter(expr("to_json(got) != to_json(want)"))
      .count() == 0L, "dense counts diverge from the HOF probe")
  }

  test("VecSub/VecDot/VecDivide == their HOF formulations (r18)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (1 to 120).map { i =>
      (i.toLong,
        (1 to 16).map(_ => (rnd.nextInt(2001) - 1000) / 100.0),
        (1 to 16).map(_ => (rnd.nextInt(2001) - 1000) / 100.0))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(col("id"),
      graft.functions.VecSub(col("a"), col("b")).as("sub_got"),
      expr("zip_with(a, b, (x, y) -> x - y)").as("sub_want"),
      graft.functions.VecDot(col("a"), col("b")).as("dot_got"),
      expr("""aggregate(zip_with(a, b, (x, y) -> x * y),
        |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)
        .as("dot_want"),
      graft.functions.VecDivide(col("a"), element_at(col("b"), 1))
        .as("div_got"),
      expr("transform(a, x -> x / element_at(b, 1))").as("div_want"))
    assert(cmp.filter(expr("to_json(sub_got) != to_json(sub_want)"))
      .count() == 0L, "VecSub diverges from zip_with")
    // bit-identical accumulation: compare raw doubles, not rounded
    assert(cmp.filter(expr("dot_got <=> dot_want") === lit(false))
      .count() == 0L, "VecDot diverges from the aggregate fold")
    assert(cmp.filter(expr("to_json(div_got) != to_json(div_want)"))
      .count() == 0L, "VecDivide diverges from transform")
    // edge semantics: VecSub pads length mismatches with nulls like
    // zip_with; VecDot null-poisons on mismatch like the fold
    val edge = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0)))
      .toDF("a", "b")
      .select(
        graft.functions.VecSub(col("a"), col("b")).as("sub_got"),
        expr("zip_with(a, b, (x, y) -> x - y)").as("sub_want"),
        graft.functions.VecDot(col("a"), col("b")).as("dot_got"))
    assert(edge.filter(expr("to_json(sub_got) != to_json(sub_want)"))
      .count() == 0L)
    assert(edge.filter(col("dot_got").isNotNull).count() == 0L)
  }

  test("preprocess == its pre-r18 HOF formulation, degenerate rows included") {
    import spark.implicits._
    // 3 normal vectors + one equal to the corpus mean of itself alone
    // (forces norm_centered = 0 → NULL v_prep through the guard)
    val rnd = new scala.util.Random(7)
    val vecs = (1L to 40L).map { i =>
      (i, (1 to 12).map(_ => (rnd.nextInt(401) - 200) / 100.0f))
    }
    val df = vecs.toDF("id", "vec")
    val got = Similarity.preprocess(df, "id", "vec", keepDims = 6)
    // the exact pre-r18 spelling, inlined
    val e = df.select(col("id"), Similarity.asDouble(col("vec")).as("v"))
    val means = e.select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(sum(round(col("x") * 1e6, 0).cast("long")).as("sx"),
        count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct(col("d"), col("sx"), col("n"))))
        .as("ms"))
      .select(expr(
        "transform(ms, m -> CAST(m.sx AS DOUBLE) / m.n / 1000000.0)")
        .as("mean_v"))
    val want = e.join(broadcast(means))
      .select(col("id"),
        expr("zip_with(v, mean_v, (x, m) -> x - m)").as("cv"))
      .select(col("id"), col("cv"),
        sqrt(expr("""aggregate(zip_with(cv, cv, (p, q) -> p * q),
          CAST(0 AS DOUBLE), (acc, w) -> acc + w)""")).as("norm_centered"))
      .select(col("id"), col("norm_centered"),
        when(col("norm_centered") > 0d,
          expr("slice(transform(cv, x -> x / norm_centered), 1, 6)"))
          .as("tv"))
      .select(col("id"), col("norm_centered"),
        sqrt(expr("""aggregate(zip_with(tv, tv, (p, q) -> p * q),
          CAST(0 AS DOUBLE), (acc, w) -> acc + w)""")).as("kept_mass"),
        col("tv"))
      .select(col("id"),
        when(col("kept_mass") > 0d,
          expr("transform(tv, x -> x / kept_mass)")).as("v_prep"),
        col("norm_centered"), col("kept_mass"))
    val g = got.select(col("id"), expr("to_json(struct(*))").as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val w = want.select(col("id"), expr("to_json(struct(*))").as("j"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g == w)
    // degenerate guard still fires: a single-row corpus centers to the
    // zero vector and must emit NULL v_prep, never NaN
    val one = Seq((9L, Seq(1.0f, 2.0f, 3.0f, 4.0f))).toDF("id", "vec")
    val d = Similarity.preprocess(one, "id", "vec", keepDims = 2).collect()(0)
    assert(d.isNullAt(d.fieldIndex("v_prep")))
    assert(d.getDouble(d.fieldIndex("norm_centered")) == 0.0)
  }

  test("vector kernels match HOF edge semantics: length mismatch and null elements") {
    import spark.implicits._
    // LongDot: a length mismatch is NULL (zip_with pads with null and
    // the fold null-poisons), never a silently truncated sum
    val ld = Seq(
      (1L, Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)), // equal lengths
      (2L, Seq(1L, 2L, 3L), Seq(4L, 5L)), // right shorter
      (3L, Seq(1L), Seq(4L, 5L, 6L))) // left shorter
      .toDF("id", "a", "b")
      .select(col("id"),
        graft.functions.LongDot(col("a"), col("b")).as("got"),
        expr("""aggregate(zip_with(a, b, (x, y) -> x * y),
          |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin)
          .as("want"))
    assert(ld.filter(expr("got <=> want") === lit(false)).count() == 0L)
    assert(ld.filter(col("id") > 1 && col("got").isNotNull).count() == 0L)
    // L2Normalize: a null element null-poisons the norm fold, so every
    // output element is null — exactly the HOF's transform result
    val nn = Seq(
      (1L, Seq[java.lang.Double](3.0, 4.0)),
      (2L, Seq[java.lang.Double](3.0, null, 4.0)))
      .toDF("id", "v")
      .select(col("id"),
        graft.functions.L2Normalize(col("v")).as("got"),
        expr("""transform(v, x -> x / sqrt(aggregate(
          |  zip_with(v, v, (p, q) -> p * q),
          |  CAST(0 AS DOUBLE), (acc, w) -> acc + w)))""".stripMargin)
          .as("want"))
    assert(nn.filter(expr("to_json(got) != to_json(want)")).count() == 0L)
  }

  test("clusterTuned builder carries the documented 100-TB knobs") {
    // getOrCreate applies builder options to the shared session's SQL
    // confs — snapshot and restore them so the rest of the suite keeps
    // its local tuning
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.files.maxPartitionBytes",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      val s = Sessions.clusterTuned(
          org.apache.spark.sql.SparkSession.builder(), totalCores = 400)
        .master("local[4]").getOrCreate()
      assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
      assert(s.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s.conf.get("spark.sql.shuffle.partitions").toInt >= 800)
      assert(s.conf.get("spark.sql.files.maxPartitionBytes").contains("256"))
      assert(s.conf.get("spark.sql.autoBroadcastJoinThreshold").toLong ==
        64L * 1024 * 1024)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("multimodal resize and frame sampling preserve plumbing invariants") {
    import spark.implicits._
    val docsDf = Seq((1L, "abcdefghijkl"), (2L, "xy")).toDF("doc_id", "text")
    val media = MultiModal.asMedia(docsDf, "doc_id", "text")
    val r = MultiModal.resize(media, 3).collect().map(x => x.media_id -> x).toMap
    assert(r(1L).content.toSeq == "adgj".getBytes("UTF-8").toSeq)
    assert(r(1L).width == media.filter(col("media_id") === 1)
      .head().getAs[Int]("width") / 3)
    assert(r(2L).content.length == 1)
    // 12 bytes / frameSize 4 = 3 frames; every 2nd → frames 0 and 2
    val fr = MultiModal.sampleFrames(media.filter(col("media_id") === 1), 4, 2)
      .collect().sortBy(_.frame_idx)
    assert(fr.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(fr.head.frame.toSeq == "abcd".getBytes("UTF-8").toSeq)
    assert(fr(1).frame.toSeq == "ijkl".getBytes("UTF-8").toSeq)
  }

  test("aHash near-dup pairs re-encodes and small edits, separates different images") {
    import spark.implicits._
    // real PNGs through the real javax.imageio codec
    def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def gray(v: Int) = (v << 16) | (v << 8) | v
    val grad = png(64, 64)((x, _) => gray(x * 4))          // L→R gradient
    val gradBig = png(128, 128)((x, _) => gray(x * 2))     // same image, 2× scale
    val gradEdit = png(64, 64)((x, y) =>                   // small local edit
      if (x < 4 && y < 4) gray(255) else gray(x * 4))
    val inverse = png(64, 64)((x, _) => gray(255 - x * 4)) // different image
    val junk = "not an image".getBytes("UTF-8")
    val media = Seq(
      (1L, grad), (2L, gradBig), (3L, gradEdit), (4L, inverse), (5L, junk)
    ).toDF("media_id", "content")
    // identical content at different resolutions → identical hash
    val hashes = MultiModal.imageAHash(media).collect()
      .map(m => m.media_id -> m.ahash).toMap
    assert(hashes(1L) == hashes(2L) && hashes(1L).isDefined)
    assert(hashes(5L).isEmpty) // undecodable → NULL, not a crash
    val pairs = MultiModal.aHashNearDup(media, maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // re-encode/rescale
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L))) // small edit
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // inverse stays apart
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L)) // junk excluded
  }

  test("packSequences fills bins in hash order within each shard") {
    import spark.implicits._
    val d = (0L until 200L).map(i => (i, ("tok " * (i.toInt % 40 + 1)).trim))
      .toDF("doc_id", "text")
    val packed = graft.operators.Curation.packSequences(
      d, "doc_id", size(Dedup.tokens(col("text"))),
      graft.operators.Curation.shardId(col("doc_id")), 64).collect()
    assert(packed.length == 200) // every doc lands in exactly one bin
    // bins are dense per shard (0..maxBin) and each non-final bin
    // STARTS below capacity (first-fit: a doc goes into the bin its
    // running count starts in, so bins can overflow by < one doc)
    packed.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      val bins = rows.map(_.getAs[Long]("bin")).distinct.sorted
      assert(bins.toSeq == (0L to bins.max).toSeq)
    }
    // deterministic: same input partitioned differently → same bins
    val again = graft.operators.Curation.packSequences(
      d.repartition(7), "doc_id", size(Dedup.tokens(col("text"))),
      graft.operators.Curation.shardId(col("doc_id")), 64).collect()
    assert(packed.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1).toSeq)
  }

  test("NFC normalization canonicalizes composed and decomposed forms") {
    import spark.implicits._
        val composed = "caf\u00e9 r\u00e9sum\u00e9"
    val decomposed = "cafe\u0301 re\u0301sume\u0301"
    val d = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("doc_id", "text")
    val r = d.select(col("doc_id"),
        graft.functions.NormalizeNFC(col("text")).as("n"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == r(2L))        // same canonical form
    assert(r(1L) == composed)     // NFC prefers the composed form
    assert(r(3L) == "plain ascii")
  }

  test("kmeansAssign partitions every vector once and is run-stable") {
    import spark.implicits._
    // two tight groups around orthogonal axes → k=2 must separate them
    def vec(axis: Int, jitter: Double) =
      Array.tabulate(64)(i => if (i == axis) 1.0f else jitter.toFloat)
    val e = (0L until 20L).map { i =>
      (i, if (i % 2 == 0) vec(0, 0.01 * (i % 5)) else vec(32, 0.01 * (i % 5)))
    }.toDF("vec_id", "embedding")
    val r1 = graft.operators.Similarity
      .kmeansAssign(e, "vec_id", "embedding", k = 2, iters = 2).collect()
    assert(r1.length == 20) // every vector assigned exactly once
    val byCell = r1.groupBy(_.getAs[Long]("cell"))
    assert(byCell.size == 2)
    // each cell is pure: all-even or all-odd vec_ids (the two groups)
    byCell.values.foreach { rows =>
      val par = rows.map(_.getAs[Long]("vec_id") % 2).distinct
      assert(par.length == 1, rows.mkString(","))
    }
    // re-running over a different partitioning yields the same labels
    val r2 = graft.operators.Similarity
      .kmeansAssign(e.repartition(7), "vec_id", "embedding", 2, 2).collect()
    assert(r1.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      r2.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("semDedup keeps the smallest id of each in-cluster near-dup pair") {
    import spark.implicits._
    // two orthogonal groups; within each, ids {0,2,4} / {1,3,5} are
    // identical directions (cos = 1) so only the smallest id survives,
    // while the lone jittered outlier (ids 6,7) stays below tau
    def vec(axis: Int, scale: Double) =
      Array.tabulate(64)(i => if (i == axis) scale.toFloat else 0.0f)
    def far(axis: Int) =
      Array.tabulate(64)(i =>
        if (i == axis) 0.4f else if (i == (axis + 7) % 64) 1.0f else 0.0f)
    val e = (Seq(0L, 2L, 4L).map(i => (i, vec(0, 1.0 + i))) ++
      Seq(1L, 3L, 5L).map(i => (i, vec(32, 1.0 + i))) ++
      Seq((6L, far(0)), (7L, far(32)))).toDF("vec_id", "embedding")
    val r = Similarity.semDedup(e, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.9)
      .collect().map(x => x.getLong(0) -> x.getBoolean(2)).toMap
    assert(r.size == 8)
    assert(r(0L) && r(1L)) // smallest id per dup-group survives
    assert(!r(2L) && !r(4L) && !r(3L) && !r(5L)) // later ids removed
    assert(r(6L) && r(7L)) // below tau: kept
  }

  test("lmPerplexity: repeated text scores lower nll than novel text; terciles balance") {
    import spark.implicits._
    val common = "the cat sat on the mat and the cat sat again"
    val docs = ((1L to 9L).map(i => (i, common)) :+
      (10L, "zebra quark mixes bagel xylophone under quark bagel zebra mixes"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.lmPerplexity(docs, "doc_id", "text")
    val byId = r.collect().map(x => x.getLong(0) ->
      (x.getDouble(2), x.getString(3))).toMap
    // the 9 identical docs dominate the LM → their bigrams are likely,
    // the odd doc's bigrams are mostly unseen → highest nll, tail
    assert(byId(10L)._1 > byId(1L)._1)
    assert(byId(10L)._2 == "tail")
    // tercile sizes differ by at most one (ntile semantics)
    val sizes = r.groupBy(col("ppl_bucket")).count()
      .collect().map(_.getLong(1))
    assert(sizes.sum == 10 && (sizes.max - sizes.min) <= 1)
    // partitioning-independent: same doubles under a different layout
    val r2 = TextAnalysis.lmPerplexity(docs.repartition(7), "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getDouble(2))).sortBy(_._1).toSeq
    assert(r2 == r.collect().map(x => (x.getLong(0), x.getDouble(2)))
      .sortBy(_._1).toSeq)
  }

  test("domainDivergence ranks the off-mix source above the representative one") {
    import spark.implicits._
    val docs = Seq(
      ("a", "xx xx xx xx xx xx"), ("a", "xx xx xx xx"),   // xx-only
      ("b", "yy yy yy yy"),                               // yy-only (rarer)
      ("c", "xx yy xx yy xx yy xx xx")                    // ≈ corpus mix
    ).toDF("source", "text")
    val r = Curation.domainDivergence(docs, "source", "text")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    // the corpus is xx-heavy: the yy-only source diverges most, the
    // mixed source least
    assert(r("b") > r("a") && r("a") > r("c"))
    assert(r("c") >= 0.0) // KL is non-negative
    val r2 = Curation.domainDivergence(docs.repartition(5), "source", "text")
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r == r2) // bit-identical under any partitioning
  }

  test("spanDedup keeps global first occurrences and reassembles the survivors") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d"),       // span "a b c d" — first owner (lowest id)
      (2L, "a b c d"),       // exact dup doc → everything removed
      (3L, "a b c d e f g"), // 2 spans; its "a b c d" belongs to doc 1
      (4L, "x y z w")        // unrelated
    ).toDF("doc_id", "text")
    val r = Dedup.spanDedup(d, "doc_id", "text", width = 4)
      .orderBy(col("id")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    def m(s: String) = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(r.toSeq == Seq(
      (1L, 1L, 1L, m("a b c d")),
      (2L, 1L, 0L, m("")), // every span seen earlier → empty survivor
      (3L, 2L, 1L, m("e f g")), // reassembles from the surviving tail
      (4L, 1L, 1L, m("x y z w"))))
  }

  test("duplicatedSpans flags cross-doc and within-doc repeated n-grams") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d"),   // "a b c" shared with doc 2 → 1 of 2 dup
      (2L, "a b c x"),
      (3L, "z z z z z"), // all three positions are the same gram
      (4L, "q w")        // shorter than n → no row
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(d, "doc_id", "text", n = 3)
      .orderBy(col("doc_id")).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.toSeq == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 3L, 3L, 1.0)))
  }

  test("bpeEncode counts tokens under the learned merges, hand-derived") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab cd"), (2L, "abab abab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", 2)
    // pair (a,b) appears in abab(×2 per word, 3 words) and ab → most
    // frequent first merge; round 2 then merges (ab,ab) inside abab
    assert(merges.map(m => (m._1, m._2)) == Seq(("a", "b"), ("ab", "ab")))
    val enc = TextAnalysis.bpeEncode(docs, "doc_id", "text", merges)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // abab → [abab] (1 token), ab → [ab], cd → [c, d]
    assert(enc.toSeq == Seq((1L, 3L, 4L), (2L, 2L, 2L)))
  }

  test("BPE at scale: 256 merges stay plan-depth-bounded and match an " +
      "in-memory reference across checkpoint boundaries") {
    import spark.implicits._
    // 64 distinct-ish 12-char words → ~700 reducible symbols, far
    // more than the 256 merge rounds requested; crosses the
    // BpeCheckpointEvery=32 truncation boundary 8 times.
    val words = (0 until 64).map { i =>
      (0 until 12).map(j => ('a' + ((i * 7 + j * 5 + i * j) % 26)).toChar)
        .mkString
    }
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(df, "text", 256)
    assert(got.length == 256)

    // In-memory canonical BPE over the same vocabulary: count
    // adjacent pairs weighted by word freq, argmax on (count desc,
    // pair lexicographic), merge non-overlapping left-to-right.
    var vocab: Map[Vector[String], Long] =
      words.groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector, ws.length.toLong)
      }
    val expected = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    (0 until 256).foreach { _ =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (sy, f) =>
        sy.indices.dropRight(1).foreach { i =>
          counts((sy(i), sy(i + 1))) =
            counts.getOrElse((sy(i), sy(i + 1)), 0L) + f
        }
      }
      if (counts.nonEmpty) {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), n) => (-n, x, y) }
        expected += ((a, b, c))
        vocab = vocab.groupBy { case (sy, _) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < sy.length) {
            if (i + 1 < sy.length && sy(i) == a && sy(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += sy(i); i += 1 }
          }
          out.result()
        }.map { case (sy, m) => (sy, m.values.sum) }
      }
    }
    assert(got == expected.toSeq)

    // Plan depth stays bounded: unchecked, 256 chained replaces mean
    // 256+ Project nodes in bpeEncode's vocabulary lineage; with the
    // every-32-rounds localCheckpoint the analyzed plan collapses to
    // O(32) nodes regardless of merge count.
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", got)
    val nNodes = enc.queryExecution.analyzed.collect { case p => p }.size
    assert(nNodes < 120, s"analyzed plan has $nNodes nodes — lineage " +
      "truncation regressed")
    val row = enc.collect().head
    assert(row.getLong(1) == 64L) // n_words
    assert(row.getLong(2) >= 64L) // n_bpe_tokens ≥ one per word
  }

  test("dsirWeights favors docs that look like the target distribution") {
    import spark.implicits._
    val docs = Seq(
      (1L, "xx xx xx xx", true), (2L, "xx xx yy xx", true),
      (3L, "yy yy yy yy", false), (4L, "xx yy yy yy", false),
      (5L, "xx xx xx yy", false)
    ).toDF("doc_id", "text", "tgt")
    val r = Curation.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    // target is xx-heavy: the all-xx doc outweighs the all-yy doc,
    // and weights order by xx fraction
    assert(r(1L) > r(5L) && r(5L) > r(4L) && r(4L) > r(3L))
    // partitioning-independent to the last bit (ordered fold)
    val r2 = Curation.dsirWeights(docs.repartition(7), "doc_id", "text",
      col("tgt")).collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r == r2)
  }

  test("duplicateClusters propagates min labels across multi-hop chains") {
    import spark.implicits._
    // chain 5-3-9 (diameter 2: 9 learns of 5 only through 3) plus an
    // isolated pair 20-21
    val pairs = Seq((3L, 5L), (3L, 9L), (20L, 21L)).toDF("a_id", "b_id")
    val comp = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("duplicateClusters closes a 1000-vertex path graph in O(log n) rounds") {
    import spark.implicits._
    // worst case for per-round label propagation: a path of length
    // 1000 has diameter 999, so min-label propagation needs ~999
    // rounds. The alternating small-star/large-star algorithm is
    // O(log n): maxIter=12 both caps the rounds AND asserts
    // convergence, because far vertices only carry label 0 at fixpoint.
    val pairs = (0L until 999L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val labels = Dedup.duplicateClusters(pairs, maxIter = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 1000)
    assert(labels.forall(_._2 == 0L),
      labels.filter(_._2 != 0L).take(5).mkString(", "))
  }

  test("salted agg is identical across input partitionings") {
    import spark.implicits._
    // the salt must derive from row VALUES (not partition layout), so
    // the same data gives byte-identical partials however it arrives
    val data = (1 to 500).map(i => (s"k${i % 3}", i.toLong))
    val a = Skew.saltedSumCount(data.toDF("k", "v").repartition(1),
      Seq("k"), "v").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val b = Skew.saltedSumCount(data.toDF("k", "v").repartition(13),
      Seq("k"), "v").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(a.toSet == b.toSet)
  }

  test("scrubPii redacts emails and phones, counts matches, leaves clean text") {
    import spark.implicits._
    val pii = Seq(
      (1L, "contact john.doe@example.com or 555-123-4567 today"),
      (2L, "two mails a@b.io c.d@e.org and 111 222 3333"),
      (3L, "no sensitive content in this row")
    ).toDF("doc_id", "text")
    val r = Curation.scrubPii(pii, "doc_id", "text")
      .orderBy(col("doc_id")).collect()
    assert(r(0).getAs[Long]("n_emails") == 1L)
    assert(r(0).getAs[Long]("n_phones") == 1L)
    assert(r(0).getAs[String]("scrubbed") ==
      "contact <EMAIL> or <PHONE> today")
    assert(r(1).getAs[Long]("n_emails") == 2L)
    assert(r(1).getAs[Long]("n_phones") == 1L)
    assert(r(2).getAs[Long]("n_emails") == 0L)
    assert(r(2).getAs[String]("scrubbed") == "no sensitive content in this row")
  }

  test("decontaminate flags docs sharing an 8-gram with the benchmark set") {
    import spark.implicits._
    val corpus = Seq(
      (100L, "a b c d e f g h i j"),              // benchmark (id % 100 == 0)
      (1L, "x y a b c d e f g h z"),              // contains bench 8-gram
      (2L, "p q r s t u v w x y z")               // clean
    ).toDF("doc_id", "text")
    val r = Curation.decontaminate(corpus, "doc_id", "text",
        col("doc_id") % 100 === 0)
      .collect().map(x => x.getLong(0) ->
        (x.getAs[Long]("n_hits"), x.getAs[Int]("contaminated"))).toMap
    assert(!r.contains(100L)) // benchmark rows are not scored
    assert(r(1L) == ((1L, 1)))
    assert(r(2L) == ((0L, 0)))
  }

  test("tfidf ranks a document's unique term first") {
    import spark.implicits._
    val d = Seq(
      (1L, "common common common zebra"),
      (2L, "common words only here"),
      (3L, "common words again today")
    ).toDF("doc_id", "text")
    val top1 = Curation.tfidfTopK(d, "doc_id", "text", 2)
      .filter(col("doc_id") === 1 && col("rnk") === 1)
      .head()
    // zebra: tf=1 but df=1 → idf ln(4/2); common: tf=3, df=3 → ln(4/4)=0
    assert(top1.getAs[String]("token") == "zebra")
    assert(top1.getAs[Double]("tfidf") > 0.0)
  }

  test("shardExport writes one sorted directory per md5-nibble shard") {
    import spark.implicits._
    val d = (0L until 64L).map(i => (i, s"doc $i text", 10L))
      .toDF("doc_id", "text", "n_chars")
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Curation.shardExport(d, "doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val shardDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty && shardDirs.length <= 16)
    // each shard dir holds exactly one data file (repartition on the
    // shard key clusters a shard into one task before the write)
    shardDirs.foreach { sd =>
      val parts = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${sd.getName} has ${parts.length} files")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == 64)
    // shard assignment round-trips the md5-nibble rule
    val mismatch = back.filter(
      Curation.shardId(col("doc_id")) =!= col("shard")).count()
    assert(mismatch == 0)
  }

  test("bloomNovelty: exact result, no false negatives, fpp bounded") {
    import spark.implicits._
    // 400 corpus docs; batch = 100 dups of the corpus + 100 novel
    val corpus = (0L until 400L).map(i => (i, s"corpus document number $i"))
      .toDF("doc_id", "text")
    val batch = ((1000L until 1100L).map(i =>
        (i, s"corpus document number ${i - 1000}")) ++ // dup of corpus
      (2000L until 2100L).map(i => (i, s"novel document number $i")))
      .toDF("doc_id", "text")
    val r = Dedup.bloomNovelty(corpus, batch, "doc_id", "text",
        expectedItems = 400L, fpp = 0.03)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r.size == 200)
    // exactness: every true dup flagged 0, every novel row flagged 1 —
    // bloom false positives MUST be cleaned up by the verify join
    (1000L until 1100L).foreach(i => assert(r(i) == 0L, s"dup $i"))
    (2000L until 2100L).foreach(i => assert(r(i) == 1L, s"novel $i"))
  }

  test("outlierGate flags the distribution tails and clips to the band") {
    import spark.implicits._
    // 1..100 with two wild outliers
    val d = ((1L to 100L).map(i => (i, i)) ++
      Seq((101L, 100000L), (102L, -5000L))).toDF("id", "v")
    val r = Curation.outlierGate(d, "id", "v", 0.05, 0.95)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(2), x.getDouble(3)))).toMap
    assert(r(101L)._1 == 1L && r(102L)._1 == 1L)
    // clipped values land exactly on the band edges
    assert(r(101L)._2 == r.values.map(_._2).max)
    assert(r(102L)._2 == r.values.map(_._2).min)
    // the bulk of the 1..100 ramp passes
    assert((20L to 80L).forall(i => r(i)._1 == 0L))
  }

  test("blockedFuzzyJoin: exact edit-distance verify; recall bound by block key") {
    import spark.implicits._
    val l = Seq((1L, "martha"), (2L, "jonathan")).toDF("l_id", "l_name")
    val r = Seq((10L, "marhta"),    // transposition → dist 2
      (11L, "jonatan"),             // deletion → dist 1
      (12L, "xartha"))              // dist 1 BUT first char edited
      .toDF("r_id", "r_name")
    val got = Dedup.blockedFuzzyJoin(l, r, "l_id", "l_name",
        "r_id", "r_name", name => substring(name, 1, 1), maxDist = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(4)))
      .toSet
    assert(got == Set((1L, 10L, 2L), (2L, 11L, 1L)))
    // the first-char edit escapes the first-char block — the
    // documented recall property of blocking, not a verify bug
    assert(!got.exists(_._2 == 12L))
  }

  test("observe() reports funnel telemetry without a second pass") {
    // production pipelines need kept/dropped counts per stage; a
    // second count() job doubles the scan at 100 TB. observe()
    // piggybacks the metrics on the one real pass.
    val obs = org.apache.spark.sql.Observation("quality_stage")
    val filtered = docs()
      .observe(obs, count(lit(1)).as("n_in"),
        sum(when(length(col("text")) > 20, 1L).otherwise(0L))
          .as("n_pass"))
      .filter(length(col("text")) > 20)
    val kept = filtered.count()
    val m = obs.get
    assert(m("n_in") == 5L)
    assert(m("n_pass") == kept)
  }

  test("zorder: documented interleave; buckets localize both dimensions") {
    import spark.implicits._
    // bit golden: a=3 (011), b=5 (101) → z bits b2 a2 b1 a1 b0 a0 =
    // 100111 = 39
    assert(graft.functions.ZOrderBits.compute(3L, 5L) == 39L)
    assert(graft.functions.ZOrderBits.compute(0L, 1L) == 2L)
    assert(graft.functions.ZOrderBits.compute(1L, 0L) == 1L)
    // a full 64×64 grid cut into 16 z-ranges: every bucket must be one
    // 16×16 tile — BOTH dimensions span ≤ 15 (a single-key sort would
    // leave the other dimension spanning the full 0..63)
    val grid = (for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b))
      .toDF("ka", "kb")
    val r = Curation.zorderBucketStats(grid, "ka", "kb", buckets = 16)
      .collect()
    assert(r.length == 16)
    r.foreach { x =>
      assert(x.getAs[Long]("n") == 256L)
      assert(x.getAs[Long]("max_a") - x.getAs[Long]("min_a") == 15L, x)
      assert(x.getAs[Long]("max_b") - x.getAs[Long]("min_b") == 15L, x)
    }
  }

  test("perceptronQuality: separable data converges; training is stable") {
    import spark.implicits._
    val d = ((0L until 20L).map(i => (i, "alpha beta gamma alpha", 1L)) ++
      (20L until 40L).map(i => (i, "delta epsilon zeta zeta", -1L)))
      .toDF("doc_id", "text", "y_true")
    def run(df: org.apache.spark.sql.DataFrame) =
      Curation.perceptronQuality(df, "doc_id", "text", col("y_true"),
          buckets = 16, rounds = 3)
        .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
        .toMap
    val r = run(d)
    // linearly separable (disjoint token sets) → perfect after 3 rounds
    (0L until 20L).foreach(i => assert(r(i)._2 == 1L, s"doc $i: ${r(i)}"))
    (20L until 40L).foreach(i => assert(r(i)._2 == -1L, s"doc $i: ${r(i)}"))
    // integer training → bit-identical activations on any partitioning
    assert(run(d.repartition(7)) == r)
  }

  test("preprocess: unit-norm truncated vectors, kept_mass ≤ 1, stable") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val d = (0L until 40L).map(i =>
        (i, Array.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val r = Similarity.preprocess(d, "vec_id", "embedding", keepDims = 32)
    val rows = r.collect()
    assert(rows.length == 40)
    rows.foreach { x =>
      val vp = x.getSeq[Double](1)
      assert(vp.length == 32)
      val norm = math.sqrt(vp.map(v => v * v).sum)
      assert(math.abs(norm - 1.0) < 1e-9, s"v_prep norm $norm")
      val kept = x.getDouble(3)
      assert(kept > 0.0 && kept <= 1.0 + 1e-9, s"kept_mass $kept")
    }
    // bit-identical under repartitioning (integer-micro means)
    val a = r.select(col("vec_id"), col("norm_centered")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val b = Similarity.preprocess(d.repartition(7), "vec_id",
        "embedding", 32)
      .select(col("vec_id"), col("norm_centered")).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(a == b)
    // degenerate guard: a vector EQUAL to the corpus mean (here two
    // identical vectors, so both center to zero) gets NULL v_prep —
    // never NaN/Infinity components leaking into downstream ANN
    val deg = Seq((1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)))
      .toDF("vec_id", "embedding")
    val dr = Similarity.preprocess(deg, "vec_id", "embedding", 4).collect()
    assert(dr.length == 2)
    dr.foreach { x =>
      assert(x.isNullAt(1), "degenerate v_prep must be NULL")
      assert(x.getDouble(2) == 0.0) // norm_centered
      assert(x.isNullAt(3), "degenerate kept_mass must be NULL")
    }
  }

  test("canonicalizeUrls: case, www, fragment, tracking params, " +
      "param order, trailing slash") {
    import spark.implicits._
    val urls = Seq(
      (1L, "HTTPS://WWW.Ex.COM/A/b/?utm_source=x&b=2&a=1#frag"),
      (2L, "https://ex.com/A/b?a=1&b=2"),   // already canonical twin of 1
      (3L, "http://ex.com/plain"),          // no query, no fragment
      (4L, "https://Ex.Com/p/?ref=z&fbclid=y&gclid=w&utm_campaign=c"),
      (5L, "https://ex.com/CaseSensitivePath")
    ).toDF("id", "url")
    val r = Curation.canonicalizeUrls(urls, "id", "url").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getString(2)))).toMap
    assert(r(1L) == (("https://ex.com/A/b?a=1&b=2", "ex.com")))
    // one logical page, two spellings → ONE canonical key
    assert(r(1L) == r(2L))
    assert(r(3L) == (("http://ex.com/plain", "ex.com")))
    // all params were tracking → no '?' survives
    assert(r(4L) == (("https://ex.com/p", "ex.com")))
    // path case preserved (RFC 3986: only scheme+host case-fold)
    assert(r(5L)._1 == "https://ex.com/CaseSensitivePath")
  }

  test("canonicalizeUrls: default ports stripped per scheme, " +
      "percent-escape hex uppercased") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://Ex.COM:443/a"),   // default for https → stripped
      (2L, "http://ex.com:80/a"),     // default for http → stripped
      (3L, "http://ex.com:8080/a"),   // non-default → part of host key
      (4L, "http://ex.com:443/a"),    // 443 is NOT default for http
      (5L, "https://ex.com/a%2fb?x=%3d1"),  // lowercase escapes
      (6L, "https://ex.com/a%2Fb?x=%3D1"),  // uppercase twin of 5
      (7L, "https://ex.com/100%25"),  // literal escaped percent
      (8L, "https://ex.com/50%ok"),   // stray % before non-hex: as-is
      (9L, "https://ex.com/t%")       // trailing stray %
    ).toDF("id", "url")
    val r = Curation.canonicalizeUrls(urls, "id", "url").collect()
      .map(x => x.getLong(0) -> ((x.getString(1), x.getString(2)))).toMap
    assert(r(1L) == (("https://ex.com/a", "ex.com")))
    assert(r(2L) == (("http://ex.com/a", "ex.com")))
    assert(r(3L) == (("http://ex.com:8080/a", "ex.com:8080")))
    assert(r(4L) == (("http://ex.com:443/a", "ex.com:443")))
    assert(r(5L) == (("https://ex.com/a%2Fb?x=%3D1", "ex.com")))
    // mixed-case escapes collapse to one canonical spelling
    assert(r(5L) == r(6L))
    assert(r(7L)._1 == "https://ex.com/100%25")
    assert(r(8L)._1 == "https://ex.com/50%ok")
    assert(r(9L)._1 == "https://ex.com/t%")
  }

  test("synthetic media corpora: planted twin pairs are recalled by " +
      "both near-dup miners at hamming 0") {
    import spark.implicits._
    val ids = (0L until 30L).toDF("doc_id")
    val img = MultiModal.aHashNearDup(
        MultiModal.syntheticImageCorpus(ids, "doc_id"), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val imgPairs = img.map(p => (p._1, p._2)).toSet
    (0L until 30L).foreach { k =>
      assert(imgPairs.contains((2 * k, 2 * k + 1)) ||
        imgPairs.contains((2 * k + 1, 2 * k)),
        s"image twin pair for id $k not recalled")
    }
    // the brightness shift is aHash-invariant by construction
    img.filter(p => p._1 / 2 == p._2 / 2).foreach(p => assert(p._3 == 0L))
    val aud = MultiModal.audioNearDup(
        MultiModal.syntheticAudioCorpus(ids, "doc_id"), maxDist = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val audPairs = aud.map(p => (p._1, p._2)).toSet
    (0L until 30L).foreach { k =>
      assert(audPairs.contains((2 * k, 2 * k + 1)) ||
        audPairs.contains((2 * k + 1, 2 * k)),
        s"audio twin pair for id $k not recalled")
    }
    aud.filter(p => p._1 / 2 == p._2 / 2).foreach(p => assert(p._3 == 0L))
  }

  test("resampleHourlyLocf: LOCF fill; maxGridHours caps a sparse " +
      "long-span key") {
    import spark.implicits._
    val H = 3600000L
    val hours = Seq(
      (1L, 0L * H, 10.0), (1L, 3L * H, 20.0),   // normal: 4-hour span
      (2L, 0L * H, 1.0), (2L, 100000L * H, 2.0) // sparse ~11-year span
    ).toDF("user_id", "hour_ms", "v")
    val un = Resample.resampleHourlyLocf(hours, "user_id", "hour_ms", "v")
    val u1 = un.filter(col("user_id") === 1L).orderBy("hour_ms").collect()
    assert(u1.map(_.getLong(1)).toSeq == Seq(0L, H, 2 * H, 3 * H))
    assert(u1.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L, 1L)) // observed
    assert(u1.map(_.getDouble(3)).toSeq == Seq(10.0, 10.0, 10.0, 20.0))
    // uncapped, the sparse key generates its full 100001-hour grid —
    // the exact inflation the cap exists for
    assert(un.filter(col("user_id") === 2L).count() == 100001L)
    val cap = Resample.resampleHourlyLocf(hours, "user_id", "hour_ms",
      "v", maxGridHours = 24L)
    val u2 = cap.filter(col("user_id") === 2L).orderBy("hour_ms").collect()
    assert(u2.length == 24) // grid rows per key ≤ cap
    assert(u2.last.getLong(1) == 100000L * H) // anchored at last obs
    // the old observation fell outside the capped window: fill stays
    // NULL until the first in-window observation (documented)
    assert(u2.init.forall(_.isNullAt(3)))
    assert(u2.last.getDouble(3) == 2.0)
    // a short-span key is untouched by the cap
    assert(cap.filter(col("user_id") === 1L).count() == 4L)
  }

  test("tokenEntropy: zero for constant docs, ln(k) for uniform, stable") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"),                 // constant → 0
      (2L, "a b"),                     // uniform 2 → ln 2
      (3L, "a a b b c c d d")          // uniform 4 → ln 4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(1L)._1 == 4L && r(1L)._2 == 1L &&
      math.abs(r(1L)._3) < 1e-5) // quantization leaves ~1e-6 residue
    // micro-nat quantization: each term rounds before the sum
    assert(math.abs(r(2L)._3 - math.log(2)) < 2e-6 && r(2L)._2 == 2L)
    assert(math.abs(r(3L)._3 - math.log(4)) < 4e-6 && r(3L)._1 == 8L)
    // identical under repartitioning (integer-sum determinism)
    val r2 = TextAnalysis.tokenEntropy(d.repartition(5), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r.forall { case (k, v) => r2(k) == v._3 })
  }

  test("stripMarkup: blocks dropped, tags stripped, entities one-pass decoded") {
    import spark.implicits._
    val d = Seq(
      (1L, "<html><head><script>if (1 < 2) alert('x');</script>" +
        "<style>.a{b:c}</style></head><body><p class=\"x\">Hello" +
        "<br/>world</p></body></html>"),
      (2L, "Tom &amp; Jerry say &lt;hi&gt; &quot;loud&quot;&nbsp;" +
        "&#39;ok&#39; &amp;lt;once&amp;gt;"),
      (3L, "plain text, no markup at all")
    ).toDF("doc_id", "html")
    val r = TextAnalysis.stripMarkup(d, "doc_id", "html")
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2)))).toMap
    // script body (with its unescaped '<') and style vanish wholesale;
    // tags become separators
    assert(r(1L)._1 == "Hello world", r(1L))
    // html, head, /head, body, p, br/, /p, /body, /html = 9 tags left
    assert(r(1L)._2 == 9L, s"tag count ${r(1L)._2}")
    // ONE decode pass: &amp;lt; yields the literal &lt;, never <
    assert(r(2L)._1 == "Tom & Jerry say <hi> \"loud\" 'ok' &lt;once&gt;",
      r(2L))
    assert(r(3L)._1 == "plain text, no markup at all" && r(3L)._2 == 0L)
    // edges: unmatched '<' is not a tag; '&amp' without ';' is not an
    // entity; both survive extraction untouched
    val e = TextAnalysis.stripMarkup(
        Seq((9L, "1 < 2 and A&ampB stay put")).toDF("doc_id", "html"),
        "doc_id", "html")
      .collect().head
    assert(e.getString(1) == "1 < 2 and A&ampB stay put")
    assert(e.getLong(2) == 0L)
  }

  test("splitLeakage: content split is stable; cross-split near-dups flagged") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val d = Seq(
      (1L, base + "alpha ending one"),
      (2L, base + "alpha ending two"), // near-dup of 1 (high jaccard)
      (3L, "completely unrelated content about spark shuffles and joins " +
        "with many extra tokens to avoid any shingle overlap at all"),
      (4L, base + "alpha ending one") // EXACT dup of 1 → same split always
    ).toDF("doc_id", "text")
    val r = Curation.splitLeakage(d, "doc_id", "text", tau = 0.5)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    // exact dups share the content hash → identical split, never a leak
    assert(r(1L)._1 == r(4L)._1)
    // doc 3 has no near-dup anywhere → never a leak
    assert(r(3L)._2 == 0L && r(3L)._3 == 0L)
    // docs 1/2 are verified near-dups: leak flags iff splits differ
    val leak12 = r(1L)._1 != r(2L)._1
    assert((r(1L)._3 == 1L) == leak12 || r(1L)._2 > 0L == leak12)
    assert((r(2L)._3 == 1L) == leak12)
    // output is deterministic under repartitioning
    val r2 = Curation.splitLeakage(d.repartition(7), "doc_id", "text", 0.5)
      .collect().map(x => x.getLong(0) ->
        ((x.getString(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r == r2)
  }

  test("BloomProbe has no false negatives and honors the fpp order") {
    import spark.implicits._
    val member = (0L until 1000L).map(i => s"member $i").toDF("h")
    val bloom = member.stat.bloomFilter("h", 1000L, 0.03)
    // every inserted value must probe true (the dedup-safety property)
    val misses = member
      .filter(!graft.functions.BloomProbe(col("h"), bloom)).count()
    assert(misses == 0)
    // non-members: positive rate should be near fpp, not near 1
    val nonMember = (0L until 2000L).map(i => s"other $i").toDF("h")
    val falsePos = nonMember
      .filter(graft.functions.BloomProbe(col("h"), bloom)).count()
    assert(falsePos < 2000L * 0.03 * 5,
      s"false-positive rate ${falsePos / 2000.0} far above fpp")
  }

  test("KMV overlap: exact when universes fit k; duplicate-proof") {
    import spark.implicits._
    // |A|=40 distinct, |B|=30 distinct, |A∩B|=20; every key loaded
    // 3x so the distinct() inside the sketch is doing real work
    val a = (0L until 40L).flatMap(i => Seq.fill(3)(s"key $i"))
      .toDF("k")
    val b = (20L until 50L).flatMap(i => Seq.fill(3)(s"key $i"))
      .toDF("k")
    val r = Sketches.kmvOverlap(a, b, "k", k = 128).collect().head
    assert(r.getDouble(0) == 40.0 && r.getDouble(1) == 30.0)
    assert(r.getDouble(2) == 50.0, "union must be exact below k")
    assert(r.getDouble(3) == 20.0, "overlap must be exact below k")
    assert(math.abs(r.getDouble(4) - 20.0 / 50.0) < 1e-12)
  }

  test("KMV overlap: estimation path within 15% at k=256, partition-invariant") {
    import spark.implicits._
    val n = 4000
    val a = (0 until n).map(i => s"doc $i").toDF("k")
    val b = (n / 2 until n + n / 2).map(i => s"doc $i").toDF("k")
    def run(ra: org.apache.spark.sql.DataFrame,
        rb: org.apache.spark.sql.DataFrame) =
      Sketches.kmvOverlap(ra, rb, "k", k = 256).collect().head
    val r = run(a, b)
    // truth: |A|=|B|=4000, |A∪B|=6000, |A∩B|=2000
    assert(math.abs(r.getDouble(0) - n) / n < 0.15, s"A est ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - n) / n < 0.15, s"B est ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - 1.5 * n) / (1.5 * n) < 0.15,
      s"union est ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - n / 2) / (n / 2) < 0.3,
      s"overlap est ${r.getDouble(3)}")
    // the sketch is a set of order statistics — any partitioning of
    // the scans must produce the identical row
    val r2 = run(a.repartition(7), b.repartition(3))
    assert(r.toSeq == r2.toSeq, "KMV output must be partition-invariant")
  }

  test("KMV sketch plans as TakeOrdered, not a global sort") {
    import spark.implicits._
    val df = (0 until 1000).map(i => s"v$i").toDF("k")
    val plan = Sketches.kmvSketch(df, "k", 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k should be TakeOrdered (every partition forwards ≤k " +
        s"longs), got:\n$plan")
  }

  test("groupedSplit: split is a pure function of the group; fractions gated") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"src${i % 13}"))
      .toDF("id", "source")
    val r = Curation.groupedSplit(df.repartition(7), "source")
    val straddle = r.groupBy(col("source"))
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddle == 0, "a source landed in more than one split")
    val names = r.select(col("split")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(names.subsetOf(Set("train", "val", "test")) && names.nonEmpty)
    intercept[IllegalArgumentException](
      Curation.groupedSplit(df, "source", trainPct = 95, valPct = 10))
  }

  test("keepBestPerCluster keeps the longest member, singletons survive") {
    import spark.implicits._
    // docs 1/2 are exact dups (equal length → tie to smaller id);
    // doc 3 is a near-dup of them but LONGER → it must be the rep of
    // the merged cluster if jaccard >= 0.5 links it; docs 4/5 are
    // unrelated singletons and must keep themselves.
    val r = Dedup.keepBestPerCluster(docs(), "doc_id", "text", 0.5)
      .orderBy(col("doc_id")).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("cluster_id"),
        x.getAs[Long]("cluster_size"), x.getAs[Int]("keep")))
    val byId = r.map(t => t._1 -> t).toMap
    // 1 and 2 share a cluster; their reps are consistent
    assert(byId(1L)._2 == byId(2L)._2)
    // exactly one keeper per cluster
    val keepers = r.groupBy(_._2).map { case (_, rows) =>
      rows.count(_._4 == 1) }
    assert(keepers.forall(_ == 1), s"per-cluster keeper counts: $keepers")
    // singletons keep themselves
    assert(byId(4L) == ((4L, 4L, 1L, 1)) && byId(5L) == ((5L, 5L, 1L, 1)))
    // within the 1-2(-3) cluster the keeper is the longest member
    // (all texts 1-3 have 12 tokens → tie resolves to min id 1)
    assert(byId(1L)._4 == 1 && byId(2L)._4 == 0)
  }

  test("PMI collocations: hand-computed ratios, min-count gate, invariance") {
    import spark.implicits._
    // corpus: n_tok=10, n_pairs=8; bigram counts ab:2 ba:1 cd:3 dc:2;
    // unigrams a:2 b:2 c:3 d:3. minCount=2 keeps ab/cd/dc; ratios
    // ab: 2*100/(8*4)=6.25, cd: 300/72=4.1667, dc: 200/72=2.7778 —
    // k=2 keeps ab,cd; pmi = ln(ratio) to 4dp.
    val docs = Seq("a b a b", "c d c d c d").toDF("text")
    val got = TextAnalysis.pmiCollocations(docs, "text", 2, 2L)
      .orderBy(col("pmi").desc)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getAs[Long]("c_ab"), r.getAs[Long]("c_a"), r.getAs[Long]("c_b"),
        r.getAs[Double]("pmi")))
    assert(got.toSeq == Seq(
      ("a", "b", 2L, 2L, 2L, 1.8326),
      ("c", "d", 3L, 3L, 3L, 1.4271)))
    val again = TextAnalysis
      .pmiCollocations(docs.repartition(4), "text", 2, 2L)
      .orderBy(col("pmi").desc)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(again.toSeq == Seq(("a", "b"), ("c", "d")),
      "PMI top-k not repartition-invariant")
  }

  test("scaling laws: exact Heaps on all-distinct docs, Zipf ≈ -1 on a 1/r corpus") {
    import spark.implicits._
    // every doc all-distinct tokens → V = n exactly → after identical
    // micro-quantization ym == xm per point, so the OLS is EXACTLY
    // beta=1, lnK=0 (integer arithmetic, no FP tolerance needed).
    // Token counts follow c = 24/r for r=1..4 (t1×24 t2×12 t3×8 t4×6
    // spread across docs) → Zipf slope ≈ -1 within quantization error.
    val words = Seq.fill(24)("t1") ++ Seq.fill(12)("t2") ++
      Seq.fill(8)("t3") ++ Seq.fill(6)("t4")
    // deal round-robin into docs of varying length, keeping each
    // doc's tokens distinct (one occurrence of a word per doc)
    val docs = (0 until 24).map { i =>
      val mine = Seq("t1") ++
        (if (i < 12) Seq("t2") else Nil) ++
        (if (i < 8) Seq("t3") else Nil) ++
        (if (i < 6) Seq("t4") else Nil)
      mine.mkString(" ")
    }.toDF("text")
    assert(words.length == 50) // sanity on the plan above
    val r = TextAnalysis.corpusScalingLaws(docs, "text", topR = 4)
      .collect().head
    assert(r.getAs[Double]("heaps_beta") == 1.0)
    assert(r.getAs[Double]("heaps_lnk") == 0.0)
    assert(r.getAs[Long]("n_top") == 4L && r.getAs[Long]("n_docs") == 24L)
    assert(math.abs(r.getAs[Double]("zipf_slope") + 1.0) < 2e-5,
      s"zipf_slope=${r.getAs[Double]("zipf_slope")}")
    val again = TextAnalysis
      .corpusScalingLaws(docs.repartition(5), "text", topR = 4)
      .collect().head
    assert(again == r, "scaling-law row not repartition-invariant")
  }

  test("association rules: lift/confidence on a hand basket set; maxBasket guard") {
    import spark.implicits._
    val bi = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L),
      (3L, 1L), (3L, 2L), (3L, 4L), (4L, 3L), (4L, 4L))
      .toDF("basket", "item")
    // 4 baskets; only pair {1,2} reaches support 2 (it has 3);
    // lift = 3*4/(3*3) = 1.3333, confidence = 1.0 both directions.
    val got = Association.rulesTopK(bi, "basket", "item", 5, 2L)
      .collect().map(r => (r.getAs[Long]("antecedent"),
        r.getAs[Long]("consequent"), r.getAs[Long]("n_pair"),
        r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
    assert(got.toSeq == Seq(
      (1L, 2L, 3L, 1.0, 1.3333), (2L, 1L, 3L, 1.0, 1.3333)))
    // maxBasket=2 drops the two 3-item baskets BEFORE pair counting:
    // supports recompute over survivors (n_baskets=2), each remaining
    // pair occurs once with lift 1*2/(1*1) = 2.0.
    val guarded = Association
      .rulesTopK(bi.repartition(4), "basket", "item", 10, 1L,
        maxBasket = 2)
      .collect().map(r => (r.getAs[Long]("antecedent"),
        r.getAs[Long]("consequent"), r.getAs[Double]("lift")))
    assert(guarded.toSeq == Seq((1L, 2L, 2.0), (2L, 1L, 2.0),
      (3L, 4L, 2.0), (4L, 3L, 2.0)))
  }

  test("label propagation separates two bridged triangles; partition-invariant") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("x", "y")
    def run(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.Graph.labelPropagation(df, "x", "y", rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(edges)
    // hand-traced synchronous rounds with the (count desc, label asc)
    // rule: the bridge edge does NOT merge the triangles
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L), got.toString)
    assert(run(edges.repartition(7)) == got, "partitioning changed labels")
    // for contrast: connected components WOULD glue them via the bridge
    val cc = graft.operators.Dedup.duplicateClusters(
      edges.select(col("x").as("a_id"), col("y").as("b_id")))
    assert(cc.select(countDistinct(col("cluster_id"))).head().getLong(0) == 1L)
  }

  test("annJoin with nprobe == nlist is exact; recall holds at defaults") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def corpus(ids: Range): org.apache.spark.sql.DataFrame =
      ids.map(i => (i.toLong, Array.fill(16)(rnd.nextFloat() * 2 - 1)))
        .toDF("vec_id", "embedding")
    val l = corpus(0 until 40)
    val r = corpus(1000 until 1120)
    // exact baseline: brute-force cosine top-3 per left row
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val lv = l.collect().map(row => row.getLong(0) -> row.getSeq[Float](1)).toMap
    val rv = r.collect().map(row => row.getLong(0) -> row.getSeq[Float](1)).toMap
    val exact = lv.map { case (lid, v) =>
      lid -> rv.toSeq.map { case (rid, w) => (rid, cos(v, w)) }
        .sortBy { case (rid, s) => (-s, rid) }.take(3).map(_._1)
    }
    // nprobe == nlist: every cell probed → identical to brute force
    val full = graft.operators.Similarity
      .annJoin(l, r, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 8)
      .collect().groupBy(_.getLong(0))
      .map { case (lid, rows) =>
        lid -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(full == exact)
    // defaults (nprobe 4 of 8 cells): recall@3 against exact ≥ 0.6 on
    // random vectors — the IVF trade documented in the scaladoc
    val approx = graft.operators.Similarity
      .annJoin(l, r, "vec_id", "embedding", k = 3, nlist = 8, nprobe = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (lid, rows) => lid -> rows.map(_.getLong(1)).toSet }
    val recall = exact.map { case (lid, want) =>
      want.count(approx.getOrElse(lid, Set.empty)).toDouble / want.size
    }.sum / exact.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("adamicAdar scores hand graph exactly; edges excluded; cap honored") {
    import spark.implicits._
    // path 1-2-3 plus hub 9 linked to {1,2,3}: candidate non-edge
    // (1,3) has common neighbors {2, 9}; (2,9) is an EDGE so never
    // reported even though 1,3 are shared neighbors
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 1L), (9L, 2L), (9L, 3L))
      .toDF("x", "y")
    val got = Graph.adamicAdarTopK(edges, "x", "y", maxDegree = 64, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toList
    // (1,3) is the ONLY non-edge; its middles 2 and 9 both have
    // degree 3, so AA(1,3) = 2/ln3 in micro-weights
    val w3 = math.round(1e6 / math.log(3))
    assert(got == List((1L, 3L, 2L, 2 * w3)), got.toString)
    // cap at 2: only deg-2 nodes (1 and 3) stay eligible as middles;
    // the single pair they generate, (2,9), is an existing edge and
    // is anti-joined away -> empty report
    val capped = Graph.adamicAdarTopK(edges, "x", "y", maxDegree = 2, topK = 10)
    assert(capped.count() == 0L)
    // partition invariance
    val rep = Graph.adamicAdarTopK(edges.repartition(5), "x", "y", 64, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toList
    assert(rep == got)
  }

  test("rollingAnomalyReport flags a spike, resets per day, honors minN") {
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def ts(day: Int, i: Int) = new java.sql.Timestamp(
      base.getTime + day * 86400000L + i * 1000L)
    // day 0: 30 steady values then one huge spike then steady;
    // day 1: only 5 events (below minN -> never scored)
    val rows =
      (0 until 30).map(i => ("m", ts(0, i), i.toLong, 100L)) ++
      Seq(("m", ts(0, 30), 30L, 100000L)) ++
      (31 until 40).map(i => ("m", ts(0, i), i.toLong, 100L)) ++
      (0 until 5).map(i => ("m", ts(1, i), 100L + i, 100000L))
    val df = rows.toDF("k", "ts", "id", "v")
    val r = Resample.rollingAnomalyReport(df, "k", "ts", "id", "v",
      window = 50, minN = 20, zThresh = 3).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_events") == 45L)
    // day 0 scores events 20..39 (20 of them); day 1 has max n = 4 < minN
    assert(row.getAs[Long]("n_scored") == 20L)
    // the spike is the only anomaly: constant trailing window has
    // sigma 0 -> strict > test fires only for a different value; the
    // post-spike steady values see a window CONTAINING the spike
    // (huge sigma) and stay unflagged
    assert(row.getAs[Long]("n_anomalies") == 1L, row.toString)
    assert(row.getAs[Long]("sum_anom_value") == 100000L)
  }

  test("transitionMatrix counts steps, breaks on gap, normalizes rows") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def ts(s: Long) = new java.sql.Timestamp(t0 + s * 1000L)
    val ev = Seq(
      // user 1: A->B->B then a 1-hour gap (chain break) then B->A
      (1L, ts(0), 1L, "A"), (1L, ts(10), 2L, "B"), (1L, ts(20), 3L, "B"),
      (1L, ts(20 + 3600), 4L, "B"), (1L, ts(20 + 3610), 5L, "A"),
      // user 2: A->B only; chains never span users
      (2L, ts(5), 6L, "A"), (2L, ts(15), 7L, "B")
    ).toDF("u", "ts", "id", "st")
    val got = Association.transitionMatrix(ev, "u", "ts", "id", "st",
        maxGapSeconds = 1800L)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toList
    // A: 2×A->B (prob 1); B: B->B and B->A, 500000 micro each
    assert(got == List(("A", "B", 2L, 1000000L),
      ("B", "A", 1L, 500000L), ("B", "B", 1L, 500000L)), got.toString)
  }

  test("psiDrift: identical populations score ~0, a shifted one scores high") {
    import spark.implicits._
    // ref uniform over bins 0..3; cur identical -> psi ~ 0
    val same = (0 until 4).flatMap(b =>
      Seq.fill(25)(("k", b * 250L + 100L, false)) ++
      Seq.fill(25)(("k", b * 250L + 100L, true)))
      .toDF("k", "v", "cur")
    val r0 = Curation.psiDrift(same, "k", "v", "cur",
      bins = 4, lo = 0L, hi = 1000L).collect().head
    assert(r0.getAs[Long]("n_ref") == 100L && r0.getAs[Long]("n_cur") == 100L)
    assert(math.abs(r0.getAs[Long]("psi_micro")) < 1000L, r0.toString)
    // cur mass collapsed into bin 0 -> large positive PSI (>> 0.25)
    val shifted = ((0 until 4).flatMap(b =>
      Seq.fill(25)(("k", b * 250L + 100L, false))) ++
      Seq.fill(100)(("k", 5L, true))).toDF("k", "v", "cur")
    val r1 = Curation.psiDrift(shifted, "k", "v", "cur",
      bins = 4, lo = 0L, hi = 1000L).collect().head
    assert(r1.getAs[Long]("psi_micro") > 250000L, r1.toString)
    // out-of-range values clamp into the edge bins, never drop
    val clamp = Seq(("k", -50L, false), ("k", 99999L, true))
      .toDF("k", "v", "cur")
    val rc = Curation.psiDrift(clamp, "k", "v", "cur",
      bins = 4, lo = 0L, hi = 1000L).collect().head
    assert(rc.getAs[Long]("n_ref") == 1L && rc.getAs[Long]("n_cur") == 1L)
  }

  test("topComponentMicro finds a planted dominant direction; partition-invariant") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 200 vectors: strong variance along axis 2, weak noise elsewhere
    val vecs = (0 until 200).map { _ =>
      val s = if (rnd.nextBoolean()) 5f else -5f
      Array.tabulate(8)(i =>
        (if (i == 2) s else 0f) + rnd.nextFloat() * 0.2f - 0.1f)
    }.map(Tuple1(_)).toDF("embedding")
    def run(df: org.apache.spark.sql.DataFrame): Seq[(Int, Long)] =
      Similarity.topComponentMicro(df, "embedding", dim = 8, iters = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val got = run(vecs)
    val byIdx = got.toMap
    // axis 2 (component_idx 3) dominates at the L-inf normalization
    assert(math.abs(byIdx(3)) == 1000000L, got.toString)
    assert((1 to 8).filter(_ != 3).forall(i =>
      math.abs(byIdx(i)) < 100000L), got.toString)
    // bit-identical under repartitioning (integer Gram, exact matvec)
    assert(run(vecs.repartition(7)) == got)
  }

  test("hllDistinctRollup: union sees through cross-bucket overlap") {
    import spark.implicits._
    // 3 days, 300 users each, all days share the same user set:
    // naive sum = 900, true distinct = 300
    val df = (0 until 3).flatMap(d =>
      (0 until 300).map(u => (d, u.toLong))).toDF("day", "uid")
    val r = Sketches.hllDistinctRollup(df, "day", "uid").collect().head
    assert(r.getAs[Long]("n_buckets") == 3L)
    assert(r.getAs[Long]("sum_bucket_exact") == 900L)
    assert(r.getAs[Long]("exact_total") == 300L)
    assert(r.getAs[Long]("union_within_pct") == 1L)
    // partition count must not move the flag (mergeable bucket state)
    val rp = Sketches.hllDistinctRollup(df.repartition(13), "day", "uid")
      .collect().head
    assert(rp.getAs[Long]("union_within_pct") == 1L)
  }

  test("kAnonymityReport flags sub-k groups with exact ppm") {
    import spark.implicits._
    // lang en: one group of 10 (safe) + one group of 2 (at risk);
    // lang fr: a singleton group (at risk)
    val df = (Seq.fill(10)(("en", "web", 0L)) ++
      Seq.fill(2)(("en", "book", 0L)) ++ Seq(("fr", "web", 1L)))
      .toDF("lang", "source", "len_bucket")
    val r = Curation.kAnonymityReport(df,
        Seq("lang", "source", "len_bucket"), k = 5, byCol = "lang")
      .collect().map(x => x.getString(0) -> x).toMap
    val en = r("en")
    assert(en.getAs[Long]("n_groups") == 2L &&
      en.getAs[Long]("n_small_groups") == 1L &&
      en.getAs[Long]("n_rows_at_risk") == 2L &&
      en.getAs[Long]("risk_ppm") == math.round(1e6 * 2.0 / 12.0))
    val fr = r("fr")
    assert(fr.getAs[Long]("n_rows_at_risk") == 1L &&
      fr.getAs[Long]("risk_ppm") == 1000000L)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val old_ = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "c")
    val neu = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "c")
    val r = Dedup.snapshotDiff(old_, neu, "id", "c").collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r == Map("added" -> (1L, 4L, 4L), "removed" -> (1L, 1L, 1L),
      "changed" -> (1L, 3L, 3L), "unchanged" -> (1L, 2L, 2L)), r.toString)
    // null content: presence decides added/removed, null-safe
    // equality decides changed — null==null is unchanged, null vs
    // value is changed, and a null-content row is never "added"
    val o2 = Seq((1L, Option.empty[String]), (2L, Some("x")),
      (3L, Option.empty[String])).toDF("id", "c")
    val n2 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (4L, Some("y"))).toDF("id", "c")
    val r2 = Dedup.snapshotDiff(o2, n2, "id", "c").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r2 == Map("unchanged" -> 1L, "changed" -> 1L,
      "removed" -> 1L, "added" -> 1L), r2.toString)
  }

  test("sqrtTemperatureShares: sqrt smoothing lifts the tail, shares sum to ~1") {
    import spark.implicits._
    // head 900 docs, tail 100: raw share 90/10, sqrt share 75/25
    val df = (Seq.fill(900)("en") ++ Seq.fill(100)("sw")).toDF("lang")
    val r = Sampling.sqrtTemperatureShares(df, "lang", budget = 1000L)
      .collect().map(x => x.getString(0) -> x).toMap
    val en = r("en"); val sw = r("sw")
    assert(en.getAs[Long]("n_docs") == 900L)
    assert(en.getAs[Long]("share_micro") == 750000L, en.toString)
    assert(sw.getAs[Long]("share_micro") == 250000L, sw.toString)
    assert(sw.getAs[Long]("expected_docs") == 250L)
    // the tail is over-sampled 2.5 epochs; the head under-sampled
    assert(sw.getAs[Long]("epochs_micro") == 2500000L)
    assert(en.getAs[Long]("epochs_micro") < 1000000L)
  }

  test("sparseCosineTopK ranks identical docs at 1.0, prunes by dfCap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),   // identical to 1 -> cos 1.0
      (3L, "alpha beta epsilon zeta"),  // partial overlap with 1,2
      (4L, "completely unrelated words here")
    ).toDF("doc_id", "text")
    val got = Retrieval.sparseCosineTopK(docs, "doc_id", "text",
        dfCap = 500, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // identical pair first at exactly 1e6 micro
    assert(got.head == (1L, 2L, 1000000L), got.toList.toString)
    // the partial-overlap pairs follow, strictly below 1.0; doc 4
    // shares no df>=2 term with anyone and never appears
    assert(got.tail.forall { case (_, _, c) => c < 1000000L && c > 0L })
    assert(!got.exists { case (a, b, _) => a == 4L || b == 4L })
    // dfCap = 2 prunes the df=3 terms (alpha, beta): 1-2 still tie
    // perfectly on their surviving df=2 terms (gamma, delta)
    val capped = Retrieval.sparseCosineTopK(docs, "doc_id", "text",
        dfCap = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(capped.head == (1L, 2L, 1000000L), capped.toList.toString)
    assert(capped.length == 1, capped.toList.toString)
    // partition invariance
    val rep = Retrieval.sparseCosineTopK(docs.repartition(7), "doc_id",
      "text", 500, 10).collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(3)))
    assert(rep.toSeq == got.toSeq)
  }

  test("tableProfile: counts, nulls, distincts, typed bounds") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("b"), Some(10L)),
      (2L, None, Some(2L)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(10L))
    ).toDF("id", "s", "n")
    val r = Profile.tableProfile(df).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet == Set("id", "s", "n"))
    val id = r("id")
    assert(id.getLong(1) == 4L && id.getLong(2) == 0L &&
      id.getLong(3) == 4L && id.getString(4) == "1" &&
      id.getString(5) == "4")
    val s = r("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 2L &&
      s.getString(4) == "a" && s.getString(5) == "b")
    val n = r("n")
    // typed min/max: 2 < 10 numerically (lexicographic would say "10" < "2")
    assert(n.getLong(2) == 1L && n.getLong(3) == 2L &&
      n.getString(4) == "2" && n.getString(5) == "10")
  }

  test("shortestPaths: hand graph exact, hop-bounded, min-weight edge wins") {
    import spark.implicits._
    //   1 -2-> 2 -3-> 3 -1-> 4 ; 1 -9-> 3 ; 3 -0-> 3 (self, dropped);
    //   duplicate edge 1->2 with worse weight 5 (min wins); 5 isolated seed
    val e = Seq((1L, 2L, 2L), (1L, 2L, 5L), (2L, 3L, 3L), (3L, 4L, 1L),
      (1L, 3L, 9L), (3L, 3L, 0L)).toDF("s", "d", "w")
    val seeds = Seq(1L, 5L).toDF("n")
    val r = Graph.shortestPaths(e, "s", "d", "w", seeds, "n", rounds = 4)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("dist")).toMap
    // 1->2->3 = 5 beats direct 9; 4 via the length-3 path = 6
    assert(r == Map(1L -> 0L, 5L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 6L))
    // hop bound: at rounds = 2 node 4 only has the 2-hop route through
    // the heavy direct edge (9 + 1 = 10); the cheap 3-hop route (6)
    // needs round 3
    val r2 = Graph.shortestPaths(e, "s", "d", "w", seeds, "n", rounds = 2)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("dist")).toMap
    assert(r2 == Map(1L -> 0L, 5L -> 0L, 2L -> 2L, 3L -> 5L, 4L -> 10L))
    // a later round must IMPROVE an earlier greedy distance: with
    // rounds = 1 the direct 1->3 edge (9) is the best ≤1-hop path
    val r1 = Graph.shortestPaths(e, "s", "d", "w", seeds, "n", rounds = 1)
      .collect().map(x => x.getAs[Long]("node") -> x.getAs[Long]("dist")).toMap
    assert(r1(3L) == 9L && r(3L) == 5L)
    // negative-weight edges are dropped, not silently relaxed
    val neg = Seq((1L, 2L, -5L)).toDF("s", "d", "w")
    assert(Graph.shortestPaths(neg, "s", "d", "w", Seq(1L).toDF("n"), "n", 2)
      .count() == 1L) // only the seed survives
  }

  test("fuzzyLinkPairs: blocked typo pairs; cap drops oversized blocks loudly") {
    import spark.implicits._
    val recs = Seq(
      (1L, "smith john", "s"), (2L, "smith jhon", "s"), // dist 2 transposition
      (3L, "smith completely other", "s"),
      (4L, "jones mary", "j"), (5L, "jones mary", "j"), // exact dup, dist 0
      (6L, "smith john", "x") // same text, DIFFERENT block: never paired
    ).toDF("id", "t", "b")
    val pairs = Dedup.fuzzyLinkPairs(recs, "id", "t", col("b"),
        maxDist = 2, maxBlockSize = 10)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("dist"))).toSet
    assert(pairs == Set((1L, 2L, 2), (4L, 5L, 0)))
    // cap: block "s" (3 rows) dropped at maxBlockSize = 2, and the
    // companion report says so — the no-silent-caps contract
    val capped = Dedup.fuzzyLinkPairs(recs, "id", "t", col("b"),
        maxDist = 2, maxBlockSize = 2)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(capped == Set((4L, 5L)))
    val over = Dedup.fuzzyLinkOversized(recs, col("b"), 2).head()
    assert(over.getAs[Long]("n_blocks_dropped") == 1L &&
      over.getAs[Long]("n_rows_dropped") == 3L)
    // zero oversized blocks reports 0/0, not an empty frame
    val none = Dedup.fuzzyLinkOversized(recs, col("b"), 100).head()
    assert(none.getAs[Long]("n_blocks_dropped") == 0L &&
      none.getAs[Long]("n_rows_dropped") == 0L)
  }

  test("sessionExamples: gap split, order, truncation, singleton drop") {
    import spark.implicits._
    val t0 = 1700000000000000L // µs epoch
    def ts(offsetSec: Long) =
      new java.sql.Timestamp((t0 + offsetSec * 1000000L) / 1000L)
    val u1 = Seq(
      // user 1, session 1: 3 events 10s apart (one out-of-order row)
      (1L, ts(0), 1L, "a"), (1L, ts(20), 3L, "c"), (1L, ts(10), 2L, "b"),
      // user 1, session 2 (31-min gap): a singleton — must drop
      (1L, ts(1860 + 20), 4L, "d"))
    // user 2: 10 events 1s apart — input truncates to last 4
    val u2 = (0 until 10).map(i =>
      (2L, ts(100 + i), 50L + i, ('p' + i).toChar.toString))
    val df = (u1 ++ u2).toDF("user_id", "ts", "event_id", "tok")
    val r = graft.operators.Curation.sessionExamples(
        df, "user_id", "ts", "event_id", "tok",
        gapMs = 1800000L, maxContext = 4)
      .collect().map(x => (x.getAs[Long]("user_id"),
        x.getAs[Long]("session_idx"), x.getAs[Long]("n_events"),
        x.getAs[Long]("n_context"), x.getAs[String]("input"),
        x.getAs[String]("target")))
      .sortBy(t => (t._1, t._2))
    // user 1: one surviving session, ordered a b despite input order,
    // target c; the singleton session 2 dropped
    // user 2: 10 events, context = last 4 of the 9-event prefix
    assert(r.toSeq == Seq(
      (1L, 1L, 3L, 2L, "a b", "c"),
      (2L, 1L, 10L, 4L, "u v w x", "y")))
  }

  test("binQuantileRollup: exact twin is the order statistic; union merges") {
    import spark.implicits._
    // two buckets: d1 = 1..100, d2 = 101..200 (values in cents units)
    val df = ((1L to 100L).map(("d1", _)) ++ (101L to 200L).map(("d2", _)))
      .toDF("day", "v")
    val r = Sketches.binQuantileRollup(df, "day", "v",
        bins = 10, lo = 0L, hi = 200L, qsPpm = Seq(500000L, 990000L))
      .collect()
      .map(x => (x.getAs[String]("scope"), x.getAs[Long]("q_ppm")) ->
        (x.getAs[Long]("n"), x.getAs[Long]("est"), x.getAs[Long]("exact"),
          x.getAs[Long]("abs_err"))).toMap
    // exact = the SQL-standard "lower" order statistic: rank ceil(q·N)
    assert(r(("d1", 500000L))._3 == 50L) // 50th of 1..100
    assert(r(("d2", 500000L))._3 == 150L)
    assert(r(("all", 500000L))._3 == 100L) // 100th of 1..200
    assert(r(("all", 990000L))._3 == 198L) // ceil(0.99·200) = 198th
    // union scope really merged both buckets
    assert(r(("all", 500000L))._1 == 200L)
    // estimate = lower edge of the rank bin; error < one bin width
    r.values.foreach { case (_, est, exact, err) =>
      assert(est <= exact && err < 20L,
        s"est $est exact $exact err $err must sit within one bin width")
    }
    // out-of-range values clamp into edge bins but the exact twin
    // reports truth — the error column shows the clamping honestly
    val wide = Seq(("d1", -50L), ("d1", 10L), ("d1", 999L)).toDF("day", "v")
    val w = Sketches.binQuantileRollup(wide, "day", "v",
        bins = 10, lo = 0L, hi = 100L, qsPpm = Seq(990000L))
      .filter(col("scope") === "all").head()
    assert(w.getAs[Long]("exact") == 999L &&
      w.getAs[Long]("est") == 90L) // top bin lower edge
  }

  test("preferencePairs: best-vs-worst with margin gate and tie rules") {
    import spark.implicits._
    val cands = Seq(
      ("k1", 101L, 50L), ("k1", 102L, 90L), ("k1", 103L, 10L),
      ("k2", 201L, 40L),                       // singleton → dropped
      ("k3", 301L, 70L), ("k3", 302L, 70L),    // margin 0 → dropped
      ("k4", 401L, 30L), ("k4", 402L, 30L), ("k4", 403L, 60L),
      ("k5", 501L, 80L), ("k5", 502L, 80L), ("k5", 503L, 20L)
    ).toDF("k", "item", "score")
    val r = Curation.preferencePairs(cands, "k", "item", "score",
        "item", minMargin = 1L)
      .orderBy(col("k")).collect()
    assert(r.map(_.getAs[String]("k")).toSeq == Seq("k1", "k4", "k5"))
    val k1 = r(0)
    assert(k1.getAs[Long]("chosen") == 102L &&
      k1.getAs[Long]("rejected") == 103L &&
      k1.getAs[Long]("margin") == 80L &&
      k1.getAs[Long]("n_candidates") == 3L)
    // rejected-side score tie → SMALLER tie-break item wins
    assert(r(1).getAs[Long]("rejected") == 401L &&
      r(1).getAs[Long]("chosen") == 403L)
    // chosen-side score tie → LARGER tie-break item wins
    assert(r(2).getAs[Long]("chosen") == 502L &&
      r(2).getAs[Long]("rejected") == 503L)
    // partition invariance: max_by/min_by are declarative aggregates
    val r7 = Curation.preferencePairs(cands.repartition(7), "k",
        "item", "score", "item", minMargin = 1L)
      .orderBy(col("k")).collect()
    assert(r.map(_.toSeq).toSeq == r7.map(_.toSeq).toSeq)
  }

  test("budgetSelect: exact budget prefix in quality order") {
    import spark.implicits._
    // scores 10..60 (id·10), weight 10 each, total 60
    val df = (1L to 6L).map(i => (i, i * 10L, 10L)).toDF("id", "q", "w")
    def run(d: org.apache.spark.sql.DataFrame, ppm: Long) =
      Curation.budgetSelect(d, "id", col("q"), col("w"),
        expr("CAST((100 - qscore) DIV 7 AS INT)"), ppm)
    val half = run(df, 500000L).orderBy(col("sel_rank")).collect()
    // 50% of 60 = 30 → exactly ids 6,5,4 (desc quality), cum 10/20/30
    assert(half.map(_.getAs[Long]("id")).toSeq == Seq(6L, 5L, 4L))
    assert(half.map(_.getAs[Long]("cum_weight")).toSeq ==
      Seq(10L, 20L, 30L))
    assert(half.forall(_.getAs[Long]("total_weight") == 60L))
    // boundary is inclusive (cum·1e6 <= total·ppm), exact in integers:
    // 499999 ppm excludes the third row, 500000 includes it
    assert(run(df, 499999L).count() == 2L)
    // score ties order by id ascending
    val tied = Seq((1L, 50L, 10L), (2L, 50L, 10L), (3L, 50L, 10L))
      .toDF("id", "q", "w")
    val t = run(tied, 700000L).orderBy(col("sel_rank")).collect()
    assert(t.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    // partition invariance of the two-pass global running sum
    val h7 = run(df.repartition(7), 500000L)
      .orderBy(col("sel_rank")).collect()
    assert(half.map(_.toSeq).toSeq == h7.map(_.toSeq).toSeq)
  }

  test("lengthBucketBatches: power-of-2 buckets, batch cuts, padding") {
    import spark.implicits._
    val df = Seq(1L, 1L, 2L, 3L, 3L, 4L, 5L, 8L, 9L, 16L, 0L)
      .zipWithIndex.map { case (l, i) => (i.toLong + 1L, l) }
      .toDF("id", "ln")
    val r = Curation.lengthBucketBatches(df, "id", col("ln"), 2)
      .orderBy(col("len_bucket"), col("batch_idx")).collect()
      .map(x => (x.getAs[Int]("len_bucket"), x.getAs[Long]("batch_idx")) ->
        (x.getAs[Long]("n_seqs"), x.getAs[Long]("max_len"),
          x.getAs[Long]("sum_len"), x.getAs[Long]("pad_tokens"))).toMap
    // zero-length row dropped; buckets are bit-lengths
    assert(r.size == 6)
    assert(r((1, 0L)) == ((2L, 1L, 2L, 0L)))   // [1,1]
    assert(r((2, 0L)) == ((2L, 3L, 5L, 1L)))   // [2,3] pad 1
    assert(r((2, 1L)) == ((1L, 3L, 3L, 0L)))   // [3] remainder
    assert(r((3, 0L)) == ((2L, 5L, 9L, 1L)))   // [4,5]
    assert(r((4, 0L)) == ((2L, 9L, 17L, 1L)))  // [8,9]
    assert(r((5, 0L)) == ((1L, 16L, 16L, 0L))) // [16]
    // partition invariance: the (bucket, len) two-pass ordinal is a
    // pure function of the data, not its layout
    val r7 = Curation.lengthBucketBatches(df.repartition(7), "id",
        col("ln"), 2)
      .orderBy(col("len_bucket"), col("batch_idx")).collect()
    assert(r7.length == 6)
  }

  test("interleaveBySource: total injective order, round-robin cycles") {
    import spark.implicits._
    // unequal sources: a×4, b×2, c×4
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq.fill(4)("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "src")
    val r = Sampling.interleaveBySource(df, "id", "src")
      .orderBy(col("interleave_pos")).collect()
    assert(r.length == 10)
    // positions are unique (injective) and per-source ordinals are
    // 1..n_src permutations
    assert(r.map(_.getAs[Long]("interleave_pos")).distinct.length == 10)
    val bySrc = r.groupBy(_.getAs[String]("src"))
    assert(bySrc("a").map(_.getAs[Long]("src_ordinal")).sorted.toSeq ==
      (1L to 4L))
    assert(bySrc("b").map(_.getAs[Long]("src_ordinal")).sorted.toSeq ==
      (1L to 2L))
    // while no source is exhausted, consecutive positions cycle
    // through all 3 sources: the first 6 positions are a,b,c,a,b,c
    // order-wise (position mod 3 == source index)
    val first6 = r.take(6).map(_.getAs[String]("src")).toSeq
    assert(first6 == Seq("a", "b", "c", "a", "b", "c"))
    // after b exhausts (2 cycles), only a and c continue, still in
    // source-index order within each cycle
    val rest = r.drop(6).map(_.getAs[String]("src")).toSeq
    assert(rest == Seq("a", "c", "a", "c"))
    // md5 shuffle is deterministic: same input, same order, any layout
    val r7 = Sampling.interleaveBySource(df.repartition(7), "id", "src")
      .orderBy(col("interleave_pos")).collect()
    assert(r.map(_.toSeq).toSeq == r7.map(_.toSeq).toSeq)
  }

  test("oovRate: occurrence coverage against the top-k vocabulary") {
    import spark.implicits._
    // corpus frequencies: x×5, y×3, z×2, w×1 → vocab(2) = {x, y}
    val df = Seq(
      (1L, "en", "x x x y y"),
      (2L, "en", "x x y z"),
      (3L, "de", "z w")
    ).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.oovRate(df, "lang", "text", vocabSize = 2)
      .orderBy(col("lang")).collect()
      .map(x => x.getAs[String]("lang") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Long]("n_oov"),
          x.getAs[Long]("oov_ppm"))).toMap
    assert(r("en") == ((9L, 1L, 111111L))) // z is OOV: 1/9
    assert(r("de") == ((2L, 2L, 1000000L))) // z and w both OOV
    // vocab large enough → zero OOV everywhere
    val full = TextAnalysis.oovRate(df, "lang", "text", vocabSize = 10)
      .agg(sum(col("n_oov"))).head().getLong(0)
    assert(full == 0L)
  }

  test("kmvOverlapMatrix: exact set arithmetic below k, a<b grid") {
    import spark.implicits._
    // A = {1..4}, B = {3..6} (|A∩B|=2, |A∪B|=6), C = {7,8} disjoint
    val df = ((1 to 4).map(("A", _)) ++ (3 to 6).map(("B", _)) ++
      Seq(("C", 7), ("C", 8))).toDF("src", "k")
    val r = Sketches.kmvOverlapMatrix(df, "src", "k", k = 16)
      .orderBy(col("group_a"), col("group_b")).collect()
      .map(x => (x.getAs[String]("group_a"), x.getAs[String]("group_b")) ->
        (x.getAs[Double]("est_distinct_a"), x.getAs[Double]("est_union"),
          x.getAs[Double]("est_overlap"), x.getAs[Double]("jaccard"))).toMap
    // exactly the 3 unordered pairs, a < b
    assert(r.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    // below k the sketches are the full sets: estimates are exact
    assert(r(("A", "B")) == ((4.0, 6.0, 2.0, 2.0 / 6.0)))
    assert(r(("A", "C"))._3 == 0.0 && r(("A", "C"))._4 == 0.0)
    assert(r(("B", "C"))._2 == 6.0) // 4 + 2 disjoint
    // duplicate keys collapse (sketch is over DISTINCT hashes)
    val dup = df.union(df)
    val r2 = Sketches.kmvOverlapMatrix(dup, "src", "k", k = 16)
      .orderBy(col("group_a"), col("group_b")).collect()
    assert(r2.length == 3 &&
      r2.head.getAs[Double]("est_distinct_a") == 4.0)
  }

  test("spanCorruption: sentinel structure and lossless reassembly") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i,
      s"alpha$i bravo charlie delta echo foxtrot golf hotel india " +
        s"juliet kilo lima mike november oscar papa")).toDF("id", "text")
    // high noise so spans certainly occur across the 20 docs
    val r = Curation.spanCorruption(df, "id", "text", noisePpm = 400000L)
      .orderBy(col("id")).collect()
    assert(r.length == 20)
    val sentinel = "<extra_id_(\\d+)>".r
    var sawSpan = false
    r.foreach { row =>
      val (nSpans, input, target) = (row.getAs[Long]("n_spans"),
        row.getAs[String]("input"), row.getAs[String]("target"))
      assert(row.getAs[Long]("n_tokens") == 16L)
      // sentinel count and numbering 0..n-1 in BOTH strings, in order
      val inIds = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      val tgIds = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(inIds == (0 until nSpans.toInt) && tgIds == inIds)
      if (nSpans > 0) sawSpan = true
      // lossless reassembly: substituting each sentinel's target span
      // back into the input reproduces the original token stream
      val spans = target.split("<extra_id_\\d+> ?").toSeq
        .drop(1) // leading empty before the first sentinel
        .map(_.trim)
      val rebuilt = sentinel.replaceAllIn(input,
        m => java.util.regex.Matcher.quoteReplacement(
          spans(m.group(1).toInt)))
        .replaceAll("\\s+", " ").trim
      val orig = row.getAs[Long]("id")
      val origText = df.filter(col("id") === orig)
        .head().getAs[String]("text").toLowerCase.trim
      assert(rebuilt == origText, s"doc $orig failed reassembly")
    }
    assert(sawSpan, "40% noise over 20 docs must corrupt something")
    // deterministic under layout
    val r7 = Curation.spanCorruption(df.repartition(7), "id", "text",
        noisePpm = 400000L)
      .orderBy(col("id")).collect()
    assert(r.map(_.toSeq).toSeq == r7.map(_.toSeq).toSeq)
  }

  test("dropoutTwins: ordered subset, deterministic, tunable rate") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i,
      (1 to 40).map(j => s"tok${j}x$i").mkString(" "))).toDF("id", "text")
    val tw = Dedup.dropoutTwins(df, "id", "text", dropPpm = 200000L,
        idOffset = 1000L)
      .orderBy(col("id")).collect()
    assert(tw.length == 50)
    var dropped = 0L; var total = 0L
    tw.foreach { row =>
      val id = row.getAs[Long]("id") - 1000L
      val orig = (1 to 40).map(j => s"tok${j}x$id")
      val kept = row.getAs[String]("text").split(" ").toSeq
      // twin is an ORDERED SUBSEQUENCE of the original token stream
      assert(kept.foldLeft(orig) { (rest, t) =>
        val i = rest.indexOf(t); assert(i >= 0, s"$t not in order"); rest.drop(i + 1)
      } != null)
      dropped += 40 - kept.length; total += 40
    }
    // ~20% dropout across 2000 positions (loose 3σ band)
    assert(dropped > total / 10 && dropped < total * 3 / 10,
      s"dropped $dropped of $total")
    // layout invariance
    val t7 = Dedup.dropoutTwins(df.repartition(7), "id", "text",
        200000L, 1000L).orderBy(col("id")).collect()
    assert(tw.map(_.toSeq).toSeq == t7.map(_.toSeq).toSeq)
  }

  test("unimaxAllocation: greedy integer waterfill with epoch caps") {
    import spark.implicits._
    // token weights: a=100, b=100, c=800 (total 1000)
    val df = (Seq.fill(1)(("a", 100L)) ++ Seq.fill(1)(("b", 100L)) ++
      Seq.fill(2)(("c", 400L))).toDF("lang", "w")
    def run(budgetPpm: Long, capPpm: Long) =
      Sampling.unimaxAllocation(df, "lang", col("w"), budgetPpm, capPpm)
        .collect().map(r => r.getAs[String]("lang") ->
          (r.getAs[Long]("cap_tokens"), r.getAs[Long]("alloc_tokens"),
            r.getAs[Long]("epochs_ppm"))).toMap
    // B = 1200, caps ×2 epochs: a and b cap at 200, c absorbs 800
    val r = run(1200000L, 2000000L)
    assert(r("a") == ((200L, 200L, 2000000L)))
    assert(r("b") == ((200L, 200L, 2000000L)))
    assert(r("c") == ((1600L, 800L, 1000000L)))
    assert(r.values.map(_._2).sum == 1200L) // budget fully spent
    // budget beyond total capacity: everything caps, leftover unspent
    val over = run(5000000L, 2000000L)
    assert(over.values.map(_._2).sum == 2000L)
    assert(over("c") == ((1600L, 1600L, 2000000L)))
    // nothing caps: equal integer split with remainders to later langs
    val eq = run(600000L, 9000000L) // B = 600, caps huge
    assert(eq.values.map(_._2).sum == 600L)
    assert(eq("a")._2 == 200L && eq("b")._2 == 200L && eq("c")._2 == 200L)
  }

  test("fimTransform: PSM rendering reassembles the document") {
    import spark.implicits._
    val df = (1L to 30L).map(i => (i,
      s"one$i two three four five six seven eight nine ten"))
      .toDF("id", "text")
    val r = Curation.fimTransform(df, "id", "text")
      .orderBy(col("id")).collect()
    assert(r.length == 30)
    var sawAllThree = false
    r.foreach { row =>
      val (n, lo, hi, fim) = (row.getAs[Long]("n_tokens"),
        row.getAs[Long]("cut_lo"), row.getAs[Long]("cut_hi"),
        row.getAs[String]("fim"))
      assert(n == 10L && 0 <= lo && lo <= hi && hi <= n)
      // parse the PSM layout and reassemble prefix+middle+suffix
      val m = "<fim_prefix> (.*) <fim_suffix> (.*) <fim_middle> (.*)".r
        .findFirstMatchIn(fim).get
      val (p, sfx, mid) = (m.group(1), m.group(2), m.group(3))
      val rebuilt = Seq(p, mid, sfx).filter(_.nonEmpty).mkString(" ")
      val orig = df.filter(col("id") === row.getAs[Long]("id"))
        .head().getAs[String]("text").toLowerCase
      assert(rebuilt == orig, s"doc ${row.getAs[Long]("id")}")
      // segment sizes match the cuts
      def nTok(s: String) = if (s.isEmpty) 0L else s.split(" ").length.toLong
      assert(nTok(p) == lo && nTok(mid) == hi - lo && nTok(sfx) == n - hi)
      if (lo > 0 && hi > lo && hi < n) sawAllThree = true
    }
    assert(sawAllThree, "30 docs must include a 3-nonempty-segment cut")
    // layout invariance
    val r7 = Curation.fimTransform(df.repartition(7), "id", "text")
      .orderBy(col("id")).collect()
    assert(r.map(_.toSeq).toSeq == r7.map(_.toSeq).toSeq)
  }

  test("stitchPairs: seam detection, self-exclusion, hot-boundary cap") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta one two three"), // suffix: one two three
      (2L, "one two three more words follow here"), // prefix: one two three → 1 stitches 2
      (3L, "one two three yet another continuation"), // also prefix match → 1 stitches 3
      (4L, "xx yy zz xx yy zz"), // suffix == own prefix: self-pair excluded
      (5L, "hot hot hot filler a"), (6L, "hot hot hot filler b"),
      (7L, "hot hot hot filler c"), // 3 docs share prefix "hot hot hot"
      (8L, "ends with hot hot hot") // would stitch 5,6,7 but boundary is hot (freq 3 > cap 2)
    ).toDF("doc_id", "text")
    val r = Dedup.stitchPairs(df, "doc_id", "text", k = 3,
      maxBoundaryFreq = 2).orderBy(col("a_id"), col("b_id")).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((1L, 2L), (1L, 3L)))
    val over = Dedup.stitchOversized(df, "doc_id", "text", 3, 2).collect()
    assert(over.length == 1 && over.head.getString(0) == "prefix" &&
      over.head.getLong(1) == 1L && over.head.getLong(2) == 3L)
    // NULL text is an empty doc, never a match
    val withNull = df.unionAll(Seq((9L, null: String)).toDF("doc_id", "text"))
    assert(Dedup.stitchPairs(withNull, "doc_id", "text", 3, 2).count() == 2)
  }

  test("exactSubstringSpans: maximal verbatim spans with positions") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val short = (1 to 10).map(i => s"q$i").mkString(" ")
    val df = Seq(
      // 20-token shared span at a_pos 6 / b_pos 8; 10-token shared
      // run (below minTokens=16) that must NOT be reported
      (1L, s"f1 f2 f3 f4 f5 $shared g1 g2 g3 $short"),
      (2L, s"h1 h2 h3 h4 h5 h6 h7 $shared k1 k2 $short x9"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpans(df, "doc_id", "text",
      n = 8, minTokens = 16).collect()
    // ONE maximal row for the 20-token span — no sub-spans, no rows
    // for the 10-token run, nothing involving doc 3
    assert(spans.length == 1)
    val r = spans(0)
    assert(r.getAs[Long]("a_id") == 1L && r.getAs[Long]("b_id") == 2L)
    assert(r.getAs[Long]("a_pos") == 6L && r.getAs[Long]("b_pos") == 8L)
    assert(r.getAs[Long]("span_tokens") == 20L)
    // lowering minTokens surfaces the 10-token run too (maximal, on
    // its own diagonal)
    val both = Dedup.exactSubstringSpans(df, "doc_id", "text",
      n = 8, minTokens = 10).collect()
    assert(both.length == 2)
    assert(both.map(_.getAs[Long]("span_tokens")).sorted.toSeq ==
      Seq(10L, 20L))
  }

  test("exactSubstringSpansAcross: cross-side only (decontamination)") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    // eval docs 100/101; train docs 1/2. Doc 1 carries the span the
    // eval doc quotes; docs 1 and 2 ALSO share it (train-train dup —
    // must NOT be reported); eval 101 is clean.
    val eval = Seq(
      (100L, s"e1 e2 $shared e3"),
      (101L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"t1 t2 t3 $shared t4"),
      (2L, s"u1 $shared u2 u3"),
      (3L, "v1 v2 v3 v4 v5 v6 v7 v8 v9")).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpansAcross(eval, train,
      "doc_id", "text", n = 8, minTokens = 16).collect()
    // eval 100 × train 1 AND eval 100 × train 2 — never train 1 ×
    // train 2, never anything for eval 101
    assert(spans.length == 2)
    assert(spans.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .sorted.toSeq == Seq((100L, 1L), (100L, 2L)))
    assert(spans.forall(_.getAs[Long]("span_tokens") == 20L))
    val s1 = spans.find(_.getAs[Long]("b_id") == 1L).get
    assert(s1.getAs[Long]("a_pos") == 3L && s1.getAs[Long]("b_pos") == 4L)
  }

  test("exactSubstringSpans: hot-gram cap bounds boilerplate fan-out") {
    import spark.implicits._
    // a 16-token boilerplate block (license-header analogue) in ALL
    // five docs: each of its 9 8-grams occurs 5× corpus-wide. With
    // the cap below 5 the quadratic C(5,2) fan-out is excluded; with
    // the cap at 5 the 10 pairs surface. Unique filler keeps docs
    // otherwise disjoint.
    val boiler = (1 to 16).map(i => s"lic$i").mkString(" ")
    val df = (1L to 5L).map(d =>
        (d, s"$boiler u${d}a u${d}b u${d}c u${d}d")).toDF("doc_id", "text")
    val capped = Dedup.exactSubstringSpans(df, "doc_id", "text",
      n = 8, minTokens = 16, maxGramFreq = 4).collect()
    assert(capped.isEmpty)
    val over = Dedup.exactSubstringOversized(df, "doc_id", "text",
      n = 8, maxGramFreq = 4).collect()
    assert(over.length == 1)
    assert(over.head.getAs[Long]("n_grams_dropped") == 9L)
    assert(over.head.getAs[Long]("n_positions_dropped") == 45L)
    // raising the cap to the gram frequency admits every pair
    val full = Dedup.exactSubstringSpans(df, "doc_id", "text",
      n = 8, minTokens = 16, maxGramFreq = 5).collect()
    assert(full.length == 10)
    assert(full.forall(_.getAs[Long]("span_tokens") == 16L))
    // a clean corpus reports zero drops (coalesce'd, never null)
    val clean = Dedup.exactSubstringOversized(df, "doc_id", "text",
      n = 8, maxGramFreq = 1000).collect()
    assert(clean.head.getAs[Long]("n_grams_dropped") == 0L &&
      clean.head.getAs[Long]("n_positions_dropped") == 0L)
    // cachePositions = false (the 100-TB recompute trade) is
    // result-identical
    val nocache = Dedup.exactSubstringSpans(df, "doc_id", "text",
      n = 8, minTokens = 16, maxGramFreq = 5,
      cachePositions = false).collect()
    assert(nocache.length == 10)
  }

  test("exactSubstringSpansAcross: overlap guard and train-side cap") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    // doc 7 appears on BOTH sides with identical text — the guard
    // must suppress its trivial full-length self-match while the
    // genuine cross-pair (eval 100 × train 1) still reports
    val eval = Seq((100L, s"e1 e2 $shared e3"),
      (7L, s"w1 w2 w3 $shared w4")).toDF("doc_id", "text")
    val train = Seq((1L, s"t1 t2 t3 $shared t4"),
      (7L, s"w1 w2 w3 $shared w4")).toDF("doc_id", "text")
    val spans = Dedup.exactSubstringSpansAcross(eval, train,
      "doc_id", "text", n = 8, minTokens = 16).collect()
    assert(spans.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .forall { case (a, b) => a != b })
    assert(spans.map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
      .sorted.toSeq == Seq((7L, 1L), (100L, 1L), (100L, 7L)))
    // training-side boilerplate (3 occurrences > cap 2) is excluded
    // from matching; the unique span still reports
    val boiler = (1 to 16).map(i => s"lic$i").mkString(" ")
    val ev2 = Seq((200L, s"q1 $boiler $shared")).toDF("doc_id", "text")
    val tr2 = Seq((11L, s"$boiler a1 a2"), (12L, s"$boiler b1 b2"),
      (13L, s"$boiler c1 c2"), (14L, s"z9 $shared")).toDF("doc_id", "text")
    val capped = Dedup.exactSubstringSpansAcross(ev2, tr2,
      "doc_id", "text", n = 8, minTokens = 16, maxGramFreq = 2).collect()
    assert(capped.map(_.getAs[Long]("b_id")).toSeq == Seq(14L))
    assert(capped.head.getAs[Long]("span_tokens") == 20L)
  }

  test("exactSubstringRemove: keep-first cut, byte-exact reassembly") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, s"f1 f2 $shared f3"), // lower id: survives verbatim
      (2L, s"h1 $shared h2 h3"), // higher id: the 20 tokens cut
      (3L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"), // clean passthrough
      (4L, null: String) // null doc: canonical empty
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstringRemove(df, "doc_id", "text",
      n = 8, minTokens = 16).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Long]("n_tokens_cut") == 0L)
    assert(r(1L).getAs[String]("text_clean") == s"f1 f2 $shared f3")
    assert(r(2L).getAs[Long]("n_tokens") == 23L)
    assert(r(2L).getAs[Long]("n_tokens_cut") == 20L)
    assert(r(2L).getAs[String]("text_clean") == "h1 h2 h3")
    assert(r(3L).getAs[Long]("n_tokens_cut") == 0L)
    // null text tokenizes to one empty token (the corpus-wide
    // convention); nothing to cut, canonical join is ""
    assert(r(4L).getAs[Long]("n_tokens_cut") == 0L &&
      r(4L).getAs[String]("text_clean") == "")
    // transitive chain: 2 cuts against 1, and a third copy cuts
    // against BOTH (overlapping intervals merge into one cut)
    val chain = df.unionAll(Seq((5L, s"k1 k2 k3 $shared"))
      .toDF("doc_id", "text"))
    val rc = Dedup.exactSubstringRemove(chain, "doc_id", "text",
      n = 8, minTokens = 16).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(rc(5L).getAs[Long]("n_tokens_cut") == 20L)
    assert(rc(5L).getAs[String]("text_clean") == "k1 k2 k3")
  }

  test("exactSubstringDecontam: cuts the TRAIN side only") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val eval = Seq((100L, s"e1 e2 $shared e3")).toDF("doc_id", "text")
    val train = Seq(
      (1L, s"t1 t2 t3 $shared t4"), // contaminated: 20 tokens cut
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10") // clean passthrough
    ).toDF("doc_id", "text")
    val r = Dedup.exactSubstringDecontam(eval, train, "doc_id", "text",
      n = 8, minTokens = 16).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // only training docs come back; the benchmark side is untouched
    assert(r.keySet == Set(1L, 2L))
    assert(r(1L).getAs[Long]("n_tokens") == 24L)
    assert(r(1L).getAs[Long]("n_tokens_cut") == 20L)
    assert(r(1L).getAs[String]("text_clean") == "t1 t2 t3 t4")
    assert(r(2L).getAs[Long]("n_tokens_cut") == 0L)
    // a train-train duplicate alone (no eval overlap) is NOT cut —
    // that's exactSubstringRemove's job, not decontamination's
    val train2 = train.unionAll(
      Seq((3L, s"u1 u2 u3 $shared u4")).toDF("doc_id", "text"))
    val evalClean = Seq((100L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
      .toDF("doc_id", "text")
    val r2 = Dedup.exactSubstringDecontam(evalClean, train2,
      "doc_id", "text", n = 8, minTokens = 16).collect()
    assert(r2.forall(_.getAs[Long]("n_tokens_cut") == 0L))
  }

  test("largestRemainderShares: exact ppm sum, remainder order, overflow-safe") {
    import spark.implicits._
    // weights 1,1,1 over 1e6: floor 333333 each, shortfall 1 → the
    // largest remainder (all tie) goes to the smallest key
    val eq = Sampling.largestRemainderShares(
      Seq(("a", 1L), ("b", 1L), ("c", 1L)).toDF("k", "w"), "k", col("w"))
      .collect()
    assert(eq.map(_.getAs[Long]("share_ppm")).sum == 1000000L)
    assert(eq.find(_.getString(0) == "a").get.getAs[Long]("share_ppm") == 333334L)
    // skewed weights still sum exactly
    val sk = Sampling.largestRemainderShares(
      Seq(("x", 7L), ("y", 1L), ("z", 5L)).toDF("k", "w"), "k", col("w"))
      .collect()
    assert(sk.map(_.getAs[Long]("share_ppm")).sum == 1000000L)
    assert(sk.find(_.getString(0) == "x").get.getAs[Long]("share_ppm") >
      sk.find(_.getString(0) == "z").get.getAs[Long]("share_ppm"))
    // Long-overflow regime: weights near 1e13 tokens (1e13 * 1e6
    // overflows int64; the decimal gate must stay exact)
    val big = Sampling.largestRemainderShares(
      Seq(("p", 9000000000000L), ("q", 3000000000001L))
        .toDF("k", "w"), "k", col("w")).collect()
    assert(big.map(_.getAs[Long]("share_ppm")).sum == 1000000L)
    val p = big.find(_.getString(0) == "p").get
    assert(p.getAs[Long]("share_ppm") == 750000L ||
      p.getAs[Long]("share_ppm") == 749999L)
    // NULL key: a key-derived window partition would go NULL and
    // split the remainder ranking into two partitions (both ranking
    // from 1), over-awarding +1s — the exact-sum contract must hold
    // with a NULL key in the inventory
    val wn = Sampling.largestRemainderShares(
      Seq(("a", 1L), ("b", 1L), (null: String, 1L))
        .toDF("k", "w"), "k", col("w")).collect()
    assert(wn.length == 3)
    assert(wn.map(_.getAs[Long]("share_ppm")).sum == 1000000L)
  }

  test("wilsonLowerBound: shrinks small samples, bounded by pass rate") {
    import spark.implicits._
    // same 100% pass rate: n=3 must rank BELOW n=1000 on the bound
    val df = (1 to 3).map(i => ("tiny", i)).toDF("src", "v")
      .unionAll((1 to 1000).map(i => ("big", i)).toDF("src", "v"))
    val r = Curation.wilsonLowerBound(df, "src", lit(true))
      .collect().map(x => x.getString(0) -> x.getAs[Double]("wilson_lb")).toMap
    assert(r("tiny") < r("big"))
    assert(r("tiny") > 0.4 && r("tiny") < 0.8) // 1.96 LB for 3/3 ≈ 0.44
    assert(r("big") > 0.99)
    // the bound never exceeds the observed rate
    val mixed = Curation.wilsonLowerBound(
      (1 to 10).map(i => ("m", i % 2 == 0)).toDF("src", "p"),
      "src", col("p")).head()
    assert(mixed.getAs[Double]("wilson_lb") <
      mixed.getAs[Double]("pass_rate"))
  }

  test("crossLingualLeakage: shared grams counted once per pair, ordered") {
    import spark.implicits._
    val common = "one two three four five six seven eight"
    val df = Seq(
      (1L, "en", common + " en tail"),
      (2L, "de", common + " de tail"),
      (3L, "de", common + " de other"), // same gram in de twice: DISTINCT per lang
      (4L, "fr", "nothing shared here at all in this one")
    ).toDF("id", "lang", "text")
    val r = TextAnalysis.crossLingualLeakage(df, "lang", "text", n = 8)
      .orderBy(col("lang_a"), col("lang_b")).collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "de" && r.head.getString(1) == "en")
    assert(r.head.getAs[Long]("n_shared_grams") == 1L)
  }

  test("modularity: two cliques + a bridge, exact rational contributions") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by edge 3-4:
    // m=7; community A: e=3, d=7; B: e=3, d=7
    // Q_c = (4·7·3 − 49)/(4·49) = 35/196 each; total Q = 70/196 ≈ 0.357
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "label")
    val r = Graph.modularity(edges, "a", "b", labels, "node", "label")
      .orderBy(col("label")).collect()
    assert(r.length == 2)
    r.foreach { x =>
      assert(x.getAs[Long]("n_nodes") == 3L)
      assert(x.getAs[Long]("intra_edges") == 3L)
      assert(x.getAs[Long]("sum_degree") == 7L)
      assert(x.getAs[Long]("contribution_micro") ==
        math.round(35.0 / 196.0 * 1e6))
    }
    // everyone in ONE community: Q = (4m·m − (2m)²)/(4m²) = 0 exactly
    val one = Graph.modularity(edges, "a", "b",
      labels.select(col("node"), lit(7L).as("label")), "node", "label")
      .head()
    assert(one.getAs[Long]("contribution_micro") == 0L)
    // duplicate + reversed + self-loop edges collapse before counting
    val messy = edges.unionAll(Seq((2L, 1L), (3L, 3L)).toDF("a", "b"))
    val r2 = Graph.modularity(messy, "a", "b", labels, "node", "label")
      .orderBy(col("label")).collect()
    assert(r2.map(_.getAs[Long]("contribution_micro")).toSeq ==
      r.map(_.getAs[Long]("contribution_micro")).toSeq)
  }

  test("minhashFidelity: exact duplicates estimate 1.0, err bounded") {
    val r = Dedup.minhashFidelity(docs(), "doc_id", "text")
      .orderBy(col("a_id"), col("b_id")).collect()
    assert(r.nonEmpty)
    val dup = r.find(x => x.getLong(0) == 1L && x.getLong(1) == 2L).get
    assert(dup.getAs[Long]("est_jac_micro") == 1000000L)
    assert(dup.getAs[Long]("true_jac_micro") == 1000000L)
    assert(dup.getAs[Long]("err_micro") == 0L)
    r.foreach { x =>
      assert(x.getAs[Long]("est_jac_micro") >= 0L &&
        x.getAs[Long]("est_jac_micro") <= 1000000L)
      assert(x.getAs[Long]("err_micro") ==
        math.abs(x.getAs[Long]("est_jac_micro") -
          x.getAs[Long]("true_jac_micro")))
    }
  }

  test("incrementalNovelty: empty history == noveltyRate; seen grams excluded") {
    import spark.implicits._
    val batch = Seq(
      (10L, "a b c d e f g h extra words here"),
      (20L, "a b c d e f g h completely new tail piece")
    ).toDF("doc_id", "text")
    // empty history: must equal the batch-only noveltyRate
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val inc = TextAnalysis.incrementalNovelty(batch, empty,
      "doc_id", "text", n = 8).orderBy(col("doc_id")).collect()
    val base = TextAnalysis.noveltyRate(batch, "doc_id", "text", n = 8)
      .orderBy(col("doc_id")).collect()
    assert(inc.map(_.toSeq).toSeq == base.map(_.toSeq).toSeq)
    // history containing the shared prefix gram kills it for BOTH docs
    val hist = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val inc2 = TextAnalysis.incrementalNovelty(batch, hist,
      "doc_id", "text", n = 8).orderBy(col("doc_id")).collect()
    val m = inc2.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))).toMap
    val b = base.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))).toMap
    assert(m(10L)._1 == b(10L)._1) // gram counts unchanged
    assert(m(10L)._2 == b(10L)._2 - 1) // doc 10 owned the shared gram
    assert(m(20L)._2 == b(20L)._2) // doc 20 never owned it
  }

  test("bpeFertility: rollup matches per-doc encode totals") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "aa bb aa bb"),
      (2L, "en", "aa aa"),
      (3L, "de", "cc dd")
    ).toDF("doc_id", "lang", "text")
    val merges = TextAnalysis.bpeMerges(df, "text", 2)
    val enc = TextAnalysis.bpeEncode(df, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"))).toMap
    val fert = TextAnalysis.bpeFertility(df, "lang", "doc_id", "text",
      merges).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_bpe_tokens"))).toMap
    assert(fert("en")._1 == 2L && fert("de")._1 == 1L)
    assert(fert("en")._2 == enc(1L)._1 + enc(2L)._1)
    assert(fert("en")._3 == enc(1L)._2 + enc(2L)._2)
  }

  // ---- r17: token-stats census, line boilerplate, semantic decontam

  test("token stats profile: hand-computed sums per group") {
    import spark.implicits._
    val df = Seq(
      ("a", "The quick... fox; IS the one #"),
      ("a", "of of of"),
      ("b", "plain words here")).toDF("src", "text")
    val r = TextAnalysis.tokenStatsProfile(df, "src", "text")
      .orderBy("src").collect()
    val a = r(0)
    // docs: ["the","quick...","fox;","is","the","one","#"] + 3×"of"
    assert(a.getAs[Long]("n_docs") == 2L)
    assert(a.getAs[Long]("n_words") == 7L + 3L)
    assert(a.getAs[Long]("alpha") == 6L + 3L) // '#' has no letter
    assert(a.getAs[Long]("stop_hits") == 3L + 3L) // the,the,is + of×3
    assert(a.getAs[Long]("stop_distinct") == 2L + 1L) // {the,is} + {of}
    assert(a.getAs[Long]("n_sym") == 2L) // one '...', one '#'
    assert(a.getAs[Long]("n_punct") == 4L) // three dots + ';'
    assert(a.getAs[Long]("n_upper") == 3L) // T, I, S
    val b = r(1)
    assert(b.getAs[Long]("n_words") == 3L &&
      b.getAs[Long]("distinct_tokens") == 3L)
  }

  test("line boilerplate: repeated lines cut, blanks kept, md5 of kept body") {
    import spark.implicits._
    val footer = "all rights reserved"
    val pages = Seq(
      (1L, s"alpha body one\n$footer"),
      (2L, s"beta body two\n\n$footer"),
      (3L, s"gamma body three\n$footer"),
      (4L, footer)).toDF("id", "text")
    val r = Dedup.lineBoilerplate(pages, "id", "text", minDocs = 3)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    def m(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    assert(r(1L) == ((2L, 1L, m("alpha body one"))))
    // the blank line is kept and participates in the re-join
    assert(r(2L) == ((3L, 1L, m("beta body two\n"))))
    assert(r(3L) == ((2L, 1L, m("gamma body three"))))
    // all-boilerplate page: empty body fingerprints as md5("")
    assert(r(4L) == ((1L, 1L, m(""))))
    // below the threshold nothing is cut
    val none = Dedup.lineBoilerplate(pages, "id", "text", minDocs = 5)
      .agg(sum("n_boiler_lines")).collect()(0).getLong(0)
    assert(none == 0L)
  }

  test("semantic decontam: cosine threshold in micros, self excluded") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0, 0.0)),  // eval
      (2L, Seq(0.0, 1.0)),  // eval
      (10L, Seq(0.999, 0.01)), // ~eval 1 → contaminated
      (11L, Seq(1.0, 1.0)),    // cos √.5 to both
      (12L, Seq(-1.0, -0.04))) // negative to 1, ~0 to 2
      .toDF("vec_id", "embedding")
    val r = Similarity.semanticDecontam(
        emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", tauMicro = 950000L)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getBoolean(2)))).toMap
    assert(r(10L)._2 && r(10L)._1 > 990000L)
    assert(!r(11L)._2 &&
      math.abs(r(11L)._1 - 707107L) <= 1L)
    assert(!r(12L)._2 && r(12L)._1 < 0L)
    // eval members in the corpus never match themselves: vector 1
    // also present as corpus id 1 would score cos=1 against eval 2
    // only
    val self = Similarity.semanticDecontam(emb, emb.filter(col("vec_id") < 10),
      "vec_id", "embedding", tauMicro = 999999L)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(self(1L) == 0L) // vs eval 2 (orthogonal), not itself
  }
}
