package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable distinct-value sketches for corpus-vs-corpus set
  * arithmetic WITHOUT a join. The 100-TB question these answer:
  * "how much of crawl snapshot B is already in snapshot A?" — an
  * exact answer joins two corpus-scale key sets (a shuffle of
  * everything on both sides); the sketch answer scans each corpus
  * once, reduces each to k 8-byte hashes, and finishes on two 1-row
  * frames.
  *
  * The sketch is KMV / bottom-k (Bar-Yossef et al. 2002 "Counting
  * distinct elements in a data stream"; Beyer, Haas, Reinwald,
  * Sismanis & Gemulla, SIGMOD 2007 "On synopses for distinct-value
  * estimation under multiset operations"): keep the k smallest
  * values of a uniform hash of the key. Distinct-count estimate is
  * the order-statistics one, (k-1)/U(k) with U(k) the k-th smallest
  * normalized hash; union sketches merge by taking the k smallest of
  * the concatenation (the k smallest of A∪B are a subset of the two
  * sketches' union, so the merge is lossless); and intersection uses
  * the SIGMOD-2007 ratio estimator: the fraction of the merged
  * sketch's values present in BOTH input sketches estimates the
  * Jaccard similarity, and Jaccard × |A∪B| estimates |A∩B|.
  *
  * Everything is deterministic and engine-portable: the hash is the
  * first 60 bits of md5 (no RNG, no engine-specific hash), minima
  * are plain order statistics, and the estimates are single IEEE
  * divisions/multiplications — DuckDB replays the whole pipeline
  * bit-for-bit, which is how the battery oracle-gates p67.
  */
object Sketches {

  /** Upper bound (exclusive) of [[kmvHash]]'s range: 2^60. */
  val KmvMax: Double = (1L << 60).toDouble

  /** Uniform 60-bit key hash: the first 15 hex digits of md5.
    * Uniform on [0, 2^60) by construction (unlike the library's
    * 2-family polynomial hash, whose low 30 bits only cover a prime
    * modulus — fine as a collision-safe id, biased as an
    * order-statistics input). Engine-portable: DuckDB spells it
    * `CAST(('0x' || substr(md5(k), 1, 15)) AS BIGINT)`. */
  def kmvHash(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** One-row frame holding the KMV sketch of `df`'s `keyCol`: the
    * column `hs` is the ascending array of the k smallest DISTINCT
    * key hashes (all of them when the key universe is smaller than
    * k — the sketch is then exact).
    *
    * Scale shape: the scan reduces to distinct hashes (a shuffle of
    * 8-byte keys with map-side partial dedup), then `ORDER BY h
    * LIMIT k` plans as TakeOrdered — every partition forwards at
    * most k longs, no global sort. The result is k numbers however
    * large the corpus. */
  def kmvSketch(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    df.select(kmvHash(col(keyCol)).as("h")).distinct()
      .orderBy(col("h")).limit(k)
      .agg(sort_array(collect_list(col("h"))).as("hs"))
  }

  /** The (k-1)/U(k) distinct-count estimate from a sketch array
    * column; exact cardinality when the sketch is not full. The
    * division is one IEEE op on both engines. */
  private def estimate(hs: Column, k: Int): Column =
    when(size(hs) < k, size(hs).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(KmvMax)
        / element_at(hs, k).cast("double"))

  /** Corpus-overlap estimate between `a` and `b` on `keyCol`,
    * without joining them: one row with
    * `est_distinct_a / est_distinct_b / est_union` (distinct-count
    * estimates), `est_overlap` (≈ |A∩B|) and `jaccard` (≈ the
    * SIGMOD-2007 ratio ρ). Estimates are exact whenever the
    * corresponding key universe fits in k.
    *
    * The merged union sketch and the ρ ratio are array expressions
    * over the two 1-row sketches — after the two corpus scans, all
    * remaining work is O(k) inside codegen. */
  def kmvOverlap(a: DataFrame, b: DataFrame, keyCol: String,
      k: Int = 256): DataFrame = {
    val sa = kmvSketch(a, keyCol, k).select(col("hs").as("ha"))
    val sb = kmvSketch(b, keyCol, k).select(col("hs").as("hb"))
    sa.crossJoin(sb)
      .withColumn("m",
        slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("est_union", estimate(col("m"), k))
      .withColumn("rho",
        expr("size(filter(m, x -> array_contains(ha, x) AND array_contains(hb, x)))")
          .cast("double") / size(col("m")).cast("double"))
      .select(
        estimate(col("ha"), k).as("est_distinct_a"),
        estimate(col("hb"), k).as("est_distinct_b"),
        col("est_union"),
        (col("rho") * col("est_union")).as("est_overlap"),
        col("rho").as("jaccard"))
  }

  /** Per-group KMV sketches: one row per group with the ascending
    * array of the group's k smallest distinct key hashes. The
    * bottom-k is the bounded [[TopK]] heap (score = −hash), NOT a
    * per-group window — a window would drag each group's whole key
    * universe through one task. Exactness of the heap ordering:
    * long→double casting is monotone, and TopK breaks score ties
    * ascending on the id (the hash itself), so (−h_double desc,
    * h asc) is exactly h ascending even where 2^60-range hashes
    * collapse onto one 53-bit-mantissa double. */
  def kmvSketchPerGroup(df: DataFrame, groupCol: String,
      keyCol: String, k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val hs = df.select(col(groupCol), kmvHash(col(keyCol)).as("h"))
      .distinct()
    TopK.perKey(hs.select(col(groupCol), col("h").as("id"),
        (-col("h").cast("double")).as("score")),
      Seq(groupCol), "id", "score", k)
      .groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("id"))).as("hs"))
  }

  /** Cross-source overlap matrix: every unordered group pair's
    * distinct-count / union / intersection / Jaccard estimates, from
    * the per-group sketches alone — the dedup-planning view ("which
    * sources duplicate each other enough that cross-source dedup
    * pays?") over S sources for the cost of ONE corpus scan. After
    * [[kmvSketchPerGroup]]'s single data-sized exchange, the pair
    * grid is an |S|-row broadcast self-join (S² pairs of k-long
    * arrays, catalog-sized) and all estimate math is O(k) array
    * codegen per pair — same estimators as [[kmvOverlap]].
    *
    * Returns (group_a, group_b, est_distinct_a, est_distinct_b,
    * est_union, est_overlap, jaccard) for group_a < group_b. */
  def kmvOverlapMatrix(df: DataFrame, groupCol: String,
      keyCol: String, k: Int = 256): DataFrame = {
    val sk = kmvSketchPerGroup(df, groupCol, keyCol, k)
    val a = sk.select(col(groupCol).as("group_a"), col("hs").as("ha"))
    val b = sk.select(col(groupCol).as("group_b"), col("hs").as("hb"))
    // a broadcast CROSS + filter, not a theta inner join: same S²
    // pair grid, but the plan shape is the sanctioned deliberate
    // fan-out (PlanSpec's battery-wide nested-loop sweep pins the
    // distinction — an Inner BNL with a condition reads as an
    // accidental theta join)
    a.crossJoin(broadcast(b))
      .filter(col("group_a") < col("group_b"))
      .withColumn("m",
        slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .withColumn("est_union", estimate(col("m"), k))
      .withColumn("rho",
        expr("size(filter(m, x -> array_contains(ha, x) AND array_contains(hb, x)))")
          .cast("double") / size(col("m")).cast("double"))
      .select(col("group_a"), col("group_b"),
        estimate(col("ha"), k).as("est_distinct_a"),
        estimate(col("hb"), k).as("est_distinct_b"),
        col("est_union"),
        (col("rho") * col("est_union")).as("est_overlap"),
        col("rho").as("jaccard"))
  }

  /** Count-min sketch row hashes for an integer key: pairwise-
    * independent family h_i(x) = ((a_i·(x mod p) + b_i) mod p) mod w
    * with p = 2^31 - 1 (Carter-Wegman) — congruent to a_i·x + b_i
    * mod p, but reducing the key FIRST keeps the product under
    * ~2.4e18 for ANY Long key (a_i ≤ 1.11e9, key mod p < 2^31), so
    * the hash is exact 64-bit arithmetic over the full key domain and
    * replayable bit-for-bit by any engine. `floor-mod` keeps negative
    * keys in range. */
  private val cmP = 2147483647L
  private val cmA = Array(1103515245L, 22695477L, 69069L, 1664525L)
  private val cmB = Array(12345L, 1L, 362437L, 1013904223L)
  def cmBucket(key: Column, row: Int, w: Int): Column =
    pmod(pmod(lit(cmA(row)) * pmod(key, lit(cmP)) + lit(cmB(row)), lit(cmP)),
      lit(w.toLong))

  /** Count-min sketch (Cormode-Muthukrishnan 2005) frequency
    * estimates, checked against exact counts for the `topK` heaviest
    * keys. The sketch is the scale path: its counter table is d·w
    * cells regardless of corpus size, built by ONE partial-combined
    * aggregate (each row explodes into its d (row, bucket) cells
    * map-side, partials merge by +, so the exchange moves at most
    * d·w·partitions rows), and two sketches merge by cell-wise add —
    * the mergeable-summary contract that lets 1000 executors sketch
    * 100 TB and combine on one reducer. The exact counts exist here
    * only as the comparison baseline for the battery's oracle; at
    * production scale the sketch replaces them. Estimates are
    * deterministic given the fixed hash family, so an ANSI engine
    * replays every cell and every min.
    *
    * Returns (key, true_count, est_count) for the `topK` keys by
    * exact count (ties broken by key), ordered the same; est ≥ true
    * always (one-sided error ≤ εN with ε = e/w at the usual depth).
    */
  def countMinTopK(df: DataFrame, keyCol: String, w: Int, d: Int,
      topK: Int): DataFrame = {
    require(d >= 1 && d <= cmA.length, s"depth $d must be in [1, ${cmA.length}]")
    val keys = df.select(col(keyCol).cast("long").as("__k"))
    val cells = keys.select(explode(array((0 until d).map(i =>
        struct(lit(i).as("__r"), cmBucket(col("__k"), i, w).as("__b"))): _*))
        .as("__c"))
      .groupBy(col("__c.__r").as("__r"), col("__c.__b").as("__b"))
      .agg(count(lit(1)).as("__cnt"))
    val exact = keys.groupBy(col("__k"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("__k"))
      .limit(topK)
    // topK is small: estimate by joining each heavy key's d cells —
    // the sketch side is tiny (d·w rows) and broadcasts
    val probes = exact.select(col("__k"), col("true_count"),
        explode(array((0 until d).map(i =>
          struct(lit(i).as("__r"), cmBucket(col("__k"), i, w).as("__b"))): _*))
          .as("__c"))
      .select(col("__k"), col("true_count"),
        col("__c.__r").as("__r"), col("__c.__b").as("__b"))
    probes.join(broadcast(cells), Seq("__r", "__b"))
      .groupBy(col("__k"), col("true_count"))
      .agg(min(col("__cnt")).as("est_count"))
      .select(col("__k").as("key"), col("true_count"), col("est_count"))
      .orderBy(col("true_count").desc, col("key"))
  }

  /** Mergeable-sketch distinct rollup — THE 100-TB pattern for
    * distinct counting over arbitrary windows: build one Apache
    * DataSketches HLL sketch per bucket (day), then answer the
    * global question by UNIONING the bucket sketches instead of
    * re-scanning raw data. A naive Σ of per-bucket exact distincts
    * over-counts every value that appears in several buckets; the
    * sketch union does not — that gap is exactly what the report
    * shows. At scale the bucket sketches are the stored artifact
    * (kilobytes per day), and any ad-hoc window query is a union
    * over them.
    *
    * Emits ONE row: (n_buckets, sum_bucket_exact, exact_total,
    * union_within_pct) — exact values plus a deterministic
    * error-bound flag for the union estimate (the q42 discipline:
    * the sketch estimate itself is engine-specific, so the GATED
    * columns are the exact counts and the bound check, not the raw
    * estimate; lgK 12 gives ~1.6% RSD, checked against a `pct`
    * margin wide enough that estimator details cannot flip it).
    *
    * Scale shape: the sketch build is one partial-combined aggregate
    * per bucket (order- and partition-insensitive bucket state); the
    * union is a second aggregate over |buckets| kilobyte blobs; the
    * exact twins are two-phase distinct aggregates — everything
    * mergeable, nothing quadratic. */
  def hllDistinctRollup(df: DataFrame, bucketCol: String,
      valueCol: String, lgK: Int = 12, pct: Double = 0.06): DataFrame = {
    require(lgK >= 8 && lgK <= 21, s"lgK $lgK out of range")
    val daily = df.groupBy(col(bucketCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("__sk"),
        countDistinct(col(valueCol)).as("__ex"))
    val merged = daily.agg(count(lit(1)).as("n_buckets"),
      sum(col("__ex")).as("sum_bucket_exact"),
      hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est"))
    val exact = df.agg(countDistinct(col(valueCol)).as("exact_total"))
    merged.crossJoin(exact)
      .select(col("n_buckets"), col("sum_bucket_exact"),
        col("exact_total"),
        (abs(col("__est") - col("exact_total")) <=
          col("exact_total") * pct).cast("long").as("union_within_pct"))
  }

  /** Mergeable fixed-bin quantile rollup — the quantile sibling of
    * [[hllDistinctRollup]], and the simplest member of the mergeable-
    * quantile-summary family (the role KLL/t-digest fill with
    * adaptive bins; fixed equi-width bins trade adaptivity for an
    * EXACTLY engine-replayable artifact). Per bucket (day), the
    * stored artifact is a `bins`-long count vector of `valueCol`
    * clamped into [lo, hi); the union that answers ANY window is
    * bin-wise addition — here materialized as the 'all' scope. The
    * estimate for quantile q is the LOWER EDGE of the first bin
    * whose cumulative count reaches ceil(q·N): error is bounded by
    * one bin width by construction, and every step is integer
    * arithmetic (`div`, no doubles), so the DuckDB oracle replays
    * the report bit-for-bit — including the exact-order-statistic
    * twin (min v with count(≤v) ≥ ceil(q·N), the SQL-standard
    * "lower" method) and the absolute error between them.
    *
    * Scale shape: one partial-combined (bucket, bin) count (the
    * only corpus-sized exchange), a |buckets|·bins-sized union
    * aggregate, per-scope cumulative windows PARTITIONED by scope
    * (bounded by bins rows for estimates; by distinct values for
    * the exact twin — drop the twin at petabyte scale, it exists to
    * gate the sketch). Everything mergeable, nothing quadratic.
    *
    * Returns (scope, q_ppm, n, est, exact, abs_err) — scope is the
    * bucket value or 'all', est/exact in `valueCol` units. */
  def binQuantileRollup(df: DataFrame, bucketCol: String,
      valueCol: String, bins: Int, lo: Long, hi: Long,
      qsPpm: Seq[Long]): DataFrame = {
    require(bins >= 2, s"bins $bins must be >= 2")
    require(hi > lo, s"empty value range [$lo, $hi)")
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1e6] ppm: $qsPpm")
    val w = org.apache.spark.sql.expressions.Window
    val v = df.select(col(bucketCol).cast("string").as("__b"),
      col(valueCol).cast("long").as("__v"))
    val span = hi - lo
    val binExpr = expr(
      s"least(${bins - 1}L, greatest(0L, ((__v - ${lo}L) * ${bins}L) div ${span}L))")
    val perBucket = v.select(col("__b"), binExpr.as("__bin"))
      .groupBy(col("__b"), col("__bin")).agg(count(lit(1)).as("__n"))
    val counts = perBucket
      .select(col("__b").as("scope"), col("__bin"), col("__n"))
      .unionByName(perBucket.groupBy(col("__bin"))
        .agg(sum(col("__n")).as("__n"))
        .select(lit("all").as("scope"), col("__bin"), col("__n")))
    val qlit = array(qsPpm.map(lit): _*)
    val cum = counts
      .withColumn("__cum", sum(col("__n")).over(
        w.partitionBy(col("scope")).orderBy(col("__bin"))
          .rowsBetween(w.unboundedPreceding, w.currentRow)))
      .withColumn("__tot", sum(col("__n")).over(w.partitionBy(col("scope"))))
      .select(col("scope"), col("__bin"), col("__cum"), col("__tot"),
        explode(qlit).as("q_ppm"))
      .withColumn("__rank", expr("(__tot * q_ppm + 999999) div 1000000"))
    val est = cum.filter(col("__cum") >= col("__rank"))
      .groupBy(col("scope"), col("q_ppm"))
      .agg(max(col("__tot")).as("n"), min(col("__bin")).as("__eb"))
      .withColumn("est", expr(s"${lo}L + (${span}L * __eb) div ${bins}L"))
      .drop("__eb")
    // exact order-statistic twin ("lower" method) over the same scopes
    val vals = v.select(col("__b").as("scope"), col("__v"))
      .unionByName(v.select(lit("all").as("scope"), col("__v")))
      .groupBy(col("scope"), col("__v")).agg(count(lit(1)).as("__n"))
      .withColumn("__cum", sum(col("__n")).over(
        w.partitionBy(col("scope")).orderBy(col("__v"))
          .rowsBetween(w.unboundedPreceding, w.currentRow)))
      .withColumn("__tot", sum(col("__n")).over(w.partitionBy(col("scope"))))
      .select(col("scope"), col("__v"), col("__cum"), col("__tot"),
        explode(qlit).as("q_ppm"))
      .withColumn("__rank", expr("(__tot * q_ppm + 999999) div 1000000"))
      .filter(col("__cum") >= col("__rank"))
      .groupBy(col("scope"), col("q_ppm"))
      .agg(min(col("__v")).as("exact"))
    est.join(vals, Seq("scope", "q_ppm"))
      .select(col("scope"), col("q_ppm"), col("n"), col("est"), col("exact"),
        abs(col("est") - col("exact")).as("abs_err"))
      .orderBy(col("scope"), col("q_ppm"))
  }
}
