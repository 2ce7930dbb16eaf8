package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` is seed-dependent per partitioning and not
  * reproducible across engines or re-runs over re-partitioned data.
  * These operators derive the sampling decision from a content hash
  * of a key column instead: the same row is always in or out, on any
  * cluster layout, and an external engine can recompute the exact
  * sample. Both are narrow or bounded-shuffle shapes that survive
  * 100 TB: the Bernoulli filter is per-row with no shuffle at all;
  * the stratified top-n shuffles once on the stratum key.
  */
object Sampling {

  /** Uniform [0,1) weight for a key: the md5 hex string of the key is
    * uniform per nibble, so a lexicographic compare against a hex
    * prefix is an exact quantile test — and md5 of a string is
    * identical in every engine. */
  def hashWeight(key: Column): Column = md5(key.cast("string"))

  /** Deterministic Bernoulli sample: keep rows whose md5(key) falls
    * below the hex threshold (e.g. "2" keeps 1/8, "1a" keeps
    * 26/256). Per-row filter, no shuffle, reproducible anywhere. */
  def deterministicSample(df: DataFrame, keyCol: String,
      hexThreshold: String): DataFrame =
    df.filter(hashWeight(col(keyCol)) < lit(hexThreshold.toLowerCase))

  /** Hex threshold such that `md5(key) < threshold` holds with
    * probability `frac` exactly (8-nibble quantile of the md5 space).
    * Shared verbatim with SQL oracles so both engines compare against
    * the identical literal. */
  def hexThreshold(frac: Double): String = {
    require(frac >= 0 && frac < 1, s"frac $frac must be in [0,1)")
    f"${math.floor(frac * 4294967296d).toLong}%08x"
  }

  /** Deterministic training-mixture construction: the domain-weights
    * step of a pre-training data recipe (sample web at 1.0, books at
    * 0.6, oversample code at 2.5, …). Each source contributes
    * `floor(w)` full copies plus one hash-sampled fractional copy —
    * oversampling IS duplication in mixture recipes, distinguished by
    * a `copy` index so downstream packing can interleave epochs. The
    * sampling decision is md5 of (key, copy): per-row, no shuffle, no
    * RNG, identical on any cluster layout or engine, so the exact
    * mixture is replayable (and oracle-checkable) anywhere. Output is
    * the union of the tagged copies — still a narrow plan over every
    * source. */
  def mixture(sources: Seq[(String, DataFrame, Double)],
      keyCol: String): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    val parts = sources.flatMap { case (name, df, w) =>
      require(w >= 0, s"weight $w for $name must be >= 0")
      val full = math.floor(w).toInt
      val frac = w - full
      val fullCopies = (0 until full).map(c =>
        df.select(lit(name).as("source") +: lit(c).as("copy") +:
          df.columns.map(col): _*))
      val fracCopy =
        if (frac > 0)
          Seq(df.filter(
            md5(concat(col(keyCol).cast("string"), lit(":" + full))) <
              lit(hexThreshold(frac)))
            .select(lit(name).as("source") +: lit(full).as("copy") +:
              df.columns.map(col): _*))
        else Nil
      fullCopies ++ fracCopy
    }
    parts.reduce(_ unionAll _)
  }

  /** Deterministic stratified sample: exactly `n` rows per stratum
    * (fewer if the stratum is smaller), chosen by hash order so the
    * pick is stable. One shuffle on the stratum key; each stratum's
    * window is an ordinary partitioned window. */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashWeight(col(keyCol)), col(keyCol))
    df.withColumn("__sr", row_number().over(w))
      .filter(col("__sr") <= n)
      .drop("__sr")
  }

  /** Deterministic weighted sample without replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"):
    * row i gets key u_i^(1/w_i) — equivalently ln(u_i)/w_i, compared
    * monotonically — and the k LARGEST keys are the sample, which
    * E-S prove is distributed exactly as sequential weighted draws
    * without replacement. The training-data use: sample documents
    * proportional to a quality weight, reproducibly.
    *
    * u_i derives from the portable universal hash of the id (the
    * same `(a·x + b) mod p` family the portable MinHash oracle
    * replays — plain codegen'd arithmetic, no RNG), so the exact
    * sample is recomputable by any engine. The selection key is
    * micro-quantized (`key_micro = round(1e6·ln(u)/w)`, negative,
    * larger = better) so an oracle compares integers, not doubles.
    * Requires non-negative ids below 2^31 (no overflow in the hash)
    * and strictly positive weights.
    *
    * Scale shape: the per-row key is narrow; the top-k is
    * [[TopK.perKey]] — map-side bounded heaps, one shuffle of ≤k
    * rows per stratum, never a global sort. With `strataCols` empty
    * the whole frame is one stratum (single ≤k-row merge). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, strataCols: Seq[String] = Nil): DataFrame = {
    val P = 1000000007L
    val u = ((col(idCol).cast("long") * lit(2654435761L) + lit(40503L))
      % P + lit(0.5)) / lit(P.toDouble)
    val keyMicro = round(log(u) / col(weightCol) * 1000000.0, 0)
      .cast("long")
    val scored = df.select(strataCols.map(col) :+ col(idCol) :+
      keyMicro.as("key_micro"): _*)
    val strata = if (strataCols.isEmpty) {
      // single stratum: constant group key, dropped after the top-k
      TopK.perKey(scored.withColumn("__g", lit(0)), Seq("__g"), idCol,
        "key_micro", k).drop("__g")
    } else TopK.perKey(scored, strataCols, idCol, "key_micro", k)
    strata.select(strataCols.map(col) ++ Seq(col(idCol),
      col("key_micro").cast("long").as("key_micro"), col("rnk")): _*)
  }

  /** Temperature-scaled multilingual sampling shares at T = 2 — the
    * sqrt-smoothing of per-group sizes used to keep head languages
    * from drowning the tail when building a pretraining mixture
    * (the UniMax/mT5 family of sampling rules; Conneau et al. 2020
    * use the same p_i^(1/T) form). Share_i ∝ √n_i, and the report
    * includes the expected draw per group under `budget` total
    * samples plus the implied epochs-over-the-group in micro
    * (expected/size — the over-sampling factor the tail pays).
    *
    * T is fixed at 2 because √ is the one power that is CORRECTLY
    * ROUNDED in IEEE-754 — Math.sqrt here and sqrt() in any
    * replaying engine return the identical double, so the report is
    * engine-portable; a general pow(n, 1/T) is not correctly rounded
    * and could differ in the last ulp across engines. Each √n_i is
    * quantized to micro Longs BEFORE the normalizing sum (exact,
    * order-independent), and each share is one deterministic double
    * divide.
    *
    * Scale shape: one partial-combined count per group, then
    * |groups|-sized arithmetic with the total attached by a
    * broadcast-sized join. Returns (key, n_docs, weight_micro,
    * share_micro, expected_docs, epochs_micro) ordered by key. */
  def sqrtTemperatureShares(df: DataFrame, keyCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget $budget must be > 0")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"))
      .select(col(keyCol), col("n_docs"),
        expr("CAST(ROUND(1e6 * SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)")
          .as("weight_micro"))
    val total = counts.agg(sum(col("weight_micro")).as("__tw"))
    counts.crossJoin(total)
      .select(col(keyCol), col("n_docs"), col("weight_micro"),
        expr("CAST(ROUND(1e6 * (CAST(weight_micro AS DOUBLE) / CAST(__tw AS DOUBLE))) AS BIGINT)")
          .as("share_micro"),
        expr(s"CAST(ROUND($budget * (CAST(weight_micro AS DOUBLE) / CAST(__tw AS DOUBLE))) AS BIGINT)")
          .as("expected_docs"))
      .select(col(keyCol), col("n_docs"), col("weight_micro"),
        col("share_micro"), col("expected_docs"),
        expr("CAST(ROUND(1e6 * (CAST(expected_docs AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS BIGINT)")
          .as("epochs_micro"))
      .orderBy(col(keyCol))
  }

  /** UniMax language-budget allocation (Chung et al. 2023): split a
    * total training-token budget across languages so that no language
    * repeats more than `maxEpochsPpm` epochs, spreading what the
    * capped (low-resource) languages cannot absorb evenly over the
    * rest — the fairer alternative to temperature sampling
    * ([[sqrtTemperatureShares]]) at large budget-to-corpus ratios.
    * Exact integer greedy waterfill: languages ascend by (cap, lang);
    * at each step the language takes `min(cap, remaining DIV
    * remaining_langs)`. Deterministic, engine-replayable (the oracle
    * unrolls it as a recursive CTE); integer remainders flow to the
    * later (larger) languages by construction.
    *
    * Scale shape: ONE partial-combined per-language weight aggregate
    * is the only corpus-sized work. The waterfill itself runs on the
    * collected |langs| rows — catalog-sized, the codebook-collect
    * discipline — and returns as a driver-built bounded frame.
    *
    * Returns (lang, n_tokens, cap_tokens, alloc_tokens, epochs_ppm)
    * ordered by lang. */
  def unimaxAllocation(df: DataFrame, langCol: String, weight: Column,
      budgetPpm: Long, maxEpochsPpm: Long): DataFrame = {
    require(budgetPpm >= 1, s"budgetPpm $budgetPpm must be >= 1")
    require(maxEpochsPpm >= 1, s"maxEpochsPpm $maxEpochsPpm must be >= 1")
    val counts = df.groupBy(col(langCol).cast("string").as("lang"))
      .agg(sum(weight.cast("long")).as("n"))
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("n")))
    // fail fast on a NULL language group: the greedy order is keyed
    // on lang, and NULL has no stable place in it (Scala tuple sort
    // would NPE; engines disagree on NULL collation) — an unlabeled
    // corpus slice is an upstream bug, not an allocation input
    require(!counts.exists(_._1 == null),
      "unimaxAllocation: NULL lang group — label or filter it upstream")
    val total = counts.map(_._2).sum
    var rem = total * budgetPpm / 1000000L
    // lang ties ordered by UTF-8 bytes (unsigned), matching DuckDB's
    // binary collation; Scala's String ordering compares UTF-16 code
    // units, which diverges for supplementary-plane language tags
    val utf8 = new Ordering[String] {
      def compare(a: String, b: String): Int = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        while (i < x.length && i < y.length) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c
          i += 1
        }
        x.length - y.length
      }
    }
    val byCap = counts
      .map { case (l, n) => (l, n, n * maxEpochsPpm / 1000000L) }
      .sortBy { case (l, _, cap) => (cap, l) }(
        Ordering.Tuple2(Ordering.Long, utf8))
    var k = byCap.length
    val alloc = byCap.map { case (l, n, cap) =>
      val share = if (k > 0) rem / k else 0L
      val b = math.min(cap, share)
      rem -= b; k -= 1
      (l, n, cap, b, if (n > 0) 1000000L * b / n else 0L)
    }
    val spark = df.sparkSession
    import spark.implicits._
    alloc.toSeq
      .toDF("lang", "n_tokens", "cap_tokens", "alloc_tokens",
        "epochs_ppm")
      .orderBy(col("lang"))
  }

  /** Source-interleaved epoch ordering: a deterministic training-data
    * order that (a) shuffles every source pseudo-randomly (md5 of
    * source|id — reproducible on any partitioning, like every sampler
    * here) and (b) round-robins across sources, so no long
    * same-source run reaches the training loop (consecutive
    * positions cycle through all S sources until a source exhausts) —
    * the data-ordering step between curation and shard export.
    * `interleave_pos = (src_ordinal − 1)·S + src_idx` is injective by
    * construction, so the order is total and gap-free per cycle.
    *
    * Scale shape: the per-source shuffled ordinal is the two-pass
    * trick at (source, md5-prefix-bucket) grain — one data-sized hash
    * exchange into 256 buckets per source, plus a (source, bucket)
    * COUNT prefix table (≤ 256·S rows) broadcast back. The source
    * index is a one-task window over the DISTINCT-source table
    * (|S| rows, bounded by the catalog, not the corpus). Never a
    * per-source whole-corpus window, never a global sort.
    *
    * Returns (id, src, src_ordinal, interleave_pos). */
  def interleaveBySource(df: DataFrame, idCol: String,
      srcCol: String): DataFrame = {
    val keyed = df.select(col(idCol), col(srcCol),
      md5(concat(col(srcCol).cast("string"), lit("|"),
        col(idCol).cast("string"))).as("__k"))
      .withColumn("__b", substring(col("__k"), 1, 2))
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol), col("__b"))
      .orderBy(col("__k"), col(idCol))
    val local = keyed.withColumn("__lr", row_number().over(wLoc))
    val counts = keyed.groupBy(col(srcCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offsets = counts.select(col(srcCol), col("__b"),
      coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off"))
    // source index: |S|-row table, one bounded task. The partition
    // key must be COLUMN-derived (Ranks discipline): pmod over two
    // literals constant-folds away and the window degenerates into
    // Spark's "No Partition Defined" shape — the battery-wide
    // PlanSpec window sweep caught exactly that in the first cut.
    val srcs = df.select(col(srcCol)).distinct()
      .withColumn("__one",
        pmod(length(col(srcCol).cast("string")).cast("long"), lit(1L)))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__one")).orderBy(col(srcCol))
    val wCnt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__one"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .unboundedFollowing)
    val srcIdx = srcs.select(col(srcCol),
      (row_number().over(wSrc).cast("long") - 1L).as("__sidx"),
      count(lit(1)).over(wCnt).as("__ns"))
    local.join(broadcast(offsets), Seq(srcCol, "__b"))
      .withColumn("src_ordinal", col("__off") + col("__lr"))
      .join(broadcast(srcIdx), Seq(srcCol))
      .select(col(idCol), col(srcCol),
        col("src_ordinal").cast("long").as("src_ordinal"),
        ((col("src_ordinal") - 1L) * col("__ns") + col("__sidx"))
          .cast("long").as("interleave_pos"))
  }

  /** Largest-remainder (Hamilton) apportionment of an integer ppm
    * budget across keys by weight: each key gets
    * floor(w·totalPpm / W), and the shortfall ppm go one each to the
    * largest remainders (key ascending on ties) — the EXACT mixture
    * normalization for a training-data recipe ("30.0000% web,
    * 12.5000% code, …" that provably sums to 100%), where naive
    * per-key rounding drifts by up to |keys|/2 ppm. All integral:
    * products in decimal(38,0) so a 100 TB token count cannot
    * overflow the gate.
    *
    * Scale shape: ONE partial-combined weight aggregate is the only
    * corpus-sized work; the floors/remainders/rank run on |keys|
    * rows (catalog-sized — the [[unimaxAllocation]] discipline), so
    * the single-partition remainder window is bounded by the key
    * inventory, never the corpus.
    *
    * Returns (key, weight, floor_ppm, share_ppm) ordered by key;
    * sum(share_ppm) == totalPpm by construction. */
  def largestRemainderShares(df: DataFrame, keyCol: String,
      weight: Column, totalPpm: Long = 1000000L): DataFrame = {
    require(totalPpm >= 1, s"totalPpm $totalPpm must be >= 1")
    val w = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(sum(weight.cast("long")).as("weight"))
    val tot = w.agg(sum(col("weight")).cast("decimal(38,0)").as("__tw"))
    val fl = w.crossJoin(broadcast(tot)).select(col("key"), col("weight"),
      expr(s"CAST((CAST(weight AS DECIMAL(38,0)) * ${totalPpm}L)" +
        " DIV __tw AS BIGINT)").as("floor_ppm"),
      expr(s"(CAST(weight AS DECIMAL(38,0)) * ${totalPpm}L) % __tw")
        .as("__rem"))
    val short = fl.agg((lit(totalPpm) - sum(col("floor_ppm")))
      .as("__short"))
    // |keys|-row table, one bounded task. The partition expression
    // must be (a) COLUMN-DERIVED — a constant folds away and the
    // window degenerates into Spark's global no-partition shape (the
    // battery-wide PlanSpec pin) — and (b) never NULL: the bare
    // pmod(length(key),1) goes NULL on a NULL key, splitting the
    // remainder ranking into two partitions whose row_numbers both
    // start at 1, so more than __short keys get +1 and the exact-sum
    // contract breaks. coalesce(...,0) keeps every key (NULL
    // included) in ONE bounded partition.
    val wRem = Window
      .partitionBy(coalesce(
        pmod(length(col("key")).cast("long"), lit(1L)), lit(0L)))
      .orderBy(col("__rem").desc, col("key"))
    fl.withColumn("__rk", row_number().over(wRem).cast("long"))
      .crossJoin(broadcast(short))
      .select(col("key"), col("weight"), col("floor_ppm"),
        (col("floor_ppm") + when(col("__rk") <= col("__short"), 1L)
          .otherwise(0L)).as("share_ppm"))
      .orderBy(col("key"))
  }
}
