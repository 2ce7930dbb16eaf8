package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * TF-IDF term scoring, benchmark decontamination, PII scrubbing, and
  * deterministic shard export. Like the rest of the pipeline family,
  * every operator is a pure DataFrame transformation with a bounded
  * shuffle story: narrow where possible, hash-keyed where not, no
  * driver-side collects, and deterministic (hash-derived) decisions so
  * any engine — or a later re-run over re-partitioned data — can
  * reproduce the exact output.
  */
object Curation {

  /** Portable 60-bit token hash (two combined polynomial families,
    * [[TextAnalysis.portableHash60]]) — deterministic tie-break AND
    * collision-safe join key, replayable in ANSI SQL. */
  private def tokenHash(c: Column): Column =
    TextAnalysis.portableHash60(c)

  /** TF-IDF top-`k` terms per document.
    *
    * tf = in-document term count; idf = ln((N+1)/(df+1)) with df the
    * number of documents containing the term; score = tf·idf. Ties in
    * score rank by the portable token hash so the ordering is
    * engine-independent.
    *
    * Scale shape: one explode (narrow) feeds two hash aggregates —
    * (doc, term) counts and per-term document frequency — joined back
    * on the term key; the corpus size N rides a broadcast 1-row
    * aggregate (no driver action); and the per-document top-k merge is
    * the bounded [[TopK]] aggregate, so the shuffle after scoring
    * carries k-row heaps, not the full scored vocabulary. */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tok = df.select(col(idCol),
      explode(Dedup.tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("n_occ"))
    val dfreq = tok.groupBy(col("token"))
      .agg(countDistinct(col(idCol)).as("df"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"), col("n_occ"),
        (col("n_occ") * log((col("n_docs") + 1.0) / (col("df") + 1.0)))
          .as("score"),
        tokenHash(col("token")).as("th"))
      // scored feeds both the TopK aggregate and the join that
      // restores the token string — Spark has no cross-branch subplan
      // reuse, so persist the fan-out seam
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val top = TopK.perKey(
      scored.select(col(idCol), col("th").as("id"), col("score")),
      Seq(idCol), "id", "score", k)
    top.join(
        scored.select(col(idCol), col("th").as("id"), col("token"),
          col("n_occ")),
        Seq(idCol, "id"))
      .select(col(idCol), col("rnk"), col("token"), col("n_occ"),
        round(col("score"), 6).as("tfidf"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any
    * word `n`-gram with a benchmark document set — the standard
    * train/test-overlap check before a training run.
    *
    * `isBenchmark` partitions `df` into the benchmark side (the
    * contamination source) and the corpus side (the rows scored).
    * Grams hash inside the codegen'd [[graft.functions.ShingleHashes]]
    * pass, so only 8-byte keys cross the join; the benchmark gram set
    * is broadcast — benchmark suites are small relative to a training
    * corpus by construction, so the corpus side never shuffles at all.
    * Output: one row per corpus document with the count of distinct
    * overlapping grams and a 0/1 contamination flag. */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      isBenchmark: Column, n: Int = 8): DataFrame = {
    // full 64-bit FNV gram hashes, NOT the 30-bit polynomial family:
    // the poly hash exists so ANSI-SQL oracles can replay it, but this
    // operator's oracle intersects gram STRINGS, so the hash only has
    // to be collision-free — and at corpus scale the ~2^30 poly space
    // collides (measured: 2 false positives from ~450k x 4.5k grams at
    // sf0.1), while 2^64 keeps the expected collision count ~1e-10
    val grams = (side: DataFrame) => side.select(col(idCol),
      explode(graft.functions.ShingleHashes(col(textCol), n)).as("g"))
    val bench = grams(df.filter(isBenchmark)).select(col("g")).distinct()
    val corpus = df.filter(!isBenchmark)
    val hits = grams(corpus).join(broadcast(bench), Seq("g"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, 1).otherwise(0)
          .as("contaminated"))
  }

  /** Email / phone-number patterns shared by the scrubber and its
    * tests. Both stay inside the regex subset that Java regex and
    * RE2-style engines interpret identically (character classes,
    * bounded repetition — no backreferences or lookaround), so an
    * external engine reproduces the same redactions byte-for-byte. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrubbing: count and redact email addresses and phone
    * numbers. Purely narrow (regexp extract/replace per row, no
    * shuffle); emits match counts and the scrubbed text so a
    * downstream write replaces the raw column. */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // patterns ride lit() columns, not SQL text — Spark SQL string
    // literals process backslash escapes and would corrupt `\.`
    df.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0)))
        .cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>").as("scrubbed"))

  /** Deterministic shard id in [0, 16): the first hex nibble of
    * md5(key) — uniform, engine-independent (md5 of a string is
    * identical everywhere), and stable under any repartitioning. */
  def shardId(key: Column): Column =
    (instr(lit("0123456789abcdef"),
      substring(md5(key.cast("string")), 1, 1)) - 1).cast("int")

  /** Per-shard export statistics for a training-data dump: document
    * count, total characters, distinct languages, smallest id. One
    * partial-aggregated shuffle onto 16 keys — the map-side combine
    * reduces each input partition to ≤16 rows before the exchange, so
    * the tiny key space is not a skew problem. */
  def shardStats(df: DataFrame, idCol: String, charsCol: String,
      langCol: String): DataFrame =
    df.groupBy(shardId(col(idCol)).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(charsCol)).as("total_chars"),
        countDistinct(col(langCol)).as("n_langs"),
        min(col(idCol)).as("min_doc_id"))

  /** Deterministic sequence packing — the pre-training batch-prep
    * shape: within each shard, lay documents out in md5-hash order
    * and assign each to the `binTokens`-token bin its running token
    * count starts in (first-fit in a deterministic order, so any
    * engine or re-run reproduces the exact packing). One partitioned
    * window per shard; parallelism equals the shard count, which the
    * caller sizes to the cluster via the `shard` column (e.g.
    * [[shardId]] for 16, or any wider deterministic key). */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      shard: Column, binTokens: Int): DataFrame = {
    val t = df.select(col(idCol), tokens.cast("long").as("n_tok"),
      shard.as("shard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    t.withColumn("cum", sum(col("n_tok")).over(w))
      .select(col(idCol), col("shard"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / binTokens).cast("long").as("bin"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how target-like its hashed token distribution is.
    * Token features hash into `buckets` buckets; the target slice
    * (`isTarget`) and the full corpus each define a smoothed unigram
    * distribution over buckets; a document's log-importance weight is
    * Σ_b c_b·(ln p̂_target(b) − ln p̂_corpus(b)) with add-one
    * smoothing. Downstream selection keeps the top-weighted rows (or
    * Gumbel-resamples on the weights) — here we emit the weight.
    *
    * Scale shape: one narrow explode feeds two hash aggregates —
    * per-(doc, bucket) counts (integer, exact) and the
    * `buckets`-row distribution table, which rides a broadcast join
    * back onto the counts. The per-document sum folds LEFT-TO-RIGHT
    * over the bucket-sorted (count, log-ratio) array, so the double
    * math is an identical op sequence under any partitioning — the
    * weight is bit-reproducible by any engine, not just stable to
    * 1e-12. No windows, no driver actions, no corpus-sized cache.
    *
    * Returns (id, n_tokens, weight) with weight rounded to 6. */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 64): DataFrame = {
    val tok = df.select(col(idCol), isTarget.as("is_t"),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .select(col(idCol), col("is_t"),
        pmod(tokenHash(col("token")), lit(buckets.toLong)).as("b"))
    // bucket distribution: integer counts, exact under any combine
    // order; ~`buckets` rows, broadcast to the scoring join
    val dist = tok.groupBy(col("b"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
    val tot = dist.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val lr = dist.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + 1.0) / (col("nt") + buckets.toDouble)) -
          log((col("cr") + 1.0) / (col("nr") + buckets.toDouble))).as("lr"))
    val docCounts = tok.groupBy(col(idCol), col("b"))
      .agg(count(lit(1)).as("c"))
    docCounts.join(broadcast(lr), Seq("b"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        // deterministic fold: sort the (bucket, term) pairs, then sum
        // left to right — identical double-op sequence everywhere
        round(expr(
          "aggregate(array_sort(collect_list(struct(b, c, lr)))," +
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.c * x.lr)"), 6)
          .as("weight"))
  }

  /** Domain drift diagnostic: KL(P_group ‖ P_corpus) over hashed
    * unigram buckets, per group — how far each source's token
    * distribution sits from the corpus mix, the number mixture
    * tuning (and drift monitoring between ingest snapshots) reads
    * before reweighting. Add-1 smoothing over `buckets` hashed
    * buckets, same bucket space as [[dsirWeights]].
    *
    * Determinism: bucket counts are exact integers; each bucket's
    * term p_g·(ln p_g − ln p) is computed with the same op sequence
    * in both engines, and the per-group sum folds in bucket order —
    * so the doubles are engine- and partitioning-independent. Scale:
    * two bucket aggregates (O(groups × buckets) rows), the group ×
    * bucket grid built against the broadcast corpus table — nothing
    * is corpus-sized after the token pass. */
  def domainDivergence(df: DataFrame, groupCol: String, textCol: String,
      buckets: Int = 64): DataFrame = {
    val tok = df.select(col(groupCol),
        explode(Dedup.tokens(col(textCol))).as("token"))
      .select(col(groupCol),
        pmod(tokenHash(col("token")), lit(buckets.toLong)).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpus = tok.groupBy(col("b")).agg(count(lit(1)).as("cb"))
    val nTot = corpus.agg(sum(col("cb")).as("n"))
    val grp = tok.groupBy(col(groupCol), col("b")).agg(count(lit(1)).as("cgb"))
    val ng = grp.groupBy(col(groupCol)).agg(sum(col("cgb")).as("ng"))
    // the FULL bucket grid, including buckets no token hashed into:
    // both smoothed distributions must range over all `buckets` cells
    // or the truncated sum is not a KL (and can go negative)
    val allB = df.sparkSession.range(buckets).select(col("id").as("b"))
    val base = ng.crossJoin(broadcast(allB))
      .join(broadcast(corpus), Seq("b"), "left")
      .join(grp, Seq(groupCol, "b"), "left")
      .na.fill(0L, Seq("cgb", "cb"))
      .crossJoin(broadcast(nTot))
    val pg = (col("cgb") + 1.0) / (col("ng") + buckets.toDouble)
    val pb = (col("cb") + 1.0) / (col("n") + buckets.toDouble)
    base.select(col(groupCol), col("b"), col("ng"),
        (pg * (log(pg) - log(pb))).as("t"))
      .groupBy(col(groupCol))
      .agg(min(col("ng")).as("n_tokens"),
        round(expr(
          "aggregate(array_sort(collect_list(struct(b, t)))," +
            " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.t)"), 6).as("kl"))
  }

  /** Prepare a corpus for sharded export: tag each row with its
    * deterministic shard, cluster rows so each output file holds
    * exactly one shard (`repartition` on the shard key), and order
    * within the file by id for reproducible bytes. Callers write with
    * `.write.partitionBy("shard")` — every task then streams one
    * sorted shard into one file, the layout a 1000-executor export
    * wants. */
  def shardExport(df: DataFrame, idCol: String): DataFrame =
    df.withColumn("shard", shardId(col(idCol)))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(idCol))

  /** Distribution-based outlier gate (winsorization): flag rows whose
    * `valueCol` falls outside the corpus [`loQ`, `hiQ`] exact
    * percentile band, and clip to the band — the standard
    * length-outlier curation step (truncated docs at one end,
    * concatenation accidents at the other). The bounds come from ONE
    * exact-percentile aggregate (partial-aggregable value maps — see
    * q47) broadcast as a single row; the gate itself is a narrow
    * comparison, so the whole pass adds no data shuffle.
    *
    * MEMORY CONTRACT: exact percentile's value→count map is
    * O(distinct values) — fine for the integer lengths/counts this
    * gate targets, a memory risk on an unbounded continuous column;
    * there, swap the bounds aggregate for `approx_percentile`
    * (bounded sketch, q53's spec'd error) — the clip semantics are
    * unchanged. */
  def outlierGate(df: DataFrame, idCol: String, valueCol: String,
      loQ: Double = 0.05, hiQ: Double = 0.95): DataFrame = {
    val bounds = df.agg(
      expr(s"percentile($valueCol, ${loQ}D)").as("lo"),
      expr(s"percentile($valueCol, ${hiQ}D)").as("hi"))
    df.select(col(idCol), col(valueCol))
      .join(broadcast(bounds))
      .select(col(idCol), col(valueCol),
        (col(valueCol) < col("lo") || col(valueCol) > col("hi"))
          .cast("long").as("is_outlier"),
        least(greatest(col(valueCol).cast("double"), col("lo")),
          col("hi")).as("clipped"))
  }

  /** Z-order layout diagnostic: interleave two long keys into the
    * Morton z-value ([[graft.functions.ZOrderBits]]), cut the z-space
    * into `buckets` contiguous ranges, and report each bucket's row
    * count and per-dimension min/max. A z-sorted export keeps BOTH
    * dimensions bounded inside every contiguous range — exactly the
    * property that makes parquet row-group min/max stats prune
    * selective filters on EITHER column, where a single-key sort
    * helps only its own column. Pair with [[shardExport]]-style
    * `sortWithinPartitions(z)` when writing the layout; this operator
    * is the audit that the interleave actually localizes.
    *
    * One narrow codegen pass computes z; the max-z rides a broadcast
    * 1-row aggregate; the stats are one partial-aggregated groupBy on
    * the bucket id. */
  def zorderBucketStats(df: DataFrame, aCol: String, bCol: String,
      buckets: Int): DataFrame = {
    val z = df.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .withColumn("z", graft.functions.ZOrderBits(col("a"), col("b")))
    val mz = z.agg(max(col("z")).as("mz"))
    z.join(broadcast(mz))
      .withColumn("bucket", expr(s"z div ((mz div $buckets) + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
  }

  /** Distributed batch-perceptron quality classifier — the
    * model-based filtering family (fastText-style classifiers in
    * CCNet/LLaMA pipelines) reduced to its bit-exact core: hashed
    * bag-of-words features (token counts over `buckets` portable-hash
    * buckets + bias), labels from `labelCol` (+1/−1), and `rounds`
    * synchronous batch updates w ← w + Σ_misclassified y·x with
    * margin rule y·(w·x) ≤ 0.
    *
    * Everything is INTEGER arithmetic — counts, dot products, weight
    * sums — so training is exactly reproducible under any
    * partitioning and replayable in ANSI SQL (no float gradients, no
    * libm). That is the property that lets the oracle verify a
    * distributed TRAINING loop, not just inference.
    *
    * Scale shape: features are one narrow explode + a doc-keyed hash
    * aggregate (dense `buckets+1` arrays, built once and persisted);
    * each round broadcasts the (buckets+1)-long weight row, computes
    * margins in a narrow zip, and reduces misclassified rows to one
    * per-dimension sum — a `buckets+1`-key aggregate feeding a 1-row
    * map. No driver actions, no windows; rounds are a fixed
    * hyperparameter, not data-dependent.
    *
    * Returns (id, y, score, pred): final integer activation w·x and
    * its sign. */
  def perceptronQuality(df: DataFrame, idCol: String, textCol: String,
      labelCol: Column, buckets: Int = 16, rounds: Int = 3): DataFrame = {
    val dims = buckets + 1 // + bias
    val counts = df
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("t"))
      .select(col(idCol),
        pmod(tokenHash(col("t")), lit(buckets.toLong)).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("b"), col("c"))))
        .as("m"))
    // dense feature vector as one compiled scatter
    // ([[graft.functions.DenseCounts]]): the HOF spelling probed the
    // count map `buckets` times per document through interpreted
    // element_at lambdas; same array, bias slot included
    val feat = df.select(col(idCol), labelCol.cast("long").as("y"))
      .join(counts, Seq(idCol))
      .select(col(idCol), col("y"),
        graft.functions.DenseCounts(col("m"), buckets).as("x"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // integer margin kernel as one compiled loop
    // ([[graft.functions.LongDot]]): the HOF spelling ran two
    // interpreted closure calls per dimension per document per round
    // (same left-to-right Long accumulation, so training trajectories
    // are bit-identical)
    val dot = graft.functions.LongDot(col("w"), col("x"))
    var w = df.sparkSession.range(1).select(expr(
      s"transform(sequence(1, $dims), i -> CAST(0 AS BIGINT))").as("w"))
    for (_ <- 1 to rounds) {
      val mis = feat.crossJoin(broadcast(w))
        .select(col("y"), col("x"), (col("y") * dot).as("margin"))
        .filter(col("margin") <= 0)
      // one row always, even when nothing is misclassified: a global
      // aggregate over zero rows yields an empty update map
      val delta = mis
        .select(col("y"), posexplode(col("x")).as(Seq("d", "xd")))
        .groupBy(col("d")).agg(sum(col("y") * col("xd")).as("s"))
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("d"), col("s"))))).as("dm"))
      w = w.crossJoin(broadcast(delta)).select(expr(
        s"""zip_with(w, transform(sequence(0, ${dims - 1}),
           |  dd -> coalesce(element_at(dm, dd), CAST(0 AS BIGINT))),
           |  (a, b) -> a + b)""".stripMargin).as("w"))
    }
    feat.crossJoin(broadcast(w))
      .select(col(idCol), col("y"), dot.as("score"),
        when(dot > 0, 1L).otherwise(-1L).as("pred"))
  }

  /** Deterministic CONTENT-keyed train/val/test assignment: the
    * split is a function of the text's portable rolling hash (mod 10:
    * 0–7 train, 8 val, 9 test ≈ 80/10/10), so byte-identical
    * documents land in the same split on any engine, any
    * partitioning, any re-run — exact duplicates can never straddle
    * the eval boundary by construction. Narrow, zero shuffle. */
  def assignSplit(textCol: Column): Column =
    when(graft.functions.RollingHash(textCol, 31L, 1000000007L) % 10 <= 7,
      lit("train"))
      .when(graft.functions.RollingHash(textCol, 31L, 1000000007L) % 10 === 8,
        lit("val"))
      .otherwise(lit("test"))

  /** GROUP-aware train/val/test assignment (sklearn's
    * GroupShuffleSplit shape): the split is a pure function of the
    * GROUP key (site/source/author), so every document of a group
    * lands in the same split BY CONSTRUCTION — the structural cure
    * for cross-split leakage of same-origin near-dups that per-doc
    * hashing ([[assignSplit]]) cannot give (and that [[splitLeakage]]
    * then has to audit for). Deterministic portable hash → percent
    * bucket → threshold cut; one narrow codegen'd column, zero
    * shuffle, replayable in ANSI SQL. */
  def groupedSplit(df: DataFrame, groupCol: String,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split fractions: train $trainPct% + val $valPct%")
    val bucket =
      graft.functions.RollingHash(col(groupCol), 31L, 1000000007L) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Split assignment + NEAR-duplicate leakage audit — the eval-
    * hygiene check a training run needs before trusting its val/test
    * numbers: a hash split keeps exact dups together, but near-dups
    * (differing by a byte) hash apart and leak benchmark-adjacent
    * text into train. Mines candidate pairs with the oracle-proven
    * portable MinHash LSH ([[Dedup.minhashCandidatesPortable]]),
    * verifies each with exact shingle Jaccard
    * ([[Dedup.jaccardForPairs]]), and flags every document whose
    * verified (≥ `tau`) near-dup lives in a DIFFERENT split.
    *
    * Scale shape: split assignment is a narrow pass; leak mining is
    * the bucketed LSH pipeline (never n² pairs); the split tags join
    * the verified pairs on doc id (hash join on a uniform key); and
    * the per-doc rollup is one partial-aggregated count. Returns one
    * row per document: (id, split, n_cross_leaks, is_leak). */
  def splitLeakage(df: DataFrame, idCol: String, textCol: String,
      tau: Double = 0.5): DataFrame = {
    // three branches read the split tags (both pair sides + the final
    // rollup); persisting the (id, split) rows — bytes per doc — keeps
    // the full-text rolling hash to ONE scan instead of three
    val splits = df.select(col(idCol),
        assignSplit(col(textCol)).as("split"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verified = Dedup.jaccardForPairs(
        Dedup.minhashCandidatesPortable(df, idCol, textCol),
        df, idCol, textCol)
      .filter(col("jac") >= tau)
    val cross = verified
      .join(splits.toDF("a_id", "a_split"), Seq("a_id"))
      .join(splits.toDF("b_id", "b_split"), Seq("b_id"))
      .filter(col("a_split") =!= col("b_split"))
    val perDoc = cross.select(explode(array(col("a_id"), col("b_id")))
        .as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_cross_leaks"))
    splits.join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("split"),
        coalesce(col("n_cross_leaks"), lit(0L)).as("n_cross_leaks"),
        (coalesce(col("n_cross_leaks"), lit(0L)) > 0).cast("long")
          .as("is_leak"))
  }

  /** URL canonicalization + host extraction — the crawl-curation
    * normalization step upstream of host-level quotas and URL-keyed
    * dedup (C4/CCNet-family pipelines dedup by canonical URL before
    * any text pass; one logical page otherwise appears under dozens
    * of tracking-tagged spellings). Scheme and host lowercase (the
    * path stays case-sensitive per RFC 3986), default ports stripped
    * (`:80` for http, `:443` for https — non-default ports stay part
    * of the host key), `www.` stripped, fragments dropped,
    * percent-escape hex uppercased (`%2f` → `%2F`; RFC 3986 §6.2.2.1
    * — same octet, different spelling), tracking parameters (utm_*,
    * ref, fbclid, gclid) removed, surviving query params SORTED so
    * parameter order can't split one URL into many, trailing path
    * slashes collapsed. All narrow codegen'd string ops — zero
    * shuffle; the host column is the natural key for per-host quota
    * aggregation downstream.
    *
    * Precondition: absolute `scheme://host/...` URLs (host ends at
    * the first '/'; a query string requires at least the '/' path).
    * Returns (id, canon_url, host). */
  def canonicalizeUrls(df: DataFrame, idCol: String, urlCol: String)
      : DataFrame =
    df.select(col(idCol), col(urlCol).as("__u"))
      .withColumn("__scheme", lower(expr("substring_index(__u, '://', 1)")))
      .withColumn("__hp",
        expr("substring_index(substring_index(__u, '://', -1), '#', 1)"))
      .withColumn("__hostport", lower(expr("substring_index(__hp, '/', 1)")))
      .withColumn("__hostnop", expr(
        """CASE WHEN __scheme = 'http' AND endswith(__hostport, ':80')
          |  THEN substring(__hostport, 1, length(__hostport) - 3)
          |WHEN __scheme = 'https' AND endswith(__hostport, ':443')
          |  THEN substring(__hostport, 1, length(__hostport) - 4)
          |ELSE __hostport END""".stripMargin))
      .withColumn("host",
        expr("regexp_replace(__hostnop, '^www\\\\.', '')"))
      .withColumn("__pathq", expr(upperPctEscapes(
        "substring(__hp, length(__hostport) + 1)")))
      .withColumn("__path",
        expr("regexp_replace(substring_index(__pathq, '?', 1), '/+$', '')"))
      .withColumn("__q", expr(
        "CASE WHEN instr(__pathq, '?') > 0 " +
          "THEN substring(__pathq, instr(__pathq, '?') + 1) ELSE '' END"))
      .withColumn("__params", expr(
        """sort_array(filter(split(__q, '&'), p -> p != ''
          |  AND NOT startswith(p, 'utm_') AND NOT startswith(p, 'ref=')
          |  AND NOT startswith(p, 'fbclid=')
          |  AND NOT startswith(p, 'gclid=')))""".stripMargin))
      .select(col(idCol),
        expr(
          """concat(__scheme, '://', host, __path,
            |  CASE WHEN size(__params) > 0
            |    THEN concat('?', array_join(__params, '&'))
            |    ELSE '' END)""".stripMargin).as("canon_url"),
        col("host"))

  /** SQL expression uppercasing the two hex digits of every
    * percent-escape in the string expression `c`: split on '%', fix
    * the escape head of each later fragment, rejoin. A fragment whose
    * head is not two hex digits (stray '%' in a malformed URL) passes
    * through untouched, as does a trailing '%' (split keeps the empty
    * tail fragment). Narrow codegen array/string ops only. */
  private def upperPctEscapes(c: String): String =
    s"""CASE WHEN instr($c, '%') = 0 THEN $c ELSE
       |  concat(element_at(split($c, '%'), 1), array_join(transform(
       |    slice(split($c, '%'), 2, size(split($c, '%')) - 1),
       |    p -> concat('%', CASE WHEN p rlike '^[0-9a-fA-F]{2}'
       |      THEN concat(upper(substring(p, 1, 2)), substring(p, 3))
       |      ELSE p END)), ''))
       |END""".stripMargin

  /** Margin calibration report for a scored + labeled frame (e.g.
    * [[perceptronQuality]]'s output): bucket rows into fixed-width
    * score bins and report, per bin, the size, the positive count and
    * rate, and the mean score — the reliability-diagram table that
    * decides whether a quality classifier's margin can be used as a
    * sampling weight or only as a hard threshold. Fixed data-
    * independent bin edges (floor(score/binWidth), floored toward
    * -inf in double space so negative margins bin identically on any
    * engine) rather than rank-based deciles: an ntile would need a
    * global total order — either a single-partition window or a
    * two-pass rank — for a report that fixed edges serve equally
    * well. One partial-combined aggregate over integer sums; the two
    * final divides are single IEEE ops.
    *
    * Returns (bin, n_docs, n_pos, pos_rate 4dp, mean_score 4dp)
    * ordered by bin. */
  def calibrationReport(scored: DataFrame, scoreCol: String,
      labelCol: String, binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth $binWidth must be >= 1")
    scored
      .groupBy(floor(col(scoreCol).cast("double") / binWidth.toDouble)
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(labelCol) === 1L, 1L).otherwise(0L)).as("n_pos"),
        sum(col(scoreCol).cast("long")).as("__ssum"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n_docs"), 4).as("pos_rate"),
        round(col("__ssum").cast("double") / col("n_docs"), 4).as("mean_score"))
      .orderBy(col("bin"))
  }

  /** The Gopher quality-rule gate (Rae et al. 2021, "Scaling Language
    * Models: ... Gopher", Table A1) — the canonical heuristic filter
    * bundle applied before model-based quality scoring: word-count
    * bounds [50, 100k], mean word length in [3, 10] characters,
    * symbol-to-word ratio ('#' or '…'/'...') ≤ 0.1, ≥ 80% of words
    * containing an alphabetic character, and ≥ `minStops` distinct
    * words from a stopword presence set (default: Gopher's 8 — the,
    * be, to, of, and, that, have, with; parameterized because the
    * rule only discriminates when the set intersects the corpus's
    * actual function words — Gopher itself re-tunes per corpus).
    * `keep` is the conjunction.
    *
    * Every rule is evaluated in exact integer arithmetic (cross-
    * multiplied thresholds — e.g. mean-word-length ∈ [3,10] as
    * 3n ≤ Σlen ≤ 10n), so the verdicts replay bit-for-bit in ANSI
    * SQL; the two reported ratios are presentation-only doubles.
    * The symbol count covers '#', the ASCII three-dot '...', AND the
    * real ellipsis character '…' (U+2026) — the r16 ADVICE fix; the
    * DuckDB oracles mirror all three. One narrow codegen pass (the
    * [[graft.functions.TokenStats]] expression — every counter folds
    * in a single whole-stage-codegen scan, no interpreted HOF
    * lambdas), zero shuffles before the caller's aggregation — the
    * cheapest gate in the funnel, which is why it runs first.
    *
    * Returns (idCol, n_words, mean_word_len 4dp, alpha_frac 4dp,
    * n_stop_distinct, n_sym, keep). */
  def gopherGate(df: DataFrame, idCol: String, textCol: String,
      stopWords: Seq[String] = Seq("the", "be", "to", "of", "and",
        "that", "have", "with"), minStops: Int = 2): DataFrame = {
    require(stopWords.nonEmpty && stopWords.forall(_.matches("[a-z]+")),
      s"stop set must be non-empty lowercase words: $stopWords")
    df.select(col(idCol),
        graft.functions.TokenStats(col(textCol), stopWords).as("__ts"))
      .select(col(idCol),
        col("__ts.n_words").as("n_words"),
        col("__ts.chars").as("__chars"),
        col("__ts.alpha").as("__alpha"),
        col("__ts.stop_distinct").as("n_stop_distinct"),
        col("__ts.n_sym").as("n_sym"))
      .select(col(idCol), col("n_words"),
        round(col("__chars").cast("double") /
          col("n_words").cast("double"), 4).as("mean_word_len"),
        round(col("__alpha").cast("double") /
          col("n_words").cast("double"), 4).as("alpha_frac"),
        col("n_stop_distinct"), col("n_sym"),
        (col("n_words") >= 50 && col("n_words") <= 100000 &&
          col("__chars") >= col("n_words") * 3 &&
          col("__chars") <= col("n_words") * 10 &&
          col("__alpha") * 5 >= col("n_words") * 4 &&
          col("n_stop_distinct") >= minStops &&
          col("n_sym") * 10 <= col("n_words")).as("keep"))
  }

  /** Exact ROC-AUC for a scored + labeled frame (e.g.
    * [[perceptronQuality]]'s output) via the rank-sum (Mann–Whitney
    * U) identity with average-rank tie correction — the
    * threshold-free counterpart to [[calibrationReport]]'s
    * reliability table: does the quality classifier ORDER documents
    * correctly, independent of where the gate is cut?
    *
    * All-integer derivation, so the report replays bit-for-bit in
    * ANSI SQL: collapse rows to score grain (t = rows, p = positives
    * per distinct score), take the global prefix count c(score) of
    * strictly-lower-scored rows, and use the doubled average-rank
    * identity — positives in a tie group of size t preceded by c rows
    * contribute p·(2c + t + 1) to twice the positive rank sum. Then
    * u2 = 2·Σranks − n_pos·(n_pos+1) is exactly 2·U and
    * AUC = u2 / (2·n_pos·n_neg) is ONE IEEE double divide.
    *
    * Scale shape: one partial-combined aggregate to score grain (the
    * only data-sized exchange), then the prefix sum runs the
    * two-pass bucket trick over the score-grain table (fixed-width
    * score buckets: per-bucket offsets are a bounded one-task window
    * over the bucket-count table, within-bucket prefixes are
    * partitioned windows — no corpus-sized "No Partition Defined"
    * window at any scale), and the final rollup is a 1-row global
    * aggregate. Labels are ±1 (the perceptron convention).
    *
    * Long-exactness bound: the doubled rank sum is ≤ n_pos·(2n+1),
    * Long-safe to ~1e9 positives in a ~1e9-row evaluation set —
    * far beyond any labeled eval corpus (classifier eval at 100 TB
    * runs on a labeled sample, not the raw corpus; gate the corpus
    * with the trained threshold instead).
    *
    * Input contract: `scoreCol` must already be an INTEGRAL column
    * (the perceptron's dot products, micro-quantized doubles, rank
    * positions, …) — enforced, not silently cast, because truncating
    * fractional scores to long would merge distinct scores into
    * false tie groups and change the AUC with no error (r16 advice).
    * Callers with double scores choose their own quantization
    * (`round(score * 1e6).cast("long")`) explicitly.
    *
    * Returns ONE row (n_pos, n_neg, u2, auc 6dp). */
  def aucReport(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val st = scored.schema(scoreCol).dataType
    require(st == org.apache.spark.sql.types.LongType ||
      st == org.apache.spark.sql.types.IntegerType ||
      st == org.apache.spark.sql.types.ShortType ||
      st == org.apache.spark.sql.types.ByteType,
      s"aucReport: score column '$scoreCol' must be integral (got " +
        s"$st) — quantize doubles explicitly, e.g. " +
        "round(score * 1e6).cast(\"long\"), so tie groups are chosen, " +
        "not an artifact of a silent cast")
    // score-grain frame feeds BOTH the bucket-offset branch and the
    // main prefix join; an eager lineage cut computes the (possibly
    // expensive — e.g. a trained classifier's) upstream exactly once
    // and the checkpointed frame is distinct-score-sized, bounded by
    // the row count and usually far smaller
    val g = scored
      .select(col(scoreCol).cast("long").as("__sc"),
        when(col(labelCol) === 1L, 1L).otherwise(0L).as("__y"))
      .groupBy(col("__sc"))
      .agg(count(lit(1)).as("__t"), sum(col("__y")).as("__p"))
      .withColumn("__b",
        floor(col("__sc").cast("double") / 8192.0).cast("long"))
      .localCheckpoint(eager = true)
    // two-pass global prefix of __t in __sc order (the Ranks.scala
    // discipline): bounded bucket-count table for cross-bucket
    // offsets, partitioned window for within-bucket prefixes
    val within = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__sc"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bcounts = g.groupBy(col("__b")).agg(sum(col("__t")).as("__bt"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("__b"), lit(1))).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bcounts.select(col("__b"),
      coalesce(sum(col("__bt")).over(wOff), lit(0L)).as("__off"))
    g.join(broadcast(offsets), Seq("__b"))
      .withColumn("__c",
        col("__off") + coalesce(sum(col("__t")).over(within), lit(0L)))
      .agg(sum(col("__p")).as("__np"),
        sum(col("__t") - col("__p")).as("__nn"),
        sum(col("__p") * (col("__c") * 2 + col("__t") + 1)).as("__rs2"))
      .select(col("__np").as("n_pos"), col("__nn").as("n_neg"),
        (col("__rs2") - col("__np") * (col("__np") + 1)).as("u2"),
        round((col("__rs2") - col("__np") * (col("__np") + 1))
            .cast("double") /
          (col("__np").cast("double") * col("__nn").cast("double") * 2.0),
          6).as("auc"))
  }

  /** Inter-rater agreement (Cohen 1960's kappa) between two binary
    * raters, per group — the label-QA gate an annotation pipeline
    * needs before training on its labels: raw agreement corrected for
    * the agreement two independent raters with these marginals would
    * reach by chance. Here the "raters" are typically two independent
    * heuristic quality gates; kappa near 0 means the gates encode
    * different signals (keep both), near 1 redundant (drop one).
    *
    * Exact integer derivation per group: po·n² = n·agree and
    * pe·n² = r1⁺·r2⁺ + r1⁻·r2⁻, so
    * kappa = (n·agree − pe·n²) / (n² − pe·n²) — integer numerator
    * and denominator, ONE IEEE double divide, NULL when a group's
    * raters are both constant (pe = 1, kappa undefined). One
    * partial-combined aggregate to group grain over narrow codegen'd
    * rater columns; nothing else.
    *
    * Returns (group, n_docs, n_agree, r1_pos, r2_pos, kappa 6dp). */
  def raterAgreement(df: DataFrame, groupCol: String,
      rater1: Column, rater2: Column): DataFrame = {
    val a = df
      .select(col(groupCol),
        when(rater1, 1L).otherwise(0L).as("__r1"),
        when(rater2, 1L).otherwise(0L).as("__r2"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__r1") === col("__r2"), 1L).otherwise(0L))
          .as("n_agree"),
        sum(col("__r1")).as("r1_pos"), sum(col("__r2")).as("r2_pos"))
    val pe2 = col("r1_pos") * col("r2_pos") +
      (col("n_docs") - col("r1_pos")) * (col("n_docs") - col("r2_pos"))
    val den = col("n_docs") * col("n_docs") - pe2
    a.select(col(groupCol), col("n_docs"), col("n_agree"),
      col("r1_pos"), col("r2_pos"),
      when(den === 0L, lit(null).cast("double"))
        .otherwise(round((col("n_docs") * col("n_agree") - pe2)
          .cast("double") / den.cast("double"), 6)).as("kappa"))
  }

  /** Population Stability Index drift report (the credit-scoring /
    * model-monitoring standard; Siddiqi 2006, "Credit Risk
    * Scorecards" §9): per key, PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)
    * between a reference population (`curCol` false) and a current
    * one (`curCol` true), over `bins` fixed-width buckets of the
    * integer `valueCol` clamped to [lo, hi). The drift gate that
    * closes the monitoring trio: per-event anomalies
    * ([[Resample.rollingAnomalyReport]]), per-column audits
    * ([[Profile.tableProfile]]), and THIS — distribution shift
    * between ingest windows (PSI < 0.1 stable, > 0.25 action).
    *
    * Determinism: bin assignment is pure Long arithmetic
    * (`(x−lo)·bins div (hi−lo)`, clamped — no double division at the
    * boundary), counts are exact, and each bin's PSI term is
    * quantized to integer micros BEFORE the per-key sum (the p40
    * micro-nat discipline), so the report replays bit-for-bit in
    * ANSI SQL. Laplace smoothing (+1 per bin) keeps empty bins
    * finite; both engines compute the identical
    * `(p−q)·ln(p/q)` double from identical integer inputs.
    *
    * Scale shape: one partial-combined (key, side, bin) count — the
    * only event-sized exchange — then everything is
    * |keys|·bins-sized: the bin spine is generated per key
    * (sequence explode, no join against data), totals ride a
    * broadcast-sized key join. Skewed keys cost nothing beyond the
    * first combine.
    *
    * Returns (key, n_ref, n_cur, psi_micro) ordered by key. */
  def psiDrift(df: DataFrame, keyCol: String, valueCol: String,
      curCol: String, bins: Int, lo: Long, hi: Long): DataFrame = {
    require(bins >= 2, s"bins $bins must be >= 2")
    require(hi > lo, s"range [$lo, $hi) must be non-empty")
    val counts = psiBinCounts(df, keyCol, valueCol, curCol, bins, lo, hi)
    psiFromBinCounts(counts, keyCol, bins)
  }

  /** Stage 1 of [[psiDrift]]: per-(key, bin) ref/cur counts — the
    * only event-sized aggregation, and an ADDITIVE one, so it runs
    * unchanged as a streaming Complete-mode aggregate (the q72
    * battery entry) whose sink is bounded at |keys|·bins rows.
    * Bin assignment is Long-exact `div`, clamped — no double
    * division at any bucket boundary.
    * Returns (keyCol, bin, n_cur, n_ref). */
  def psiBinCounts(df: DataFrame, keyCol: String, valueCol: String,
      curCol: String, bins: Int, lo: Long, hi: Long): DataFrame = {
    require(bins >= 2, s"bins $bins must be >= 2")
    require(hi > lo, s"range [$lo, $hi) must be non-empty")
    df.select(col(keyCol).as("__k"), col(curCol).as("__cur"),
        col(valueCol).cast("long").as("__x"))
      .select(col("__k"), col("__cur"),
        least(lit((bins - 1).toLong), greatest(lit(0L),
          expr(s"(__x - $lo) * $bins div ${hi - lo}"))).as("__b"))
      .groupBy(col("__k"), col("__b"))
      .agg(sum(when(col("__cur"), 1L).otherwise(0L)).as("__nc"),
        sum(when(col("__cur"), 0L).otherwise(1L)).as("__nr"))
      .select(col("__k").as(keyCol), col("__b").as("bin"),
        col("__nc").as("n_cur"), col("__nr").as("n_rf"))
  }

  /** Stage 2 of [[psiDrift]]: the PSI report from (key, bin, n_cur,
    * n_rf) counts as produced by [[psiBinCounts]] — batch or drained
    * from a streaming sink; PSI is a pure function of the counts, so
    * stream == batch exactly. */
  def psiFromBinCounts(countsIn: DataFrame, keyCol: String,
      bins: Int): DataFrame = {
    val counts = countsIn.select(col(keyCol).as("__k"),
      col("bin").as("__b"), col("n_cur").as("__nc"),
      col("n_rf").as("__nr"))
    val spine = counts.select(col("__k")).distinct()
      .select(col("__k"),
        explode(sequence(lit(0L), lit((bins - 1).toLong))).as("__b"))
    val full = spine.join(counts, Seq("__k", "__b"), "left")
      .select(col("__k"), col("__b"),
        coalesce(col("__nc"), lit(0L)).as("__nc"),
        coalesce(col("__nr"), lit(0L)).as("__nr"))
    val totals = full.groupBy(col("__k"))
      .agg(sum(col("__nr")).as("__tr"), sum(col("__nc")).as("__tc"))
    full.join(totals, Seq("__k"))
      .select(col("__k"), col("__nr"), col("__nc"),
        expr(s"""CAST(ROUND(1e6 * (
          |  (CAST(__nr + 1 AS DOUBLE) / (__tr + $bins) -
          |   CAST(__nc + 1 AS DOUBLE) / (__tc + $bins)) *
          |  LN((CAST(__nr + 1 AS DOUBLE) / (__tr + $bins)) /
          |     (CAST(__nc + 1 AS DOUBLE) / (__tc + $bins)))
          |)) AS BIGINT)""".stripMargin).as("__t"))
      .groupBy(col("__k"))
      .agg(sum(col("__nr")).as("n_ref"), sum(col("__nc")).as("n_cur"),
        sum(col("__t")).as("psi_micro"))
      .withColumnRenamed("__k", keyCol)
      .orderBy(col(keyCol))
  }

  /** k-anonymity audit (Sweeney 2002, "k-anonymity: a model for
    * protecting privacy") over a frame of quasi-identifier columns:
    * a record is k-anonymous when at least k−1 OTHER records share
    * its full quasi-identifier tuple, so any group smaller than k is
    * re-identifiable. The release gate a privacy review runs AFTER
    * content scrubbing ([[piiScrub]]-style) — scrubbed text can
    * still leak identity through its metadata combination.
    *
    * Reported per value of `byCol` (one QI column chosen as the
    * report axis): group count, groups below k, rows at risk, and
    * rows-at-risk in parts-per-million of the partition (integer
    * micro — exact, replayable). Callers pre-bucket continuous
    * columns (raw lengths/timestamps make every row its own group).
    *
    * Scale shape: one partial-combined count over the QI tuple, one
    * |groups|-sized rollup — no row-level data ever re-shuffles
    * after the first combine. */
  def kAnonymityReport(df: DataFrame, quasiCols: Seq[String], k: Int,
      byCol: String): DataFrame = {
    require(k >= 2, s"k $k must be >= 2")
    require(quasiCols.contains(byCol),
      s"report axis $byCol must be one of the quasi-identifier columns")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    groups.groupBy(col(byCol))
      .agg(count(lit(1)).as("n_groups"),
        sum((col("__n") < k).cast("long")).as("n_small_groups"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L))
          .as("n_rows_at_risk"),
        sum(col("__n")).as("n_rows"))
      .select(col(byCol), col("n_groups"), col("n_small_groups"),
        col("n_rows_at_risk"),
        expr("CAST(ROUND(1e6 * n_rows_at_risk / n_rows) AS BIGINT)")
          .as("risk_ppm"))
      .orderBy(col(byCol))
  }

  /** Behavioral-trace → next-event training examples: gap-sessionize
    * an ordered event stream per key, render each session as (input =
    * the session's events minus the last, space-joined; target = the
    * last event) — the assembly step that turns logs into
    * next-action-prediction SFT rows (the sequential-recommendation
    * data shape: SASRec, Kang & McAuley 2018). `maxContext` keeps
    * only the LAST that-many events of the input — context-window
    * truncation from the recent end, the side a causal model actually
    * conditions on. Single-event sessions have no target and drop.
    *
    * Determinism: events order by (`tsCol`, `tieCol`) — a total order
    * the oracle replays; the rendered token string comes from the
    * caller (`tokCol`, pre-rendered), so every string this emits is
    * engine-independent.
    *
    * Scale shape: one per-key window (lag + running sum — partitions
    * bounded by a key's own history) assigns session indexes, then
    * ONE (key, session) aggregate collects each session's
    * (ts, tie, tok) structs — bounded by the session gap by
    * construction (a human-scale burst, never the corpus). Sorting,
    * prefix/suffix split, truncation and joining are all narrow
    * array ops inside codegen after the aggregate. Two data-sized
    * exchanges total; nothing collects driver-side.
    *
    * Returns (key, session_idx 1.., n_events, n_context, input,
    * target). */
  def sessionExamples(df: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, tokCol: String, gapMs: Long,
      maxContext: Int): DataFrame = {
    require(gapMs >= 1, s"gapMs $gapMs must be >= 1")
    require(maxContext >= 1, s"maxContext $maxContext must be >= 1")
    // µs-exact ordering: events.parquet carries µs timestamps, and a
    // string assembly (unlike a count) diverges if two same-ms events
    // swap — so the order key is unix_micros + the caller's tie
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("__us"), col(tieCol))
    val sess = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__prev", lag(col("__us"), 1).over(w))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__us") - col("__prev") > gapMs * 1000L, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
    sess.groupBy(col(keyCol), col("session_idx"))
      .agg(sort_array(collect_list(
        struct(col("__us"), col(tieCol).as("__tie"),
          col(tokCol).cast("string").as("__tok")))).as("__evs"))
      .filter(size(col("__evs")) >= 2)
      .select(col(keyCol), col("session_idx"),
        size(col("__evs")).cast("long").as("n_events"),
        expr(s"""slice(transform(slice(__evs, 1, size(__evs) - 1),
          |  e -> e.__tok),
          |  greatest(1, size(__evs) - 1 - ${maxContext} + 1),
          |  ${maxContext})""".stripMargin).as("__ctx"),
        expr("element_at(__evs, -1).__tok").as("target"))
      .select(col(keyCol), col("session_idx"), col("n_events"),
        size(col("__ctx")).cast("long").as("n_context"),
        array_join(col("__ctx"), " ").as("input"), col("target"))
  }

  /** Preference-pair construction (the DPO / RLHF reward-model data
    * shape, Rafailov et al. 2023): per key, pair the best-scored
    * candidate ("chosen") with the worst-scored one ("rejected"),
    * keeping only keys with at least two candidates and a score
    * margin of at least `minMargin` — pairs with no real preference
    * signal teach nothing. Scores must be integral (compare exactly);
    * ties break on `tieCol` (max side takes the larger tie, min side
    * the smaller — both total orders the oracle replays).
    *
    * Scale shape: ONE partial-aggregable groupBy — `max_by`/`min_by`
    * over a (score, tie) struct are declarative aggregates, so each
    * map task reduces its rows to one candidate pair per key before
    * the single hash exchange; state per key is two structs, never
    * the candidate list. No windows, no self-joins.
    *
    * Returns (key, chosen, rejected, chosen_score, rejected_score,
    * margin, n_candidates). */
  def preferencePairs(df: DataFrame, keyCol: String, itemCol: String,
      scoreCol: String, tieCol: String, minMargin: Long): DataFrame = {
    require(minMargin >= 1, s"minMargin $minMargin must be >= 1")
    df.groupBy(col(keyCol))
      .agg(
        // itemCol is the final ordering component: with it, the pick
        // is a total order even when (score, tie) collides, so output
        // never depends on partition/arrival order
        max_by(struct(col(itemCol).as("item"),
            col(scoreCol).cast("long").as("score")),
          struct(col(scoreCol).cast("long"), col(tieCol),
            col(itemCol))).as("__c"),
        min_by(struct(col(itemCol).as("item"),
            col(scoreCol).cast("long").as("score")),
          struct(col(scoreCol).cast("long"), col(tieCol),
            col(itemCol))).as("__r"),
        count(lit(1)).as("n_candidates"))
      .filter(col("n_candidates") >= 2 &&
        col("__c.score") - col("__r.score") >= minMargin)
      .select(col(keyCol), col("__c.item").as("chosen"),
        col("__r.item").as("rejected"),
        col("__c.score").as("chosen_score"),
        col("__r.score").as("rejected_score"),
        (col("__c.score") - col("__r.score")).as("margin"),
        col("n_candidates"))
  }

  /** Token-budget corpus selection: order the corpus by a quality
    * score (descending, `idCol` tie-break) and keep the prefix whose
    * cumulative `weight` stays within `budgetPpm` parts-per-million
    * of the corpus-total weight — "spend 40% of the token budget on
    * the highest-quality documents", the data-selection step before
    * a training run (quality-pruning as in Gopher / FineWeb-style
    * curation). All arithmetic is integral: the gate is
    * `cum*1e6 <= total*budgetPpm`, exact in any engine.
    *
    * Scale shape: the global quality-ordered running sum is
    * [[Ranks.withGlobalRunningSum]]'s two-pass — one hash shuffle on
    * the caller's score-derived `bucket` (monotone in descending
    * score; its width is the parallelism knob), a bucket-count
    * prefix table of fixed size, zero whole-corpus windows. A naive
    * `Window.orderBy(score)` here would drag 100 TB through one
    * task — the trap this operator exists to avoid.
    *
    * Returns the selected rows (id, qscore, weight, sel_rank,
    * cum_weight, total_weight). */
  def budgetSelect(df: DataFrame, idCol: String, score: Column,
      weight: Column, bucket: Column, budgetPpm: Long): DataFrame = {
    require(budgetPpm >= 1 && budgetPpm <= 1000000L,
      s"budgetPpm $budgetPpm must be in [1, 1e6]")
    val scored = df.select(col(idCol), score.cast("long").as("qscore"),
      weight.cast("long").as("weight"))
    Ranks.withGlobalRunningSum(scored, bucket,
        Seq(col("qscore").desc, col(idCol)), col("weight"),
        rankCol = "sel_rank", cumCol = "cum_weight",
        totalCol = "total_weight")
      // decimal(38,0) gate: cum*1e6 overflows Long once corpus-total
      // weight passes ~9.2e12 tokens (real at 100 TB); DuckDB computes
      // this product in int128, so the decimal cast is also what keeps
      // the two engines' inclusive boundary identical at that scale.
      .filter(col("cum_weight").cast("decimal(38,0)") * lit(1000000L) <=
        col("total_weight").cast("decimal(38,0)") * lit(budgetPpm))
      .select(col(idCol), col("qscore"), col("weight"),
        col("sel_rank").cast("long").as("sel_rank"),
        col("cum_weight"), col("total_weight"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): mask a
    * deterministic ~`noisePpm` fraction of token positions, collapse
    * each contiguous masked run into one sentinel, and emit
    * (input = text with spans replaced by `<extra_id_k>`,
    * target = each sentinel followed by its span's tokens) — the
    * denoising-pretraining example assembly step. The mask is a pure
    * function of (id, position): a per-document portable-hash seed
    * mixed per position by a Carter-Wegman step — the same document
    * corrupts identically on any partitioning, any engine, any
    * rerun. Reproducible pretraining data, not RNG.
    *
    * Scale shape: ZERO shuffles — the whole example assembles inside
    * whole-stage codegen, one tight loop per row
    * ([[graft.functions.SpanCorrupt]]). Two slower formulations are
    * measured in that expression's scaladoc: explode + per-document
    * window (two token-row exchanges) and array HOFs (interpreted
    * per element); the codegen expression is the (b)-tier answer —
    * a 100 TB corpus corrupts at scan speed.
    *
    * Returns (id, n_spans, n_tokens, input, target). */
  def spanCorruption(df: DataFrame, idCol: String, textCol: String,
      noisePpm: Long): DataFrame = {
    require(noisePpm >= 1 && noisePpm < 1000000L,
      s"noisePpm $noisePpm must be in [1, 1e6)")
    // per-document seed via the portable hash — OUTSIDE the
    // expression, so the oracle replays mask decisions end to end
    val seed = pmod(TextAnalysis.portableHash60(
      col(idCol).cast("string")), lit(2147483647L))
    df.withColumn("__r",
        graft.functions.SpanCorrupt(col(textCol), seed, noisePpm))
      .select(col(idCol), col("__r.n_spans").as("n_spans"),
        col("__r.n_tokens").as("n_tokens"),
        col("__r.input").as("input"), col("__r.target").as("target"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022 — the
    * infilling-pretraining data shape; PSM rendering as in
    * StarCoder): cut each document at two deterministic token
    * positions and render `<fim_prefix> P <fim_suffix> S
    * <fim_middle> M` — suffix shown before middle so a causal model
    * learns to infill. Cut positions are Carter-Wegman mixes of the
    * portable per-document seed (the p107 mask arithmetic at two
    * fixed positions), so the transform is reproducible on any
    * partitioning and replayable by an ANSI engine.
    *
    * Scale shape: zero shuffles, zero per-element lambdas — two
    * integer mixes per row and three array slices inside codegen.
    *
    * Returns (id, n_tokens, cut_lo, cut_hi, fim). */
  def fimTransform(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val P = 2147483647L
    def mix(seed: Column, pos: Int): Column =
      pmod(lit(1103515245L) *
        pmod(seed + lit(pos.toLong) * lit(1013904223L), lit(P)) +
        lit(12345L), lit(P))
    val base = df.select(col(idCol), Dedup.tokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")).cast("long"))
      .withColumn("__seed", pmod(TextAnalysis.portableHash60(
        col(idCol).cast("string")), lit(P)))
      .withColumn("__a", pmod(mix(col("__seed"), 1), col("__n") + 1))
      .withColumn("__b", pmod(mix(col("__seed"), 2), col("__n") + 1))
      .withColumn("__lo", least(col("__a"), col("__b")))
      .withColumn("__hi", greatest(col("__a"), col("__b")))
    def joinSlice(start: Column, len: Column): Column =
      array_join(slice(col("__tk"), start.cast("int"), len.cast("int")),
        " ")
    base.select(col(idCol), col("__n").as("n_tokens"),
      col("__lo").as("cut_lo"), col("__hi").as("cut_hi"),
      concat(lit("<fim_prefix> "), joinSlice(lit(1), col("__lo")),
        lit(" <fim_suffix> "),
        joinSlice(col("__hi") + 1, col("__n") - col("__hi")),
        lit(" <fim_middle> "),
        joinSlice(col("__lo") + 1, col("__hi") - col("__lo")))
        .as("fim"))
  }

  /** Length-bucketed training-batch assembly: group sequences into
    * power-of-two length buckets (bucket = bit-length of the token
    * count — `length(bin(n))`, exact in integer space), order each
    * bucket by (length, id), cut batches of `batchSize`, and report
    * per-batch padding waste (`n_seqs·max_len − sum_len` — the tokens
    * a fixed-shape batch pads away). Length-bucketed batching is the
    * standard dynamic-batching trick for sequence-model training;
    * this is its planning/audit step.
    *
    * Scale shape: the within-bucket ordinal is NOT a per-bucket
    * window (a handful of buckets would serialize the corpus through
    * a handful of tasks) — it is the two-pass trick at (bucket, len)
    * grain: a partitioned window over (bucket, len) groups, plus a
    * (bucket, len)-count prefix table (rows ≤ distinct lengths,
    * bounded by max sequence length, never the corpus) broadcast
    * back. One data-sized hash exchange + one batch-sized aggregate.
    *
    * Returns (len_bucket, batch_idx 0.., n_seqs, max_len, sum_len,
    * pad_tokens) ordered by nothing — callers sort. */
  def lengthBucketBatches(df: DataFrame, idCol: String, len: Column,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize $batchSize must be >= 1")
    val base = df.select(col(idCol), len.cast("long").as("__len"))
      .filter(col("__len") >= 1)
      .withColumn("__bkt", length(bin(col("__len"))).cast("int"))
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt"), col("__len")).orderBy(col(idCol))
    val local = base.withColumn("__lr", row_number().over(wLoc))
    val counts = base.groupBy(col("__bkt"), col("__len"))
      .agg(count(lit(1)).as("__c"))
    val wOff = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bkt")).orderBy(col("__len"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offsets = counts.select(col("__bkt"), col("__len"),
      coalesce(sum(col("__c")).over(wOff), lit(0L)).as("__off"))
    local.join(broadcast(offsets), Seq("__bkt", "__len"))
      .withColumn("__rn", col("__off") + col("__lr"))
      .withColumn("batch_idx",
        expr(s"CAST((__rn - 1) DIV ${batchSize}L AS BIGINT)"))
      .groupBy(col("__bkt").as("len_bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n_seqs"), max(col("__len")).as("max_len"),
        sum(col("__len")).as("sum_len"))
      .withColumn("pad_tokens",
        col("n_seqs") * col("max_len") - col("sum_len"))
  }

  /** Wilson-score lower confidence bound on a per-group pass rate —
    * the small-sample-honest quality gate: ranking sources by raw
    * pass rate lets a 3-document source with 3 passes outrank a
    * 10k-document source at 99%, while the Wilson lower bound
    * (Wilson 1927; the standard fix, e.g. how review-score ranking
    * is done) shrinks toward 0 exactly when n is small. Gate sources
    * on `wilson_lb >= threshold` instead of `pass_rate`.
    *
    * Cross-engine determinism: the bound is computed in IEEE-754
    * doubles with `+ - * /` and `sqrt` only — every one of those is
    * correctly rounded by both engines, and the expression tree here
    * is written in exactly the oracle's shape, so the doubles match
    * bit-for-bit before the final `round(…, 4)`.
    *
    * Scale shape: one partial-combined count aggregate; everything
    * after is per-group arithmetic.
    *
    * Returns (groupCol, n_docs, n_pass, pass_rate 4dp,
    * wilson_lb 4dp). */
  def wilsonLowerBound(df: DataFrame, groupCol: String, pass: Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"z $z must be > 0")
    val ag = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(pass, 1L).otherwise(0L)).as("n_pass"))
    val nn = col("n_docs").cast("double")
    val p = col("n_pass").cast("double") / nn
    val z2 = lit(z) * lit(z)
    ag.select(col(groupCol), col("n_docs"), col("n_pass"),
      round(p, 4).as("pass_rate"),
      round((p + z2 / (lit(2.0) * nn) - lit(z) *
          sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nn)) / nn)) /
        (lit(1.0) + z2 / nn), 4).as("wilson_lb"))
  }
}
