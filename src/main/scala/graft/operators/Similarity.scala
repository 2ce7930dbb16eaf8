package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the
  * random-hyperplane LSH variant is the scale path: bucket the
  * vectors once (a narrow shuffle key), then search only inside the
  * query's bucket — candidate count per query is |bucket|, not |n|.
  *
  * Every variant merges with [[TopK.perKey]] — a bounded typed
  * Aggregator whose map-side partial pass reduces each scan partition
  * to a ≤k-element heap per query BEFORE any shuffle. The earlier
  * `Window.partitionBy(q_id)` merge funneled the whole scored corpus
  * into ≤|queries| tasks; the aggregate shape ships only
  * O(partitions × queries × k) rows.
  */
object Similarity {

  /** (A, B, p) for the LCG-derived LSH hyperplane components —
    * shared with the DuckDB oracle SQL. */
  val PlaneParams: (Long, Long, Long) = (2654435761L, 40503L, 1000000007L)

  /** Dot product of two double-array columns named `a` and `b` —
    * higher-order functions only, left-to-right accumulation (same
    * order DuckDB's list_dot_product uses, so oracles can match). */
  def dotExpr(a: String, b: String): Column =
    expr(s"""aggregate(zip_with($a, $b, (x, y) -> x * y),
            |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin)

  /** Cast a float vector to double once, up front: float math is not
    * reproducible across engines, double is. Codegen expression
    * ([[graft.functions.VecAsDouble]]): the `transform(v, cast)` HOF
    * ran an interpreted lambda per element on every corpus vector. */
  def asDouble(v: Column): Column = graft.functions.VecAsDouble(v)

  /** Cosine similarity between two double-vector columns — a custom
    * codegen Catalyst expression (graft.functions.CosineSim), one
    * static call over the raw array buffers per pair. Bit-identical
    * to the HOF formulation (same left-to-right accumulation), ~5×
    * faster in the pair-scoring hot path. */
  def cosineExpr(a: String, b: String): Column =
    graft.functions.CosineSim(col(a), col(b))

  /** L2-normalize a double vector column name. Normalizing once at
    * load turns every cosine into a plain dot product — at 100 TB
    * that halves the flops and removes the per-pair norm recompute.
    * Codegen expression ([[graft.functions.L2Normalize]]): the HOF
    * spelling re-ran the interpreted sum-of-squares fold once per
    * ELEMENT; same left-to-right accumulation, bit-identical. */
  def normalizeExpr(v: String): Column =
    graft.functions.L2Normalize(col(v))

  /** Spread an under-partitioned corpus frame to the session's
    * default parallelism. A 100-TB scan arrives with thousands of
    * partitions and this is a no-op; a small benchmark file arrives
    * as ONE partition, which would otherwise serialize the entire
    * downstream scoring stage (measured: the sf10 ADC scan ran a
    * single task at 1/32 of the machine). The narrow corpus
    * projection this guards is cheap to shuffle; the scored pair
    * space never is — which is why the fix sits HERE, not after the
    * join. */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** Brute-force top-k cosine neighbors for each query vector.
    * Queries are broadcast (they are few); the corpus is scanned
    * once. Each scan partition reduces to k rows per query map-side
    * (TopK partial aggregation), so the single shuffle carries heaps,
    * not the scored corpus — the plan a 1000-executor scan of 100 TB
    * wants. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nv")))
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosineExpr("qv", "nv").as("score"))
    TopK.perKey(scored, Seq("q_id"), "neighbor_id", "score", k)
  }

  /** Random-hyperplane LSH bucket id (`numBits` sign bits). Plane
    * components are a linear-congruential sequence
    * ((A·(j·dims+d+1)+B) mod p)/p − 0.5 — deterministic, no
    * driver-side randomness, identical on every executor, and plain
    * modular arithmetic, so an ANSI-SQL oracle can recompute every
    * bucket exactly (same left-to-right fold as DuckDB list_reduce). */
  def lshBucketExpr(vecCol: String, numBits: Int, dims: Int): Column = {
    val (pA, pB, pP) = Similarity.PlaneParams
    // codegen expression ([[graft.functions.HyperplaneBucket]]): the
    // HOF spelling ran numBits × dims interpreted multiply-adds per
    // corpus row. Same LCG plane components, same per-bit
    // left-to-right fold and >= 0 sign rule — bucket ids bit-identical
    graft.functions.HyperplaneBucket(col(vecCol), numBits, dims,
      pA, pB, pP)
  }

  /** IVF (inverted-file) ANN: coarse-quantize the corpus into
    * `nlist` cells around deterministically-sampled centroid vectors
    * (md5-order sample — no driver-side randomness, and expressible
    * in any SQL engine, so the DuckDB oracle can replay it), then
    * search only each query's `nprobe` nearest cells. The cell id is
    * the shuffle key; candidate count per query is nprobe·(n/nlist)
    * instead of n. Centroids are tiny and broadcast; cell assignment
    * is itself a TopK partial aggregate, so the corpus never shuffles
    * ×nlist. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nv")))
    // deterministic pseudo-random sample of nlist centroids
    val cents = broadcast(
      c.orderBy(md5(col("neighbor_id").cast("string")), col("neighbor_id"))
        .limit(nlist)
        .select(col("neighbor_id").as("cell"), col("nv").as("cv")))
    // nearest `keep` cells per vector: score all nlist centroids in
    // the map pass, keep a bounded heap — one shuffle of heaps per id,
    // never id×nlist rows
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val scored = df.crossJoin(cents)
        .select(col(id), col(vec), col("cell"),
          cosineExpr(vec, "cv").as("cell_score"))
        .groupBy(col(id))
        .agg(first(col(vec)).as(vec),
          TopK.topK(keep)(col("cell"), col("cell_score")).as("__cells"))
      scored.select(col(id), col(vec),
          explode(col("__cells.id")).as("cell"))
    }
    val corpusCells = assign(c, "neighbor_id", "nv", 1)
    val q = queries.select(col(idCol).as("q_id"), asDouble(col(vecCol)).as("qv"))
    val queryCells = assign(q, "q_id", "qv", nprobe)
    val scored = corpusCells.join(broadcast(queryCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosineExpr("qv", "nv").as("score"))
    TopK.perKey(scored, Seq("q_id"), "neighbor_id", "score", k)
  }

  /** Reproducible Lloyd k-means over an embedding column.
    *
    * MLlib's KMeans is seed- and partitioning-dependent; this variant
    * is bit-reproducible on any engine or cluster layout: centroids
    * initialize from the md5-order sample (the IVF trick — the cell
    * id IS the sampled vector's id, no ranking needed), assignment is
    * the bounded TopK(1) argmax with a (cosine desc, cell asc) tie
    * rule, and each update accumulates per-dimension sums as
    * integer-micro quanta — integer addition commutes, so the new
    * centroid is independent of partitioning and exactly replayable
    * in ANSI SQL (the p30 oracle recomputes every iteration).
    *
    * Scale shape per iteration: centroids broadcast (k vectors), one
    * corpus pass scores all k cells map-side into 1-element heaps, and
    * the update is a (cell, dim) partial-aggregated shuffle — k·dims
    * result rows. Nothing grows with corpus size except the scans. */
  /** The Lloyd loop of [[kmeansAssign]], returning the FINAL
    * assignment with the winning cosine kept: (idCol, v, cell, __s).
    * Shared by [[kmeansAssign]] (which drops the score) and
    * [[clusterQuality]] (which aggregates it). */
  private def kmeansScored(corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, iters: Int): DataFrame = {
    // eager localCheckpoint, not persist: the Lloyd rounds AND the
    // returned lazy assignment all read this frame, so a persist
    // could never be unpersisted — checkpoint blocks free on GC with
    // no cache-manager entry (r16 verdict item 3)
    val e = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .localCheckpoint(eager = true)
    def assignTo(cents: DataFrame): DataFrame = {
      val scored = e.crossJoin(broadcast(cents))
        .select(col(idCol), col("v"), col("cell"),
          cosineExpr("v", "cv").as("s"))
        .groupBy(col(idCol))
        .agg(first(col("v")).as("v"),
          TopK.topK(1)(col("cell"), col("s")).as("__c"))
      scored.select(col(idCol), col("v"), col("__c")(0)("id").as("cell"),
        col("__c")(0)("score").as("__s"))
    }
    var cents = e
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(k).select(col(idCol).as("cell"), col("v").as("cv"))
    for (_ <- 1 until iters) {
      val dims = assignTo(cents)
        .select(col("cell"), posexplode(col("v")).as(Seq("d", "x")))
        .groupBy(col("cell"), col("d"))
        .agg(sum(round(col("x") * 1000000, 0).cast("long")).as("sx"),
          count(lit(1)).as("n"))
      cents = dims.groupBy(col("cell"))
        .agg(sort_array(collect_list(struct(col("d"),
          (col("sx").cast("double") / col("n") / 1000000.0).as("m"))))
          .as("dm"))
        .select(col("cell"), expr("transform(dm, p -> p.m)").as("cv"))
    }
    assignTo(cents)
  }

  def kmeansAssign(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2): DataFrame = {
    // localCheckpoint, not persist — both the sizes aggregate and the
    // returned lazy join read it (see kmeansScored's cache note)
    val fin = kmeansScored(corpus, idCol, vecCol, k, iters)
      .select(col(idCol), col("cell"))
      .localCheckpoint(eager = true)
    val sizes = fin.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
    fin.join(broadcast(sizes), Seq("cell"))
      .select(col(idCol), col("cell"), col("n_members"))
  }

  /** Per-cluster cohesion report for [[kmeansAssign]]'s clustering —
    * the "is this clustering any good" gate run before committing a
    * corpus to cluster-dependent downstream work (SemDeDup pruning,
    * IVF cell sizing, stratified curricula). For every cluster:
    * member count and the mean cosine of members to THEIR assigned
    * centroid (the cosine analogue of per-cluster inertia; higher =
    * tighter). Cosines micro-quantize to integers before the mean so
    * the aggregation is order-independent and the one final divide is
    * exactly replayable.
    *
    * Scale shape: [[kmeansScored]]'s per-iteration broadcast scans
    * plus ONE k-row partial-combined aggregate — nothing new moves.
    *
    * Returns (cell, n_members, mean_cos 4dp) ordered by cell. */
  def clusterQuality(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2): DataFrame =
    kmeansScored(corpus, idCol, vecCol, k, iters)
      .select(col("cell"), round(col("__s") * 1000000, 0).cast("long")
        .as("__cm"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_members"), sum(col("__cm")).as("__scm"))
      .select(col("cell"), col("n_members"),
        round(col("__scm").cast("double") / col("n_members") / 1000000.0, 4)
          .as("mean_cos"))

  /** Semantic deduplication (SemDeDup — Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embedding corpus with
    * [[kmeansAssign]], then mark as duplicates the vectors whose
    * cosine similarity to an earlier-id vector IN THE SAME CLUSTER
    * meets `tau`. Clustering is what makes the pairwise step
    * tractable: candidate pairs are in-cluster only, so the join is a
    * hash shuffle on the cell id and the pair count is Σ|cell|², not
    * n² — `k` is the scale knob (the paper runs k ≈ n/⟨cluster⟩ at
    * web scale; skewed cells AQE-split like any hot hash key).
    *
    * Keep rule: within a cluster the smallest vec_id of a near-dup
    * pair survives ("keep first" — deterministic, engine-independent).
    * Output: (id, cell, is_kept), one row per corpus vector.
    *
    * Determinism + oracle: assignment is the bit-replayable
    * [[kmeansAssign]] (md5-order init, integer-micro centroid means),
    * and each pair score is the same left-to-right double cosine the
    * DuckDB oracle computes — the p41 oracle replays both Lloyd
    * iterations AND the in-cluster pair scan exactly. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 2, tau: Double = 0.99): DataFrame = {
    val asg = kmeansAssign(corpus, idCol, vecCol, k, iters)
      .select(col(idCol), col("cell"))
    val e = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
    // localCheckpoint, not persist — read by both self-join sides and
    // the returned lazy tagging join (see kmeansScored's cache note)
    val withV = asg.join(e, Seq(idCol))
      .localCheckpoint(eager = true)
    val lhs = withV.select(col("cell"), col(idCol).as("a_id"),
      col("v").as("av"))
    val rhs = withV.select(col("cell"), col(idCol).as("b_id"),
      col("v").as("bv"))
    val removed = lhs.join(rhs, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .filter(cosineExpr("av", "bv") >= tau)
      .select(col("b_id").as(idCol)).distinct()
    withV.join(removed.withColumn("__dup", lit(1)), Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("__dup").isNull.as("is_kept"))
  }

  /** PQ (product-quantization) ANN — the memory-compressed scale path
    * (Jégou et al., "Product Quantization for Nearest Neighbor
    * Search", TPAMI 2011). Vectors L2-normalize, split into `m`
    * subspaces, and each subvector quantizes to the nearest of
    * `codes` codebook entries, so the search-time corpus is m small
    * codes per vector — at the defaults (m=8, 16 codes, 64-dim
    * float) that is 8 bytes instead of 256, a 32× compression that
    * decides whether a 100-TB embedding corpus fits an ANN tier at
    * all. Queries never touch raw corpus vectors: each query
    * precomputes an m×codes lookup table of subspace distances and
    * ADC (asymmetric-distance) scoring sums m table lookups per
    * candidate.
    *
    * Determinism + oracle: the codebook is the md5-order sample's
    * subvectors (the IVF/k-means sampling trick — no RNG anywhere),
    * code assignment tie-breaks on the first minimal entry
    * (array_position of the min), and every fold is the same
    * left-to-right double accumulation the DuckDB oracle replays —
    * codebook, codes, LUTs and the final ADC ranking are all
    * bit-reproducible (p36).
    *
    * Scale shape: the codebook collect is bounded by codes·dims (16
    * vectors — a broadcast-sized constant, NOT a corpus action);
    * encoding is one narrow pass, no shuffle; the ADC scan broadcasts
    * queries+LUTs and merges with bounded [[TopK]] heaps, so the one
    * shuffle carries O(partitions × queries × k) heap rows. Recall
    * vs [[bruteForceTopK]] is measured in the spec. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, codes: Int = 16,
      dims: Int = 64): DataFrame = {
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val sub = dims / m
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("v0")))
      .withColumn("nv", normalizeExpr("v0")).drop("v0")
    // deterministic codebook: subvectors of the md5-order sample.
    // driver-side collect of `codes` vectors — bounded by codes·dims,
    // the same budget a broadcast would use
    val sample: Seq[Seq[Double]] = c
      .orderBy(md5(col("neighbor_id").cast("string")), col("neighbor_id"))
      .limit(codes).select(col("nv")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val cbT: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => sample.map(_.slice(mi * sub, (mi + 1) * sub)))
    val cbCol = typedLit(cbT)
    // per-subspace squared distances of a vector column to every
    // codebook entry: m × codes doubles, left-to-right accumulation
    def subDists(vecName: String): Column = expr(
      s"""transform(sequence(0, ${m - 1}), mi ->
         |  transform(sequence(1, $codes), j ->
         |    aggregate(sequence(1, $sub), CAST(0 AS DOUBLE), (acc, dd) ->
         |      acc +
         |      (element_at($vecName, mi * $sub + dd) -
         |       element_at(element_at(element_at(__cb, mi + 1), j), dd)) *
         |      (element_at($vecName, mi * $sub + dd) -
         |       element_at(element_at(element_at(__cb, mi + 1), j), dd)))))"""
        .stripMargin)
    // compressed corpus: id + m codebook indices (1-based), vectors
    // dropped — this is the artifact that scales. Encoding and ADC
    // are custom codegen expressions (functions.PqEncode / PqAdc):
    // the HOF formulation walks an m×codes distance matrix through
    // interpreted lambdas PER ROW, which is the corpus-side hot path;
    // the expressions are bit-identical (same folds, same
    // first-minimum argmin) and stay inside whole-stage codegen. The
    // HOF subDists stays for the per-QUERY LUTs, where row count is
    // the query count.
    val enc = c.withColumn("__cb", cbCol)
      .select(col("neighbor_id"),
        graft.functions.PqEncode(col("nv"), col("__cb")).as("code"))
    val q = queries.select(col(idCol).as("q_id"),
        asDouble(col(vecCol)).as("v0"))
      .withColumn("qv", normalizeExpr("v0")).drop("v0")
      .withColumn("__cb", cbCol)
      .select(col("q_id"), subDists("qv").as("__lut"))
    val scored = enc.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (-graft.functions.PqAdc(col("__lut"), col("code"))).as("score"))
    TopK.perKey(scored, Seq("q_id"), "neighbor_id", "score", k)
  }

  /** PQ shortlist + exact rerank — the production ANN query path:
    * [[pqTopK]] scans the 32×-compressed code table for each query's
    * `shortlist` ADC candidates, then ONLY those candidates load
    * their raw vectors for exact cosine scoring and the final top-k.
    * Exact-quality ranking with corpus-scan work bounded by the code
    * table and exact-scoring work bounded by queries × shortlist:
    * the candidate set broadcasts, so the rerank is one more narrow
    * corpus scan with zero shuffle, then a bounded [[TopK]] merge.
    * Final recall = the shortlist's recall (measured in the spec);
    * deterministic end to end, oracle-replayed by p37. */
  def pqRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int = 100, m: Int = 8,
      codes: Int = 64, dims: Int = 64): DataFrame = {
    val cand = pqTopK(corpus, queries, idCol, vecCol, shortlist,
      m, codes, dims).select(col("q_id"), col("neighbor_id"))
    val cn = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nv"))
    val qn = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv"))
    val scored = cn.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qn), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosineExpr("qv", "nv").as("score"))
    TopK.perKey(scored, Seq("q_id"), "neighbor_id", "score", k)
  }

  /** IVF coarse pruning composed with PQ compressed scoring and an
    * exact rerank — the full production ANN tier (IVFADC, Jégou et
    * al. TPAMI 2011 §IV): a coarse quantizer of `nlist` centroids
    * prunes the corpus to each query's `nprobe` nearest cells, the
    * ADC scan reads only those cells' m-byte codes, and only the
    * `shortlist` ADC survivors load raw vectors for exact cosine.
    * Corpus-side work per query drops from O(corpus) (flat
    * [[pqTopK]]) to O(corpus·nprobe/nlist); the corpus artifacts are
    * one cell id + m codes per vector.
    *
    * Determinism + oracle: centroids AND the PQ codebook are
    * md5-order samples (no RNG); corpus cell assignment reuses the
    * [[graft.functions.PqEncode]] codegen expression with ONE
    * subspace of `dims` over the centroid table — argmin L2 on
    * normalized vectors IS argmax cosine, ties to the first (lowest
    * md5-position) centroid; query cells sort the same distance list
    * by (distance, position) in an array_sort struct — every double
    * is the same left-to-right fold DuckDB replays, so cells, codes,
    * LUTs, shortlist and rerank are all bit-reproducible.
    *
    * Scale shape: centroid/codebook collects are bounded
    * (max(nlist, codes) vectors); assignment + encoding is ONE narrow
    * codegen corpus pass, no shuffle; the ADC scan joins the code
    * table to the broadcast (query cell, LUT) list on the cell id —
    * an equi join that touches nprobe/nlist of the corpus — and
    * merges with bounded [[TopK]] heaps; the rerank is one more
    * narrow corpus scan against the broadcast shortlist. The
    * broadcast is O(queries · nprobe · m · codes) doubles — the
    * "few queries" retrieval regime, the same assumption
    * [[Retrieval.bm25TopK]] makes of its query-term list. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 64, nprobe: Int = 8,
      m: Int = 8, codes: Int = 64, dims: Int = 64,
      shortlist: Int = 100): DataFrame = {
    require(dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val sub = dims / m
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
        asDouble(col(vecCol)).as("v0")))
      .withColumn("nv", normalizeExpr("v0"))
      .persist(lvl)
    // one md5-order sample serves both quantizers (deterministic,
    // SQL-replayable); driver collect bounded by max(nlist, codes)
    val sample: Seq[Seq[Double]] = c
      .orderBy(md5(col("neighbor_id").cast("string")), col("neighbor_id"))
      .limit(math.max(nlist, codes)).select(col("nv")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
    val cbT: Seq[Seq[Seq[Double]]] =
      (0 until m).map(mi => sample.take(codes).map(_.slice(mi * sub, (mi + 1) * sub)))
    val cbCol = typedLit(cbT)
    // centroid table as a 1-subspace "codebook" of full-dim entries:
    // PqEncode's argmin over it IS the cell assignment
    val centT: Seq[Seq[Seq[Double]]] = Seq(sample.take(nlist))
    val centCol = typedLit(centT)
    // ONE narrow corpus pass: cell id (1-based centroid position) +
    // m PQ codes per vector, both codegen expressions
    val enc = c.withColumn("__cb", cbCol).withColumn("__ct", centCol)
      .select(col("neighbor_id"),
        element_at(graft.functions.PqEncode(col("nv"), col("__ct")), 1)
          .as("cell"),
        graft.functions.PqEncode(col("nv"), col("__cb")).as("code"))
    // Query side deliberately carries NO codebook/centroid literals:
    // an early variant inlined them into the cells/LUT expressions
    // and Catalyst spent a measured ~18s (at ANY data size) re-
    // optimizing the literal-heavy explode subtree for every
    // downstream broadcast. The centroid and codebook tables join in
    // as broadcast DataFrames instead — same doubles, same
    // left-to-right folds (zip_with preserves element order), so the
    // oracle replay is unchanged — and the per-row work lives on the
    // query side, whose row count is small by contract.
    val spark2 = corpus.sparkSession
    import spark2.implicits._
    val centsDf = broadcast(sample.take(nlist).zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v) }.toDF("cell", "cv"))
    val cbDf = broadcast((for {
      mi <- 0 until m; j <- 1 to codes
    } yield (mi, j, sample.take(codes)(j - 1).slice(mi * sub, (mi + 1) * sub)))
      .toDF("mi", "j", "cbv"))
    val q0 = queries.select(col(idCol).as("q_id"),
        asDouble(col(vecCol)).as("v0"))
      .withColumn("qv", normalizeExpr("v0")).drop("v0")
      .persist(lvl)
    // nprobe nearest cells per query: bounded heap on (-L2², cell),
    // i.e. (distance ASC, position ASC) — the oracle's tie rule
    val qcells = q0.crossJoin(centsDf)
      .select(col("q_id"), col("cell"),
        expr("""aggregate(zip_with(qv, cv, (x, y) -> (x - y) * (x - y)),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("d"))
      .groupBy(col("q_id"))
      .agg(TopK.topK(nprobe)(col("cell"), -col("d")).as("__cells"))
    // per-query ADC lookup table, reassembled to the m×codes nested
    // array PqAdc reads; same squared-distance folds as the corpus
    // encoder, so codes and LUT values replay bit-for-bit
    val qlut = q0.crossJoin(cbDf)
      .select(col("q_id"), col("mi"), col("j"),
        expr(s"""aggregate(zip_with(slice(qv, mi * $sub + 1, $sub), cbv,
          |  (x, y) -> (x - y) * (x - y)),
          |  CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("d"))
      .groupBy(col("q_id"), col("mi"))
      .agg(sort_array(collect_list(struct(col("j"), col("d")))).as("jd"))
      .select(col("q_id"), col("mi"),
        expr("transform(jd, p -> p.d)").as("dl"))
      .groupBy(col("q_id"))
      .agg(sort_array(collect_list(struct(col("mi"), col("dl")))).as("md"))
      .select(col("q_id"), expr("transform(md, p -> p.dl)").as("__lut"))
    val qmeta = qcells.join(qlut, Seq("q_id"))
      .select(col("q_id"), col("__lut"),
        explode(col("__cells.id")).as("cell"))
    val scored = enc.join(broadcast(qmeta), Seq("cell"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        (-graft.functions.PqAdc(col("__lut"), col("code"))).as("score"))
    val cand = TopK.perKey(scored, Seq("q_id"), "neighbor_id", "score",
      shortlist).select(col("q_id"), col("neighbor_id"))
    val cn = c.select(col("neighbor_id"), col("v0").as("nv0"))
    val qn = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv0"))
    val rer = cn.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qn), Seq("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosineExpr("qv0", "nv0").as("score"))
    // top-k output is query-bounded and tiny: materialize eagerly and
    // release both caches before returning (the bradleyTerryMicro
    // discipline, r16 verdict item 3)
    val out = TopK.perKey(rer, Seq("q_id"), "neighbor_id", "score", k)
      .localCheckpoint(eager = true)
    Seq(c, q0).foreach(_.unpersist(blocking = false))
    out
  }

  /** LSH-bucketed ANN: join query buckets to corpus buckets, exact
    * cosine inside the bucket, top-k per query. Trades recall for a
    * |bucket|-sized candidate set; recall is measured against
    * bruteForceTopK in the test suite. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, numBits: Int = 6, dims: Int = 64): DataFrame = {
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nv")))
      .withColumn("bucket", lshBucketExpr("nv", numBits, dims))
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshBucketExpr("qv", numBits, dims))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosineExpr("qv", "nv").as("score"))
    TopK.perKey(scored, Seq("q_id"), "neighbor_id", "score", k)
  }

  /** Embedding preprocessing — the standard conditioning pass before
    * any ANN/clustering stage: mean-center each dimension over the
    * corpus, L2-normalize, truncate to the first `keepDims`
    * components (the Matryoshka/MRL deployment trick), re-normalize.
    *
    * Reproducibility: the per-dimension corpus means come from
    * integer-micro sums (the kmeans trick — quantize each component
    * to round(x·1e6) before the sum), so the means — and everything
    * derived from them — are bit-identical under any partitioning and
    * in any engine. The means ride a broadcast `dims`-row aggregate
    * (no driver action); centering/normalizing is a narrow zip; the
    * whole pass adds ZERO shuffles beyond the means aggregate.
    *
    * Returns (id, v_prep = ready-to-index truncated unit vector,
    * norm_centered = pre-truncation L2 norm, kept_mass = |first
    * keepDims of the unit vector| — the fraction of the embedding's
    * mass the truncation keeps, the MRL quality diagnostic). */
  def preprocess(corpus: DataFrame, idCol: String, vecCol: String,
      keepDims: Int): DataFrame = {
    val e = corpus.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val means = e
      .select(posexplode(col("v")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(sum(round(col("x") * 1e6, 0).cast("long")).as("sx"),
        count(lit(1)).as("n"))
      .agg(sort_array(collect_list(struct(col("d"), col("sx"), col("n"))))
        .as("ms"))
      .select(expr(
        "transform(ms, m -> CAST(m.sx AS DOUBLE) / m.n / 1000000.0)")
        .as("mean_v"))
    // Per-row kernels are the compiled vector expressions (guide §4):
    // the HOF spelling ran ~8 interpreted lambda evals per DIMENSION
    // per corpus vector (center, two norm folds, two divides) with no
    // compiled downstream work to amortize them — the whole per-row
    // cost of this operator WAS interpretation overhead. VecSub /
    // VecDot / VecDivide run the same left-to-right IEEE loops
    // (bit-identical doubles, spec-pinned); slicing before the divide
    // replaces dividing before the slice — per-element results are
    // identical and the dropped tail is never divided.
    val centered = e.join(broadcast(means))
      .select(col(idCol),
        graft.functions.VecSub(col("v"), col("mean_v")).as("cv"))
      .select(col(idCol), col("cv"),
        sqrt(graft.functions.VecDot(col("cv"), col("cv")))
          .as("norm_centered"))
    // Degenerate inputs guard: a vector EQUAL to the corpus mean has
    // norm_centered = 0, and one whose first keepDims centered
    // components are all zero has kept_mass = 0 — either division
    // would silently emit NaN/Infinity components that poison every
    // downstream ANN/clustering distance. Emit NULL v_prep instead
    // (the caller filters or inspects norm_centered/kept_mass).
    centered
      .select(col(idCol), col("norm_centered"),
        when(col("norm_centered") > 0d,
          graft.functions.VecDivide(
            slice(col("cv"), 1, keepDims), col("norm_centered")))
          .as("tv"))
      .select(col(idCol), col("norm_centered"),
        sqrt(graft.functions.VecDot(col("tv"), col("tv"))).as("kept_mass"),
        col("tv"))
      .select(col(idCol),
        when(col("kept_mass") > 0d,
          graft.functions.VecDivide(col("tv"), col("kept_mass")))
          .as("v_prep"),
        col("norm_centered"), col("kept_mass"))
  }

  /** Approximate top-k JOIN of two embedding corpora — the
    * corpus-vs-corpus alignment shape (cross-corpus near-dup pairing,
    * semantic alignment of a new crawl against a curated set,
    * candidate mining for distillation pairs), where BOTH sides are
    * large so the [[ivfTopK]] pattern of broadcasting the query side
    * stops applying. Same IVF structure (Jégou et al. TPAMI'11
    * coarse quantizer): `nlist` centroids sampled deterministically
    * from the RIGHT (indexed) side in md5 order, right rows assigned
    * to their nearest cell, left rows probe their `nprobe` nearest
    * cells — but the cell match is a plain SHUFFLE hash join keyed on
    * the cell id, so neither corpus is ever collected, broadcast, or
    * paired all-vs-all: pair volume is Σ_cell |left probes(cell)| ·
    * |right(cell)| ≈ |L|·nprobe·|R|/nlist, and the only broadcast is
    * the nlist centroids. SIZE nlist to the data: nlist ≈ √|R| (the
    * standard IVF guidance) keeps the per-left-row probe cost at
    * O(nprobe·√|R|) — a FIXED nlist makes every cell grow linearly
    * with the corpus and the join quadratic (measured: 306× wall at
    * 100×/100× with nlist pinned at 16, ~an order of magnitude less
    * with √N cells — BENCH_NOTES r13). Ids need not be disjoint; an
    * id on both sides pairs like any other row (filter afterward if
    * self-pairs are meaningless).
    *
    * Returns (left_id, right_id, score, rnk) with rnk ≤ k per
    * left_id, bounded-heap merged ([[TopK.perKey]]) so the shuffle
    * above the scoring join carries O(partitions·left·k) heap rows. */
  def annJoin(left: DataFrame, right: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val r = spread(right.select(col(idCol).as("right_id"),
      asDouble(col(vecCol)).as("rv")))
    val l = spread(left.select(col(idCol).as("left_id"),
      asDouble(col(vecCol)).as("lv")))
    val cents = broadcast(
      r.orderBy(md5(col("right_id").cast("string")), col("right_id"))
        .limit(nlist)
        .select(col("right_id").as("cell"), col("rv").as("cv")))
    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame =
      df.crossJoin(cents)
        .select(col(id), col(vec), col("cell"),
          cosineExpr(vec, "cv").as("cell_score"))
        .groupBy(col(id))
        .agg(first(col(vec)).as(vec),
          TopK.topK(keep)(col("cell"), col("cell_score")).as("__cells"))
        .select(col(id), col(vec), explode(col("__cells.id")).as("cell"))
    val scored = assign(r, "right_id", "rv", 1)
      .join(assign(l, "left_id", "lv", nprobe), Seq("cell"))
      .select(col("left_id"), col("right_id"),
        cosineExpr("lv", "rv").as("score"))
    TopK.perKey(scored, Seq("left_id"), "right_id", "score", k)
  }

  /** Per-tensor symmetric scalar quantization with a recall@k
    * fidelity report — the embedding-compression gate every
    * large-corpus vector store runs before committing to a code
    * layout (symmetric scale = the inference-engine default;
    * Jacob et al. 2018 §2.1). One corpus-wide scale s = max |x|
    * maps each component to round(x·L/s) ∈ [-L, L] (`levels` = L:
    * 127 for int8, 7 for int4); the report scores every query's
    * exact-cosine top-k against the top-k computed on the
    * DEQUANTIZED corpus, so the number is the end-to-end ranking
    * fidelity of the compressed representation, not a
    * per-component error bound.
    *
    * Scale shape: the scale is ONE partial-combined max over the
    * corpus (each row folds to a scalar map-side, the exchange
    * carries one double per partition) broadcast back; both
    * rankings come from a SINGLE corpus scan — the cross join
    * against the broadcast query set scores exact and quantized
    * cosine side by side, and one grouped aggregate carries TWO
    * bounded top-k heaps per query, so the shuffle moves
    * O(partitions·queries·k) heap rows once, not the scored corpus
    * twice. Quantize-then-dequantize happens inline per row (no
    * second materialized corpus). Total work is O(queries·corpus) by
    * construction (the report needs the EXACT ranking as its
    * baseline) — at production scale pass a fixed-size query SAMPLE
    * (~100 queries estimates recall as well as 10,000), which makes
    * the report linear in corpus size; measured: 10× corpus AND 10×
    * queries together cost 229× wall at copies=100.
    *
    * Returns (q_id, n_overlap, recall) per query — EVERY query row,
    * including one with zero scored neighbors (degenerate corpus:
    * left-joined back with n_overlap 0, matching the report's
    * denominator semantics), recall = overlap/k rounded 4dp,
    * ordered by q_id. */
  def quantRecall(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      levels: Int = 127): DataFrame = {
    require(levels >= 1, s"levels $levels must be >= 1")
    val c = spread(corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("nv")))
    val scale = c.agg(
      max(expr("aggregate(nv, CAST(0 AS DOUBLE), (acc, x) -> greatest(acc, abs(x)))"))
        .as("s"))
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(scale))
      .select(col("neighbor_id"), col("nv"),
        expr(s"transform(nv, x -> round(x * $levels.0 / s) * s / $levels.0)")
          .as("nvq"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("q_id"))
      .select(col("q_id"), col("neighbor_id"),
        cosineExpr("qv", "nv").as("se"),
        cosineExpr("qv", "nvq").as("sq"))
    val perQuery = scored.groupBy(col("q_id"))
      .agg(TopK.topK(k)(col("neighbor_id"), col("se")).as("__te"),
        TopK.topK(k)(col("neighbor_id"), col("sq")).as("__tq"))
      .select(col("q_id"),
        expr("""CAST(size(array_intersect(transform(__te, x -> x.id),
          |  transform(__tq, x -> x.id))) AS BIGINT)""".stripMargin)
          .as("n_overlap"))
    // A query whose every neighbor was filtered out (corpus == {q})
    // produces no group above; the report still owes it a row —
    // left-join the query frame back and coalesce to 0, the same
    // LEFT JOIN the DuckDB oracle does. Both sides are query-sized;
    // broadcast keeps the report join shuffle-free.
    q.select(col("q_id")).join(broadcast(perQuery), Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .select(col("q_id"), col("n_overlap"),
        round(col("n_overlap").cast("double") / lit(k.toDouble), 4)
          .as("recall"))
  }

  /** Dominant principal component of an embedding corpus by power
    * iteration (the classic von Mises iteration; Golub & Van Loan
    * §7.3) — the direction a whitening / anisotropy-removal step
    * (Mu & Viswanath ICLR'18, "All-but-the-top") strips first. The
    * whole computation is replayable in ANSI SQL, which no float
    * BLAS path is: every stage is either exact integer arithmetic or
    * one deterministic double divide.
    *
    * Stages: (1) components quantized to `quantScale` fixed-point
    * Longs (round(quantScale·v[i]), i < dim); (2) the upper-tri Gram
    * matrix Σ mᵢ·mⱼ accumulated as dim·(dim+1)/2 exact Long sums in
    * ONE wide partial-combined aggregate — no per-row explode, no
    * shuffle wider than the Gram itself (overflow bound: rows ≲
    * 2⁶³/(quantScale²·maxcomp²), ~10¹² at milli scale for unit-ish
    * vectors); (3) Gram normalized to L∞ = 1e6 micros
    * (round(1e6·(g/maxabs)), one double divide per entry) so the
    * iteration's integer magnitudes are CORPUS-SIZE-INDEPENDENT;
    * (4) `iters` rounds of w = G·v from v₀ = (1e6,…,1e6), each
    * matvec an exact Long dot (|w| ≤ dim·1e12 ≪ 2⁶³), renormalized
    * to L∞ = 1e6 by the same round(1e6·(w/maxabs)) rule. The
    * dim×dim iteration runs driver-side on the COLLECTED 1-row Gram
    * — bounded state, the codebook-collect discipline, while the
    * corpus-sized work stays in the single distributed aggregate.
    *
    * Returns (component_idx ∈ [1, dim], v_micro): the unnormalized-
    * sign dominant eigenvector at micro scale, one row per
    * component. */
  def topComponentMicro(corpus: DataFrame, vecCol: String, dim: Int,
      iters: Int = 3, quantScale: Int = 1000): DataFrame = {
    require(dim >= 2 && dim <= 64, s"dim $dim must be in [2, 64]")
    require(iters >= 1, s"iters $iters must be >= 1")
    val spark = corpus.sparkSession
    import spark.implicits._
    // half-away-from-zero, matching both engines' SQL ROUND (Scala's
    // math.round is floor(x+0.5) — differs on negative .5 exactly)
    def rnd(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    val pairs = for { i <- 0 until dim; j <- i until dim } yield (i, j)
    val row = gramFrame(corpus, vecCol, dim, quantScale).head()
    require(!row.isNullAt(0),
      "empty corpus: no vectors to accumulate a Gram matrix from")
    val g = Array.ofDim[Long](dim, dim)
    pairs.zipWithIndex.foreach { case ((i, j), k) =>
      val v = row.getLong(k); g(i)(j) = v; g(j)(i) = v }
    val maxg = g.flatten.map(math.abs).max.toDouble
    require(maxg > 0, "degenerate corpus: zero Gram matrix")
    val gn = g.map(_.map(x => rnd(1e6 * (x.toDouble / maxg))))
    var v = Array.fill(dim)(1000000L)
    (1 to iters).foreach { _ =>
      val w = Array.tabulate(dim)(i =>
        (0 until dim).map(j => gn(i)(j) * v(j)).sum)
      val mw = w.map(math.abs).max.toDouble
      v = if (mw == 0) w else w.map(x => rnd(1e6 * (x.toDouble / mw)))
    }
    v.zipWithIndex.map { case (x, i) => (i + 1, x) }.toSeq
      .toDF("component_idx", "v_micro")
      .orderBy(col("component_idx"))
  }

  /** The distributed stage of [[topComponentMicro]]: the 1-row
    * upper-tri Gram frame (dim·(dim+1)/2 exact Long sums in one wide
    * aggregate) — split out so PlanSpec can pin that it plans as a
    * partial+final HashAggregate with NO per-row pair explode. */
  private[graft] def gramFrame(corpus: DataFrame, vecCol: String,
      dim: Int, quantScale: Int): DataFrame = {
    val m = corpus.select((0 until dim).map(i =>
      expr(s"CAST(ROUND($quantScale * CAST(element_at($vecCol, ${i + 1}) AS DOUBLE)) AS BIGINT)")
        .as(s"__m$i")): _*)
    val aggs = (for { i <- 0 until dim; j <- i until dim } yield
      sum(col(s"__m$i") * col(s"__m$j")).as(s"__g_${i}_$j")).toSeq
    m.agg(aggs.head, aggs.tail: _*)
  }

  /** Greedy k-center coreset selection (Gonzalez 1985's farthest-
    * point traversal; the 2-approximation for the k-center cover, and
    * the diversity-sampling workhorse of coreset-based training-data
    * selection — pick the k embeddings that best COVER the corpus,
    * maximizing the minimum pairwise distance): seed with the lowest
    * id, then k−1 times select the point farthest (micro-quantized
    * cosine distance round((1−cos)·1e6), ties to the lowest id) from
    * every already-selected center.
    *
    * Inherently sequential (each pick depends on all prior picks) but
    * NOT driver-bound: the per-round argmax is a 1-row
    * max(struct(dist, −id, vec)) aggregate that stays in-plan via a
    * broadcast — no collect in the loop, the graph-family discipline.
    * Per round: one narrow distance update against the 1-row
    * broadcast center + one 1-row aggregate over the corpus-sized
    * (id, vec, dmin) frame, lineage cut per round (eager
    * localCheckpoint) so plan depth stays O(1). Total work O(k·n·dim)
    * — the same as one k-means iteration, at any corpus size.
    *
    * Determinism: distances quantize to integer micros BEFORE the
    * argmax (the p30 k-means trick), so selection replays exactly on
    * any engine/partitioning. Already-selected centers sit at
    * distance 0 and are never re-picked while any uncovered point
    * remains; if k exceeds the number of distinct cosine directions,
    * the remaining rounds deterministically re-emit the lowest-id
    * zero-distance point (radius 0) rather than failing — callers
    * wanting strictness should check for a 0 radius tail.
    *
    * Returns exactly k rows (rnk 1..k, id, radius_micro) in selection
    * order; radius_micro is the selected point's distance to the
    * prior centers — the covering radius achieved by the PREVIOUS
    * round (NULL for the seed). */
  def kCenterCoreset(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    val pts = df.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    val seed = pts
      .select(min(struct(col("__id"), col("__v"))).as("m"))
      .select(col("m.__id").as("cid"), col("m.__v").as("cv"))
      .localCheckpoint(eager = true)
    val distTo = round((lit(1.0) - cosineExpr("__v", "cv")) * 1000000, 0)
      .cast("long")
    var md = pts.crossJoin(broadcast(seed))
      .select(col("__id"), col("__v"), distTo.as("__dmin"))
      .localCheckpoint(eager = true)
    val picks = scala.collection.mutable.ArrayBuffer[DataFrame](
      seed.select(lit(1L).as("rnk"), col("cid").as(idCol),
        lit(null).cast("long").as("radius_micro")))
    (2 to k).foreach { r =>
      // farthest point, ties on the SMALLEST id: min of the struct
      // (-dmin, id) is one ordered aggregate and — unlike the old
      // (__id * -1) negation — works for any orderable id type
      // (strings included), not just numeric ids (r16 advice)
      val top = md
        .select(min(struct((col("__dmin") * -1).as("nd"), col("__id"),
          col("__v"))).as("m"))
        .select(col("m.__id").as("cid"), col("m.__v").as("cv"),
          (col("m.nd") * -1).as("rad"))
        .localCheckpoint(eager = true)
      picks += top.select(lit(r.toLong).as("rnk"), col("cid").as(idCol),
        col("rad").as("radius_micro"))
      if (r < k)
        md = md.crossJoin(broadcast(top.select(col("cv"))))
          .select(col("__id"), col("__v"),
            least(col("__dmin"), distTo).as("__dmin"))
          .localCheckpoint(eager = true)
    }
    picks.reduce(_ union _)
  }

  /** Deterministic ±1 Achlioptas/JL sign matrix (Achlioptas 2003,
    * "Database-friendly random projections"), derived from
    * [[PlaneParams]] exactly like the p07 LSH hyperplanes so an ANSI
    * oracle regenerates every entry: sign(j, i) flips on the parity
    * of the LCG value at flat index j·inDim+i. Row j is the j-th
    * output coordinate's sign vector. */
  def jlSigns(inDim: Int, outDim: Int): IndexedSeq[IndexedSeq[Double]] = {
    val (a, b, p) = PlaneParams
    (0 until outDim).map(j => (0 until inDim).map { i =>
      if ((a * (j * inDim + i) + b) % p % 2 == 0) 1.0 else -1.0
    })
  }

  /** Johnson–Lindenstrauss projection fidelity audit: project every
    * embedding from `inDim` to `outDim` dims with the deterministic
    * ±1 sign matrix ([[jlSigns]] — cosines are scale-invariant, so
    * the 1/√k normalization is omitted) and report, for every
    * adjacent id pair, the original-space cosine, the projected-space
    * cosine, and the absolute distortion — the measurement a pipeline
    * runs before swapping its ANN index to the cheaper projected
    * vectors. Expected distortion for ±1 projections is O(1/√outDim);
    * the report is what turns that theory into a per-corpus decision.
    *
    * Determinism: the sign literals are inlined into the projection
    * expressions (the same rows the oracle regenerates), every dot
    * product folds left-to-right, and both cosines micro-quantize —
    * the row is four exact integers past the id.
    *
    * Scale shape: the projection is one narrow codegen pass (outDim
    * folds over the vector — no join, no shuffle); the adjacent
    * pairing is one hash join on id+1 (the p02 discipline). Nothing
    * is quadratic and nothing exceeds vector-grain.
    *
    * Returns (idCol, cos_orig_micro, cos_proj_micro, err_micro) for
    * every id with an id+1 neighbor, by id. */
  def jlDistortionAdjacent(df: DataFrame, idCol: String,
      vecCol: String, inDim: Int, outDim: Int): DataFrame = {
    require(outDim >= 1 && outDim < inDim,
      s"need 1 <= outDim $outDim < inDim $inDim")
    val signs = jlSigns(inDim, outDim)
    val projExpr = array(signs.map(row => expr(
      s"""aggregate(zip_with(__v, array(${row.mkString(", ")}),
         |  (x, s) -> x * s),
         |  CAST(0 AS DOUBLE), (acc, w) -> acc + w)""".stripMargin)): _*)
    val e = df.select(col(idCol).as("__id"),
        asDouble(col(vecCol)).as("__v"))
      .withColumn("__p", projExpr)
    val a = e.toDF("__id", "av", "ap")
    val b = e.toDF("__bid", "bv", "bp")
    a.join(b, col("__bid") === col("__id") + 1)
      .select(col("__id").as(idCol),
        round(cosineExpr("av", "bv") * 1000000, 0).cast("long")
          .as("cos_orig_micro"),
        round(cosineExpr("ap", "bp") * 1000000, 0).cast("long")
          .as("cos_proj_micro"))
      .withColumn("err_micro",
        abs(col("cos_orig_micro") - col("cos_proj_micro")))
  }

  /** Label-separation audit over a labeled embedding corpus — the
    * centroid silhouette: per ground-truth label, the mean cosine of
    * members to their OWN label centroid vs to the NEAREST OTHER
    * label centroid, and the margin between the two. The "are these
    * embeddings good enough to curate with" gate run before trusting
    * label-conditioned selection (SemDeDup per class, hard-negative
    * mining, classifier-gated sampling): a non-positive margin means
    * the embedding space does not separate the labels and
    * embedding-based curation will shred them.
    *
    * Determinism (the p30 centroid discipline): per-coordinate
    * micro-quantized integer sums divided once per coordinate give
    * centroids any engine reproduces; member cosines micro-quantize
    * before the per-label sums, so means and margins are ratios of
    * exact integers.
    *
    * Scale shape: one posexplode aggregate at (label, dim) grain, one
    * |labels|-row centroid fold, then a single corpus scan against
    * the BROADCAST centroid table collapsed per member in one
    * partial-combined aggregate (own + max-other in the same pass —
    * nothing scans twice), and a |labels|-row rollup. Labels are
    * assumed codebook-sized (they ride a broadcast), the corpus is
    * not.
    *
    * Returns (label, n_members, mean_intra 4dp, mean_nearest_other
    * 4dp, margin 4dp) by label; mean_nearest_other and margin are
    * NULL when only one label exists. */
  def labelSilhouette(df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val e = df.select(col(idCol).as("__id"), col(labelCol).as("__lab"),
        asDouble(col(vecCol)).as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dims = e.select(col("__lab"), posexplode(col("__v")).as(Seq("d", "x")))
      .groupBy(col("__lab"), col("d"))
      .agg(sum(round(col("x") * 1000000, 0).cast("long")).as("sx"),
        count(lit(1)).as("n"))
    val cents = dims.groupBy(col("__lab").as("__clab"))
      .agg(sort_array(collect_list(struct(col("d"),
        (col("sx").cast("double") / col("n") / 1000000.0).as("m"))))
        .as("dm"))
      .select(col("__clab"), expr("transform(dm, p -> p.m)").as("cv"))
    val per = e.crossJoin(broadcast(cents))
      .select(col("__id"), col("__lab"), col("__clab"),
        round(cosineExpr("__v", "cv") * 1000000, 0).cast("long").as("cm"))
      .groupBy(col("__id"), col("__lab"))
      .agg(max(when(col("__lab") === col("__clab"), col("cm"))).as("own"),
        max(when(col("__lab") =!= col("__clab"), col("cm"))).as("oth"))
    val out = per.groupBy(col("__lab").as(labelCol))
      .agg(count(lit(1)).as("n_members"), sum(col("own")).as("__so"),
        sum(col("oth")).as("__st"))
      .select(col(labelCol), col("n_members"),
        round(col("__so").cast("double") / col("n_members") / 1000000.0,
          4).as("mean_intra"),
        round(col("__st").cast("double") / col("n_members") / 1000000.0,
          4).as("mean_nearest_other"),
        round((col("__so") - col("__st")).cast("double") /
          col("n_members") / 1000000.0, 4).as("margin"))
      .localCheckpoint(eager = true)
    e.unpersist(blocking = false)
    out
  }

  /** SEMANTIC decontamination: flag corpus vectors whose nearest
    * EVAL-set vector exceeds a cosine threshold — the embedding-space
    * companion to the n-gram decontamination tiers ([[Dedup]]'s
    * p23/p120/p122 family), catching paraphrased or reformatted
    * benchmark leakage that shares no verbatim n-grams (the SemDeDup
    * / benchmark-contamination argument, Abbas et al. 2023 §5).
    *
    * Per-pair cosines quantize to integer micros BEFORE the max (the
    * p30 determinism discipline), so the verdict replays exactly on
    * any engine. Threshold compares in micros for the same reason.
    *
    * Scale shape: eval sets are benchmark-sized (thousands, not
    * corpus-sized) — the eval side rides a broadcast and the corpus
    * streams through ONE narrow pass with a corpus-grain partial max;
    * no shuffle carries a vector pair. An eval set too large to
    * broadcast should go through [[ivfPqTopK]] with the eval side as
    * queries instead.
    *
    * Returns (idCol, max_cos_micro, contaminated) — one row per
    * corpus vector NOT in the eval frame. */
  def semanticDecontam(corpus: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, tauMicro: Long = 950000L): DataFrame = {
    val c = corpus.select(col(idCol).as("__id"),
      asDouble(col(vecCol)).as("__v"))
    val ev = evalSet.select(col(idCol).as("__eid"),
      asDouble(col(vecCol)).as("__ev"))
    // deliberate broadcast Cross + residual (the p06 shape — planned
    // as a Cross-type broadcast loop, which the PlanSpec battery pin
    // whitelists, not an accidental theta join)
    c.crossJoin(broadcast(ev))
      .filter(col("__id") =!= col("__eid"))
      .select(col("__id"),
        round(cosineExpr("__v", "__ev") * 1000000, 0).cast("long")
          .as("__cm"))
      .groupBy(col("__id"))
      .agg(max(col("__cm")).as("max_cos_micro"))
      .select(col("__id").as(idCol), col("max_cos_micro"),
        (col("max_cos_micro") >= tauMicro).as("contaminated"))
  }
}
