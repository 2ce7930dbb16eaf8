package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All operators are pure DataFrame transformations: they shuffle on
  * content-derived keys (hash buckets), never collect to the driver,
  * and scale horizontally — the LSH family turns the O(n²) pair
  * problem into a bucket-local join, which is the only shape that
  * survives 100 TB.
  */
object Dedup {

  /** Lower-cased whitespace tokens of a text column. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Distinct word n-gram shingles over a tokens column named
    * `tokCol` — the unit of near-duplicate comparison. Pure
    * higher-order functions: stays inside whole-stage codegen, no
    * UDF, no explode blowup. */
  def shingleExpr(tokCol: String, n: Int = 3): Column = {
    val parts = (0 until n)
      .map(k => s"element_at($tokCol, CAST(i + $k AS INT))").mkString(", ")
    // guard: Spark's sequence(1, 0) counts DOWN, so short docs need an
    // explicit empty-array branch.
    expr(
      s"""CASE WHEN size($tokCol) < $n THEN array()
         |ELSE array_distinct(transform(
         |  sequence(1, size($tokCol) - ${n - 1}),
         |  i -> concat_ws(' ', $parts))) END""".stripMargin)
  }

  /** id + distinct shingle set per document. */
  def withShingles(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(col(idCol), shingleExpr("tk", n).as("sh"))

  /** Exact dedup: hash-group identical content, keep the smallest id
    * as the representative. One shuffle on a 128-bit content hash —
    * never on the text itself, so wide documents don't inflate the
    * exchange. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Bloom-prefiltered incremental dedup: flag every row of a new
    * ingest `batch` as novel or already present in `corpus`, without
    * ever shuffling either side at corpus scale.
    *
    * The cross-run production pattern: a bloom filter over the corpus
    * content hashes (built once per ingest cycle via the distributed
    * `stat.bloomFilter` treeAggregate — the filter itself is the only
    * driver-side state, sized by `expectedItems`/`fpp`, e.g. ~1.2 GB
    * for 10⁹ docs at 1% fpp) probes each batch row in a narrow
    * codegen pass ([[graft.functions.BloomProbe]]). Bloom negatives
    * are DEFINITELY novel — no join needed, and on a typical ingest
    * that is almost every row. Only the plausible-duplicate remainder
    * (true dups + fpp·batch false positives) needs exact
    * verification, and that shortlist is small enough to broadcast:
    * the corpus streams through one broadcast hash join with ZERO
    * shuffle, and the confirmed-duplicate hashes come back to tag the
    * batch. The result is EXACT — the bloom only prunes work, it
    * never decides membership (no-false-negative property asserted by
    * OperatorSpec).
    *
    * Without the bloom, the same answer needs batch ⋈ corpus on the
    * content hash — a full shuffle of the corpus side every ingest
    * cycle. With it, corpus cost is two shuffle-free scans (build +
    * verify stream).
    *
    * The probed batch relation feeds two branches (shortlist + final
    * tag) and is deliberately NOT persisted: the pass is a narrow
    * scan-speed projection, and recomputing it is cheaper than a
    * batch-sized cache at ingest scale. Persist upstream if the batch
    * input itself is expensive to produce.
    *
    * Returns one row per batch row: (id, text_hash, is_novel) with
    * is_novel ∈ {0,1} (long, oracle-friendly). */
  def bloomNovelty(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, expectedItems: Long,
      fpp: Double = 0.03): DataFrame = {
    val corpusHash = corpus.select(md5(col(textCol)).as("text_hash"))
    val bloom = corpusHash.stat.bloomFilter("text_hash", expectedItems, fpp)
    val probed = batch
      .select(col(idCol), md5(col(textCol)).as("text_hash"))
      .withColumn("maybe_dup",
        graft.functions.BloomProbe(col("text_hash"), bloom))
    // Exact verification only for bloom positives. The shortlist is
    // broadcast so the (huge) corpus side never shuffles; if an
    // ingest were ever dup-dominated enough to overflow the broadcast
    // threshold, drop the hint and AQE falls back to a shuffled hash
    // join — still correct, just paying the exchange the bloom
    // normally avoids.
    val candidates = probed.filter(col("maybe_dup"))
      .select(col("text_hash")).distinct()
    val dupHashes = corpusHash
      .join(broadcast(candidates), Seq("text_hash"))
      .select(col("text_hash")).distinct()
      .withColumn("confirmed_dup", lit(true))
    probed.join(dupHashes, Seq("text_hash"), "left")
      .select(col(idCol), col("text_hash"),
        col("confirmed_dup").isNull.cast("long").as("is_novel"))
  }

  /** Blocked fuzzy join — the entity-resolution / record-linkage
    * primitive: candidate pairs come from an equi join on
    * caller-supplied BLOCKING keys (prefix, phonetic code, length
    * bucket, …), then every candidate is verified with exact
    * Levenshtein distance ≤ `maxDist`. Blocking-then-verify is the
    * standard production shape: the blocking key is the shuffle key,
    * the pair space is Σ|block|² instead of |L|·|R|, and recall is a
    * property of the caller's key choice (a deleted first character
    * escapes a first-char block — pick keys that survive the edits
    * you expect, or union several blockings).
    *
    * Scale contract: block-key CARDINALITY must grow with the corpus.
    * A fixed key (e.g. a 2-char suffix ≈ 100 blocks) makes Σ|block|²
    * quadratic in corpus size — measured at the 10× scale-up
    * (BENCH_NOTES.md r9): the p54 battery shape ran 14.9× slower at
    * 10× rows, and re-keying to a 3-char suffix (10× more blocks)
    * recovered 4.5× of it at identical semantics.
    *
    * `blockKeys` maps a name column to the blocking key expression,
    * applied identically to both sides. Returns
    * (left id, right id, left name, right name, dist). */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame,
      lId: String, lCol: String, rId: String, rCol: String,
      blockKey: Column => Column, maxDist: Int): DataFrame = {
    // Output columns are the CALLER's names — a self-join passing the
    // same names for both sides would emit duplicate columns and make
    // every downstream col() reference ambiguous. Fail loudly here
    // instead (alias one side, as p54 does).
    require(lId != rId && lCol != rCol,
      s"blockedFuzzyJoin output names must be distinct: id '$lId'/'$rId', " +
        s"name '$lCol'/'$rCol' — alias one side before calling")
    // Internal aliases (like __blk) so a self-join where both sides
    // carry the SAME column names (natural for entity resolution)
    // doesn't make the post-join select ambiguous; aliased back to
    // the caller's names in the output.
    val l = left.select(col(lId).as("__l_id"), col(lCol).as("__l_nm"),
      blockKey(col(lCol)).as("__blk"))
    val r = right.select(col(rId).as("__r_id"), col(rCol).as("__r_nm"),
      blockKey(col(rCol)).as("__blk"))
    l.join(r, Seq("__blk"))
      .select(col("__l_id").as(lId), col("__r_id").as(rId),
        col("__l_nm").as(lCol), col("__r_nm").as(rCol),
        levenshtein(col("__l_nm"), col("__r_nm")).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** Span-level exact dedup (the RefinedWeb/C4 retention shape at a
    * fixed granularity): cut each document into non-overlapping
    * `width`-token spans, keep only the globally-FIRST occurrence of
    * each distinct span (min (doc, position) over the whole corpus),
    * and reassemble every document from its surviving spans. Unlike
    * whole-document [[exact]] dedup this removes boilerplate that
    * repeats INSIDE otherwise-distinct documents — headers, footers,
    * templated passages — which is where most of the duplication in a
    * web corpus actually lives.
    *
    * Scale shape: spans shuffle once on their md5 (so the exchange
    * carries 16-byte keys + positions, bounded by corpus token count,
    * never pairs), the first-occurrence argmin is a partial-aggregated
    * `min(struct(id, pos))`, and reassembly is one shuffle back on the
    * doc id with an ordered in-group fold. No windows, no self-join,
    * no driver state — the same plan survives any corpus size.
    *
    * Returns (id, n_spans, n_kept, kept_md5) where kept_md5 is the
    * md5 of the reassembled (space-joined) surviving text — md5('')
    * for a document whose every span was seen earlier elsewhere. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      width: Int = 16): DataFrame = {
    // non-overlapping width-token spans, positions 0..ceil(n/width)-1;
    // sequence(0, -1) would count DOWN for an empty token array, so
    // guard short docs with an explicit single-span branch
    val spans = df
      .select(col(idCol).as("id"), tokens(col(textCol)).as("tk"))
      .select(col("id"), posexplode(expr(
        s"""CASE WHEN size(tk) <= $width THEN array(concat_ws(' ', tk))
           |ELSE transform(sequence(0, CAST(ceil(size(tk) / $width.0D) AS INT) - 1),
           |  i -> concat_ws(' ', slice(tk, i * $width + 1, $width))) END"""
          .stripMargin)).as(Seq("pos", "span")))
    // global first occurrence per distinct span: one shuffle keyed on
    // the 128-bit content hash (never the span text), argmin combines
    // map-side
    val firsts = spans
      .groupBy(md5(col("span")).as("h"))
      .agg(min(struct(col("id"), col("pos"))).as("fst"))
    spans
      .join(firsts, md5(col("span")) === col("h"))
      .withColumn("keep",
        (col("fst.id") === col("id")) && (col("fst.pos") === col("pos")))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        md5(concat_ws(" ", expr(
          "transform(filter(array_sort(collect_list(struct(pos, span, keep)))," +
            " x -> x.keep), x -> x.span)"))).as("kept_md5"))
  }

  /** One (id, shingle-hash) row per distinct shingle — a single
    * codegen'd narrow pass (functions.ShingleHashes tokenizes,
    * shingles, hashes and dedupes inside the row), then explode.
    * No shuffle, no string shingles past the row. */
  def shingleHashRows(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.ShingleHashes(col(textCol), n)).as("s"))

  /** MinHash signatures: hash every shingle ONCE inside the codegen'd
    * shingle pass, then derive the `numHashes` families by re-hashing
    * the 8-byte base hash with the family index as seed material
    * (cheap — fixed 16-byte input) and take plain min() aggregates —
    * explode + one hash aggregate, fully codegen'd, one shuffle on
    * the id. The naive HOF formulation (array_min(transform(sh, s ->
    * xxhash64(s, i))) per family) runs interpreted and re-hashes the
    * full shingle text per family: ~20× slower at sf0.1 and CPU-bound
    * at scale. */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, shingleSize: Int = 3): DataFrame = {
    val ex = shingleHashRows(df, idCol, textCol, shingleSize)
      .withColumnRenamed("s", "h")
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(col("h"), lit(i))).as(s"m$i")
    }
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** LSH banding: split the signature into bands of `rowsPerBand`,
    * hash each band, emit (band_idx, band_hash, id) bucket rows.
    * Docs sharing any band bucket are near-duplicate candidates; the
    * band hash is the shuffle key — uniform, skew-free. */
  def lshBuckets(sigs: DataFrame, idCol: String,
      rowsPerBand: Int = 4): DataFrame =
    sigs.select(col(idCol), posexplode(expr(
      s"""transform(
         |  sequence(0, CAST(size(sig)/$rowsPerBand AS INT) - 1),
         |  b -> xxhash64(concat_ws(',',
         |    transform(slice(sig, b*$rowsPerBand + 1, $rowsPerBand),
         |              x -> CAST(x AS STRING))), b))""".stripMargin))
      .as(Seq("band_idx", "band_hash")))

  /** Candidate near-duplicate pairs: bucket-local self-join, a<b to
    * halve the pair space, distinct across bands. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, rowsPerBand: Int = 4): DataFrame = {
    // eager localCheckpoint: the self-join needs the bucket table
    // twice and Spark has no cross-branch subplan reuse — without
    // this the whole shingle→hash→band pipeline runs once per side
    // (MLlib's MinHashLSH.approxSimilarityJoin caches for the same
    // reason). localCheckpoint instead of persist because the
    // returned pair frame stays lazy and still reads the table — a
    // persist here could never be unpersisted and would accumulate
    // in long-lived sessions (r16 verdict item 3); checkpoint blocks
    // free on GC with no cache-manager entry.
    val b = lshBuckets(
      minhashSignatures(df, idCol, textCol, numHashes), idCol, rowsPerBand)
      .localCheckpoint(eager = true)
    val l = b.toDF("a_id", "band_idx", "band_hash")
    val r = b.toDF("b_id", "band_idx", "band_hash")
    l.join(r, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** SimHash: 64-bit fingerprint whose bits are the signs of per-bit
    * weighted sums of token hashes. explode → one xxhash64 per token
    * → 64 conditional sums in a single hash aggregate — vectorized,
    * one shuffle on the id. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    packedSignFingerprint(tok, idCol, 64, j => (col("h"), j))
  }

  /** Shared sign-sum kernel for the SimHash family: aggregate the
    * per-bit ones-counts with 4 independent 16-bit lanes packed into
    * each aggregate long — `nBits/4 + 1` aggregate columns instead of
    * `nBits`, which quarters both the codegen size and the aggregation
    * buffer width while producing bit-identical fingerprints. Bit j of
    * the result is set iff ones_j ≥ n/2, i.e. the ±1 sign sum is ≥ 0
    * — the classic SimHash rule. Lanes never carry across while a
    * document has < 2^16 distinct tokens (the aggregate input is the
    * array_distinct'd token set of ONE document, so the bound is a
    * per-document vocabulary, not a corpus size). */
  private def packedSignFingerprint(tok: DataFrame, idCol: String,
      nBits: Int, bitSource: Int => (Column, Int)): DataFrame = {
    val nGroups = nBits / 4
    val packs = (0 until nGroups).map { g =>
      val lanes = (0 until 4).map { k =>
        val (h, b) = bitSource(g * 4 + k)
        shiftright(h, b).bitwiseAND(lit(1L)) * lit(1L << (16 * k))
      }.reduce(_ + _)
      sum(lanes).as(s"p$g")
    }
    val aggs = packs :+ count(lit(1)).as("n_tok")
    val fp = (0 until nBits).map { j =>
      val ones = shiftright(col(s"p${j / 4}"), 16 * (j % 4))
        .bitwiseAND(lit(0xFFFFL))
      when(ones * 2 >= col("n_tok"), lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    // a lane carry would have corrupted the packed sums silently during
    // aggregation; n_tok is already aggregated, so detect the violated
    // bound here and fail loudly rather than emit a wrong fingerprint
    val guarded = when(col("n_tok") < lit(1L << 16), fp)
      .otherwise(raise_error(concat(
        lit("SimHash 16-bit lane overflow: document "),
        col(idCol).cast("string"), lit(" has "),
        col("n_tok").cast("string"),
        lit(" distinct tokens (>= 65536)"))).cast("long"))
    tok.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol), guarded.as("simhash"))
  }

  /** SimHash over two polynomial hash families instead of xxhash64:
    * 60-bit fingerprint whose low 30 bits come from the sign-sums of
    * RollingHash(31, 1e9+7) token hashes and high 30 bits from
    * RollingHash(37, 998244353). Same plumbing and plan shape as
    * [[simhash]] (explode → one hash aggregate); the polynomial
    * families are slightly weaker hashes but are expressible in ANSI
    * SQL, so a DuckDB oracle can verify the fingerprints bit-for-bit
    * — which xxhash64 (no DuckDB twin) cannot. */
  def simhashPortable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .withColumn("h1",
        graft.functions.RollingHash(col("tok"), 31L, 1000000007L))
      .withColumn("h2",
        graft.functions.RollingHash(col("tok"), 37L, 998244353L))
    packedSignFingerprint(tok, idCol, 60,
      j => if (j < 30) (col("h1"), j) else (col("h2"), j - 30))
  }

  /** Hamming distance between two 64-bit fingerprints (built-in
    * bit_count: codegen'd, no UDF). */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Portable MinHash + LSH banding, every step expressible in ANSI
    * SQL so a DuckDB oracle can replay the exact candidate set:
    * shingles hash with the polynomial rolling hash (ShingleHashes
    * poly mode), the `numHashes` MinHash families are universal
    * hashes (a_i·h + b_i) mod p — plain codegen'd arithmetic — and
    * bands of `rowsPerBand` signature values become string bucket
    * keys for the self-join. Identical plan shape to
    * [[minhashCandidates]] (the xxhash64 variant): one shuffle to the
    * signature aggregate, bucket-local pair join, never n². */
  /** (id, band_idx, band_key) LSH band rows for the portable
    * universal-hash MinHash — the shared bucket table behind the
    * self-join miner and the incremental new-vs-index miner. */
  /** (id, m0..m(numHashes-1)) portable universal-hash MinHash
    * signature columns — the shared aggregate behind the band table
    * and the fidelity audit. */
  private def minhashSigColsPortable(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int, shingleSize: Int): DataFrame = {
    val P = 1000000007L
    def a(i: Int) = (2654435761L * (i + 1)) % P
    def b(i: Int) = (40503L * (i + 7) + 12345L) % P
    val ex = df.select(col(idCol),
      explode(graft.functions.ShingleHashes(col(textCol), shingleSize,
        poly = true)).as("h"))
    val aggs = (0 until numHashes).map { i =>
      min((col("h") * a(i) + b(i)) % P).as(s"m$i")
    }
    ex.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  private def minhashBandsPortable(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int, rowsPerBand: Int,
      shingleSize: Int): DataFrame =
    bandsFromSigCols(minhashSigColsPortable(df, idCol, textCol,
      numHashes, shingleSize), idCol, numHashes, rowsPerBand)

  private def bandsFromSigCols(sigs: DataFrame, idCol: String,
      numHashes: Int, rowsPerBand: Int): DataFrame = {
    val nBands = numHashes / rowsPerBand
    val bandKeys = (0 until nBands).map { j =>
      concat_ws(",", (0 until rowsPerBand).map(k =>
        col(s"m${j * rowsPerBand + k}").cast("string")): _*)
    }
    sigs.select(col(idCol),
      posexplode(array(bandKeys: _*)).as(Seq("band_idx", "band_key")))
  }

  /** MinHash fidelity audit: for every LSH candidate pair, the
    * signature-estimated Jaccard (matching slots / numHashes) next
    * to the exact shingle Jaccard — the calibration check run before
    * trusting a signature-only dedup threshold at scale (32 hashes
    * estimate J with σ = √(J(1−J)/32) ≈ 0.09; this report shows the
    * realized error on YOUR corpus instead of the textbook bound).
    * Integer micro units end-to-end.
    *
    * Scale shape: candidates come from the banded LSH miner (never
    * all-pairs); the estimate is two id-keyed hash joins onto the
    * signature table and a 32-slot zip_with per candidate; the exact
    * side shingles CANDIDATE DOCS ONLY into per-doc distinct-hash
    * arrays and intersects them per pair row — candidate-sized joins
    * carrying bounded arrays, no pair×shingle fan-out.
    *
    * Cache contract: three intermediates (signatures, candidate
    * pairs, candidate shingle arrays) persist at MEMORY_AND_DISK and
    * stay referenced by the returned lazy frame, so they cannot be
    * unpersisted here. Library callers in a long-lived session
    * should `spark.catalog.clearCache()` after consuming the result
    * — the battery mains already do.
    *
    * Returns (a_id, b_id, est_jac_micro, true_jac_micro, err_micro). */
  def minhashFidelity(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 32, rowsPerBand: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    require(shingleSize == 3,
      "minhashFidelity: the exact side (jaccardForPairs) shingles at " +
        "n=3; estimate and truth must measure the same set")
    // ONE signature aggregate feeds both the band miner and the
    // estimate join (the corpus-scan discipline: without the persist
    // the shingle→hash→min pipeline would run once per consumer)
    val sigCols = minhashSigColsPortable(df, idCol, textCol, numHashes,
        shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = bandsFromSigCols(sigCols, idCol, numHashes, rowsPerBand)
    // candidate list feeds THREE consumers (estimate join, candidate-
    // doc semi join, truth join) — persist so the band self-join runs
    // once, not per branch
    val cand = bands.toDF("a_id", "band_idx", "band_key")
      .join(bands.toDF("b_id", "band_idx", "band_key"),
        Seq("band_idx", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = sigCols.select(col(idCol),
      array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val est = cand
      .join(sigs.toDF("a_id", "sa"), Seq("a_id"))
      .join(sigs.toDF("b_id", "sb"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        expr(s"CAST((1000000 * size(filter(zip_with(sa, sb, " +
          s"(x, y) -> x = y), v -> v))) DIV $numHashes AS BIGINT)")
          .as("est_jac_micro"))
    // Exact side: per-doc DISTINCT shingle-hash ARRAYS for candidate
    // docs only (semi join first — the corpus never re-shingles),
    // then two id-keyed candidate-sized joins and a per-row
    // array_intersect. The former jaccardForPairs shape fanned every
    // pair out to |pairs|×|A| exploded shingle rows before the
    // co-count — the dominant shuffle at 100× (32.5× wall ratio);
    // here pair rows carry two bounded arrays and the intersection
    // never shuffles (the p65 adjacency-array discipline). 64-bit FNV
    // hashes keep set cardinalities exact vs the oracle's string
    // lists (collision odds ~1e-14).
    val candDocs = cand.select(col("a_id").as(idCol))
      .union(cand.select(col("b_id").as(idCol))).distinct()
    val hs = df.join(candDocs, Seq(idCol), "left_semi")
      .select(col(idCol),
        graft.functions.ShingleHashes(col(textCol), shingleSize).as("hs"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val truth = cand
      .join(hs.toDF("a_id", "ha"), Seq("a_id"))
      .join(hs.toDF("b_id", "hb"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("ha"), col("hb"))).cast("long").as("ni"),
        size(col("ha")).cast("long").as("na"),
        size(col("hb")).cast("long").as("nb"))
      .select(col("a_id"), col("b_id"),
        expr("CAST(round(CAST(ni AS DOUBLE) / CAST(na + nb - ni AS DOUBLE)" +
          " * 1000000) AS BIGINT)").as("true_jac_micro"))
    // pair-grain output materialized eagerly so all three caches
    // release before returning (the bradleyTerryMicro discipline)
    val out = est.join(truth, Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"), col("est_jac_micro"),
        col("true_jac_micro"),
        abs(col("est_jac_micro") - col("true_jac_micro")).as("err_micro"))
      .localCheckpoint(eager = true)
    Seq(sigCols, cand, hs).foreach(_.unpersist(blocking = false))
    out
  }

  def minhashCandidatesPortable(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 32, rowsPerBand: Int = 4,
      shingleSize: Int = 3): DataFrame = {
    // eager localCheckpoint, not persist — see minhashCandidates
    val bands = minhashBandsPortable(df, idCol, textCol, numHashes,
        rowsPerBand, shingleSize)
      .localCheckpoint(eager = true)
    val l = bands.toDF("a_id", "band_idx", "band_key")
    val r = bands.toDF("b_id", "band_idx", "band_key")
    l.join(r, Seq("band_idx", "band_key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** Incremental near-dup candidate mining: a NEW batch against an
    * existing INDEX — the daily-crawl-increment shape, where the
    * corpus is already deduplicated and only new-vs-old pairs
    * matter. Both sides band with the SAME hash families (so an
    * index's band table can be precomputed once and appended to),
    * and the bucket join is new-vs-index only: pair volume is
    * Σ|new_bucket|·|index_bucket|, never |corpus|² and never
    * new-vs-new. Ids need NOT be disjoint across the two frames: a
    * doc present on both sides (re-crawl of an already-indexed URL)
    * never pairs with itself — the trivial (id, id) self-pair is
    * filtered, so every returned candidate is a genuine cross-side
    * pair. Returns (new_id, index_id) distinct candidates for
    * [[jaccardForPairs]] verification. */
  def minhashCandidatesIncremental(newDf: DataFrame, indexDf: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 32,
      rowsPerBand: Int = 4, shingleSize: Int = 3): DataFrame = {
    val nb = minhashBandsPortable(newDf, idCol, textCol, numHashes,
      rowsPerBand, shingleSize).toDF("new_id", "band_idx", "band_key")
    val ib = minhashBandsPortable(indexDf, idCol, textCol, numHashes,
      rowsPerBand, shingleSize).toDF("index_id", "band_idx", "band_key")
    nb.join(ib, Seq("band_idx", "band_key"))
      .filter(col("new_id") =!= col("index_id"))
      .select(col("new_id"), col("index_id")).distinct()
  }

  /** LSH banding over a SimHash fingerprint column: split the 60-bit
    * fingerprint into `bands` slices of `bitsPerBand`, emit one
    * (band_idx, band_val, id) row per slice, and self-join the
    * buckets — docs agreeing on any full band are candidates. Same
    * bucket-local shape as [[minhashCandidates]]: the band value is a
    * uniform shuffle key and the pair space is |bucket|², never n². */
  def simhashBandCandidates(fp: DataFrame, idCol: String,
      bands: Int = 4, bitsPerBand: Int = 15): DataFrame = {
    val mask = (1L << bitsPerBand) - 1
    // eager localCheckpoint: the self-join reads the bucket table
    // twice and Spark has no cross-branch subplan reuse — without
    // this the whole fingerprint pipeline upstream runs once per
    // side (localCheckpoint, not persist — see minhashCandidates)
    val b = fp.select(col(idCol), posexplode(array((0 until bands).map(j =>
        shiftright(col("simhash"), j * bitsPerBand).bitwiseAND(lit(mask))): _*))
      .as(Seq("band_idx", "band_val")))
      .localCheckpoint(eager = true)
    val l = b.toDF("a_id", "band_idx", "band_val")
    val r = b.toDF("b_id", "band_idx", "band_val")
    l.join(r, Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
  }

  /** Exact n-gram Jaccard for an ARBITRARY candidate pair set
    * (`pairs(a_id, b_id)`) — the verification stage after any
    * candidate miner (simhash bands, minhash LSH). |A∩B| comes from
    * routing each pair through the (id, shingle-hash) table twice —
    * two hash joins keyed on doc id and (id, shingle) — so cost is
    * proportional to candidate shingles, not corpus pairs.
    *
    * Cache note: the shingle-hash rows persist at MEMORY_AND_DISK for
    * the 3-branch fan-out, and that cache is O(corpus shingles) — at
    * 100 TB it spills corpus-scale data to local disk. The
    * alternative is recomputing the narrow shingle pass once per
    * branch (3× scan CPU, zero cache); flip to that trade-off by
    * checkpointing/persisting upstream and dropping this persist if
    * executor disk is the scarcer resource. `shingleStorage` is that
    * knob without a caller-side rewrite: pass
    * `StorageLevel.DISK_ONLY` when the shingle cache must not compete
    * for executor memory, or `StorageLevel.NONE` to recompute the
    * narrow shingle pass per branch instead of caching at all. */
  def jaccardForPairs(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String,
      shingleStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      pairsStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame =
    overlapForPairs(pairs, df, idCol, textCol, shingleStorage,
      pairsStorage).select(col("a_id"), col("b_id"), col("jac"))

  /** Full overlap statistics for verified candidate pairs: shingle
    * intersection size, both set sizes, symmetric Jaccard AND the two
    * asymmetric containments |A∩B|/|A|, |A∩B|/|B| — the quote /
    * near-superset detector (a short doc wholly quoted inside a long
    * one has low Jaccard but containment ≈ 1). Containment always
    * dominates Jaccard (n/|A| ≥ n/|A∪B|), so LSH candidates mined at
    * a Jaccard threshold recall every pair at least that similar;
    * catching tiny-in-huge containment below the Jaccard floor needs
    * a dedicated miner (e.g. partial-signature banding), which is why
    * the battery entry gates the candidates it mines, not all-pairs
    * recall. Same plan shape as [[jaccardForPairs]]: candidate-sized
    * joins only, nothing corpus². */
  def overlapForPairs(pairs: DataFrame, df: DataFrame, idCol: String,
      textCol: String,
      shingleStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
      pairsStorage: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    // both inputs fan out into several join branches; persist so the
    // candidate miner upstream of `pairs` and the shingle pass run
    // once, not once per branch. `pairsStorage` mirrors
    // `shingleStorage` for the candidate cache (O(candidates), usually
    // far smaller than shingles): NONE re-runs the miner per branch
    // instead of caching.
    val cachePairs =
      pairsStorage != org.apache.spark.storage.StorageLevel.NONE
    val cacheShingles =
      shingleStorage != org.apache.spark.storage.StorageLevel.NONE
    val p = if (cachePairs) pairs.persist(pairsStorage) else pairs
    val rows0 = shingleHashRows(df, idCol, textCol)
    val rows = if (cacheShingles) rows0.persist(shingleStorage) else rows0
    val sizes = rows.groupBy(col(idCol)).agg(count(lit(1)).as("n_sh"))
    val inter = p
      .join(rows.toDF("a_id", "s"), Seq("a_id"))
      .join(rows.toDF("b_id", "s"), Seq("b_id", "s"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
    val full = p
      .join(sizes.toDF("a_id", "a_n"), Seq("a_id"))
      .join(sizes.toDF("b_id", "b_n"), Seq("b_id"))
      .join(inter, Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        col("a_n"), col("b_n"),
        (coalesce(col("n_inter"), lit(0L)).cast("double") /
          (col("a_n") + col("b_n") - coalesce(col("n_inter"), lit(0L)))
            .cast("double")).as("jac"))
      .select(col("a_id"), col("b_id"), col("n_inter"), col("a_n"),
        col("b_n"), col("jac"),
        (col("n_inter").cast("double") / col("a_n").cast("double"))
          .as("containment_a"),
        (col("n_inter").cast("double") / col("b_n").cast("double"))
          .as("containment_b"))
    // when anything was cached: eagerly materialize the pair-grain
    // output and release the caches before returning (the
    // bradleyTerryMicro discipline). NONE-storage callers keep the
    // fully lazy plan they asked for.
    if (!cachePairs && !cacheShingles) full
    else {
      val out = full.localCheckpoint(eager = true)
      if (cachePairs) p.unpersist(blocking = false)
      if (cacheShingles) rows.unpersist(blocking = false)
      out
    }
  }

  /** Connected components over a verified candidate-pair edge list
    * `pairs(a_id, b_id)` — the retention step that turns near-dup
    * PAIRS into duplicate CLUSTERS (keep one representative per
    * component, usually the min id).
    *
    * Alternating large-star/small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): each
    * round every vertex re-hangs its larger neighbors, then its
    * smaller ones, onto the minimum of its neighborhood. Rounds
    * needed are O(log n) regardless of component DIAMETER — a
    * 1000-vertex path closes in ~10 rounds where per-round min-label
    * propagation (this function's previous shape) needs ~1000. Each
    * round is two groupBy+join passes over the edge list; the driver
    * reads one (count, checksum) scalar per round to detect the
    * fixpoint — label rows never collect. At fixpoint the edge list
    * IS the answer: a star forest rooted at each component's min id,
    * deterministic under any partitioning.
    *
    * Returns (id, cluster_id) for every vertex with ≥1 edge. Rounds
    * truncate lineage with `localCheckpoint()` — iterating on raw
    * DataFrames would nest each round's plan inside the next and blow
    * the driver up around round 10; checkpointed round state is
    * graph-sized and executor-resident, and the ContextCleaner
    * reclaims superseded rounds. (For failure-tolerant long chains,
    * `sparkContext.setCheckpointDir` + `.checkpoint()` is the
    * durable variant of the same seam.) */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // persist the pair list FIRST: the vertex set and the initial edge
    // orientation both read it, and without the cache the (possibly
    // expensive) candidate pipeline upstream would run once per read
    val p = pairs.persist(lvl)
    // One count materializes the miner AND sizes the rounds: verified
    // near-dup graphs are usually a sliver of the corpus, so the
    // contraction rounds repartition to ~500k edges/partition instead
    // of inheriting the corpus-sized shuffle width — per-round job
    // overhead stays proportional to the GRAPH, while a 100-TB pair
    // list still fans out to thousands of partitions.
    val nPairs = p.count()
    val parts = math.max(1L, math.min(2000L, nPairs / 500000L + 1L)).toInt
    val verts = p.select(col("a_id").as("id"))
      .unionAll(p.select(col("b_id").as("id")))
      .distinct().repartition(parts, col("id")).localCheckpoint()
    // parent-pointer edges, child > parent; self-pairs drop out
    var edges = p.select(
        greatest(col("a_id"), col("b_id")).as("u"),
        least(col("a_id"), col("b_id")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .repartition(parts, col("u")).localCheckpoint()
    // verts and edges are materialized (localCheckpoint is eager); the
    // upstream pair pipeline will not run again
    p.unpersist(blocking = false)
    // fixpoint signature: (edge count, order-free XOR checksum — edges
    // are distinct, so the multiset is a set and xor can't cancel) —
    // the star forest is the unique edge set that reproduces itself,
    // so one scalar job per round detects convergence without a diff
    // join; bit_xor also can't overflow under ANSI mode, unlike sum
    def signature(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        bit_xor(xxhash64(col("u"), col("v")))).collect()(0)
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = signature(edges)
    var iter = 0
    var done = sig._1 == 0L
    while (!done && iter < maxIter) {
      // large-star: m(u) = min of u's closed neighborhood; every
      // neighbor v > u re-hangs onto m(u). Emitted (v, m) has
      // v > u ≥ m, so orientation survives with no self-loops.
      val sym = edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val lm = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val afterLarge = sym.join(lm, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: each vertex and its smaller neighbors re-hang onto
      // the minimum of that closed neighborhood
      val sm = afterLarge.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = afterLarge.join(sm, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(sm.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
        .repartition(parts, col("u"))
        .localCheckpoint() // eager: truncates this round's lineage
      val nsig = signature(next)
      edges = next
      done = nsig == sig
      sig = nsig
      iter += 1
    }
    if (!done)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"duplicateClusters stopped at maxIter=$maxIter without converging: " +
          "the star contraction has not reached its fixpoint and the returned " +
          "cluster labels may not be component minima — raise maxIter")
    // at fixpoint each child has exactly one parent (its component
    // min); the groupBy(min) only matters on a maxIter bail-out, where
    // a vertex can still carry two parent edges
    verts.join(edges.toDF("id", "label"), Seq("id"), "left")
      .groupBy(col("id")).agg(min(col("label")).as("ml"))
      .select(col("id"), coalesce(col("ml"), col("id")).as("cluster_id"))
  }

  /** End-of-pipeline quality-aware dedup: mine near-dup clusters
    * (portable MinHash banding → exact Jaccard ≥ `minJac` →
    * [[duplicateClusters]] star contraction) and keep the LONGEST
    * member of each cluster (whitespace token count, ties to the
    * smaller id) — the "keep the most complete copy" policy real
    * curation pipelines apply, vs [[exact]]/p27's keep-min-id.
    * Documents outside any cluster are their own singleton cluster
    * and are always kept.
    *
    * The representative argmax is a partial-combined `min` of a
    * (-n_tokens, id) struct per cluster — an aggregate, never a
    * window, so per-cluster state is one struct at any corpus size.
    * Output: (idCol, cluster_id, cluster_size, n_tokens, keep). */
  def keepBestPerCluster(df: DataFrame, idCol: String, textCol: String,
      minJac: Double = 0.5): DataFrame = {
    val cand = minhashCandidatesPortable(df, idCol, textCol)
    val pairs = jaccardForPairs(cand, df, idCol, textCol)
      .filter(col("jac") >= minJac)
    val comp = duplicateClusters(pairs)
    val scored = df.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val withCl = scored
      .join(comp.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
    val reps = withCl.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        min(struct((-col("n_tokens")).as("nt"), col(idCol).as("id")))
          .as("__best"))
      .select(col("cluster_id"), col("cluster_size"),
        col("__best.id").as("__rep"))
    withCl.join(reps, Seq("cluster_id"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("n_tokens"),
        when(col(idCol) === col("__rep"), 1).otherwise(0).as("keep"))
  }

  /** n-gram Jaccard similarity between two shingle-set columns
    * (array formulation — fine for ad-hoc pairs). */
  /** Exact-substring duplication profile (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr criterion, approximated at n-token granularity):
    * for every document, the fraction of its n-gram POSITIONS whose
    * gram occurs more than once corpus-wide (cross-doc spans and
    * within-doc repeats both count, as in the paper's suffix-array
    * scan). Documents shorter than n tokens emit no row.
    *
    * Where the paper builds a corpus suffix array, the distributed
    * shape is: one codegen pass emits each position's 8-byte gram
    * hash ([[graft.functions.ShingleHashes]] positional mode — gram
    * strings never leave the row), one hash aggregate counts
    * occurrences per gram, and one hash join tags every position with
    * its gram's corpus count — all keyed on the 8-byte hash, so the
    * shuffled bytes are O(positions × 8 B), not O(text × n). The
    * poly hash keeps every hash ANSI-SQL-replayable.
    *
    * Cache note: the positional stream persists at MEMORY_AND_DISK
    * because both the count aggregate and the tagging join consume
    * it; that cache is O(corpus positions × 12 B) — at 100 TB prefer
    * the recompute trade (drop the persist; the codegen pass is
    * scan-speed) or checkpoint to cluster storage. The doc-grain
    * result is materialized eagerly and the cache released before
    * returning, so long-lived sessions accumulate nothing. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val g = df.select(col(idCol),
        explode(graft.functions.ShingleHashes(col(textCol), n, poly = true,
          distinct = false)).as("gh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = g.groupBy(col("gh")).agg(count(lit(1)).as("cnt"))
    // doc-grain output (4 narrow columns) materialized eagerly so the
    // positional cache releases before returning
    val out = g.join(counts, Seq("gh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("cnt") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .select(col(idCol), col("n_grams"), col("n_dup_grams"),
        (col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"))
      .localCheckpoint(eager = true)
    g.unpersist(blocking = false)
    out
  }

  /** Maximal exact duplicated substrings (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr tier, at n-token fingerprint granularity): every
    * maximal token span of ≥ `minTokens` tokens shared VERBATIM by a
    * document pair, with both start positions. This is the dedup tier
    * n-gram thresholds blur: a 200-token verbatim quote inside two
    * otherwise-different documents barely moves their Jaccard, but is
    * exactly what contaminates training data.
    *
    * Where the paper concatenates the corpus into one suffix array,
    * the distributed shape is: the positional gram-hash stream (one
    * codegen pass, [[graft.functions.ShingleHashes]] positional mode
    * — gram strings never leave the row), a hash-BUCKETED positional
    * match join (pair volume Σ_h cnt(h)², never corpus²), and a
    * gaps-and-islands run-merge: positional matches of a pair on one
    * DIAGONAL (a_pos − b_pos constant) with consecutive a_pos merge
    * into one maximal span of run + n − 1 tokens. The run-merge
    * window partitions by (pair, diagonal) — bounded by the shorter
    * document's length, never the corpus.
    *
    * The poly hash keeps every fingerprint ANSI-SQL-replayable (the
    * p44 discipline): an oracle recomputes identical hashes, so even
    * a mod-1e9+7 collision reproduces identically on both sides.
    *
    * Hot-gram cap: the match join's pair volume is Σ_h cnt(h)², so a
    * BOILERPLATE gram — a license header or templated HTML that
    * occurs c times corpus-wide — would produce c² match rows. Grams
    * whose corpus position count exceeds `maxGramFreq` are excluded
    * from matching BEFORE the join (pair volume per gram is then
    * ≤ maxGramFreq²), the same block-filtering discipline as
    * [[stitchPairs]]' boundary cap and [[fuzzyLinkPairs]]' block cap.
    * A span crossing a dropped gram position splits at that position
    * (each piece still reported if ≥ `minTokens`); the cap is never
    * silent — [[exactSubstringOversized]] reports what was dropped.
    *
    * Cache note: with `cachePositions` (default) the positional
    * stream persists at MEMORY_AND_DISK because both the gram-count
    * aggregate and the match join consume it — O(corpus positions ×
    * 12 B). At 100 TB prefer the recompute trade (`cachePositions =
    * false`: the codegen gram pass is scan-speed, so each consumer
    * re-reads the scan instead of a corpus-sized cache) or
    * checkpoint the stream to cluster storage. The span result is
    * materialized eagerly (localCheckpoint — it is span-sized, tiny
    * next to the positional stream) so the cache is RELEASED before
    * returning: long-lived engine sessions accumulate nothing (the
    * [[Ratings.bradleyTerryMicro]] cached-buffer discipline, r16
    * verdict item 3).
    *
    * Returns (a_id, b_id, a_pos, b_pos, span_tokens) — 1-based token
    * positions, one row per MAXIMAL cross-doc span ≥ `minTokens`
    * tokens; sub-spans of a reported span never appear. */
  def exactSubstringSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minTokens: Int = 16, maxGramFreq: Int = 1000,
      cachePositions: Boolean = true): DataFrame = {
    require(n >= 1, s"gram width $n must be >= 1")
    require(minTokens >= n,
      s"minTokens $minTokens must be >= the gram width $n")
    require(maxGramFreq >= 2, s"maxGramFreq $maxGramFreq must be >= 2")
    val g0 = positionalGrams(df, idCol, textCol, n)
    val g = if (cachePositions)
      g0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else g0
    // hot list first: tiny (only grams over the cap — the skew
    // tail), so the anti join broadcasts; the kept stream never
    // rematerializes per gram
    val hot = g.groupBy(col("__gh")).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > maxGramFreq).select(col("__gh"))
    val gk = g.join(hot, Seq("__gh"), "left_anti")
      .select(col("__id"), col("__pos"), col("__gh"))
    val m = gk.toDF("a_id", "a_pos", "gh")
      .join(gk.toDF("b_id", "b_pos", "gh"), Seq("gh"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"))
    val spans = mergeRuns(m, n, minTokens)
    if (!cachePositions) spans
    else {
      // eager span materialization → the positional cache is fully
      // consumed and can be released before returning
      val out = spans.localCheckpoint(eager = true)
      g.unpersist(blocking = false)
      out
    }
  }

  /** Companion report for [[exactSubstringSpans]]' hot-gram cap: how
    * many distinct grams (and gram positions) `maxGramFreq` excluded
    * from matching — the no-silent-caps contract ([[stitchOversized]]
    * / [[fuzzyLinkOversized]] pattern). One codegen gram pass + one
    * hash aggregate; always one row. */
  def exactSubstringOversized(df: DataFrame, idCol: String,
      textCol: String, n: Int = 8, maxGramFreq: Int = 1000): DataFrame =
    positionalGrams(df, idCol, textCol, n)
      .groupBy(col("__gh")).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > maxGramFreq)
      .agg(count(lit(1)).as("n_grams_dropped"),
        coalesce(sum(col("__cnt")), lit(0L)).as("n_positions_dropped"))

  /** ExactSubstr span REMOVAL (Lee et al. 2022 — the paper CUTS the
    * duplicated spans from the corpus rather than dropping whole
    * documents): every maximal verbatim span ≥ `minTokens` tokens
    * found by [[exactSubstringSpans]] is removed from the HIGHER-id
    * document of its pair (keep-first ownership, the [[spanDedup]]
    * discipline — the lower-id occurrence survives verbatim), and
    * each document's surviving tokens are reassembled in order with
    * single spaces. Pure consequence of the span report: an external
    * engine that replays the spans replays the cleaned text
    * byte-for-byte (md5-verifiable).
    *
    * Scale shape: the span report (hash-bucketed, hot-gram-capped —
    * see [[exactSubstringSpans]]), ONE per-doc aggregate collecting
    * that doc's cut intervals (span-report-sized, bounded per doc by
    * doc length / minTokens), one hash join back onto the corpus,
    * and a narrow higher-order-function pass that drops covered
    * token positions — no shuffle touches the text beyond the one
    * id-keyed join, and the interval list rides the row.
    *
    * Returns (id, text_clean, n_tokens, n_tokens_cut); documents
    * with no spans pass through with n_tokens_cut = 0 (text_clean is
    * the canonical single-space token join of the original). */
  def exactSubstringRemove(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minTokens: Int = 16, maxGramFreq: Int = 1000,
      cachePositions: Boolean = true): DataFrame = {
    val spans = exactSubstringSpans(df, idCol, textCol, n, minTokens,
      maxGramFreq, cachePositions)
    applySpanCuts(df, idCol, textCol, spans)
  }

  /** Decontamination REMOVAL — the cross-side twin of
    * [[exactSubstringRemove]] (Lee et al. 2022 §6.2 applied as a
    * CUT): every maximal verbatim span ≥ `minTokens` tokens that a
    * TRAINING document shares with any LEFT/eval document (per
    * [[exactSubstringSpansAcross]]) is removed from the TRAINING
    * occurrence — the benchmark side stays untouched, the training
    * corpus comes back clean enough that the contamination evidence
    * is gone span-for-span. Same bounded machinery as the report:
    * eval-bounded match join, hot-gram cap on the training side,
    * span-report-sized cut lists riding one id-keyed join.
    *
    * Returns the TRAINING corpus as (id, text_clean, n_tokens,
    * n_tokens_cut); uncontaminated documents pass through with
    * n_tokens_cut = 0. */
  def exactSubstringDecontam(left: DataFrame, right: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8, minTokens: Int = 16, maxGramFreq: Int = 1000): DataFrame = {
    val spans = exactSubstringSpansAcross(left, right, idCol, textCol,
      n, minTokens, maxGramFreq)
    applySpanCuts(right, idCol, textCol, spans)
  }

  /** Shared cut-application for the ExactSubstr removal family:
    * aggregate each document's cut intervals from the span report's
    * b-side (the occurrence designated for removal), join them onto
    * the corpus, and drop covered token positions in one narrow
    * higher-order-function pass — the interval list rides the row,
    * bounded per doc by doc length / minTokens. */
  private def applySpanCuts(df: DataFrame, idCol: String,
      textCol: String, spans: DataFrame): DataFrame = {
    val cuts = spans.select(col("b_id").as("__cid"),
        struct(col("b_pos").as("s"),
          (col("b_pos") + col("span_tokens") - 1L).as("e")).as("__iv"))
      .groupBy(col("__cid"))
      .agg(collect_list(col("__iv")).as("__cuts"))
    df.select(col(idCol), tokens(coalesce(col(textCol), lit(""))).as("__tk"))
      .join(cuts, col(idCol) === col("__cid"), "left")
      .select(col(idCol), col("__tk"),
        coalesce(col("__cuts"),
          array().cast("array<struct<s:bigint,e:bigint>>")).as("__cuts"))
      .select(col(idCol), col("__tk"),
        filter(sequence(lit(1), size(col("__tk"))),
          i => !exists(col("__cuts"), iv =>
            i.cast("long") >= iv.getField("s") &&
              i.cast("long") <= iv.getField("e"))).as("__keep"))
      .select(col(idCol),
        array_join(transform(col("__keep"),
          i => element_at(col("__tk"), i)), " ").as("text_clean"),
        size(col("__tk")).cast("long").as("n_tokens"),
        (size(col("__tk")) - size(col("__keep"))).cast("long")
          .as("n_tokens_cut"))
  }

  /** Cross-side twin of [[exactSubstringSpans]] — the DECONTAMINATION
    * application (Lee et al. 2022 §6.2 run ExactSubstr between train
    * and eval): maximal verbatim spans of ≥ `minTokens` tokens shared
    * by a LEFT-side document (e.g. an evaluation/benchmark set) and a
    * RIGHT-side document (the training corpus), with both positions —
    * the span-level evidence an n-gram decontamination threshold
    * blurs. Left-left and right-right duplicates are NOT reported
    * (that is [[exactSubstringSpans]]'s job); callers pass disjoint
    * document sets — and as a guard, a pair whose ids COLLIDE across
    * the sides is dropped (an overlapping id would otherwise report
    * a trivial full-length self-match span). Same distributed shape:
    * two positional gram-hash streams, one hash-bucketed match join
    * (volume Σ_h cntL(h)·cntR(h) — benchmark-side counts are tiny,
    * so the join is eval-bounded), one gaps-and-islands run-merge
    * per (pair, diagonal).
    *
    * Hot-gram cap: a boilerplate gram hot on BOTH sides is the
    * remaining quadratic hazard; grams whose TRAINING-side position
    * count exceeds `maxGramFreq` are excluded before the join (the
    * eval side needs no cap — its counts bound the other factor).
    * [[exactSubstringOversized]] over the right frame reports what
    * was dropped.
    *
    * Returns (a_id, b_id, a_pos, b_pos, span_tokens): a = left/eval
    * doc, b = right/corpus doc, 1-based token positions, one row per
    * maximal shared span. */
  def exactSubstringSpansAcross(left: DataFrame, right: DataFrame,
      idCol: String, textCol: String,
      n: Int = 8, minTokens: Int = 16, maxGramFreq: Int = 1000): DataFrame = {
    require(n >= 1, s"gram width $n must be >= 1")
    require(minTokens >= n,
      s"minTokens $minTokens must be >= the gram width $n")
    require(maxGramFreq >= 2, s"maxGramFreq $maxGramFreq must be >= 2")
    val gl = positionalGrams(left, idCol, textCol, n)
    val gr0 = positionalGrams(right, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hot = gr0.groupBy(col("__gh")).agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") > maxGramFreq).select(col("__gh"))
    val gr = gr0.join(hot, Seq("__gh"), "left_anti")
      .select(col("__id"), col("__pos"), col("__gh"))
    val m = gl.toDF("a_id", "a_pos", "gh")
      .join(gr.toDF("b_id", "b_pos", "gh"), Seq("gh"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"))
    // eager span materialization releases the training-side
    // positional cache before returning (the bradleyTerryMicro
    // cached-buffer discipline)
    val out = mergeRuns(m, n, minTokens).localCheckpoint(eager = true)
    gr0.unpersist(blocking = false)
    out
  }

  /** One row per n-gram POSITION: (id, 1-based pos, poly gram hash)
    * — the [[graft.functions.ShingleHashes]] positional stream the
    * exact-substring family consumes. */
  private def positionalGrams(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("__id"),
        posexplode(graft.functions.ShingleHashes(col(textCol), n,
          poly = true, distinct = false)).as(Seq("__p", "__gh")))
      .select(col("__id"), (col("__p") + 1).cast("long").as("__pos"),
        col("__gh"))

  /** Gaps-and-islands run-merge over positional matches
    * m(a_id, b_id, a_pos, b_pos): consecutive matches on one diagonal
    * (a_pos − b_pos constant) merge into one maximal span of
    * run + n − 1 tokens; spans below `minTokens` drop. The window
    * partitions by (pair, diagonal) — bounded by the shorter
    * document, never the corpus. */
  private def mergeRuns(m: DataFrame, n: Int, minTokens: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id"), col("b_id"), col("a_pos") - col("b_pos"))
      .orderBy(col("a_pos"))
    m.withColumn("__island", col("a_pos") - row_number().over(w))
      .groupBy(col("a_id"), col("b_id"),
        (col("a_pos") - col("b_pos")).as("__diag"), col("__island"))
      .agg(min(col("a_pos")).as("a_pos"), min(col("b_pos")).as("b_pos"),
        (count(lit(1)) + lit(n - 1)).cast("long").as("span_tokens"))
      .filter(col("span_tokens") >= minTokens)
      .select(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"),
        col("span_tokens"))
  }

  def jaccard(aSh: Column, bSh: Column): Column =
    size(array_intersect(aSh, bSh)).cast("double") /
      size(array_union(aSh, bSh)).cast("double")

  /** Jaccard between each doc and the doc with id+`offset`, computed
    * with a single big exchange and no self-join. Each doc's shingle
    * set is attributed to the pair(s) it participates in — as the A
    * side of pair `id` and the B side of pair `id-offset` — then one
    * groupBy(pair, shingle) marks which sides contain each shingle
    * and a second (partial-aggregated, tiny) groupBy(pair) counts
    * |A|, |B| and |A∩B|; jac = |A∩B| / (|A|+|B|-|A∩B|).
    *
    * The earlier formulation (shingle rows → distinct → two-sided
    * equi self-join → three joins of the aggregates) moved the
    * shingle table through three shuffles plus a window; this shape
    * moves it through ONE (the tag union is map-side, and the final
    * per-pair sums combine map-side before the second exchange). The
    * same shape extends to arbitrary candidate pair sets (e.g.
    * minhashCandidates output) at any scale. */
  def jaccardAdjacent(df: DataFrame, idCol: String, textCol: String,
      offset: Int = 1): DataFrame = {
    val rows = shingleHashRows(df, idCol, textCol)
    val tagged = rows.select(col(idCol).as("pair"), col("s"),
        lit(1).as("in_a"), lit(0).as("in_b"))
      .unionAll(rows.select((col(idCol) - offset).as("pair"), col("s"),
        lit(0).as("in_a"), lit(1).as("in_b")))
    val perShingle = tagged.groupBy(col("pair"), col("s"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    perShingle.groupBy(col("pair"))
      .agg(
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("n_inter"),
        sum(col("in_a")).as("a_n"),
        sum(col("in_b")).as("b_n"))
      // pairs where both docs produced ≥1 shingle, like the join form
      .filter(col("a_n") > 0 && col("b_n") > 0)
      .select(col("pair").as(idCol),
        (col("n_inter").cast("double") /
          (col("a_n") + col("b_n") - col("n_inter")).cast("double")).as("jac"))
  }

  /** Snapshot diff between two corpus versions — the daily-crawl
    * delta report an ingest pipeline runs before reprocessing:
    * classify every id as added / removed / changed / unchanged by
    * comparing content FINGERPRINTS (md5 of the content column —
    * engine-portable, so an external system can replay the exact
    * classification), and report counts plus id bounds per status.
    * This is the corpus-level sibling of the engine's row-level
    * change data feed (`GraftEngine.changes`): that one tracks a
    * managed table's committed versions; this one diffs two
    * arbitrary frames that never shared a lineage.
    *
    * Scale shape: ONE full-outer hash join on the id — both sides
    * pre-shrunk to (id, 16-byte digest), so the exchange carries
    * fingerprints, never content — then a 4-key partial-combined
    * rollup. Nothing quadratic, nothing driver-sized.
    *
    * Returns (status, n, min_id, max_id) ordered by status. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      contentCol: String): DataFrame = {
    // presence markers, NOT hash nullity, decide added/removed — a
    // row whose content is NULL must still count as present (its
    // digest is null); content equality is null-safe so null==null
    // is unchanged, null vs value is changed
    val o = oldDf.select(col(idCol).as("__id"),
      md5(col(contentCol).cast("string")).as("__oh"),
      lit(true).as("__op"))
    val n = newDf.select(col(idCol).as("__id"),
      md5(col(contentCol).cast("string")).as("__nh"),
      lit(true).as("__np"))
    o.join(n, Seq("__id"), "full_outer")
      .select(col("__id"),
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(!(col("__oh") <=> col("__nh")), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"), min(col("__id")).as("min_id"),
        max(col("__id")).as("max_id"))
      .orderBy(col("status"))
  }

  /** Blocked fuzzy record linkage: candidate pairs whose `textCol`
    * values are within `maxDist` edit distance, generated ONLY
    * within a blocking key (Fellegi & Sunter 1969; the
    * blocking-survey taxonomy of Christen 2012). The standard
    * entity-resolution step for catalog/author/address-style data
    * where exact and shingle dedup both miss single-typo variants.
    *
    * Scale shape: a self-equi-join on the block key (never
    * all-pairs), with OVERSIZED BLOCKS DROPPED up front
    * (`maxBlockSize` — the standard practice Christen calls block
    * filtering: a block of b rows costs b² comparisons, and a
    * degenerate key like an empty string would otherwise pull the
    * whole corpus into one quadratic cell; the dropped blocks are
    * reported by [[fuzzyLinkOversized]]'s count so the cap is never
    * silent). Pair volume is bounded by |blocks|·cap². The edit
    * distance runs as Spark's codegen `levenshtein(l, r, threshold)`
    * — the banded O(maxDist·len) early-exit form, not the full DP
    * matrix. Block keys should be chosen so block population stays
    * roughly corpus-independent (more blocks, not bigger blocks, as
    * the corpus grows — same sizing rule as IVF cells).
    *
    * Returns (id_a, id_b, dist), id_a < id_b, dist ≤ maxDist. */
  def fuzzyLinkPairs(records: DataFrame, idCol: String, textCol: String,
      blockCol: Column, maxDist: Int, maxBlockSize: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist $maxDist must be >= 0")
    require(maxBlockSize >= 2, s"maxBlockSize $maxBlockSize must be >= 2")
    val r = records.select(blockCol.cast("string").as("__b"),
      col(idCol).as("__id"), col(textCol).cast("string").as("__t"))
    val small = r.groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBlockSize)
      .select(col("__b"))
    val rr = r.join(small, Seq("__b"), "left_semi")
    val a = rr.select(col("__b"), col("__id").as("id_a"), col("__t").as("__ta"))
    val b = rr.select(col("__b"), col("__id").as("id_b"), col("__t").as("__tb"))
    a.join(b, Seq("__b"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__ta"), col("__tb"), maxDist).as("dist"))
      .filter(col("dist") >= 0) // threshold form returns -1 past maxDist
  }

  /** Companion report for [[fuzzyLinkPairs]]'s block-size cap: the
    * number of blocks (and rows) excluded at `maxBlockSize` — the
    * no-silent-caps contract. */
  def fuzzyLinkOversized(records: DataFrame, blockCol: Column,
      maxBlockSize: Int): DataFrame =
    records.select(blockCol.cast("string").as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") > maxBlockSize)
      .agg(count(lit(1)).as("n_blocks_dropped"),
        coalesce(sum(col("__bn")), lit(0L)).as("n_rows_dropped"))

  /** Deterministic token-dropout twins: for each row, a perturbed
    * copy whose tokens are dropped where the Carter-Wegman mix of
    * (portable doc seed, position) lands under `dropPpm` — the
    * planted-near-duplicate generator for dedup-recall evaluation
    * (the p78 quantization-fidelity idea applied to the dedup stack).
    * Pure (id, position) function: twins are identical on any
    * partitioning and an ANSI engine rebuilds them token-for-token.
    * Twin ids are `id + idOffset`; the caller unions twins with the
    * originals and asks the candidate miner to find the pairs.
    * Narrow: tokenize, one filtered-position pass, re-join — no
    * shuffle. */
  def dropoutTwins(df: DataFrame, idCol: String, textCol: String,
      dropPpm: Long, idOffset: Long): DataFrame = {
    require(dropPpm >= 1 && dropPpm < 1000000L,
      s"dropPpm $dropPpm must be in [1, 1e6)")
    val P = 2147483647L
    // coalesce mirrors the oracle: a NULL document yields an empty
    // twin, not a NULL one (and never hits legacy sizeOfNull=-1,
    // where sequence(1,-1) would count DOWN into garbage positions)
    df.select(col(idCol),
        tokens(coalesce(col(textCol), lit(""))).as("__tk"),
        pmod(TextAnalysis.portableHash60(col(idCol).cast("string")),
          lit(P)).as("__seed"))
      .select((col(idCol) + lit(idOffset)).as(idCol),
        array_join(transform(filter(sequence(lit(1), size(col("__tk"))),
          i => pmod(pmod(lit(1103515245L) *
            pmod(col("__seed") + i.cast("long") * lit(1013904223L),
              lit(P)) + lit(12345L), lit(P)), lit(1000000L)) >=
            lit(dropPpm)),
          i => element_at(col("__tk"), i)), " ").as(textCol))
  }

  /** Concatenation-stitch detection: pairs (a, b) where a's last `k`
    * tokens EXACTLY equal b's first `k` tokens — the seam left when
    * a pipeline chunks one source document into two (or re-joins
    * chunks with an overlap window), a dedup class MinHash misses
    * because the documents as wholes are dissimilar. Boundary
    * equality is exact token equality on the joined string (tokens
    * contain no whitespace, so the join is bijective).
    *
    * Scale shape: one narrow tokenize pass per side, then an
    * equi-join on the boundary string — hash-partitioned, pair space
    * Σ|suffixes(g)|·|prefixes(g)| per boundary g. Boilerplate
    * boundaries (a shared header/footer) are the skew hazard: any
    * boundary occurring more than `maxBoundaryFreq` times on either
    * side is EXCLUDED from matching (pair space per boundary is then
    * ≤ maxBoundaryFreq²), and [[stitchOversized]] reports what was
    * dropped — the no-silent-caps contract.
    *
    * Returns (a_id, b_id, boundary). */
  def stitchPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxBoundaryFreq: Int): DataFrame = {
    require(k >= 1, s"k $k must be >= 1")
    require(maxBoundaryFreq >= 1,
      s"maxBoundaryFreq $maxBoundaryFreq must be >= 1")
    // (id, prefix-boundary, suffix-boundary) in ONE tokenize pass,
    // persisted: four consumers read it (two join sides, two hot
    // aggregates) and Spark has no cross-branch subplan reuse — the
    // unpersisted shape re-tokenized the corpus per consumer. The
    // cache is 2 boundary strings per doc, O(docs), never O(text).
    val t = df.select(col(idCol).as("__id"),
        tokens(coalesce(col(textCol), lit(""))).as("__tk"))
      .filter(size(col("__tk")) >= k)
      .select(col("__id"),
        array_join(slice(col("__tk"), 1, k), " ").as("__pre"),
        array_join(slice(col("__tk"), -k, k), " ").as("__suf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pre = t.select(col("__id").as("b_id"), col("__pre").as("boundary"))
    val suf = t.select(col("__id").as("a_id"), col("__suf").as("boundary"))
    def hot(side: DataFrame) = side.groupBy(col("boundary"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBoundaryFreq).select(col("boundary"))
    // both anti joins read the hot list — persist so it aggregates
    // once (it is tiny: boundaries over the cap, the skew tail)
    val dropped = hot(pre).union(hot(suf)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pair-grain output materialized eagerly so both caches release
    // before returning (the bradleyTerryMicro discipline)
    val out = suf.join(dropped, Seq("boundary"), "left_anti")
      .join(pre.join(dropped, Seq("boundary"), "left_anti"),
        Seq("boundary"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("boundary"))
      .localCheckpoint(eager = true)
    Seq(t, dropped).foreach(_.unpersist(blocking = false))
    out
  }

  /** Companion report for [[stitchPairs]]' boundary-frequency cap:
    * how many boundaries (and suffix/prefix rows) the cap excluded. */
  def stitchOversized(df: DataFrame, idCol: String, textCol: String,
      k: Int, maxBoundaryFreq: Int): DataFrame = {
    val t = df.select(col(idCol).as("__id"),
        tokens(coalesce(col(textCol), lit(""))).as("__tk"))
      .filter(size(col("__tk")) >= k)
    val sides = t.select(lit("prefix").as("side"),
        array_join(slice(col("__tk"), 1, k), " ").as("boundary"))
      .unionAll(t.select(lit("suffix").as("side"),
        array_join(slice(col("__tk"), -k, k), " ").as("boundary")))
    sides.groupBy(col("side"), col("boundary"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBoundaryFreq)
      .groupBy(col("side"))
      .agg(count(lit(1)).as("n_boundaries_dropped"),
        sum(col("__n")).as("n_rows_dropped"))
  }

  /** Line-level boilerplate removal (the CCNet / RefinedWeb
    * discipline: web corpora carry navigation bars, cookie banners
    * and footer lines VERBATIM across thousands of pages, and
    * paragraph/line-grain cross-document deduplication removes them
    * where document-grain dedup cannot): a non-blank line occurring
    * in at least `minDocs` DISTINCT documents is boilerplate, and
    * every occurrence is cut; blank lines never count toward the
    * threshold and are always kept (they are structure, not
    * content). Kept lines re-join in original order, reported as the
    * [[exactSubstringRemoval]] family's kept_md5 fingerprint so the
    * output stays doc-grain no matter how wide the documents are.
    *
    * Scale shape: one split pass, a distinct + count aggregate at
    * LINE-HASH grain (the only line-grain exchange — the md5 key
    * keeps wide lines out of the shuffle), a hash-keyed tag join,
    * and one doc-grain rollup. The hot-line table is the skew tail
    * (only lines over the threshold), tiny by construction.
    *
    * Returns (idCol, n_lines, n_boiler_lines, kept_md5), one row per
    * document; kept_md5 = md5 of the kept lines joined with '\n'
    * (md5 of "" when everything was boilerplate). */
  def lineBoilerplate(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, s"minDocs $minDocs must be >= 2")
    val lines = df.select(col(idCol).as("__id"),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos", "__line")))
    val hot = lines.filter(trim(col("__line")) =!= "")
      .select(col("__id"), md5(col("__line")).as("__lh")).distinct()
      .groupBy(col("__lh")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__lh"))
    lines
      .withColumn("__lh",
        when(trim(col("__line")) =!= "", md5(col("__line"))))
      .join(hot.withColumn("__boiler", lit(1)), Seq("__lh"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("__boiler").isNotNull, 1L).otherwise(0L))
          .as("n_boiler_lines"),
        // collect_list drops the NULL (boilerplate) branches; the
        // default struct sort orders by the leading __pos field, so
        // kept lines re-join in document order
        md5(array_join(expr(
          """transform(
            |  array_sort(collect_list(CASE WHEN __boiler IS NULL
            |    THEN struct(__pos AS p, __line AS l) END)),
            |  x -> x.l)""".stripMargin), "\n")).as("kept_md5"))
      .select(col("__id").as(idCol), col("n_lines"),
        col("n_boiler_lines"), col("kept_md5"))
  }
}
