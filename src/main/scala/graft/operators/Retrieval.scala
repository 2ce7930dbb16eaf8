package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse lexical retrieval and hybrid rank fusion — the search side
  * of a training-data pipeline. Decontamination-by-retrieval,
  * quality-matched subset mining, and eval-leakage lookups all reduce
  * to "find the corpus documents most relevant to this query text";
  * modern pipelines pair the lexical ranking with a dense-embedding
  * ranking and fuse the two.
  *
  * [[bm25TopK]] is Okapi BM25 (Robertson & Walker, TREC-3 1994; the
  * Lucene `ln(1 + …)` idf variant, which keeps idf strictly positive)
  * expressed as an inverted-index join. [[rrfFuse]] is reciprocal-rank
  * fusion (Cormack, Clarke & Buettcher, SIGIR 2009) over a lexical
  * and a dense top-k list.
  *
  * Determinism contract (what makes an ANSI-SQL oracle replay these
  * bit-for-bit, the p40 micro-quantization discipline):
  *  - idf quantizes to integer micro-nats per term BEFORE use — the
  *    only libm call (`ln`) is rounded away at the term level;
  *  - each (query, doc, term) contribution rounds to a long BEFORE
  *    the per-document sum, so the score is exact integer math and
  *    independent of partitioning/order;
  *  - ranking is on (score DESC, doc_id ASC) — a total order.
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval of `docs` for each row of `queries`.
    *
    * score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) /
    *               (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + ½)/(df + ½)). Query terms are
    * de-duplicated (standard for short queries); documents with zero
    * tokens are outside the corpus statistics (N counts docs with ≥1
    * token).
    *
    * Scale shape: NO corpus-sized exchange exists anywhere in the
    * plan. Document lengths are a map-side projection (the nonempty
    * token count of each document — `size(tokens)` corrected for the
    * empty leading field Java regex split emits when the trimmed text
    * starts with non-space whitespace), so corpus statistics reduce to
    * one partial-combined global aggregate; the query-term vocabulary
    * broadcasts and prunes the exploded token stream BEFORE the
    * (doc, term) tf aggregate, so the only data-bearing shuffle
    * carries candidate postings (docs sharing a query term), never the
    * corpus postings. (The previous spelling aggregated the FULL
    * corpus postings first — one O(corpus tokens) exchange per call —
    * only to derive lengths that never needed the shuffle; measured
    * 5.2s → 2.1s at sf0.1, and at 100 TB that exchange IS the job.)
    * Document frequency and idf are computed only for query terms,
    * from the persisted candidate frame. The final top-k is
    * [[TopK.perKey]] map-side heaps — the shuffle carries
    * O(partitions × queries × k) heap rows, never the scored
    * candidate set. Queries are assumed "few" (a broadcastable term
    * list), the regime retrieval-style lookups live in.
    *
    * Output: (query_id, rnk 1..k, doc_id, score_micro) — score in
    * integer micro-nats. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String,
      k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // nonempty-token count per document, map-side: split() keeps
    // empty fields (limit = -1) and trim() strips only 0x20 spaces,
    // so an empty field appears in exactly two places — a single
    // leading one (empty text → [""], text starting with \t/\n →
    // ["", ...]) and a single trailing one (text ending in \t/\n →
    // [..., ""]; consecutive whitespace is ONE delimiter, so each
    // end contributes at most one). Subtracting both cases gives
    // exactly the row count the old explode+filter(length>=1) path
    // aggregated per doc — including the all-whitespace doc
    // ("\t" → ["", ""] → dl 0, correctly outside n_docs).
    // The token array materializes ONCE as a named column before any
    // multi-use: referencing the raw split() expression from size/
    // element_at/explode lets CollapseProject inline it above the
    // Generate, re-tokenizing per EXPLODED TOKEN instead of per doc
    // (measured: the candidate-build stage went 4.2s for 270k token
    // rows at sf0.1 — ~15µs of redundant regex split per row).
    def dlOf(tks: org.apache.spark.sql.Column) = (size(tks) -
      when(element_at(tks, 1) === lit(""), lit(1)).otherwise(lit(0)) -
      when(size(tks) > 1 && element_at(tks, size(tks)) === lit(""), lit(1))
        .otherwise(lit(0)))
      .cast("long")
    val stats = docs
      .select(Dedup.tokens(col(textCol)).as("__tks"))
      .select(dlOf(col("__tks")).as("dl"))
      .filter(col("dl") >= 1)
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("len_total"))
    val qt = queries
      .select(col(qidCol).as("query_id"),
        explode(Dedup.tokens(col(qtextCol))).as("t"))
      .filter(length(col("t")) >= 1)
      .distinct()
    val qterms = qt.select(col("t")).distinct()
    // candidate postings: broadcast-prune the token stream, THEN
    // aggregate tf — the exchange is candidate-sized. dl rides along
    // as a grouping key (constant per doc), so no length join later.
    val cand = docs
      .select(col(idCol).as("doc_id"),
        Dedup.tokens(col(textCol)).as("__tks"))
      .select(col("doc_id"), dlOf(col("__tks")).as("dl"),
        explode(col("__tks")).as("t"))
      .filter(length(col("t")) >= 1)
      .join(broadcast(qterms), Seq("t"))
      .groupBy(col("doc_id"), col("dl"), col("t"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idf = cand.groupBy(col("t")).agg(count(lit(1)).as("dfreq"))
      .crossJoin(broadcast(stats))
      .select(col("t"),
        round(log(lit(1.0) + (col("n_docs") - col("dfreq") + lit(0.5)) /
          (col("dfreq") + lit(0.5))) * 1000000, 0)
          .cast("long").as("idf_micro"))
    // (1.2 + 1.0)-style constants are folded HERE, with the same IEEE
    // adds the oracle SQL writes textually — bit-identical inputs.
    val avgdl =
      col("len_total").cast("double") / col("n_docs").cast("double")
    val termScores = cand
      .crossJoin(broadcast(stats))
      .join(broadcast(idf), Seq("t"))
      .join(broadcast(qt), Seq("t"))
      .select(col("query_id"), col("doc_id"),
        round(col("idf_micro") *
          ((col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
              lit(b) * col("dl") / avgdl))), 0)
          .cast("long").as("term_micro"))
    val scores = termScores.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_micro")).as("score_micro"))
    TopK.perKey(scores, Seq("query_id"), "doc_id", "score_micro", k)
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("score_micro").cast("long").as("score_micro"))
  }

  /** Reciprocal-rank fusion of a lexical and a dense top-k list:
    * rrf(d) = Σ_s 1/(c + rank_s(d)), missing membership contributing
    * zero. Both inputs are (qidCol, idCol, rankCol) frames — already
    * tiny (≤ k rows per query), so every join here is
    * candidate-sized; the only corpus-scale work happened upstream in
    * the two retrievers. The fused score quantizes to micro units
    * after ONE fixed-order add of the two reciprocals (deterministic
    * IEEE), and ties break ascending on doc_id.
    *
    * Output: (query_id, rnk 1..k, doc_id, rrf_micro, rank_lex,
    * rank_dense) — absent-list ranks reported as 0, not null, so
    * hash-based result compares stay NaN-free. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, qidCol: String,
      idCol: String, rankCol: String, k: Int, c: Int = 60): DataFrame = {
    val l = lex.select(col(qidCol).as("query_id"),
      col(idCol).as("doc_id"), col(rankCol).cast("long").as("rank_lex"))
    val d = dense.select(col(qidCol).as("query_id"),
      col(idCol).as("doc_id"), col(rankCol).cast("long").as("rank_dense"))
    // `fused` feeds BOTH the top-k heap and the detail join-back;
    // without a persist each consumer would replay the entire
    // upstream retrieval DAG. The frame is ≤ 2k rows per query.
    val fused = l.join(d, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        col("rank_lex"), col("rank_dense"),
        round((coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_lex")),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_dense")),
            lit(0.0))) * 1000000, 0)
          .cast("long").as("rrf_micro"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    TopK.perKey(fused.select(col("query_id"), col("doc_id"),
        col("rrf_micro")),
      Seq("query_id"), "doc_id", "rrf_micro", k)
      .select(col("query_id"), col("doc_id"), col("rnk"))
      .join(fused, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("rnk").cast("long").as("rnk"),
        col("doc_id"), col("rrf_micro").cast("long").as("rrf_micro"),
        coalesce(col("rank_lex"), lit(0L)).as("rank_lex"),
        coalesce(col("rank_dense"), lit(0L)).as("rank_dense"))
  }

  /** Per-query ranking-quality metrics — the evaluation harness a
    * retrieval stack ships with: MRR, recall@k, and nDCG@k (binary
    * relevance, the Järvelin & Kekäläinen 2002 log2 discount) of a
    * ranked list against a relevance set.
    *
    * `results` is (qidCol, idCol, rankCol); `relevance` is
    * (qidCol, idCol) — the ground-truth pairs, an INPUT here (eval
    * sets are curated upstream). Every metric quantizes to integer
    * micro units with the discount weight rounded per rank BEFORE
    * the DCG sum, so the numbers replay exactly in ANSI SQL.
    * Queries retrieved with zero relevant candidates report 0 for
    * all three metrics (recall of an empty ground truth reads as 0,
    * documented rather than undefined).
    *
    * Scale shape: results lists are ≤ k rows per query, so the hit
    * join, the per-query aggregate, and the IDCG prefix sum (a
    * higher-order fold over a ≤ k-element sequence, inside codegen)
    * are all query-sized; the relevance set joins on
    * (query, doc) — its only corpus-scale touch is the groupBy
    * counting n_rel, a partial-aggregated count. */
  def rankingMetrics(results: DataFrame, qidCol: String, idCol: String,
      rankCol: String, relevance: DataFrame, k: Int = 10): DataFrame = {
    // ≤ k rows per query, consumed by the hit join AND the query
    // anchor — persist so the (possibly expensive) upstream ranking
    // computes once.
    val res = results.select(col(qidCol).as("query_id"),
        col(idCol).as("doc_id"), col(rankCol).cast("long").as("rnk"))
      .filter(col("rnk") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rel = relevance.select(col(qidCol).as("query_id"),
      col(idCol).as("doc_id"))
    val nrel = rel.groupBy(col("query_id")).agg(count(lit(1)).as("n_rel"))
    val perQ = res.join(rel, Seq("query_id", "doc_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"),
        min(col("rnk")).as("first_rank"),
        sum(round(lit(1000000.0) /
          log2(col("rnk").cast("double") + lit(1.0)), 0).cast("long"))
          .as("dcg_micro"))
    val anchored = res.select(col("query_id")).distinct()
      .join(nrel, Seq("query_id"), "left")
      .join(perQ, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_rank"),
        coalesce(col("dcg_micro"), lit(0L)).as("dcg_micro"))
    // Spark's sequence(1, 0) counts DOWN — the n_rel = 0 case needs
    // an explicit zero branch (same guard as Dedup.shingleExpr).
    val idcg = expr(s"""CASE WHEN n_rel = 0 THEN CAST(0 AS BIGINT)
      |ELSE aggregate(sequence(1, CAST(least(n_rel, $k) AS INT)),
      |  CAST(0 AS BIGINT), (acc, i) -> acc +
      |    CAST(round(1000000.0 / log2(CAST(i AS DOUBLE) + 1.0))
      |      AS BIGINT)) END""".stripMargin)
    anchored.select(col("query_id"), col("n_rel"), col("n_hits"),
      coalesce(round(lit(1000000.0) / col("first_rank"), 0).cast("long"),
        lit(0L)).as("mrr_micro"),
      when(col("n_rel") === 0, lit(0L))
        .otherwise(round(lit(1000000.0) * col("n_hits") / col("n_rel"), 0)
          .cast("long")).as("recall_micro"),
      when(col("n_rel") === 0 || col("n_hits") === 0, lit(0L))
        .otherwise(round(lit(1000000.0) * col("dcg_micro") / idcg, 0)
          .cast("long")).as("ndcg_micro"))
  }

  /** All-pairs sparse TF-IDF cosine top-k (Bayardo, Ma & Srikant,
    * WWW'07 "Scaling Up All Pairs Similarity Search" — the
    * posting-list formulation with frequency pruning): the most
    * lexically similar document PAIRS in a corpus, by exact cosine
    * over df-filtered TF-IDF vectors. The lexical sibling of the
    * dense ANN join (`Similarity.annJoin`) and the exact-similarity
    * complement of MinHash banding: paraphrase mining, template
    * detection, and boilerplate clustering all start here.
    *
    * Semantics: weights are the p22 TF-IDF (`n_occ·ln((N+1)/(df+1))`)
    * quantized to MILLI-units (bounds every Long product: w ≤ ~2e6
    * for a 200-token doc, so Σw² and dots stay ≪ 2⁶³), terms are
    * df-filtered to 2 ≤ df ≤ `dfCap`, and cosine is computed over
    * that filtered term subspace — norms included. (df = 1 terms
    * cannot pair; df > dfCap terms are boilerplate that would
    * dominate the posting join while carrying the least idf signal —
    * the cap is the operator CONTRACT, replayed by the oracle, and
    * the standard all-pairs pruning.) Ranking is (cos desc, a, b).
    *
    * Scale shape: the pair space is Σ_t C(df_t, 2) ≤ dfCap·Σ df_t —
    * LINEAR in corpus tokens for a fixed cap (the posting self-join
    * shuffles on the term, each term's group bounded at dfCap rows);
    * the (a,b) dot is one partial-combined sum; norms attach by two
    * |docs|-sized hash joins; top-k fuses to TakeOrderedAndProject.
    * The postings frame persists across its three consumers (norms +
    * both join sides). Returns (a_id, b_id, n_common_terms,
    * cos_micro). */
  def sparseCosineTopK(df: DataFrame, idCol: String, textCol: String,
      dfCap: Int = 500, k: Int = 50): DataFrame = {
    require(dfCap >= 2, s"dfCap $dfCap must be >= 2")
    require(k >= 1, s"k $k must be >= 1")
    val tf = df.select(col(idCol).as("__d"),
        explode(Dedup.tokens(col(textCol))).as("__t"))
      .groupBy(col("__d"), col("__t"))
      .agg(count(lit(1)).as("__n"))
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val nDocs = df.agg(count(lit(1)).as("__nd"))
    val post = tf
      .join(dfreq.filter(col("__df").between(2, dfCap)), Seq("__t"))
      .crossJoin(broadcast(nDocs))
      .select(col("__t"), col("__d"),
        expr("CAST(ROUND(1e3 * (__n * LN((__nd + 1.0) / (__df + 1.0)))) AS BIGINT)")
          .as("__w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // norms stay EXACT sums of squares — rounding √ss to an integer
    // would let identical vectors score cos ≈ 1.0012; √ is taken at
    // the final division (correctly-rounded doubles, ~1e-16 error,
    // far below the micro quantum)
    val norms = post.groupBy(col("__d"))
      .agg(sum(col("__w") * col("__w")).as("__ss"))
    val out = post.select(col("__t"), col("__d").as("a_id"),
        col("__w").as("__wa"))
      .join(post.select(col("__t"), col("__d").as("b_id"),
        col("__w").as("__wb")), Seq("__t"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(sum(col("__wa") * col("__wb")).as("__dot"),
        count(lit(1)).as("n_common_terms"))
      .join(norms.select(col("__d").as("a_id"), col("__ss").as("__sa")),
        Seq("a_id"))
      .join(norms.select(col("__d").as("b_id"), col("__ss").as("__sb")),
        Seq("b_id"))
      .filter(col("__sa") > 0 && col("__sb") > 0)
      .select(col("a_id"), col("b_id"), col("n_common_terms"),
        expr("CAST(ROUND(1e6 * (CAST(__dot AS DOUBLE) / " +
          "(SQRT(CAST(__sa AS DOUBLE)) * SQRT(CAST(__sb AS DOUBLE))))) AS BIGINT)")
          .as("cos_micro"))
      .orderBy(col("cos_micro").desc, col("a_id"), col("b_id"))
      .limit(k)
      .localCheckpoint(eager = true)
    post.unpersist(blocking = false)
    out
  }

  /** Hard-negative mining for embedding-model training — the "BM25
    * negatives" practice (Karpukhin et al. 2020, Dense Passage
    * Retrieval): from a ranked retrieval list, keep the
    * highest-ranked documents NOT in the exclusion set. Random
    * negatives are trivially separable; the confusable top-ranked
    * non-answers are what teach a dense encoder its decision
    * boundary. `exclude` should carry every (query, doc) pair that
    * must not become a negative: the labeled positives, and the
    * query's own source document when it is retrievable.
    *
    * Scale shape: `ranked` is already a top-k list (≤ k rows per
    * query), so everything here is candidate-sized — one hash
    * anti-join against the distinct exclusion pairs, then a per-query
    * re-rank window over ≤ k rows, bounded partitions by
    * construction. The exclusion frame is the one input the CALLER
    * must keep bounded: labeled positives are sparse (a handful per
    * query — fine as-is), but an ATTRIBUTE-derived exclusion ("every
    * same-source doc") is a quadratic cross product if materialized —
    * build it candidate-restricted instead (semi-join the attribute
    * pairs on `ranked` first; exclusion only matters where it
    * intersects the candidates — the p99 battery entry is the
    * worked example, 208s → 43s at its 100× point).
    *
    * Returns every `ranked` column plus `neg_rnk` (1..nNeg, ordered
    * by the original rank), filtered to the first `nNeg` survivors
    * per query. */
  def hardNegatives(ranked: DataFrame, qidCol: String, idCol: String,
      rankCol: String, exclude: DataFrame, exQidCol: String,
      exIdCol: String, nNeg: Int): DataFrame = {
    require(nNeg >= 1, s"nNeg $nNeg must be >= 1")
    val ex = exclude.select(col(exQidCol).as(qidCol), col(exIdCol).as(idCol))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qidCol)).orderBy(col(rankCol))
    ranked.join(ex, Seq(qidCol, idCol), "left_anti")
      .withColumn("neg_rnk", row_number().over(w).cast("long"))
      .filter(col("neg_rnk") <= nNeg)
  }
}
