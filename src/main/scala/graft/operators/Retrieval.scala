package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** BM25 full-text retrieval over whitespace-tokenized documents
  * (SURVEY.md §2.D27) — the classic inverted-index ranking function
  * (Robertson & Spärck Jones probabilistic relevance framework; the
  * Okapi BM25 form with k1 = 1.2, b = 0.75). The reference's engine has
  * no retrieval operator; a training-data pipeline uses this for
  * corpus search/inspection and for query-targeted subset extraction.
  *
  * Scale shape (the inverted-index discipline, re-expressed as keyed
  * relational ops — no index structure is materialized because the
  * postings ARE a keyed table):
  *   - tokenize/explode is scan-linear; tf is ONE (doc, term) keyed
  *     aggregation with map-side partials;
  *   - the query-term set broadcasts (queries are small at any corpus
  *     scale), so postings prune to matched terms map-side — the
  *     corpus never shuffles for terms nobody asked about;
  *   - df for the matched terms and the one-row corpus stats
  *     (N, total token count) broadcast back;
  *   - per-query top-k reduces through the TopKPairs partial aggregate
  *     (≤ k rows per query per partition into the exchange), never a
  *     window over all scored rows — the q35 brute-force-ANN lesson.
  *
  * Determinism contract (the oracled q76 replays this bit-for-bit):
  * with k1 = 6/5 and b = 3/4, the term-saturation weight
  *   tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * multiplied through by 20·total_len is a ratio of exact BIGINTs
  *   44·total·tf / (20·total·tf + 6·total + 18·dl·N),
  * and idf = ln((N − df + ½)/(df + ½) + 1) = ln((2N+2)/(2df+1)) takes
  * ln of ONE correctly-rounded division of exact BIGINTs. Per-term
  * contributions quantize to floor(idf · w · 10⁶) BIGINTs whose SUM is
  * order-independent; the only cross-engine risk is ln's final-ulp
  * (java.lang.Math.log vs libm), masked by the 10⁶ floor except within
  * ~4e-10 of an integer boundary — the q53 transcendental-oracle class.
  */
object Retrieval {

  /** BM25 top-k docs per query. `queryTerms` is a small (q_id, term)
    * frame — one row per query term, terms already tokenized the same
    * way as `textCol` (whitespace).
    * Output: (q_id, rn, doc_id, score_scaled, score), rn 1..k ranked by
    * (score_scaled desc, doc_id asc).
    *
    * `stage=true` materializes the term-frequency table once
    * (localCheckpoint, the q31 shingle-staging rule): every downstream
    * frame — dl, corpus stats, df, the scored postings — derives from
    * tf, so the corpus is tokenized exactly ONCE; unstaged, the four
    * consumer branches would each re-run the explode over the full
    * corpus. tf is the postings table a production retrieval pipeline
    * materializes anyway.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, k: Int = 10,
               stage: Boolean = false): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(split(col(textCol), " ")).as("term"))
    val tf0 = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tf = if (stage) tf0.localCheckpoint() else tf0
    // doc length re-aggregates the tf table (sum of per-term counts) —
    // no second pass over the corpus text
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    // one-row corpus stats; broadcast-cross-joined (no driver action)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    val qt = queryTerms.select(col("q_id"), col("term"))
    // postings prune to query terms FIRST (broadcast semi shape): df and
    // everything downstream see only matched terms
    val tfq = tf.join(broadcast(qt.select(col("term")).distinct()), Seq("term"))
    val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tfq
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("wnum", lit(44L) * col("total_len") * col("tf"))
      .withColumn("wden", lit(20L) * col("total_len") * col("tf")
        + lit(6L) * col("total_len") + lit(18L) * col("dl") * col("n_docs"))
      .withColumn("idf", log((lit(2L) * col("n_docs") + lit(2L)).cast("double")
        / (lit(2L) * col("df") + lit(1L)).cast("double")))
      .withColumn("contrib",
        floor(col("idf") * (col("wnum").cast("double") / col("wden").cast("double"))
          * lit(1000000.0)).cast("long"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("score_scaled"))
    scored
      .groupBy(col("q_id"))
      .agg(topKPairs(col("score_scaled").cast("double"), col("doc_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rn"),
        col("col.id").as("doc_id"),
        col("col.score").cast("long").as("score_scaled"),
        (col("col.score") / lit(1000000.0)).as("score"))
  }
}
