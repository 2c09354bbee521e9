package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring (SURVEY.md §2.D31) — the
  * CCNet-class quality filter (Wenzek et al., "CCNet: Extracting High
  * Quality Monolingual Datasets from Web Crawl Data", LREC 2020, which
  * scores candidate text with a KenLM n-gram model and keeps the
  * low-perplexity head). Here the model is a corpus-self-trained
  * add-one-smoothed bigram LM — the declarative, oracle-replayable
  * stand-in with the SAME pipeline shape a pretrained-model deployment
  * has: a (history, word) → probability TABLE joined to the corpus by
  * n-gram key, scan-local scoring, one doc-keyed rollup. Swapping in a
  * pretrained model is swapping the table.
  *
  * Scale shape: bigram extraction is scan-local (zip_with over the
  * token array — multiplicity preserved, unlike the deduping shingle
  * kernel); model counts are TWO keyed aggregations with map-side
  * partials; the probability table joins back by (w1, w2) KEY — not
  * broadcast, the bigram vocabulary grows with the corpus; the per-doc
  * score is one doc-keyed aggregation. Everything linear and keyed.
  *
  * Determinism (the q76 contract): P(w2|w1) = (c₁₂+1)/(c₁+V) is ln of
  * ONE correctly-rounded division of exact BIGINTs; each occurrence
  * contributes floor(−10⁶·ln p) — identical quantized BIGINTs in both
  * engines (ln's final ulp masked by the floor except within ~1e-10 of
  * an integer, the q53/q76 class); per-doc sums are exact-integer; the
  * reported avg is one division of exact BIGINTs.
  */
object LmScore {

  /** Per-doc bigram negative log-likelihood under the corpus-trained
    * add-one bigram LM. Output: (doc_id, n_bigrams, nll_scaled,
    * avg_nll) where nll_scaled = Σ floor(−10⁶·ln P) and avg_nll =
    * nll_scaled / (10⁶·n_bigrams) — the log-perplexity proxy a quality
    * gate thresholds on.
    */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    val bg = docs.select(col(idCol).as("doc_id"),
      explode(zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("e"))
      .select(col("doc_id"), col("e.w1").as("w1"), col("e.w2").as("w2"))
    // Both model counts attached in place by STACKED windows over ONE
    // exchange (r18, guide §2.4): hash(w1) satisfies the clustering of
    // both partition specs ({w1} ⊆ {w1,w2} and {w1} ⊆ {w1}), and the
    // (w1, w2) sort the first window establishes is a prefix match for
    // the second — one shuffle, one sort, zero joins. The agg+join
    // form paid the bigram table's exchange twice (count partials +
    // the score join) plus the model table's two exchanges; at sf10
    // that was 569.9 MB / 39.0M records vs 431.7 MB / 35.3M after
    // (wall 9.76 -> 7.55 s). Zipf-head w1 partitions stay linear: the
    // per-partition work is sort + running counts, no pairwise state.
    // c12 = bigram count; c1 = occurrences of w1 as a bigram LEFT side
    // (the MLE conditioning denominator), NOT raw unigram frequency.
    val byBg = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"), col("w2"))
    val byW1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w1"))
    // smoothing vocabulary: distinct predicted-side words, a one-row
    // broadcast scalar
    val vocab = bg.agg(countDistinct(col("w2")).as("v"))
    bg.repartition(col("w1"))
      .withColumn("c12", count(lit(1)).over(byBg))
      .withColumn("c1", count(lit(1)).over(byW1))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        floor(lit(-1000000.0) *
          log((col("c12") + lit(1L)).cast("double") /
            (col("c1") + col("v")).cast("double"))).cast("long")
          .as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("nll_scaled"))
      .select(col("doc_id"), col("n_bigrams"), col("nll_scaled"),
        (col("nll_scaled").cast("double") /
          (col("n_bigrams") * lit(1000000L))).as("avg_nll"))
  }
}
