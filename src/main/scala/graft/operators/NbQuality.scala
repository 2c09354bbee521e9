package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FastText-style n-gram quality classifier (SURVEY.md §2.D32) — the
  * model-based filtering pass modern curation pipelines run AFTER the
  * heuristic gates: train a cheap linear text classifier to separate a
  * reference-quality corpus from the crawl, keep the high-scoring head
  * (fastText: Joulin et al. 2016, arXiv:1607.01759; used this way by
  * CCNet's companion filter and DCLM, Li et al. 2024, arXiv:2406.11794).
  * Here the "reference corpus" label is the corpus' own deterministic
  * q38 keep-gate (n_words ≥ 50 AND uniq_ratio ≥ 0.3 — evaluated in
  * exact integers as 10·n_uniq ≥ 3·n_words so no engine ever compares
  * doubles), and the classifier is add-one-smoothed multinomial Naive
  * Bayes over token unigrams — the declarative, oracle-replayable
  * stand-in with the SAME pipeline shape a pretrained fastText
  * deployment has: a token → per-class weight TABLE joined to the
  * corpus by token key, scan-local feature extraction, one doc-keyed
  * rollup to a log-odds score. Swapping in a trained model is swapping
  * the table. Unlike the q37 stopword heuristic (fixed tiny rule set),
  * the signal here is LEARNED from the corpus' own token statistics.
  *
  * Scale shape: ONE explode (scan-local) → per-doc term frequencies
  * (doc,token)-keyed aggregation → the class-conditional model is a
  * token-keyed re-aggregation OF the tf table (no second corpus scan);
  * corpus totals and class priors are one-row broadcast scalars; the
  * scoring join is by token KEY — not broadcast, the vocabulary grows
  * with the corpus; the score is one doc-keyed aggregation. Everything
  * linear and keyed — the q84 LM-table discipline.
  *
  * Determinism (the q84/q76 contract): with add-one smoothing,
  *   ln P(tok|c) = ln(c_tok,c + 1) − ln(tot_c + V),
  * so a token UNSEEN in class c contributes ln(1) = 0 to the first
  * term — absent model rows cost nothing, no outer join. Per-class
  * pieces quantize separately to BIGINTs:
  *   q1c(tok) = floor(10⁶·ln(c_tok,c + 1))   (model table)
  *   q2c      = floor(10⁶·ln(tot_c + V))     (one-row scalar)
  *   q3c      = floor(10⁶·ln(n_docs_c + 1))  (prior; +1 keeps the ln
  *              total even if a class is empty)
  * and the decision statistic is the exact-BIGINT combination
  *   logodds = Σ_tok m·(q1p−q1n) − n_tok·(q2p−q2n) + (q3p−q3n),
  * identical in both engines (each ln is of one exactly-representable
  * BIGINT; the final ulp is masked by floor except within ~1e-10 of an
  * integer — the accepted q53 class). predicted = logodds > 0 is an
  * integer comparison, so the kept set replays bit-for-bit.
  */
/** The four one-row scalars of a trained NB model (quantized ln pieces
  * — see NbQuality's scaladoc): smoothing denominators q2p/q2n and doc
  * priors q3p/q3n. Collected once at train time (one-row collect, the
  * bounded class); carried as literals so a scoring plan — batch or
  * streaming — needs only the token-keyed weight table.
  */
case class NbConsts(q2p: Long, q2n: Long, q3p: Long, q3n: Long)

object NbQuality {

  /** Per-doc Naive-Bayes quality log-odds under the corpus-self-trained
    * reference-vs-rest model. Output: (doc_id, n_toks, label_pos,
    * logodds_scaled, predicted_keep).
    *
    * `stage=true` materializes the term-frequency table once
    * (localCheckpoint, the q76 pattern): tf feeds four consumers
    * (scoring join, model, totals, priors) and Spark's exchange reuse
    * recovers only two of them through the broadcast boundaries —
    * staged, the corpus is tokenized exactly ONCE. The oracled query
    * runs unstaged so the whole tree stays declarative and replayable.
    */
  def nbLogOdds(docs: DataFrame, idCol: String, textCol: String,
                stage: Boolean = false): DataFrame = {
    val (tf, modelQ, consts) = build(docs, idCol, textCol, stage)
    tf.join(modelQ, Seq("tok"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(sum(col("m")).as("n_toks"),
        sum(col("m") * (col("q1p") - col("q1n"))).as("s1"))
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        col("n_toks"),
        col("pos").as("label_pos"),
        (col("s1") - col("n_toks") * (col("q2p") - col("q2n")) +
          (col("q3p") - col("q3n"))).as("logodds_scaled"),
        (col("s1") - col("n_toks") * (col("q2p") - col("q2n")) +
          (col("q3p") - col("q3n")) > 0L).as("predicted_keep"))
  }

  /** Shared trainer: (tf, token-keyed quantized model, one-row consts). */
  private def build(docs: DataFrame, idCol: String, textCol: String,
                    stage: Boolean): (DataFrame, DataFrame, DataFrame) = {
    val toks = split(col(textCol), " ")
    val base = docs.select(
      col(idCol).as("doc_id"),
      toks.as("tk"),
      (size(toks) >= 50 &&
        size(array_distinct(toks)) * 10 >= size(toks) * 3).as("pos"))
    // per-doc term frequencies; pos rides along (functionally dependent
    // on doc_id, grouped to keep the aggregation key-only)
    val tf0 = base
      .select(col("doc_id"), col("pos"), explode(col("tk")).as("tok"))
      .groupBy(col("doc_id"), col("pos"), col("tok"))
      .agg(count(lit(1)).as("m"))
    val tf = if (stage) tf0.localCheckpoint() else tf0
    // class-conditional token counts: re-aggregate tf (no second scan
    // of the corpus), then quantize each class's ln piece
    val model = tf.groupBy(col("tok"))
      .agg(sum(when(col("pos"), col("m")).otherwise(0L)).as("cp"),
        sum(when(!col("pos"), col("m")).otherwise(0L)).as("cn"))
      .select(col("tok"),
        floor(lit(1000000.0) * log((col("cp") + lit(1L)).cast("double")))
          .cast("long").as("q1p"),
        floor(lit(1000000.0) * log((col("cn") + lit(1L)).cast("double")))
          .cast("long").as("q1n"),
        col("cp"), col("cn"))
    // one-row broadcast scalars: totals, vocabulary size, doc priors
    val tot = model.agg(sum(col("cp")).as("totp"), sum(col("cn")).as("totn"),
      count(lit(1)).as("v"))
    // doc priors derive from tf (every doc has >= 1 token, so tf spans
    // all docs) — reusing the tf exchange instead of a second corpus
    // scan that would re-read and re-split every text at 100 TB
    val prior = tf.groupBy(col("doc_id"), col("pos")).agg(count(lit(1)).as("_nt"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("ndp"),
        sum(when(!col("pos"), 1L).otherwise(0L)).as("ndn"))
    val consts = tot.crossJoin(prior).select(
      floor(lit(1000000.0) * log((col("totp") + col("v")).cast("double")))
        .cast("long").as("q2p"),
      floor(lit(1000000.0) * log((col("totn") + col("v")).cast("double")))
        .cast("long").as("q2n"),
      floor(lit(1000000.0) * log((col("ndp") + lit(1L)).cast("double")))
        .cast("long").as("q3p"),
      floor(lit(1000000.0) * log((col("ndn") + lit(1L)).cast("double")))
        .cast("long").as("q3n"))
    (tf, model.select(col("tok"), col("q1p"), col("q1n")), consts)
  }

  /** Trains the NB model and SEPARATES it from its training corpus:
    * returns the token-keyed quantized weight table plus the four
    * one-row scalars collected into `NbConsts` (bounded one-row
    * collect). This is the deployment artifact — `scoreWithModel` (or
    * the streaming `EventStreams.scoreStream`) applies it to any other
    * corpus, which is exactly the fastText/DCLM production split:
    * train once on the reference mix, score every ingest batch.
    */
  def trainModel(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, NbConsts) = {
    val (_, modelQ, consts) = build(docs, idCol, textCol, stage = true)
    val r = consts.collect()(0)
    (modelQ,
      NbConsts(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  /** Scores an arbitrary corpus under an already-trained model. Tokens
    * OUTSIDE the training vocabulary contribute ln(1) = 0 to the
    * class-conditional term (they still count in n_toks, so they pay
    * the smoothing denominator) — the textbook add-one treatment of
    * OOV, realized as a LEFT join + coalesce-to-0, so on the training
    * corpus itself this reproduces `nbLogOdds`' logodds bit-for-bit
    * (NbQualitySpec pins that). Output: (doc_id, n_toks,
    * logodds_scaled, predicted_keep) — no label column: scoring
    * corpora are unlabeled.
    */
  def scoreWithModel(docs: DataFrame, idCol: String, textCol: String,
                     model: DataFrame, consts: NbConsts): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("m"))
      .join(model, Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_toks"),
        sum(col("m") * (coalesce(col("q1p"), lit(0L)) -
          coalesce(col("q1n"), lit(0L)))).as("s1"))
      .select(col("doc_id"), col("n_toks"),
        (col("s1") - col("n_toks") * lit(consts.q2p - consts.q2n) +
          lit(consts.q3p - consts.q3n)).as("logodds_scaled"),
        (col("s1") - col("n_toks") * lit(consts.q2p - consts.q2n) +
          lit(consts.q3p - consts.q3n) > 0L).as("predicted_keep"))
}
