package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chunk-level (CCNet-style) dedup (SURVEY.md §2.D22): cut every text
  * span that repeats anywhere in the corpus.
  *
  * CCNet dedups at the paragraph-hash level; this corpus has no newlines,
  * so the unit is the non-overlapping `chunkTokens`-token chunk — only
  * the unit function differs. A chunk occurring >= 2 times corpus-wide
  * (counting multiplicity) is boilerplate and is removed from every
  * document, then each document's survivors are rejoined in order.
  *
  * Scale shape: one corpus-linear explode, ONE keyed partial aggregation
  * for the frequency table, one chunk-keyed equi-join back (AQE
  * broadcasts the frequency side when small) — nothing pairwise, nothing
  * corpus².
  */
object ChunkDedup {

  /** Per-document dedup stats: (id, n_chunks, n_dup, clean_md5) where
    * clean_md5 hashes the kept chunks rejoined with single spaces.
    * Documents shorter than one chunk are absent (they contribute no
    * chunks).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int): DataFrame = {
    val cs = chunkTokens
    val toks = split(col(textCol), " ")
    val chunks = transform(
      sequence(lit(0), (size(toks).cast("long") / cs).cast("int") - 1),
      i => struct(i.as("pos"),
        concat_ws(" ", slice(toks, i * cs + 1, lit(cs))).as("chunk")))
    // the short-doc guard is load-bearing: sequence(0, -1) DESCENDS in
    // Spark, so an unguarded sub-chunk doc would fabricate two chunks
    // from negative slices
    val ch = docs
      .filter(size(toks) >= cs)
      .select(col(idCol).as("id"), explode(chunks).as("c"))
      .select(col("id"), col("c.pos").as("pos"), col("c.chunk").as("chunk"))
    // corpus frequency as a count-over-window (ONE chunk-keyed shuffle
    // of the chunk table, the ExactSubstr r15 lesson applied here at
    // the r18 sf10 lens): the agg+join form pays a second exchange for
    // the frequency table once the corpus outgrows the broadcast
    // threshold, and its SMJ sorts the chunk table by chunk anyway —
    // exactly the sort the window needs (sf10 receipt in
    // OPTIMIZATION_r18.md).
    val byChunk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("chunk"))
    ch.withColumn("freq", count(lit(1)).over(byChunk))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("freq") >= 2, 1L).otherwise(0L)).as("n_dup"),
        md5(concat_ws(" ",
          transform(
            filter(sort_array(collect_list(
              struct(col("pos"), col("chunk"), (col("freq") >= 2).as("dup")))),
              p => !p.getField("dup")),
            p => p.getField("chunk")))).as("clean_md5"))
  }
}
