package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ExactSubstr-style substring dedup (SURVEY.md §2.D38): find the
  * maximal token spans of length >= `minTokens` that occur verbatim
  * more than once corpus-wide, per document — the public-standard dedup
  * pass of Lee et al. 2022 ("Deduplicating Training Data Makes Language
  * Models Better"), whose reference implementation builds a monolithic
  * suffix array. A suffix array does not distribute; the equivalent
  * distributed re-expression used here is OVERLAPPING window
  * fingerprints:
  *
  *   a duplicate substring of length >= L exists at position p iff the
  *   L-token window at p appears >= 2 times in the corpus (counting
  *   multiplicity — a doc repeating its own span counts, exactly as a
  *   suffix array would match it); a maximal duplicate span is a
  *   maximal run of duplicated window positions, merged while
  *   consecutive positions are <= L apart (the coverage intervals
  *   [p, p+L) then touch or overlap).
  *
  * This is the OVERLAPPING counterpart of D22 (ChunkDedup): disjoint
  * 8-token chunks miss any duplicate span that straddles a chunk
  * boundary and quantize span extents to chunk multiples; overlapping
  * windows recover the exact token extent of every duplicate span >= L
  * (see ExactSubstrSpec's semantics contrast).
  *
  * Scale shape (the suite's standing contract): one corpus-linear
  * explode (n - L + 1 windows per n-token doc, each reduced to a 128-bit
  * md5 fingerprint so shuffle width is constant, never L tokens), ONE
  * keyed partial aggregation for the corpus frequency table, one
  * fingerprint-keyed equi-join back restricted to the duplicated keys
  * (the df >= 2 side — the small side, AQE broadcasts it when it fits),
  * then per-doc window/LAG span assembly — keyed linear work end to
  * end, nothing pairwise, nothing corpus².
  */
object ExactSubstr {

  /** Per-document maximal duplicate spans: one row per (doc, span) with
    * `start`/`end` token offsets ([start, end) covered by a duplicated
    * substring) and the count of duplicated windows merged into it.
    * Only documents containing at least one duplicated window appear.
    */
  def spans(docs: DataFrame, idCol: String, textCol: String,
            minTokens: Int): DataFrame = {
    val d = dupWindows(docs, idCol, textCol, minTokens)
    spansOf(d, minTokens)
      .select(col("id"), col("span_id"), col("start"), col("end"),
        col("n_dup_windows"))
  }

  /** Per-document dedup stats over the merged spans (the oracled face):
    * (id, n_windows, n_dup, n_spans, dup_tokens, max_span) — total
    * windows, duplicated windows, maximal spans, tokens covered by any
    * duplicate span, and the longest span. Documents with no duplicated
    * window are absent (nothing to cut).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            minTokens: Int): DataFrame =
    spansOf(dupWindows(docs, idCol, textCol, minTokens), minTokens)
      .groupBy(col("id"))
      .agg(min(col("n_windows")).as("n_windows"),
        sum(col("n_dup_windows")).as("n_dup"),
        count(lit(1)).as("n_spans"),
        sum(col("end") - col("start")).as("dup_tokens"),
        max(col("end") - col("start")).as("max_span"))

  /** Duplicated window positions: (id, n_windows, pos) for every window
    * whose fingerprint occurs >= 2 times corpus-wide.
    */
  private def dupWindows(docs: DataFrame, idCol: String, textCol: String,
                         minTokens: Int): DataFrame = {
    val L = minTokens
    val n = size(split(col(textCol), " "))
    // windows at every position 0..n-L; the fingerprint is md5 of the
    // window's original byte span (collision-negligible at 128 bits,
    // exact to replay in any engine, constant shuffle width), computed
    // by the one-pass native kernel (WindowMd5sE): raw 16-byte digests —
    // half the shuffle/compare width of the hex form — with no
    // per-window slice/concat/hex allocation. posexplode supplies the
    // window position.
    val ch = docs
      .filter(n >= L)
      .select(col(idCol).as("id"), (n - L + 1).cast("long").as("n_windows"),
        posexplode(graft.functions.GraftFunctions
          .windowMd5s(col(textCol), L)).as(Seq("p", "w")))
      .select(col("id"), col("n_windows"),
        col("p").cast("long").as("pos"), col("w"))
    // corpus frequency per fingerprint as a count-over-window: ONE
    // shuffle of the window table by w. Measured at sf10 against the
    // agg+join formulation (two shuffles + the explode/md5 pass run
    // twice, 24.7 s), its disk-staged variant (26.3 s), and a
    // collect_list hash-agg (24.7 s): the count-window won at 21.6 s.
    val byW = Window.partitionBy(col("w"))
    ch.withColumn("freq", count(lit(1)).over(byW))
      .filter(col("freq") >= 2)
      .select(col("id"), col("n_windows"), col("pos"))
  }

  /** Merge duplicated window positions into maximal spans: positions
    * <= L apart have touching/overlapping coverage intervals [p, p+L)
    * and belong to one span. Per-doc LAG marks span starts, a running
    * sum numbers them, one keyed aggregation folds each span's extent.
    */
  private def spansOf(d: DataFrame, minTokens: Int): DataFrame = {
    val L = minTokens
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val gap = col("pos") - lag(col("pos"), 1).over(byDoc)
    d.withColumn("newspan",
        when(gap.isNull || gap > L, 1L).otherwise(0L))
      .withColumn("span_id", sum(col("newspan")).over(byDoc))
      .groupBy(col("id"), col("span_id"))
      .agg(min(col("n_windows")).as("n_windows"),
        min(col("pos")).as("start"),
        (max(col("pos")) + L).as("end"),
        count(lit(1)).as("n_dup_windows"))
  }

  /** The corpus window-fingerprint index: every DISTINCT L-token window
    * fingerprint present anywhere in the corpus — the static side the
    * ingest edge (EventStreams.exactSubstrSpanStream) probes, and the
    * C14 seen-index discipline applies: batch-rebuilt with the corpus
    * (one explode + one distinct, both corpus-linear keyed).
    */
  def fingerprintIndex(docs: DataFrame, textCol: String,
                       minTokens: Int): DataFrame =
    // sub-L docs need no pre-filter: windowMd5s returns an empty array
    // below L tokens and explode drops empty arrays
    docs
      .select(explode(graft.functions.GraftFunctions
        .windowMd5s(col(textCol), minTokens)).as("w"))
      .distinct()

  /** Adapt the LIVE fingerprint-count table
    * (`GraftSession.maintainFingerprintIndex`'s `(w, c)` merge-on-read
    * table) to the probe shape `fingerprintIndex` produces — the
    * C17 `minhashIndexFromLive` discipline applied to D38. Every row of
    * a consistent index has c ≥ 1; the filter is a guard against a
    * mid-audit read, and costs nothing (scan-local).
    */
  def fingerprintIndexFromLive(table: DataFrame): DataFrame =
    table.filter(col("c") >= 1).select(col("w"))

  /** The dedup pass itself: each document's text with every duplicate
    * span's tokens removed (Lee et al. cut the bytes; the token analogue
    * here), plus the kept-token count. Documents without duplicate spans
    * pass through unchanged. Scan-local per-token membership against the
    * doc's own merged span list (collected per doc — span counts are
    * tiny by construction; the list never leaves the row).
    */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minTokens: Int): DataFrame = {
    val sp = spans(docs, idCol, textCol, minTokens)
      .groupBy(col("id"))
      .agg(collect_list(struct(col("start"), col("end"))).as("spans"))
    val toks = split(col(textCol), " ")
    val joined = docs.join(sp, docs(idCol) === sp("id"), "left")
    val kept = filter(
      zip_with(toks, sequence(lit(0), size(toks) - 1),
        (tk, i) => struct(tk.as("tk"), i.cast("long").as("i"))),
      p => col("spans").isNull || !exists(col("spans"),
        s => p.getField("i") >= s.getField("start") &&
          p.getField("i") < s.getField("end")))
    joined.select(docs(idCol),
      concat_ws(" ", transform(kept, p => p.getField("tk"))).as("clean_text"),
      size(kept).cast("long").as("kept_tokens"))
  }
}
