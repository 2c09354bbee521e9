package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.GraftSession
import graft.operators.{Containment, Dedup, IvfPq}
import graft.streaming.EventStreams

case class StreamVec(vec_id: Long, ts: Instant, embedding: Seq[Float])

/** Round 10 — LIVE dedup-index maintenance (SURVEY.md §2.C17/C18): the
  * streaming indexes C9/C14/C15 probe stop being static. Each test runs
  * a MemoryStream of documents through the maintenance operator in
  * SEVERAL micro-batches against real merge-on-read catalog tables,
  * then pins the live table content equal to a from-scratch batch
  * rebuild on the latest corpus — the incremental == rebuild identity
  * the q92 oracle replays in DuckDB.
  */
class LiveIndexSpec extends AnyFunSuite {
  import SparkFixture._
  import spark.implicits._

  private def ts(minute: Int): Instant =
    Instant.parse("2024-01-01T00:00:00Z").plusSeconds(minute * 60L)

  private def chk(): String = Files.createTempDirectory("graft-chk").toString

  private lazy val g = {
    val wh = Files.createTempDirectory("graft-liveidx-wh").toString
    val s = new GraftSession(spark, wh)
    s.sql("create schema live")
    s.sql("use live")
    s
  }

  test("C17 live MinHash index: upserted per micro-batch == batch rebuild; revised docs replace their bands") {
    g.sql("create table mh_index (doc_id bigint, ts timestamp, " +
      "sh array<string>, bks array<bigint>, primary key(doc_id))")
    val input = MemoryStream[StreamDoc](spark)
    val q = g.ingestUpsert(
      EventStreams.minhashIndexStream(input.toDF()),
      "mh_index", chk(), orderCol = "ts")

    val d1v1 = "the quick brown fox jumps over the lazy dog again and again today"
    val d2 = "completely different content about spark streaming joins and state expiry"
    val d1v2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val d3 = "a third document about merge on read tables and commit sequences"
    val tooShort = "too short"

    input.addData(StreamDoc(1, ts(0), d1v1), StreamDoc(2, ts(1), d2))
    q.processAllAvailable()
    // batch 2: doc 3 lands, doc 1 is REVISED (upsert must replace its
    // shingles and band keys atomically), a too-short doc is dropped
    // exactly as the batch index drops it
    input.addData(StreamDoc(3, ts(10), d3), StreamDoc(1, ts(11), d1v2),
      StreamDoc(4, ts(12), tooShort))
    q.processAllAvailable(); q.stop()

    val latest = Seq((1L, d1v2), (2L, d2), (3L, d3), (4L, tooShort))
      .toDF("doc_id", "text")
    val (wantSh, wantBands) = Dedup.minhashIndex(latest, "doc_id", "text")
    val live = g.sql("select doc_id, sh, bks from mh_index")

    def shSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[String]] =
      df.collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(shSets(live.select("doc_id", "sh")) == shSets(
      wantSh.select(col("doc_id"), col("sh"))))

    val liveBands = Dedup.minhashIndexFromLive(live)._2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchBands = wantBands.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveBands == batchBands,
      "exploded live band keys must equal the batch index's band table")
    // doc 4 never made it in; doc 1's row is the REVISED version
    assert(!shSets(live.select("doc_id", "sh")).contains(4L))
  }

  test("C17 probing the live index == full-corpus minhashPairs rebuild") {
    // mh_index still holds the latest corpus from the previous test; a
    // new near-dup of doc 2 probes it through the incremental path
    val d2dup = "completely different content about spark streaming joins and state expiry now"
    val newDocs = Seq((10L, d2dup)).toDF("doc_id", "text")
    val (oldSh, oldBands) = Dedup.minhashIndexFromLive(
      g.sql("select doc_id, sh, bks from mh_index"))
    val inc = Dedup.incrementalMinhashPairs(newDocs, "doc_id", "text",
      oldSh, oldBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val d1v2 = "the quick brown fox jumps over the lazy dog again and again tonight"
    val d2 = "completely different content about spark streaming joins and state expiry"
    val d3 = "a third document about merge on read tables and commit sequences"
    val full = Seq((1L, d1v2), (2L, d2), (3L, d3), (10L, d2dup))
      .toDF("doc_id", "text")
    val fullPairs = Dedup.minhashPairs(full, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantNew = fullPairs.filter(p => p._1 == 10L || p._2 == 10L)
    assert(inc == wantNew, s"inc=$inc want=$wantNew")
    assert(inc.contains((2L, 10L)), "the planted near-dup must surface")
  }

  test("C18 live containment index: df counts + df-capped postings track micro-batches, crossings retire buckets") {
    g.sql("create table cont_df (h bigint, c bigint, primary key(h))")
    g.sql("create table cont_posting (h bigint, doc_b bigint, " +
      "primary key(h, doc_b))")
    // dfCap = 2: the "crosser" phrase lands in batches 1,1,2 (df 2 -> 3
    // exactly when batch 2 applies — its bucket must retire THROUGH the
    // catalog tombstones); the "survivor" phrase lands once per batch
    // (df 1 -> 2, stays live)
    val crosser = "alpha beta gamma delta epsilon"
    val survivor = "zeta eta theta iota kappa"
    def body(d: Int) = (1 to 20).map(i => s"d${d}w$i").mkString(" ")
    val b1 = Seq(
      StreamDoc(1, ts(0), s"$crosser ${body(1)}"),
      StreamDoc(2, ts(1), s"$crosser ${body(2)}"),
      StreamDoc(4, ts(2), s"$survivor ${body(4)}"))
    val b2 = Seq(
      StreamDoc(3, ts(10), s"$crosser ${body(3)}"),
      StreamDoc(5, ts(11), s"$survivor ${body(5)}"))

    val input = MemoryStream[StreamDoc](spark)
    val q = g.maintainContainmentIndex(input.toDF(), "cont_df",
      "cont_posting", chk(), dfCap = 2)
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    def check(docsSoFar: Seq[StreamDoc]): Unit = {
      val corpus = docsSoFar.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
      assert(rows(g.sql("select h, c from cont_df")) ==
        rows(Containment.dfIndex(corpus, "doc_id", "text")))
      assert(rows(g.sql("select h, doc_b from cont_posting")) ==
        rows(Containment.postingIndex(corpus, "doc_id", "text", dfCap = 2)))
    }
    input.addData(b1: _*)
    q.processAllAvailable()
    check(b1)
    input.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    check(b1 ++ b2)
    // the retirement really went through the merge-on-read path: the
    // crosser hash is in the df table at c=3 but has NO posting rows
    val crosserPosting = g.sql("select p.h from cont_posting p join " +
      "cont_df d on d.h = p.h where d.c > 2")
    assert(crosserPosting.isEmpty, "df>cap buckets must hold no postings")
    assert(g.sql("select h from cont_df where c = 3").count() >= 1,
      "the crosser hash must have been counted across batches")
  }

  test("C22 live ExactSubstr fingerprint index: counts track micro-batches, kill-replay converges, audit repairs a corpus DELETE") {
    import graft.operators.ExactSubstr
    val L = 5
    g.sql("create table fp_idx (w blob, c bigint, primary key(w))")
    val phrase = "alpha beta gamma delta epsilon"
    def body(d: Int) = (1 to 12).map(i => s"d${d}w$i").mkString(" ")
    val b1 = Seq(
      StreamDoc(1, ts(0), s"$phrase ${body(1)}"),
      StreamDoc(2, ts(1), s"$phrase ${body(2)}"))
    val b2 = Seq(StreamDoc(3, ts(10), s"$phrase ${body(3)}"))
    val b3 = Seq(StreamDoc(4, ts(20), s"${body(4)} $phrase"))
    val chkDir = chk()

    def rebuild(docs: Seq[StreamDoc]) =
      docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
        .select(explode(graft.functions.GraftFunctions
          .windowMd5s(col("text"), L)).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq.map {
        case b: Array[Byte] => b.toSeq
        case x => x
      }).toSet
    def check(docsSoFar: Seq[StreamDoc]): Unit =
      assert(rows(g.sql("select w, c from fp_idx")) == rows(rebuild(docsSoFar)))

    val input = MemoryStream[StreamDoc](spark)
    val q = g.maintainFingerprintIndex(input.toDF(), "fp_idx", chkDir,
      minTokens = L)
    input.addData(b1: _*)
    q.processAllAvailable()
    check(b1)
    // the shared phrase's fingerprint counts ACROSS docs (c >= 2)
    assert(g.sql("select count(*) as n from fp_idx where c >= 2")
      .collect()(0).getLong(0) >= 1L)
    input.addData(b2: _*)
    q.processAllAvailable(); q.stop()
    check(b1 ++ b2)
    // the probe face: live adapter == the static batch index
    val corpus = (b1 ++ b2).map(d => (d.doc_id, d.text)).toDF("doc_id", "text")
    assert(rows(ExactSubstr.fingerprintIndexFromLive(
        g.sql("select w, c from fp_idx"))) ==
      rows(ExactSubstr.fingerprintIndex(corpus, "text", L)))

    // kill AFTER the table commit but BEFORE the marker: the replay must
    // reapply the STAGED totals (a recompute against the already-updated
    // table would double-count the batch)
    val b3df = b3.map(d => (d.doc_id, d.ts, d.text)).toDF("doc_id", "ts", "text")
    val boom = intercept[RuntimeException] {
      g.applyFingerprintBatch(b3df, 2L, "live", "fp_idx", chkDir, "text", L,
        afterCommit = () => throw new RuntimeException("kill -9"))
    }
    assert(boom.getMessage == "kill -9")
    assert(Files.exists(java.nio.file.Paths.get(chkDir, "_graft_txn", "2",
      "_STAGED")), "the write-ahead record must survive the crash")
    g.applyFingerprintBatch(b3df, 2L, "live", "fp_idx", chkDir, "text", L)
    check(b1 ++ b2 ++ b3)

    // orphan audit: a corpus DELETE strands counts the ingest edge
    // cannot see; auditFingerprintIndex repairs to the rebuild
    g.sql("create table docs_c22 (doc_id bigint, text varchar(400), " +
      "primary key(doc_id))")
    (b1 ++ b2 ++ b3).foreach(d => g.sql(
      s"insert into docs_c22 values (${d.doc_id}, '${d.text}')"))
    g.sql("delete from docs_c22 where doc_id = 2")
    val repairs = g.auditFingerprintIndex("fp_idx", "docs_c22",
      minTokens = L)
    assert(repairs > 0L, "the delete must strand rows the audit repairs")
    check((b1 ++ b2 ++ b3).filterNot(_.doc_id == 2))
    // idempotent: a second audit finds nothing
    assert(g.auditFingerprintIndex("fp_idx", "docs_c22", minTokens = L) == 0L)
  }

  test("C17 stale-index audit: a corpus DELETE leaves an orphaned band row; auditIndexOrphans sweeps it, later re-inserts are never masked") {
    g.sql("create table docs_c17 (doc_id bigint, text varchar(200), " +
      "primary key(doc_id))")
    g.sql("create table mh_audit (doc_id bigint, ts timestamp, " +
      "sh array<string>, bks array<bigint>, primary key(doc_id))")
    val dA = "the quick brown fox jumps over the lazy dog again and again today"
    val dB = "completely different content about spark streaming joins and state expiry"
    val dC = "a third document about merge on read tables and commit sequences"
    for ((id, t) <- Seq((1L, dA), (2L, dB), (3L, dC)))
      g.sql(s"insert into docs_c17 values ($id, '$t')")
    val input = MemoryStream[StreamDoc](spark)
    val q = g.ingestUpsert(
      EventStreams.minhashIndexStream(input.toDF()),
      "mh_audit", chk(), orderCol = "ts")
    input.addData(StreamDoc(1, ts(0), dA), StreamDoc(2, ts(1), dB),
      StreamDoc(3, ts(2), dC))
    q.processAllAvailable(); q.stop()

    // the bug class: the DELETE never flows through the maintenance
    // stream — the dead doc's bands stay live in the index
    g.sql("delete from docs_c17 where doc_id = 2")
    assert(g.sql("select doc_id from mh_audit where doc_id = 2").count() == 1,
      "pre-audit: the orphan must exist (this is the bug being swept)")

    assert(g.auditIndexOrphans("mh_audit", "docs_c17") == 1L)
    assert(g.sql("select doc_id from mh_audit where doc_id = 2").isEmpty)
    // live == rebuild on the remaining corpus (bands, not just keys)
    val latest = Seq((1L, dA), (3L, dC)).toDF("doc_id", "text")
    val wantBands = Dedup.minhashIndex(latest, "doc_id", "text")._2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val liveBands = Dedup.minhashIndexFromLive(
      g.sql("select doc_id, sh, bks from mh_audit"))._2
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveBands == wantBands)
    // a clean state audits to zero
    assert(g.auditIndexOrphans("mh_audit", "docs_c17") == 0L)
    // a re-insert AFTER the sweep is never masked (strictly-older masks)
    g.sql(s"insert into docs_c17 values (2, '$dB')")
    val input2 = MemoryStream[StreamDoc](spark)
    val q2 = g.ingestUpsert(
      EventStreams.minhashIndexStream(input2.toDF()),
      "mh_audit", chk(), orderCol = "ts")
    input2.addData(StreamDoc(2, ts(20), dB))
    q2.processAllAvailable(); q2.stop()
    assert(g.sql("select doc_id from mh_audit where doc_id = 2").count() == 1,
      "re-ingested row must survive the earlier sweep tombstone")
    assert(g.auditIndexOrphans("mh_audit", "docs_c17") == 0L)
  }

  test("C18 stale-index audit: a corpus DELETE decrements dfs and resurrects capped buckets; auditContainmentIndex repairs to the rebuild") {
    g.sql("create table docs_c18 (doc_id bigint, text varchar(400), " +
      "primary key(doc_id))")
    g.sql("create table cont_df_a (h bigint, c bigint, primary key(h))")
    g.sql("create table cont_posting_a (h bigint, doc_b bigint, " +
      "primary key(h, doc_b))")
    // dfCap = 2; the crosser phrase is in docs 1,2,3 (df 3 > cap: its
    // bucket retired live). DELETING doc 3 drops its df to 2 — the
    // bucket must come BACK with doc 1 and 2's postings, doc 3's rows
    // must leave every bucket, and every shingle doc 3 carried must
    // decrement. Only a rebuild-diff answers all three.
    val crosser = "alpha beta gamma delta epsilon"
    def body(d: Int) = (1 to 20).map(i => s"a${d}w$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$crosser ${body(1)}"), (2L, s"$crosser ${body(2)}"),
      (3L, s"$crosser ${body(3)}"), (4L, s"${body(4)}"))
    corpus.foreach { case (id, t) =>
      g.sql(s"insert into docs_c18 values ($id, '$t')") }
    val input = MemoryStream[StreamDoc](spark)
    val q = g.maintainContainmentIndex(input.toDF(), "cont_df_a",
      "cont_posting_a", chk(), dfCap = 2)
    input.addData(corpus.map { case (id, t) =>
      StreamDoc(id, ts(id.toInt), t) }: _*)
    q.processAllAvailable(); q.stop()

    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    // sanity: live == rebuild before the delete
    val full = corpus.toDF("doc_id", "text")
    assert(rows(g.sql("select h, c from cont_df_a")) ==
      rows(Containment.dfIndex(full, "doc_id", "text")))

    g.sql("delete from docs_c18 where doc_id = 3")
    // pre-audit: the index still reflects the full corpus (the bug)
    assert(rows(g.sql("select h, c from cont_df_a")) ==
      rows(Containment.dfIndex(full, "doc_id", "text")))

    val (dfFixed, postFixed) =
      g.auditContainmentIndex("cont_df_a", "cont_posting_a", "docs_c18",
        dfCap = 2)
    assert(dfFixed > 0 && postFixed > 0, s"($dfFixed, $postFixed)")
    val remaining = corpus.filter(_._1 != 3L).toDF("doc_id", "text")
    assert(rows(g.sql("select h, c from cont_df_a")) ==
      rows(Containment.dfIndex(remaining, "doc_id", "text")))
    assert(rows(g.sql("select h, doc_b from cont_posting_a")) ==
      rows(Containment.postingIndex(remaining, "doc_id", "text", dfCap = 2)))
    // the resurrection really happened: the crosser bucket is live again
    // with docs 1 and 2
    val crosserRows = g.sql("select p.doc_b from cont_posting_a p " +
      "join cont_df_a d on d.h = p.h where d.c = 2 " +
      "and p.doc_b in (1, 2)").count()
    assert(crosserRows >= 2, "capped bucket must resurrect after the delete")
    // converged: a second audit is a no-op
    assert(g.auditContainmentIndex("cont_df_a", "cont_posting_a",
      "docs_c18", dfCap = 2) == ((0L, 0L)))
  }

  test("C18 joint commit: a crash BETWEEN the two table commits (and one before the marker) converges to incremental == rebuild on replay") {
    g.sql("create table cont_dfx (h bigint, c bigint, primary key(h))")
    g.sql("create table cont_postingx (h bigint, doc_b bigint, " +
      "primary key(h, doc_b))")
    val chkDir = chk()
    val crosser = "alpha beta gamma delta epsilon"
    def body(d: Int) = (1 to 20).map(i => s"x${d}w$i").mkString(" ")
    val b0 = Seq((1L, s"$crosser ${body(1)}"), (2L, s"$crosser ${body(2)}"))
    val b1 = Seq((3L, s"$crosser ${body(3)}"), (4L, body(4)))
    val b2 = Seq((5L, body(5)))
    def df(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")
    def apply(rows: Seq[(Long, String)], id: Long,
              afterDf: () => Unit = () => (),
              afterPost: () => Unit = () => ()): Unit =
      g.applyContainmentBatch(df(rows), id, "live", "cont_dfx", "live",
        "cont_postingx", chkDir, "doc_id", "text", 5, 2, afterDf, afterPost)
    def rows(q: String): Set[Seq[Any]] =
      g.sql(q).collect().map(_.toSeq).toSet
    def check(corpus: Seq[(Long, String)]): Unit = {
      assert(rows("select h, c from cont_dfx") ==
        df(corpus).transform(d =>
          Containment.dfIndex(d, "doc_id", "text")).collect()
          .map(_.toSeq).toSet)
      assert(rows("select h, doc_b from cont_postingx") ==
        df(corpus).transform(d =>
          Containment.postingIndex(d, "doc_id", "text", dfCap = 2))
          .collect().map(_.toSeq).toSet)
    }
    apply(b0, 0L)
    check(b0)
    // kill between the df commit and the posting commit: batch 1 carries
    // the crosser's df 2 -> 3 crossing, so the crashed state has the df
    // table ahead AND an unretired bucket the replay must still retire
    val boom = intercept[RuntimeException] {
      apply(b1, 1L, afterDf = () => throw new RuntimeException("kill -9"))
    }
    assert(boom.getMessage == "kill -9")
    // crashed state: df updated, postings stale (doc 3/4 rows absent)
    assert(rows("select h from cont_dfx where c = 3").nonEmpty,
      "df table must already carry the crossing")
    assert(!rows("select doc_b from cont_postingx").flatten.contains(3L))
    // the write-ahead record survives the crash
    assert(Files.exists(java.nio.file.Paths.get(chkDir, "_graft_txn", "1",
      "_STAGED")))
    // replay (same batch id, as stream restart does): converges exactly
    apply(b1, 1L)
    check(b0 ++ b1)
    assert(Files.exists(java.nio.file.Paths.get(chkDir, "_graft_txn", "1",
      "_STAGED")),
      "the latest applied txn record is KEPT as the idempotence record")
    assert(!Files.exists(java.nio.file.Paths.get(chkDir, "_graft_txn", "0")),
      "older txn records are reaped once a newer batch applies")
    // kill AFTER both commits but BEFORE the marker (the double-apply
    // window the separate-marker protocol had): replay must be a no-op
    // replace, not a double count
    intercept[RuntimeException] {
      apply(b2, 2L, afterPost = () => throw new RuntimeException("kill -9"))
    }
    apply(b2, 2L)
    check(b0 ++ b1 ++ b2)
  }

  test("C19 live embedding index: per-batch encode == frozen-quantizer rebuild; live table IS the probe input; stored codebook + refresh pinned") {
    import graft.functions.GraftFunctions.quantize
    val dim = 8; val m = 2
    def emb(id: Long, salt: Long = 0): Seq[Float] =
      Seq.tabulate(dim)(j => ((((id + salt) * 31 + j * 17) % 13) - 6) / 10.0f)
    def qvOf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("id", "embedding")
        .select(col("id"), quantize(col("embedding")).as("qv"))
    // the frozen quantizer trains on a seed corpus — the deployment
    // artifact C19's scaladoc describes
    val seed = (1L to 40L).map(i => (i, emb(i)))
    val ix = IvfPq.index(qvOf(seed), 40L, dim = dim, m = m, ksTarget = 4)

    // the codebook persists as catalog tables; a restart reconstructs
    // the exact quantizer (stored == memoized, pinned on the encodes)
    ix.coarse.createOrReplaceTempView("v_coarse")
    ix.pqCbR.createOrReplaceTempView("v_pqcb")
    g.sql("create table emb_coarse as select * from v_coarse")
    g.sql("create table emb_pqcb as select * from v_pqcb")
    val ixStored = IvfPq.indexFromStored(
      g.sql("select cr, c_id, c_vec, c_self from emb_coarse"),
      g.sql("select c_id, sub, c_sv, c_self, r from emb_pqcb"),
      dim = dim, m = m)
    def encRows(corpus: Seq[(Long, Seq[Float])], i: IvfPq.Index) =
      IvfPq.encodeWith(qvOf(corpus), i).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
        .toSet
    assert(encRows(seed, ixStored) == encRows(seed, ix),
      "indexFromStored must reconstruct the exact frozen quantizer")

    // live maintenance: vectors encode at the ingest edge and upsert
    // into the (vec_id PK, cell, codes) table; a revised vec_id
    // replaces its cell and codes
    g.sql("create table emb_index (vec_id bigint, ts timestamp, " +
      "cell bigint, codes array<bigint>, primary key(vec_id))")
    val input = MemoryStream[StreamVec](spark)
    val q = g.ingestUpsert(
      EventStreams.embeddingIndexStream(input.toDF(), ix),
      "emb_index", chk(), orderCol = "ts")
    input.addData((41L to 50L).map(i => StreamVec(i, ts(i.toInt), emb(i))): _*)
    q.processAllAvailable()
    input.addData((51L to 55L).map(i => StreamVec(i, ts(i.toInt), emb(i))) :+
      StreamVec(41L, ts(99), emb(41L, salt = 7)): _*)
    q.processAllAvailable(); q.stop()
    val latest = (42L to 55L).map(i => (i, emb(i))) :+ (41L, emb(41L, salt = 7))
    def liveRows() = g.sql("select vec_id, cell, codes from emb_index")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
      .toSet
    assert(liveRows() == encRows(latest, ix),
      "live table must equal the frozen-quantizer encode of the latest corpus")

    // the live table IS probeEncoded's enc input: no re-encode anywhere
    val corpusQv = qvOf(latest)
    val queries = corpusQv.filter(col("id") <= 42)
    val liveEnc = g.sql("select vec_id, cell, codes from emb_index")
      .select(col("vec_id").as("id"), col("cell"), col("codes"))
    def probeRows(enc: org.apache.spark.sql.DataFrame) =
      IvfPq.probeEncoded(enc, corpusQv, queries, ix,
        nprobe = 2, k = 3, rerank = 5)
        .collect().map(_.toSeq).toSet
    assert(probeRows(liveEnc) ==
      probeRows(IvfPq.encodeWith(corpusQv, ix)),
      "probing the live table must equal probing a fresh encode")

    // codebook refresh = OPTIMIZE-style rewrite under a NEW quantizer
    // (codes are only comparable under one quantizer): retrain on the
    // grown corpus, re-encode EVERYTHING through the same upsert
    // machinery, and the table equals a from-scratch rebuild
    val grown = seed ++ latest
    // ksTarget=8 (stride 6, 8 sampled ids): at ksTarget=4 the stride-13
    // hash-mod sample of these 55 ids is deterministically EMPTY — the
    // round-13 nonEmptySample guard caught this spec silently pinning a
    // degenerate (0-codeword) refresh quantizer against itself
    val ix2 = IvfPq.index(qvOf(grown), grown.size.toLong,
      dim = dim, m = m, ksTarget = 8)
    val refresh = MemoryStream[StreamVec](spark)
    val q2 = g.ingestUpsert(
      EventStreams.embeddingIndexStream(refresh.toDF(), ix2),
      "emb_index", chk(), orderCol = "ts")
    refresh.addData(grown.zipWithIndex.map { case ((i, e), o) =>
      StreamVec(i, ts(200 + o), e) }: _*)
    q2.processAllAvailable(); q2.stop()
    assert(liveRows() == encRows(grown, ix2),
      "refresh must equal the new-quantizer rebuild of the grown corpus")
  }

  test("C21 live SemDeDup: per-batch cluster assign == frozen-codebook rebuild; survivors from the live table == batch SemDeDup; stored codebook + refresh pinned") {
    import graft.functions.GraftFunctions.{idSample, quantize}
    import graft.operators.Cluster
    val dim = 8
    def emb(id: Long, salt: Long = 0): Seq[Float] =
      Seq.tabulate(dim)(j => ((((id + salt) * 31 + j * 17) % 13) - 6) / 10.0f)
    def qvOf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("id", "embedding")
        .select(col("id"), quantize(col("embedding")).as("qv"))
    // the frozen codebook trains on a seed corpus (kmeans-refined from a
    // hash-mod uniform seed — stride 5 samples 11 of the 40 seed ids)
    val seed = (1L to 40L).map(i => (i, emb(i)))
    val cb = Cluster.kmeansCodebook(qvOf(seed),
      idSample(col("id"), 5L), rounds = 2)

    // the codebook persists as a catalog table (it IS its own frame); a
    // restart reads back the exact frozen labeler
    cb.createOrReplaceTempView("v_sem_cb")
    g.sql("create table sem_cb as select * from v_sem_cb")
    val cbStored = g.sql("select c_id, c_qv from sem_cb")
    def labelRows(corpus: Seq[(Long, Seq[Float])],
                  book: org.apache.spark.sql.DataFrame) =
      Cluster.assignRows(qvOf(corpus), book)
        .select(col("id"), col("cluster"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(labelRows(seed, cbStored) == labelRows(seed, cb),
      "stored codebook must reconstruct the exact frozen labeler")

    // live maintenance: vectors label at the ingest edge and upsert into
    // the (vec_id PK, cluster) table; a revised vec_id replaces its label
    g.sql("create table sem_cluster (vec_id bigint, ts timestamp, " +
      "cluster bigint, primary key(vec_id))")
    val input = MemoryStream[StreamVec](spark)
    val q = g.ingestUpsert(
      EventStreams.clusterAssignStream(input.toDF(), cb),
      "sem_cluster", chk(), orderCol = "ts")
    input.addData((41L to 50L).map(i => StreamVec(i, ts(i.toInt), emb(i))): _*)
    q.processAllAvailable()
    // batch 2: five new vectors land and vec 41 is REVISED mid-stream —
    // its revision is emb(48)'s exact value, planting a guaranteed
    // in-cluster exact duplicate for the survivor assertion below
    input.addData((51L to 55L).map(i => StreamVec(i, ts(i.toInt), emb(i))) :+
      StreamVec(41L, ts(99), emb(41L, salt = 7)): _*)
    q.processAllAvailable(); q.stop()
    val latest = (42L to 55L).map(i => (i, emb(i))) :+ (41L, emb(41L, salt = 7))
    def liveRows() = g.sql("select vec_id, cluster from sem_cluster")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveRows() == labelRows(latest, cb),
      "live table must equal the frozen-codebook labeling of the latest corpus")

    // the live table IS semDedupLabels' labels input: survivors from the
    // maintained table equal the same-labels batch SemDeDup — no
    // re-clustering anywhere
    val corpusQv = qvOf(latest)
    val liveLabels = g.sql("select vec_id as id, cluster from sem_cluster")
    def keptOf(labels: org.apache.spark.sql.DataFrame) =
      Cluster.semDedupLabels(labels, corpusQv, threshold = 0.4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rebuilt = Cluster.assignRows(corpusQv, cb)
      .select(col("id"), col("cluster"))
    val kept = keptOf(liveLabels)
    assert(kept == keptOf(rebuilt),
      "survivors from the live table must equal the frozen-codebook batch SemDeDup")
    // the planted exact duplicate (41-revised == 48) drops its JUNIOR
    // side: 41 survives, 48 does not
    assert(kept.exists(_._1 == 41L) && !kept.exists(_._1 == 48L),
      "the planted in-cluster exact duplicate must drop the higher id")

    // codebook refresh = OPTIMIZE-style rewrite under a NEW codebook
    // (labels are only comparable under one codebook): retrain on the
    // grown corpus, re-assign EVERYTHING through the same upsert
    // machinery, and the table equals a from-scratch rebuild
    val grown = seed.filterNot(_._1 == 41L) ++ latest
    val cb2 = Cluster.kmeansCodebook(qvOf(grown),
      idSample(col("id"), 6L), rounds = 2)
    val refresh = MemoryStream[StreamVec](spark)
    val q2 = g.ingestUpsert(
      EventStreams.clusterAssignStream(refresh.toDF(), cb2),
      "sem_cluster", chk(), orderCol = "ts")
    refresh.addData(grown.zipWithIndex.map { case ((i, e), o) =>
      StreamVec(i, ts(200 + o), e) }: _*)
    q2.processAllAvailable(); q2.stop()
    assert(liveRows() == labelRows(grown, cb2),
      "refresh must equal the new-codebook rebuild of the grown corpus")
  }

  test("C18 marker protocol: torn marker reads as -1 (no wedge), the write is atomic, orphaned txn dirs are reaped, and a torn-marker redelivery converges") {
    val chkDir = chk()
    val p = java.nio.file.Paths.get(chkDir, "_graft_applied_batch")
    // a crash mid-write (the old non-atomic window) leaves a torn/empty
    // marker: it must read as "nothing recorded", never wedge on toLong
    Files.writeString(p, "")
    assert(g.lastAppliedBatch(chkDir) == -1L)
    Files.writeString(p, "12x")
    assert(g.lastAppliedBatch(chkDir) == -1L)
    // the atomic commit leaves no temp residue and round-trips
    g.commitAppliedBatch(chkDir, 3L)
    assert(g.lastAppliedBatch(chkDir) == 3L)
    assert(!Files.exists(p.resolveSibling("_graft_applied_batch.tmp")))
    // the janitor reaps strictly-older txn dirs (orphans from earlier
    // crashes) but KEEPS the latest applied one as the idempotence record
    def mkTxn(id: Long): java.nio.file.Path = {
      val d = java.nio.file.Paths.get(chkDir, "_graft_txn", id.toString)
      Files.createDirectories(d)
      Files.writeString(d.resolve("junk"), "x")
      d
    }
    val (t2, t3, t7) = (mkTxn(2), mkTxn(3), mkTxn(7))
    g.reapAppliedTxnDirs(chkDir, g.lastAppliedBatch(chkDir))
    assert(!Files.exists(t2), "strictly-older txn dirs must be reaped")
    assert(Files.exists(t3), "the latest applied txn record is kept")
    assert(Files.exists(t7), "an unapplied staged dir must survive the reap")
    deleteDirTree(java.nio.file.Paths.get(chkDir, "_graft_txn"))

    // end-to-end: after a torn marker, a redelivered batch (the -1 gate
    // lets it through) must converge by replace, not double-count
    g.sql("create table cont_dfm (h bigint, c bigint, primary key(h))")
    g.sql("create table cont_postingm (h bigint, doc_b bigint, " +
      "primary key(h, doc_b))")
    def body(d: Int) = (1 to 20).map(i => s"m${d}w$i").mkString(" ")
    val b0 = Seq((1L, body(1)), (2L, body(2)))
    def apply0(): Unit = g.applyContainmentBatch(
      b0.toDF("doc_id", "text"), 0L, "live", "cont_dfm", "live",
      "cont_postingm", chkDir, "doc_id", "text", 5, 2)
    apply0()
    assert(g.lastAppliedBatch(chkDir) == 0L)
    Files.writeString(p, "") // tear it
    apply0() // redelivery under the -1 gate
    val want = Containment.dfIndex(b0.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(g.sql("select h, c from cont_dfm").collect().map(_.toSeq).toSet
      == want, "redelivered batch must be a replace, not a double count")
  }

  private def deleteDirTree(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator.asScala.foreach(Files.delete)
    }

  test("C19 refresh racing an in-flight old-quantizer ingest: last-writer-wins, the stale-codes window is exactly the between-retrain-and-re-encode upserts, and the catch-up pass closes it") {
    import graft.functions.GraftFunctions.quantize
    val dim = 8; val m = 2
    def emb(id: Long, salt: Long = 0): Seq[Float] =
      Seq.tabulate(dim)(j => ((((id + salt) * 29 + j * 13) % 11) - 5) / 10.0f)
    def qvOf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("id", "embedding")
        .select(col("id"), quantize(col("embedding")).as("qv"))
    def encRows(corpus: Seq[(Long, Seq[Float])], i: IvfPq.Index) =
      IvfPq.encodeWith(qvOf(corpus), i).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
        .toSet
    g.sql("create table emb_race (vec_id bigint, ts timestamp, " +
      "cell bigint, codes array<bigint>, primary key(vec_id))")
    def upsert(ix: IvfPq.Index, rows: Seq[(Long, Seq[Float])], t0: Int): Unit = {
      val in = MemoryStream[StreamVec](spark)
      val q = g.ingestUpsert(
        EventStreams.embeddingIndexStream(in.toDF(), ix),
        "emb_race", chk(), orderCol = "ts")
      in.addData(rows.zipWithIndex.map { case ((i, e), o) =>
        StreamVec(i, ts(t0 + o), e) }: _*)
      q.processAllAvailable(); q.stop()
    }
    def liveRows() = g.sql("select vec_id, cell, codes from emb_race")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toList))
      .toSet

    val seed = (1L to 30L).map(i => (i, emb(i)))
    val ix1 = IvfPq.index(qvOf(seed), 30L, dim = dim, m = m, ksTarget = 4)
    upsert(ix1, seed, 0)
    val extra = (31L to 40L).map(i => (i, emb(i)))
    upsert(ix1, extra, 50)

    // refresh retrains on a SNAPSHOT of the corpus...
    val snapshot = seed ++ extra
    val ix2 = IvfPq.index(qvOf(snapshot), snapshot.size.toLong,
      dim = dim, m = m, ksTarget = 4)
    // ...and while it re-encodes, an ingest batch lands under the OLD
    // quantizer: vec 5 revised, vec 77 brand new
    val racing = Seq((5L, emb(5L, salt = 3)), (77L, emb(77L)))
    upsert(ix1, racing, 100)
    // the refresh re-encode commits AFTER the racer: last-writer-wins
    upsert(ix2, snapshot, 200)

    // pinned contract: keys IN the snapshot take the refresh encode (the
    // racing revision of vec 5 is lost until re-ingested); keys NOT in
    // the snapshot keep old-quantizer codes — the stale-codes window,
    // incomparable under ix2, is EXACTLY the upserts that landed between
    // retrain and re-encode
    assert(liveRows() ==
      encRows(snapshot, ix2) ++ encRows(Seq((77L, emb(77L))), ix1),
      "last-writer-wins with the stale window on off-snapshot keys")

    // the documented remedy: the refresh finishes with a catch-up pass
    // re-encoding every row upserted since the retrain under the NEW
    // quantizer — the table then equals the true-current-corpus rebuild
    upsert(ix2, racing, 300)
    val current = snapshot.filterNot(_._1 == 5L) ++ racing
    assert(liveRows() == encRows(current, ix2),
      "catch-up pass must close the stale-codes window")
  }

  test("C19/C21 refreshIndex ROUTINE: upserts injected between retrain and re-assign converge to the new-codebook rebuild; corpus deletes sweep index orphans") {
    import graft.functions.GraftFunctions.{idSample, quantize}
    import graft.operators.Cluster
    val dim = 8
    def emb(id: Long, salt: Long = 0): Seq[Float] =
      Seq.tabulate(dim)(j => ((((id + salt) * 37 + j * 19) % 13) - 6) / 10.0f)
    def qvOf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("id", "embedding")
        .select(col("id"), quantize(col("embedding")).as("qv"))
    g.sql("create table rf_corpus (vec_id bigint, ts timestamp, " +
      "embedding array<float>, primary key(vec_id))")
    g.sql("create table rf_labels (vec_id bigint, ts timestamp, " +
      "cluster bigint, primary key(vec_id))")
    def upsertCorpus(rows: Seq[(Long, Seq[Float])], t0: Int): Unit = {
      val in = MemoryStream[StreamVec](spark)
      val q = g.ingestUpsert(in.toDF(), "rf_corpus", chk(), orderCol = "ts")
      in.addData(rows.zipWithIndex.map { case ((i, e), o) =>
        StreamVec(i, ts(t0 + o), e) }: _*)
      q.processAllAvailable(); q.stop()
    }
    def upsertLabels(cb: org.apache.spark.sql.DataFrame,
                     rows: Seq[(Long, Seq[Float])], t0: Int): Unit = {
      val in = MemoryStream[StreamVec](spark)
      val q = g.ingestUpsert(
        EventStreams.clusterAssignStream(in.toDF(), cb),
        "rf_labels", chk(), orderCol = "ts")
      in.addData(rows.zipWithIndex.map { case ((i, e), o) =>
        StreamVec(i, ts(t0 + o), e) }: _*)
      q.processAllAvailable(); q.stop()
    }
    // deployment state: corpus + index live under the OLD codebook
    val seed = (1L to 40L).map(i => (i, emb(i)))
    val cb1 = Cluster.kmeansCodebook(qvOf(seed),
      idSample(col("id"), 5L), rounds = 2)
    upsertCorpus(seed, 0)
    upsertLabels(cb1, seed, 0)
    // a corpus DELETE strands an index orphan a rebuild would not have
    g.sql("delete from rf_corpus where vec_id = 10")

    // the refresh, with an ingest batch INJECTED between the retrain and
    // the re-assign: vec 5 revised, vec 77 brand new — both land in BOTH
    // tables under the OLD codebook (the ingest edge can't know a
    // retrain is in flight). This is the stale-labels window the C19/C21
    // contract describes; the routine must drain it.
    val racing = Seq((5L, emb(5L, salt = 3)), (77L, emb(77L)))
    var cb2Opt: Option[org.apache.spark.sql.DataFrame] = None
    val residual = g.refreshIndex("rf_labels", "rf_corpus", train = snap => {
      val snapQv = snap.select(col("vec_id").as("id"),
        quantize(col("embedding")).as("qv"))
      val cb2 = Cluster.kmeansCodebook(snapQv,
        idSample(col("id"), 5L), rounds = 2).localCheckpoint()
      cb2Opt = Some(cb2)
      upsertCorpus(racing, 100)
      upsertLabels(cb1, racing, 100)
      rows => EventStreams.clusterAssignStream(rows, cb2)
    })
    assert(residual == 0L, "the catch-up passes must drain the race window")

    // converged state == a from-scratch rebuild of the TRUE current
    // corpus under the new codebook: the racing revision re-labeled, the
    // racing insert re-labeled, the deleted key's orphan row swept
    val cb2 = cb2Opt.get
    val current = seed.filterNot(v => v._1 == 10L || v._1 == 5L) ++ racing
    val rebuilt = Cluster.assignRows(qvOf(current), cb2)
      .select(col("id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = g.sql("select vec_id, cluster from rf_labels")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(live == rebuilt,
      "refreshIndex must converge to the new-codebook rebuild of the true current corpus")
    assert(!live.exists(_._1 == 10L), "the corpus-deleted key must be swept")
    assert(live.exists(_._1 == 77L), "the racing insert must be re-labeled")
  }

  test("C19/C21 refreshIndex: a corpus DELETE landing MID-refresh is swept by the exit audit") {
    import graft.functions.GraftFunctions.{idSample, quantize}
    import graft.operators.Cluster
    val dim = 8
    def emb(id: Long): Seq[Float] =
      Seq.tabulate(dim)(j => (((id * 37 + j * 19) % 13) - 6) / 10.0f)
    def qvOf(rows: Seq[(Long, Seq[Float])]) =
      rows.toDF("id", "embedding")
        .select(col("id"), quantize(col("embedding")).as("qv"))
    g.sql("create table rf2_corpus (vec_id bigint, ts timestamp, " +
      "embedding array<float>, primary key(vec_id))")
    g.sql("create table rf2_labels (vec_id bigint, ts timestamp, " +
      "cluster bigint, primary key(vec_id))")
    val seed = (1L to 30L).map(i => (i, emb(i)))
    val cb1 = Cluster.kmeansCodebook(qvOf(seed),
      idSample(col("id"), 5L), rounds = 2)
    locally {
      val in = MemoryStream[StreamVec](spark)
      val q = g.ingestUpsert(in.toDF(), "rf2_corpus", chk(), orderCol = "ts")
      in.addData(seed.zipWithIndex.map { case ((i, e), o) =>
        StreamVec(i, ts(o), e) }: _*)
      q.processAllAvailable(); q.stop()
    }
    locally {
      val in = MemoryStream[StreamVec](spark)
      val q = g.ingestUpsert(
        EventStreams.clusterAssignStream(in.toDF(), cb1),
        "rf2_labels", chk(), orderCol = "ts")
      in.addData(seed.zipWithIndex.map { case ((i, e), o) =>
        StreamVec(i, ts(o), e) }: _*)
      q.processAllAvailable(); q.stop()
    }
    // the delete fires INSIDE the refresh, after the snapshot pinned:
    // the snapshot still contains key 7 (the re-encode re-adds it), the
    // live-row window scans never see a deleted key, and its tombstone
    // could even be folded by a racing compaction — only the exit
    // audit's anti-join can catch it
    var cb2Opt: Option[org.apache.spark.sql.DataFrame] = None
    val residual = g.refreshIndex("rf2_labels", "rf2_corpus", train = snap => {
      val snapQv = snap.select(col("vec_id").as("id"),
        quantize(col("embedding")).as("qv"))
      val cb2 = Cluster.kmeansCodebook(snapQv,
        idSample(col("id"), 5L), rounds = 2).localCheckpoint()
      cb2Opt = Some(cb2)
      g.sql("delete from rf2_corpus where vec_id = 7")
      rows => EventStreams.clusterAssignStream(rows, cb2)
    })
    assert(residual == 0L)
    val current = seed.filterNot(_._1 == 7L)
    val rebuilt = Cluster.assignRows(qvOf(current), cb2Opt.get)
      .select(col("id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val live = g.sql("select vec_id, cluster from rf2_labels")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!live.exists(_._1 == 7L),
      "the mid-refresh-deleted key must not survive in the index")
    assert(live == rebuilt,
      "converged state must equal the rebuild of the post-delete corpus")
  }

  test("C18 C15's ingest probe against the LIVE posting table finds a quote-in-host pair") {
    // corpus (with a long host doc) lands through the maintenance
    // stream; then the ingest-edge probe (C15) reads the live catalog
    // table instead of a static frame
    val quote = "the sacred river ran through caverns measureless to man down to a sunless sea"
    val host = "in xanadu did kubla khan a stately pleasure dome decree where " +
      quote + " so twice five miles of fertile ground with walls and towers were girdled round"
    g.sql("create table cont_df2 (h bigint, c bigint, primary key(h))")
    g.sql("create table cont_posting2 (h bigint, doc_b bigint, " +
      "primary key(h, doc_b))")
    val maintIn = MemoryStream[StreamDoc](spark)
    val maint = g.maintainContainmentIndex(maintIn.toDF(), "cont_df2",
      "cont_posting2", chk())
    maintIn.addData(
      StreamDoc(100, ts(0), host),
      StreamDoc(101, ts(1), "completely unrelated background document about stream state and watermarks expiry"))
    maint.processAllAvailable(); maint.stop()

    val probeIn = MemoryStream[StreamDoc](spark)
    val probe = EventStreams.containmentCandidatesStream(probeIn.toDF(),
      g.sql("select h, doc_b from cont_posting2"))
      .writeStream.format("memory").queryName("c18_probe_sink")
      .outputMode("append")
      .option("checkpointLocation", chk()).start()
    probeIn.addData(StreamDoc(1, ts(5), quote))
    probe.processAllAvailable()
    probeIn.addData(StreamDoc(99, ts(2000),
      "watermark advancing sentinel document with plenty of words here"))
    probe.processAllAvailable(); probe.stop()
    val got = spark.table("c18_probe_sink").select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 100L)),
      s"the quoted doc must surface against its host via the live index; got=$got")
  }
}
