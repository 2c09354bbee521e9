package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.VectorOps

/** ArrayData-facing kernels called from both interpreted eval and the
  * generated code (one call site keeps the two paths bit-identical).
  */
object ExprKernels {
  def cosine(a: ArrayData, b: ArrayData): Double =
    VectorOps.cosineF(a.toFloatArray(), b.toFloatArray())

  def dot(a: ArrayData, b: ArrayData): Double =
    VectorOps.dotF(a.toFloatArray(), b.toFloatArray())

  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = tokens.getUTF8String(i).getBytes
      i += 1
    }
    VectorOps.simhash64(bytes)
  }

  def fingerprint(s: UTF8String): Long = VectorOps.fingerprint(s.getBytes)

  /** Exact integer dot product over array<bigint> (quantized vectors).
    * Values fit long: 6-decimal-quantized unit floats are ≤ 1e6, so a
    * dim-64 dot is ≤ 6.4e13 ≪ Long.MaxValue.
    */
  def dotL(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }

  /** Per-permutation seeds for the MinHash hash family: seed(i) =
    * xxhash64 of the Int literal i with Spark's default seed 42 — exactly
    * the inner state `xxhash64(lit(i), shingle)` reaches after its first
    * child, so signatures are bit-identical to the HOF formulation
    * (array_min(transform(sh, s => xxhash64(lit(i), s)))) they replace.
    */
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]
  private def seeds(perms: Int): Array[Long] =
    seedCache.computeIfAbsent(perms, p =>
      Array.tabulate(p)(i => XxHash64Function.hash(i, IntegerType, 42L)))

  /** MinHash signature in ONE pass over the shingle array: perms × |sh|
    * seeded xxhash64 calls with no per-element lambda interpretation —
    * the hot loop of the dedup family at corpus scale. Returns null for
    * an empty shingle set (callers filter those upstream).
    */
  def minhashSig(sh: ArrayData, perms: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val sd = seeds(perms)
    val mins = Array.fill(perms)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val s = sh.getUTF8String(t)
      var i = 0
      while (i < perms) {
        val h = XxHash64Function.hash(s, StringType, sd(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** Distinct k-token shingles of a text, natively. Tokens are the
    * single-space splits of the text (split(' ', -1) semantics, empty
    * tokens kept); a shingle of k consecutive tokens joined with ' ' is
    * therefore exactly the original byte span from the first token's
    * start to the last token's end — so each shingle is a zero-copy
    * UTF8String slice. Distinctness keeps first occurrence, matching
    * array_distinct(transform(sequence(...), concat_ws(slice(...)))).
    * Returns an empty array when there are fewer than k tokens.
    */
  def textShingles(text: UTF8String, k: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    // token boundaries: split at 0x20 (never part of a UTF-8 multibyte seq)
    val starts = new java.util.ArrayList[Int]
    starts.add(0)
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) starts.add(i + 1); i += 1 }
    val tokens = starts.size
    if (tokens < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]
    var t = 0
    while (t <= tokens - k) {
      val from = starts.get(t)
      val until = if (t + k == tokens) n else starts.get(t + k) - 1
      seen.add(UTF8String.fromBytes(bytes, from, until - from))
      t += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** k-gram frequency stats in ONE tokenize pass: (n_grams, n_distinct,
    * max multiplicity). Same split(' ', -1) tokenization and zero-copy
    * byte-slice grams as textShingles, so the three fields are
    * value-identical to size(grams), size(array_distinct(grams)), and
    * the sorted-run-length fold over grams — which as composed Catalyst
    * expressions cost O(k²) pairwise UTF8String equality per doc
    * (array_distinct) plus interpreted-lambda folds: ~1.8 ms/doc at
    * sf0.1 vs ~8 µs here (q55: 8.9 → 0.3 s once the bench stopped
    * letting count() prune the projection entirely).
    */
  def textGramStats(text: UTF8String, k: Int): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    val starts = new java.util.ArrayList[Int]
    starts.add(0)
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) starts.add(i + 1); i += 1 }
    val tokens = starts.size
    if (tokens < k)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0, 0))
    val counts = new java.util.HashMap[UTF8String, Integer]
    var maxf = 0
    var t = 0
    while (t <= tokens - k) {
      val from = starts.get(t)
      val until = if (t + k == tokens) n else starts.get(t + k) - 1
      val g = UTF8String.fromBytes(bytes, from, until - from)
      val c = counts.merge(g, 1, (a: Integer, b: Integer) => a + b)
      if (c > maxf) maxf = c
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](tokens - k + 1, counts.size, maxf))
  }

  /** Count of matches of `[a-z]+|[0-9]+|[^a-z0-9 ]` — the BPE-ish token
    * count of q39 — as one linear byte scan instead of a regex engine
    * materializing every match string. Alternation semantics replayed
    * exactly: a lowercase run is one match, a digit run is one match,
    * every other CODE POINT (not byte — continuation bytes 0b10xxxxxx
    * are skipped, so multibyte UTF-8 chars count once, as the regex's
    * per-character class does) except space is one match.
    */
  def regexTokenCount(text: UTF8String): Int = {
    val bytes = text.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        count += 1
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
      } else if (b >= '0' && b <= '9') {
        count += 1
        while (i < n && bytes(i) >= '0' && bytes(i) <= '9') i += 1
      } else {
        if (b != ' ' && (b & 0xc0) != 0x80) count += 1
        i += 1
      }
    }
    count
  }

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** First 48 bits of md5(bytes of the string) as a non-negative long —
    * bit-identical to conv(substring(md5(cast(s as binary)), 1, 12), 16,
    * 10): the first 12 hex chars ARE the first 6 digest bytes big-endian.
    * One kernel call replaces a 4-expression chain (cast→md5-hex→
    * substring→base-16 parse) that allocates a 32-char hex string and
    * re-parses it per row; the digest object is thread-local (the JDK
    * returns a fresh MessageDigest per getInstance call).
    */
  def md5Prefix48(s: UTF8String): Long = {
    val md = md5TL.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) | ((d(2) & 0xffL) << 24) |
      ((d(3) & 0xffL) << 16) | ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** All overlapping L-token window md5 fingerprints of a text in one
    * pass (SURVEY.md §2.D38 ExactSubstr) — the raw 16 digest bytes per
    * window, in window-position order (posexplode pairs each with its
    * position). A window of L consecutive single-space tokens IS the
    * original byte span from token t's start to token t+L-1's end (the
    * textShingles zero-copy argument), so each digest updates directly
    * over the text's byte array: bit-identical to
    * unhex(md5(cast(concat_ws(' ', slice(split(text, ' '), t+1, L)) as
    * binary))) with none of the per-window slice/concat/hex allocations.
    * Empty array when the text has fewer than L tokens.
    */
  def windowMd5s(text: UTF8String, L: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val starts = new java.util.ArrayList[Int]
    starts.add(0)
    var i = 0
    while (i < n) { if (bytes(i) == ' '.toByte) starts.add(i + 1); i += 1 }
    val tokens = starts.size
    if (tokens < L)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val md = md5TL.get()
    val out = new Array[Any](tokens - L + 1)
    var t = 0
    while (t <= tokens - L) {
      val from = starts.get(t)
      val until = if (t + L == tokens) n else starts.get(t + L) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(t) = md.digest()
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** MinHash LSH band keys straight from the shingle set: signature (as
    * `minhashSig`) then, per band b, the xxhash64 fold of (b, sig-slice)
    * — bit-identical to xxhash64(lit(b), slice(sig, b*rows+1, rows)),
    * whose interpreted form folds seed→hashInt(b)→hashLong(elem)… over
    * the slice. One expression means one evaluation per row under a
    * Generate (explode): the signature is NOT recomputed per band, which
    * is the difference between |sh|·perms and |sh|·perms·bands hashes at
    * corpus scale.
    */
  def minhashBands(sh: ArrayData, perms: Int, bands: Int): ArrayData = {
    val sigArr = minhashSig(sh, perms)
    if (sigArr == null) return null
    val rows = perms / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XxHash64Function.hash(b, IntegerType, 42L)
      var j = b * rows
      while (j < (b + 1) * rows) {
        h = XxHash64Function.hash(sigArr.getLong(j), LongType, h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Nearest-centroid cells of a quantized vector against a codebook of
    * (c_id, c_qv, c_dot) structs, ordered by cosine desc then c_id asc —
    * exactly ROW_NUMBER() OVER (ORDER BY c_cos DESC, c_id) ≤ nprobe, with
    * the same IEEE double sequence (long dot → toDouble → /sqrt(a*b)) as
    * the pairwise cos used everywhere else, so oracle SQL replaying the
    * window formulation matches bit-for-bit. Runs map-side over a
    * broadcast codebook: the IVF assignment pass touches each corpus row
    * once with ZERO exchange (SURVEY.md §2.D7b).
    */
  def nearestCells(qv: ArrayData, selfdot: Double, cb: ArrayData,
                   nprobe: Int): ArrayData = {
    val n = cb.numElements()
    val m = math.min(nprobe, n)
    val bestCos = Array.fill(m)(Double.NegativeInfinity)
    val bestId = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < n) {
      val c = cb.getStruct(i, 3)
      val cid = c.getLong(0)
      val cos = dotL(qv, c.getArray(1)).toDouble /
        math.sqrt(selfdot * c.getDouble(2))
      if (cnt < m || cos > bestCos(m - 1) ||
          (cos == bestCos(m - 1) && cid < bestId(m - 1))) {
        var j = math.min(cnt, m - 1)
        while (j > 0 && (cos > bestCos(j - 1) ||
            (cos == bestCos(j - 1) && cid < bestId(j - 1)))) {
          bestCos(j) = bestCos(j - 1); bestId(j) = bestId(j - 1); j -= 1
        }
        bestCos(j) = cos; bestId(j) = cid
        if (cnt < m) cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bestId, cnt))
  }

  def nearestCentroid(qv: ArrayData, selfdot: Double, cb: ArrayData): Long =
    nearestCells(qv, selfdot, cb, 1).getLong(0)

  /** PQ per-subspace encode (SURVEY.md §2.D7f hot loop): for each of m
    * subspaces, the rank (0..ks-1) of the squared-L2-nearest centroid in
    * the flattened codebook. `cbFlat` layout: for sub s, rank r, the
    * (subDim+1)-long block [c_sv(subDim longs), c_self] at offset
    * (s·ks + r)·(subDim+1) — ranks assigned by c_id order upstream, so
    * first-wins on equal d² IS the (d², c_id) argmin tie-break. All
    * exact BIGINT arithmetic (d² = qself + cself − 2·dot), bit-identical
    * to the declarative min(struct(d², c_id)) formulation the q80
    * oracle replays (NativeExprSpec pins it).
    */
  def pqCodes(qv: ArrayData, cbFlat: ArrayData,
              m: Int, subDim: Int, ks: Int): ArrayData = {
    val out = new Array[Long](m)
    val stride = subDim + 1
    var s = 0
    while (s < m) {
      var qself = 0L
      var d = 0
      while (d < subDim) {
        val x = qv.getLong(s * subDim + d); qself += x * x; d += 1
      }
      var bestD2 = Long.MaxValue
      var bestR = 0L
      var r = 0
      while (r < ks) {
        val base = (s * ks + r) * stride
        var dot = 0L
        d = 0
        while (d < subDim) {
          dot += qv.getLong(s * subDim + d) * cbFlat.getLong(base + d); d += 1
        }
        val dd = qself + cbFlat.getLong(base + subDim) - 2L * dot
        if (dd < bestD2) { bestD2 = dd; bestR = r }
        r += 1
      }
      out(s) = bestR
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Deterministic Rademacher hyperplane signs: sign(p, d) = parity of
    * the first hex nibble of md5("p:d"), mapped to ±1. md5 (not xxhash64)
    * so the SAME constant matrix is reproducible in plain SQL —
    * `('0x' || substring(md5(p || ':' || d), 1, 1))::INT % 2 * 2 - 1` —
    * which is what lets the DuckDB oracle replay the full LSH pipeline
    * (q36). The matrix is a data-independent constant, computed once per
    * (planes, dim) and cached.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]
  private def hyperplaneSigns(planes: Int, dim: Int): Array[Array[Long]] =
    signCache.computeIfAbsent((planes, dim), { case (p0, d0) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(p0, d0) { (p, d) =>
        val digest = md.digest(s"$p:$d".getBytes("UTF-8"))
        (((digest(0) >> 4) & 1).toLong * 2L) - 1L
      }
    })

  /** Hyperplane LSH signature (q36's family): bit p of the result = sign
    * of Σ_d qv[d] * sign(p, d) over the cached md5-derived ±1 matrix.
    */
  def hyperplaneSig(qv: ArrayData, planes: Int): Long = {
    val dim = qv.numElements()
    val signs = hyperplaneSigns(planes, dim)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val sp = signs(p)
      var proj = 0L
      var d = 0
      while (d < dim) { proj += qv.getLong(d) * sp(d); d += 1 }
      if (proj >= 0L) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Native codegen cosine similarity over `array<float>` — the hot kernel
  * of the similarity/dedup family (SURVEY.md §2.E4). A Catalyst
  * Expression (not a UDF) so it stays inside whole-stage codegen: no
  * boxing, no Row conversion, one JIT-inlined static call per row.
  */
case class CosineSimilarityF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"org.apache.spark.sql.graft.ExprKernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityF =
    copy(left = newLeft, right = newRight)
}

/** Native codegen dot product over `array<float>`. */
case class DotProductF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"org.apache.spark.sql.graft.ExprKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductF =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of a token array (SURVEY.md §2.D3). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(tokens: Any): Any =
    ExprKernels.simhash(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"org.apache.spark.sql.graft.ExprKernels.simhash($t)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Position-weighted rolling fingerprint of a document (SURVEY.md §2.D11).
  * Arithmetic mirrored exactly by the DuckDB oracle (see Pipeline.q42).
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "doc_fingerprint"

  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.fingerprint(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.fingerprint($s)")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** Exact long dot product over quantized vectors — the per-pair kernel of
  * the similarity family (q34/q35/q36). Replaces an interpreted
  * aggregate(zip_with(...)) pair of higher-order functions with one
  * codegen'd static call: at 2M candidate pairs that is the difference
  * between ~100M interpreted lambda evals and one tight loop per pair.
  */
case class DotLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_l"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ExprKernels.dotL(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"org.apache.spark.sql.graft.ExprKernels.dotL($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** PQ per-subspace encode over the flattened broadcast codebook — the
  * scan-local projection kernel that replaces the explode(m) → broadcast
  * join → keyed-argmin encode (SURVEY.md §2.D7f; ExprKernels.pqCodes
  * carries the layout and tie-break contract).
  */
case class PqCodesE(left: Expression, right: Expression,
                    m: Int, subDim: Int, ks: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(qv: Any, cb: Any): Any =
    ExprKernels.pqCodes(qv.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, subDim, ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (qv, cb) =>
      s"org.apache.spark.sql.graft.ExprKernels.pqCodes($qv, $cb, $m, $subDim, $ks)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqCodesE =
    copy(left = newLeft, right = newRight)
}

/** One-pass MinHash signature (SURVEY.md §2.D2 hot loop). Bit-identical
  * to array_min(transform(sh, s => xxhash64(lit(i), s))) per permutation
  * — see ExprKernels.seeds.
  */
case class MinHashSigE(child: Expression, perms: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(sh: Any): Any =
    ExprKernels.minhashSig(sh.asInstanceOf[ArrayData], perms)

  // kernel returns null for an empty shingle set — propagate as SQL NULL
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.sql.graft.ExprKernels.minhashSig($s, $perms);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSigE =
    copy(child = newChild)
}

/** Text → distinct k-token shingles in one evaluation (SURVEY.md §2.D2/D4). */
case class TextShinglesE(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "text_shingles"

  override protected def nullSafeEval(text: Any): Any =
    ExprKernels.textShingles(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.textShingles($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): TextShinglesE =
    copy(child = newChild)
}

/** Text → count of `[a-z]+|[0-9]+|[^a-z0-9 ]` matches (SURVEY.md §2.D10). */
case class RegexTokenCountE(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "regex_token_count"

  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.regexTokenCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.regexTokenCount($s)")

  override protected def withNewChildInternal(newChild: Expression): RegexTokenCountE =
    copy(child = newChild)
}

/** Text → all overlapping L-token window md5 fingerprints, raw 16-byte
  * digests in position order (SURVEY.md §2.D38 ExactSubstr hot path).
  */
case class WindowMd5sE(child: Expression, windowTokens: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def prettyName: String = "window_md5s"

  override protected def nullSafeEval(text: Any): Any =
    ExprKernels.windowMd5s(text.asInstanceOf[UTF8String], windowTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      s => s"org.apache.spark.sql.graft.ExprKernels.windowMd5s($s, $windowTokens)")

  override protected def withNewChildInternal(newChild: Expression): WindowMd5sE =
    copy(child = newChild)
}

/** String → first 48 md5 bits as long (SURVEY.md §2.A4c KMV hash). */
case class Md5Prefix48E(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix48"

  override protected def nullSafeEval(s: Any): Any =
    ExprKernels.md5Prefix48(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.md5Prefix48($s)")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix48E =
    copy(child = newChild)
}

/** Text → the whole D34 PII scan in one evaluation: detection counts
  * (emails, phones, ips, Luhn-gated cards) on the raw text plus the
  * six-step fixed-order redaction chain (SURVEY.md §2.D34). Replaces
  * ~13 Java backtracking-regex passes with hand-compiled scanners that
  * replay the patterns' exact find/replaceAll semantics — PiiKernel
  * carries the exactness contract; PiiScrubSpec pins kernel == regex
  * forms on planted classes and fuzzed inputs.
  */
case class PiiScanE(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("emails", IntegerType, nullable = false),
    StructField("phones", IntegerType, nullable = false),
    StructField("ips", IntegerType, nullable = false),
    StructField("cards", IntegerType, nullable = false),
    StructField("red", StringType, nullable = false)))
  override def prettyName: String = "pii_scan"

  override protected def nullSafeEval(text: Any): Any =
    PiiKernel.piiScan(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.PiiKernel.piiScan($s)")

  override protected def withNewChildInternal(newChild: Expression): PiiScanE =
    copy(child = newChild)
}

/** Text → k-gram (count, distinct, max multiplicity) in one evaluation
  * (SURVEY.md §2.D18). */
case class TextGramStatsE(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_freq", IntegerType, nullable = false)))
  override def prettyName: String = "text_gram_stats"

  override protected def nullSafeEval(text: Any): Any =
    ExprKernels.textGramStats(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.textGramStats($s, $k)")

  override protected def withNewChildInternal(newChild: Expression): TextGramStatsE =
    copy(child = newChild)
}

/** Shingles → LSH band keys in one evaluation (SURVEY.md §2.D2). */
case class MinHashBandsE(child: Expression, perms: Int, bands: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(sh: Any): Any =
    ExprKernels.minhashBands(sh.asInstanceOf[ArrayData], perms, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = org.apache.spark.sql.graft.ExprKernels.minhashBands($s, $perms, $bands);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashBandsE =
    copy(child = newChild)
}

/** Rademacher hyperplane LSH signature (SURVEY.md §2.D7). */
case class HyperplaneSigE(child: Expression, planes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(qv: Any): Any =
    ExprKernels.hyperplaneSig(qv.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.ExprKernels.hyperplaneSig($s, $planes)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigE =
    copy(child = newChild)
}

/** IVF codebook element type shared by the nearest-centroid expressions:
  * (c_id, quantized centroid vector, precomputed centroid self-dot).
  */
object CodebookType {
  val entry: StructType = StructType(Seq(
    StructField("c_id", LongType, nullable = false),
    StructField("c_qv", ArrayType(LongType), nullable = false),
    StructField("c_dot", DoubleType, nullable = false)))
  val array: ArrayType = ArrayType(entry, containsNull = false)
}

/** Nearest codebook centroid of a quantized vector — the map-side IVF
  * assignment kernel (SURVEY.md §2.D7b). The codebook arrives as a
  * broadcast one-row array column, so the corpus assignment pass is a
  * pure projection: no Window, no Exchange, each row evaluated once.
  */
case class NearestCentroidE(first: Expression, second: Expression,
                            third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), DoubleType, CodebookType.array)
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(qv: Any, selfdot: Any, cb: Any): Any =
    ExprKernels.nearestCentroid(qv.asInstanceOf[ArrayData],
      selfdot.asInstanceOf[Double], cb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (qv, sd, cb) =>
      s"org.apache.spark.sql.graft.ExprKernels.nearestCentroid($qv, $sd, $cb)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCentroidE =
    copy(first = f, second = s, third = t)
}

/** The `nprobe` nearest codebook centroids of a query vector, best first
  * (cosine desc, c_id asc) — IVF probe selection with the identical
  * arithmetic and tie-break as NearestCentroidE.
  */
case class NearestCellsE(first: Expression, second: Expression,
                         third: Expression, nprobe: Int)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), DoubleType, CodebookType.array)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(qv: Any, selfdot: Any, cb: Any): Any =
    ExprKernels.nearestCells(qv.asInstanceOf[ArrayData],
      selfdot.asInstanceOf[Double], cb.asInstanceOf[ArrayData], nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (qv, sd, cb) =>
      s"org.apache.spark.sql.graft.ExprKernels.nearestCells($qv, $sd, $cb, $nprobe)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): NearestCellsE =
    copy(first = f, second = s, third = t)
}

/** Bounded top-k buffer: parallel arrays kept sorted best→worst under
  * (score desc, id asc). `add` is O(1) reject for a row that doesn't make
  * the cut — the common case once a partition's heap warms up — and
  * O(k) shift otherwise (k is small: 10–100).
  */
final class TopKBuf(val k: Int, val dedup: Boolean = false) extends Serializable {
  var n: Int = 0
  val scores: Array[Double] = new Array[Double](k)
  val ids: Array[Long] = new Array[Long](k)

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def add(s: Double, id: Long): Unit = {
    if (n == k && !better(s, id, scores(k - 1), ids(k - 1))) {
      // a duplicate of the current worst is also (correctly) rejected here
      return
    }
    // find the insertion point first (no mutation), so dedup can bail out
    var j = if (n == k) k - 1 else n
    while (j > 0 && better(s, id, scores(j - 1), ids(j - 1))) j -= 1
    // dedup mode keeps k DISTINCT best pairs (the KMV sketch contract):
    // the scan stops below an equal element, so equality can only sit
    // immediately above the insertion point
    if (dedup && j > 0 && scores(j - 1) == s && ids(j - 1) == id) return
    var m = if (n == k) k - 1 else n
    while (m > j) { scores(m) = scores(m - 1); ids(m) = ids(m - 1); m -= 1 }
    scores(j) = s; ids(j) = id
    if (n < k) n += 1
  }

  def mergeIn(o: TopKBuf): Unit = {
    var i = 0
    while (i < o.n) { add(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** Partial top-k aggregate: per-group best k (score, id) pairs under
  * (score desc, id asc), returned as a sorted array<struct<id,score>>
  * (SURVEY.md §2.D6). The point is the SHUFFLE SHAPE: the map-side
  * partial keeps only k rows per group per partition, so a brute-force
  * ANN over |corpus|×|queries| scored pairs exchanges ≤ partitions ×
  * |queries| × k buffer rows instead of every scored row — the
  * difference between a corpus-sized shuffle and a constant one at
  * 100 TB. Tie-break matches ROW_NUMBER() OVER (ORDER BY score DESC,
  * id) so window-based oracles stay bit-identical.
  */
case class TopKPairs(score: Expression, id: Expression, k: Int,
                     dedup: Boolean = false,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuf]
    with BinaryLike[Expression] with ExpectsInputTypes {

  require(k > 0, "topk_pairs requires k > 0")

  override def left: Expression = score
  override def right: Expression = id
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k, dedup)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: TopKBuf): Any = {
    val out = new Array[Any](buf.n)
    var i = 0
    while (i < buf.n) {
      out(i) = InternalRow(buf.ids(i), buf.scores(i)); i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt(), dedup)
    val n = bb.getInt()
    var i = 0
    // entries arrive already sorted, so add() appends in O(1) each
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      buf.add(s, id); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(score = newLeft, id = newRight)
}
