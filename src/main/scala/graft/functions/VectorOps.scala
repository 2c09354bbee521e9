package graft.functions

/** Scalar kernels shared by the interpreted eval and the generated code of
  * the native expressions. Keeping the loop in one static method means
  * whole-stage codegen emits a single monomorphic call — the JIT inlines
  * and vectorizes it — while interp eval stays identical.
  */
object VectorOps {

  /** Cosine similarity over float vectors, double accumulation. */
  def cosineF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Dot product over float vectors, double accumulation. */
  def dotF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    dot
  }

  /** FNV-1a 64-bit over UTF-8 bytes (self-contained, stable across Spark
    * versions — no dependence on internal hash utilities).
    */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: per-bit majority vote of the
    * tokens' FNV-1a hashes. Near-identical documents differ in few bits,
    * so Hamming-distance buckets find near-dups without pairwise compare.
    */
  def simhash64(tokens: Array[Array[Byte]]): Long = {
    val counts = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val h = fnv1a64(tokens(t))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** Position-weighted rolling checksum over ASCII text. The exact
    * arithmetic (1-based index, weight (i*131 % 997)+1, plain int64 sum)
    * is mirrored by the DuckDB oracle SQL — keep them in lockstep.
    */
  def fingerprint(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      val w = (((i + 1).toLong * 131L) % 997L) + 1L
      acc += (bytes(i) & 0xffL) * w
      i += 1
    }
    acc
  }
}
