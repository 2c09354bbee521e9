package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, CosineSimilarityF, DotLong, DotProductF, HyperplaneSigE, Md5Prefix48E, MinHashBandsE, MinHashSigE, PiiScanE, RegexTokenCountE, NearestCellsE, NearestCentroidE, PqCodesE, RollingFingerprint, SimHash64, TextGramStatsE, TextShinglesE, TopKPairs, WindowMd5sE}

/** Column-API surface of graft's text/vector function library
  * (SURVEY.md §2.D/E4). Everything here is either a native codegen
  * expression or a composition of codegen'd built-ins — no Scala UDFs in
  * any hot path, so whole-stage codegen spans stay wide.
  */
object GraftFunctions {

  private def expr2col(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    Bridge.column(e)
  private def exprOf(c: Column) = Bridge.expression(c)

  // ---- native expressions ------------------------------------------------

  /** Cosine similarity over array<float> (native codegen, double accum). */
  def cosineSim(a: Column, b: Column): Column =
    expr2col(CosineSimilarityF(exprOf(a), exprOf(b)))

  /** Dot product over array<float> (native codegen). */
  def dotF(a: Column, b: Column): Column =
    expr2col(DotProductF(exprOf(a), exprOf(b)))

  /** 64-bit SimHash of a token array (native codegen). */
  def simhash64(tokens: Column): Column =
    expr2col(SimHash64(exprOf(tokens)))

  /** Rolling position-weighted fingerprint of a document (native codegen). */
  def fingerprint(text: Column): Column =
    expr2col(RollingFingerprint(exprOf(text)))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  // ---- tokenization / shingling -----------------------------------------

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct k-word shingles of a token array (empty if < k tokens). */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      array_distinct(transform(
        sequence(lit(0), size(toks) - lit(k)),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct k-word shingles straight from the text — native zero-copy
    * kernel (TextShinglesE), value-identical to
    * shingles(tokens(text), k). The corpus-scan hot path of the dedup
    * family: no per-shingle slice/concat allocation, no lambda
    * interpretation.
    */
  def textShingles(text: Column, k: Int): Column =
    expr2col(TextShinglesE(exprOf(text), k))

  /** One-pass k-gram stats struct (n_grams, n_distinct, max_freq) —
    * native kernel, value-identical to size(grams) /
    * size(array_distinct(grams)) / the sorted run-length fold
    * (NativeExprSpec pins all three).
    */
  def textGramStats(text: Column, k: Int): Column =
    expr2col(TextGramStatsE(exprOf(text), k))

  /** All overlapping L-token window md5 fingerprints (raw 16-byte
    * digests, window-position order — pair with posexplode). Native
    * one-pass kernel, value-identical to transform(sequence(0, n-L),
    * i -> unhex(md5(concat_ws(' ', slice(tokens, i+1, L))))) with no
    * per-window slice/concat/hex allocation (NativeExprSpec pins it).
    */
  def windowMd5s(text: Column, windowTokens: Int): Column =
    expr2col(WindowMd5sE(exprOf(text), windowTokens))

  /** Count of `[a-z]+|[0-9]+|[^a-z0-9 ]` matches — native linear scan,
    * value-identical to size(regexp_extract_all(text, ...)) without the
    * regex engine materializing every match (NativeExprSpec pins it).
    */
  def regexTokenCount(text: Column): Column =
    expr2col(RegexTokenCountE(exprOf(text)))

  // ---- MinHash ----------------------------------------------------------

  /** Number of hash permutations / LSH banding shape. 32 bands × 2 rows:
    * a pair at jaccard j collides in ≥1 band with prob 1-(1-j²)^32 —
    * miss 1e-4 at j=0.5, 4.6e-10 at j=0.7 — so recall over the oracle's
    * j≥0.5 threshold is effectively exact. The narrower rows (2 vs 4)
    * admit more low-j candidates, but background shingle collisions are
    * rare and the in-bucket exact verify bounds the cost.
    */
  val MinhashPerms = 64
  val MinhashBands = 32
  val MinhashRows: Int = MinhashPerms / MinhashBands

  /** MinHash signature (array<bigint> of length `MinhashPerms`) of a
    * shingle set: permutation i = min over shingles of the seeded hash
    * xxhash64(i, shingle) — k independent hash functions without any
    * multiply (ANSI-safe: a universal `a*h+b mod p` overflows int64).
    * Native one-pass codegen expression (MinHashSigE): no explode, no
    * shuffle, no per-element lambda interpretation; bit-identical to the
    * equivalent array_min(transform(...)) per permutation.
    */
  def minhashSig(sh: Column): Column =
    expr2col(MinHashSigE(exprOf(sh), MinhashPerms))

  /** LSH band keys of a signature: one 64-bit key per band. Docs sharing
    * any band key become candidate pairs — the linear-time scale path
    * (never O(n²) over the corpus).
    */
  def bandKeys(sig: Column): Column =
    array((0 until MinhashBands).map { bnd =>
      xxhash64(lit(bnd), slice(sig, bnd * MinhashRows + 1, MinhashRows))
    }: _*)

  /** Shingles → band keys in one native evaluation (sig computed once,
    * not once per band — see MinHashBandsE). Equals
    * bandKeys(minhashSig(sh)) value-for-value.
    */
  def minhashBandKeys(sh: Column): Column =
    expr2col(MinHashBandsE(exprOf(sh), MinhashPerms, MinhashBands))

  /** Band keys under an explicit (perms, bands) shape — the cost-based
    * banding path (operators.Banding). `bands` must divide `perms`.
    */
  def minhashBandKeys(sh: Column, perms: Int, bands: Int): Column = {
    require(bands > 0 && perms % bands == 0,
      s"bands ($bands) must divide perms ($perms)")
    expr2col(MinHashBandsE(exprOf(sh), perms, bands))
  }

  // ---- quantized vector ops (oracle-exact cross-engine arithmetic) ------

  /** Embedding quantized to 6-decimal fixed point as array<bigint>.
    * float→double is exact, ×1e6 and HALF_UP round are deterministic, so
    * DuckDB's `list_transform(v, x -> CAST(ROUND(x*1000000,0) AS BIGINT))`
    * produces the identical integers — all downstream arithmetic is then
    * engine-exact (SURVEY.md §4).
    */
  def quantize(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(1000000.0)).cast("long"))

  /** Exact integer dot product of two quantized vectors — native codegen
    * (DotLong), the per-pair kernel of q34/q35/q36.
    */
  def quantDot(qa: Column, qb: Column): Column =
    expr2col(DotLong(exprOf(qa), exprOf(qb)))

  /** 16-plane deterministic Rademacher LSH signature of a quantized
    * vector (native codegen) — q36's corpus-scale candidate generator.
    */
  def hyperplaneSig(qv: Column, planes: Int = 16): Column =
    expr2col(HyperplaneSigE(exprOf(qv), planes))

  /** Nearest codebook centroid id (IVF assignment) — native codegen over
    * a broadcast (c_id, c_qv, c_dot) codebook array; a pure projection,
    * zero exchange. Tie-break: cosine desc, c_id asc — identical to
    * ROW_NUMBER() OVER (ORDER BY c_cos DESC, c_id) = 1.
    */
  def nearestCentroid(qv: Column, selfdot: Column, codebook: Column): Column =
    expr2col(NearestCentroidE(exprOf(qv), exprOf(selfdot), exprOf(codebook)))

  /** PQ per-subspace codes (ranks 0..ks-1) of a quantized vector against
    * the flattened broadcast codebook — scan-local native codegen; the
    * layout/tie-break contract lives on ExprKernels.pqCodes.
    */
  def pqCodes(qv: Column, cbFlat: Column, m: Int, subDim: Int,
              ks: Int): Column =
    expr2col(PqCodesE(exprOf(qv), exprOf(cbFlat), m, subDim, ks))

  /** The `nprobe` nearest codebook centroids, best first (IVF probe). */
  def nearestCells(qv: Column, selfdot: Column, codebook: Column,
                   nprobe: Int): Column =
    expr2col(NearestCellsE(exprOf(qv), exprOf(selfdot), exprOf(codebook), nprobe))

  /** Partial top-k aggregate: best k (score, id) pairs per group, sorted
    * (score desc, id asc), as array<struct<id,score>>. Map-side partials
    * keep only k rows per group per partition — the scale-safe
    * replacement for row_number()-window top-k.
    */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    expr2col(TopKPairs(exprOf(score), exprOf(id), k).toAggregateExpression())

  /** KMV (k-minimum-values) distinct-count sketch, fully oracle-able
    * unlike HLL: hash each value to 48 bits via an md5 prefix (exact in a
    * double, and replayable in any engine's SQL), keep the k smallest
    * DISTINCT hashes per group in a bounded buffer (TopKPairs dedup
    * mode — k entries per group per partition into the shuffle), and
    * estimate |distinct| = (k-1) * 2^48 / h_k, or the exact count when a
    * group has fewer than k distinct hashes. Standard KMV estimator
    * (Bar-Yossef et al.), deterministic bit-for-bit across engines.
    */
  /** 48-bit md5-prefix hash as BIGINT — native kernel, bit-identical to
    * conv(substring(md5(cast(cast(v as string) as binary)),1,12),16,10)
    * (NativeExprSpec pins it) without the per-row hex-string round-trip;
    * DuckDB replays it as ('0x' || substring(md5(v), 1, 12))::BIGINT.
    * The deterministic uniform-order primitive of the KMV sketch (q06c),
    * stratified sampling (q82), and any reproducible hash ordering.
    */
  def md5Prefix48(value: Column): Column =
    expr2col(Md5Prefix48E(exprOf(value.cast("string"))))

  /** Density-independent deterministic 1-in-`stride` sample of key
    * rows: `md5Prefix48(id) % stride == 0`. The round-11 rule was
    * `id % stride == 0`, which silently assumes keys are DENSE — on a
    * sparse id space (production reality: sharded/shifted/snowflake
    * ids; measured on the key-shifted derived testdata, where ids sit
    * at orig + replica·10⁷) the residues cluster and the "sample" can
    * collapse to a skewed sliver or to NOTHING (round-12 find: the
    * q94 sf10 gate caught the PQ codebook sampling ZERO rows — both
    * engines agreed bit-for-bit at dense-id SFs and degenerated at
    * scale). Hashing first makes the residue uniform for ANY key
    * distribution, stays scan-local and codegen'd, and DuckDB replays
    * it exactly: ('0x' || substring(md5(CAST(id AS VARCHAR)), 1,
    * 12))::BIGINT % stride = 0.
    */
  def idSample(id: Column, stride: Long): Column =
    md5Prefix48(id) % lit(stride) === lit(0L)

  /** Loud-fail guard for SAMPLED codebook arrays: an idSample stride
    * >> n (caller bug) or an empty corpus yields an EMPTY sample, and
    * every downstream argmin/encode silently degenerates — exactly the
    * round-12 q94 failure class, which must fail loudly instead.
    * Wrapping the aggregated one-row codebook array keeps the check
    * scan-local and unprunable (the consumer reads the array itself).
    */
  def nonEmptySample(arr: Column, what: String): Column =
    when(size(arr) > 0, arr).otherwise(raise_error(lit(
      s"$what: sampled codebook is EMPTY — idSample stride exceeds the corpus or the corpus is empty")))

  /** One-pass D34 PII scan struct (emails, phones, ips, cards, red) —
    * native kernel, bit-identical to the regexp_count forms of
    * PiiScrub's five detection classes and the six-step regexp_replace
    * redaction chain (PiiScrubSpec pins both, plus a java.util.regex
    * fuzz replay). One kernel call replaces ~13 backtracking-regex
    * passes per PII-dense row.
    */
  def piiScan(text: Column): Column = expr2col(PiiScanE(exprOf(text)))

  def kmvDistinct(value: Column, k: Int = 64): Column = {
    val h = md5Prefix48(value)
    val top = expr2col(TopKPairs(exprOf((-h).cast("double")), exprOf(h), k,
      dedup = true).toAggregateExpression())
    val kth = -element_at(top, k).getField("score") // = h_k as double
    when(size(top) < k, size(top).cast("long"))
      .otherwise(round(lit((k - 1).toDouble * 281474976710656.0) / kth)
        .cast("long"))
  }

  /** Bitwise-reproducible cosine over quantized vectors: integer sums are
    * exact, the final double ops (mul/sqrt/div) are IEEE-correctly-rounded
    * in every engine.
    */
  def quantCosine(qa: Column, qb: Column): Column =
    quantDot(qa, qb).cast("double") /
      sqrt(quantDot(qa, qa).cast("double") * quantDot(qb, qb).cast("double"))

  // ---- registration ------------------------------------------------------

  /** Function descriptors shared by `register` (imperative, any live
    * session) and `GraftExtensions` (declarative, at session build).
    */
  lazy val descriptors: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def d(name: String, arity: Int, f: Seq[Expression] => Expression) =
      (FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity args")
          f(args)
        })
    Seq(
      d("cosine_sim", 2, a => CosineSimilarityF(a(0), a(1))),
      d("dot_f", 2, a => DotProductF(a(0), a(1))),
      d("simhash64", 1, a => SimHash64(a(0))),
      d("doc_fingerprint", 1, a => RollingFingerprint(a(0))),
      d("dot_l", 2, a => DotLong(a(0), a(1))),
      d("minhash_sig", 1, a => MinHashSigE(a(0), MinhashPerms)),
      d("minhash_bands", 1, a => MinHashBandsE(a(0), MinhashPerms, MinhashBands)),
      d("text_shingles_5", 1, a => TextShinglesE(a(0), 5)),
      d("hyperplane_sig", 1, a => HyperplaneSigE(a(0), 16)),
      d("nearest_centroid", 3, a => NearestCentroidE(a(0), a(1), a(2))),
      // trailing int args must be foldable literals (banding/probe shape
      // is a plan-time constant, like text_shingles_5's k)
      d("nearest_cells", 4, a =>
        NearestCellsE(a(0), a(1), a(2),
          a(3).eval().asInstanceOf[Number].intValue)),
      d("topk_pairs", 3, a =>
        TopKPairs(a(0), a(1), a(2).eval().asInstanceOf[Number].intValue)),
      d("md5_prefix48", 1, a => Md5Prefix48E(a(0))))
  }

  /** Register the native expressions as SQL functions on a live session
    * (cosine_sim, dot_f, simhash64, doc_fingerprint). Sessions built with
    * GraftExtensions get the same set declaratively.
    */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
