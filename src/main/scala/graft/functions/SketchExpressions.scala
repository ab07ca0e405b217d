package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Native kernels for the similarity/sketch operators. Spark's higher-order
 * array functions (`transform`/`aggregate`) evaluate interpreted, one
 * closure call per element — for 64-dim × 32-plane per-row loops that is
 * the hot path at 100 TB. dot/cosine emit their loops inline in the
 * whole-stage-generated Java; the array/string kernels stay
 * CodegenFallback — measured DELIBERATELY: swapping them to a direct
 * kernel-call codegen regressed the 10× similarity stress ~25% (the
 * banding/explode stages' generated methods are already near the JIT
 * method-size limit; growing them de-optimizes the whole stage), while
 * the small inline dot/cosine loops improved ann_lsh. Each kernel body
 * is still one JIT-compiled loop per row either way. The kernel bodies
 * stay factored out of nullSafeEval on purpose: that seam is what made
 * the codegen A/B a two-line diff, and keeps the door open for re-testing
 * on future Spark/JIT versions.
 *
 * All randomness is derived deterministically with no stored model:
 * splitmix64 (public-domain mixer, Steele/Lea/Flood OOPSLA 2014) for the
 * minhash permutations, murmur3_32 for the sign-LSH hyperplanes (the
 * latter so the DuckDB oracle can reproduce bucket assignment exactly —
 * splitmix64's 64-bit wrapping arithmetic has no safe SQL twin).
 */
object Sketch {

  @inline final def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Columns API */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sign_lsh(vec: Column, bits: Int): Column =
    ColumnBridge.column(SignLshExpr(ColumnBridge.expression(vec), bits))
  def minhash_sig(hashes: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes), k))
  def minhash_agreement(a: Column, b: Column): Column =
    ColumnBridge.column(MinHashAgreementExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def simhash_sig(hashes: Column): Column =
    ColumnBridge.column(SimHashSigExpr(ColumnBridge.expression(hashes)))
  def shingle_hashes(text: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n, distinct))
  def ngram_coverage(text: Column, n: Int): Column =
    ColumnBridge.column(NgramCoverageExpr(ColumnBridge.expression(text), n))
  def char_ngrams(text: Column, n: Int): Column =
    ColumnBridge.column(CharNgramsExpr(ColumnBridge.expression(text), n))
  def char_entropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))
  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(text)))
  def url_canonicalize(url: Column): Column =
    ColumnBridge.column(UrlCanonicalizeExpr(ColumnBridge.expression(url)))

  private[functions] def toDoubleAt(arr: ArrayData, et: DataType, i: Int): Double =
    et match {
      case FloatType  => arr.getFloat(i).toDouble
      case DoubleType => arr.getDouble(i)
      case LongType   => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case _ => throw new IllegalArgumentException(s"bad element type $et")
    }
}

trait VectorPairExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  /** Java accessor snippet reading element `i` of ArrayData `v` as double. */
  protected def getAsDouble(v: String, e: Expression, i: String): String =
    elemType(e) match {
      case FloatType   => s"(double) $v.getFloat($i)"
      case DoubleType  => s"$v.getDouble($i)"
      case LongType    => s"(double) $v.getLong($i)"
      case IntegerType => s"(double) $v.getInt($i)"
      case t => throw new IllegalArgumentException(s"bad element type $t")
    }
}

/** dot(a, b): sequential-order double accumulation. Real codegen — the
  * loop is emitted inline in the whole-stage-generated Java, no
  * InternalRow materialization (which CodegenFallback would pay per row). */
case class DotProductExpr(left: Expression, right: Expression) extends VectorPairExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += Sketch.toDoubleAt(a, ta, i) * Sketch.toDoubleAt(b, tb, i); i += 1 }
    s
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (${getAsDouble(a, left, i)}) * (${getAsDouble(b, right, i)});
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** cosine(a, b) in one pass over both arrays; inline codegen loop. */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorPairExpr {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = Sketch.toDoubleAt(a, ta, i); val y = Sketch.toDoubleAt(b, tb, i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    // zero-norm vector: cosine is undefined — return 0 (orthogonal by
    // convention) instead of NaN, which Spark sorts ABOVE every real
    // number: a NaN would pass `sim >= threshold` filters and rank a
    // zero embedding as every query's top neighbor
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getAsDouble(a, left, i)};
         |  double $y = ${getAsDouble(b, right, i)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/**
 * Random-hyperplane (sign) LSH signature: bit i of the result is
 * sign(Σ_j v[j]·h_ij) with hyperplane components h_ij = ±1 by the parity
 * of murmur3_32(i·65536 + j) — chosen over splitmix64 because murmur3_32
 * is reproducible in pure DuckDB SQL (32-bit overflow-safe macros), so
 * the whole LSH bucket assignment is oracle-checkable, not just the
 * verified similarities. One pass computes all `bits` projections.
 */
case class SignLshExpr(child: Expression, bits: Int) extends UnaryExpression
    with CodegenFallback {
  require(bits >= 1 && bits <= 64, "bits in [1, 64]")
  override def dataType: DataType = LongType
  private def elemType = child.dataType.asInstanceOf[ArrayType].elementType
  // ±1 hyperplane components, materialized once per task (not per row);
  // racing initializations compute identical tables, so the unsynchronized
  // publish is benign.
  @transient private var planes: Array[Array[Double]] = _
  private def planesFor(n: Int): Array[Array[Double]] = {
    var p = planes
    if (p == null || p(0).length < n) {
      p = Array.tabulate(bits, n)((i, j) =>
        if ((Murmur3Pulsar.hashInt(i * 65536 + j) & 1) == 1) 1.0 else -1.0)
      planes = p
    }
    p
  }
  def kernel(arr: ArrayData): Long = {
    val et = elemType
    val n = arr.numElements()
    val p = planesFor(n)
    val acc = new Array[Double](bits)
    var j = 0
    while (j < n) {
      val x = Sketch.toDoubleAt(arr, et, j)
      var i = 0
      while (i < bits) { acc(i) += x * p(i)(j); i += 1 }
      j += 1
    }
    var sig = 0L; var i = 0
    while (i < bits) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "sign_lsh"
}

/**
 * MinHash signature from pre-hashed shingles: permutation i is the
 * multiply-mix universal hash h -> splitmix-mixed (a_i·h + b_i); the
 * signature entry is the minimum per permutation. Strings are hashed
 * ONCE (xxhash64 upstream); the k permutations are integer arithmetic.
 */
case class MinHashSigExpr(child: Expression, k: Int) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val as: Array[Long] =
    Array.tabulate(k)(i => Sketch.splitmix64(2L * i) | 1L) // odd multipliers
  @transient private lazy val bs: Array[Long] =
    Array.tabulate(k)(i => Sketch.splitmix64(2L * i + 1))
  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < k) {
        val p = Sketch.splitmix64(as(i) * h + bs(i))
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Count of positions where two long-array signatures agree — the
  * MinHash estimator's numerator (est_jaccard = agreement / k). This is
  * the LSH PAIR stage's inner loop (one call per band-collision pair,
  * BEFORE candidate dedup), previously a `size(filter(zip_with(...)))`
  * chain: three interpreted HOF nodes allocating two intermediate
  * arrays per pair. Real codegen like dot/cosine — the pair stage is a
  * separate generated method from the banding stage, so the JIT-limit
  * caveat in the file doc (which is about growing the BANDING stage's
  * method) does not apply; measured on the same A/B protocol. */
case class MinHashAgreementExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = math.min(a.numElements(), b.numElements())
    var c = 0; var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "minhash_agreement"
}

/**
 * Word-shingle hashes in one pass: split `text` on single spaces, hash
 * each token with XXH64 (seed 42 — identical to Spark's `xxhash64` on
 * strings), then combine each n-token window order-dependently with
 * splitmix64. No shingle strings are ever materialized — at 100 TB the
 * per-row cost is one tokenizer pass + integer mixing, and the downstream
 * shuffle carries 8-byte hashes.
 *
 * `distinct = true` dedups the shingle set per row (Jaccard semantics);
 * `n = 1, distinct = false` yields plain token hashes (SimHash input).
 */
case class ShingleHashExpr(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle size >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  def kernel(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    val toks = s
      .split(org.apache.spark.unsafe.types.UTF8String.fromString(" "), -1)
    val t = toks.length
    val th = new Array[Long](t)
    var i = 0
    while (i < t) {
      val tok = toks(i)
      th(i) = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset,
        tok.numBytes, 42L)
      i += 1
    }
    if (n == 1 && !distinct) return new GenericArrayData(th)
    val m = t - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = th(i)
      var k = 1
      while (k < n) { h = Sketch.splitmix64(h ^ (th(i + k) * 0x9e3779b97f4a7c15L)); k += 1 }
      out(i) = h
      i += 1
    }
    if (!distinct) new GenericArrayData(out)
    else {
      java.util.Arrays.sort(out)
      var w = 0; var r = 0
      while (r < m) {
        if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
        r += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, w))
    }
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/**
 * SimHash (Charikar 2002) from pre-hashed tokens: bit j of the result is
 * the sign of Σ tokens (±1 by bit j of the token hash). Single pass.
 */
case class SimHashSigExpr(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  def kernel(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L; var b = 0
    while (b < 64) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
  override def nullSafeEval(v: Any): Any = kernel(v.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "simhash_sig"
}

/**
 * All overlapping character n-grams of `text`, one linear pass over the
 * UTF-8 bytes. Codepoint-aligned, so the output equals
 * `transform(sequence(1, length - n + 1), i -> substr(text, i, n))` in
 * any codepoint-indexed engine (the DuckDB oracle replays exactly that)
 * — but that declarative form is O(len²) per row, because every
 * `substr(text, i, n)` call re-walks the string from the start to find
 * codepoint i's byte offset, which dominates LM scoring on multi-KB
 * documents. This kernel records each codepoint's byte offset once and
 * emits zero-copy slices of the row's byte array. Empty below n
 * codepoints.
 */
case class CharNgramsExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  def kernel(s: org.apache.spark.unsafe.types.UTF8String): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val bytes = s.getBytes
    val nb = bytes.length
    val starts = new Array[Int](nb + 1)
    var cnt = 0
    var off = 0
    while (off < nb) {
      starts(cnt) = off
      cnt += 1
      off += UTF8String.numBytesForFirstByte(bytes(off))
    }
    starts(cnt) = nb
    val m = cnt - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.fromBytes(bytes, starts(i), starts(i + n) - starts(i))
      i += 1
    }
    new GenericArrayData(out)
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "char_ngrams"
}

/**
 * Character-unigram Shannon entropy in NATS (RedPajama-V2's
 * `rps_doc_unigram_entropy` signal — low entropy flags repetitive /
 * degenerate text, very high entropy flags binary junk), in one linear
 * pass per row with ZERO shuffle — the distributed-normal form
 * (explode chars → per-doc histogram → aggregate) is what the DuckDB
 * oracle replays, and this kernel must equal it bit-for-bit.
 *
 * Exact formula (chosen for cross-engine reproducibility):
 *   H = round(ln(n) − (Σ_chars c · round(ln(c), 9)) / n, 6)
 * The Σ accumulates EXACT decimals of 9-decimal-rounded terms —
 * commutative and order-free, so the histogram's iteration order (and
 * the oracle's shuffle order) cannot change the value. ln in nats
 * because both engines expose a natural log; the 9-decimal rounding
 * absorbs last-ulp library differences the same way the BM25 and DSIR
 * oracles do. Empty input scores 0.0.
 */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  private val Half = java.math.RoundingMode.HALF_UP
  def kernel(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    import org.apache.spark.unsafe.types.UTF8String
    val bytes = s.getBytes
    val nb = bytes.length
    if (nb == 0) return 0.0
    val counts = new java.util.HashMap[Long, Long]()
    var off = 0
    var n = 0L
    while (off < nb) {
      val w = UTF8String.numBytesForFirstByte(bytes(off))
      // pack the codepoint's UTF-8 bytes into one long key (<= 4 bytes)
      var key = 0L
      var j = 0
      while (j < w && off + j < nb) { key = (key << 8) | (bytes(off + j) & 0xffL); j += 1 }
      counts.merge(key, 1L, (a, b) => a + b)
      n += 1
      off += w
    }
    // Σ c · round(ln c, 9) exactly, replaying the engines' two-step
    // (round-to-9 double, then decimal cast) so the sum matches the
    // oracle's DECIMAL arithmetic bit-for-bit
    var sum = java.math.BigDecimal.ZERO
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      val r9d = java.math.BigDecimal.valueOf(math.log(c.toDouble)).setScale(9, Half).doubleValue()
      val term = java.math.BigDecimal.valueOf(r9d).setScale(9, Half)
        .multiply(java.math.BigDecimal.valueOf(c))
      sum = sum.add(term)
    }
    val h = math.log(n.toDouble) - sum.doubleValue() / n
    java.math.BigDecimal.valueOf(h).setScale(6, Half).doubleValue()
  }
  override def nullSafeEval(v: Any): Any =
    kernel(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "char_entropy"
}

/**
 * Top word-n-gram character coverage: max over distinct n-grams of
 * (occurrences × n-gram character length) — the numerator of the Gopher
 * `top_ngram_char_frac` repetition signal (Rae et al. 2021 A1.1), in
 * ONE imperative pass per row: token hashes combine exactly like
 * [[ShingleHashExpr]] (equal grams ⇒ equal hash; distinct grams collide
 * with p ≈ 2⁻⁶⁴, the same hash-for-string equivalence `repetition_ratio`
 * already relies on), counts accumulate in a scratch LongMap, and the
 * running max needs no materialized gram strings. Replaces an
 * interpreted transform+sort+fold HOF chain that measured ~300 µs/doc;
 * this kernel is ~2 µs/doc.
 */
case class NgramCoverageExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "ngram size >= 1")
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val toks = s.split(org.apache.spark.unsafe.types.UTF8String.fromString(" "), -1)
    val t = toks.length
    if (t < n) return 0L
    val th = new Array[Long](t)
    val tc = new Array[Int](t)
    var i = 0
    while (i < t) {
      val tok = toks(i)
      th(i) = XXH64.hashUnsafeBytes(tok.getBaseObject, tok.getBaseOffset,
        tok.numBytes, 42L)
      tc(i) = tok.numChars()
      i += 1
    }
    val m = t - n + 1
    val counts = new scala.collection.mutable.LongMap[Long](m * 2)
    var best = 0L
    i = 0
    while (i < m) {
      var h = th(i)
      var len = tc(i).toLong
      var k = 1
      while (k < n) {
        h = Sketch.splitmix64(h ^ (th(i + k) * 0x9e3779b97f4a7c15L))
        len += 1 + tc(i + k)
        k += 1
      }
      val c = counts.getOrElse(h, 0L) + 1L
      counts.update(h, c)
      // a gram's coverage only grows with its count, so the running max
      // over updates equals the max over final (count × len) values
      val cov = c * len
      if (cov > best) best = cov
      i += 1
    }
    best
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "ngram_coverage"
}

/** Unicode NFC normalization (canonical composition) — the first step
  * of every text-cleaning pipeline: decomposed sequences (e +
  * COMBINING ACUTE) fold into their precomposed forms so dedup hashes,
  * shingles and tokenizers see one spelling. Wraps the JDK normalizer
  * (java.text.Normalizer, the ICU-aligned implementation the JVM
  * ships); DuckDB's nfc_normalize is the oracle twin. Narrow per-row
  * string transform. */
/**
 * RFC 3986 §6 URL canonicalization for web-corpus dedup (the CCNet/C4
 * url-level dedup key): lowercase scheme+host, drop default ports,
 * remove dot-segments (§5.2.4), decode percent-escapes of unreserved
 * chars and uppercase the rest (§6.2.2), drop the fragment, strip
 * tracking params (utm_*, fbclid, gclid, msclkid) and byte-sort the
 * remaining query pairs. Non-URL input passes through unchanged so a
 * dirty corpus column never fails the pipeline.
 */
case class UrlCanonicalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String
  override def dataType: DataType = StringType

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  /** §6.2.2: decode unreserved escapes, uppercase surviving hex. */
  private def normEscapes(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 &&
        Character.digit(s.charAt(i + 2), 16) >= 0) {
        val v = (Character.digit(s.charAt(i + 1), 16) << 4) |
          Character.digit(s.charAt(i + 2), 16)
        if (isUnreserved(v.toChar)) sb.append(v.toChar)
        else sb.append('%').append(s.substring(i + 1, i + 3).toUpperCase)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** §5.2.4 remove_dot_segments, the RFC's buffer algorithm verbatim. */
  private def removeDotSegments(path: String): String = {
    def trimLastSegment(out: StringBuilder): Unit = {
      val idx = out.lastIndexOf("/")
      out.setLength(math.max(idx, 0))
    }
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSegment(out) }
      else if (in == "/..") { in = "/"; trimLastSegment(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  private def isTracking(key: String): Boolean =
    key.startsWith("utm_") || key == "fbclid" || key == "gclid" || key == "msclkid"

  private[graft] def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd <= 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return url
    val rest = url.substring(schemeEnd + 3)
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (authority, tail) =
      if (authEnd < 0) (rest, "") else (rest.substring(0, authEnd), rest.substring(authEnd))
    if (authority.isEmpty) return url
    // authority: [userinfo@]host[:port], host lowercased, default port dropped
    val (userinfo, hostPort) = authority.lastIndexOf('@') match {
      case -1 => ("", authority)
      case at => (authority.substring(0, at + 1), authority.substring(at + 1))
    }
    val (host, port) = hostPort.lastIndexOf(':') match {
      case -1 => (hostPort, "")
      case c if hostPort.substring(c + 1).forall(_.isDigit) =>
        (hostPort.substring(0, c), hostPort.substring(c + 1))
      case _ => (hostPort, "")
    }
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    val canonAuth = userinfo + host.toLowerCase +
      (if (port.isEmpty || defaultPort) "" else s":$port")
    // split tail into path / query, drop fragment
    val noFrag = tail.indexOf('#') match {
      case -1 => tail
      case h => tail.substring(0, h)
    }
    val (rawPath, rawQuery) = noFrag.indexOf('?') match {
      case -1 => (noFrag, null)
      case q => (noFrag.substring(0, q), noFrag.substring(q + 1))
    }
    val path = removeDotSegments(
      normEscapes(if (rawPath.isEmpty) "/" else rawPath))
    val query =
      if (rawQuery == null) null
      else {
        val kept = rawQuery.split("&", -1).filter(_.nonEmpty)
          .map(normEscapes)
          .filterNot(p => isTracking(p.split("=", 2)(0)))
          .sorted
        if (kept.isEmpty) null else kept.mkString("&")
      }
    s"$scheme://$canonAuth$path${if (query == null) "" else s"?$query"}"
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(canonicalize(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "url_canonicalize"
}

case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    // fast path: ASCII (and already-composed) strings are returned as-is
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) v
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "nfc_normalize"
}
