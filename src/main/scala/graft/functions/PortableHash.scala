package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable md5-derived hashes, value-identical to the SQL formulation the
  * DuckDB oracles use — but computed from the digest bytes, skipping the
  * 32-char hex-string materialization + substring + base-16 parse of the
  * `conv(substr(md5(x),1,15),16,10)` chain:
  *
  *   first 15 hex chars of md5  ==  (big-endian long of digest bytes 0..7) >>> 4
  *   first 8 hex chars of md5   ==  (big-endian int  of digest bytes 0..3) as unsigned
  *
  * (hex digits are the digest bytes most-significant-nibble first, so dropping
  * the 16th hex char is an unsigned 4-bit right shift). 60-bit values keep the
  * sign bit clear — arithmetic stays non-negative on both engines.
  *
  * This is the hot inner hash of the dedup surface (MinHash = K hashes per
  * shingle per doc); measured 3.8× faster than the hex-string chain at sf0.1.
  */
object PortableHash {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def h60FromDigest(d: Array[Byte]): Long = {
    val be =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    be >>> 4
  }

  def h60(bytes: Array[Byte]): Long = {
    val m = md.get(); m.reset()
    h60FromDigest(m.digest(bytes))
  }

  private val SpaceByte = Array(' '.toByte)

  /** All rolling-window h60 hashes of an ARRAY<STRING> token list in ONE
    * pass — value-identical to the compositional
    * `transform(sequence(1, n-w+1), i -> h60(concat_ws(' ', slice(toks, i, w))))`
    * (each window = md5 of its w tokens space-joined), so every span-family
    * DuckDB oracle replays it unchanged. What the one-pass form removes is
    * the per-position intermediate garbage: `slice` copies a w-element
    * ArrayData and `concat_ws` builds a w-token UTF8String PER WINDOW
    * (O(n·w) allocations through the HOF evaluator); here each token's bytes
    * are fetched once and streamed w times directly into the digest. Empty
    * array when n < w — NOT the compositional chain's behavior there
    * (Spark's sequence(1, 0) descends and slice errors on index 0), which
    * is why every span operator pre-filters `size(w) >= window`; the
    * parity property pins this edge explicitly. */
  private val EmptyLongArray =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array.empty[Long])

  def spanWindowHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      window: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < window) return EmptyLongArray
    val toks = new Array[Array[Byte]](n)
    var i = 0
    // null elements keep concat_ws's skip semantics (null contributes
    // neither bytes nor a separator) — split() never yields them, but the
    // declared input type admits them (review r11)
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Long](n - window + 1)
    val m = md.get()
    // reused digest buffer: m.digest() allocates 16 bytes per window — one
    // window per token position per doc (~100M tiny arrays per sf10 pass,
    // pure GC pressure); digest(buf, 0, 16) writes in place and resets
    val dig = new Array[Byte](16)
    var s = 0
    while (s <= n - window) {
      m.reset()
      var j = s
      var first = true
      while (j < s + window) {
        val t = toks(j)
        if (t != null) {
          if (!first) m.update(SpaceByte)
          m.update(t)
          first = false
        }
        j += 1
      }
      m.digest(dig, 0, 16)
      out(s) = h60FromDigest(dig)
      s += 1
    }
    // primitive-array result: GenericArrayData would box every window hash
    // (one java.lang.Long per window per doc — re-adding the garbage the
    // one-pass form exists to remove)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def h32(bytes: Array[Byte]): Long = {
    val m = md.get(); m.reset()
    val d = m.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) |
      (d(3) & 0xffL)
  }

  /** The SECOND 60 bits of the same md5 digest — hex chars 16..30, i.e. the
    * low nibble of byte 7 followed by bytes 8..14. The audit-gated escape
    * hatch for the h60 injectivity contract (verdict r16 #6): `(h60, h60b)`
    * is a 120-bit composite key from ONE digest (birthday bound ~2^60
    * distinct keys — past any corpus), mirrored in DuckDB by
    * `('0x' || substr(md5(s), 16, 15))::BIGINT` exactly as h60 mirrors
    * chars 1..15. Non-negative by construction (60 bits). */
  def h60b(bytes: Array[Byte]): Long = {
    val m = md.get(); m.reset()
    val d = m.digest(bytes)
    ((d(7) & 0x0fL) << 56) |
      ((d(8) & 0xffL) << 48) | ((d(9) & 0xffL) << 40) | ((d(10) & 0xffL) << 32) |
      ((d(11) & 0xffL) << 24) | ((d(12) & 0xffL) << 16) | ((d(13) & 0xffL) << 8) |
      (d(14) & 0xffL)
  }

  /** Every frame's perceptual (aHash, dHash) pair in ONE pass — value-
    * identical to the compositional HOF form it replaces in
    * [[graft.multimodal.Multimodal.phashFrames]] (per cell:
    * `h32(text.substr(pos, cellw)) % 256` via [[UTF8String.substringSQL]],
    * Spark's own Substring semantics; then the integer-math aHash threshold
    * `cells·iv > Σiv` and circular dHash gradient, bits packed LSB-first).
    * What the one-pass form removes is the interpreted HOF evaluation: the
    * compositional chain runs 32 `transform` lambda evaluations per frame
    * through the interpreter (HOFs don't participate in whole-stage
    * codegen), each allocating a substring Column eval — measured ~7×
    * slower per hash than the codegen'd digest paths. Returns one
    * `(ahash, dhash)` struct per frame, frame_no = array index; at least
    * one frame even for empty text (the `greatest(…, 0)` floor). */
  def phashFrames(text: UTF8String, stride: Int, cells: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    // mirrors the PhashFrames constructor guard for direct callers: past 62
    // cells the `1L << c` packing wraps/sets the sign bit (advice r12)
    require(cells > 0 && cells <= 62 && stride % cells == 0,
      s"cells=$cells must be in [1, 62] and divide stride=$stride")
    val cellw = stride / cells
    val n = text.numChars()
    val nFrames = math.max((n + stride - 1) / stride, 1)
    val m = md.get()
    val iv = new Array[Long](cells)
    val rows = new Array[Any](nFrames)
    // ASCII fast path (the common case by far): char positions == byte
    // positions, so each cell's md5 runs over a direct range of ONE
    // getBytes copy — no per-cell UTF8String slice, no per-cell byte-array
    // copy, no per-digest result alloc. At sf10 the suite's sketch fill is
    // 134M cell digests (4.2M frames × 32 cells); the slice/copy churn, not
    // the md5 core, dominated it. Value identity is exact: md5 over the
    // same byte sequence (substringSQL of an all-ASCII string selects the
    // same bytes; past-end cells clamp to the same empty slice).
    val ascii = text.numBytes == n
    val bytes = if (ascii) text.getBytes else null
    val out = if (ascii) new Array[Byte](16) else null
    var f = 0
    while (f < nFrames) {
      var c = 0
      while (c < cells) {
        val h = if (ascii) {
          val start = math.min(f * stride + c * cellw, n)
          val end = math.min(start + cellw, n)
          m.reset()
          m.update(bytes, start, end - start)
          m.digest(out, 0, 16)
          ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
            ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
        } else {
          // 1-based char position, exactly Column.substr's Substring
          // semantics
          val slice = text.substringSQL(f * stride + c * cellw + 1, cellw)
          m.reset()
          val d = m.digest(slice.getBytes)
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        }
        iv(c) = h % 256
        c += 1
      }
      val (ahash, dhash) = packPhash(iv)
      rows(f) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](ahash, dhash))
      f += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** The production aHash/dHash thresholding + LSB-first bit packing over a
    * strip of cell intensities — shared by the text-stub sketch path above
    * and the real-codec path ([[graft.multimodal.ImageIoDecoder]]), so a
    * real decoder swaps ONLY the intensity source, never the algorithm:
    * aHash bit c = `cells·iv(c) > Σiv` (integer mean test, no division);
    * dHash bit c = `iv(c) > iv((c+1) mod cells)` (circular gradient sign). */
  def packPhash(iv: Array[Long]): (Long, Long) = {
    val cells = iv.length
    require(cells > 0 && cells <= 62, s"cells=$cells must be in [1, 62]")
    var total = 0L
    var c = 0
    while (c < cells) { total += iv(c); c += 1 }
    var ahash = 0L
    var dhash = 0L
    c = 0
    while (c < cells) {
      if (cells * iv(c) > total) ahash |= 1L << c
      if (iv(c) > iv((c + 1) % cells)) dhash |= 1L << c
      c += 1
    }
    (ahash, dhash)
  }

  // MinHash universal-hash family params (mirrored in GraftFunctions and the
  // DuckDB oracle SQL): h_j(s) = (A(j)*h32(s) + B(j)) mod P.
  val MinhashP = 2147483647L
  val MinhashA: Array[Long] =
    Array(999983L, 999979L, 999961L, 999959L, 999953L, 999931L, 999917L, 999907L)
  val MinhashB: Array[Long] =
    Array(12345L, 67891L, 23457L, 78913L, 34569L, 89123L, 45678L, 91235L)

  /** One-pass K=8 MinHash signature over an ARRAY<STRING> of shingles: one md5
    * per shingle, K affine derivations, running minima. Null-equivalent empty
    * input is handled by [[MinhashSignature]] (returns null). */
  def minhashSig(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val k = MinhashA.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = h32(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val v = (MinhashA(j) * h + MinhashB(j)) % MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    // primitive result — same no-boxing rationale as [[spanWindowHashes]]
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  /** One-pass K=8 MinHash signature DIRECTLY over the token array (r19
    * optimization round): streams each 3-token window's bytes
    * (`tok ' ' tok ' ' tok`) straight into the digest instead of first
    * materializing the shingle strings. Value-identical to
    * `minhashSig(shingles3(tokens))` — md5 runs over the same byte sequence
    * each window (concat with ' ' separators IS that byte sequence; tokens
    * come from a single-space split so they never contain the separator),
    * and dropping `array_distinct` cannot change a MINIMUM (min over a
    * multiset equals min over its support). What the fused form removes,
    * per window: one 3-token UTF8String concat build, one array_distinct
    * hash-set insert, and one getBytes copy (token bytes are fetched once
    * per doc, not once per window per slot). Callers guard n >= 3
    * ([[MinhashSignatureTokens]] returns null below that, matching
    * `shingles3`'s empty array → [[MinhashSignature]]'s null). */
  def minhashSigTokens(arr: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }
    val k = MinhashA.length
    val mins = Array.fill(k)(Long.MaxValue)
    val m = md.get()
    val dig = new Array[Byte](16)
    var s = 0
    while (s + 2 < n) {
      m.reset()
      m.update(toks(s)); m.update(SpaceByte)
      m.update(toks(s + 1)); m.update(SpaceByte)
      m.update(toks(s + 2))
      m.digest(dig, 0, 16)
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
        ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      var j = 0
      while (j < k) {
        val v = (MinhashA(j) * h + MinhashB(j)) % MinhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }

  /** One-pass order-sensitive doc fingerprint over an ARRAY<STRING> of
    * tokens (r19 optimization round): XOR over positions of
    * `h60("<i+1>#<token>")`, streaming the position digits, the '#' and the
    * token bytes straight into the digest — value-identical to the
    * interpreted `aggregate(transform(words, (w, i) -> h60(concat(...))),
    * 0L, xor)` chain it replaces (md5 over the same byte sequence per
    * position; XOR is order-insensitive so the fold order is moot), without
    * the per-token concat string build or the two HOF lambda evaluations
    * per element. */
  def positionalFingerprint(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val m = md.get()
    val dig = new Array[Byte](16)
    var acc = 0L
    var i = 0
    while (i < n) {
      m.reset()
      m.update(java.lang.Integer.toString(i + 1).getBytes)
      m.update('#'.toByte)
      m.update(arr.getUTF8String(i).getBytes)
      m.digest(dig, 0, 16)
      acc ^= h60FromDigest(dig)
      i += 1
    }
    acc
  }

  /** Every sliding chunk window's (chunk_idx, n_chunk_tokens, chunk_h60) in
    * ONE pass over an ARRAY<STRING> token list (r19 optimization round —
    * the [[spanWindowHashes]] treatment applied to the chunker): window i
    * covers tokens [i·s, i·s+c) (truncated at the end), i = 0 .. (n > c ?
    * ceil((n−c)/s) : 0). Value-identical to the compositional
    * `transform(sequence(0, lastIdx), i -> struct(i, size(slice(w, i·s+1, c)),
    * h60(array_join(slice(w, i·s+1, c), " "))))` chain — each window's
    * digest runs over the same byte sequence (array_join skips null
    * elements with no separator, mirrored here), `n_chunk_tokens` counts
    * all elements of the slice including nulls — without the per-window
    * slice ArrayData copy, the array_join string build, or the interpreted
    * HOF evaluation. Token bytes are fetched once per row. */
  def chunkWindowHashes(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      c: Int, s: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val lastIdx = if (n > c) (n - c + s - 1) / s else 0
    val rows = new Array[Any](lastIdx + 1)
    val m = md.get()
    val dig = new Array[Byte](16)
    var w = 0
    while (w <= lastIdx) {
      val start = w * s
      val end = math.min(start + c, n)
      m.reset()
      var j = start
      var first = true
      while (j < end) {
        val t = toks(j)
        if (t != null) {
          if (!first) m.update(SpaceByte)
          m.update(t)
          first = false
        }
        j += 1
      }
      m.digest(dig, 0, 16)
      rows(w) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](w, math.max(end - start, 0),
          h60FromDigest(dig)))
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** One-pass SimHash32 over an ARRAY<STRING> (see [[SimHash32]]). */
  def simhash32(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = h32(arr.getUTF8String(i).getBytes)
      var b = 0
      while (b < 32) { counts(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (2 * counts(b) >= n) out |= (1L << b); b += 1 }
    out
  }
}

abstract class PortableHashExpression extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.sql}")
}

/** `portable_h60(STRING) -> BIGINT`: first 60 bits of md5, non-negative. */
case class PortableHash60(child: Expression) extends PortableHashExpression {
  override def prettyName: String = "portable_h60"
  override protected def nullSafeEval(v: Any): Any =
    PortableHash.h60(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.h60($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): PortableHash60 =
    copy(child = newChild)
}

/** `portable_h60b(STRING) -> BIGINT`: md5 hex chars 16..30 as a non-negative
  * BIGINT — the second, independent 60-bit key of the SAME digest (see
  * [[PortableHash.h60b]]): pairing it with [[PortableHash60]] widens any
  * hash-keyed family to a 120-bit composite when an injectivity audit
  * ([[graft.operators.Dedup.spanHashAudit]] / [[graft.operators.TextAnalysis
  * .bigramHashAudit]]) ever measures a collision at customer scale. */
case class PortableHash60B(child: Expression) extends PortableHashExpression {
  override def prettyName: String = "portable_h60b"
  override protected def nullSafeEval(v: Any): Any =
    PortableHash.h60b(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.h60b($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): PortableHash60B =
    copy(child = newChild)
}

/** `portable_h32(STRING) -> BIGINT`: first 32 bits of md5 as unsigned. */
case class PortableHash32(child: Expression) extends PortableHashExpression {
  override def prettyName: String = "portable_h32"
  override protected def nullSafeEval(v: Any): Any =
    PortableHash.h32(v.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.h32($c.getBytes())")
  override protected def withNewChildInternal(newChild: Expression): PortableHash32 =
    copy(child = newChild)
}

/** `simhash32(ARRAY<STRING>) -> BIGINT`: one-pass 32-bit SimHash over the
  * token multiset. Per token: portable h32 (md5-derived, oracle-reproducible);
  * bit b of the sketch is set iff 2·#{tokens with bit b set} >= #tokens (ties
  * count as set). Single loop, zero per-bit re-hashing — the native form of
  * the sketch the DuckDB oracle computes with unnest + FILTER + bit math.
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects ARRAY<STRING>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PortableHash.simhash32(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `minhash_sig(ARRAY<STRING>) -> ARRAY<BIGINT>[8]`: the K=8 MinHash signature
  * in one pass (one md5 per shingle + K affine derivations — vs K md5s per
  * shingle in the compositional form). NULL on empty shingle sets, matching
  * `array_min(empty) = NULL` semantics of the per-column formulation.
  */
case class MinhashSignature(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects ARRAY<STRING>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() == 0) null else PortableHash.minhashSig(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PortableHash.minhashSig($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

/** `positional_fingerprint(ARRAY<STRING>) -> BIGINT`: the order-sensitive
  * per-doc fingerprint (XOR over positions of `h60("<i+1>#<token>")`) in one
  * pass ([[PortableHash.positionalFingerprint]]) — value-identical to the
  * interpreted transform+aggregate HOF chain (PortableHashSpec pins it);
  * null-propagating like that chain. */
case class PositionalFingerprint(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = LongType
  override def prettyName: String = "positional_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // non-null elements enforced at the TYPE level (ADVICE r19): the fused
    // kernel streams element bytes without per-element null checks, so a
    // null-bearing array would NPE an executor task instead of
    // null-propagating like the composed transform+aggregate chain; arrays
    // that may carry nulls must use the composed form
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
      "positional_fingerprint expects ARRAY<STRING> with non-null elements " +
        "(containsNull=false); use the composed transform+aggregate chain " +
        "for null-bearing arrays")
    case other => TypeCheckResult.TypeCheckFailure(
      s"positional_fingerprint expects ARRAY<STRING>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PortableHash.positionalFingerprint(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash.positionalFingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): PositionalFingerprint =
    copy(child = newChild)
}

/** `minhash_sig_tokens(ARRAY<STRING>) -> ARRAY<BIGINT>[8]`: the K=8 MinHash
  * signature computed DIRECTLY from the token array in one pass
  * ([[PortableHash.minhashSigTokens]]) — value-identical to
  * `minhash_sig(shingles3(tokens))` without materializing the shingle
  * strings or the distinct set (duplicates cannot change a minimum). NULL
  * below 3 tokens, matching `shingles3`'s empty array →
  * [[MinhashSignature]]'s null (and `shingles3`'s null-input → empty-array
  * path collapses to plain null propagation here). */
case class MinhashSignatureTokens(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // non-null elements enforced at the TYPE level (ADVICE r19): the fused
    // kernel streams token bytes into the digest with no per-element null
    // checks, so a null-bearing array would NPE an executor task; arrays
    // that may carry nulls must use minhash_sig(shingles3(...))
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
      "minhash_sig_tokens expects ARRAY<STRING> with non-null elements " +
        "(containsNull=false); use minhash_sig(shingles3(...)) for " +
        "null-bearing arrays")
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_tokens expects ARRAY<STRING>, got ${other.sql}")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() < 3) null else PortableHash.minhashSigTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numElements() < 3) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PortableHash.minhashSigTokens($c);
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignatureTokens =
    copy(child = newChild)
}

/** `span_window_hashes(ARRAY<STRING>, w) -> ARRAY<BIGINT>`: every w-token
  * rolling window's portable h60 in one pass (see
  * [[PortableHash.spanWindowHashes]]) — the span-dedup family's window
  * builder. `window` is a construction-time constant (like
  * [[graft.functions.LangIdExpr]]'s marker table): the plan carries it as
  * part of the expression, not as a child. Value-identical to the
  * compositional slice/concat_ws/h60 chain it replaces, so the family's
  * oracles are untouched (PropertySpec gates the identity). */
case class SpanWindowHashes(child: Expression, window: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.ArrayType

  require(window >= 2, s"window must be >= 2 tokens: $window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"span_window_hashes expects ARRAY<STRING>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PortableHash.spanWindowHashes(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash.spanWindowHashes($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): SpanWindowHashes =
    copy(child = newChild)
}

/** `chunk_window_hashes(ARRAY<STRING>, c, s) ->
  * ARRAY<STRUCT<chunk_idx: INT, n_chunk_tokens: INT, chunk_h60: BIGINT>>`:
  * every sliding chunk window's index, token count and portable h60 in one
  * pass (see [[PortableHash.chunkWindowHashes]]) — the chunking family's
  * window builder. `c`/`s` are construction-time constants carried by the
  * plan (the [[SpanWindowHashes]] convention). Value-identical to the
  * compositional sequence/slice/array_join/h60 chain it replaces, so the
  * chunk family's oracles are untouched (TextPipelineSpec/PortableHashSpec
  * gate the identity). */
case class ChunkWindowHashes(child: Expression, c: Int, s: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, IntegerType, StructField, StructType}

  require(c > 0 && s > 0 && s <= c, s"need 0 < stride <= window, got ($c, $s)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("n_chunk_tokens", IntegerType, nullable = false),
      StructField("chunk_h60", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "chunk_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_window_hashes expects ARRAY<STRING>, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PortableHash.chunkWindowHashes(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], c, s)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      x => s"graft.functions.PortableHash.chunkWindowHashes($x, $c, $s)")

  override protected def withNewChildInternal(newChild: Expression): ChunkWindowHashes =
    copy(child = newChild)
}

/** `phash_frames(text STRING, stride, cells) -> ARRAY<STRUCT<ahash, dhash>>`:
  * every frame's perceptual-hash pair in one pass (see
  * [[PortableHash.phashFrames]]) — the media-dedup family's sketch builder.
  * `stride`/`cells` are construction-time constants carried by the plan
  * (the [[SpanWindowHashes]] convention). Value-identical to the
  * compositional substr/h32/threshold chain it replaces, so the phash
  * oracles are untouched (PhashSpec gates the identity against a hand-
  * computed frame and the HOF formulation). */
case class PhashFrames(child: Expression, stride: Int, cells: Int)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

  // cells ≤ 62: bit packing shifts `1L << c`, which wraps mod 64 past 63
  // (silently folding cells onto shared bits) and at 63–64 sets the sign
  // bit, diverging from the DuckDB CTE arithmetic and the banded
  // `shiftright` extraction (advice r12)
  require(stride > 0 && cells > 0 && cells <= 62 && stride % cells == 0,
    s"stride $stride must be a positive multiple of cells=$cells (cells <= 62)")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("ahash", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "phash_frames"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phash_frames expects STRING, got ${other.sql}")
  }

  override protected def nullSafeEval(v: Any): Any =
    PortableHash.phashFrames(v.asInstanceOf[UTF8String], stride, cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableHash.phashFrames($c, $stride, $cells)")

  override protected def withNewChildInternal(newChild: Expression): PhashFrames =
    copy(child = newChild)
}
