package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_stats(STRING) -> STRUCT<n_shingles: INT, n_uniq: INT>` — the two
  * word-3-shingle counts the repetition metric folds over the raw shingle
  * array (`size(sh)` and `size(array_distinct(sh))`), in ONE pass over the
  * row's UTF-8 bytes with a per-thread reused count table (r19 optimization
  * round — the [[TokenStatsExpr]] treatment applied to the shingle ratio).
  *
  * What it removes, per row: the `shingles3Raw` array build (one 3-token
  * UTF8String concat allocation per window position) and `array_distinct`'s
  * per-element hash-set insert over those strings. Value identity:
  *  - `n_shingles` = max(n_tokens − 2, 0) — exactly `size(shingles3Raw(w))`
  *    (zero below 3 tokens, where the composed form yields an empty array);
  *  - `n_uniq` counts distinct (tok_i, tok_i+1, tok_i+2) triples by binary
  *    equality of the three byte ranges. Equality of triples ⟺ equality of
  *    the space-joined shingle strings, because tokens come from a
  *    single-space split and can never contain the separator — so this is
  *    `size(array_distinct(shingles3Raw(w)))` bit for bit.
  *
  * Null contract: null-propagating, like the replaced columns. Per-row cost
  * O(bytes); the table stores (window start token index, count) and hashes
  * the three token byte ranges directly off the row's own byte array. */
case class ShingleStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false)))
  override def prettyName: String = "shingle_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_stats expects STRING, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleStatsExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleStatsExpr =
    copy(child = newChild)
}

object ShingleStatsExpr {

  private val table = new ThreadLocal[Table] {
    override def initialValue() = new Table
  }

  /** Codegen entry point. Tokenizes like [[TokenStatsExpr]] (split on the
    * 0x20 byte, keep-trailing-empties), then counts distinct 3-token
    * windows. */
  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    // token boundaries: starts[i], ends[i] for token i
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == ' ') spaces += 1; i += 1 }
    val nTokens = spaces + 1
    val nShingles = if (nTokens >= 3) nTokens - 2 else 0
    if (nShingles == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0))
    val t = table.get()
    t.reset(b, nTokens, nShingles)
    // collect token offsets, then add each window
    var off = 0
    var tok = 0
    i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        t.setToken(tok, off, i - off)
        tok += 1
        off = i + 1
      }
      i += 1
    }
    var uniq = 0
    var w = 0
    while (w < nShingles) {
      if (t.addWindow(w)) uniq += 1
      w += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nShingles, uniq))
  }

  /** Open-addressing table keyed by 3-token windows (stored as the window's
    * start token index; equality compares the three byte ranges). */
  private final class Table {
    private var cap = 256 // power of two
    private var wins = new Array[Int](cap) // start token index + 1; 0 = empty
    private var tokOff: Array[Int] = new Array[Int](256)
    private var tokLen: Array[Int] = new Array[Int](256)
    private var bytes: Array[Byte] = _

    def reset(b: Array[Byte], nTokens: Int, expectedWindows: Int): Unit = {
      bytes = b
      if (nTokens > tokOff.length) {
        var need = tokOff.length
        while (need < nTokens) need <<= 1
        tokOff = new Array[Int](need)
        tokLen = new Array[Int](need)
      }
      var needC = 256
      while (needC < expectedWindows * 2) needC <<= 1
      if (needC > cap) {
        cap = needC
        wins = new Array[Int](cap)
      } else java.util.Arrays.fill(wins, 0, cap, 0)
    }

    def setToken(i: Int, off: Int, len: Int): Unit = {
      tokOff(i) = off; tokLen(i) = len
    }

    /** Insert window starting at token `w`; true iff it was NEW. */
    def addWindow(w: Int): Boolean = {
      var h = 1
      var t = w
      while (t < w + 3) {
        val o = tokOff(t); val l = tokLen(t)
        var j = 0
        while (j < l) { h = h * 31 + bytes(o + j); j += 1 }
        h = h * 31 + ' ' // separator keeps ("ab","c") distinct from ("a","bc")
        t += 1
      }
      val mask = cap - 1
      var idx = h & mask
      while (true) {
        if (wins(idx) == 0) {
          wins(idx) = w + 1
          return true
        } else if (windowEq(wins(idx) - 1, w)) {
          return false
        } else idx = (idx + 1) & mask
      }
      false // unreachable
    }

    private def windowEq(w1: Int, w2: Int): Boolean = {
      var t = 0
      while (t < 3) {
        val l = tokLen(w1 + t)
        if (l != tokLen(w2 + t)) return false
        val o1 = tokOff(w1 + t); val o2 = tokOff(w2 + t)
        var j = 0
        while (j < l && bytes(o1 + j) == bytes(o2 + j)) j += 1
        if (j != l) return false
        t += 1
      }
      true
    }
  }
}
