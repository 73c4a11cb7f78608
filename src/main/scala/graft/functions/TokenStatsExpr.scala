package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_stats(STRING) -> STRUCT<n_tokens, n_uniq, mode_count: INT,
  * sum_len: BIGINT, stop_count: INT>` — every per-row token statistic the
  * quality family folds over the split array, in ONE pass over the UTF-8
  * bytes with a per-thread reused open-addressing count table.
  *
  * Replaces, per row, the interpreted HOF chain the composed forms run
  * (none of which participate in whole-stage codegen):
  *  - `size(split(text, " "))` — token count with keep-trailing-empties
  *    semantics: `count(' ') + 1`, byte-countable since 0x20 never occurs
  *    inside a multi-byte UTF-8 sequence;
  *  - `size(array_distinct(w))` — distinct-by-binary-equality count: the
  *    table's occupancy;
  *  - `tokenModeCount(w)` (`sort_array` + an `aggregate` longest-equal-run
  *    fold) — max multiset multiplicity: the table's max count. Equal
  *    tokens are adjacent in the binary-sorted array, so longest run ≡ max
  *    multiplicity, no ordering semantics involved;
  *  - `aggregate(w, 0L, acc + length(t))` — `length` is UTF8String
  *    `numChars` (code points = non-continuation bytes); every byte belongs
  *    to exactly one token except the 0x20 separators, so the sum is
  *    (non-continuation bytes) − (separator count), accumulated inline;
  *  - `size(filter(w, t === stopword₁ || …))` — binary equality against the
  *    injected stopword list (a length-dispatched byte compare; the list is
  *    a constructor param like [[LangIdExpr]]'s marker table, so tests can
  *    inject their own).
  *
  * Empty tokens (leading/trailing/double spaces) are genuine ""-valued
  * segments under split's -1 limit: counted in n_tokens, one distinct
  * entry, mode-countable — the zero-length key hashes and compares like any
  * other. Null contract: null-propagating, exactly like every replaced
  * column. Measured motivation: `corpus_filter` 11.1 s / `quality` +
  * `repetition` + `corpus_curate`'s stage-1 at sf10 were dominated by the
  * interpreted folds ([[BpeCountsExpr]]'s regex-loop analog); `repetition`
  * additionally drops its explode→groupBy→join (a corpus-sized shuffle at
  * 100 TB) since `max_c` IS `mode_count`. */
case class TokenStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("mode_count", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("stop_count", IntegerType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_stats expects STRING, got ${other.sql}")
  }

  @transient private lazy val impl = new TokenStatsExpr.Impl(
    stopwords.map(_.getBytes("UTF-8")).toArray)

  override protected def nullSafeEval(input: Any): Any =
    impl.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "tokenStats", impl, classOf[TokenStatsExpr.Impl].getName)
    defineCodeGen(ctx, ev, c => s"$ref.stats($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatsExpr =
    copy(child = newChild)
}

object TokenStatsExpr {

  /** Codegen-reachable instance ([[NormalizeTextExpr.Impl]] convention); the
    * count table is per-thread reused state, grown on demand, never shipped
    * (@transient — executors rebuild their own). */
  final class Impl(stopBytes: Array[Array[Byte]]) extends Serializable {

    // per-thread open-addressing table: parallel (offset, length, count)
    // slots, capacity a power of two; count==0 marks an empty slot (a
    // present token always has count >= 1)
    @transient private lazy val table =
      new ThreadLocal[Table] { override def initialValue() = new Table }

    def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
      val b = s.getBytes
      val n = b.length
      // pass 1: separator count fixes the token count AND the table size
      var spaces = 0
      var chars = 0
      var i = 0
      while (i < n) {
        val c = b(i)
        if (c == ' ') spaces += 1
        if ((c & 0xc0) != 0x80) chars += 1
        i += 1
      }
      val nTokens = spaces + 1
      val t = table.get()
      t.reset(nTokens)
      var uniq = 0
      var mode = 0
      var stops = 0
      var off = 0
      i = 0
      while (i <= n) {
        if (i == n || b(i) == ' ') {
          val len = i - off
          val cnt = t.add(b, off, len)
          if (cnt == 1) uniq += 1
          if (cnt > mode) mode = cnt
          if (len >= 1 && len <= 3 && isStop(b, off, len)) stops += 1
          off = i + 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](nTokens, uniq, mode, (chars - spaces).toLong, stops))
    }

    private def isStop(b: Array[Byte], off: Int, len: Int): Boolean = {
      var s = 0
      while (s < stopBytes.length) {
        val w = stopBytes(s)
        if (w.length == len) {
          var j = 0
          while (j < len && b(off + j) == w(j)) j += 1
          if (j == len) return true
        }
        s += 1
      }
      false
    }
  }

  /** Open-addressing (offset, len, count) table over the row's own byte
    * array — no per-row allocation once grown to the corpus' max doc. */
  private final class Table {
    private var cap = 256 // power of two
    private var offs = new Array[Int](cap)
    private var lens = new Array[Int](cap)
    private var cnts = new Array[Int](cap)
    private var bytes: Array[Byte] = _

    def reset(expected: Int): Unit = {
      var need = 256
      while (need < expected * 2) need <<= 1
      if (need > cap) {
        cap = need
        offs = new Array[Int](cap)
        lens = new Array[Int](cap)
        cnts = new Array[Int](cap)
      } else java.util.Arrays.fill(cnts, 0, cap, 0)
    }

    /** Increment the token's count; returns the NEW count. */
    def add(b: Array[Byte], off: Int, len: Int): Int = {
      bytes = b
      var h = 1
      var j = 0
      while (j < len) { h = h * 31 + b(off + j); j += 1 }
      val mask = cap - 1
      var idx = h & mask
      while (true) {
        if (cnts(idx) == 0) {
          offs(idx) = off; lens(idx) = len; cnts(idx) = 1
          return 1
        } else if (lens(idx) == len && regionEq(offs(idx), off, len)) {
          cnts(idx) += 1
          return cnts(idx)
        } else idx = (idx + 1) & mask
      }
      0 // unreachable
    }

    private def regionEq(o1: Int, o2: Int, len: Int): Boolean = {
      var j = 0
      while (j < len && bytes(o1 + j) == bytes(o2 + j)) j += 1
      j == len
    }
  }
}
