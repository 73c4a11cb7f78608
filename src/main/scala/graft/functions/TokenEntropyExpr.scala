package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `token_entropy_stats(STRING) -> STRUCT<n_tokens: BIGINT, n_types: BIGINT,
  * fold: DOUBLE>` — the per-doc aggregate [[graft.operators.TextAnalysis
  * .tokenEntropy]] used to compute with an explode → groupBy(doc, tok) →
  * groupBy(doc) chain, collapsed into ONE pass over the row's own UTF-8
  * bytes (r19 optimization round; guide §2.4 "remove shuffles outright").
  *
  * The replaced plan shuffled one row per distinct (doc, token) pair — a
  * corpus-sized exchange at 100 TB — plus a second doc-keyed exchange for
  * the fold, for a statistic that only ever combines values WITHIN a row.
  * This expression keeps the whole computation at scan speed: the entropy
  * row count shuffled is zero (the only exchange left in the query is the
  * oracle dump's orderBy).
  *
  * Value identity with the replaced chain, field by field:
  *  - `n_tokens` = Σ counts = `count(' ') + 1` (split keep-trailing-empties
  *    semantics, byte-countable exactly as [[TokenStatsExpr]] does);
  *  - `n_types` = the count table's occupancy (distinct-by-binary-equality,
  *    same contract as `groupBy(tok)` on UTF8String binary keys);
  *  - `fold` = Σ c·ln(c) accumulated over the doc's distinct tokens in
  *    ASCENDING BINARY TOKEN ORDER — bit-for-bit the engine's
  *    `aggregate(sort_array(collect_list(struct(tok, c·ln c))), 0.0, +)`
  *    (sort_array on a struct whose first field is a distinct STRING sorts
  *    by UTF8String.compareTo = unsigned bytewise, then length; the fold
  *    seeds with 0.0 and adds left-to-right; `ln` is java.lang.Math.log on
  *    both paths, c exact in double far below 2^53). The sorted-fold
  *    contract is the family's determinism key (see
  *    [[graft.operators.TextAnalysis.unigramLogprob]]) and the DuckDB
  *    oracle replays it unchanged (`list(c·ln(c) ORDER BY tok)`), so this
  *    rewrite leaves the oracle SQL untouched.
  *
  * Null contract: null-propagating. Callers must keep the explode-form's
  * drop-null-text behavior with an explicit `WHERE text IS NOT NULL`
  * (Generate dropped those rows implicitly). Empty tokens are genuine
  * ""-valued segments, counted like any other token ([[TokenStatsExpr]]
  * semantics). Per-row cost O(bytes + u·log u) for u distinct tokens, with
  * a per-thread reused table and index buffer — no per-row allocation once
  * grown to the corpus' max doc. */
case class TokenEntropyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_types", LongType, nullable = false),
    StructField("fold", DoubleType, nullable = false)))
  override def prettyName: String = "token_entropy_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_entropy_stats expects STRING, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenEntropyExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenEntropyExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenEntropyExpr =
    copy(child = newChild)
}

object TokenEntropyExpr {

  /** Per-thread reused count table + sort scratch ([[TokenStatsExpr]]
    * convention: executors rebuild their own; nothing row-sized survives a
    * call). */
  private val table = new ThreadLocal[Table] {
    override def initialValue() = new Table
  }

  /** Codegen entry point (static: the generated code calls it directly). */
  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    var spaces = 0
    var i = 0
    while (i < n) { if (b(i) == ' ') spaces += 1; i += 1 }
    val nTokens = spaces + 1
    val t = table.get()
    t.reset(nTokens)
    var off = 0
    i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        t.add(b, off, i - off)
        off = i + 1
      }
      i += 1
    }
    val fold = t.sortedEntropyFold()
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens.toLong, t.occupancy.toLong, fold))
  }

  /** Open-addressing (offset, len, count) table over the row's own byte
    * array, plus an occupied-slot index that gets sorted by token bytes for
    * the deterministic fold. */
  private final class Table {
    private var cap = 256 // power of two
    private var offs = new Array[Int](cap)
    private var lens = new Array[Int](cap)
    private var cnts = new Array[Int](cap)
    private var slots = new Array[Int](cap) // occupied slot ids, insertion order
    private var bytes: Array[Byte] = _
    var occupancy = 0

    def reset(expected: Int): Unit = {
      var need = 256
      while (need < expected * 2) need <<= 1
      if (need > cap) {
        cap = need
        offs = new Array[Int](cap)
        lens = new Array[Int](cap)
        cnts = new Array[Int](cap)
        slots = new Array[Int](cap)
      } else java.util.Arrays.fill(cnts, 0, cap, 0)
      occupancy = 0
    }

    def add(b: Array[Byte], off: Int, len: Int): Unit = {
      bytes = b
      var h = 1
      var j = 0
      while (j < len) { h = h * 31 + b(off + j); j += 1 }
      val mask = cap - 1
      var idx = h & mask
      var done = false
      while (!done) {
        if (cnts(idx) == 0) {
          offs(idx) = off; lens(idx) = len; cnts(idx) = 1
          slots(occupancy) = idx
          occupancy += 1
          done = true
        } else if (lens(idx) == len && regionEq(offs(idx), off, len)) {
          cnts(idx) += 1
          done = true
        } else idx = (idx + 1) & mask
      }
    }

    /** Σ c·ln(c) over the distinct tokens in ascending binary token order —
      * the engine's sorted-fold addition order, bit for bit. */
    def sortedEntropyFold(): Double = {
      sort(0, occupancy - 1)
      var acc = 0.0
      var k = 0
      while (k < occupancy) {
        val c = cnts(slots(k)).toDouble
        acc += c * java.lang.Math.log(c)
        k += 1
      }
      acc
    }

    /** UTF8String.compareTo semantics: unsigned bytewise over the common
      * prefix, then length. */
    private def cmp(s1: Int, s2: Int): Int = {
      val o1 = offs(s1); val l1 = lens(s1)
      val o2 = offs(s2); val l2 = lens(s2)
      val m = if (l1 < l2) l1 else l2
      var j = 0
      while (j < m) {
        val d = (bytes(o1 + j) & 0xff) - (bytes(o2 + j) & 0xff)
        if (d != 0) return d
        j += 1
      }
      l1 - l2
    }

    /** In-place quicksort of slots[lo..hi] under [[cmp]] (median-of-3
      * pivot). Recurses into the SMALLER partition and loops on the larger
      * (ADVICE r19): naive two-sided recursion has worst-case LINEAR depth,
      * so a pathological doc with a very large distinct-token vocabulary
      * could StackOverflow an executor task; the tail-loop form bounds
      * stack depth at O(log n) with the identical comparison order. */
    private def sort(lo0: Int, hi0: Int): Unit = {
      var lo = lo0
      var hi = hi0
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        // median-of-3: order lo, mid, hi then take mid as pivot
        if (cmp(slots(mid), slots(lo)) < 0) swap(mid, lo)
        if (cmp(slots(hi), slots(lo)) < 0) swap(hi, lo)
        if (cmp(slots(hi), slots(mid)) < 0) swap(hi, mid)
        val pivot = slots(mid)
        var i = lo
        var j = hi
        while (i <= j) {
          while (cmp(slots(i), pivot) < 0) i += 1
          while (cmp(slots(j), pivot) > 0) j -= 1
          if (i <= j) { swap(i, j); i += 1; j -= 1 }
        }
        if (j - lo < hi - i) { sort(lo, j); lo = i }
        else { sort(i, hi); hi = j }
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tmp = slots(i); slots(i) = slots(j); slots(j) = tmp
    }

    private def regionEq(o1: Int, o2: Int, len: Int): Boolean = {
      var j = 0
      while (j < len && bytes(o1 + j) == bytes(o2 + j)) j += 1
      j == len
    }
  }
}
