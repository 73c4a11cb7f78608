package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_counts(STRING) -> STRUCT<n_ws: INT, n_bpe: INT>` — both token counts
  * of [[graft.operators.TextAnalysis.tokenCountsBpe]] in ONE pass over the
  * UTF-8 bytes, allocating nothing but the 2-field result row.
  *
  * Replaces, per row:
  *  - `size(split(text, " "))`, which materializes every whitespace token as
  *    a string in an array that is immediately discarded: with `split`'s
  *    default keep-trailing-empties limit, the segment count over a
  *    single-space pattern is exactly `count(' ') + 1` — byte-countable
  *    because 0x20 never occurs inside a multi-byte UTF-8 sequence;
  *  - `regexp_count(text, BpeTokenRegex)`, a java.util.regex `find` loop
  *    over a 5-way alternation. The pattern
  *    (`'(s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^ a-zA-Z0-9']+| +`) is
  *    a deterministic ASCII-class scanner: at each position the first
  *    matching alternative wins and every quantifier is greedy over a
  *    single byte class, so a hand-rolled walk reproduces the match
  *    sequence exactly (see the case analysis in BpeCountsSpec, which also
  *    property-checks identity against the real regex).
  *
  * Equivalence notes, byte pass vs the char-level regex:
  *  - The character classes are pure-ASCII (`[a-zA-Z]`, `[0-9]`, space,
  *    apostrophe), each decidable on a single byte; every non-ASCII byte
  *    (0x80+) falls in the complement class `[^ a-zA-Z0-9']`, so a
  *    multi-byte char contributes 2-4 "other" bytes where the regex
  *    consumes 1-2 "other" code points — but `+` is greedy over the same
  *    run on both sides, and only run BOUNDARIES affect the count, so the
  *    counts agree (boundaries only occur at ASCII class changes).
  *  - A bare apostrophe (no contraction suffix) matches NO alternative:
  *    `find` skips one position, as does the walk.
  *  - `' ?'` prefers consuming the space: a space followed by a letter /
  *    digit / other run joins that token; a space followed by a space or
  *    apostrophe (or end of input) falls through to the greedy `' +'` run.
  *
  * The weaker form was measured at 13.9 s over 500k docs at sf10
  * (regexp_count after the r14 extract_all fix; 14.3 s before it) — the
  * regex engine's per-position alternation bookkeeping, not allocation, is
  * the remaining cost. Null contract: null-propagating, like both
  * replaced columns. */
case class BpeCountsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_ws", IntegerType, nullable = false),
    StructField("n_bpe", IntegerType, nullable = false)))
  override def prettyName: String = "bpe_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_counts expects STRING, got ${other.sql}")
  }

  @transient private lazy val impl = new BpeCountsExpr.Impl

  override protected def nullSafeEval(input: Any): Any =
    BpeCountsExpr.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj(
      "bpeCounter", impl, classOf[BpeCountsExpr.Impl].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountsExpr =
    copy(child = newChild)
}

object BpeCountsExpr {

  /** Codegen-reachable instance (rides the plan via `addReferenceObj` — the
    * [[NormalizeTextExpr.Impl]] convention). */
  final class Impl extends Serializable {
    def counts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow =
      BpeCountsExpr.counts(s)
  }

  private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  /** `[^ a-zA-Z0-9']` on bytes: every non-ASCII byte (b < 0 as signed)
    * is in the complement class too. */
  private def isOther(b: Byte): Boolean =
    b < 0 || !(b == ' ' || b == '\'' || isLetter(b) || isDigit(b))

  def counts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    var spaces = 0
    var bpe = 0
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '\'') {
        // alternative 1: '(s|t|re|ve|m|ll|d) — first letters are distinct,
        // so a first-byte dispatch is the leftmost-first alternation
        var len = 0
        if (i + 1 < n) {
          val c1 = b(i + 1)
          if (c1 == 's' || c1 == 't' || c1 == 'm' || c1 == 'd') len = 2
          else if ((c1 == 'r' || c1 == 'v') && i + 2 < n && b(i + 2) == 'e') len = 3
          else if (c1 == 'l' && i + 2 < n && b(i + 2) == 'l') len = 3
        }
        if (len > 0) { bpe += 1; i += len }
        else i += 1 // bare apostrophe: no alternative matches; find() skips
      } else if (c == ' ') {
        spaces += 1
        val c1: Byte = if (i + 1 < n) b(i + 1) else ' '.toByte
        if (i + 1 < n && isLetter(c1)) {
          i += 2; while (i < n && isLetter(b(i))) i += 1; bpe += 1
        } else if (i + 1 < n && isDigit(c1)) {
          i += 2; while (i < n && isDigit(b(i))) i += 1; bpe += 1
        } else if (i + 1 < n && isOther(c1)) {
          i += 2; while (i < n && isOther(b(i))) i += 1; bpe += 1
        } else {
          // next is space / apostrophe / end: greedy ' +' space run
          i += 1
          while (i < n && b(i) == ' ') { spaces += 1; i += 1 }
          bpe += 1
        }
      } else if (isLetter(c)) {
        i += 1; while (i < n && isLetter(b(i))) i += 1; bpe += 1
      } else if (isDigit(c)) {
        i += 1; while (i < n && isDigit(b(i))) i += 1; bpe += 1
      } else {
        i += 1; while (i < n && isOther(b(i))) i += 1; bpe += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](spaces + 1, bpe))
  }
}
