package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `lang_id(ARRAY<STRING>) -> STRING` — the n-gram-marker language guesser
  * ([[GraftFunctions.langId]]'s contract: per-language marker-hit counts,
  * argmax with ties to declared order, `und` on zero hits) as ONE codegen
  * expression.
  *
  * Why an expression and not the composed Column form: the composed argmax
  * runs one `filter` HOF pass over the token array PER LANGUAGE (each with
  * an OR-chain of equality tests), so a 5-language table walks every token
  * 5 × 4 comparisons. This walks the array ONCE with a marker→languages
  * hash lookup per token — the cost model a 100-language production table
  * needs (composed: tokens × languages × markers; here: tokens × 1 lookup).
  * A marker shared by two languages (`de`, `la`) counts for both, exactly
  * like the composed OR-chains.
  *
  * The marker table is CONSTRUCTOR-INJECTED (compile-time constant per
  * plan: the lookup structure ships to generated code via
  * `addReferenceObj`, one instance per plan, zero per-row allocation), so
  * the 100-language cost model above is exercisable, not just claimed —
  * `PropertySpec` parity-tests a generated ~100-language table and
  * `ScaleProbe` measures the one-pass-vs-composed gap there. Defaults to
  * the canonical [[LangIdExpr.Markers]] the oracle mirrors.
  *
  * Null contract: a null token array yields `und` (never NULL), matching
  * the composed form's `when(...)` fall-through — this expression is
  * non-nullable. (Pre-r11 it null-propagated; divergence flagged by
  * ADVICE r10 and fixed here.) */
case class LangIdExpr(
    child: Expression,
    markers: Seq[(String, Seq[String])] = LangIdExpr.Markers)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id expects ARRAY<STRING>, got ${other.sql}")
  }

  // Serializable-by-markers: the derived lookup structure rebuilds lazily on
  // each executor instead of riding the task closure.
  @transient private lazy val table = new LangIdExpr.Table(markers)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) LangIdExpr.Und else table.pick(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val tableRef = ctx.addReferenceObj(
      "langIdTable", table, classOf[LangIdExpr.Table].getName)
    val resultCode =
      code"""
        ${childGen.code}
        UTF8String ${ev.value} = ${childGen.isNull}
          ? $tableRef.und() : $tableRef.pick(${childGen.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {

  /** Canonical marker table (single source of truth — the composed Column
    * form, this expression, and the DuckDB oracle all derive from it).
    * Declared order IS the tie-break order. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "la", "los", "que"),
    "fr" -> Seq("le", "la", "les", "et"),
    "zh" -> Seq("de", "shi", "zai", "he"))

  private[functions] val Und = UTF8String.fromString("und")

  /** Per-table lookup structure: language codes + marker→claiming-language
    * indices. One instance per plan (shipped by `addReferenceObj`); the
    * UTF8String views are rebuilt transiently per JVM from the plain-string
    * table. */
  final class Table(markersIn: Seq[(String, Seq[String])]) extends Serializable {
    // keep the serializable source-of-truth as plain strings
    private val tableSpec: Array[(String, Array[String])] =
      markersIn.map { case (c, ms) => (c, ms.toArray) }.toArray

    @transient private lazy val codes: Array[UTF8String] =
      tableSpec.map(m => UTF8String.fromString(m._1))

    /** marker token → indices of every language claiming it. */
    @transient private lazy val markerMap: java.util.HashMap[UTF8String, Array[Int]] = {
      val m = new java.util.HashMap[UTF8String, Array[Int]]()
      tableSpec.zipWithIndex.foreach { case ((_, ms), i) =>
        ms.foreach { t =>
          val k = UTF8String.fromString(t)
          val prev = m.get(k)
          m.put(k, if (prev == null) Array(i) else prev :+ i)
        }
      }
      m
    }

    def und(): UTF8String = Und

    /** One pass: count marker hits per language, argmax (first wins ties),
      * `und` when nothing hit. Called from generated code. */
    def pick(words: ArrayData): UTF8String = {
      val counts = new Array[Int](codes.length)
      val n = words.numElements()
      var i = 0
      while (i < n) {
        if (!words.isNullAt(i)) {
          val hits = markerMap.get(words.getUTF8String(i))
          if (hits != null) {
            var j = 0
            while (j < hits.length) { counts(hits(j)) += 1; j += 1 }
          }
        }
        i += 1
      }
      var best = 0
      var bestIdx = -1
      var k = 0
      while (k < counts.length) {
        if (counts(k) > best) { best = counts(k); bestIdx = k }
        k += 1
      }
      if (bestIdx < 0) Und else codes(bestIdx)
    }
  }
}
