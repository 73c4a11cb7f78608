package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector surface.
  *
  * The reference engine's only non-trivial scalar function is cosine similarity
  * (reference `IVF.cpp:122-152` CPU path, `cosine_similarity.cu:33-339` GPU paths —
  * all three kernels compute the same math). Exact formula preserved:
  *
  *   sim(a, b) = dot(a, b) / (||a|| * ||b|| + 1e-8)
  *
  * with the epsilon added to the *product* of the norms (`IVF.cpp:150`, `cu:76,177,274`),
  * not to each norm. The reference accumulates in float32; we accumulate in Double and
  * return Double — a declared divergence (SURVEY.md §7 "Float determinism"): the
  * reference's own Atomic kernel is run-to-run nondeterministic, so bit-parity with it
  * is not well-defined, and Double accumulation is strictly more accurate.
  *
  * These are codegen-capable expressions (participate in whole-stage codegen) rather
  * than Scala UDFs: no boxing of the 64-float array per row, no Encoder round-trip —
  * this is the hot inner loop of every brute-force scan at 100 TB.
  */
private[graft] object VectorExprUtil {
  /** Returns true if elements are DoubleType, false for FloatType; error otherwise. */
  def elemIsDouble(dt: DataType, side: String): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case ArrayType(FloatType, _)  => false
    case other =>
      throw new IllegalArgumentException(
        s"$side must be ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.sql}")
  }

  def checkArrayOfFloating(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType | FloatType, _) => true
    case _                                    => false
  }
}

/** `cosine_sim(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) -> DOUBLE`.
  * Single pass over both arrays: dot, ||a||², ||b||² in one loop, exactly like the
  * reference CPU kernel (`IVF.cpp:129-149`), then `dot / (sqrt*sqrt + 1e-8)`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val leftIsDouble  = VectorExprUtil.elemIsDouble(left.dataType, "left")
  private lazy val rightIsDouble = VectorExprUtil.elemIsDouble(right.dataType, "right")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprUtil.checkArrayOfFloating(left.dataType) &&
        VectorExprUtil.checkArrayOfFloating(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny) + 1e-8)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx  = ctx.freshName("nx")
      val ny  = ctx.freshName("ny")
      val getX = if (leftIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (rightIsDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double xv = $getX; double yv = $getY;
         |  $dot += xv * yv; $nx += xv * xv; $ny += yv * yv;
         |}
         |${ev.value} = $dot /
         |  (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny) + 1e-8);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** `dot_product(ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>) -> DOUBLE` — the raw dot,
  * the building block the reference's kernels share (`cosine_similarity.cu:54-59`). */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private lazy val leftIsDouble  = VectorExprUtil.elemIsDouble(left.dataType, "left")
  private lazy val rightIsDouble = VectorExprUtil.elemIsDouble(right.dataType, "right")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprUtil.checkArrayOfFloating(left.dataType) &&
        VectorExprUtil.checkArrayOfFloating(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftIsDouble) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rightIsDouble) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xv * yv
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getX = if (leftIsDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (rightIsDouble) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $dot += ($getX) * ($getY); }
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `l2_norm(ARRAY<FLOAT|DOUBLE>) -> DOUBLE` — the host-side norm hoist the reference
  * performs once per query (`cosine_similarity.cu:23-29` computeHostVectorNorm). */
case class L2Norm(child: Expression) extends UnaryExpression {

  private lazy val isDouble = VectorExprUtil.elemIsDouble(child.dataType, "input")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorExprUtil.checkArrayOfFloating(child.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"l2_norm expects ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")
    }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (isDouble) x.getDouble(i) else x.getFloat(i).toDouble
      s += xv * xv
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val getX = if (isDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double xv = $getX; $s += xv * xv; }
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}
