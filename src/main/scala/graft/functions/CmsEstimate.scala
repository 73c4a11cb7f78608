package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(BIGINT) -> BIGINT` — the Count-Min-Sketch frequency
  * estimate of a long key, against a sketch captured at plan-construction
  * time (built by `count_min_sketch(...)` over the same column and
  * collected — bounded: the sketch is eps/confidence-sized, ~1 MB, never
  * corpus-sized).
  *
  * Used as a global ORDERING key (rare-first shingle order in
  * [[graft.operators.Dedup]]'s prefix-filtered set-similarity join), where
  * its two CMS properties are exactly sufficient:
  *
  *  - deterministic: counter-array addition is commutative/associative, so
  *    the merged sketch — and hence every estimate — is identical however
  *    partitions merge; the order it induces is stable across runs;
  *  - never underestimates: a genuinely hot key cannot masquerade as rare,
  *    so hot keys always sort AFTER the prefix boundary. (A rare key
  *    colliding into a hot estimate merely sorts later — the prefix rule
  *    is sound under ANY total order, so collisions cost selectivity,
  *    never recall.)
  *
  * The deserialized sketch lives once per executor (transient lazy from
  * the serialized bytes); codegen reads it through a reference object, one
  * `estimateCount` probe (depth hash lookups) per row.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects BIGINT, got ${child.dataType.sql}")

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override protected def nullSafeEval(v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($c));")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CmsEstimate = copy(child = newChild)
}
