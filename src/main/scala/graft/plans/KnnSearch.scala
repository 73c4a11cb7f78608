package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, GraftColumnBridge => B}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.CosineSimilarity
import graft.operators.IvfIndex

/** The `knn()` whole-operator rewrite (SURVEY §4 item 2, declared post-MVP in
  * the reference analysis): a user-facing logical node that the optimizer
  * expands into the coarse-prune-fine IVF plan — the reference's two-phase
  * search (`IVF.cpp:271-282` coarse, `:286-435` fine) as a Catalyst
  * `Rule[LogicalPlan]` instead of API-layer composition.
  *
  * The node carries the (k-row, driver-local) centroid table, so the rewrite
  * is pure: coarse probing happens at plan time, and the emitted plan is
  * exactly the one `IvfIndex.search` composes — `Filter(cluster IN probes)`
  * (→ `PartitionFilters` on the inverted-file scan) under a projected cosine
  * and a `Limit(Sort)` pair that the planner turns into
  * `TakeOrderedAndProject`. No custom SparkStrategy or physical operator is
  * needed: every physical piece already exists (SURVEY §4 "custom Catalyst
  * work actually required").
  */
final case class KnnSearchNode(
    child: LogicalPlan,
    query: Seq[Float],
    k: Int,
    nProbe: Int,
    centroids: Seq[(Int, Seq[Float])],
    simOut: AttributeReference) extends UnaryNode {

  private def childAttr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"knn() child must expose a `$name` column; has ${child.output.map(_.name)}"))

  override def output: Seq[Attribute] =
    Seq(childAttr("vec_id"), childAttr("label"), simOut)

  // sim is minted by this operator, not consumed from the child
  override def producedAttributes: AttributeSet = AttributeSet(simOut)

  override def maxRows: Option[Long] = Some(k.toLong)

  override protected def withNewChildInternal(newChild: LogicalPlan): KnnSearchNode =
    copy(child = newChild)
}

object KnnSearchNode {

  /** Compose a [[KnnSearchNode]] over an inverted-file DataFrame
    * (`vec_id, label, embedding, cluster`) and wrap it as a DataFrame.
    * The session must carry [[GraftSparkExtensions]] or planning fails. */
  def dataFrame(
      spark: SparkSession,
      vectors: DataFrame,
      centroids: Seq[(Int, Array[Float])],
      query: Array[Float],
      k: Int,
      nProbe: Int): DataFrame = {
    val sim = AttributeReference("sim", DoubleType, nullable = true)()
    val node = KnnSearchNode(
      B.analyzedPlan(vectors), query.toIndexedSeq, k, nProbe,
      centroids.map { case (c, v) => (c, v.toIndexedSeq) }, sim)
    B.ofRows(spark, node)
  }
}

/** Expands [[KnnSearchNode]] into the pruned-scan + top-k plan. Injected via
  * [[GraftSparkExtensions]] as an optimizer rule: it runs after the main
  * optimization batches, which is safe because the emitted subtree needs no
  * further optimization — the Project is already minimal (vec_id, label, sim
  * over embedding), the Filter is a partition predicate the FILE SOURCE
  * strategy (not the optimizer) turns into partition pruning, and
  * `Limit(Sort)` is matched by the planner's TakeOrderedAndProject rule. */
object KnnSearchRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case n: KnnSearchNode => rewrite(n)
  }

  private def rewrite(n: KnnSearchNode): LogicalPlan = {
    def attr(name: String): Attribute = n.child.output.find(_.name == name).get
    val cluster = attr("cluster")
    val emb = attr("embedding")
    val vecId = attr("vec_id")
    val label = attr("label")
    // coarse phase at plan time — identical math to the API path
    val probes = IvfIndex.coarseProbes(
      n.centroids.map { case (c, v) => (c, v.toArray) },
      n.query.toArray, n.nProbe)
    val pruned = Filter(In(cluster, probes.map(p => Literal(p))), n.child)
    val qLit = Literal.create(n.query, ArrayType(FloatType, containsNull = false))
    // same rounded-sim contract as the declared engine tie-break
    val simAlias = Alias(Round(CosineSimilarity(emb, qLit), Literal(6)), "sim")(
      exprId = n.simOut.exprId)
    val proj = Project(Seq(vecId, label, simAlias), pruned)
    val order = Seq(
      SortOrder(n.simOut, Descending),
      SortOrder(vecId, Ascending))
    GlobalLimit(Literal(n.k), LocalLimit(Literal(n.k), Sort(order, global = true, proj)))
  }
}

/** Session extension registration: `spark.sql.extensions=graft.plans.GraftSparkExtensions`
  * (or `SparkSession.builder.withExtensions`). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => KnnSearchRewrite)
}
