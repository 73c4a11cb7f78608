package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k-per-group aggregate — the reference's running bounded heap
  * (`IVF.cpp:185-253`: priority_queue holding k (score, idx) pairs) lifted to
  * a Catalyst `TypedImperativeAggregate`, which is what makes it scale: Spark
  * plans it as partial (map-side heaps, one per group per partition, O(k)
  * memory) + final (heap merge, `IVF.cpp:286-343`'s sequential-fine-search
  * shape), so a top-k over N rows shuffles only numPartitions×k rows per
  * group — NOT N. The window-function formulation
  * (`row_number().over(partitionBy(g))`) shuffles ALL N rows into the group's
  * partition first; at 100 TB with a handful of groups that is the difference
  * between a broadcast-sized shuffle and a full-data skew pile-up.
  *
  * Input: STRUCT<sim DOUBLE, vec_id BIGINT, label INT>; output: the top-k
  * such structs ordered sim DESC, vec_id ASC (the engine's declared total
  * order, SURVEY §2 tie-break note).
  */
case class TopKStructAgg(
    k: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  private val elemType = StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("label", IntegerType, nullable = false)))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def prettyName: String = "topk_struct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 &&
        s(0).dataType == DoubleType && s(1).dataType == LongType &&
        s(2).dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_struct expects STRUCT<DOUBLE, BIGINT, INT>, got ${other.sql}")
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.offer(row.getDouble(0), row.getLong(1), row.getInt(2))
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.absorb(b); a }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { e =>
      InternalRow(e.sim, e.vecId, e.label): Any
    })

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKStructAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStructAgg =
    copy(child = newChildren.head)
}

/** Bounded min-heap of (sim, vec_id, label): keeps the k LARGEST under the
  * total order (sim, then smaller vec_id wins ties) — heap root is the
  * current worst, exactly the reference's `priority_queue<pair,greater<>>`
  * shape (IVF.cpp:185-253) with our declared tie-break. */
final class TopKBuffer(val k: Int) {
  final case class Entry(sim: Double, vecId: Long, label: Int)

  // ordering: "better" = higher sim, or equal sim and lower vec_id
  private def better(aSim: Double, aId: Long, bSim: Double, bId: Long): Boolean =
    aSim > bSim || (aSim == bSim && aId < bId)

  private val heap = new java.util.PriorityQueue[Entry](
    math.max(k, 1),
    (a: Entry, b: Entry) =>
      if (better(a.sim, a.vecId, b.sim, b.vecId)) 1
      else if (better(b.sim, b.vecId, a.sim, a.vecId)) -1
      else 0)

  def offer(sim: Double, vecId: Long, label: Int): Unit = {
    if (heap.size < k) heap.add(Entry(sim, vecId, label))
    else {
      val worst = heap.peek()
      if (better(sim, vecId, worst.sim, worst.vecId)) {
        heap.poll(); heap.add(Entry(sim, vecId, label))
      }
    }
  }

  def absorb(other: TopKBuffer): Unit = {
    val it = other.heap.iterator()
    while (it.hasNext) { val e = it.next(); offer(e.sim, e.vecId, e.label) }
  }

  def sortedDesc: Array[Entry] = {
    val arr = heap.toArray(new Array[Entry](heap.size))
    scala.util.Sorting.stableSort(arr, (a: Entry, b: Entry) =>
      better(a.sim, a.vecId, b.sim, b.vecId))
    arr
  }

  def toBytes: Array[Byte] = {
    val arr = heap.toArray(new Array[Entry](heap.size))
    val bb = ByteBuffer.allocate(4 + arr.length * 20)
    bb.putInt(arr.length)
    arr.foreach { e => bb.putDouble(e.sim); bb.putLong(e.vecId); bb.putInt(e.label) }
    bb.array()
  }
}

object TopKStructAgg {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.{col, posexplode, struct}
  import org.apache.spark.sql.{GraftColumnBridge => B}

  /** Group-wise top-k as a DataFrame transform — the one shared unpack for
    * every bounded-heap call site ([[graft.operators.KnnBatch]],
    * [[graft.operators.IvfIndex.searchBatch]], `Relational.windowTopOrdersAgg`):
    * group by `groupCol`, keep the k largest (simCol DESC, idCol ASC) rows,
    * emit `(groupCol, vec_id, label, sim, rn)` with rn ∈ [1, k]. Callers
    * rename columns to their domain. */
  def perGroupTopK(df: DataFrame, groupCol: String, simCol: Column,
      idCol: Column, labelCol: Column, k: Int): DataFrame = {
    val agg = B.column(
      TopKStructAgg(k, B.expression(struct(simCol, idCol, labelCol)))
        .toAggregateExpression())
    df.groupBy(col(groupCol))
      .agg(agg.as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col(groupCol), col("e.vec_id").as("vec_id"),
        col("e.label").as("label"), col("e.sim").as("sim"),
        (col("pos") + 1).cast("long").as("rn"))
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong, bb.getInt); i += 1 }
    buf
  }
}
