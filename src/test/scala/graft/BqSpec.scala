package graft

import org.apache.spark.sql.functions._

import graft.operators.{BqQuant, KnnExact}

/** Binary (sign-bit) quantization: packing correctness on a hand-built
  * vector, driver/distributed packing agreement, self-query Hamming zero,
  * and the bounded-heap plan. */
class BqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private val Dim = 64

  test("sign bits pack into the expected lo/hi words on a hand-built vector") {
    // positive at dims 0, 5, 31 (lo word) and 32, 63 (hi word)
    val v = Array.fill(Dim)(-1.0f)
    Seq(0, 5, 31, 32, 63).foreach(i => v(i) = 0.5f)
    val df = Seq((0L, v.toSeq, 1)).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
    val r = BqQuant.codes(df, Dim).head()
    val expLo = 1L + (1L << 5) + (1L << 31)
    val expHi = 1L + (1L << 31)
    assert(r.getAs[Long]("lo") == expLo, s"lo ${r.getAs[Long]("lo")} != $expLo")
    assert(r.getAs[Long]("hi") == expHi, s"hi ${r.getAs[Long]("hi")} != $expHi")
    // driver-side query packing must agree with the distributed fold
    assert(BqQuant.queryCode(v) == (expLo, expHi))
  }

  test("self-query has Hamming 0 and ranks first; distances are nondecreasing") {
    val qv = KnnExact.queryVector(emb, 0L)
    val r = BqQuant.search(emb, qv, 10, Dim).collect()
    assert(r.head.getAs[Long]("vec_id") == 0L && r.head.getAs[Int]("hamming") == 0,
      s"query row must be its own nearest code: ${r.head}")
    val hs = r.map(_.getAs[Int]("hamming"))
    assert(hs.zip(hs.tail).forall { case (a, b) => a <= b },
      s"hamming must be nondecreasing: ${hs.mkString(",")}")
  }

  test("Hamming search plans scan -> bounded top-k (no shuffle, no join)") {
    val plan = BqQuant.search(emb, KnnExact.queryVector(emb, 0L), 10, Dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
    assert(!plan.contains("Exchange"), s"BQ search must not shuffle:\n${plan.take(500)}")
  }
}
