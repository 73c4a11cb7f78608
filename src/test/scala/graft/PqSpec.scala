package graft

import org.apache.spark.sql.functions._
import graft.operators.{KnnExact, PqQuant}

/** Product-quantization invariants: encoding argmax correctness, rebuild
  * determinism, code-range bounds, and an ANN quality floor.
  *
  * Quality note: the synthetic testdata embeddings are near-uniform — the
  * worst case for PQ (no cluster structure inside any subspace), so absolute
  * recall is data-limited here (≈0.4@10 at 32× compression; SQ8's 4× gets
  * 1.0). The floor below (0.2) gates against regressions, not against the
  * data. Real-corpus embeddings concentrate on manifolds and quantize far
  * better — and ann_pq's exact arithmetic is separately oracle-checked.
  */
class PqSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val dim = SparkEntry.EmbDim
  private lazy val model = PqQuant.train(emb, dim)
  private lazy val codes = PqQuant.encode(spark, emb, model)

  test("codebook shape and code range") {
    assert(model.codebooks.length == PqQuant.M)
    model.codebooks.foreach { cb =>
      assert(cb.length == PqQuant.SubCodes)
      cb.foreach(cw => assert(cw.length == model.sub))
    }
    val all = codes.select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).head()
    assert(all.getInt(0) >= 0 && all.getInt(1) < PqQuant.SubCodes)
    assert(codes.count() == emb.count())
  }

  test("encoding is the argmax of 2<sv,cw> - <cw,cw> with ties to lower code") {
    val got = codes.where(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Int]]("codes").toSeq).toMap
    val vecs = emb.where(col("vec_id") < 10).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val expect = (0 until PqQuant.M).map { m =>
        val sv = v.slice(m * model.sub, (m + 1) * model.sub)
        (0 until PqQuant.SubCodes).map { c =>
          val cw = model.codebooks(m)(c)
          var dot = 0.0; var nn = 0.0
          for (j <- cw.indices) {
            dot += sv(j).toDouble * cw(j); nn += cw(j).toDouble * cw(j)
          }
          val score = BigDecimal(2.0 * dot - nn)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (c, score)
        }.sortBy { case (c, s) => (-s, c) }.head._1
      }
      assert(got(id) == expect, s"vec $id: got ${got(id)} expected $expect")
    }
  }

  test("training is deterministic (seeded per subspace)") {
    val again = PqQuant.train(emb, dim)
    for (m <- 0 until PqQuant.M; c <- 0 until PqQuant.SubCodes)
      assert(model.codebooks(m)(c).sameElements(again.codebooks(m)(c)),
        s"codebook ($m, $c) differs across rebuilds")
  }

  test("IVF×PQ at full probe ≡ flat ADC (pruning is exhaustive at nProbe=k)") {
    val idx = graft.operators.IvfIndex.forSfDir(spark, sf0001, SparkEntry.NumClusters)
    val (m2, flat) = PqQuant.forSfDir(spark, sf0001, dim)
    val (_, ivfCodes) = PqQuant.forSfDirIvf(spark, sf0001, dim, SparkEntry.NumClusters)
    val qv = KnnExact.queryVector(emb, 0L)
    val probes = idx.coarseProbes(qv, SparkEntry.NumClusters)
    val full = PqQuant.search(
      ivfCodes.where(col("cluster").isin(probes: _*)), m2, qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val adc = PqQuant.search(flat, m2, qv, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(full == adc, s"full-probe IVF-PQ must equal flat ADC:\n$full\n$adc")
    // the pruned scan must show PartitionFilters on cluster
    val plan = PqQuant.search(
      ivfCodes.where(col("cluster").isin(probes.take(4): _*)), m2, qv, 10)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(plan).isDefined,
      s"IVF-PQ fine scan lost partition pruning:\n${plan.take(800)}")
  }

  test("ADC search clears the data-limited recall floor and ranks deterministically") {
    // the persisted-artifact shape (forSfDir reads codes back from parquet):
    // what production scans, and what the zero-shuffle claim is about — the
    // in-memory encode() plan would drag its own aggregation exchanges along
    val (m2, stored) = PqQuant.forSfDir(spark, sf0001, dim)
    val qv = KnnExact.queryVector(emb, 0L)
    val exact = KnnExact.topK(emb, qv, 10).collect().map(_.getLong(0)).toSet
    val pq = PqQuant.search(stored, m2, qv, 10).collect()
    val pqIds = pq.map(_.getLong(0)).toSet
    val recall = exact.intersect(pqIds).size / 10.0
    assert(recall >= 0.2, s"PQ recall@10 regressed: $recall")
    // declared total order: sim DESC, vec_id ASC on the 6-dp-rounded sim
    val order = pq.map(r => (-r.getDouble(2), r.getLong(0))).toSeq
    assert(order == order.sorted)
    // zero-shuffle scan shape: no exchange below the top-k
    val plan = PqQuant.search(stored, m2, qv, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "ADC must keep bounded top-k")
    assert(!plan.contains("Exchange"), s"ADC scan must not shuffle:\n${plan.take(600)}")
  }
}
