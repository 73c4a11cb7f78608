package graft

import org.apache.spark.sql.functions._

import graft.operators.{KnnExact, LshAnn}

/** Random-hyperplane LSH: bucket determinism, multiprobe containment, and
  * recall against exact kNN on the sf0.001 embeddings. */
class LshAnnSpec extends SparkSpec {

  private val Dim = SparkEntry.EmbDim
  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("bucket assignment matches a plain-Scala sign-projection oracle") {
    val rows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(20).collect()
    val planes = Array.tabulate(LshAnn.NumBits)(i => LshAnn.hyperplane(i, Dim))
    val want = rows.map { r =>
      val v = r.getSeq[Float](1).toArray
      var b = 0L
      planes.zipWithIndex.foreach { case (p, i) =>
        var dot = 0.0
        var d = 0
        while (d < Dim) { dot += v(d) * p(d); d += 1 }
        if (dot >= 0) b |= (1L << i)
      }
      r.getLong(0) -> b
    }.toMap
    val got = LshAnn.assign(emb, Dim).orderBy(col("vec_id")).limit(20).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("hyperplanes are deterministic and in [-1, 1]") {
    val p1 = LshAnn.hyperplane(3, Dim)
    val p2 = LshAnn.hyperplane(3, Dim)
    assert(p1.toSeq === p2.toSeq)
    assert(p1.forall(x => x >= -1.0 && x <= 1.0))
    assert(LshAnn.hyperplane(4, Dim).toSeq !== p1.toSeq)
  }

  test("search returns only vectors from probed buckets, correctly ranked") {
    val qv = KnnExact.queryVector(emb, 0L)
    val res = LshAnn.search(emb, qv, 10, Dim).collect()
    assert(res.nonEmpty && res.length <= 10)
    // every hit's bucket is within Hamming distance 1 of the query bucket
    val buckets = res.map(_.getAs[Long]("bucket")).toSet
    val qb = {
      val assigned = LshAnn.assign(emb.where(col("vec_id") === 0L), Dim).head.getLong(1)
      assigned
    }
    buckets.foreach { b =>
      assert(java.lang.Long.bitCount(b ^ qb) <= 1, s"bucket $b too far from $qb")
    }
    // sims are non-increasing
    val sims = res.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
  }

  test("recall@10 vs exact kNN is positive (self-hit guaranteed)") {
    val qv = KnnExact.queryVector(emb, 0L)
    val exact = KnnExact.topK(emb, qv, 10).collect().map(_.getLong(0)).toSet
    val got = LshAnn.search(emb, qv, 10, Dim).collect().map(_.getLong(0)).toSet
    val recall = (got intersect exact).size / 10.0
    assert(got.contains(0L), "query vector itself must land in its own bucket")
    assert(recall > 0.0, s"recall@10 = $recall")
  }

  test("declared ann_lsh_indexed query == flat ann_lsh result (same oracle)") {
    val flat = SparkEntry.queries("ann_lsh")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = SparkEntry.queries("ann_lsh_indexed")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(indexed == flat,
      s"partitioned serving path diverges from flat scan: $indexed vs $flat")
  }

  test("bucket-partitioned index: searchIndexed == search, scan partition-prunes") {
    val dir = "target/lsh-test/indexed"
    LshAnn.buildIndex(emb, Dim, dir)
    val qv = KnnExact.queryVector(emb, 0L)
    val flat = LshAnn.search(emb, qv, 10, Dim)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val indexed = LshAnn.searchIndexed(spark, dir, qv, 10, Dim)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(indexed == flat, s"indexed LSH diverges: $indexed vs $flat")
    val plan = LshAnn.searchIndexed(spark, dir, qv, 10, Dim)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      "LSH probe scan must partition-prune on bucket:\n" + plan.take(800))
  }
}
