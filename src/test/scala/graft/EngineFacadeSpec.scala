package graft

import graft.functions.HashEmbedder

/** End-to-end through the public facade: embed corpus → build index → text
  * query → self-retrieval — the reference's full offline+online pipeline
  * (embedding.py → clusters.py → ./IVF) in one flow. */
class EngineFacadeSpec extends SparkSpec {

  test("embed -> index -> searchText retrieves the query document itself") {
    val engine = new GraftEngine(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val embedder = HashEmbedder(dim = 64)

    val emb = engine.embed(docs, embedder).withColumnRenamed("doc_id", "vec_id")
      .withColumn("label", org.apache.spark.sql.functions.lit(0))
    val idx = engine.buildIndex(emb, "facade-e2e", numClusters = 8)

    val queryText = docs.where(org.apache.spark.sql.functions.col("doc_id") === 7L)
      .select("text").head().getString(0)

    // full probe => exact: the query doc must be its own nearest neighbor
    val top = engine.searchText(idx, embedder, queryText, k = 3, nProbe = 8).collect()
    assert(top.head.getAs[Long]("vec_id") == 7L,
      s"self-retrieval failed: ${top.mkString(", ")}")
    assert(top.head.getAs[Double]("sim") > 0.999999)

    // partial probe still finds it (its own cluster is the nearest centroid)
    val ann = engine.searchText(idx, embedder, queryText, k = 3, nProbe = 1).collect()
    assert(ann.head.getAs[Long]("vec_id") == 7L)
  }

  test("searchDocs joins snippets like the reference output (IVF.cpp:689-708)") {
    val engine = new GraftEngine(spark)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = graft.operators.KnnExact.queryVector(emb, 3L)
    val out = engine.searchDocs(engine.knnExact(emb, q, 5), docs).collect()
    assert(out.length == 5)
    assert(out.head.getAs[Long]("vec_id") == 3L)
    assert(out.forall(_.getAs[String]("snippet").length <= 200))
  }

  test("HashEmbedder is deterministic and L2-normalized") {
    val e = HashEmbedder(64)
    val a = e.embed("spark table scan merge")
    val b = e.embed("spark table scan merge")
    assert(a.sameElements(b))
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(e.embed("").forall(_ == 0f), "empty text -> zero vector, no NaN")
  }
}
