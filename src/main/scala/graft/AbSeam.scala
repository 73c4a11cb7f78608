package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.operators.{IvfIndex, KnnBatch}

/** Same-JVM alternating A/B harness (verdict r14 #2; kept in-tree as the
  * reusable drift-settlement protocol, not part of the library surface):
  * settles whether the r14 `multimodal_knn` 0.31 → 0.71 s driver reading was
  * the `Decoder` seam or ambience. r15 outcome (BASELINE.md CURRENT STATE):
  * flat — knn seam 0.343/0.402 min/med vs inline 0.310/0.369, ann
  * 0.368/0.448 vs 0.369/0.438 — the reading was box drift. Form A = the shipped seam path
  * (`Multimodal.frameEmbeddings`, decoder resolved once on the driver);
  * form B = the r13 inline path (static `FakeDecoder.decode` in the
  * mapPartitions lambda, no seam indirection) reconstructed verbatim.
  * Alternating ABAB… in one JVM, IVF prewarmed, noop sink, min+median
  * reported — the protocol that settled the r13 media-quotient question. */
object AbSeam {

  // r13 inline twin of frameEmbeddings (git 27a43c2): static decoder call
  private def frameEmbeddingsInline(spark: SparkSession,
      withPayloads: DataFrame, dim: Int = 64): DataFrame = {
    import spark.implicits._
    withPayloads
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        Multimodal.FakeDecoder.decode(id, payload) })
      .mapPartitions(_.map { f =>
        val d = new Array[Double](dim)
        val v = new Array[Float](dim)
        var i = 0
        var ss = 0.0
        while (i < dim) {
          val x = (graft.functions.PortableHash.h32(
            s"${f.checksum}#$i".getBytes("UTF-8")) % 2001L - 1000L).toDouble / 1000.0
          d(i) = x; ss += x * x; i += 1
        }
        val n = math.sqrt(ss)
        if (n > 0) { i = 0; while (i < dim) { v(i) = (d(i) / n).toFloat; i += 1 } }
        (f.doc_id, v)
      })
      .toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]").appName("ab-seam")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = IvfIndex.forSfDir(spark, sfDir, SparkEntry.NumClusters) // prewarm

    def queriesSeam: DataFrame =
      Multimodal.frameEmbeddings(spark,
          Multimodal.withPayload(docs.where(col("doc_id") < 3)))
        .select(col("vec_id").as("query_id"), col("embedding"))
    def queriesInline: DataFrame =
      frameEmbeddingsInline(spark,
          Multimodal.withPayload(docs.where(col("doc_id") < 3)))
        .select(col("vec_id").as("query_id"), col("embedding"))

    def knn(q: DataFrame): DataFrame =
      KnnBatch.topK(emb, q, 5).orderBy(col("query_id"), col("rn"))
    def ann(q: DataFrame): DataFrame =
      idx.searchBatch(q, 5, 4).orderBy(col("query_id"), col("rn"))

    def time(body: => DataFrame): Double = {
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val forms: Seq[(String, () => Double)] = Seq(
      "knn_seam"   -> (() => time(knn(queriesSeam))),
      "knn_inline" -> (() => time(knn(queriesInline))),
      "ann_seam"   -> (() => time(ann(queriesSeam))),
      "ann_inline" -> (() => time(ann(queriesInline))))

    // warmup round (JIT + codegen), discarded
    forms.foreach { case (_, f) => f() }
    val n = 9
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to n).foreach { _ =>
      forms.foreach { case (name, f) => results(name) = f() :: results(name) }
    }
    results.toSeq.sortBy(_._1).foreach { case (name, ts) =>
      val s = ts.sorted
      println(f"$name%-12s min ${s.head}%.3f  med ${s(s.size / 2)}%.3f  " +
        s"all ${s.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
