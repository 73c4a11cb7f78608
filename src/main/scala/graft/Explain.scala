package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run the flagship entry, show selected physical plans, and verify
  * the scale-critical plan properties (partition pruning on the IVF fine scan,
  * broadcast joins on dim tables, pushed filters on parquet scans).
  * Usage: sbt "runMain graft.Explain [sfDir] [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("knn_ivf_full", "q03_region_revenue")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    println("=== entry() (flagship, sf0.001) ===")
    val e = SparkEntry.entry(spark)
    e.show(5, truncate = 60)

    println("=== SQL-registered cosine_sim ===")
    spark.read.parquet(s"$sfDir/embeddings.parquet").createOrReplaceTempView("emb")
    spark.sql(
      """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS sim
        |FROM emb a JOIN emb b ON b.vec_id = 0 ORDER BY sim DESC LIMIT 3""".stripMargin)
      .show()

    names.foreach { n =>
      println(s"=== plan: $n ===")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
