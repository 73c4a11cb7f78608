package graft

import org.apache.spark.sql.functions._

import graft.operators.{IvfIndex, KnnExact}
import graft.sources.BinaryVectors

/** Command-line search entry — the reference's `./IVF --n_probe P` workflow
  * (`IVF.cpp:541-579` flag parsing, `README.md:24` usage) over the Spark
  * engine. The GPU kernel/threads flags have no analog (SURVEY A7–A9:
  * physically identical computations); everything semantic maps 1:1.
  *
  * Usage:
  *   runMain graft.Cli --sf-dir DIR [--query-bin F.bin|F.npy | --query-id N]
  *                     [--k K] [--n-probe P] [--clusters C]
  *
  * `--query-bin` loads a raw LE-f32 vector file (either reference format);
  * `--query-id` uses a corpus vector as the query (testdata dims ≠ the
  * reference's 384, so fixtures only pair with 384-dim corpora).
  * nProbe ≥ clusters ⇒ exact (the reference's n_probe=128 mode).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length % 2 == 0,
      s"flags must come in `--name value` pairs, got: ${args.mkString(" ")}")
    val opts = args.grouped(2).map {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
      case other => throw new IllegalArgumentException(
        s"expected `--name value`, got: ${other.mkString(" ")}")
    }.toMap
    val sfDir = opts.getOrElse("sf-dir", "/root/testdata/sf0.001")
    val k = opts.getOrElse("k", "5").toInt
    val clusters = opts.getOrElse("clusters", SparkEntry.NumClusters.toString).toInt
    val nProbe = opts.getOrElse("n-probe", clusters.toString).toInt

    val spark = GraftEngine.localSession()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      val qv: Array[Float] = opts.get("query-bin") match {
        case Some(p) if p.endsWith(".npy") => BinaryVectors.readNpyFile(p)._1(0)
        case Some(p) =>
          val dim = emb.select(size(col("embedding"))).head().getInt(0)
          BinaryVectors.readFile(p, dim)(0)
        case None =>
          KnnExact.queryVector(emb, opts.getOrElse("query-id", "0").toLong)
      }
      val idx = IvfIndex.forSfDir(spark, sfDir, clusters)
      val t0 = System.nanoTime()
      val rows = idx.search(qv, k, nProbe).collect()
      val ms = (System.nanoTime() - t0) / 1e6
      // the reference prints rank, id, score then "Search Time" (IVF.cpp:694-708)
      rows.zipWithIndex.foreach { case (r, i) =>
        println(f"${i + 1}%2d  vec_id=${r.getLong(0)}%-8d sim=${r.getDouble(2)}%.6f")
      }
      println(f"Search Time: $ms%.1f ms  (k=$k nProbe=$nProbe clusters=$clusters)")
    } finally spark.stop()
  }
}
