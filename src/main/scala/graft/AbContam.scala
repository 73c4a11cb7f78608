package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY same-JVM stage breakdown for the contamination serving form
  * (r19 #2): where do the seconds go — leaked-posting build, membership
  * probe, class fan-out, rollups? Alternated against the plain form so
  * ambient load cancels. */
object AbContam {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("ab-contam")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-34s $s%.2f s"); s
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val post = graft.sources.ShinglePostingLake.postings(spark, sfDir)
    val cls = graft.sources.ShinglePostingLake.testClasses(spark, sfDir)
    val mem = graft.sources.ShinglePostingLake.testShingles(spark, sfDir)
    graft.operators.Dedup.verifyPostingCorpus(docs, post)

    val train = post.where(col("split") === "train")
      .select(col("doc_id"), col("s"))
    timed("train scan only")(noop(train))
    val leakedRaw = train.join(broadcast(mem), Seq("s"), "left_semi")
    timed("leaked (bcast semi)")(noop(leakedRaw))
    var leaked: DataFrame = null
    timed("leaked persist + count") {
      leaked = leakedRaw.persist()
      println(s"  leaked=${leaked.count()}")
    }
    timed("nSh rollup")(noop(
      leaked.groupBy(col("doc_id")).agg(countDistinct(col("s")).as("n"))))
    timed("nTd class fanout + distinct")(noop(
      leaked.join(broadcast(cls), Seq("s"))
        .select(col("doc_id"), col("cid"), col("n_docs")).distinct()
        .groupBy(col("doc_id"))
        .agg(sum(col("n_docs")).cast("long").as("n_test_docs"))))
    leaked.unpersist()

    (1 to 2).foreach { i =>
      timed(s"serving form e2e #$i") {
        noop(graft.operators.Dedup.benchmarkContaminationPrebuilt(
          docs, post, cls, mem))
        graft.CacheRegistry.release()
      }
    }
    timed("plain form e2e") {
      noop(graft.operators.Dedup.benchmarkContamination(docs))
      graft.CacheRegistry.release()
    }
    spark.stop()
  }
}
