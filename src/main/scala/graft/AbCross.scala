package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THROWAWAY stage breakdown for the cross-relation prefix join
  * (r15: near_dup_clusters_inc read 60 s at sf10 after the
  * [[operators.Dedup.jaccardPairsAcross]] rewrite vs 13.4 s for the
  * semi-join+groupBy form — find the stage before guessing). */
object AbCross {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = 0.5
    val spark = SparkSession.builder().master("local[32]")
      .appName("ab-cross")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraftFunctions._

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-34s $s%.2f s"); s
    }

    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val batchRaw = documents.where(col("doc_id") % 5 === 4)
    def shingle(d: DataFrame): DataFrame = d
      .select(col("doc_id"), col("lang"),
        sort_array(array_distinct(spanWindowHashes(tokens(col("text")), 3)))
          .as("sh"))
      .where(size(col("sh")) > 0)
    val docsA = shingle(batchRaw).persist()
    println(s"batch docs=${docsA.count()}")
    // history from the artifact (as the shipped query reads it)
    val docsB = graft.sources.IncrementalHistory.shingleSets(spark, sfDir)
    timed("history sets count")(println(s"  hist=${docsB.count()}"))

    val unionPosts = docsA.select(col("doc_id"), col("lang"), col("sh"))
      .unionByName(docsB.select(col("doc_id"), col("lang"), col("sh")))
      .select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
    var cms: Array[Byte] = null
    timed("cms over union postings") {
      cms = unionPosts
        .agg(count_min_sketch(col("s"), lit(1e-4d), lit(0.99d), lit(42)).as("c"))
        .head().getAs[Array[Byte]](0)
    }

    def pref(docs: DataFrame): DataFrame = {
      val plen = (size(col("sh")) - ceil(size(col("sh")) * t) + 1).cast("int")
      docs.select(col("doc_id"), col("lang"), size(col("sh")).as("n"),
        posexplode(slice(array_sort(transform(col("sh"),
          x => struct(cmsEstimate(x, cms).as("e"), x.as("s")))), lit(1), plen)))
        .select(col("doc_id"), col("lang"), col("n"),
          (col("pos") + 1).as("rk"), col("col.s").as("s"))
    }
    timed("prefix build A (batch)")(noop(pref(docsA)))
    timed("prefix build B (history)")(noop(pref(docsB)))

    val tt = t / (1.0 + t)
    val candCond = col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
      col("a.n") >= col("b.n") * t && col("b.n") >= col("a.n") * t &&
      (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))) >=
        (col("a.n") + col("b.n")) * tt
    val cand = pref(docsA).as("a").join(pref(docsB).as("b"), candCond)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    var nCand = -1L
    timed("candidate join + distinct") { nCand = cand.count() }
    println(s"  candidates=$nCand")

    val candP = cand.persist()
    candP.count()
    val setsA = docsA.select(col("doc_id"), col("sh"))
    val setsB = docsB.select(col("doc_id"), col("sh"))
    val verified = candP
      .join(setsA.as("sa").hint("shuffle_hash"), col("id_a") === col("sa.doc_id"))
      .join(setsB.as("sb").hint("shuffle_hash"), col("id_b") === col("sb.doc_id"))
      .withColumn("common", sortedIntersectCount(col("sa.sh"), col("sb.sh")))
      .withColumn("jaccard", round(col("common").cast("double") /
        (size(col("sa.sh")) + size(col("sb.sh")) - col("common")), 6))
      .where(col("jaccard") >= t)
      .select(least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"), col("jaccard"))
    timed("verify (from persisted cand)")(noop(verified))

    // the OLD semi-join + groupBy form for the same cross section
    val np = docsA.select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
      .persist()
    np.count()
    val keys = np.select(col("lang"), col("s")).distinct()
    val hp = docsB.select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
      .join(keys, Seq("lang", "s"), "left_semi")
    val ns = docsA.select(col("doc_id"), size(col("sh")).as("n"))
    val hs = docsB.select(col("doc_id"), size(col("sh")).as("n"))
    val common = np.as("a").join(hp.as("b"),
        col("a.lang") === col("b.lang") && col("a.s") === col("b.s"))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val sizes = ns.unionByName(hs)
    val oldForm = common
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .where(round(col("common").cast("double") /
        (col("sa.n") + col("sb.n") - col("common")), 6) >= t)
      .select(col("doc_a"), col("doc_b"))
    timed("OLD semi-join+groupBy e2e")(noop(oldForm))

    // ---- the shipped operator end-to-end, against the real artifacts
    graft.CacheRegistry.release()
    val labels = graft.sources.IncrementalHistory.nearDupLabels(spark, sfDir)
    val setsArt = graft.sources.IncrementalHistory.shingleSets(spark, sfDir)
    timed("shipped operator e2e") {
      noop(graft.operators.Dedup.nearDupClustersIncremental(
        batchRaw, setsArt, labels, t))
    }
    graft.CacheRegistry.release()
    timed("shipped operator e2e (2nd)") {
      noop(graft.operators.Dedup.nearDupClustersIncremental(
        batchRaw, setsArt, labels, t))
    }
    spark.stop()
  }
}
