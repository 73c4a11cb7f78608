package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THROWAWAY same-JVM A/B + stage breakdown for the set-similarity tail
  * (r15 prefix-filter follow-up): the prefix-filtered candidate rule read
  * 32 s at sf10 where the naive all-postings self-join read ~13 s (r15b
  * record) — on a corpus whose shingle df distribution is benign, the
  * prefix build (df join + per-doc window sort over every posting, once
  * per self-join side) can cost more than the hot-key explosion it
  * prevents. Alternates the two tails ABAB over the SAME persisted
  * postings (family-cache conditions) and times each prefix stage
  * separately so the fix targets the measured stage, not a guess.
  * Both tails are reconstructed inline (they are private[operators]);
  * the shipped one is also run via [[operators.Dedup.ngramJaccardPairs]]
  * to confirm the inline twin matches it.
  */
object AbJaccard {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val t = 0.5
    val spark = SparkSession.builder().master("local[32]")
      .appName("ab-jaccard")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    import graft.functions.GraftFunctions._
    val docs = documents
      .select(col("doc_id"), col("lang"),
        sort_array(array_distinct(spanWindowHashes(tokens(col("text")), 3)))
          .as("sh"))
      .where(size(col("sh")) > 0)
      .persist()
    val posts = docs
      .select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
      .persist()
    println(s"docs=${docs.count()} postings=${posts.count()}")

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-28s $s%.2f s"); s
    }

    // ----- naive tail (pre-prefix form), inline twin of jaccardPairsAllPairs
    def naive(): DataFrame = {
      val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
      val common = posts.as("a")
        .join(posts.as("b"),
          col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
      common
        .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
        .withColumn("jaccard", round(col("common").cast("double") /
          (col("sa.n") + col("sb.n") - col("common")), 6))
        .where(col("jaccard") >= t)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }

    // ----- prefix tail, inline twin of the shipped jaccardPairsFrom
    val tt = t / (1.0 + t)
    lazy val cmsBytes: Array[Byte] = posts
      .agg(count_min_sketch(col("s"), lit(1e-4d), lit(0.99d), lit(42)).as("c"))
      .head().getAs[Array[Byte]](0)
    def prefTable(): DataFrame = {
      val plen = (size(col("sh")) - ceil(size(col("sh")) * t) + 1).cast("int")
      docs
        .select(col("doc_id"), col("lang"), size(col("sh")).as("n"),
          posexplode(slice(array_sort(transform(col("sh"), x =>
            struct(graft.functions.GraftFunctions.cmsEstimate(x, cmsBytes)
              .as("e"), x.as("s")))), lit(1), plen)))
        .select(col("doc_id"), col("lang"), col("n"),
          (col("pos") + 1).as("rk"), col("col.s").as("s"))
    }
    def candTable(pref: DataFrame): DataFrame = pref.as("a")
      .join(pref.as("b"),
        col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.n") >= col("b.n") * t && col("b.n") >= col("a.n") * t &&
          (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk")))
            >= (col("a.n") + col("b.n")) * tt)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    def verify(cand: DataFrame): DataFrame = {
      val sets = docs.select(col("doc_id"), col("sh"))
      cand
        .join(sets.as("sa").hint("shuffle_hash"),
          col("doc_a") === col("sa.doc_id"))
        .join(sets.as("sb").hint("shuffle_hash"),
          col("doc_b") === col("sb.doc_id"))
        .withColumn("common", graft.functions.GraftFunctions
          .sortedIntersectCount(col("sa.sh"), col("sb.sh")))
        .withColumn("jaccard", round(col("common").cast("double") /
          (size(col("sa.sh")) + size(col("sb.sh")) - col("common")), 6))
        .where(col("jaccard") >= t)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }
    def prefix(): DataFrame = verify(candTable(prefTable()))

    // ----- stage breakdown of the prefix tail (each stage forced separately)
    println("stage breakdown (prefix tail):")
    timed("cms build")(cmsBytes.length: Unit)
    val prefTbl = prefTable()
    timed("prefix build (per-row)")(noop(prefTbl))
    val prefP = prefTbl.persist()
    println(s"  prefix rows: ${prefP.count()} of ${posts.count()} postings")
    val candTbl = candTable(prefP)
    timed("cand join (pref persisted)")(noop(candTbl))
    val candP = candTbl.persist()
    println(s"  candidates: ${candP.count()}")
    timed("verify (cand persisted)")(noop(verify(candP)))
    candP.unpersist(); prefP.unpersist()

    // ----- ABAB end-to-end
    noop(naive()); noop(prefix()) // warmup
    val n = 5
    val a = Array.fill(n)(0.0); val b = Array.fill(n)(0.0)
    (0 until n).foreach { i =>
      a(i) = timed("naive  e2e")(noop(naive()))
      b(i) = timed("prefix e2e")(noop(prefix()))
    }
    def stats(xs: Array[Double]) = {
      val s = xs.sorted
      f"min ${s.head}%.2f med ${s(s.length / 2)}%.2f"
    }
    println(s"naive  ${stats(a)}")
    println(s"prefix ${stats(b)}")
    spark.stop()
  }
}
