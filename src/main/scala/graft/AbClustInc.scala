package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THROWAWAY stage breakdown for the near_dup_clusters_inc sf10 row
  * (verdict r16 #1): where do the ~9.2 s go — batch shingle fill, the
  * union CMS sketch, the history-side prefix build, the cross candidate
  * join + verify, the new×new self-join, or the quotient CC merge +
  * relabel? Lives in package graft.operators to reach the family's
  * private[operators] internals directly. */
object AbClustInc {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf10")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftSparkExtensions")
      .master("local[32]")
      .appName("ab-clustinc")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def t(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[ab-clustinc] $label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t("artifact prewarm (sets+labels)") {
      graft.sources.IncrementalHistory.shingleSets(spark, sfDir)
      graft.sources.IncrementalHistory.nearDupLabels(spark, sfDir)
      graft.CacheRegistry.release()
    }
    val batch = graft.sources.IncrementalHistory.batchDocs(docs)
    val histSets = graft.sources.IncrementalHistory.shingleSets(spark, sfDir)
    val histLabels = graft.sources.IncrementalHistory.nearDupLabels(spark, sfDir)

    val histPref = graft.sources.IncrementalHistory.shinglePrefixes(spark, sfDir)
    val histCms = graft.sources.IncrementalHistory.shingleCms(spark, sfDir)

    // variant: broadcast the BATCH prefix side of the candidate join (the
    // history prefix artifact then streams with no exchange and no sort) +
    // reuse the stored history CMS for the new×new ordering (no per-batch
    // sketch build). Output must stay identical.
    def variant(): org.apache.spark.sql.DataFrame = {
      val docsSh2 = Dedup.shingledDocs(batch)
      val np2 = Dedup.shinglePostings(docsSh2)
      val newNew = Dedup.jaccardPairsFrom(docsSh2, np2, 0.5)
        .select(col("doc_a"), col("doc_b"))
      val batchPref = Dedup.prefixPostings(docsSh2, histCms, 0.5)
      val tt = 0.5 / 1.5
      val cand = broadcast(batchPref).as("a")
        .join(histPref.as("b"),
          col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
            col("a.n") >= col("b.n") * 0.5 && col("b.n") >= col("a.n") * 0.5 &&
            (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))) >=
              (col("a.n") + col("b.n")) * tt &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      import graft.functions.GraftFunctions.sortedIntersectCount
      val setsA = docsSh2.select(col("doc_id"), col("sh"))
      val setsB = histSets.select(col("doc_id"), col("sh"))
      val newHist = cand
        .join(setsA.as("sa").hint("shuffle_hash"), col("id_a") === col("sa.doc_id"))
        .join(setsB.as("sb").hint("shuffle_hash"), col("id_b") === col("sb.doc_id"))
        .withColumn("common", sortedIntersectCount(col("sa.sh"), col("sb.sh")))
        .withColumn("jaccard", round(col("common").cast("double") /
          (size(col("sa.sh")) + size(col("sb.sh")) - col("common")), 6))
        .where(col("jaccard") >= 0.5)
        .select(least(col("id_a"), col("id_b")).as("doc_a"),
          greatest(col("id_a"), col("id_b")).as("doc_b"))
      val pairs = newNew.unionByName(newHist)
      val lbl = histLabels.select(col("doc_id"), col("cluster_rep"))
      val contracted = pairs
        .join(lbl.toDF("doc_a", "rep_a"), Seq("doc_a"), "left")
        .join(lbl.toDF("doc_b", "rep_b"), Seq("doc_b"), "left")
        .select(coalesce(col("rep_a"), col("doc_a")).as("src"),
          coalesce(col("rep_b"), col("doc_b")).as("dst"))
        .where(col("src") =!= col("dst"))
      val merged = ConnectedComponents.run(contracted)
      val repRelabel = merged.select(col("doc_id").as("cluster_rep"), col("label"))
      val relabeled = histLabels.join(repRelabel, Seq("cluster_rep"))
        .select(col("doc_id"), col("label").as("cluster_rep"))
      val newlyLabeled = merged
        .join(lbl.select(col("cluster_rep").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("label").as("cluster_rep"))
      val untouched = histLabels
        .join(repRelabel.select(col("cluster_rep")), Seq("cluster_rep"), "left_anti")
        .select(col("doc_id"), col("cluster_rep"))
      untouched.unionByName(relabeled).unionByName(newlyLabeled)
    }

    (1 to 3).foreach { rep =>
      println(s"[ab-clustinc] --- rep $rep ---")
      Dedup.clearCmsMemo()
      t("PLAIN incremental (cold caches)") {
        noop(Dedup.nearDupClustersIncremental(batch, histSets, histLabels, 0.5))
      }
      t("PLAIN incremental (warm caches)") {
        noop(Dedup.nearDupClustersIncremental(batch, histSets, histLabels, 0.5))
      }
      graft.CacheRegistry.release()
      Dedup.clearCmsMemo()
      t("PREBUILT incremental (cold)") {
        noop(Dedup.nearDupClustersIncrementalPrebuilt(
          batch, histSets, histPref, histCms, histLabels, 0.5))
      }
      t("PREBUILT incremental (warm)") {
        noop(Dedup.nearDupClustersIncrementalPrebuilt(
          batch, histSets, histPref, histCms, histLabels, 0.5))
      }
      graft.CacheRegistry.release()
      t("VARIANT bc-batch-prefix (cold)") { noop(variant()) }
      t("VARIANT bc-batch-prefix (warm)") { noop(variant()) }
      if (rep > 1) { graft.CacheRegistry.release() } else {
      graft.CacheRegistry.release()
      Dedup.clearCmsMemo()
      // now the stages, in dependency order, each timed in isolation
      val docsSh = Dedup.shingledDocs(batch)
      t("batch shingle persist fill") { noop(docsSh) }
      val unionPosts = docsSh.select(col("doc_id"), col("lang"), col("sh"))
        .unionByName(histSets.select(col("doc_id"), col("lang"), col("sh")))
        .select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
      var cms: Array[Byte] = null
      t("union CMS sketch build") { cms = Dedup.cmsBytesFor(unionPosts) }
      t("hist prefixPostings scan") {
        noop(Dedup.prefixPostings(histSets, cms, 0.5))
      }
      t("batch prefixPostings scan") {
        noop(Dedup.prefixPostings(docsSh, cms, 0.5))
      }
      t("new_hist across (cms memoized)") {
        noop(Dedup.jaccardPairsAcross(docsSh, histSets, 0.5))
      }
      val np = Dedup.shinglePostings(docsSh)
      t("batch postings persist fill") { noop(np) }
      t("new_new jaccardPairsFrom") {
        noop(Dedup.jaccardPairsFrom(docsSh, np, 0.5))
      }
      // merge-only: precompute the pairs, then time contraction + CC + relabel
      val newNew = Dedup.jaccardPairsFrom(docsSh, np, 0.5)
        .select(col("doc_a"), col("doc_b"))
      val newHist = Dedup.jaccardPairsAcross(docsSh, histSets, 0.5)
        .select(col("doc_a"), col("doc_b"))
      val pairsCached = graft.CacheRegistry.persist(newNew.unionByName(newHist))
      t("pairs persist fill") { noop(pairsCached) }
      t("quotient CC merge + relabel") {
        val lbl = histLabels.select(col("doc_id"), col("cluster_rep"))
        val contracted = pairsCached
          .join(lbl.toDF("doc_a", "rep_a"), Seq("doc_a"), "left")
          .join(lbl.toDF("doc_b", "rep_b"), Seq("doc_b"), "left")
          .select(coalesce(col("rep_a"), col("doc_a")).as("src"),
            coalesce(col("rep_b"), col("doc_b")).as("dst"))
          .where(col("src") =!= col("dst"))
        val merged = ConnectedComponents.run(contracted)
        val repRelabel = merged.select(col("doc_id").as("cluster_rep"), col("label"))
        val relabeled = histLabels.join(repRelabel, Seq("cluster_rep"))
          .select(col("doc_id"), col("label").as("cluster_rep"))
        val newlyLabeled = merged
          .join(lbl.select(col("cluster_rep").as("doc_id")).distinct(),
            Seq("doc_id"), "left_anti")
          .select(col("doc_id"), col("label").as("cluster_rep"))
        val untouched = histLabels
          .join(repRelabel.select(col("cluster_rep")), Seq("cluster_rep"), "left_anti")
          .select(col("doc_id"), col("cluster_rep"))
        noop(untouched.unionByName(relabeled).unionByName(newlyLabeled))
      }
      // verify-join strategy shootout: candidates are FEW (prefix-filtered),
      // sets are FAT (arrays) — which join shape avoids shuffling the sets?
      import graft.functions.GraftFunctions.sortedIntersectCount
      val candAcross = graft.CacheRegistry.persist(
        Dedup.prefixPostings(docsSh, cms, 0.5).as("a")
          .join(Dedup.prefixPostings(histSets, cms, 0.5).as("b"),
            col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
              col("a.n") >= col("b.n") * 0.5 && col("b.n") >= col("a.n") * 0.5 &&
              (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))) >=
                (col("a.n") + col("b.n")) * (0.5 / 1.5) &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct())
      t("cand across fill") { println(s"    cand rows: ${candAcross.count()}") }
      val setsA = docsSh.select(col("doc_id"), col("sh"))
      val setsB = histSets.select(col("doc_id"), col("sh"))
      def verifyWith(hint: String): org.apache.spark.sql.DataFrame = {
        val (ja, jb) = hint match {
          case "shuffle_hash" => (setsA.hint("shuffle_hash"), setsB.hint("shuffle_hash"))
          case _ => (setsA, setsB)
        }
        candAcross
          .join(ja.as("sa"), col("id_a") === col("sa.doc_id"))
          .join(jb.as("sb"), col("id_b") === col("sb.doc_id"))
          .withColumn("common", sortedIntersectCount(col("sa.sh"), col("sb.sh")))
          .where(col("common") > 0)
          .select(col("id_a"), col("id_b"), col("common"))
      }
      t("verify: shuffle_hash sets") { noop(verifyWith("shuffle_hash")) }
      t("verify: no hint (AQE)") { noop(verifyWith("none")) }
      t("selectivity counts") {
        val va = Dedup.jaccardPairsAcross(docsSh, histSets, 0.5).count()
        val cn = Dedup.prefixPostings(docsSh, cms, 0.5).as("a")
          .join(Dedup.prefixPostings(docsSh, cms, 0.5).as("b"),
            col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
              col("a.n") >= col("b.n") * 0.5 && col("b.n") >= col("a.n") * 0.5 &&
              (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))) >=
                (col("a.n") + col("b.n")) * (0.5 / 1.5) &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
        val vn = Dedup.jaccardPairsFrom(docsSh, np, 0.5).count()
        println(s"    across: verified $va of ${candAcross.count()} cand; " +
          s"new_new: verified $vn of $cn cand")
      }
      t("experiment: exact-df order") {
        // rebuild both sides' prefixes under EXACT per-(lang,s) df of the
        // union postings (refresh-affordable for history; this experiment
        // just measures how many candidates the order saves vs CMS)
        val dfTbl = unionPosts.groupBy(col("lang"), col("s"))
          .agg(count(lit(1)).as("df"))
        val allSets = docsSh.select(col("doc_id"), col("lang"), col("sh"))
          .unionByName(histSets.select(col("doc_id"), col("lang"), col("sh")))
        val ordered = allSets
          .select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
          .join(dfTbl, Seq("lang", "s"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"))
        val plen = (size(col("ord")) - ceil(size(col("ord")) * 0.5) + 1).cast("int")
        val pref = ordered.select(col("doc_id"), col("lang"),
            size(col("ord")).as("n"),
            posexplode(slice(col("ord"), lit(1), plen)))
          .select(col("doc_id"), col("lang"), col("n"),
            (col("pos") + 1).as("rk"), col("col.s").as("s"),
            (col("doc_id") % 5 === 4).as("is_batch"))
        val nCand = pref.where(col("is_batch")).as("a")
          .join(pref.where(!col("is_batch")).as("b"),
            col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
              col("a.n") >= col("b.n") * 0.5 && col("b.n") >= col("a.n") * 0.5 &&
              (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))) >=
                (col("a.n") + col("b.n")) * (0.5 / 1.5))
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
        println(s"    exact-df across cand: $nCand (vs 1.64M under CMS)")
      }
      t("experiment: asym exact-df hist") {
        // asymmetric prefix scheme: batch side UNPREFIXED (all postings, no
        // order needed), history side prefixed under EXACT history df — the
        // order lives entirely history-side, so it is refresh-computable.
        // Soundness: J>=t => |x∩y| >= ceil(t*n_b); y's prefix of length
        // n_b - ceil(t*n_b) + 1 must contain a common element since x keeps
        // everything. b-side positional filter retained.
        val histDf = histSets
          .select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
          .groupBy(col("lang"), col("s")).agg(count(lit(1)).as("df"))
        val histOrdered = histSets
          .select(col("doc_id"), col("lang"), explode(col("sh")).as("s"))
          .join(histDf, Seq("lang", "s"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("ord"))
        val plen = (size(col("ord")) - ceil(size(col("ord")) * 0.5) + 1).cast("int")
        val histPref = histOrdered.select(col("doc_id"), col("lang"),
            size(col("ord")).as("n"),
            posexplode(slice(col("ord"), lit(1), plen)))
          .select(col("doc_id"), col("lang"), col("n"),
            (col("pos") + 1).as("rk"), col("col.s").as("s"))
        val batchAll = docsSh.select(col("doc_id"), col("lang"),
            size(col("sh")).as("n"), explode(col("sh")).as("s"))
        val nCand = batchAll.as("a")
          .join(histPref.as("b"),
            col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
              col("a.n") >= col("b.n") * 0.5 && col("b.n") >= col("a.n") * 0.5 &&
              (lit(1) + col("b.n") - col("b.rk")) >=
                (col("a.n") + col("b.n")) * (0.5 / 1.5))
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
        println(s"    asym exact-df cand: $nCand (vs 1.64M)")
      }
      t("experiment: index midprefix") {
        // PPJoin indexing prefix on the history side: rk_b <= n_b -
        // ceil(2t/(1+t) * n_b) + 1 — sound (Xiao et al. WWW'08), shorter
        val t2 = 2 * 0.5 / 1.5
        val nCand = Dedup.prefixPostings(docsSh, cms, 0.5).as("a")
          .join(Dedup.prefixPostings(histSets, cms, 0.5)
              .where(col("rk") <= (col("n") - ceil(col("n") * t2) + 1)).as("b"),
            col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
              col("a.n") >= col("b.n") * 0.5 && col("b.n") >= col("a.n") * 0.5 &&
              (lit(1) + least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))) >=
                (col("a.n") + col("b.n")) * (0.5 / 1.5) &&
              col("a.doc_id") =!= col("b.doc_id"))
          .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
        println(s"    midprefix across cand: $nCand (vs 1.64M)")
      }
      graft.CacheRegistry.release()
      println(s"[ab-clustinc] released")
      }
    }
    spark.stop()
  }
}
