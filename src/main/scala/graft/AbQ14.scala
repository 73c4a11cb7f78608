package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession

/** THROWAWAY same-JVM A/B for the q14 percentile rewrite (r19 #3): the
  * plain `percentile()` sort-class aggregate vs the lattice-histogram rank
  * walk, alternated in one session so ambient load cancels (the
  * BASELINE.md instrument caveat: single bench readings after disk churn
  * mislead; settle scaled diagnostics with a same-hour same-JVM A/B). */
object AbQ14 {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("ab-q14")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"  $label%-28s $s%.2f s"); s
    }

    // value parity first (the contract the bit-for-bit spec pins at
    // fixture scale, re-checked here at probe scale)
    val a = operators.Relational.eventPercentiles(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = operators.Relational.eventPercentilesSorted(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    println(s"parity at $sfDir: ${a == b} (${a.size} rows)")
    require(a == b, s"DIVERGED:\n$a\nvs\n$b")

    (1 to 3).foreach { i =>
      timed(s"sorted percentile() #$i")(
        noop(operators.Relational.eventPercentilesSorted(spark, sfDir)))
      timed(s"histogram walk    #$i")(
        noop(operators.Relational.eventPercentiles(spark, sfDir)))
    }
    spark.stop()
  }
}
