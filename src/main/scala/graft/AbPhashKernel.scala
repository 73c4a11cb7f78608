package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THROWAWAY kernel profile for the phash sketch fill (r15: near_dup_frames
  * 19.4 s at sf10 is the suite's top row; split scan vs kernel vs band/class
  * stages before touching anything). */
object AbPhashKernel {
  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("ab-phash-kernel")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.GraftFunctions._

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"  $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    for (i <- 1 to 2) {
      timed(s"scan only (sum length) #$i")(
        noop(docs.select(length(col("text")))))
      timed(s"kernel (phash_frames) #$i")(
        noop(docs.select(graft.functions.GraftFunctions
          .phashFrames(col("text"), 64, 32))))
      timed(s"kernel + posexplode #$i")(
        noop(graft.multimodal.Multimodal.phashFrames(docs, carry = Seq("lang"))))
    }
    spark.stop()
  }
}
