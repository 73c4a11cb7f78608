package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.{h32, h60}

/** The native digest-byte hash must be value-identical to the hex-string SQL
  * formulation the DuckDB oracles use (first-15-hex-chars == BE64 >>> 4). */
class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("h60/h32 match the conv(substr(md5)) hex formulation on random strings") {
    val rnd = new scala.util.Random(7)
    val strs = Seq.fill(500)(rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString) ++
      Seq("", "a", "0|the quick brown", "héllo wörld 世界")
    val df = strs.toDF("s").select(
      col("s"),
      h60(col("s")).as("n60"),
      conv(substring(md5(encode(col("s"), "UTF-8")), 1, 15), 16, 10).cast("long").as("x60"),
      h32(col("s")).as("n32"),
      conv(substring(md5(encode(col("s"), "UTF-8")), 1, 8), 16, 10).cast("long").as("x32"))
    val bad = df.where(col("n60") =!= col("x60") || col("n32") =!= col("x32")).collect()
    assert(bad.isEmpty, s"hash mismatch on: ${bad.take(3).mkString(", ")}")
  }

  test("h60 is non-negative and 60-bit; h32 unsigned 32-bit") {
    val vals = Seq("x", "y", "z").toDF("s")
      .select(h60(col("s")).as("a"), h32(col("s")).as("b")).collect()
    vals.foreach { r =>
      assert(r.getLong(0) >= 0 && r.getLong(0) < (1L << 60))
      assert(r.getLong(1) >= 0 && r.getLong(1) < (1L << 32))
    }
  }
}
