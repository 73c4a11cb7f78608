package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.unsafe.types.UTF8String

/** THROWAWAY same-JVM A/B (verdict r14 watch #2): isolate the ONE code delta
  * in the phash_docs sketch path since the 1.6-1.9 band was set — r14's
  * [[graft.functions.PortableHash.packPhash]] factor-out (tuple return +
  * require + a second pass over iv, replacing the fused threshold loop).
  * Times the exact per-row kernel `PortableHash.phashFrames` (what the
  * codegen'd PhashFrames expression calls) against a verbatim
  * reconstruction of the pre-r14 fused form, alternating ABAB over the real
  * sf0.1 documents text on the driver. The query-level shift is already
  * ruled out as code (the r13 driver read 2.03 s on the code that read
  * 1.62 s locally); this pins the residual code question. */
object AbPhash {

  // pre-r14 fused twin of PortableHash.phashFrames (git 27a43c2): threshold
  // + packing inline in the cell loop, no packPhash call, no tuple
  private def phashFramesFused(text: UTF8String, stride: Int, cells: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val cellw = stride / cells
    val n = text.numChars()
    val nFrames = math.max((n + stride - 1) / stride, 1)
    // same reused digest discipline as PortableHash's thread-local (private
    // there; one instance per call is equivalent for a single-thread loop)
    val m = java.security.MessageDigest.getInstance("MD5")
    val iv = new Array[Long](cells)
    val rows = new Array[Any](nFrames)
    var f = 0
    while (f < nFrames) {
      var c = 0
      var total = 0L
      while (c < cells) {
        val slice = text.substringSQL(f * stride + c * cellw + 1, cellw)
        m.reset()
        val d = m.digest(slice.getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        iv(c) = h % 256
        total += iv(c)
        c += 1
      }
      var ahash = 0L
      var dhash = 0L
      c = 0
      while (c < cells) {
        if (cells * iv(c) > total) ahash |= 1L << c
        if (iv(c) > iv((c + 1) % cells)) dhash |= 1L << c
        c += 1
      }
      rows(f) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](ahash, dhash))
      f += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]").appName("ab-phash")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(r => UTF8String.fromString(r.getString(0)))
    println(s"docs: ${texts.length}")
    val (stride, cells) =
      (multimodal.Multimodal.PhashStride, multimodal.Multimodal.PhashCells)

    def run(fused: Boolean): Double = {
      val t0 = System.nanoTime()
      var i = 0
      var sink = 0
      while (i < texts.length) {
        val a =
          if (fused) phashFramesFused(texts(i), stride, cells)
          else functions.PortableHash.phashFrames(texts(i), stride, cells)
        sink += a.numElements()
        i += 1
      }
      if (sink == -1) println("") // keep the sink live
      (System.nanoTime() - t0) / 1e9
    }

    // warmup both forms, then alternate ABAB
    run(fused = true); run(fused = false)
    val n = 7
    val head = Array.fill(n)(0.0)
    val fused = Array.fill(n)(0.0)
    (0 until n).foreach { i => head(i) = run(fused = false); fused(i) = run(fused = true) }
    def stats(xs: Array[Double]) = {
      val s = xs.sorted
      f"min ${s.head}%.3f med ${s(s.length / 2)}%.3f all ${s.map(x => f"$x%.3f").mkString(",")}"
    }
    println(s"head(packPhash) ${stats(head)}")
    println(s"fused(pre-r14)  ${stats(fused)}")
    spark.stop()
  }
}
