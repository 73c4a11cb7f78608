package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw little-endian float32 vector ingest — the reference's `.bin` format
  * (`convert_npy_bin.py:6-10` writes `numpy.tofile`; `IVF.cpp:456-486,650-672`
  * reads with a file-size ÷ (4·dim) row-count inference and a divisibility
  * sanity check at `IVF.cpp:473-476`). Ingest-only: engine-native storage is
  * Parquet (SURVEY §1.3 A3) — this reader exists to load the reference's own
  * query fixtures and to migrate `.bin` corpora into the engine.
  */
object BinaryVectors {

  /** Decode one `.bin` payload into dim-length float vectors.
    * Mirrors the reference's divisibility check (`IVF.cpp:473-476`). */
  def decode(bytes: Array[Byte], dim: Int): Array[Array[Float]] = {
    require(bytes.length % (4 * dim) == 0,
      s"binary vector file size ${bytes.length} not divisible by 4*dim=$dim")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val rows = bytes.length / (4 * dim)
    Array.tabulate(rows) { _ =>
      val v = new Array[Float](dim)
      var i = 0
      while (i < dim) { v(i) = buf.getFloat(); i += 1 }
      v
    }
  }

  /** Driver-side single-file read (query vectors are tiny: one row). */
  def readFile(path: String, dim: Int): Array[Array[Float]] =
    decode(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), dim)

  /** Distributed ingest of a directory of `.bin` files into
    * `(file STRING, row_in_file INT, embedding ARRAY<FLOAT>)` via Spark's
    * `binaryFile` source — each file decodes independently (parallel by file);
    * persist as Parquet immediately after ingest for scan efficiency.
    */
  def readDir(spark: SparkSession, dir: String, dim: Int): DataFrame = {
    import spark.implicits._
    val decodeUdf = udf((bytes: Array[Byte]) => decode(bytes, dim).map(_.toSeq))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.bin")
      .load(dir)
      .select(col("path").as("file"), decodeUdf(col("content")).as("vecs"))
      .select(col("file"), posexplode(col("vecs")).as(Seq("row_in_file", "embedding")))
      .select(col("file"), col("row_in_file"),
        col("embedding").cast("array<float>").as("embedding"))
  }
}
