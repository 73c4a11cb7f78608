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

  /** Parse a NumPy `.npy` v1/v2 payload of little-endian float32 C-order data —
    * the pre-`convert_npy_bin.py` half of the reference's format pair
    * (`convert_npy_bin.py:6-10` flattens exactly this into `.bin`). Header
    * layout per the NumPy format spec: magic `\\x93NUMPY`, version, LE header
    * length (2 bytes v1 / 4 bytes v2), then an ASCII dict literal with
    * `descr`/`fortran_order`/`shape`. Returns (vectors, dim) with dim taken
    * from the trailing shape axis, delegating the data bytes to [[decode]]. */
  def decodeNpy(bytes: Array[Byte]): (Array[Array[Float]], Int) = {
    val magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')
    require(bytes.length > 10 && bytes.take(6).sameElements(magic), "not an .npy file")
    val major = bytes(6)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerOff) =
      if (major == 1) (buf.getShort(8).toInt & 0xffff, 10)
      else (buf.getInt(8), 12)
    val header = new String(bytes, headerOff, headerLen, "ASCII")
    require(header.contains("'descr': '<f4'"),
      s"unsupported npy dtype (need little-endian float32): $header")
    require(header.contains("'fortran_order': False"),
      s"unsupported npy order (need C order): $header")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt))
      .getOrElse(throw new IllegalArgumentException(s"npy header has no shape: $header"))
    val dim = shape.last
    val data = java.util.Arrays.copyOfRange(bytes, headerOff + headerLen, bytes.length)
    (decode(data, dim), dim)
  }

  /** Driver-side `.npy` single-file read; `query1.npy` ≡ `query1.bin`. */
  def readNpyFile(path: String): (Array[Array[Float]], Int) =
    decodeNpy(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

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
