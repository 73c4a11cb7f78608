package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON article-corpus scan — the reference reads a directory of JSON files,
  * each a JSON ARRAY of article objects with a `"text"` field, in sorted
  * filename order (`embedding.py:26-31`; `IVF.cpp:84-118`), and derives the
  * global article id from the concatenated row order (`embedding.py:34`).
  *
  * Spark design (SURVEY §1.3): multiLine JSON scan with an EXPLICIT schema (no
  * inference job at 100 TB), plus deterministic id minting — the reference's
  * implicit positional id becomes an explicit column derived from
  * (filename, position-in-file), which is stable under any partitioning.
  */
object JsonCorpus {

  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("text", StringType, nullable = false)))

  /** Read a corpus dir → `(id BIGINT, file STRING, title STRING, text STRING)`.
    * Ids are dense and ordered by (file name, POSITION in file) — exactly the
    * reference's `file_lengths.json` ordering contract (`embedding.py:37-38`),
    * but carried as data. Array position is preserved by parsing each file's
    * JSON array with `from_json` + `posexplode` (the DataFrame JSON reader
    * does not expose element order, so a text-based ordering would misalign
    * ids against reference-positional embeddings).
    *
    * Id minting is the scale-safe two-job formulation (NOT a global
    * no-partition window, which single-partition-sorts the whole corpus):
    * job 1 computes per-file row counts — one output row per FILE, the
    * in-engine `file_lengths.json` — the driver prefix-sums them in file-name
    * order into start offsets, and the main scan broadcast-joins the offsets
    * and mints `id = offset + pos` per row. Both jobs are the same
    * embarrassingly-parallel per-file parse; nothing global ever shuffles.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val perFile = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(dir)
      .select(col("path").as("file"),
        from_json(decode(col("content"), "UTF-8"), ArrayType(schema)).as("arts"))
      .select(col("file"), posexplode(col("arts")).as(Seq("pos", "a")))
      .select(col("file"), col("pos"), col("a.title").as("title"),
        col("a.text").as("text"))
    // job 1: per-file counts. Driver holds |files| (path, count) tuples: at
    // 100 TB with ~100 MB files that is ~1M rows / ~100 MB — inside driver
    // budget; a corpus of BILLIONS of tiny files would instead keep the
    // prefix sum distributed (window over the counts table — |files| rows,
    // never the corpus) and swap the broadcast for a shuffle join.
    // sort file names by UTF-8 BYTE order (what Spark's UTF8String ordering
    // and the reference's python sorted() over bytes-ish names produce) —
    // Java String.compareTo orders by UTF-16 code units, which diverges for
    // supplementary-plane characters in file names
    val utf8Order: Ordering[String] = (a: String, b: String) => {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n && x(i) == y(i)) i += 1
      if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
    }
    val counts = perFile.groupBy(col("file")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)(utf8Order)
    var running = 0L
    val offsets = counts.map { case (f, n) =>
      val o = running; running += n; (f, o)
    }.toSeq
    val offsetsDf = offsets.toDF("file", "offset")
    perFile
      .join(broadcast(offsetsDf), Seq("file"))
      .withColumn("id", (col("offset") + col("pos")).cast(LongType))
      .select(col("id"), col("file"), col("title"), col("text"))
  }
}
