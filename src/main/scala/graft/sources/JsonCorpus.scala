package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    * ids against reference-positional embeddings). The global window is a
    * one-shuffle numbering; at 100 TB one would precompute per-file offsets
    * (two tiny jobs) — same semantics, documented here as the scale path.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val perFile = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.json")
      .load(dir)
      .select(col("path").as("file"),
        from_json(decode(col("content"), "UTF-8"), ArrayType(schema)).as("arts"))
      .select(col("file"), posexplode(col("arts")).as(Seq("pos", "a")))
      .select(col("file"), col("pos"), col("a.title").as("title"),
        col("a.text").as("text"))
    val global = Window.orderBy(col("file"), col("pos"))
    perFile
      .withColumn("id", row_number().over(global).cast(LongType) - 1)
      .select(col("id"), col("file"), col("title"), col("text"))
  }
}
