package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Structured Streaming surface (SURVEY §2 Table B "Streaming": absent in the
  * reference — strictly batch, one query per process (`IVF.cpp:650,684`) — and
  * added here as the engine extension SURVEY §7 step 7 describes: continuous
  * feeds are Structured Streaming, never DStreams).
  *
  * Two canonical pipelines over the events schema:
  *  - watermarked tumbling-window counts (late data dropped past the watermark)
  *  - stream-static join: a stream of query events scored/enriched against a
  *    static dimension (the streaming analog of the reference's online search
  *    against a static index).
  *
  * At scale: each micro-batch is an incremental shuffle keyed by
  * (window, event_type); state store size is bounded by the watermark horizon,
  * so a 1000-executor cluster holds hours — not history — in state.
  */
object EventStreams {

  /** Events schema as read from a stream source (ts already in microseconds /
    * TimestampType; a parquet-ns feed would convert at ingest). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Watermarked tumbling-window aggregate: 1h windows, 30min allowed lateness.
    * Output: (window_start, event_type, n_events, sum_value). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stream-static enrichment join: incoming events joined to a static user
    * dimension (broadcast when small). Streaming analog of the reference's
    * query-against-static-index pattern. */
  def enrich(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** Micro-batch ANN serving: a stream of query vectors scored against a
    * static embedding table, per-query top-k via foreachBatch (global
    * sort+limit isn't expressible inside an append stream; per-batch
    * evaluation is the streaming analog of the reference's one-query-per-
    * process loop, IVF.cpp:650,684). Each batch: broadcast the (small) query
    * batch, one pass over the static side, per-query bounded top-k via window
    * rank — no state store, restart-safe.
    */
  def scoreQueryStream(
      queryStream: DataFrame, // (query_id LONG, embedding ARRAY<FLOAT>)
      staticVectors: DataFrame, // (vec_id, label, embedding)
      k: Int)(sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    queryStream.writeStream
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(graft.operators.KnnBatch.topK(staticVectors, batch, k))
      }
      .start()

  /** Run a streaming DataFrame to completion against a bounded source via the
    * memory sink; returns the collected result. Test/smoke helper — production
    * sinks are writeStream.format("parquet"/"kafka"). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append): Array[Row] = {
    val q = stream.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name).collect()
  }
}
