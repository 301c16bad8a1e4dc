package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}
import graft.extract.{Extracted, Extractor}

/** Running per-host crawl-progress state (mapGroupsWithState). */
final case class HostState(docs: Long, bytes: Long)
final case class HostProgress(host: String, docs: Long, bytes: Long)

/** Structured-Streaming surface for the same per-page transform.
  *
  * The reference is strictly batch (SURVEY.md §2.8) and so is the north
  * rule; this wrapper exists to make the "drops into streaming unchanged"
  * claim concrete: a parquet file-source stream over incoming page files →
  * the identical typed extraction → parquet sink with checkpointed
  * exactly-once file commits. The extraction itself is stateless per row,
  * so end-to-end exactly-once comes from the source's file tracking + the
  * sink's commit log. The two stateful companions cover the streaming
  * operator checklist: [[windowedLangMetrics]] (event-time window +
  * watermark over warc_ts) and [[hostProgress]] (custom keyed state via
  * `mapGroupsWithState` — the streaming analogue of the batch job's
  * per-partition lineage counters).
  */
object StreamingExtraction {

  /** Event-time windowed ingest metrics: docs + html bytes per
    * (warc_ts window, lang), late data bounded by the watermark. The
    * streaming analogue of the batch `x4_lang_metrics` query. */
  def windowedLangMetrics(pages: DataFrame, watermark: String = "2 hours",
                          win: String = "1 hour"): DataFrame =
    pages
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), win), col("lang"))
      .agg(count(lit(1)).as("docs"),
        sum(octet_length(col("html"))).as("html_bytes"))

  /** Custom keyed state: running per-crawl-host doc/byte totals, updated
    * each micro-batch (`mapGroupsWithState`, update mode). */
  def hostProgress(spark: SparkSession, pages: DataFrame): Dataset[HostProgress] = {
    import spark.implicits._
    pages
      .select(regexp_extract(col("url"), "//([^/]+)/", 1).as("host"),
        octet_length(col("html")).cast("long").as("b"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[HostState, HostProgress](GroupStateTimeout.NoTimeout) {
        (host, rows, state) =>
          var d = 0L
          var b = 0L
          rows.foreach { case (_, x) => d += 1; b += x }
          val prev = state.getOption.getOrElse(HostState(0L, 0L))
          val next = HostState(prev.docs + d, prev.bytes + b)
          state.update(next)
          HostProgress(host, next.docs, next.bytes)
      }
  }

  /** Streaming exact dedup: first-seen wins per content hash, with the
    * state store bounded by the event-time watermark — the streaming
    * analogue of the batch `t3_dedup_exact` groupBy (a crawl ingest
    * pipeline's dedup stage). `dropDuplicatesWithinWatermark` expires
    * per-key state once the key's event time passes the watermark, so
    * at 10^12 docs the state holds only the watermark window, not the
    * corpus. */
  def dedupedPages(pages: DataFrame, watermark: String = "2 hours"): DataFrame =
    pages
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  def extractedStream(spark: SparkSession, pagesDir: String,
                      pagesSchemaFrom: String): Dataset[Extracted] = {
    import spark.implicits._
    val schema = spark.read.parquet(pagesSchemaFrom).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 8) // bounded micro-batches
      .parquet(pagesDir)
      .select("url", "html")
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (u, h) => Extractor.extract(u, h) })
  }

  /** Start the stream; caller awaits/stops. */
  def start(spark: SparkSession, pagesDir: String, outPath: String,
            schemaFrom: String): StreamingQuery =
    extractedStream(spark, pagesDir, schemaFrom).writeStream
      .format("parquet")
      .option("path", s"$outPath/extracted")
      .option("checkpointLocation", s"$outPath/checkpoint")
      .trigger(Trigger.AvailableNow())
      .start()
}
