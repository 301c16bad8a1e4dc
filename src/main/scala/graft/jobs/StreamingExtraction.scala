package graft.jobs

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.extract.{Extracted, Extractor}

/** Structured-Streaming surface for the same per-page transform.
  *
  * The reference is strictly batch (SURVEY.md §2.8) and so is the north
  * rule; this wrapper exists to make the "drops into streaming unchanged"
  * claim concrete: a parquet file-source stream over incoming page files →
  * the identical typed extraction → parquet sink with checkpointed
  * exactly-once file commits. No watermarks or state are needed — the
  * transform is stateless per row, so end-to-end exactly-once comes from
  * the source's file tracking + the sink's commit log.
  */
object StreamingExtraction {

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
