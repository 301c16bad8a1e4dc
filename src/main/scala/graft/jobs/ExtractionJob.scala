package graft.jobs

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.TaskContext
import graft.extract.{Extracted, Extractor}

/** Per-partition lineage row — the metrics table of the north rule
  * (docs parsed, bytes tokenized, extraction failures), replacing the
  * reference's stats counters and `logtime` prints
  * (reference: server/modules/main/helper.py:14-15,313-318). */
final case class PartitionMetrics(
    run_id: String,
    partition_id: Int,
    docs_parsed: Long,
    bytes_tokenized: Long,
    extraction_failures: Long,
    wall_ms: Long)

final case class JobConfig(
    pagesPath: String,
    outPath: String,
    saltBuckets: Int = 64,
    runId: String = "run")

/** The distributed extraction job (SURVEY.md §4 physical plan):
  *
  *   scan pages [url, html]  (columns pruned at the parquet reader)
  *   → LEFT ANTI join committed urls          (resume from checkpoint)
  *   → salted repartition on (html-size bucket, salt)   (skew spreading)
  *   → mapPartitions extractPage              (the per-page operator DAG)
  *   → append extracted + append metrics
  *
  * Scale notes: the anti-join's right side is url-only (Catalyst prunes),
  * so at 10^12 rows it is a shuffled SMJ unless the committed set is small
  * enough for AQE to broadcast. The size bucket is log2(len(html)) —
  * pages of similar cost co-hash, and the salt spreads each bucket over
  * the full partition space so a handful of 100 MB pages cannot pile onto
  * one task. AQE stays on for runtime coalescing.
  */
object ExtractionJob {

  /** Urls already committed to the extracted table, or None on first run. */
  def committedUrls(spark: SparkSession, cfg: JobConfig): Option[DataFrame] = {
    val dir = new java.io.File(s"${cfg.outPath}/extracted")
    if (dir.exists() && dir.listFiles() != null && dir.listFiles().exists(_.getName.endsWith(".parquet")))
      Some(spark.read.parquet(s"${cfg.outPath}/extracted").select("url"))
    else None
  }

  /** The work set: pages minus committed (resume anti-join), salted. */
  def planWorkSet(spark: SparkSession, cfg: JobConfig): DataFrame = {
    val pages = spark.read.parquet(cfg.pagesPath).select("url", "html")
    val remaining = committedUrls(spark, cfg) match {
      case Some(committed) => pages.join(committed, Seq("url"), "left_anti")
      case None            => pages
    }
    // explicit skew spreading: bucket by log2 html size, salt by url hash
    remaining
      .withColumn("size_bucket",
        ceil(log2(greatest(length(col("html")), lit(1)))).cast("int"))
      .withColumn("salt", pmod(hash(col("url")), lit(cfg.saltBuckets)))
      .repartition(col("size_bucket"), col("salt"))
      .select("url", "html")
  }

  /** Run extraction; returns the extracted Dataset (not yet written). */
  def extractDataset(spark: SparkSession, work: DataFrame, cfg: JobConfig): Dataset[Extracted] = {
    import spark.implicits._
    work.as[(String, Array[Byte])].mapPartitions { it =>
      it.map { case (url, html) =>
        try Extractor.extract(url, html)
        catch {
          case scala.util.control.NonFatal(_) =>
            Extracted(url, "", Array.empty, Array.empty) // failure marker: empty text
        }
      }
    }
  }

  /** Full job: extract → append extracted parquet + append metrics rows.
    * Metrics are gathered inside the same pass (one small row per task,
    * written as JSON from the task — an append-only lineage table that an
    * Iceberg deployment would append to a metrics table instead). */
  def run(spark: SparkSession, cfg: JobConfig): Long = {
    import spark.implicits._
    val work = planWorkSet(spark, cfg)
    val metricsDir = new java.io.File(s"${cfg.outPath}/metrics")
    metricsDir.mkdirs()
    val metricsPath = metricsDir.getAbsolutePath
    val runId = cfg.runId

    val extracted: Dataset[Extracted] =
      work.as[(String, Array[Byte])].mapPartitions { it =>
        val t0 = System.nanoTime()
        var docs = 0L
        var bytes = 0L
        var failures = 0L
        val pid = TaskContext.getPartitionId()
        val out = it.map { case (url, html) =>
          docs += 1
          bytes += html.length
          try Extractor.extract(url, html)
          catch {
            case scala.util.control.NonFatal(_) =>
              failures += 1
              Extracted(url, "", Array.empty, Array.empty)
          }
        }
        // wrap so metrics flush after the partition is fully consumed
        new Iterator[Extracted] {
          def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) flush()
            h
          }
          def next(): Extracted = out.next()
          private var flushed = false
          private def flush(): Unit = if (!flushed) {
            flushed = true
            val wallMs = (System.nanoTime() - t0) / 1000000
            val json =
              s"""{"run_id":"$runId","partition_id":$pid,"docs_parsed":$docs,""" +
              s""""bytes_tokenized":$bytes,"extraction_failures":$failures,"wall_ms":$wallMs}"""
            val f = new java.io.File(metricsPath, s"metrics-$runId-$pid.json")
            val w = new java.io.FileWriter(f)
            try w.write(json + "\n") finally w.close()
          }
        }
      }

    extracted.write.mode(SaveMode.Append).parquet(s"${cfg.outPath}/extracted")
    spark.read.parquet(s"${cfg.outPath}/extracted").count()
  }

  /** Read the lineage rows back as a typed Dataset. */
  def readMetrics(spark: SparkSession, cfg: JobConfig): Dataset[PartitionMetrics] = {
    import spark.implicits._
    spark.read.json(s"${cfg.outPath}/metrics").selectExpr(
      "run_id", "cast(partition_id as int) partition_id", "docs_parsed",
      "bytes_tokenized", "extraction_failures", "wall_ms"
    ).as[PartitionMetrics]
  }
}
