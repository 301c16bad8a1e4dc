package graft.jobs

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the extraction job (north rule: "launched
  * via spark-submit ... on a multi-executor cluster").
  *
  *   spark-submit --class graft.jobs.ExtractMain \
  *     --num-executors 250 --executor-cores 4 --executor-memory 16g \
  *     layoutparserspark.jar \
  *     --pages  <path or catalog table of (url, warc_ts, html, text, lang)> \
  *     --out    <output root: writes <out>/extracted + <out>/metrics> \
  *     --salt   64        # salt buckets; 0 = no payload shuffle \
  *     --run-id <id>      # lineage tag in the metrics table \
  *     --retry-failed true  # re-extract rows committed with failed=true \
  *     --collapse-recrawls true  # multi-crawl input: keep only the
  *                        # latest warc_ts snapshot per canonical url \
  *     --io iceberg       # storage seam: parquet (default) | iceberg \
  *     --scratch <fs dir> # metric-sidecar scratch (required with --io
  *                        # iceberg, where --out is a catalog namespace)
  *
  * `--io iceberg` is pure configuration (SURVEY §7): --out becomes a
  * catalog namespace (`cat.db`), the session must carry the Iceberg
  * runtime jar + `spark.sql.catalog.cat=...` conf, and every read/write
  * the job does goes through the same TableIO calls — resume, retry
  * compaction and the metrics table are identical semantics on either
  * implementation (TableIOSpec pins that).
  *
  * Master/deploy-mode come from spark-submit; the session here only sets
  * job-level SQL conf. Re-running with the same --out resumes: committed
  * urls are anti-joined away before any page is parsed.
  */
object ExtractMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val pages = opts.getOrElse("pages", sys.error("--pages required"))
    val out = opts.getOrElse("out", sys.error("--out required"))
    val salt = opts.get("salt").map(_.toInt).getOrElse(64)
    val runId = opts.getOrElse("run-id", s"run-${java.util.UUID.randomUUID()}")
    val retryFailed = opts.get("retry-failed").exists(_.toBoolean)
    val io: graft.io.TableIO = opts.getOrElse("io", "parquet") match {
      case "parquet" => graft.io.ParquetTableIO
      case "iceberg" => new graft.io.IcebergTableIO()
      case other     => sys.error(s"--io must be parquet|iceberg, got $other")
    }
    val scratch = opts.getOrElse("scratch", "")
    val collapse = opts.get("collapse-recrawls").exists(_.toBoolean)
    // a catalog-addressed io has no filesystem output root to default the
    // metric-sidecar scratch dir to — "cat.db/metrics_raw" is not a path
    if (io.isInstanceOf[graft.io.IcebergTableIO] && scratch.isEmpty)
      sys.error("--scratch <shared fs dir> is required with --io iceberg")

    val spark = SparkSession.builder()
      .appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // extraction is CPU-dense per byte: size reduce partitions for
      // several task waves per core, not for shuffle-block efficiency
      // (parallelism-first coalescing would give exactly one wave)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val total = ExtractionJob.run(spark,
      JobConfig(pages, out, saltBuckets = salt, runId = runId,
        retryFailed = retryFailed, io = io, scratchPath = scratch,
        collapseRecrawls = collapse))
    println(s"""{"run_id":"$runId","committed_docs":$total}""")
    spark.stop()
  }
}
