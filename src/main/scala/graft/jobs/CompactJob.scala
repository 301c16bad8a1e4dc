package graft.jobs

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.ParquetTableIO

/** Small-file compaction — the table-maintenance pass a 10^12-row corpus
  * needs between ingest batches (the plain-parquet implementation of what
  * Iceberg ships as the `rewrite_data_files` procedure — under an
  * IcebergTableIO deployment this job is replaced by that one stored-
  * procedure call, which is why it deliberately stays parquet-addressed):
  * resumable nightly appends each commit their own task files, so a year
  * of batches leaves the extracted table as millions of small files whose
  * per-file open/footer cost starts to dominate scans.
  *
  * Rows are bin-packed into ~`targetFileBytes` files by RANGE-partitioning
  * on `url` rather than a round-robin repartition: the rewritten files
  * then carry tight url min/max footer stats, so the resume anti-join's
  * scan of committed urls — and any url-keyed lookup — can skip whole
  * files instead of reading everything (round-robin would give every file
  * the full url range and zero skipping). The range exchange samples keys
  * and balances ROWS, not bytes — with a heavy-tailed row-width
  * distribution (this corpus: ~2% of pages carry 10–40× the html bytes)
  * individual output files can overshoot `targetFileBytes` by roughly the
  * ratio of a range's mean row width to the table's; that bounds footer
  * cost all the same (file COUNT is what compaction fixes) and keeps the
  * one-pass shape — byte-exact packing would need a second width-aware
  * pass that costs more than it saves.
  *
  * The reconciliation row count comes from an `observe` aggregate ON the
  * rewrite pass itself (zero extra IO — the metric rides the write job);
  * `verifyRescan = true` additionally re-reads the rewritten table and
  * counts it independently — a real second full pass, wanted only when
  * auditing the writer itself rather than the job (at 10^12 rows that
  * rescan can cost as much as the rewrite).
  *
  * [[run]] operates on ONE directory (a flat table or a single partition
  * dir); [[runPartitioned]] drives the per-partition loop over a
  * `col=value`-partitioned root. Returns a one-row (files_before,
  * files_after, rows) reconciliation frame per compacted directory.
  */
object CompactJob {

  def run(spark: SparkSession, tablePath: String, outPath: String,
          targetFileBytes: Long = 128L << 20,
          verifyRescan: Boolean = false): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a partitioned table must be compacted per partition DIR — reading
    // the root would flatten the partition column into data and rewrite
    // away the directory pruning; refuse instead of silently doing that
    val entries = fs.listStatus(root)
    val partDirs = entries.filter(s => s.isDirectory && s.getPath.getName.contains("="))
    require(partDirs.isEmpty,
      s"$tablePath is partitioned (${partDirs.map(_.getPath.getName).mkString(", ")}); " +
        "compact each partition directory individually")
    // size the rewrite from a RECURSIVE listing (nested non-partition
    // layouts still read recursively via the parquet read)
    var bytes = 0L
    var filesBefore = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet")) { bytes += s.getLen; filesBefore += 1 }
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt

    // the row count observes the rewrite ABOVE the range exchange: the
    // range partitioner's sampling pass re-executes the plan BELOW the
    // exchange, so a metric attached under it would double-count
    val obs = Observation()
    val toWrite = ParquetTableIO.read(spark, tablePath)
      .repartitionByRange(nFiles, col("url"))
      .observe(obs, count(lit(1)).as("rows"))
    ParquetTableIO.overwrite(toWrite, outPath)

    val out = new org.apache.hadoop.fs.Path(outPath)
    val filesAfter = fs.listStatus(out)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
    val observedRows = obs.get("rows").asInstanceOf[Long]
    val rows =
      if (!verifyRescan) observedRows
      else {
        val rescanned = ParquetTableIO.read(spark, outPath).count()
        require(rescanned == observedRows,
          s"compaction wrote $observedRows rows but the rescan reads " +
            s"$rescanned — writer/reader disagreement")
        rescanned
      }
    Seq((filesBefore, filesAfter, rows))
      .toDF("files_before", "files_after", "rows")
  }

  /** Partitioned-table driver: iterate the `col=value` partition dirs of
    * `tablePath` and compact each INTO the matching partition dir of
    * `outPath` — the loop callers previously hand-rolled. Each partition
    * compacts independently (its own size-based file count, its own
    * observe-counted reconciliation row), and the output keeps the
    * `col=value` directory layout, so partition pruning on the compacted
    * table is exactly what it was. In-place compaction (outPath ==
    * tablePath under a tmp-swap) is deliberately NOT offered on plain
    * parquet — non-transactional swaps of a live table are what
    * [[graft.io.TableIO.replacePartition]] exists for; under Iceberg this
    * whole job is the `rewrite_data_files` procedure anyway.
    *
    * Returns one reconciliation row PER partition:
    * (partition, files_before, files_after, rows). Refuses a FLAT table
    * (use [[run]]) and mixed layouts. */
  def runPartitioned(spark: SparkSession, tablePath: String, outPath: String,
                     targetFileBytes: Long = 128L << 20,
                     verifyRescan: Boolean = false): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(root)
    val partDirs = entries.filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath.getName).sorted
    require(partDirs.nonEmpty,
      s"$tablePath has no col=value partition dirs; use CompactJob.run for flat tables")
    val strays = entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(strays.isEmpty,
      s"$tablePath mixes top-level part files with partition dirs " +
        s"(${strays.take(3).map(_.getPath.getName).mkString(", ")}); migrate first")
    val perPart = partDirs.map { dir =>
      run(spark, s"$tablePath/$dir", s"$outPath/$dir", targetFileBytes, verifyRescan)
        .withColumn("partition", lit(dir))
        .select("partition", "files_before", "files_after", "rows")
    }
    perPart.reduce(_.unionByName(_))
  }
}
