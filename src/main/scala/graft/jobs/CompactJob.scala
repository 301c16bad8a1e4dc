package graft.jobs

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction — the table-maintenance pass a 10^12-row corpus
  * needs between ingest batches (the plain-parquet analogue of Iceberg's
  * `rewrite_data_files`): resumable nightly appends each commit their own
  * task files, so a year of batches leaves the extracted table as millions
  * of small files whose per-file open/footer cost starts to dominate scans.
  *
  * Rows are bin-packed into ~`targetFileBytes` files by RANGE-partitioning
  * on `url` rather than a round-robin repartition: the rewritten files
  * then carry tight url min/max footer stats, so the resume anti-join's
  * scan of committed urls — and any url-keyed lookup — can skip whole
  * files instead of reading everything (round-robin would give every file
  * the full url range and zero skipping). The range exchange samples keys
  * and is skew-balanced by construction; cost is the one full pass any
  * rewrite pays.
  *
  * Operates on ONE directory (a table or a single partition dir — callers
  * iterate partition dirs so each keeps its directory pruning). Returns a
  * one-row (files_before, files_after, rows) reconciliation frame.
  */
object CompactJob {

  def run(spark: SparkSession, tablePath: String, outPath: String,
          targetFileBytes: Long = 128L << 20): DataFrame = {
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
    // layouts still read recursively via spark.read.parquet)
    var bytes = 0L
    var filesBefore = 0L
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet")) { bytes += s.getLen; filesBefore += 1 }
    }
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt

    val df = spark.read.parquet(tablePath)
    df.repartitionByRange(nFiles, col("url"))
      .write.mode(SaveMode.Overwrite).parquet(outPath)

    val out = new org.apache.hadoop.fs.Path(outPath)
    val filesAfter = fs.listStatus(out)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet")).toLong
    val rows = spark.read.parquet(outPath).count()
    Seq((filesBefore, filesAfter, rows))
      .toDF("files_before", "files_after", "rows")
  }
}
