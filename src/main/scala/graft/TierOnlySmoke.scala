package graft

import org.apache.spark.sql.SparkSession
import graft.jobs.TierJob

/** Tier-pass-only smoke over an ALREADY-MATERIALISED extracted table —
  * the salvage path for big-SF runs on this single-disk sandbox, where
  * running extraction and tier inside one session leaves the tier phase
  * racing the leftover scratch of the phases before it (the sf3
  * [[ScaleSmoke]] attempt died on exactly that: a transient
  * shuffle+partitioned-write peak over the one shared spindle — a
  * sandbox storage artifact, not an engine property; a real cluster
  * gives every executor its own disks, see BASELINE.md host
  * calibration #1).
  *
  * Differences from the [[ScaleSmoke]] tier phase, both storage-side
  * only: shuffle compression is zstd (≈35% smaller scratch than the
  * default lz4 at ~equal CPU for this payload) and nothing else shares
  * the session. The timed work — corpus tier rules + tier-partitioned
  * rewrite through [[TierJob.run]] — is identical.
  *
  * Usage: runMain graft.TierOnlySmoke <extractedPath> <outPath> [cpus]
  */
object TierOnlySmoke {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TierOnlySmoke <extractedPath> <outPath> [cpus]")
    val extractedPath = args(0)
    val outPath = args(1)
    val cpus = args.lift(2).getOrElse("32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nDocs = spark.read.parquet(extractedPath).count()
    val t0 = System.nanoTime()
    val tierCounts = TierJob.run(spark, extractedPath, outPath).collect()
    val tierSec = (System.nanoTime() - t0) / 1e9
    spark.catalog.clearCache()
    Thread.sleep(2000)
    val rt = Runtime.getRuntime
    System.gc()
    val heapMb = (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
    val tiers = tierCounts.sortBy(_.getInt(0))
      .map(r => s""""${r.getInt(0)}":${r.getLong(1)}""").mkString("{", ",", "}")
    println(s"""{"docs":$nDocs,"cpus":$cpus,"tier_sec":${f"$tierSec%.1f"},""" +
      s""""tier_docs_per_sec":${f"${nDocs / tierSec}%.1f"},"tiers":$tiers,""" +
      s""""heap_used_mb":$heapMb,"shuffle_codec":"zstd"}""")
    spark.stop()
  }
}
