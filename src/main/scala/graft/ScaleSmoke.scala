package graft

import org.apache.spark.sql.SparkSession
import graft.jobs.{ExtractionJob, JobConfig, TierJob}
import graft.pages.PagesTable

/** Order-of-magnitude scale smoke: run the full lifecycle — page scan →
  * extraction job (lineage + metrics + resume layout) → tier curation
  * pass — at an SF well above the bench scale, on the full host width,
  * and report sustained throughput per phase. The point is not a band
  * number (single rep, host heats as it runs) but the 10×-the-bench
  * robustness evidence: no memory growth, no straggler collapse, no
  * small-file blowup, throughput within the known docs/s band while the
  * host lasts.
  *
  * Usage: runMain graft.ScaleSmoke [sfName] [cpus] [mode] [saltBuckets]
  *   default: sf1 32 extract+tier 64
  *   prints one JSON line with per-phase seconds and docs/s.
  *
  * `saltBuckets 0` disables the extraction job's salted repartition —
  * the full-html-payload shuffle (at sf3 that shuffle alone is ~36 GB
  * of scratch, which this single-disk sandbox cannot hold next to the
  * outputs; the 100 TB design default is salt OFF for byte-balanced
  * layouts anyway, see ExtractionJob.planWorkSet). Use it when the
  * phase under test is the TIER pass and extraction is just corpus
  * materialisation.
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf1")
    val cpus = args.lift(1).getOrElse("32")
    val mode = args.lift(2).getOrElse("extract+tier")
    val saltBuckets = args.lift(3).map(_.toInt).getOrElse(64)

    val tmpfsBase = sys.env.get("SPARK_GRAFT_TMPFS")
    val scratch = tmpfsBase.map { b =>
      val d = new java.io.File(b, "graft-smoke"); d.mkdirs(); d.getAbsolutePath
    }
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    scratch.foreach(dir => builder.config("spark.local.dir", s"$dir/sparklocal"))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val nDocs = PagesTable.rowsFor(sfName)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    out += "sf" -> s""""$sfName""""
    out += "docs" -> nDocs.toString
    out += "cpus" -> cpus

    val (pagesPath, genSec) = time { PagesTable.ensure(spark, sfName) }
    out += "gen_sec" -> f"$genSec%.1f"

    val workRoot = scratch.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_smoke").toString)
    val outPath = s"$workRoot/job"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outPath))

    val (_, extractSec) = time {
      ExtractionJob.run(spark, JobConfig(pagesPath, outPath, runId = "smoke",
        saltBuckets = saltBuckets))
    }
    out += "salt_buckets" -> saltBuckets.toString
    out += "extract_sec" -> f"$extractSec%.1f"
    out += "extract_docs_per_sec" -> f"${nDocs / extractSec}%.1f"

    // heap after a full pass: stability evidence, not a benchmark number
    val rt = Runtime.getRuntime
    System.gc()
    out += "heap_used_mb" -> ((rt.totalMemory - rt.freeMemory) / (1024 * 1024)).toString

    if (mode.contains("tier")) {
      val (tierCounts, tierSec) = time {
        TierJob.run(spark, s"$outPath/extracted", outPath).collect()
      }
      out += "tier_sec" -> f"$tierSec%.1f"
      out += "tier_docs_per_sec" -> f"${nDocs / tierSec}%.1f"
      out += "tiers" -> tierCounts.sortBy(_.getInt(0))
        .map(r => s""""${r.getInt(0)}":${r.getLong(1)}""").mkString("{", ",", "}")
    }

    if (mode.contains("graph")) {
      // the iterative web-graph job at 10× the bench SF: edge projection
      // + 3-iteration integer PageRank; edge/node counts reconcile the
      // run (and a 10×-linear edge count confirms no generator drift)
      val (nNodes, graphSec) = time {
        val pr = graft.graph.GraphOps.pagerank(spark,
          graft.graph.GraphOps.edges(spark.read.parquet(pagesPath)))
        pr.count()
      }
      out += "graph_sec" -> f"$graphSec%.1f"
      out += "graph_docs_per_sec" -> f"${nDocs / graphSec}%.1f"
      out += "graph_nodes" -> nNodes.toString
      spark.catalog.clearCache()
    }

    if (mode.contains("lpa")) {
      // round-final graph addition at 10× the bench SF: 2 synchronous
      // LPA rounds over the host graph (edge parse + per-round
      // aggregate chain); host count reconciles the run
      val (nHosts, lpaSec) = time {
        graft.graph.GraphOps.lpaCommunities(spark,
          graft.graph.GraphOps.edges(spark.read.parquet(pagesPath))).count()
      }
      out += "lpa_sec" -> f"$lpaSec%.1f"
      out += "lpa_docs_per_sec" -> f"${nDocs / lpaSec}%.1f"
      out += "lpa_hosts" -> nHosts.toString
      spark.catalog.clearCache()
    }

    // output-file hygiene at scale: the extracted table must not be a
    // small-file blowup (one file per task wave is fine, thousands are not)
    val extractedFiles = {
      val d = new java.io.File(s"$outPath/extracted")
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      if (d.exists) walk(d) else -1L
    }
    out += "extracted_parquet_files" -> extractedFiles.toString

    println(out.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(workRoot))
    spark.stop()
  }
}
