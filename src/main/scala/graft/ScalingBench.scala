package graft

import org.apache.spark.sql.SparkSession
import graft.jobs.{ExtractionJob, JobConfig}
import graft.pages.PagesTable

/** Scaling-efficiency harness (BASELINE.md protocol): runs the SAME
  * extraction job on the SAME input at several local[N] parallelism
  * levels inside ONE JVM, alternating levels across repetitions so JIT
  * state and host noise affect all levels equally; reports the best run
  * per level and the N→4N efficiency.
  *
  * Usage: runMain graft.ScalingBench [sfName] [levels,...] [reps] [mode]
  *   default: sf0.1  4,16,8,32  2  extract
  *   mode `tier`: measures the [[graft.jobs.TierJob]] curation pass
  *   instead — the extracted corpus is materialised ONCE (untimed) and
  *   shared read-only by every level, so each timed run is exactly the
  *   tier rules + tier-partitioned rewrite.
  *   mode `graph`: measures the iterative web-graph job — outlink edge
  *   projection + 3-iteration integer PageRank
  *   ([[graft.graph.GraphOps.pagerank]]) over the shared pages table;
  *   per-iteration cost is one keyed shuffle of the narrow edge list,
  *   so this is the shuffle-bound-iteration workload class.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val sfName = args.headOption.getOrElse("sf0.1")
    val levels = args.lift(1).getOrElse("4,16,8,32").split(",").map(_.trim.toInt).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val mode = args.lift(3).getOrElse("extract")

    // Sandbox I/O analogue: this host has ONE shared disk, a real N-vs-4N
    // comparison gives every executor its own disks/NIC. Putting shuffle
    // spill + job output on tmpfs (SPARK_GRAFT_TMPFS=/dev/shm) removes the
    // shared-spindle artifact so the measurement reflects compute scaling,
    // which is what survives on a real cluster. Documented in BASELINE.md.
    val tmpfsBase = sys.env.get("SPARK_GRAFT_TMPFS")
    val scratch = tmpfsBase.map { b =>
      val d = new java.io.File(b, "graft-scaling"); d.mkdirs(); d.getAbsolutePath
    }

    def session(cpus: Int): SparkSession = {
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
      scratch.foreach(dir => b.config("spark.local.dir", s"$dir/sparklocal"))
      val s = b
        // several task waves per core at every level: scheduling then packs
        // around stragglers instead of being gated by the slowest task of a
        // single wave (which measures skew, not throughput)
        .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16))
        .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
        // CPU-dense reduce stages need multiple task waves per core; AQE's
        // parallelism-first coalescing would hand every level exactly one
        // wave (tasks = cores), gating each stage on its slowest task.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (4 * 1024 * 1024).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    // materialise pages once; in tier mode also the extracted corpus the
    // tier pass reads (untimed — the measurement is the curation stage)
    val boot = session(8)
    val pagesPath = PagesTable.ensure(boot, sfName)
    val nDocs = PagesTable.rowsFor(sfName)
    val extractedRoot: Option[String] =
      if (mode == "tier") {
        val base = scratch.getOrElse(
          java.nio.file.Files.createTempDirectory("scaletier").toString)
        // per-sfName dir, wiped first: a leftover corpus from a previous
        // invocation would be resumed onto (union corpus), silently
        // inflating every timed tier pass against this run's nDocs
        val out = new java.io.File(base, s"tier-input-$sfName")
        def rm0(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm0)
          f.delete()
        }
        rm0(out); out.mkdirs()
        ExtractionJob.run(boot,
          JobConfig(pagesPath, out.getAbsolutePath, runId = "tierinput"))
        Some(s"${out.getAbsolutePath}/extracted")
      } else None
    boot.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    val best = scala.collection.mutable.Map.empty[Int, Double]
    val all = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }

    // Per-LEVEL session blocks: one SparkSession per level runs an untimed
    // full-size warmup job, then `reps` timed jobs. Measured (r2): a fresh
    // session pays codegen-class + JIT warm-up that a narrow level hides in
    // its long wall time but costs the wide level ~40% of its first run
    // (local[16] measured 3.6k → 6.9k docs/s across per-session reps, vs a
    // steady 7.9-8.0k when one session runs the job repeatedly). Steady
    // state is what a long-running 100 TB job sees, so that is what each
    // level must report. Blocks still alternate (two passes over the level
    // list) so slow host drift affects all levels symmetrically.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    // per-level-block host probe: every block's numbers carry the host
    // state they ran under (the bench's attribution idiom — a low-reading
    // block is visibly a capped-host block, not a scaling property)
    val blockProbe = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var runSeq = 0
    for (pass <- 1 to 2; cpus <- levels) {
      val probeMt = HostProbe.mtProbe()
      blockProbe += ((cpus, probeMt))
      System.err.println(f"[scaling] pass=$pass cpus=$cpus%2d block probe_mt=$probeMt%.0f Mops")
      val spark = session(cpus)
      for (rep <- 0 to reps) { // rep 0 = untimed warmup
        runSeq += 1
        val out = scratch match {
          case Some(dir) =>
            val f = new java.io.File(dir, s"out-$runSeq"); f.mkdirs(); f.getAbsolutePath
          case None => java.nio.file.Files.createTempDirectory(s"scale$cpus").toString
        }
        val g0 = gcMs
        val t0 = System.nanoTime()
        (mode, extractedRoot) match {
          case ("tier", Some(root)) =>
            graft.jobs.TierJob.run(spark, root, out).collect()
          case ("graph", _) =>
            graft.graph.GraphOps.pagerank(spark,
                graft.graph.GraphOps.edges(spark.read.parquet(pagesPath)))
              .write.mode("overwrite").format("noop").save()
            spark.catalog.clearCache()
          case _ =>
            ExtractionJob.run(spark, JobConfig(pagesPath, out, runId = s"s$runSeq"))
        }
        val sec = (System.nanoTime() - t0) / 1e9
        val gcSec = (gcMs - g0) / 1000.0
        val dps = nDocs / sec
        if (rep > 0) {
          all += ((rep, cpus, dps))
          if (dps > best.getOrElse(cpus, 0.0)) best(cpus) = dps
        }
        val tag = if (rep == 0) "warm" else s"rep$rep"
        System.err.println(f"[scaling] pass=$pass cpus=$cpus%2d $tag%5s ${sec}%7.1f s  $dps%8.1f docs/s  (gc $gcSec%.1f s)")
        rm(new java.io.File(out))
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    def eff(n: Int, n4: Int): Option[Double] =
      for (a <- best.get(n); b <- best.get(n4)) yield b / a / 4.0
    val pairs = Seq(4 -> 16, 8 -> 32).flatMap { case (n, n4) =>
      eff(n, n4).map(e => s""""eff_${n}_to_$n4":${f"$e%.3f"}""")
    }
    val bests = best.toSeq.sortBy(_._1)
      .map { case (c, d) => s""""docs_per_sec_$c":${f"$d%.1f"}""" }
    val probes = blockProbe.groupBy(_._1).toSeq.sortBy(_._1).map { case (c, ps) =>
      s""""probe_mt_$c":${f"${ps.map(_._2).min}%.0f"}"""
    }
    println((bests ++ pairs ++ probes ++
      Seq(s""""docs":$nDocs""", s""""mode":"$mode""""))
      .mkString("{", ",", "}"))
  }
}
