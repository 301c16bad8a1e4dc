package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness: `runMain graft.QueryBench <name> [sfDir]
  * [reps] [cpus]` times one SparkEntry query in isolation (noop sink,
  * cache cleared between reps) — the per-query iteration loop that the
  * full Bench is too slow for. Prints one line per rep plus the best. */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = if (args.length > 3) args(3) else "32"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    val secs = (1 to reps).map { rep =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[qbench] $name rep$rep: $sec%.2f s")
      sec
    }
    println(f"[qbench] $name best: ${secs.min}%.2f s  (sf=$sfDir cpus=$cpus)")
    spark.stop()
  }
}
