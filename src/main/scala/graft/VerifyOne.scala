package graft

import org.apache.spark.sql.SparkSession

/** Single-query correctness dump: `runMain graft.VerifyOne <outDir>
  * <name>... [--sf <sfDir>]` writes just the named SparkEntry queries to
  * `outDir/<name>` parquet plus their oracle SQL to
  * `outDir/oracle_sql.json` — the per-query iteration loop that the full
  * Verify (75 sequential queries) is too slow for when developing one op.
  * Same sink shape as Verify, so the driver-style DuckDB compare replays
  * unchanged on the subset.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val positional = scala.collection.mutable.ArrayBuffer.empty[String]
    var sfDir = "/root/testdata/sf0.01"
    var i = 0
    while (i < args.length) {
      if (args(i) == "--sf") { sfDir = args(i + 1); i += 2 }
      else { positional += args(i); i += 1 }
    }
    val outDir = positional.head
    val names = positional.tail.toVector
    require(names.nonEmpty, "usage: VerifyOne <outDir> <name>... [--sf <sfDir>]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(new java.io.File(sfDir).getName)
      .filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
