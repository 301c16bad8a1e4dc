package graft.jobs

import org.apache.spark.sql.SparkSession
import graft.pages.PagesTable

object ProfileJob {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val pagesPath = PagesTable.ensure(spark, "sf0.01")
    t("warm scan count")(spark.read.parquet(pagesPath).count())
    val out1 = java.nio.file.Files.createTempDirectory("pj1").toString
    t("job run 1")(ExtractionJob.run(spark, JobConfig(pagesPath, out1, runId = "p1")))
    val out2 = java.nio.file.Files.createTempDirectory("pj2").toString
    t("job run 2 (warm)")(ExtractionJob.run(spark, JobConfig(pagesPath, out2, runId = "p2")))
    val work = ExtractionJob.planWorkSet(spark, JobConfig(pagesPath, out2 + "x"))
    t("plan+shuffle only")(work.count())
    t("extract no write")(ExtractionJob.extractDataset(spark, work, JobConfig(pagesPath, out2 + "y")).count())
    spark.stop()
  }
}
