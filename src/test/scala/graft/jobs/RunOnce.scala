package graft.jobs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pages.PagesTable
import graft.extract.{Extracted, Extractor}
object RunOnce {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pagesPath = PagesTable.ensure(spark, "sf0.1")
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def t(tag: String)(f: => Unit): Unit = {
      val g0 = gcMs
      val t0 = System.nanoTime()
      f
      println(f"[$tag] ${(System.nanoTime()-t0)/1e9}%.1f s (gc ${(gcMs-g0)/1000.0}%.1f s)")
    }
    val pages = spark.read.parquet(pagesPath).select("url", "html")
    t("scan+count only")(pages.count())
    t("extract noop, no shuffle") {
      pages.as[(String, Array[Byte])]
        .mapPartitions(_.map { case (u, h) => Extractor.extract(u, h) })
        .write.mode("overwrite").format("noop").save()
    }
    t("extract noop, with salted shuffle") {
      val work = pages
        .withColumn("size_bucket", ceil(log2(greatest(length(col("html")), lit(1)))).cast("int"))
        .withColumn("salt", pmod(hash(col("url")), lit(64)))
        .repartition(col("size_bucket"), col("salt"))
        .select("url", "html")
      work.as[(String, Array[Byte])]
        .mapPartitions(_.map { case (u, h) => Extractor.extract(u, h) })
        .write.mode("overwrite").format("noop").save()
    }
    t("extract text-only noop, no shuffle") {
      pages.as[(String, Array[Byte])]
        .mapPartitions(_.map { case (u, h) => (u, Extractor.extract(u, h).text) })
        .write.mode("overwrite").format("noop").save()
    }
    val out = java.nio.file.Files.createTempDirectory("ro2").toString
    t("full job (shuffle+parquet write)") {
      ExtractionJob.run(spark, JobConfig(pagesPath, out, runId = "x"))
    }
    spark.stop()
  }
}
