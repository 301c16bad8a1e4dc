package graft.jobs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.pages.PagesTable

class StreamingExtractionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val tmp = java.nio.file.Files.createTempDirectory("graftstream").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming surface: file-source -> extractor -> checkpointed sink") {
    val pagesDir = s"$tmp/pages"
    PagesTable.generate(spark, 42L, 120, partitions = 3).write.parquet(pagesDir)

    val q = StreamingExtraction.start(spark, pagesDir, s"$tmp/out", pagesDir)
    q.awaitTermination(120000)

    val out = spark.read.parquet(s"$tmp/out/extracted")
    assert(out.count() == 120)
    // restart with no new files: AvailableNow terminates having added nothing
    val q2 = StreamingExtraction.start(spark, pagesDir, s"$tmp/out", pagesDir)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$tmp/out/extracted").count() == 120)

    // text byte-identity through the streaming path too
    import org.apache.spark.sql.functions.col
    val joined = out.withColumnRenamed("text", "got")
      .join(spark.read.parquet(pagesDir).select("url", "text"), "url")
    assert(joined.filter(col("got") =!= col("text")).count() == 0)
  }
}
