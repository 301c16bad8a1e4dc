package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale smoke for the event-telemetry family (q4–q8): synthesize the
  * event/order tables DETERMINISTICALLY in-flight (`spark.range` +
  * xxhash64-derived columns — no external data, same shape as the driver's
  * `events` table) at 1000× the bench scale, run each operator on the full
  * host width, and report sustained rows/s. Like [[ScaleSmoke]], the point
  * is robustness evidence, not a band number: flat driver heap, no
  * straggler collapse, throughput linear in input.
  *
  * The synthetic stream is deliberately SKEWED: ~2% of all events belong
  * to one hot user (a realistic crawler/bot key), so the per-user window
  * in sessionize and the per-key funnel legs see a single key carrying
  * ~2M rows at the default size — the case that breaks naive
  * collect_list-per-user designs.
  *
  * Usage: runMain graft.EventScaleSmoke [nEvents] [nUsers] [nOrders] [cpus]
  *   default: 100e6 events, 1e6 users, 10e6 orders, 32 cores.
  *   Prints one JSON line with per-phase seconds and rows/s.
  */
object EventScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(100000000L)
    val nUsers = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nOrders = args.lift(2).map(_.toLong).getOrElse(10000000L)
    val cpus = args.lift(3).getOrElse("32")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // one year of events starting 2024-01-01, microsecond resolution
    val baseUs = 1704067200000000L
    val spanUs = 365L * 24 * 3600 * 1000000L
    val types = array(Seq("view", "click", "purchase", "signup", "error").map(lit): _*)
    // hotDenom-th of all events land on user 0 (hot key); rest uniform
    def eventsWithSkew(hotDenom: Long) = spark.range(nEvents).select(
      col("id").as("event_id"),
      when(pmod(xxhash64(lit("hot"), col("id")), lit(hotDenom)) === 0L, 0L)
        .otherwise(pmod(xxhash64(lit("u"), col("id")), lit(nUsers))).as("user_id"),
      timestamp_micros(lit(baseUs) + pmod(xxhash64(lit("t"), col("id")), lit(spanUs))).as("ts"),
      element_at(types, (pmod(xxhash64(lit("e"), col("id")), lit(5L)) + 1).cast("int")).as("event_type"))
    // ~2% hot: the default realistic crawler/bot mix
    val events = eventsWithSkew(50L)
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(lit("c"), col("id")), lit(nUsers)).as("o_custkey"),
      timestamp_micros(lit(baseUs) + pmod(xxhash64(lit("d"), col("id")), lit(spanUs))).as("o_orderdate"))

    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    out += "events" -> nEvents.toString
    out += "users" -> nUsers.toString
    out += "orders" -> nOrders.toString
    out += "cpus" -> cpus

    // each phase reports its own input volume: q5 scans the orders table
    // through the same union+window as the events, so its denominator is
    // nEvents + nOrders — quoting nEvents alone would understate the
    // actual rows processed
    for ((name, inputRows, df) <- Seq[(String, Long, () => DataFrame)](
        ("q4_sessionize", nEvents, () => graft.rel.EventOps.sessionize(events)),
        ("q4b_sessionize_chunked", nEvents,
          () => graft.rel.EventOps.sessionizeChunked(events, chunkMinutes = 720)),
        ("q5_asof_join", nEvents + nOrders,
          () => graft.rel.EventOps.asofJoin(events, orders)),
        ("q6_hll", nEvents,
          () => graft.rel.EventOps.hllRegisters(events, "event_type", col("user_id"))),
        ("q7_funnel", nEvents, () => graft.rel.EventOps.funnel(events)),
        ("q8_cms", nEvents,
          () => graft.rel.EventOps.cmsCounters(events, col("user_id"))))) {
      val (_, sec) = time(noop(df()))
      out += s"${name}_sec" -> f"$sec%.1f"
      out += s"${name}_input_rows" -> inputRows.toString
      out += s"${name}_rows_per_sec" -> f"${inputRows / sec}%.0f"
    }

    // bot-flood regime: HALF of all events on one key. The single-pass
    // window serializes that user's whole history on one task; the
    // chunked two-phase form splits it across time chunks — this pair is
    // the ≥3x evidence for sessionizeChunked under real skew (at mild 2%
    // skew above, the plain form's single sort is still competitive)
    for ((tag, denom) <- Seq("hot50" -> 2L, "hot90" -> 10L)) {
      // denom=10 with the complement trick puts 90% on the hot key
      val flood =
        if (tag == "hot90") spark.range(nEvents).select(
          col("id").as("event_id"),
          when(pmod(xxhash64(lit("hot"), col("id")), lit(10L)) < 9L, 0L)
            .otherwise(pmod(xxhash64(lit("u"), col("id")), lit(nUsers))).as("user_id"),
          timestamp_micros(lit(baseUs) + pmod(xxhash64(lit("t"), col("id")), lit(spanUs))).as("ts"),
          element_at(types, (pmod(xxhash64(lit("e"), col("id")), lit(5L)) + 1).cast("int")).as("event_type"))
        else eventsWithSkew(denom)
      for ((name, df) <- Seq[(String, () => DataFrame)](
          s"q4_$tag" -> (() => graft.rel.EventOps.sessionize(flood)),
          s"q4b_$tag" -> (() =>
            graft.rel.EventOps.sessionizeChunked(flood, chunkMinutes = 720)))) {
        val (_, sec) = time(noop(df()))
        out += s"${name}_sec" -> f"$sec%.1f"
        out += s"${name}_rows_per_sec" -> f"${nEvents / sec}%.0f"
      }
    }
    // retained-heap measure: local-mode executors share this JVM, so give
    // CacheOnce's async unpersist a beat and drop any straggler cached
    // blocks first — the metric is LEAKED memory, not cache-in-flight
    spark.catalog.clearCache()
    Thread.sleep(2000)
    val rt = Runtime.getRuntime
    System.gc()
    out += "heap_used_mb" -> ((rt.totalMemory - rt.freeMemory) / (1024 * 1024)).toString
    println(out.map { case (k, v) =>
      val quoted = if (v.matches("-?[0-9.]+")) v else s""""$v""""
      s""""$k":$quoted"""
    }.mkString("{", ",", "}"))
    spark.stop()
  }
}
