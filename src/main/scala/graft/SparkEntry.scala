package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor
import graft.pages.PagesTable
import graft.sim.Ann
import graft.text.{LangId, TextOps}

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), each with DuckDB oracle SQL where the semantics are
  * SQL-expressible; per-page layout operators get rows-only checks.
  *
  * The `pages` table (BASELINE.json input_hint shape) is synthesised
  * deterministically (PageGen, seed 42) and materialised under
  * /root/repo/data/pages/<sf>/ so the DuckDB oracle can read the very
  * same parquet; `pages.text` carries the generator's golden extraction,
  * so `x1_extract_text` is a true byte-identity check of the extractor
  * through the driver's hash compare.
  */
object SparkEntry {

  private def sfName(sfDir: String): String = new java.io.File(sfDir).getName

  private def pagesDf(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(PagesTable.ensure(s, sfName(sfDir)))

  private def extractedDf(s: SparkSession, sfDir: String): DataFrame = {
    import s.implicits._
    pagesDf(s, sfDir).select("url", "html").as[(String, Array[Byte])]
      .mapPartitions(_.map { case (u, h) => Extractor.extract(u, h) })
      .toDF()
  }

  private def docs(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/documents.parquet")

  private def emb(s: SparkSession, sfDir: String): DataFrame =
    s.read.parquet(s"$sfDir/embeddings.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    extractedDf(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- extraction family (pages table) --------------------------------
    "x1_extract_text" -> ((s, d) =>
      extractedDf(s, d).select(col("url"), col("text"))),

    "x2_extract_stats" -> ((s, d) =>
      extractedDf(s, d).select(col("url"), length(col("text")).as("text_chars"))),

    "x3_resume_antijoin" -> ((s, d) => {
      val pages = pagesDf(s, d)
      val committed = pages
        .filter(regexp_extract(col("url"), "articles/(\\d+)", 1).cast("long") % 3 === 0)
        .select("url")
      pages.join(committed, Seq("url"), "left_anti").select("url")
    }),

    "x4_lang_metrics" -> ((s, d) =>
      pagesDf(s, d).groupBy("lang").agg(
        count(lit(1)).as("docs"),
        sum(octet_length(col("html"))).as("html_bytes"))),

    "x5_spans" -> ((s, d) =>
      extractedDf(s, d).select(col("url"),
        explode(col("spans")).as("s"))
        .select(col("url"), col("s.kind").as("kind"), col("s.label").as("label"),
          col("s.start").as("start"), col("s.end").as("end"),
          col("s.order").as("ord"), col("s.line").as("line"))),

    // ---- per-page layout operators (rows-only checks) -------------------
    "l1_reading_order" -> ((s, d) =>
      extractedDf(s, d).select(col("url"), explode(col("blocks")).as("b"))
        .select(col("url"), col("b.label").as("label"), col("b.order").as("ord"),
          col("b.line").as("line"), col("b.x").as("x"), col("b.y").as("y"),
          col("b.w").as("w"), col("b.h").as("h"))),

    "l2_merge_ensemble" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.mergeEnsemble(u, h) }
        .toDF("url", "n_merged", "order_sum")
    }),

    "l3_merge3_v3" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.mergeThreeV3(u, h) }
        .toDF("url", "n_merged", "order_sum")
    }),

    "l4_projection_lines" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.projectionLines(u, h) }
        .toDF("url", "n_lines", "line_height_sum")
    }),

    "l5_columns" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.columns(u, h) }
        .toDF("url", "n_paras", "n_cols", "order_sum")
    }),

    "l6_layout_filter" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.layoutFilter(u, h) }
        .toDF("url", "kept", "dropped")
    }),

    "l7_text_attributes" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .flatMap { case (u, h) => LayoutQueries.textAttributes(u, h) }
        .toDF("url", "block_idx", "tag", "chars", "bold_chars", "italic_chars")
    }),

    // ---- multimodal plumbing (html bytes stand in for media payloads) ---
    "m1_media_meta" -> ((s, d) => {
      val media = pagesDf(s, d).select(col("url").as("media_id"), col("html").as("media"))
      graft.mm.MultiModal.decode(s, media).toDF()
    }),

    "m2_media_frames" -> ((s, d) => {
      val media = pagesDf(s, d).select(col("url").as("media_id"), col("html").as("media"))
      graft.mm.MultiModal.sampleFrames(s, graft.mm.MultiModal.decode(s, media), everyN = 10)
    }),

    "m3_media_features" -> ((s, d) => {
      val media = pagesDf(s, d).select(col("url").as("media_id"), col("html").as("media"))
      graft.mm.MultiModal.features(s, media).toDF()
        .select(col("media_id"), round(element_at(col("features"), 1).cast("double"), 4).as("f0"),
          round(element_at(col("features"), 2).cast("double"), 4).as("f1"))
    }),

    // ---- scalar shell: base64 source (S3) round-trip -------------------
    "x6_base64" -> ((s, d) =>
      pagesDf(s, d).select(col("url"),
        octet_length(unbase64(base64(col("html")))).as("n_bytes"))),

    // ---- S5: sidecar-JSON source — serialise spans to JSON strings and
    // parse them back with from_json (the reference's out.json reader) ---
    "x7_sidecar_json" -> ((s, d) => {
      val sidecar = extractedDf(s, d)
        .select(col("url"), to_json(col("spans")).as("sidecar"))
      val schema = "array<struct<kind:string,label:string,start:bigint,end:bigint,order:int,line:int>>"
      sidecar.select(col("url"),
        size(from_json(col("sidecar"), org.apache.spark.sql.types.DataType
          .fromDDL(schema).asInstanceOf[org.apache.spark.sql.types.ArrayType]))
          .as("n_regions"))
    }),

    // ---- F1/F2/F9: detector-side filters over jittered box sets --------
    "l8_detector_filters" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.detectorFilters(u, h) }
        .toDF("url", "n_raw", "n_conf", "n_size", "n_capped")
    }),

    // ---- table structure (iitb/table): nrows/ncells/cellrows ----------
    "l9_table_structure" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.tableStructure(u, h) }
        .toDF("url", "n_tables", "nrows", "ncells", "cell_area")
    }),

    // ---- exact median (A3) per language -------------------------------
    "t10_len_median" -> ((s, d) =>
      docs(s, d).groupBy("lang")
        .agg(percentile(col("n_chars"), lit(0.5)).as("median_chars"),
          count(lit(1)).as("docs"))),

    // ---- training-data text ops (documents table) -----------------------
    "t1_tokens" -> ((s, d) => TextOps.tokenCounts(docs(s, d))),
    "t2_quality" -> ((s, d) => TextOps.quality(docs(s, d))),
    "t3_dedup_exact" -> ((s, d) => TextOps.dedupExact(docs(s, d))),
    "t4_dedup_prefix" -> ((s, d) => TextOps.dedupPrefix(docs(s, d))),
    "t5_minhash" -> ((s, d) => TextOps.minhash(docs(s, d))),
    "t6_simhash" -> ((s, d) => TextOps.simhash(docs(s, d))),
    "t7_jaccard_pairs" -> ((s, d) => TextOps.jaccardPairs(docs(s, d))),
    "t8_fingerprint" -> ((s, d) => TextOps.fingerprint(docs(s, d))),
    "t9_langid" -> ((s, d) => LangId.predict(docs(s, d))),

    // ---- similarity search (embeddings table) ---------------------------
    "e1_knn_exact" -> ((s, d) => Ann.cosineKnn(emb(s, d), k = 5)),
    "e2_knn_ivf" -> ((s, d) => Ann.ivfKnn(emb(s, d), k = 5)),
    "e3_label_counts" -> ((s, d) =>
      emb(s, d).groupBy("label").agg(
        count(lit(1)).as("cnt"), sum(col("vec_id")).as("id_sum"))),

    // ---- relational shell (TPC-H-ish) -----------------------------------
    "q1_agg" -> ((s, d) =>
      s.read.parquet(s"$d/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("count_order"))),

    "q2_join" -> ((s, d) => {
      val o = s.read.parquet(s"$d/orders.parquet")
      val c = s.read.parquet(s"$d/customer.parquet")
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey")
        .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_price"))
    }),

    "q3_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      s.read.parquet(s"$d/events.parquet")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("rn"))
    })
  )

  /** DuckDB oracle SQL (driver runs at sf0.01 with tables registered from
    * the same dir; `pages` is read from the materialised parquet path). */
  def oracleSql: Map[String, String] = {
    val pages = "read_parquet('/root/repo/data/pages/sf0.01/*.parquet')"
    val tok = "string_split_regex(trim(text), '\\s+')"
    val shingles =
      s"""(SELECT doc_id, unnest(
            [array_to_string(w[i:i+2], ' ')
             for i in generate_series(1, greatest(length(w)-2, 1))]) AS s
          FROM (SELECT doc_id, $tok AS w FROM documents) t)"""
    def h60(e: String) = s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"

    Map(
      "x1_extract_text" -> s"SELECT url, text FROM $pages",
      "x2_extract_stats" -> s"SELECT url, length(text) AS text_chars FROM $pages",
      "x3_resume_antijoin" ->
        (s"SELECT url FROM $pages WHERE CAST(regexp_extract(url, 'articles/(\\d+)', 1) AS BIGINT) % 3 <> 0"),
      "x4_lang_metrics" ->
        (s"SELECT lang, count(*) AS docs, CAST(sum(octet_length(html)) AS BIGINT) AS html_bytes FROM $pages GROUP BY lang"),
      "x6_base64" ->
        (s"SELECT url, octet_length(html) AS n_bytes FROM $pages"),
      "t10_len_median" ->
        ("SELECT lang, median(n_chars) AS median_chars, count(*) AS docs " +
         "FROM documents GROUP BY lang"),
      "t1_tokens" ->
        s"SELECT doc_id, length($tok) AS n_tokens, length(text) AS n_chars FROM documents",
      "t2_quality" ->
        (s"SELECT doc_id, length($tok) AS n_tokens, length(list_distinct($tok)) AS n_distinct, " +
         "length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace FROM documents"),
      "t3_dedup_exact" ->
        "SELECT md5(text) AS h, count(*) AS cnt, min(doc_id) AS keep_id FROM documents GROUP BY 1",
      "t4_dedup_prefix" ->
        (s"SELECT md5(array_to_string(list_slice($tok, 1, 5), ' ')) AS h, " +
         "count(*) AS cnt, min(doc_id) AS keep_id FROM documents GROUP BY 1"),
      "t5_minhash" ->
        (s"SELECT doc_id, " +
         (0 until 8).map(i => s"min(${h60(s"'$i:' || s")}) AS h$i").mkString(", ") +
         s" FROM $shingles GROUP BY doc_id"),
      "t6_simhash" ->
        (s"""SELECT doc_id, (
              ${(0 until 16).map(b =>
                s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END)")
                .mkString(" + ")}
             ) AS simhash
             FROM (SELECT doc_id, ${h60("t.w")} AS h
                   FROM (SELECT doc_id, unnest($tok) AS w FROM documents) t)
             GROUP BY doc_id"""),
      "t7_jaccard_pairs" ->
        (s"""WITH sh AS (SELECT DISTINCT doc_id, s FROM $shingles),
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             inter AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                       FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
                       GROUP BY 1, 2)
             SELECT a, b, inter, sa.n + sb.n - inter AS un
             FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
             WHERE inter * 10 >= (sa.n + sb.n - inter) * 3"""),
      "t8_fingerprint" ->
        s"SELECT doc_id, ${h60(s"array_to_string($tok, ' ')")} AS fp FROM documents",
      "e1_knn_exact" ->
        ("""SELECT vec_id, neighbor_id, rank FROM (
              SELECT l.vec_id AS vec_id, r.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY l.vec_id
                       ORDER BY list_cosine_similarity(l.e, r.e) DESC, r.vec_id ASC) AS rank
              FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings) l
              JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings) r
              ON l.vec_id <> r.vec_id)
            WHERE rank <= 5"""),
      "e3_label_counts" ->
        "SELECT label, count(*) AS cnt, CAST(sum(vec_id) AS BIGINT) AS id_sum FROM embeddings GROUP BY label",
      "q1_agg" ->
        ("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
         "count(*) AS count_order FROM lineitem GROUP BY 1, 2"),
      "q2_join" ->
        ("SELECT c_custkey, count(*) AS n_orders, max(o_totalprice) AS max_price " +
         "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"),
      "q3_window" ->
        ("""SELECT user_id, event_id, rn FROM (
              SELECT user_id, event_id,
                     row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
              FROM events)
            WHERE rn <= 3""")
    )
  }
}
