package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Extractor
import graft.graph.GraphOps
import graft.pages.PagesTable
import graft.sim.{Ann, AnnIndex}
import graft.text.{LangId, ScriptId, TextOps}

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2), each with DuckDB oracle SQL. The per-page ensemble /
  * column queries over derived jittered box sets (l2/l3/l5) read
  * expectation sidecars produced by executing the REFERENCE's own
  * merge/column algorithms over the span geometry
  * (tools/gen_layout_sidecars.py) — every query on the board is
  * hash-checked; none are rows-only.
  *
  * The `pages` table (BASELINE.json input_hint shape) is synthesised
  * deterministically (PageGen, seed 42) and materialised under
  * /root/repo/data/pages_<ver>/<sf>/ so the DuckDB oracle can read the very
  * same parquet; `pages.text` carries the generator's golden extraction,
  * so `x1_extract_text` is a true byte-identity check of the extractor
  * through the driver's hash compare. Golden sidecar tables
  * (`<sf>_spans`, `<sf>_meta`) carry the generator-derived span/attribute
  * expectations for the layout family oracles.
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

  /** PageRank iterations for g3 — the oracle unrolls the same count. */
  private val PrIters = 3

  /** HITS mutual-reinforcement rounds for g10 — oracle unrolls the same. */
  private val HitsIters = 2

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
          col("s.line").as("line"))),

    // ---- per-page layout operators --------------------------------------
    "l1_reading_order" -> ((s, d) =>
      extractedDf(s, d).select(col("url"), explode(col("blocks")).as("b"))
        .select(col("url"), col("b.label").as("label"),
          col("b.line").as("line"), col("b.x").as("x"), col("b.y").as("y"),
          col("b.w").as("w"), col("b.h").as("h"))),

    // reading-order permutation invariant: per url the emitted orders are
    // exactly {1..n} — sum/min/max/distinct checked against the golden n
    "l1b_order_perm" -> ((s, d) =>
      extractedDf(s, d).select(col("url"), explode(col("blocks")).as("b"))
        .groupBy("url").agg(
          count(lit(1)).as("n_blocks"),
          sum(col("b.order")).as("ord_sum"),
          min(col("b.order")).as("ord_min"),
          max(col("b.order")).as("ord_max"),
          countDistinct(col("b.order")).as("n_ord_distinct"))),

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

    // A8+A9: 4-edge dilate + padding clamp per block
    "l10_postprocess" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .flatMap { case (u, h) => LayoutQueries.postprocess(u, h) }
        .toDF("url", "idx", "x1", "y1", "x2", "y2")
    }),

    // F3: normalized-coordinate geometry projection per block
    "l11_geometry_projection" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .flatMap { case (u, h) => LayoutQueries.geometryProjection(u, h) }
        .toDF("url", "idx", "gx", "gy", "gw", "gh")
    }),

    // Hi-SAM line->paragraph grouping over projection-profile lines
    "l12_hisam_groups" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.hisamGroups(u, h) }
        .toDF("url", "n_lines", "n_paras")
    }),

    "l7_text_attributes" -> ((s, d) => {
      import s.implicits._
      pagesDf(s, d).select("url", "html").as[(String, Array[Byte])]
        .map { case (u, h) => LayoutQueries.textAttrTotals(u, h) }
        .toDF("url", "chars", "bold_chars", "italic_chars",
          "underline_chars", "strike_chars", "heading_chars", "colored_chars",
          "size_px_sum")
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
      import s.implicits._
      pagesDf(s, d).select(col("url"), col("html")).as[(String, Array[Byte])]
        .map { case (id, bytes) =>
          val bins = graft.mm.MultiModal.featureCounts(bytes)
          (id, bins(7), bins(12), bins(13))
        }
        .toDF("media_id", "f7", "f12", "f13")
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
    "t11_lsh_pairs" -> ((s, d) => TextOps.minhashPairs(docs(s, d))),
    "t12_quality_signals" -> ((s, d) => TextOps.qualitySignals(docs(s, d))),
    "t14_simhash_pairs" -> ((s, d) => TextOps.simhashPairs(docs(s, d))),
    "t13_regex_tokens" -> ((s, d) => TextOps.regexTokens(docs(s, d))),
    "t15_winnow" -> ((s, d) => TextOps.winnow(docs(s, d))),
    "t16_repetition" -> ((s, d) => TextOps.repetitionSignals(docs(s, d))),
    "t17_crossdup" -> ((s, d) => TextOps.crossDupCoverage(docs(s, d))),
    "t18_tier" -> ((s, d) => TextOps.tierAssign(docs(s, d))),
    "t19_split" -> ((s, d) => TextOps.hashSplit(docs(s, d))),
    "t20_pretier" -> ((s, d) => TextOps.preTier(docs(s, d))),

    // LSH candidate pairs → transitive clusters → keeper bit per doc:
    // the text-side corpus-dedup DECISION (t11 finds candidate pairs;
    // this collapses A~B, B~C into keep-one-of-{A,B,C}). Min-label
    // propagation over the banded pair graph; the oracle replays the
    // unique fixpoint by recursive reachability over the t11 derivation.
    "t21_neardup_keepers" -> ((s, d) =>
      graft.sim.Components.keepers(s, docs(s, d).select("doc_id"),
        TextOps.minhashPairs(docs(s, d)))),
    // leakage-safe split: hash-split by the near-dup CLUSTER label so a
    // duplicate pair can never straddle train/test; pure projection on
    // top of the t21 component frame
    "t36_leaksafe_split" -> ((s, d) =>
      TextOps.clusterSplit(graft.sim.Components.keepers(s,
        docs(s, d).select("doc_id"), TextOps.minhashPairs(docs(s, d))))),
    // quality-aware keeper election: within each t21 cluster keep the
    // copy with the most distinct tokens (then most tokens, then min
    // doc_id) — a map-side-combinable struct-max per component, never a
    // window over the cluster
    "t37_best_keeper" -> ((s, d) =>
      TextOps.qualityKeepers(s, docs(s, d), TextOps.minhashPairs(docs(s, d)))),
    // shingle-containment pairs: the subset-duplicate recall jaccard
    // misses (B embeds A → inter/min ≈ 1 while inter/union is small);
    // t7's banded hashed-shingle machinery, different arithmetic
    "t38_containment_pairs" -> ((s, d) =>
      TextOps.containmentPairs(docs(s, d))),
    // benchmark decontamination: corpus 8-gram positions that leak an
    // eval set (here a deterministic 1/97 slice standing in for the
    // benchmark; the real benchmark table is equally tiny → broadcast)
    "t22_decontam" -> ((s, d) =>
      TextOps.decontaminate(docs(s, d),
        docs(s, d).filter(col("doc_id") % 97 === 0))),
    // decontamination REWRITE: cut every token covered by a leaked
    // benchmark 8-gram (t22 counts; this removes) — broadcast benchmark
    // gram hashes, interval-merged per-row rewrite
    "t34_decontam_rewrite" -> ((s, d) =>
      TextOps.decontamRemoval(docs(s, d),
        docs(s, d).filter(col("doc_id") % 97 === 0))),
    // exact-quota deterministic stratified sample per language: seeded-
    // hash rank inside the stratum, rn <= quota filter Spark runs as a
    // WindowGroupLimit (bounded per-task top-k before the exchange)
    "t35_stratified_sample" -> ((s, d) =>
      TextOps.stratifiedSample(docs(s, d), strataCol = "lang", quota = 12)),
    // per-language corpus datasheet: docs / token mass / exact-dup rate /
    // length envelope — the snapshot health card; one combine per lang key
    "d2_corpus_card" -> ((s, d) => TextOps.corpusCard(docs(s, d))),
    // corpus vocabulary card: global top-k tokens (TakeOrderedAndProject
    // partial top-k) + cumulative coverage in basis points over the k
    // survivors only
    "d3_vocab" -> ((s, d) => TextOps.vocabCard(docs(s, d))),
    // snapshot-over-snapshot datasheet diff: prev = the full corpus,
    // cur = a deterministic regression (1/3 of docs dropped, the %7
    // slice double-ingested) so the drop + dup-spike alerts exercise
    "d4_snapshot_diff" -> ((s, d) => {
      val all = docs(s, d)
      TextOps.corpusCardDiff(
        TextOps.corpusCard(all),
        TextOps.corpusCard(all.filter(col("doc_id") % 3 =!= 0)
          .unionAll(all.filter(col("doc_id") % 7 === 0))))
    }),
    // incremental ingest dedup: the nightly-batch shape — new docs
    // (doc_id % 3 != 0) deduped within the batch and anti-joined
    // against the committed corpus (doc_id % 3 == 0) by text hash
    "t23_ingest_dedup" -> ((s, d) =>
      TextOps.ingestDedup(
        docs(s, d).filter(col("doc_id") % 3 =!= 0),
        docs(s, d).filter(col("doc_id") % 3 === 0))),
    // bloom-accelerated ingest dedup: committed hashes folded into a
    // BloomFilterAggregate sketch, bloom-negatives bypass the anti-join
    // entirely; output is EXACTLY the anti-join's at any fp rate
    "t30_bloom_ingest" -> ((s, d) =>
      TextOps.ingestDedupBloom(
        docs(s, d).filter(col("doc_id") % 4 =!= 0),
        docs(s, d).filter(col("doc_id") % 4 === 0))),
    // incremental NEAR-dup ingest: batch docs dropped on any minhash-LSH
    // band collision with the committed corpus (signatures + banding
    // identical to t11); committed side reduces to distinct (band,bucket)
    "t31_neardup_ingest" -> ((s, d) =>
      TextOps.nearDupIngest(
        docs(s, d).filter(col("doc_id") % 5 =!= 0),
        docs(s, d).filter(col("doc_id") % 5 === 0))),
    // tier-weighted deterministic epoch mixture over the tier table:
    // reject 0%, low 10%, mid 50%, high 100%
    "t24_tier_mix" -> ((s, d) =>
      TextOps.tierMix(TextOps.tierAssign(docs(s, d)),
        Map(0 -> 0, 1 -> 1000, 2 -> 5000, 3 -> 10000))),
    // sequence-packing assignment: (pack_group, bin, token offset) per
    // doc for fixed-capacity training sequences
    "t25_pack" -> ((s, d) => TextOps.packAssign(docs(s, d))),
    // duplicated-span REMOVAL: the corpus rewrite t17 only measures —
    // non-keeper copies of cross-document 8-gram spans are cut from the
    // text (keeper = min doc_id keeps its copy)
    "t26_span_removal" -> ((s, d) => TextOps.dupSpanRemoval(docs(s, d))),

    // ---- TF-IDF top-k keywords (integer-exact idf surrogate, rank →
    // WindowGroupLimit partial top-k below the exchange) ------------------
    "t27_tfidf" -> ((s, d) => TextOps.tfidfKeywords(docs(s, d))),

    // sliding-window chunking: zero-exchange per-row window explode
    "t28_chunks" -> ((s, d) =>
      TextOps.chunk(docs(s, d), capacity = 64, stride = 48)),

    // corpus-self-trained bigram-LM quality score (CCNet-style filter),
    // integer basis points so the oracle replays bit-identically
    "t29_lm_score" -> ((s, d) => {
      val dd = docs(s, d)
      TextOps.lmScore(dd, dd)
    }),

    // CCNet-style per-language perplexity terciles: head/middle/tail by
    // LM score within each predicted language — the cuts come from the
    // (lang, avg_bp) value histogram (≤ nLangs·10,001 rows), never a
    // document-level sort
    "t33_ccnet_buckets" -> ((s, d) => {
      val dd = docs(s, d)
      TextOps.ccnetBuckets(TextOps.lmScore(dd, dd), LangId.predict(dd))
    }),

    // DSIR-style domain matching: hashed-ngram importance weights of the
    // whole corpus against a curated seed sample (three sources stand in
    // for the "wiki+books" target), integer-exact bucket rate ratios
    "t32_importance" -> ((s, d) => {
      val dd = docs(s, d)
      TextOps.importanceWeights(
        dd.filter(col("source").isin("src1", "src2", "src3")), dd)
    }),

    "s1_script" -> ((s, d) => ScriptId.predict(docs(s, d))),

    // ---- per-host rollup over the pages table (the crawl-side shape of
    // A6: one partial-aggregated combine per host key; at corpus scale the
    // host distribution is zipfian but every aggregate here is map-side
    // combinable, so hot hosts cost one combiner row per task, not a
    // skewed shuffle) --------------------------------------------------
    "d1_host_stats" -> ((s, d) =>
      pagesDf(s, d)
        .select(split(col("url"), "/").getItem(2).as("host"),
          col("lang"), octet_length(col("html")).as("b"))
        .groupBy("host").agg(
          count(lit(1)).as("n_pages"),
          sum(col("b")).as("html_bytes"),
          countDistinct(col("lang")).as("n_langs"))),

    // ---- CCNet-style cross-document PARAGRAPH dedup over the extracted
    // corpus: hash every span's text slice, count distinct urls per hash,
    // report per-url duplicated-span coverage. Runs on the extractor's own
    // spans (not the sidecar), so it also re-checks extraction end-to-end.
    // The narrow (url, sh, len) span projection is referenced TWICE (the
    // docFreq groupBy and the join) — persisting it keeps the extraction
    // mapPartitions subtree at ONE execution (CacheOnce self-releases
    // after the consuming action; PlanAuditSpec pins the single-subtree
    // shape). The production form at 10^12 rows reads the MATERIALIZED
    // extracted table instead, exactly as jobs.TierJob does.
    "x8_span_dedup" -> ((s, d) => {
      val sp = graft.util.CacheOnce(extractedDf(s, d)
        .select(col("url"), col("text"), explode(col("spans")).as("s"))
        .select(col("url"),
          TextOps.md5Hash60(col("text")
            .substr(col("s.start").cast("int") + 1,
              (col("s.end") - col("s.start")).cast("int"))).as("sh"),
          (col("s.end") - col("s.start")).as("len")))
      val docFreq = sp.groupBy("sh").agg(countDistinct(col("url")).as("ndocs"))
      sp.join(docFreq, "sh")
        .groupBy("url").agg(
          count(lit(1)).as("n_spans"),
          sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("dup_spans"),
          sum(when(col("ndocs") >= 2, col("len")).otherwise(0L)).as("dup_chars"))
    }),

    // ---- tier extraction end-to-end: pages → streaming-tokenizer
    // extraction → corpus-level quality tiers over the EXTRACTED text.
    // This is the flagship composition of the graft: the per-page
    // mapPartitions front-end feeds the cross-document tier rules
    // (exact-dup keeper + 8-gram coverage + lexical signals), all
    // shuffle-by-key — the same plan at 10^12 pages. ---------------------
    // PII/pattern scrubbing over the extracted page text (the generator's
    // corpus carries ©-year marks; email/phone legs are live logic
    // verified on crafted docs in TextOpsSpec)
    "x10_scrub" -> ((s, d) =>
      TextOps.piiScrub(pagesDf(s, d).select(col("url").as("doc_id"), col("text")))
        .withColumnRenamed("doc_id", "url")),

    // The tier DAG consumes its input four times (signals, dup keeper,
    // gram positions, gram DF); persisting the narrow (doc_id, text)
    // projection keeps that at ONE run of the tokenizer + in-memory
    // rescans (self-released after the consuming action). The production
    // shape at 10^12 rows is jobs.TierJob, which reads the MATERIALIZED
    // extracted table instead of caching.
    "x9_page_tiers" -> ((s, d) => {
      val ex = graft.util.CacheOnce(extractedDf(s, d)
        .select(col("url").as("doc_id"), col("text")))
      TextOps.tierAssign(ex).withColumnRenamed("doc_id", "url")
    }),

    // ---- C4-style line filtering over the EXTRACTOR's own blocks (the
    // boilerplate-residue pass; pure projection, zero shuffles) ----------
    "x11_line_filter" -> ((s, d) =>
      TextOps.c4LineFilter(extractedDf(s, d)
          .select(col("url").as("doc_id"), col("text")))
        .withColumnRenamed("doc_id", "url")),

    // ---- per-host document cap (crawl-curation quota; WindowGroupLimit
    // keeps the per-host skew out of the exchange) ------------------------
    "x12_host_cap" -> ((s, d) =>
      TextOps.hostCap(pagesDf(s, d).select("url", "text"), k = 3)),

    // ---- within-page repeated-line strip over the extracted blocks
    // (first occurrence wins, order preserved; pure projection) ----------
    "x13_line_dedup" -> ((s, d) =>
      TextOps.dedupDocLines(extractedDf(s, d)
          .select(col("url").as("doc_id"), col("text")))
        .withColumnRenamed("doc_id", "url")),

    // ---- CORPUS-level repeated-line strip (RefinedWeb-style): lines in
    // ≥3 distinct docs are template boilerplate, removed from all copies
    // (the cross-page complement of x13's within-page dedup). The dedup
    // DAG consumes its input three times (line DF, per-doc removal set,
    // rebuild) — CacheOnce keeps the extraction mapPartitions at ONE run,
    // same discipline as x8/x9; production reads the materialized
    // extracted table. ----------------------------------------------------
    "x17_boilerplate_lines" -> ((s, d) =>
      TextOps.corpusLineDedup(graft.util.CacheOnce(extractedDf(s, d)
          .select(col("url").as("doc_id"), col("text"))))
        .withColumnRenamed("doc_id", "url")),

    // ---- link-graph construction: per-page DOM link extraction — a pure
    // projection over the pruned (url, html) scan, zero exchanges; the
    // frontier url is resolved per edge (Outlinks.resolve) ----------------
    "x14_outlinks" -> ((s, d) =>
      GraphOps.edges(pagesDf(s, d)).withColumnRenamed("src", "url")),

    // ---- link-graph in-degree: the one exchange hashes only the narrow
    // (target, src_url) edge rows — the html payload never shuffles; the
    // distinct-source count is the standard two-phase partial aggregate --
    "x15_link_indegree" -> ((s, d) =>
      GraphOps.edges(pagesDf(s, d))
        .select(col("target"), col("src").as("src_url"))
        .groupBy("target")
        .agg(count(lit(1)).as("in_deg"),
          countDistinct(col("src_url")).as("n_src_pages"))),

    // ---- url canonicalization: the dedup key before any url-level join.
    // The corpus's urls are already clean, so the query decorates them
    // deterministically (variant = length % 4: upper+fragment, explicit
    // :443, trailing '?', unchanged) and canonicalizes the decorated form
    // — every rule branch executes on real rows and the oracle replays
    // the identical chain. Pure codegen'd projection, zero exchanges. ---
    "x16_url_canon" -> ((s, d) => {
      val u = col("url")
      val decorated = when(length(u) % 4 === 0, concat(upper(u), lit("#FRAG")))
        .when(length(u) % 4 === 1,
          regexp_replace(u, "^(https://[^/]+)", "$1:443"))
        .when(length(u) % 4 === 2, concat(u, lit("?")))
        .otherwise(u)
      pagesDf(s, d).select(u.as("url"), decorated.as("decorated"),
        graft.web.UrlNorm.canonical(decorated).as("canon"))
    }),

    // ---- mojibake repair: the ftfy-core encoding fix before
    // tokenization. The corpus text is clean, so the query plants the
    // classic UTF-8-as-cp1252 sequences deterministically (variant =
    // length % 3; one branch stays untouched so the identity path
    // executes) and repairs the decorated form — literal replace chain,
    // pure codegen'd projection, zero exchanges. ------------------------
    "x21_mojibake" -> ((s, d) => {
      val t = col("text")
      val decorated = when(length(t) % 3 === 0,
          concat(lit("Ã©"), t, lit("â€™")))
        .when(length(t) % 3 === 1,
          concat(lit("â€œ"), t, lit("â€¦Â ")))
        .otherwise(t)
      docs(s, d).select(col("doc_id"), decorated.as("decorated"))
        .withColumn("repaired", graft.text.Mojibake.repair(col("decorated")))
        .withColumn("chars_fixed",
          length(col("decorated")) - length(col("repaired")))
    }),

    // ---- invisible-character sanitization: the corpus is clean by
    // construction, so the query decorates deterministically (C0
    // controls, DEL, ZWSP/BOM/soft-hyphen by doc length class) and the
    // op strips them back out — counts per class + cleaned-text md5
    // verify the rewrite itself. Per-row projection, no exchange. -------
    "x22_sanitize" -> ((s, d) => {
      val t = col("text")
      // decorations written as unicode escapes on purpose (the
      // characters are invisible): SOH/BEL/STX/DEL exercise the control
      // class, ZWSP/
      // ZWNJ/ZWJ/BOM/SHY the zero-width class; the mid-word soft hyphen
      // checks interior (not just affix) removal
      val decorated = when(length(t) % 4 === 0,
          concat(lit("\u0001\u200B"), t, lit("\u0007")))
        .when(length(t) % 4 === 1,
          concat(t, lit("\uFEFF\u00AD bre\u00ADak")))
        .when(length(t) % 4 === 2,
          concat(lit("\u007F"), t, lit("\u200C\u200D\u0002")))
        .otherwise(t)
      TextOps.sanitizeSignals(
        docs(s, d).select(col("doc_id"), decorated.as("text")))
    }),

    // ---- robots-style URL exclusion (crawl gate): host equi-join against
    // a per-host prefix-rule table, longest-match wins, allow wins ties.
    // The rule table is synthesized deterministically from the corpus's
    // own hosts so every precedence branch executes on real rows: a
    // /articles/1 disallow overridden by a longer /articles/12 allow
    // (n%3 hosts), a whole-host "/" disallow (n%7), and a same-prefix
    // allow/disallow tie (n%5 — allow must win). ---------------------------
    "x18_robots_filter" -> ((s, d) => {
      val pages = pagesDf(s, d).select("url")
      val hosts = pages
        .select(regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1).as("host"))
        .distinct()
      val n = regexp_extract(col("host"), "site(\\d+)", 1).cast("long")
      def rule(cond: org.apache.spark.sql.Column, prefix: String, allow: Boolean) =
        hosts.where(cond).select(col("host"),
          lit(prefix).as("prefix"), lit(allow).as("allow"))
      val rules = rule(n % 3 === 0, "/articles/1", allow = false)
        .unionAll(rule(n % 3 === 0, "/articles/12", allow = true))
        .unionAll(rule(n % 7 === 0, "/", allow = false))
        .unionAll(rule(n % 5 === 0, "/articles/2", allow = false))
        .unionAll(rule(n % 5 === 0, "/articles/2", allow = true))
      graft.web.Robots.verdicts(pages, rules)
    }),

    // ---- recrawl collapse: keep the latest warc_ts snapshot per
    // canonical url. The corpus has one crawl, so the query synthesizes
    // the recrawl history deterministically — each url becomes
    // 1 + len%3 snapshots, later ones under a differently-spelled URL
    // (:443 port / trailing '?') that canonicalizes back to the same
    // page identity, each one hour apart — and the op collapses them.
    // One partial-agg exchange on canon; the oracle replays the chain. --
    "x19_snapshot_dedup" -> ((s, d) => {
      val u = col("url")
      val snaps = pagesDf(s, d)
        .select(u, col("warc_ts"),
          explode(sequence(lit(0), length(u) % 3)).as("i"))
        .select(
          when(col("i") === 1,
              regexp_replace(u, "^(https://[^/]+)", "$1:443"))
            .when(col("i") === 2, concat(u, lit("?")))
            .otherwise(u).as("url"),
          (unix_timestamp(col("warc_ts")) + lit(3600L) * col("i"))
            .as("ts_epoch"))
      graft.web.Recrawl.latestSnapshot(snaps)
    }),

    // ---- DOM-structural template fingerprinting: per-(host, opening-tag
    // -sequence md5) render-template clusters — the template-level
    // boilerplate/dedup prior. One pruned scan, codegen'd projection
    // (no explode), map-side-combinable count, one narrow join back. ----
    "x20_templates" -> ((s, d) =>
      graft.web.Templates.templateClusters(pagesDf(s, d))),

    // ---- web-graph family (GraphOps over the outlink edge list) ---------
    // host-level link graph: narrow host-pair keys, two-phase distincts
    "g1_host_graph" -> ((s, d) => GraphOps.hostGraph(GraphOps.edges(pagesDf(s, d)))),

    // per-target anchor-text signal: rank-1 window -> WindowGroupLimit
    // partial top-k (skew-proof on the Zipf-shaped target key)
    "g2_anchor_stats" -> ((s, d) => GraphOps.anchorStats(GraphOps.edges(pagesDf(s, d)))),

    // integer-exact fixed-iteration PageRank: bit-identical mass under any
    // partitioning (floor-division transfers), replayed by the oracle
    "g3_pagerank" -> ((s, d) =>
      GraphOps.pagerank(s, GraphOps.edges(pagesDf(s, d)), iterations = PrIters)),

    // weakly-connected host components via the generic min-label engine
    "g4_host_components" -> ((s, d) =>
      GraphOps.hostComponents(s, GraphOps.edges(pagesDf(s, d)))),

    // label-propagation communities: density clustering on the host
    // graph (2 synchronous deterministic rounds, min-label ties) — the
    // granularity g4's connectivity components bridge over
    "g12_lpa_communities" -> ((s, d) =>
      GraphOps.lpaCommunities(s, GraphOps.edges(pagesDf(s, d)))),

    // host-level link-quality features: one persisted narrow edge list
    // feeds PageRank + the out/in rollups (html parsed once, never
    // shuffled); every number integer-exact, replayed by the oracle
    "g5_host_link_features" -> ((s, d) =>
      GraphOps.hostLinkFeatures(s, GraphOps.edges(pagesDf(s, d)),
        iterations = PrIters)),

    // the capstone composition: extraction → text tier rules → link
    // endorsement bump (tier 2→3 on hosts with ≥2× mean PageRank mass).
    // The tier table never shuffles — the host side broadcasts.
    "g6_link_tiers" -> ((s, d) => {
      val tiers = TextOps.tierAssign(
        graft.util.CacheOnce(extractedDf(s, d)
          .select(col("url").as("doc_id"), col("text"))))
        .withColumnRenamed("doc_id", "url")
      val feats = GraphOps.hostLinkFeatures(s, GraphOps.edges(pagesDf(s, d)),
        iterations = PrIters)
      GraphOps.linkTiers(tiers, feats)
    }),

    // crawl frontier: per-edge rows aggregate FIRST (partial agg on the
    // skewed target key), THEN the anti-join against the crawled set —
    // one narrow row per distinct target crosses the second exchange
    "g7_frontier" -> ((s, d) =>
      GraphOps.frontier(GraphOps.edges(pagesDf(s, d)), pagesDf(s, d))),

    // host quality prior: per-host tier composition + integer basis-point
    // mid+high share — the crawl-time deprioritization signal
    "g8_host_quality" -> ((s, d) =>
      GraphOps.hostQuality(TextOps.tierAssign(
          graft.util.CacheOnce(extractedDf(s, d)
            .select(col("url").as("doc_id"), col("text"))))
        .withColumnRenamed("doc_id", "url"))),

    // TrustRank: PageRank personalized to a trusted seed set (teleport +
    // dangling mass land only on seeds) — the spam-demotion companion to
    // g3. Seeds here: a deterministic pseudo-whitelist (~1/7 of linking
    // pages by seeded hash); production passes its curated host list. The
    // narrow edge projection is persisted so the seed derivation and the
    // iteration DAG share one DOM-parse pass (released one-shot).
    "g9_trustrank" -> ((s, d) => {
      val e0 = GraphOps.edges(pagesDf(s, d)).select("src", "target")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val seeds = e0.select(col("src").as("node")).distinct()
        .filter(pmod(TextOps.md5Hash60(concat(lit("seed:"), col("node"))),
          lit(7)) === 0)
      val out = GraphOps.trustRank(s, e0, seeds, iterations = PrIters)
      graft.util.CacheOnce.release(e0)
      out
    }),

    // HITS hubs & authorities: directory pages (hub) vs content pages
    // (authority) — integer floor-renormalised half-steps, bit-identical
    // under any partitioning; same per-iteration plan skeleton as g3
    "g10_hits" -> ((s, d) =>
      GraphOps.hits(s, GraphOps.edges(pagesDf(s, d)), iterations = HitsIters)),

    // reciprocal host-pair links (link-exchange signal): directed host-
    // pair counts self-joined on the flipped key; edge extraction runs
    // once under a CacheOnce'd aggregate
    "g11_reciprocal" -> ((s, d) =>
      GraphOps.reciprocalHosts(GraphOps.edges(pagesDf(s, d)))),

    // ---- similarity search (embeddings table) ---------------------------
    "e1_knn_exact" -> ((s, d) => Ann.cosineKnn(emb(s, d), k = 5)),
    "e2_knn_ivf" -> ((s, d) => Ann.ivfKnn(emb(s, d), k = 5)),
    "e3_label_counts" -> ((s, d) =>
      emb(s, d).groupBy("label").agg(
        count(lit(1)).as("cnt"), sum(col("vec_id")).as("id_sum"))),
    "e4_cosine_dups" -> ((s, d) => Ann.cosineDupPairs(emb(s, d), threshold = 0.42)),

    // IVF recall as a correctness row, not just a bench number: one row
    // (hits, total_pairs) comparing the approximate index against the
    // exact ranking — integer-exact, so a recall regression fails the
    // driver's hash compare loudly.
    "e5_ivf_recall" -> ((s, d) => {
      val exact = Ann.cosineKnn(emb(s, d), k = 5).select("vec_id", "neighbor_id")
      val approx = Ann.ivfKnn(emb(s, d), k = 5).select("vec_id", "neighbor_id")
        .withColumn("m", lit(1L))
      exact.join(approx, Seq("vec_id", "neighbor_id"), "left")
        .agg(count(lit(1)).as("total_pairs"),
          coalesce(sum(col("m")), lit(0L)).as("hits"))
    }),

    // SRP (hyperplane) LSH near-dup — the IVF-free embedding dedup scale
    // path; the signature, banding and surviving pairs are all replayed
    // by the oracle.
    "e6_srp_dups" -> ((s, d) => Ann.srpDupPairs(emb(s, d), threshold = 0.42)),

    // IVF-SQ: int8 scalar-quantized codes (the 4x memory path) ranked by
    // exact integer dot inside IVF cells — ranks AND dots hash-checked.
    "e8_sq_knn" -> ((s, d) => Ann.sqKnn(emb(s, d), k = 5)),

    // IVF-PQ with asymmetric distance (ADC): per-subspace integer-exact
    // Lloyd codebooks (md5-stride "pq:" seeds), M-int codes, ranking by
    // the exact integer dot of the query's TRUE SQ codes against the
    // neighbor's PQ reconstruction inside IVF cells — codebook training,
    // codes, reconstructions, adots and ranks all replayed by the oracle.
    "e12_pq_knn" -> ((s, d) => Ann.pqKnn(emb(s, d), k = 5)),
    "e13_pq_rerank" -> ((s, d) => Ann.pqRerankKnn(emb(s, d), k = 5)),

    // persisted PQ model (PqIndex): ranges/codebook/centroids/codes
    // frozen through the TableIO seam, then self-queried — bit-identical
    // to the inline e12 chain, so it replays e12's oracle SQL
    "e18_pq_persisted" -> ((s, d) => {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_e18_" + new java.io.File(d).getName).toString
      val e = emb(s, d)
      graft.sim.PqIndex.build(s, e, graft.io.ParquetTableIO, root)
      graft.sim.PqIndex.query(s, graft.io.ParquetTableIO, root, e, k = 5)
    }),

    // Matryoshka funnel retrieval: prefix-dim (d/4) cosine shortlist
    // inside the probed IVF cells, exact full-dim re-rank of survivors
    // only — the training-free counterpart of e13's PQ/ADC path
    "e17_mrl_rerank" -> ((s, d) => Ann.mrlRerankKnn(emb(s, d), k = 5)),

    // build-once/query-many persisted IVF (AnnIndex): index built into a
    // scratch root through the TableIO seam, then self-queried — bit-
    // identical to the inline e2 plan, so it shares e2's oracle replay
    "e14_persisted_ivf" -> ((s, d) => {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_e14_" + new java.io.File(d).getName).toString
      val e = emb(s, d)
      AnnIndex.build(s, e, graft.io.ParquetTableIO, root)
      AnnIndex.query(s, graft.io.ParquetTableIO, root, e, k = 5)
    }),

    // incremental ingest into the persisted index: build on 3/4 of the
    // corpus (frozen centroids), append the held-out 1/4 with NO retrain,
    // self-query the whole set — centroid training replayed over the base
    // subset only, assignment over everything
    "e16_ivf_append" -> ((s, d) => {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        "graft_e16_" + new java.io.File(d).getName).toString
      val e = emb(s, d)
      AnnIndex.build(s, e.filter(col("vec_id") % 4 =!= 0),
        graft.io.ParquetTableIO, root)
      AnnIndex.append(s, graft.io.ParquetTableIO, root,
        e.filter(col("vec_id") % 4 === 0))
      AnnIndex.query(s, graft.io.ParquetTableIO, root, e, k = 5)
    }),

    // ---- deterministic integer-exact k-means (Lloyd, 2 fixed rounds)
    // over the SQ code space — cluster-balanced sampling / SemDeDup's
    // clustering stage; broadcast centroids + map-side-combinable argmin
    "e10_kmeans" -> ((s, d) => Ann.kmeansAssign(emb(s, d), k = 8, iters = 2)),

    // cluster-balanced subsample: ≤10 per semantic cluster by seeded-hash
    // order — the diversity cap; rank → WindowGroupLimit partial top-m
    "e11_cluster_sample" -> ((s, d) => Ann.clusterSample(emb(s, d), m = 10)),

    // SemDeDup (Abbas et al.): within-k-means-cluster semantic prune —
    // farthest-from-centroid-first rank (integer SQ dist), drop any doc
    // with cosine > τ to an earlier-ranked cluster-mate; one
    // within-cluster equi-join, n²/k not n²
    "e15_semdedup" -> ((s, d) => Ann.semDedup(emb(s, d), tau = 0.42)),

    // near-dup pairs → transitive duplicate CLUSTERS → one keeper each:
    // the step that makes pairwise dedup actually delete (A~B, B~C must
    // collapse {A,B,C} to one doc). Distributed min-label propagation;
    // the oracle reproduces the unique fixpoint by recursive reachability.
    "e9_dup_components" -> ((s, d) =>
      graft.sim.Components.dupComponents(s, emb(s, d), threshold = 0.42)),

    // Hierarchical (coarse->fine) IVF — the past-the-cap scale path,
    // hash-checked like the flat index: the two-level assignment and the
    // per-cell knn are replayed by the oracle. Parameters sized so the
    // two-level structure is real at test scale (8 coarse cells, ~n/64
    // fine centroids spread over them).
    "e7_knn_ivf_hier" -> ((s, d) => Ann.ivfKnnHierarchical(emb(s, d), k = 5,
      coarseCells = 8, finePerCoarse = 8, nprobeCoarse = 2, nprobe = 4)),

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
    }),

    // gap-based sessionization (30-min inactivity cut): per-key windowed
    // state in ONE shuffle — the telemetry op behind crawl-scheduler and
    // usage-analytics tables (graft.rel.EventOps scaladoc for plan shape)
    "q4_sessionize" -> ((s, d) =>
      graft.rel.EventOps.sessionize(s.read.parquet(s"$d/events.parquet"), gapMinutes = 30)),

    // the scale-safe two-phase form of q4 (hot keys split across time
    // chunks, stitched over per-chunk summary rows): result-identical by
    // construction, so it replays q4's oracle SQL unchanged
    "q4b_sessionize_chunked" -> ((s, d) =>
      graft.rel.EventOps.sessionizeChunked(
        s.read.parquet(s"$d/events.parquet"), gapMinutes = 30, chunkMinutes = 120)),

    // as-of join (most recent order per event) via the union+last-non-null
    // pattern: zero row expansion vs the inequality join the oracle runs at
    // toy scale — THE point-in-time lookup shape for 10^12-row tables
    "q5_asof_join" -> ((s, d) =>
      graft.rel.EventOps.asofJoin(
        s.read.parquet(s"$d/events.parquet"),
        s.read.parquet(s"$d/orders.parquet"))),

    // deterministic HLL registers (p=6) for distinct users per event_type:
    // sketch-based distinct counting whose exchange carries 64 rows per
    // group, not the corpus — integer-exact and hash-checked, unlike
    // approx_count_distinct's engine-private HLL++ layout
    "q6_hll_users" -> ((s, d) =>
      graft.rel.EventOps.hllRegisters(
        s.read.parquet(s"$d/events.parquet"), "event_type", col("user_id"), p = 6)),

    // ordered conversion funnel view→click→purchase: chained per-user min
    // aggregations, every join on the SAME key (co-partitioned under AQE);
    // no window over a user's history, no collect_list
    "q7_funnel" -> ((s, d) =>
      graft.rel.EventOps.funnel(s.read.parquet(s"$d/events.parquet"))),

    // k-step parameterized funnel (k=5 here): the same chained min-agg
    // fold at arbitrary depth — the oracle replays the 5-step chain
    "q7k_funnel5" -> ((s, d) =>
      graft.rel.EventOps.funnelSteps(s.read.parquet(s"$d/events.parquet"),
        Seq("signup", "view", "click", "purchase", "error"))),

    // count-min sketch counters (4x256) over user activity: the exchange
    // carries at most d*w partial-aggregated counter rows, never the
    // events; shard sketches merge by elementwise sum
    "q8_cms_counters" -> ((s, d) =>
      graft.rel.EventOps.cmsCounters(
        s.read.parquet(s"$d/events.parquet"), col("user_id"), d = 4, w = 256)),

    // binned range join: value bands (incl. one overlapping "alert" band
    // -> multi-match) resolved as bin equi-join + post-filter, never a
    // BroadcastNestedLoop inequality join — the 10^12-row range-join shape
    "q9_range_join" -> ((s, d) => {
      val ranges = s.createDataFrame(Seq(
        ("tiny", 0.0, 1.0), ("small", 1.0, 5.0), ("mid", 5.0, 25.0),
        ("large", 25.0, 100.0), ("huge", 100.0, 500.0),
        ("alert", 90.0, 110.0))).toDF("band", "lo", "hi")
      graft.rel.EventOps.rangeBinJoin(
          s.read.parquet(s"$d/events.parquet").select(col("event_id"), col("value")),
          col("value"), ranges, binWidth = 25.0)
        .select(col("event_id"), col("band"))
    })
  )

  /** DuckDB oracle SQL (driver runs at sf0.01 with tables registered from
    * the same dir; `pages` + golden sidecars are read from the
    * materialised parquet paths). */
  def oracleSql: Map[String, String] = oracleSqlFor("sf0.01")

  /** SF-parametric oracle map: `Verify`/`VerifyOne` dump the map for the
    * sf they actually ran, so a local sf0.001 replay compares against
    * sf0.001 pages instead of spuriously failing every pages-derived
    * query against the driver's sf0.01 tables. The l2/l3/l5 expectation
    * sidecars are committed per-sf (`tools/gen_layout_sidecars.py <sf>`);
    * when none exists for the requested sf those three entries are
    * DROPPED from the map (the checker then skips them) rather than
    * comparing against another scale's expectations. */
  def oracleSqlFor(sf: String): Map[String, String] = {
    val pagesDir = PagesTable.dirFor(sf)
    val pages = s"read_parquet('$pagesDir/*.parquet')"
    // resolved outlink edge list shared by the web-graph oracles (g1-g4):
    // the regex replays the DOM walk because PageGen links are flat (see
    // the x14 comment); two same-select unnests zip positionally in DuckDB
    val edgeSql =
      s"""SELECT url AS src, anchor,
            CASE WHEN href LIKE '%://%' THEN href
                 ELSE regexp_extract(url, '^[a-z]+://[^/]+') || href
            END AS target
          FROM (SELECT url,
                  unnest(regexp_extract_all(decode(html),
                    '<a href="([^"]*)">([^<]*)</a>', 1)) AS href,
                  unnest(regexp_extract_all(decode(html),
                    '<a href="([^"]*)">([^<]*)</a>', 2)) AS anchor
                FROM $pages)"""
    // the integer-exact PageRank replay (PrIters iterations unrolled),
    // shared by g3 (whole result) and g5/g6 (nested-WITH subquery)
    val pagerankSelect = {
      val iters = (1 to PrIters).map { i =>
        val p = i - 1
        s"""in$i AS (SELECT ed.target AS node,
               CAST(sum(m.mass * 85 // 100 // m.od) AS BIGINT) AS im
             FROM ed JOIN m$p m ON ed.src = m.node GROUP BY 1),
           ds$i AS (SELECT CAST(coalesce(sum(mass * 85 // 100), 0)
               AS BIGINT) AS ds
             FROM m$p WHERE od = 0),
           m$i AS (SELECT m.node, m.od,
               CAST(150000000000 + coalesce(i.im, 0)
                 + (SELECT ds FROM ds$i) // (SELECT c FROM nn)
               AS BIGINT) AS mass
             FROM m$p m LEFT JOIN in$i i USING (node))"""
      }.mkString(",\n")
      s"""WITH ed AS ($edgeSql),
          nodes AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM ed
             UNION ALL SELECT target FROM ed)),
          deg AS (SELECT src AS node, count(*) AS od FROM ed GROUP BY 1),
          nn AS (SELECT count(*) AS c FROM nodes),
          m0 AS (SELECT n.node, coalesce(d.od, 0) AS od,
              CAST(1000000000000 AS BIGINT) AS mass
            FROM nodes n LEFT JOIN deg d USING (node)),
          $iters
          SELECT node, mass FROM m$PrIters"""
    }
    // TrustRank replay: identical integer iteration, but mass starts on
    // the seed set only and teleport + dangling mass land only on seeds
    val trustrankSelect = {
      val iters = (1 to PrIters).map { i =>
        val p = i - 1
        s"""tin$i AS (SELECT ed.target AS node,
               CAST(sum(m.mass * 85 // 100 // m.od) AS BIGINT) AS im
             FROM ed JOIN t$p m ON ed.src = m.node GROUP BY 1),
           tds$i AS (SELECT CAST(coalesce(sum(mass * 85 // 100), 0)
               AS BIGINT) AS ds
             FROM t$p WHERE od = 0),
           t$i AS (SELECT m.node, m.od, m.is_seed,
               CAST(coalesce(i.im, 0)
                 + CASE WHEN m.is_seed = 1
                     THEN 150000000000
                       + (SELECT ds FROM tds$i) // (SELECT c FROM nseeds)
                     ELSE 0 END
               AS BIGINT) AS mass
             FROM t$p m LEFT JOIN tin$i i USING (node))"""
      }.mkString(",\n")
      s"""WITH ed AS ($edgeSql),
          nodes AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM ed
             UNION ALL SELECT target FROM ed)),
          deg AS (SELECT src AS node, count(*) AS od FROM ed GROUP BY 1),
          seeds AS (SELECT DISTINCT src AS node FROM ed
                    WHERE CAST(('0x' || substr(md5('seed:' || src), 1, 15))
                            AS BIGINT) % 7 = 0),
          nseeds AS (SELECT count(*) AS c FROM seeds),
          t0 AS (SELECT n.node, coalesce(d.od, 0) AS od,
              CASE WHEN s.node IS NULL THEN 0 ELSE 1 END AS is_seed,
              CAST(CASE WHEN s.node IS NULL THEN 0
                   ELSE 1000000000000 END AS BIGINT) AS mass
            FROM nodes n LEFT JOIN deg d USING (node)
            LEFT JOIN seeds s USING (node)),
          $iters
          SELECT node, mass FROM t$PrIters"""
    }
    // HITS replay: per round, raw auth = sum of source hubs per target,
    // floor-renormalised by max(1, total // n // initMass); then the
    // mirror half-step for hubs. Zero-degree nodes restored at the end.
    val hitsSelect = {
      val hm = graft.graph.GraphOps.DefaultHitsMass
      val iters = (1 to HitsIters).map { i =>
        val p = i - 1
        s"""ar$i AS (SELECT ed.target AS node,
               CAST(sum(h$p.hub) AS BIGINT) AS araw
             FROM ed JOIN h$p ON ed.src = h$p.node GROUP BY 1),
           a$i AS (SELECT node, CAST(araw // greatest(1,
               (SELECT sum(araw) FROM ar$i) // (SELECT c FROM nn)
                 // $hm) AS BIGINT) AS auth
             FROM ar$i),
           hr$i AS (SELECT ed.src AS node,
               CAST(sum(a$i.auth) AS BIGINT) AS hraw
             FROM ed JOIN a$i ON ed.target = a$i.node GROUP BY 1),
           h$i AS (SELECT node, CAST(hraw // greatest(1,
               (SELECT sum(hraw) FROM hr$i) // (SELECT c FROM nn)
                 // $hm) AS BIGINT) AS hub
             FROM hr$i)"""
      }.mkString(",\n")
      s"""WITH ed AS ($edgeSql),
          nodes AS (SELECT DISTINCT node FROM
            (SELECT src AS node FROM ed
             UNION ALL SELECT target FROM ed)),
          nn AS (SELECT count(*) AS c FROM nodes),
          h0 AS (SELECT node, CAST($hm AS BIGINT) AS hub
                 FROM nodes),
          $iters
          SELECT n.node, coalesce(a.auth, 0) AS auth,
            coalesce(h.hub, 0) AS hub
          FROM nodes n
          LEFT JOIN a$HitsIters a ON n.node = a.node
          LEFT JOIN h$HitsIters h ON n.node = h.node"""
    }
    val hostRe = "'^[a-z]+://([^/]+)'"
    // per-host feature rollup over the PageRank replay — shared g5/g6
    val hostMassSql =
      s"""SELECT regexp_extract(node, $hostRe, 1) AS host,
            CAST(sum(mass) AS BIGINT) AS pr_mass
          FROM pr GROUP BY 1"""
    val spansG = s"read_parquet('${pagesDir}_spans/*.parquet')"
    val metaG = s"read_parquet('${pagesDir}_meta/*.parquet')"
    // expectation sidecars for the derived-box-set queries, produced by
    // executing the reference's own merge/column algorithms over the
    // span geometry (tools/gen_layout_sidecars.py; committed). The
    // committed files are sf0.01-scale because the driver's DuckDB
    // oracle pass runs at sf0.01 — as is this whole map (every pages
    // path above is dirFor("sf0.01")). Resolution anchors on the repo
    // root by walking UP from the cwd until the committed sidecar dir
    // appears (the driver runs from the repo root; a caller invoked
    // from a subdirectory or another checkout location still resolves
    // its own committed sidecars), falling back to cwd-relative.
    val sidecars = {
      val rel = "src/test/resources/golden/sidecars"
      def walkUp(d: java.io.File): Option[java.io.File] =
        if (d == null) None
        else if (new java.io.File(d, rel).isDirectory) Some(new java.io.File(d, rel))
        else walkUp(d.getParentFile)
      walkUp(new java.io.File(".").getCanonicalFile)
        .getOrElse(new java.io.File(rel)).getAbsolutePath
    }
    val tok = "string_split_regex(trim(text), '\\s+')"
    val shingles =
      s"""(SELECT doc_id, unnest(
            [array_to_string(w[i:i+2], ' ')
             for i in generate_series(1, greatest(length(w)-2, 1))]) AS s
          FROM (SELECT doc_id, $tok AS w FROM documents) t)"""
    def h60(e: String) = s"CAST(('0x' || substr(md5($e),1,15)) AS BIGINT)"
    // word n-grams mirroring TextOps.grams (short texts degrade to one
    // truncated gram)
    def gramsSql(n: Int, src: String = "documents") =
      s"""(SELECT doc_id, unnest(
            [array_to_string(w[i:i+${n - 1}], ' ')
             for i in generate_series(1, greatest(length(w)-${n - 1}, 1))]) AS g
          FROM (SELECT doc_id, $tok AS w FROM $src) t)"""
    // tier-assignment replay over any (doc_id, text) source — shared by
    // t18 (documents table) and x9 (the extracted pages corpus)
    def tierSql(src: String, idOut: String) = {
      val stops = TextOps.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH base AS (
            SELECT doc_id, md5(text) AS h,
              length($tok) AS n_tokens,
              length(list_distinct($tok)) AS n_distinct,
              length(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                x -> list_contains($stops, x))) AS stop_tokens
            FROM $src),
          keep AS (SELECT h, min(doc_id) AS keep_id FROM base GROUP BY h),
          cnt AS (SELECT doc_id, g, count(*) AS cnt
                  FROM ${gramsSql(8, src)} GROUP BY 1, 2),
          gdf AS (SELECT g, count(*) AS df FROM cnt GROUP BY g),
          cov AS (SELECT doc_id,
                    sum(CASE WHEN df >= 2 THEN cnt ELSE 0 END) AS dup_positions,
                    sum(cnt) AS n_positions
                  FROM cnt JOIN gdf USING (g) GROUP BY doc_id),
          s AS (SELECT base.*, keep_id, dup_positions, n_positions
                FROM base JOIN keep USING (h) JOIN cov USING (doc_id)),
          r AS (SELECT doc_id,
                  (n_tokens < 20) AS b0, (doc_id <> keep_id) AS b1,
                  (dup_positions * 2 >= n_positions) AS b2,
                  (n_distinct * 10 < n_tokens * 4) AS b3,
                  (stop_tokens = 0) AS b4,
                  (dup_positions * 5 >= n_positions) AS b5,
                  (stop_tokens * 20 >= n_tokens AND n_distinct * 2 >= n_tokens
                   AND n_tokens >= 40) AS b6
                FROM s)
          SELECT doc_id AS $idOut,
            CASE WHEN b0 OR b1 OR b2 THEN 0
                 WHEN b3 OR b4 OR b5 THEN 1
                 WHEN b6 THEN 3 ELSE 2 END AS tier,
            CAST((CASE WHEN b0 THEN 1 ELSE 0 END) + (CASE WHEN b1 THEN 2 ELSE 0 END)
               + (CASE WHEN b2 THEN 4 ELSE 0 END) + (CASE WHEN b3 THEN 8 ELSE 0 END)
               + (CASE WHEN b4 THEN 16 ELSE 0 END) + (CASE WHEN b5 THEN 32 ELSE 0 END)
               + (CASE WHEN b6 THEN 64 ELSE 0 END) AS BIGINT) AS reasons
          FROM r"""
    }
    val minhashSql =
      (s"SELECT doc_id, " +
       (0 until 8).map(i => s"min(${h60(s"'$i:' || s")}) AS h$i").mkString(", ") +
       s" FROM $shingles GROUP BY doc_id")
    // recursive reachability over the SAME banded pair derivation as
    // t11: component(d) = min doc_id reachable — the unique fixpoint the
    // Spark-side label propagation converges to. Ends in `comp(doc_id,
    // component)`; shared by t21 (keeper bit) and t36 (cluster split).
    val keeperCte = {
      def bucket(b: Int) = (0 until 4)
        .map(k => s"CAST(h${b * 4 + k} AS VARCHAR)").mkString(" || ',' || ")
      s"""WITH RECURSIVE sig AS ($minhashSql),
          banded AS (
            SELECT doc_id, 0 AS band, md5(${bucket(0)}) AS bucket FROM sig
            UNION ALL
            SELECT doc_id, 1 AS band, md5(${bucket(1)}) AS bucket FROM sig),
          prs AS (
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id),
          edges AS (SELECT a AS src, b AS dst FROM prs
                    UNION ALL SELECT b, a FROM prs),
          reach AS (
            SELECT doc_id AS v, doc_id AS r FROM documents
            UNION
            SELECT e.src, reach.r FROM edges e JOIN reach ON reach.v = e.dst),
          comp AS (SELECT v AS doc_id, min(r) AS component
                   FROM reach GROUP BY v)"""
    }
    // integer-exact k-means replay (e10): e8's quantization CTEs, md5
    // "k:" stride seeds, then 2 unrolled Lloyd rounds — floor-mean
    // centroid update (sum // count over non-negative codes == Spark's
    // div), exact squared-L2 assignment with cluster-asc ties, empty
    // clusters keep their previous centroid via the LEFT JOIN coalesce
    // CTE chain ending in the final assignment `a2` — shared by e10
    // (whole result) and e11 (per-cluster seeded cap on top)
    val kmeansCtes = {
      val distSql = (c: String) =>
        s"""SELECT ql.vec_id, c.cluster,
              CAST(list_sum([(ql.qv[j] - c.cv[j]) * (ql.qv[j] - c.cv[j])
                for j in generate_series(1, len(ql.qv))]) AS BIGINT) AS dist
            FROM ql CROSS JOIN $c c"""
      def assignSql(i: Int) =
        s"""d$i AS (${distSql(s"c$i")}),
            a$i AS (SELECT vec_id, cluster, dist FROM (
                      SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY dist ASC, cluster ASC) AS rn FROM d$i)
                    WHERE rn = 1)"""
      val rounds = (1 to 2).map { i =>
        s"""u$i AS (SELECT a.cluster, q.j,
                CAST(sum(q.q) // count(*) AS BIGINT) AS cq
              FROM a${i - 1} a JOIN q ON q.vec_id = a.vec_id GROUP BY 1, 2),
            ul$i AS (SELECT cluster, list(cq ORDER BY j) AS cv
                     FROM u$i GROUP BY cluster),
            c$i AS (SELECT p.cluster, coalesce(n.cv, p.cv) AS cv
                    FROM c${i - 1} p LEFT JOIN ul$i n USING (cluster)),
            ${assignSql(i)}"""
      }.mkString(",\n")
      s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
          ex AS (SELECT vec_id, unnest(range(len(e))) AS j, unnest(e) AS x FROM v),
          rng AS (SELECT j, min(x) AS mn, max(x) AS mx FROM ex GROUP BY j),
          q AS (SELECT vec_id, j,
                  CASE WHEN mx = mn THEN 0
                       ELSE CAST(floor((x - mn) * 127.0 / (mx - mn)) AS BIGINT)
                  END AS q
                FROM ex JOIN rng USING (j)),
          ql AS (SELECT vec_id, list(q ORDER BY j) AS qv FROM q GROUP BY vec_id),
          par AS (SELECT greatest(1, count(*) // 8) AS stride FROM v),
          c0 AS (SELECT vec_id AS cluster, qv AS cv FROM ql, par
                 WHERE ${h60("'k:' || CAST(vec_id AS VARCHAR)")} % stride = 0),
          ${assignSql(0)},
          $rounds"""
    }
    val kmeansSelect = s"WITH $kmeansCtes SELECT vec_id, cluster, dist FROM a2"
    // IVF assignment replay (shared by e2/e4): deterministic md5-sampled
    // centroids, rank by cosine desc with cell-asc tie-break
    def ivfAssignSql(nprobe: Int) =
      s"""v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
          par AS (SELECT count(*) AS n,
                         greatest(4, least(4096, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS cells
                  FROM v),
          cent AS (SELECT vec_id AS cell, e AS c FROM v, par
                   WHERE ${h60("'c:' || CAST(vec_id AS VARCHAR)")} % greatest(1, n // cells) = 0),
          assign AS (SELECT vec_id, cell, e,
                            row_number() OVER (PARTITION BY vec_id
                              ORDER BY list_cosine_similarity(e, c) DESC, cell ASC) AS rn
                     FROM v CROSS JOIN cent)"""
    // IVF-PQ/ADC replay (e12, and e13's shortlist stage): e8's
    // quantization CTEs, the code vector cut into 8 subspaces,
    // per-subspace integer-exact Lloyd (md5 "pq:" stride seeds,
    // floor-mean update, empty cells keep previous centroid), codes from
    // the post-update assignment, neighbor reconstruction = concatenated
    // centroids, and the asymmetric integer dot (true query codes x
    // reconstruction) ranked desc with id-asc ties inside the shared IVF
    // cells. `topk` parameterizes the rank cut (5 = e12's answer; 20 =
    // e13's shortlist).
    def pqAdcSql(topk: Int) = {
      def pqAssignSql(i: Int) =
        s"""pd$i AS (SELECT l.vec_id, l.sub, c.cluster,
              CAST(list_sum([(l.sv[j] - c.cv[j]) * (l.sv[j] - c.cv[j])
                for j in generate_series(1, len(l.sv))]) AS BIGINT) AS dist
            FROM sv2 l JOIN pc$i c ON l.sub = c.sub),
            pa$i AS (SELECT vec_id, sub, cluster FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                ORDER BY dist ASC, cluster ASC) AS rn FROM pd$i)
            WHERE rn = 1)"""
      s"""WITH ${ivfAssignSql(4)},
          ex AS (SELECT vec_id, unnest(range(len(e))) AS j, unnest(e) AS x FROM v),
          rng AS (SELECT j, min(x) AS mn, max(x) AS mx FROM ex GROUP BY j),
          q AS (SELECT vec_id, j,
                  CASE WHEN mx = mn THEN 0
                       ELSE CAST(floor((x - mn) * 127.0 / (mx - mn)) AS BIGINT)
                  END AS q
                FROM ex JOIN rng USING (j)),
          ql AS (SELECT vec_id, list(q ORDER BY j) AS qv FROM q GROUP BY vec_id),
          svx AS (SELECT vec_id, unnest(generate_series(0, 7)) AS sub, qv FROM ql),
          sv2 AS (SELECT vec_id, sub,
                    qv[sub * (len(qv) // 8) + 1 : (sub + 1) * (len(qv) // 8)] AS sv
                  FROM svx),
          spar AS (SELECT greatest(1, count(*) // 16) AS stride FROM ql),
          pc0 AS (SELECT sub, vec_id AS cluster, sv AS cv FROM sv2, spar
                  WHERE ${h60("'pq:' || CAST(vec_id AS VARCHAR)")} % stride = 0),
          ${pqAssignSql(0)},
          pu1 AS (SELECT a.sub, a.cluster, t.j,
                    CAST(sum(t.x) // count(*) AS BIGINT) AS cq
                  FROM pa0 a JOIN (SELECT vec_id, sub, unnest(range(len(sv))) AS j,
                                     unnest(sv) AS x FROM sv2) t
                    ON t.vec_id = a.vec_id AND t.sub = a.sub
                  GROUP BY 1, 2, 3),
          pul1 AS (SELECT sub, cluster, list(cq ORDER BY j) AS cv
                   FROM pu1 GROUP BY 1, 2),
          pc1 AS (SELECT p.sub, p.cluster, coalesce(n.cv, p.cv) AS cv
                  FROM pc0 p LEFT JOIN pul1 n USING (sub, cluster)),
          ${pqAssignSql(1)},
          recon AS (SELECT a.vec_id, flatten(list(c.cv ORDER BY a.sub)) AS rv
                    FROM pa1 a JOIN pc1 c USING (sub, cluster)
                    GROUP BY a.vec_id),
          probes AS (SELECT vec_id, cell FROM assign WHERE rn <= 4),
          home AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
          pairs AS (SELECT l.vec_id AS a, r.vec_id AS b
                    FROM probes l JOIN home r
                      ON l.cell = r.cell AND l.vec_id <> r.vec_id),
          adots AS (SELECT p.a, p.b,
                      CAST(list_sum([qa.qv[j] * rb.rv[j]
                        for j in generate_series(1, len(qa.qv))]) AS BIGINT) AS adot
                    FROM pairs p JOIN ql qa ON qa.vec_id = p.a
                    JOIN recon rb ON rb.vec_id = p.b)
          SELECT vec_id, neighbor_id, rank, adot FROM (
            SELECT a AS vec_id, b AS neighbor_id, adot,
              row_number() OVER (PARTITION BY a
                ORDER BY adot DESC, b ASC) AS rank FROM adots)
          WHERE rank <= $topk"""
    }

    val ivfKnnSql =
      s"""WITH ${ivfAssignSql(4)},
          probes AS (SELECT * FROM assign WHERE rn <= 4),
          home AS (SELECT * FROM assign WHERE rn = 1),
          sims AS (SELECT l.vec_id AS a, r.vec_id AS b,
                          list_cosine_similarity(l.e, r.e) AS sim
                   FROM probes l JOIN home r
                     ON l.cell = r.cell AND l.vec_id <> r.vec_id)
          SELECT a AS vec_id, b AS neighbor_id, rank FROM (
            SELECT a, b, row_number() OVER (PARTITION BY a
              ORDER BY sim DESC, b ASC) AS rank FROM sims)
          WHERE rank <= 5"""

    // shared bigram-LM CTE chain (t29 final select; t33 reuses the chain
    // and keeps only avg_bp before bucketing)
    val lmScoreCtes =
      s"""w AS (SELECT doc_id, $tok AS w FROM documents),
          bg AS (SELECT doc_id, u.p AS p, u.g AS g FROM (
                   SELECT doc_id,
                     unnest([{'p': w[i], 'g': w[i] || ' ' || w[i+1]}
                             for i in generate_series(1, length(w) - 1)])
                       AS u
                   FROM w WHERE length(w) >= 2) q),
          c2 AS (SELECT g, p, count(*) AS c2 FROM bg GROUP BY 1, 2),
          c1 AS (SELECT p, count(*) AS c1 FROM bg GROUP BY 1),
          model AS (SELECT g, (10000 * c2.c2) // c1.c1 AS bp
                    FROM c2 JOIN c1 USING (p)),
          docc AS (SELECT doc_id, g, count(*) AS occ FROM bg GROUP BY 1, 2)"""
    // language-ID as a nested subquery (t9's CASE chain without CTE
    // names, so composers can alias it into any WITH block)
    val langIdSubquery = {
      val stops = graft.text.LangId.profiles.map { case (lang, ws) =>
        lang -> ws.map(w => s"'$w'").mkString("[", ", ", "]")
      }
      val scoreCols = stops.map { case (lang, lst) =>
        s"length(list_intersect(w, $lst)) AS s_$lang"
      }.mkString(", ")
      val caseArms = graft.text.LangId.profiles.dropRight(1)
        .map { case (lang, _) => s"WHEN s_$lang = m THEN '$lang'" }
        .mkString(" ")
      val lastLang = graft.text.LangId.profiles.last._1
      val maxExpr = graft.text.LangId.profiles.map(p => s"s_${p._1}").mkString(", ")
      s"""SELECT doc_id, CASE $caseArms ELSE '$lastLang' END AS pred_lang
          FROM (SELECT *, greatest($maxExpr) AS m
                FROM (SELECT doc_id, $scoreCols
                      FROM (SELECT doc_id,
                              string_split_regex(trim(lower(text)), '\\s+') AS w
                            FROM documents)))"""
    }

    // e16 replay: centroid training (count, stride, md5 "c:" seeds) over
    // the base 3/4 subset ONLY; assignment/home/knn over the full set —
    // exactly what build(base) + append(rest) + query(all) serves
    val ivfAppendSql =
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
          vb AS (SELECT * FROM v WHERE vec_id % 4 <> 0),
          par AS (SELECT count(*) AS n,
                         greatest(4, least(4096, CAST(ceil(sqrt(count(*))) AS BIGINT))) AS cells
                  FROM vb),
          cent AS (SELECT vec_id AS cell, e AS c FROM vb, par
                   WHERE ${h60("'c:' || CAST(vec_id AS VARCHAR)")} % greatest(1, n // cells) = 0),
          assign AS (SELECT vec_id, cell, e,
                            row_number() OVER (PARTITION BY vec_id
                              ORDER BY list_cosine_similarity(e, c) DESC, cell ASC) AS rn
                     FROM v CROSS JOIN cent),
          probes AS (SELECT * FROM assign WHERE rn <= 4),
          home AS (SELECT * FROM assign WHERE rn = 1),
          sims AS (SELECT l.vec_id AS a, r.vec_id AS b,
                          list_cosine_similarity(l.e, r.e) AS sim
                   FROM probes l JOIN home r
                     ON l.cell = r.cell AND l.vec_id <> r.vec_id)
          SELECT a AS vec_id, b AS neighbor_id, rank FROM (
            SELECT a, b, row_number() OVER (PARTITION BY a
              ORDER BY sim DESC, b ASC) AS rank FROM sims)
          WHERE rank <= 5"""

    val all = Map(
      "x1_extract_text" -> s"SELECT url, text FROM $pages",
      "x2_extract_stats" -> s"SELECT url, length(text) AS text_chars FROM $pages",
      "x3_resume_antijoin" ->
        (s"SELECT url FROM $pages WHERE CAST(regexp_extract(url, 'articles/(\\d+)', 1) AS BIGINT) % 3 <> 0"),
      "x4_lang_metrics" ->
        (s"SELECT lang, count(*) AS docs, CAST(sum(octet_length(html)) AS BIGINT) AS html_bytes FROM $pages GROUP BY lang"),
      "x5_spans" ->
        (s"""SELECT url, kind, tag AS label, start, "end", line FROM $spansG"""),
      "l1_reading_order" ->
        s"SELECT url, kind AS label, line, x, y, w, h FROM $spansG",
      "l1b_order_perm" ->
        (s"""SELECT url, CAST(n_spans AS BIGINT) AS n_blocks,
               CAST(n_spans AS BIGINT) * (n_spans + 1) // 2 AS ord_sum,
               1 AS ord_min, n_spans AS ord_max,
               CAST(n_spans AS BIGINT) AS n_ord_distinct
             FROM $metaG"""),
      "l4_projection_lines" ->
        s"SELECT url, n_lines, CAST(line_h_sum AS BIGINT) AS line_height_sum FROM $metaG",
      // reference-executed expectations (merge_all_regions_with_stats /
      // merge_3_new / the validated column chain) over the derived
      // jittered box sets — see tools/gen_layout_sidecars.py
      "l2_merge_ensemble" ->
        (s"""SELECT url, CAST(n_merged AS INT) AS n_merged,
               CAST(order_sum AS BIGINT) AS order_sum
             FROM read_parquet('$sidecars/${sf}_merge2.parquet')"""),
      "l3_merge3_v3" ->
        (s"""SELECT url, CAST(n_merged AS INT) AS n_merged,
               CAST(order_sum AS BIGINT) AS order_sum
             FROM read_parquet('$sidecars/${sf}_merge3v3.parquet')"""),
      "l5_columns" ->
        (s"""SELECT url, CAST(n_paras AS INT) AS n_paras,
               CAST(n_cols AS INT) AS n_cols,
               CAST(order_sum AS BIGINT) AS order_sum
             FROM read_parquet('$sidecars/${sf}_cols.parquet')"""),
      // stacked single-column geometry: every edge expands exactly to the
      // first blank strip (1px) then pads 5, clamps never bind (margins)
      "l10_postprocess" ->
        (s"""SELECT url, idx, x - 6 AS x1, y - 6 AS y1,
               x + w + 5 AS x2, y + h + 5 AS y2
             FROM $spansG"""),
      // F3 projection replayed in SQL: rint == round here because the
      // 0.24/0.16 scale factors admit no exact .5 ties (see
      // LayoutQueries.geometryProjection); fromXyxy(w) = x2p - x1p
      "l11_geometry_projection" ->
        (s"""SELECT url, idx,
               CAST(round((x / 4000.0) * 960) - 3 AS INT) AS gx,
               CAST(round((y / 8000.0) * 1280) - 3 AS INT) AS gy,
               CAST((round(((x + w) / 4000.0) * 960) + 3)
                    - (round((x / 4000.0) * 960) - 3) AS INT) AS gw,
               CAST((round(((y + h) / 8000.0) * 1280) + 3)
                    - (round((y / 8000.0) * 1280) - 3) AS INT) AS gh
             FROM $spansG"""),
      // one projection line per block; adjacent full-width lines always
      // clear the 0.5 affinity threshold -> one paragraph per page
      "l12_hisam_groups" ->
        s"SELECT url, n_lines, CASE WHEN n_lines > 0 THEN 1 ELSE 0 END AS n_paras FROM $metaG",
      // every paragraph coincides with a block; only table-cell blocks are
      // >=50% inside a zone (they ARE the zones), so dropped = table_cells
      "l6_layout_filter" ->
        (s"""SELECT url, n_spans - table_cells AS kept, table_cells AS dropped
             FROM $metaG"""),
      // synthetic confidence is a pure function of the golden geometry:
      // conf > 0 <=> (31*x + 17*y + idx) % 100 > 10; size filter is a
      // no-op (h >= 20, w >= 8); cap 300 binds only on heavy-tail pages
      "l8_detector_filters" ->
        (s"""SELECT url, CAST(n_raw AS INT) AS n_raw, CAST(n_conf AS INT) AS n_conf,
               CAST(n_conf AS INT) AS n_size,
               CAST(least(n_conf, 300) AS INT) AS n_capped
             FROM (
               SELECT url, count(*) AS n_raw,
                 sum(CASE WHEN (31 * x + 17 * y + idx) % 100 > 10 THEN 1 ELSE 0 END) AS n_conf
               FROM $spansG GROUP BY url)"""),
      "l7_text_attributes" ->
        (s"""SELECT url, CAST(chars AS BIGINT) AS chars,
               CAST(bold_chars AS BIGINT) AS bold_chars,
               CAST(italic_chars AS BIGINT) AS italic_chars,
               CAST(underline_chars AS BIGINT) AS underline_chars,
               CAST(strike_chars AS BIGINT) AS strike_chars,
               CAST(heading_chars AS BIGINT) AS heading_chars,
               CAST(colored_chars AS BIGINT) AS colored_chars,
               CAST(size_px_sum AS BIGINT) AS size_px_sum
             FROM $metaG"""),
      "l9_table_structure" ->
        (s"""SELECT url, n_tables, table_rows AS nrows, table_cells AS ncells,
               CAST(cell_area AS BIGINT) AS cell_area
             FROM $metaG"""),
      "x6_base64" ->
        (s"SELECT url, octet_length(html) AS n_bytes FROM $pages"),
      "x7_sidecar_json" ->
        s"SELECT url, n_spans AS n_regions FROM $metaG",
      "m1_media_meta" ->
        (s"""SELECT url AS media_id, CAST(octet_length(html) AS BIGINT) AS n_bytes,
               CASE WHEN substr(hex(html),1,4) = 'FFD8' THEN 'jpeg'
                    WHEN substr(hex(html),1,8) = '89504E47' THEN 'png'
                    WHEN substr(hex(html),1,8) = '52494646' THEN 'riff'
                    WHEN substr(hex(html),1,8) = '4F676753' THEN 'ogg'
                    WHEN substr(hex(html),9,8) = '66747970' THEN 'mp4'
                    WHEN substr(hex(html),1,2) = '3C' THEN 'html'
                    ELSE 'bin' END AS format,
               CAST(64 + ((octet_length(html) * 2654435761) // 256) % 1857 AS INT) AS width,
               CAST(64 + ((octet_length(html) * 40503) // 16) % 1017 AS INT) AS height,
               CAST(1 + octet_length(html) % 240 AS INT) AS frames
             FROM $pages"""),
      "m2_media_frames" ->
        (s"""SELECT url AS media_id,
               unnest(generate_series(0, CAST(octet_length(html) % 240 AS INT), 10)) AS frame_index
             FROM $pages"""),
      "m3_media_features" ->
        (s"""WITH w AS (SELECT url AS media_id, substr(hex(html), 1, 2048) AS hx FROM $pages),
               b AS (SELECT media_id,
                       CAST(('0x' || substr(hx, 2*i-1, 2)) AS INT) // 8 AS bin
                     FROM (SELECT media_id, hx,
                             unnest(generate_series(1, length(hx) // 2)) AS i
                           FROM w))
             SELECT media_id,
               CAST(sum(CASE WHEN bin = 7 THEN 1 ELSE 0 END) AS BIGINT) AS f7,
               CAST(sum(CASE WHEN bin = 12 THEN 1 ELSE 0 END) AS BIGINT) AS f12,
               CAST(sum(CASE WHEN bin = 13 THEN 1 ELSE 0 END) AS BIGINT) AS f13
             FROM b GROUP BY media_id"""),
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
      "t5_minhash" -> minhashSql,
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
      "t12_quality_signals" ->
        (s"""SELECT doc_id,
               length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS punct_chars,
               length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS upper_chars,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS digit_chars,
               length(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                 x -> list_contains(STOPS, x))) AS stop_tokens,
               length(string_split_regex(trim(text), '\\s+')) AS n_tokens
             FROM documents""").replace("STOPS", "['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'are', 'was', 'for', 'on', 'with', 'as', 'at', 'by', 'it', 'that', 'this']"),
      "t13_regex_tokens" ->
        ("""SELECT doc_id,
              length(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_regex_tokens,
              length(regexp_extract_all(text, '[a-zA-Z]+')) AS n_word_tokens,
              length(regexp_extract_all(text, '[0-9]+')) AS n_num_tokens
            FROM documents"""),
      "t14_simhash_pairs" -> {
        val simhashSql =
          (s"""SELECT doc_id, (
              ${(0 until 16).map(b =>
                s"(CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0 THEN ${1L << b} ELSE 0 END)")
                .mkString(" + ")}
             ) AS simhash
             FROM (SELECT doc_id, ${h60("t.w")} AS h
                   FROM (SELECT doc_id, unnest($tok) AS w FROM documents) t)
             GROUP BY doc_id""")
        s"""WITH sig AS ($simhashSql),
            banded AS (
              SELECT doc_id, simhash, 0 AS band, simhash % 256 AS key FROM sig
              UNION ALL
              SELECT doc_id, simhash, 1 AS band, simhash // 256 AS key FROM sig)
            SELECT a, b, hamming FROM (
              SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
                CAST(bit_count(xor(l.simhash, r.simhash)) AS INT) AS hamming
              FROM banded l JOIN banded r
                ON l.band = r.band AND l.key = r.key AND l.doc_id < r.doc_id)
            WHERE hamming <= 3"""
      },
      "t15_winnow" ->
        (s"""WITH g AS (SELECT doc_id,
                unnest(generate_series(1, greatest(length(text) - 7, 1))) AS p, text
              FROM documents),
             h AS (SELECT doc_id, p, ${h60("substr(text, p, 8)")} AS h FROM g),
             wm AS (SELECT doc_id,
                min(h) OVER (PARTITION BY doc_id ORDER BY p
                  ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
              FROM h)
             SELECT DISTINCT doc_id, fp FROM wm"""),
      "t16_repetition" -> {
        def cnts(n: Int) =
          s"SELECT doc_id, g, count(*) AS cnt FROM ${gramsSql(n)} GROUP BY 1, 2"
        def top(n: Int, pfx: String) =
          s"""SELECT doc_id, cnt AS ${pfx}_cnt, cnt * length(g) AS ${pfx}_chars
              FROM (SELECT doc_id, g, cnt,
                      row_number() OVER (PARTITION BY doc_id
                        ORDER BY cnt DESC, g ASC) AS rn
                    FROM (${cnts(n)}))
              WHERE rn = 1"""
        s"""WITH t2 AS (${top(2, "top2")}), t3 AS (${top(3, "top3")}),
               five AS (
                 SELECT doc_id,
                   CAST(sum(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup5_distinct,
                   CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup5_occurrences,
                   CAST(sum(cnt) AS BIGINT) AS n5_grams
                 FROM (${cnts(5)}) GROUP BY doc_id)
            SELECT t2.doc_id, top2_cnt, top2_chars, top3_cnt, top3_chars,
                   dup5_distinct, dup5_occurrences, n5_grams
            FROM t2 JOIN t3 USING (doc_id) JOIN five USING (doc_id)"""
      },
      // the Spark side keys on xxhash64(gram) internally (shuffle-width
      // optimization; the key is never output) — the oracle groups by the
      // gram string itself, which yields identical counts
      "t17_crossdup" ->
        (s"""WITH cnt AS (SELECT doc_id, g, count(*) AS cnt
                          FROM ${gramsSql(8)} GROUP BY 1, 2),
                gdf AS (SELECT g, count(*) AS df FROM cnt GROUP BY g)
             SELECT doc_id,
               CAST(sum(CASE WHEN df >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_positions,
               CAST(sum(cnt) AS BIGINT) AS n_positions
             FROM cnt JOIN gdf USING (g) GROUP BY doc_id"""),
      "t18_tier" -> tierSql("documents", "doc_id"),
      "t19_split" ->
        (s"""SELECT doc_id, b AS bucket,
               CASE WHEN b < 5 THEN 'test' WHEN b < 10 THEN 'val'
                    ELSE 'train' END AS split
             FROM (SELECT doc_id,
                     ${h60("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS b
                   FROM documents)"""),
      "t20_pretier" -> {
        val stops = TextOps.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
        s"""WITH base AS (
              SELECT doc_id, length($tok) AS n_tokens,
                length(list_distinct($tok)) AS n_distinct,
                length(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  x -> list_contains($stops, x))) AS stop_tokens
              FROM documents),
            r AS (SELECT doc_id, (n_tokens < 20) AS b0,
                    (n_distinct * 10 < n_tokens * 4) AS b3,
                    (stop_tokens = 0) AS b4,
                    (stop_tokens * 20 >= n_tokens AND n_distinct * 2 >= n_tokens
                     AND n_tokens >= 40) AS b6
                  FROM base)
            SELECT doc_id,
              CASE WHEN b0 THEN 0 WHEN b3 OR b4 THEN 1
                   WHEN b6 THEN 3 ELSE 2 END AS pre_tier,
              CAST((CASE WHEN b0 THEN 1 ELSE 0 END) + (CASE WHEN b3 THEN 8 ELSE 0 END)
                 + (CASE WHEN b4 THEN 16 ELSE 0 END) + (CASE WHEN b6 THEN 64 ELSE 0 END)
                 AS BIGINT) AS pre_reasons
            FROM r"""
      },
      "x10_scrub" -> {
        val cnts = TextOps.scrubPatterns.map { case (nm, p) =>
          s"CAST(length(regexp_extract_all(text, '$p')) AS BIGINT) AS n_$nm"
        }.mkString(", ")
        val scrub = TextOps.scrubPatterns.foldLeft("text") {
          case (e, (_, p)) => s"regexp_replace($e, '$p', '▮', 'g')"
        }
        s"""SELECT url, $cnts,
              CAST(length(text) - length($scrub) AS BIGINT) AS chars_removed
            FROM $pages"""
      },
      // tier extraction end-to-end: the extractor's own text (byte-checked
      // vs pages.text by x1) flows into the corpus-level tier rules
      "x9_page_tiers" ->
        tierSql(s"(SELECT url AS doc_id, text FROM $pages)", "url"),
      "d1_host_stats" ->
        (s"""SELECT split_part(url, '/', 3) AS host, count(*) AS n_pages,
               CAST(sum(octet_length(html)) AS BIGINT) AS html_bytes,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
             FROM $pages GROUP BY 1"""),
      "d2_corpus_card" ->
        (s"""WITH b AS (SELECT lang, CAST(length($tok) AS BIGINT) AS nt,
                 md5(text) AS h
               FROM documents)
             SELECT lang, count(*) AS docs,
               CAST(sum(nt) AS BIGINT) AS tokens,
               CAST(count(DISTINCT h) AS BIGINT) AS distinct_texts,
               max(nt) AS max_tokens,
               CAST(sum(nt) // count(*) AS BIGINT) AS avg_tokens,
               (1000 * (count(*) - count(DISTINCT h))) // count(*)
                 AS dup_permille
             FROM b GROUP BY lang"""),
      // d2's card replayed over both snapshots + the diff arithmetic;
      // greatest(prev,1) guards the new-language division
      "d4_snapshot_diff" ->
        (s"""WITH bp AS (SELECT lang, CAST(length($tok) AS BIGINT) AS nt,
                 md5(text) AS h FROM documents),
             cardp AS (SELECT lang, count(*) AS docs,
                 CAST(sum(nt) AS BIGINT) AS tokens,
                 (1000 * (count(*) - count(DISTINCT h))) // count(*) AS dup
               FROM bp GROUP BY lang),
             curdocs AS (SELECT * FROM documents WHERE doc_id % 3 <> 0
                         UNION ALL
                         SELECT * FROM documents WHERE doc_id % 7 = 0),
             bc AS (SELECT lang, CAST(length($tok) AS BIGINT) AS nt,
                 md5(text) AS h FROM curdocs),
             cardc AS (SELECT lang, count(*) AS docs,
                 CAST(sum(nt) AS BIGINT) AS tokens,
                 (1000 * (count(*) - count(DISTINCT h))) // count(*) AS dup
               FROM bc GROUP BY lang)
             SELECT lang,
               coalesce(p.docs, 0) AS docs_prev,
               coalesce(c.docs, 0) AS docs_cur,
               coalesce(p.tokens, 0) AS tokens_prev,
               coalesce(c.tokens, 0) AS tokens_cur,
               coalesce(p.dup, 0) AS dup_prev,
               coalesce(c.dup, 0) AS dup_cur,
               (10000 * (coalesce(c.docs, 0) - coalesce(p.docs, 0)))
                 // greatest(coalesce(p.docs, 0), 1) AS docs_delta_bp,
               (10000 * (coalesce(c.tokens, 0) - coalesce(p.tokens, 0)))
                 // greatest(coalesce(p.tokens, 0), 1) AS tokens_delta_bp,
               coalesce(c.docs, 0) * 10 < coalesce(p.docs, 0) * 8
                 AS alert_docs_drop,
               (coalesce(c.dup, 0) >= coalesce(p.dup, 0) * 2
                 AND coalesce(c.dup, 0) >= 10) AS alert_dup_spike,
               coalesce(p.docs, 0) = 0 AS alert_new_lang,
               coalesce(c.docs, 0) = 0 AS alert_gone_lang
             FROM cardp p FULL OUTER JOIN cardc c USING (lang)"""),
      // global top-100 tokens by count (term-asc ties → deterministic
      // k-boundary) + ROWS-framed cumulative coverage in basis points
      "d3_vocab" ->
        (s"""WITH tf AS (SELECT w AS term, count(*) AS cnt
                         FROM (SELECT unnest($tok) AS w FROM documents)
                         GROUP BY 1),
             tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM tf),
             top AS (SELECT term, cnt FROM tf
                     ORDER BY cnt DESC, term ASC LIMIT 100)
             SELECT row_number() OVER (ORDER BY cnt DESC, term ASC)
                 AS vocab_rank,
               term, cnt, total_tokens,
               CAST((10000 * sum(cnt) OVER (ORDER BY cnt DESC, term ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                 // total_tokens AS BIGINT) AS cum_bp
             FROM top CROSS JOIN tot"""),
      "t35_stratified_sample" ->
        (s"""SELECT doc_id, stratum, rn FROM (
               SELECT doc_id, lang AS stratum,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY ${h60("'sample:' || CAST(doc_id AS VARCHAR)")},
                     doc_id) AS rn
               FROM documents)
             WHERE rn <= 12"""),
      "x8_span_dedup" ->
        (s"""WITH sp AS (
               SELECT s.url,
                 ${h60(s"""substr(p.text, CAST(s.start AS INT) + 1, CAST(s."end" - s.start AS INT))""")} AS sh,
                 s."end" - s.start AS len
               FROM $spansG s JOIN $pages p ON s.url = p.url),
             docfreq AS (SELECT sh, count(DISTINCT url) AS ndocs FROM sp GROUP BY sh)
             SELECT url, count(*) AS n_spans,
               CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_spans,
               CAST(sum(CASE WHEN ndocs >= 2 THEN len ELSE 0 END) AS BIGINT) AS dup_chars
             FROM sp JOIN docfreq USING (sh) GROUP BY url"""),
      // C4 line filter over the extracted blocks (pages.text is the
      // byte-identical extracted text, per x1)
      "x11_line_filter" ->
        (s"""WITH k AS (
               SELECT url, str_split(text, chr(10)) AS lines,
                 list_filter(str_split(text, chr(10)),
                   l -> len(regexp_split_to_array(trim(l), '\\s+')) >= 5
                        AND regexp_matches(l, '[.!?]$$')) AS kept
               FROM $pages)
             SELECT url,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept,
               array_to_string(kept, chr(10)) AS kept_text,
               CAST(CASE WHEN len(kept) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS doc_keep
             FROM k"""),
      "x12_host_cap" ->
        (s"""WITH scored AS (
               SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
               FROM $pages),
             ranked AS (
               SELECT *, row_number() OVER (
                 PARTITION BY host ORDER BY n_tokens DESC, url) AS rk
               FROM scored)
             SELECT url, host, n_tokens, CAST(rk AS BIGINT) AS rk
             FROM ranked WHERE rk <= 3"""),
      "x13_line_dedup" ->
        (s"""WITH l AS (SELECT url, str_split(text, chr(10)) AS lines FROM $pages),
             d AS (SELECT url, lines,
                     list_filter(lines, (x, i) -> list_position(lines, x) = i) AS uniq
                   FROM l)
             SELECT url, CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(uniq) AS BIGINT) AS n_unique,
               array_to_string(uniq, chr(10)) AS dedup_text
             FROM d"""),
      // corpus boilerplate-line replay: df over DISTINCT (url, line)
      // pairs of non-blank lines, removal from every copy (no keeper);
      // the hash is Spark-internal — the oracle keys on the line string
      "x17_boilerplate_lines" ->
        (s"""WITH l AS (SELECT url, str_split(text, chr(10)) AS lines FROM $pages),
            nl AS (SELECT url, CAST(len(lines) AS BIGINT) AS n_lines FROM l),
            dl AS (SELECT DISTINCT url, ln FROM (
                     SELECT url, unnest(lines) AS ln FROM l) u
                   WHERE trim(ln) <> ''),
            bp AS (SELECT ln FROM dl GROUP BY ln HAVING count(*) >= 3),
            pos AS (SELECT url, u.i AS i, u.ln AS ln FROM (
                      SELECT url, unnest([{'i': i, 'ln': lines[i]}
                              for i in generate_series(1, len(lines))]) AS u
                      FROM l) q),
            keptp AS (SELECT p.url, p.i, p.ln
                      FROM pos p LEFT JOIN bp ON p.ln = bp.ln
                      WHERE bp.ln IS NULL)
            SELECT nl.url AS url, nl.n_lines,
              CAST(nl.n_lines - count(k.i) AS BIGINT) AS n_removed,
              coalesce(string_agg(k.ln, chr(10) ORDER BY k.i), '') AS clean_text
            FROM nl LEFT JOIN keptp k ON k.url = nl.url
            GROUP BY nl.url, nl.n_lines"""),
      // PageGen emits every link as a flat double-quoted
      // `<a href="...">text</a>` (no nested markup, no entities in either
      // part — asserted over the full sf0.01 table), so a regex replays
      // the DOM walk exactly; hrefs are absolute or root-relative, so
      // resolution reduces to pass-through-or-prepend-origin.
      "x14_outlinks" ->
        (s"""WITH e AS (
               SELECT url,
                 regexp_extract_all(decode(html),
                   '<a href="([^"]*)">([^<]*)</a>', 1) AS hs,
                 regexp_extract_all(decode(html),
                   '<a href="([^"]*)">([^<]*)</a>', 2) AS an
               FROM $pages)
             SELECT url, CAST(i - 1 AS INT) AS pos, hs[i] AS href,
               an[i] AS anchor,
               CASE WHEN hs[i] LIKE '%://%' THEN hs[i]
                    ELSE regexp_extract(url, '^[a-z]+://[^/]+') || hs[i]
               END AS target
             FROM (SELECT url, hs, an,
                     unnest(generate_series(1, len(hs))) AS i FROM e)"""),
      "x15_link_indegree" ->
        (s"""WITH e AS (
               SELECT url, unnest(regexp_extract_all(decode(html),
                 '<a href="([^"]*)">', 1)) AS href
               FROM $pages)
             SELECT CASE WHEN href LIKE '%://%' THEN href
                         ELSE regexp_extract(url, '^[a-z]+://[^/]+') || href
                    END AS target,
               count(*) AS in_deg, count(DISTINCT url) AS n_src_pages
             FROM e GROUP BY 1"""),
      "x18_robots_filter" ->
        (s"""WITH hosts AS (SELECT DISTINCT
                 regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
               FROM $pages),
             hn AS (SELECT host,
                 CAST(regexp_extract(host, 'site(\\d+)', 1) AS BIGINT) AS n
               FROM hosts),
             rules AS (
               SELECT host, '/articles/1' AS prefix, false AS allow
                 FROM hn WHERE n % 3 = 0
               UNION ALL SELECT host, '/articles/12', true
                 FROM hn WHERE n % 3 = 0
               UNION ALL SELECT host, '/', false FROM hn WHERE n % 7 = 0
               UNION ALL SELECT host, '/articles/2', false
                 FROM hn WHERE n % 5 = 0
               UNION ALL SELECT host, '/articles/2', true
                 FROM hn WHERE n % 5 = 0),
             p AS (SELECT url,
                 regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 CASE WHEN regexp_replace(url, '^[a-z]+://[^/]+', '') = ''
                      THEN '/'
                      ELSE regexp_replace(url, '^[a-z]+://[^/]+', '')
                 END AS path
               FROM $pages),
             m AS (SELECT p.url, r.prefix, r.allow,
                 row_number() OVER (PARTITION BY p.url
                   ORDER BY length(r.prefix) DESC, r.allow DESC,
                            r.prefix DESC) AS rn
               FROM p JOIN rules r
                 ON p.host = r.host AND starts_with(p.path, r.prefix)),
             w AS (SELECT url, prefix, allow FROM m WHERE rn = 1)
             SELECT p.url, coalesce(w.allow, true) AS allowed,
                    w.prefix AS rule_prefix
             FROM p LEFT JOIN w USING (url)"""),
      // recrawl collapse: the synthetic snapshot explosion, the UrlNorm
      // canon chain (same rewrite steps as x16's oracle), then
      // latest-wins with the greatest-url tie-break replayed as a
      // max-join-back + max(url)
      "x19_snapshot_dedup" ->
        (s"""WITH s0 AS (
               SELECT CASE CAST(i AS INT)
                   WHEN 1 THEN regexp_replace(url,
                     '^(https://[^/]+)', '\\1:443')
                   WHEN 2 THEN url || '?'
                   ELSE url END AS snap,
                 CAST(epoch(warc_ts) AS BIGINT) + 3600 * i AS ts_epoch
               FROM (SELECT url, warc_ts,
                       unnest(range(0, 1 + length(url) % 3)) AS i
                     FROM $pages)),
             c0 AS (SELECT snap, ts_epoch,
                 regexp_replace(snap, '#.*', '') AS nofrag FROM s0),
             c1 AS (SELECT snap, ts_epoch, nofrag,
                 regexp_extract(nofrag,
                   '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS auth
               FROM c0),
             c2 AS (SELECT snap, ts_epoch,
                 CASE WHEN lower(auth) LIKE 'http://%'
                        THEN regexp_replace(lower(auth), ':80$$', '')
                      WHEN lower(auth) LIKE 'https://%'
                        THEN regexp_replace(lower(auth), ':443$$', '')
                      ELSE lower(auth) END ||
                 CASE WHEN length(auth) > 0 AND length(regexp_replace(
                          substr(nofrag, length(auth) + 1), '\\?$$', '')) = 0
                      THEN '/'
                      ELSE regexp_replace(
                          substr(nofrag, length(auth) + 1), '\\?$$', '')
                 END AS canon
               FROM c1),
             agg AS (SELECT canon, count(*) AS n_snaps,
                 max(ts_epoch) AS latest_epoch
               FROM c2 GROUP BY 1)
             SELECT a.canon, a.n_snaps, a.latest_epoch,
               max(s.snap) AS latest_url
             FROM agg a JOIN c2 s
               ON s.canon = a.canon AND s.ts_epoch = a.latest_epoch
             GROUP BY 1, 2, 3"""),
      // template fingerprint replay: DuckDB's regexp_extract_all keeps
      // document order like Spark's, and the pattern is RE2-safe, so the
      // md5 of the comma-joined opening-tag names matches byte-for-byte
      "x20_templates" ->
        (s"""WITH fp AS (
               SELECT url, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
                 md5(array_to_string(regexp_extract_all(decode(html),
                   '<([a-z][a-z0-9]*)[^>]*>', 1), ',')) AS tpl
               FROM $pages)
             SELECT f.url, f.host, f.tpl, s.tpl_pages
             FROM fp f JOIN (SELECT host, tpl, count(*) AS tpl_pages
                             FROM fp GROUP BY 1, 2) s
               USING (host, tpl)"""),
      // mojibake replay: the identical decoration + the identical nested
      // literal-replace chain (generated from Mojibake.Rules, same order)
      "x21_mojibake" -> {
        val chain = graft.text.Mojibake.Rules.foldLeft("decorated") {
          case (acc, (b, f)) => s"replace($acc, '$b', '$f')"
        }
        s"""WITH dd AS (SELECT doc_id,
               CASE CAST(length(text) % 3 AS INT)
                 WHEN 0 THEN 'Ã©' || text || 'â€™'
                 WHEN 1 THEN 'â€œ' || text || 'â€¦Â '
                 ELSE text END AS decorated
             FROM documents),
             r AS (SELECT doc_id, decorated, $chain AS repaired FROM dd)
             SELECT doc_id, decorated, repaired,
               length(decorated) - length(repaired) AS chars_fixed
             FROM r"""
      },
      // decoration replay via chr(): SOH=1 BEL=7 STX=2 DEL=127,
      // ZWSP=8203 ZWNJ=8204 ZWJ=8205 BOM=65279 SHY=173. DuckDB
      // regexp_replace is first-match-only without the 'g' flag (Spark's
      // is always global), hence the explicit flag on every replace.
      "x22_sanitize" -> {
        val ctrlRe = """[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"""
        val zwRe = """[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{00AD}]"""
        s"""WITH dd AS (SELECT doc_id,
               CASE CAST(length(text) % 4 AS INT)
                 WHEN 0 THEN chr(1) || chr(8203) || text || chr(7)
                 WHEN 1 THEN text || chr(65279) || chr(173)
                   || ' bre' || chr(173) || 'ak'
                 WHEN 2 THEN chr(127) || text
                   || chr(8204) || chr(8205) || chr(2)
                 ELSE text END AS text
             FROM documents),
             r AS (SELECT doc_id, text,
               regexp_replace(text, '$ctrlRe', '', 'g') AS noctrl,
               regexp_replace(text, '$zwRe', '', 'g') AS nozw
             FROM dd)
             SELECT doc_id,
               length(text) - length(noctrl) AS n_ctrl,
               length(text) - length(nozw) AS n_zw,
               length(regexp_replace(noctrl, '$zwRe', '', 'g'))
                 AS clean_chars,
               md5(regexp_replace(noctrl, '$zwRe', '', 'g')) AS clean_md5
             FROM r"""
      },
      "x16_url_canon" ->
        (s"""WITH d AS (
               SELECT url,
                 CASE CAST(length(url) % 4 AS INT)
                   WHEN 0 THEN upper(url) || '#FRAG'
                   WHEN 1 THEN regexp_replace(url, '^(https://[^/]+)', '\\1:443')
                   WHEN 2 THEN url || '?'
                   ELSE url END AS decorated
               FROM $pages),
             c AS (SELECT url, decorated,
                     regexp_replace(decorated, '#.*', '') AS nofrag FROM d),
             e AS (SELECT url, decorated, nofrag,
                     regexp_extract(nofrag,
                       '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS auth
                   FROM c),
             f AS (SELECT url, decorated,
                     CASE WHEN lower(auth) LIKE 'http://%'
                            THEN regexp_replace(lower(auth), ':80$$', '')
                          WHEN lower(auth) LIKE 'https://%'
                            THEN regexp_replace(lower(auth), ':443$$', '')
                          ELSE lower(auth) END AS a2,
                     regexp_replace(substr(nofrag, length(auth) + 1),
                       '\\?$$', '') AS rest,
                     length(auth) AS la
                   FROM e)
             SELECT url, decorated,
               a2 || CASE WHEN la > 0 AND length(rest) = 0
                          THEN '/' ELSE rest END AS canon
             FROM f"""),
      "g1_host_graph" ->
        (s"""WITH ed AS ($edgeSql)
             SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS src_host,
               regexp_extract(target, '^[a-z]+://([^/]+)', 1) AS dst_host,
               count(*) AS n_links, count(DISTINCT src) AS n_src_pages,
               count(DISTINCT target) AS n_targets
             FROM ed GROUP BY 1, 2"""),
      "g2_anchor_stats" ->
        (s"""WITH ed AS ($edgeSql),
             c AS (SELECT target, anchor, count(*) AS cnt
                   FROM ed GROUP BY 1, 2),
             r AS (SELECT target, anchor, cnt,
                     row_number() OVER (PARTITION BY target
                       ORDER BY cnt DESC, anchor ASC) AS rn,
                     CAST(sum(cnt) OVER (PARTITION BY target) AS BIGINT)
                       AS n_links
                   FROM c)
             SELECT target, anchor AS top_anchor, cnt AS top_n, n_links
             FROM r WHERE rn = 1"""),
      // integer-exact PageRank, the same PrIters iterations unrolled:
      // every mass transfer is a BIGINT floor-division (`//` here, `div`
      // in the Spark plan), so the replay is bit-exact, not
      // float-tolerance-exact (pagerankSelect is hoisted above the Map —
      // g5/g6 embed the identical replay as a nested-WITH subquery)
      "g3_pagerank" -> pagerankSelect,
      "g9_trustrank" -> trustrankSelect,
      "g10_hits" -> hitsSelect,
      "g11_reciprocal" ->
        (s"""WITH ed AS ($edgeSql),
             hp AS (SELECT a, b, count(*) AS n FROM (
                      SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS a,
                        regexp_extract(target, '^[a-z]+://([^/]+)', 1) AS b
                      FROM ed)
                    WHERE a <> b AND a <> '' AND b <> ''
                    GROUP BY 1, 2)
             SELECT f.a AS host1, f.b AS host2, f.n AS links_fwd,
               r.n AS links_rev, least(f.n, r.n) AS reciprocity
             FROM hp f JOIN hp r ON f.a = r.b AND f.b = r.a
             WHERE f.a < f.b"""),
      "g4_host_components" ->
        // recursive reachability over the cross-host edge set — the
        // unique fixpoint the Spark-side min-label propagation reaches
        (s"""WITH RECURSIVE ed AS ($edgeSql),
             hp AS (SELECT DISTINCT a, b FROM
               (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS a,
                  regexp_extract(target, '^[a-z]+://([^/]+)', 1) AS b
                FROM ed) WHERE a <> b),
             hosts AS (SELECT DISTINCT host FROM
               (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS host
                  FROM ed
                UNION ALL
                SELECT regexp_extract(target, '^[a-z]+://([^/]+)', 1)
                  FROM ed)),
             he AS (SELECT a AS src, b AS dst FROM hp
                    UNION ALL SELECT b, a FROM hp),
             reach AS (
               SELECT host AS v, host AS r FROM hosts
               UNION
               SELECT e.src, reach.r FROM he e JOIN reach ON reach.v = e.dst),
             comp AS (SELECT v AS host, min(r) AS component
                      FROM reach GROUP BY v)
             SELECT host, component, (host = component) AS is_keeper
             FROM comp"""),
      // 2 synchronous LPA rounds unrolled: per round, neighbour-label
      // counts → per-node max → min winning label, isolated hosts
      // coalesce to their own label — the Spark chain verbatim
      "g12_lpa_communities" ->
        (s"""WITH ed AS ($edgeSql),
             hp AS (SELECT DISTINCT a, b FROM
               (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS a,
                  regexp_extract(target, '^[a-z]+://([^/]+)', 1) AS b
                FROM ed) WHERE a <> b),
             und AS (SELECT DISTINCT v, u FROM
               (SELECT a AS v, b AS u FROM hp
                UNION ALL SELECT b, a FROM hp)),
             hosts AS (SELECT DISTINCT host FROM
               (SELECT regexp_extract(src, '^[a-z]+://([^/]+)', 1) AS host
                  FROM ed
                UNION ALL
                SELECT regexp_extract(target, '^[a-z]+://([^/]+)', 1)
                  FROM ed)),
             l0 AS (SELECT host, host AS label FROM hosts),
             n1 AS (SELECT und.v, l.label, count(*) AS cnt
                    FROM und JOIN l0 l ON l.host = und.u GROUP BY 1, 2),
             m1 AS (SELECT v, max(cnt) AS mx FROM n1 GROUP BY 1),
             w1 AS (SELECT n1.v, min(n1.label) AS label
                    FROM n1 JOIN m1 ON n1.v = m1.v AND n1.cnt = m1.mx
                    GROUP BY 1),
             l1 AS (SELECT hosts.host, coalesce(w1.label, hosts.host) AS label
                    FROM hosts LEFT JOIN w1 ON w1.v = hosts.host),
             n2 AS (SELECT und.v, l.label, count(*) AS cnt
                    FROM und JOIN l1 l ON l.host = und.u GROUP BY 1, 2),
             m2 AS (SELECT v, max(cnt) AS mx FROM n2 GROUP BY 1),
             w2 AS (SELECT n2.v, min(n2.label) AS label
                    FROM n2 JOIN m2 ON n2.v = m2.v AND n2.cnt = m2.mx
                    GROUP BY 1),
             l2 AS (SELECT hosts.host, coalesce(w2.label, hosts.host) AS label
                    FROM hosts LEFT JOIN w2 ON w2.v = hosts.host)
             SELECT host, label AS community FROM l2"""),
      "g5_host_link_features" ->
        (s"""WITH pr AS ($pagerankSelect),
             ed AS ($edgeSql),
             mass AS ($hostMassSql),
             o AS (SELECT regexp_extract(src, $hostRe, 1) AS host,
                     count(*) AS out_links FROM ed GROUP BY 1),
             i AS (SELECT regexp_extract(target, $hostRe, 1) AS host,
                     count(*) AS in_links,
                     count(DISTINCT regexp_extract(src, $hostRe, 1))
                       AS in_hosts
                   FROM ed GROUP BY 1)
             SELECT mass.host,
               CAST(coalesce(o.out_links, 0) AS BIGINT) AS out_links,
               CAST(coalesce(i.in_links, 0) AS BIGINT) AS in_links,
               CAST(coalesce(i.in_hosts, 0) AS BIGINT) AS in_hosts,
               pr_mass
             FROM mass LEFT JOIN o USING (host) LEFT JOIN i USING (host)"""),
      // text tiers bumped by link endorsement: host PageRank mass >= 2x
      // the mean host mass, tested via Long floor-division (bit-exact)
      "g6_link_tiers" ->
        (s"""WITH tiers AS (
               ${tierSql(s"(SELECT url AS doc_id, text FROM $pages)", "url")}),
             pr AS ($pagerankSelect),
             mass AS ($hostMassSql),
             st AS (SELECT count(*) AS n_hosts,
                      CAST(sum(pr_mass) AS BIGINT) AS total_mass FROM mass),
             en AS (SELECT host,
                      (pr_mass >= 2 * ((SELECT total_mass FROM st)
                         // (SELECT n_hosts FROM st))) AS endorsed
                    FROM mass)
             SELECT t.url, t.reasons, t.tier AS text_tier,
               coalesce(en.endorsed, false) AS endorsed,
               CASE WHEN t.tier = 2 AND coalesce(en.endorsed, false)
                    THEN 3 ELSE t.tier END AS tier
             FROM tiers t LEFT JOIN en
               ON regexp_extract(t.url, $hostRe, 1) = en.host"""),
      // host quality prior: tier chain replay, then one host rollup with
      // an integer basis-point share (// = the Spark plan's div)
      "g8_host_quality" ->
        (s"""WITH tiers AS (
               ${tierSql(s"(SELECT url AS doc_id, text FROM $pages)", "url")})
             SELECT regexp_extract(url, $hostRe, 1) AS host,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN tier = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_reject,
               CAST(sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_low,
               CAST(sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_mid,
               CAST(sum(CASE WHEN tier = 3 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_high,
               CAST(10000 * sum(CASE WHEN tier >= 2 THEN 1 ELSE 0 END)
                 // count(*) AS BIGINT) AS quality_bp
             FROM tiers GROUP BY 1"""),
      // crawl frontier: aggregate per target, then exclude crawled urls
      "g7_frontier" ->
        (s"""WITH ed AS ($edgeSql),
             agg AS (SELECT target,
                       CAST(count(*) AS BIGINT) AS in_links,
                       CAST(count(DISTINCT regexp_extract(src, $hostRe, 1))
                         AS BIGINT) AS in_hosts
                     FROM ed GROUP BY 1)
             SELECT target, in_links, in_hosts FROM agg
             WHERE target NOT IN (SELECT url FROM $pages)"""),
      "t8_fingerprint" ->
        s"SELECT doc_id, ${h60(s"array_to_string($tok, ' ')")} AS fp FROM documents",
      // winner = first language (profile order) attaining the overall
      // max — the SQL mirror of the strictly-greater left fold
      "t9_langid" -> langIdSubquery,
      "t11_lsh_pairs" -> {
        def bucket(b: Int) = (0 until 4)
          .map(k => s"CAST(h${b * 4 + k} AS VARCHAR)").mkString(" || ',' || ")
        s"""WITH sig AS ($minhashSql),
            banded AS (
              SELECT doc_id, 0 AS band, md5(${bucket(0)}) AS bucket FROM sig
              UNION ALL
              SELECT doc_id, 1 AS band, md5(${bucket(1)}) AS bucket FROM sig)
            SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.band AS band
            FROM banded l JOIN banded r
              ON l.band = r.band AND l.bucket = r.bucket AND l.doc_id < r.doc_id"""
      },
      "t21_neardup_keepers" ->
        (s"""$keeperCte
            SELECT doc_id, component,
              (doc_id = component) AS is_keeper
            FROM comp"""),
      // t21's component frame + the csplit hash on the CLUSTER label —
      // by construction both engines put a whole cluster on one side
      "t36_leaksafe_split" ->
        (s"""$keeperCte
            SELECT doc_id, component, b AS bucket,
              CASE WHEN b < 5 THEN 'test' WHEN b < 10 THEN 'val'
                   ELSE 'train' END AS split
            FROM (SELECT doc_id, component,
                    ${h60("'csplit:' || CAST(component AS VARCHAR)")} % 100
                      AS b
                  FROM comp)"""),
      // t21's component frame + the quality projection; the Spark-side
      // struct-max election replayed as a window rank (same total order:
      // n_distinct desc, n_tokens desc, doc_id asc)
      "t37_best_keeper" ->
        (s"""$keeperCte,
             q AS (SELECT doc_id,
                     CAST(length(list_distinct($tok)) AS BIGINT) AS n_distinct,
                     CAST(length($tok) AS BIGINT) AS n_tokens
                   FROM documents),
             scored AS (SELECT c.doc_id, c.component, q.n_distinct, q.n_tokens
                        FROM comp c JOIN q USING (doc_id)),
             best AS (SELECT component, doc_id AS keep_id FROM (
                        SELECT *, row_number() OVER (PARTITION BY component
                          ORDER BY n_distinct DESC, n_tokens DESC, doc_id ASC)
                          AS rn FROM scored)
                      WHERE rn = 1)
             SELECT s.doc_id, s.component, s.n_distinct, s.n_tokens,
               b.keep_id, (s.doc_id = b.keep_id) AS is_keeper
             FROM scored s JOIN best b USING (component)"""),
      // t7's shingle CTEs with containment arithmetic: inter/min(|A|,|B|)
      // in floor-division basis points; subset_only = not a 0.3-jaccard
      // pair
      "t38_containment_pairs" ->
        (s"""WITH sh AS (SELECT DISTINCT doc_id, s FROM $shingles),
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             inter AS (SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
                       FROM sh l JOIN sh r ON l.s = r.s AND l.doc_id < r.doc_id
                       GROUP BY 1, 2)
             SELECT a, b, inter, sa.n + sb.n - inter AS un,
               (10000 * inter) // least(sa.n, sb.n) AS cont_bp,
               NOT (inter * 10 >= (sa.n + sb.n - inter) * 3) AS subset_only
             FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
             WHERE (10000 * inter) // least(sa.n, sb.n) >= 8000"""),
      "t22_decontam" ->
        (s"""WITH pos AS (SELECT doc_id, g FROM ${gramsSql(8)}),
              bg AS (SELECT DISTINCT g, 1 AS hit FROM ${gramsSql(8,
                "(SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0) b")})
             SELECT doc_id,
               CAST(sum(coalesce(hit, 0)) AS BIGINT) AS contaminated_positions,
               count(*) AS n_positions
             FROM pos LEFT JOIN bg USING (g) GROUP BY doc_id"""),
      // decontamination rewrite: t26's interval arithmetic with coverage
      // coming from the benchmark gram set instead of the df/keeper rule
      "t34_decontam_rewrite" ->
        (s"""WITH toks AS (SELECT doc_id, $tok AS w FROM documents),
            pos AS (
              SELECT doc_id, u.i AS i, u.g AS g FROM (
                SELECT doc_id,
                  unnest([{'i': i, 'g': array_to_string(w[i:i+7], ' ')}
                          for i in generate_series(1, greatest(length(w)-7, 1))]) AS u
                FROM toks) q),
            bg AS (SELECT DISTINCT g FROM ${gramsSql(8,
              "(SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0) b")}),
            cov AS (SELECT DISTINCT doc_id, j FROM (
                      SELECT p.doc_id, unnest(generate_series(p.i, p.i + 7)) AS j
                      FROM pos p JOIN bg USING (g)) c2),
            words AS (SELECT doc_id, u.p AS p, u.tok AS tok FROM (
                        SELECT doc_id,
                          unnest([{'p': i, 'tok': w[i]}
                                  for i in generate_series(1, length(w))]) AS u
                        FROM toks) q2),
            kept AS (SELECT wd.doc_id, wd.p, wd.tok
                     FROM words wd LEFT JOIN cov c
                       ON c.doc_id = wd.doc_id AND c.j = wd.p
                     WHERE c.j IS NULL),
            nt AS (SELECT doc_id, CAST(length(w) AS BIGINT) AS n_tokens FROM toks)
            SELECT nt.doc_id AS doc_id, nt.n_tokens AS n_tokens,
              CAST(nt.n_tokens - count(k.p) AS BIGINT) AS n_removed,
              coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS clean_text
            FROM nt LEFT JOIN kept k ON k.doc_id = nt.doc_id
            GROUP BY nt.doc_id, nt.n_tokens"""),
      "t23_ingest_dedup" ->
        ("""WITH nh AS (SELECT md5(text) AS h, min(doc_id) AS doc_id
                        FROM documents WHERE doc_id % 3 <> 0 GROUP BY 1)
            SELECT doc_id FROM nh
            WHERE h NOT IN (SELECT md5(text) FROM documents
                            WHERE doc_id % 3 = 0)"""),
      // the bloom pre-filter is a pure optimization: its output is the
      // exact anti-join result, so the oracle IS the anti-join
      "t30_bloom_ingest" ->
        ("""WITH nh AS (SELECT md5(text) AS h, min(doc_id) AS doc_id
                        FROM documents WHERE doc_id % 4 <> 0 GROUP BY 1)
            SELECT doc_id FROM nh
            WHERE h NOT IN (SELECT md5(text) FROM documents
                            WHERE doc_id % 4 = 0)"""),
      // t11's signature + banding replayed over the two ingest sides; a
      // batch doc survives iff NONE of its band buckets exists committed
      "t31_neardup_ingest" -> {
        def sigFor(cond: String) =
          s"SELECT doc_id, " +
            (0 until 8).map(i => s"min(${h60(s"'$i:' || s")}) AS h$i").mkString(", ") +
            s""" FROM (SELECT doc_id, unnest(
                   [array_to_string(w[i:i+2], ' ')
                    for i in generate_series(1, greatest(length(w)-2, 1))]) AS s
                 FROM (SELECT doc_id, $tok AS w FROM documents WHERE $cond) t)
                 GROUP BY doc_id"""
        def bucket(b: Int) = (0 until 4)
          .map(k => s"CAST(h${b * 4 + k} AS VARCHAR)").mkString(" || ',' || ")
        def bandedFor(sig: String) =
          s"""SELECT doc_id, 0 AS band, md5(${bucket(0)}) AS bucket FROM $sig
              UNION ALL
              SELECT doc_id, 1 AS band, md5(${bucket(1)}) AS bucket FROM $sig"""
        s"""WITH sign AS (${sigFor("doc_id % 5 <> 0")}),
            sigc AS (${sigFor("doc_id % 5 = 0")}),
            bn AS (${bandedFor("sign")}),
            bc AS (SELECT DISTINCT band, bucket FROM (${bandedFor("sigc")}))
            SELECT doc_id FROM (
              SELECT doc_id, count(*) AS nb FROM bn
              WHERE NOT EXISTS (SELECT 1 FROM bc
                                WHERE bc.band = bn.band AND bc.bucket = bn.bucket)
              GROUP BY doc_id)
            WHERE nb = 2"""
      },
      "t24_tier_mix" ->
        (s"""WITH t AS (${tierSql("documents", "doc_id")})
             SELECT doc_id, tier FROM t
             WHERE ${h60("'mix:' || CAST(doc_id AS VARCHAR)")} % 10000 <
               CASE tier WHEN 0 THEN 0 WHEN 1 THEN 1000
                         WHEN 2 THEN 5000 ELSE 10000 END"""),
      // nGroups replayed from the derivation rule (binsPerGroup=64,
      // capacity=2048): ng = max(1, ceil(total_tokens / 131072.0)) —
      // the sum is integer-exact and the one double division agrees
      // bit-for-bit across engines at any realistic corpus size
      "t25_pack" ->
        (s"""WITH base0 AS (
              SELECT doc_id, CAST(length($tok) AS BIGINT) AS n_tokens
              FROM documents),
            par AS (SELECT greatest(1, CAST(ceil(sum(n_tokens) / 131072.0) AS BIGINT)) AS ng
                    FROM base0),
            base AS (
              SELECT doc_id,
                ${h60("'pack:' || CAST(doc_id AS VARCHAR)")} % ng AS pack_group,
                n_tokens
              FROM base0, par),
            s AS (SELECT *,
              sum(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS end_offset
              FROM base)
            SELECT doc_id, pack_group, n_tokens,
              CAST(end_offset - n_tokens AS BIGINT) AS tok_offset,
              CAST((end_offset - n_tokens) // 2048 AS BIGINT) AS bin
            FROM s"""),
      // duplicated-span removal replay: grams WITH positions (the struct
      // comprehension mirrors gramsSql + a start index), df/keeper over
      // the distinct (doc, gram) set, covered = union of [i, i+7] windows
      // in non-keeper docs, rebuild = kept tokens re-joined by ' '
      // (string_agg skips the NULLs the cov anti-join leaves; coalesce
      // matches Spark's '' for a fully-removed document)
      // integer-exact idf surrogate (N div df) preserves idf order for
      // ranking without a float log; ties by term asc — bit-stable in
      // both engines
      "t27_tfidf" ->
        (s"""WITH tf AS (SELECT doc_id, t AS term, count(*) AS tf
               FROM (SELECT doc_id, unnest($tok) AS t FROM documents) u
               GROUP BY 1, 2),
             df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             n AS (SELECT count(*) AS n_docs FROM documents),
             s AS (SELECT tf.doc_id, tf.term,
                     CAST(tf.tf AS BIGINT) AS tf, CAST(df.df AS BIGINT) AS df,
                     CAST(tf.tf * (n.n_docs // df.df) AS BIGINT) AS score
                   FROM tf JOIN df USING (term) CROSS JOIN n),
             r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term ASC) AS rank FROM s)
             SELECT doc_id, term, tf, df, score, CAST(rank AS INT) AS rank
             FROM r WHERE rank <= 3"""),
      // bigram-LM score: the same transition-count model + basis-point
      // floor-divisions, joined on the raw gram strings (the Spark side
      // joins on their xxhash64 keys — same equivalence)
      "t29_lm_score" ->
        (s"""WITH $lmScoreCtes
             SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_bigrams,
               CAST(sum(occ * bp) AS BIGINT) AS sum_bp,
               CAST(sum(occ * bp) // sum(occ) AS BIGINT) AS avg_bp
             FROM docc JOIN model USING (g) GROUP BY 1"""),
      // CCNet terciles: per-language head/middle/tail over the LM score,
      // cuts from the (lang, avg_bp) histogram — cum counts vs n//3
      "t33_ccnet_buckets" ->
        (s"""WITH $lmScoreCtes,
             sc AS (SELECT doc_id,
                      CAST(sum(occ * bp) // sum(occ) AS BIGINT) AS avg_bp
                    FROM docc JOIN model USING (g) GROUP BY 1),
             lg AS ($langIdSubquery),
             j AS (SELECT sc.doc_id, lg.pred_lang, sc.avg_bp
                   FROM sc JOIN lg USING (doc_id)),
             hist AS (SELECT pred_lang, avg_bp, count(*) AS cnt
                      FROM j GROUP BY 1, 2),
             m AS (SELECT pred_lang, avg_bp,
                     sum(cnt) OVER (PARTITION BY pred_lang
                       ORDER BY avg_bp DESC) AS cum_hi,
                     sum(cnt) OVER (PARTITION BY pred_lang
                       ORDER BY avg_bp ASC) AS cum_lo,
                     sum(cnt) OVER (PARTITION BY pred_lang) AS n
                   FROM hist)
             SELECT j.doc_id, j.pred_lang, j.avg_bp,
               CASE WHEN m.cum_hi <= m.n // 3 THEN 'head'
                    WHEN m.cum_lo <= m.n // 3 THEN 'tail'
                    ELSE 'middle' END AS bucket
             FROM j JOIN m USING (pred_lang, avg_bp)"""),
      // DSIR importance weights: unigram+bigram features hashed into 4096
      // md5-60 buckets, add-one-smoothed ppm rates on both corpora, the
      // per-bucket target/raw rate ratio in basis points, occurrence-
      // weighted per document — floor divisions replay bit-identically
      "t32_importance" ->
        (s"""WITH w AS (SELECT doc_id, $tok AS w FROM documents),
             f AS (SELECT doc_id,
                     unnest(w || [w[i] || ' ' || w[i+1]
                                  for i in generate_series(1, length(w) - 1)])
                       AS f
                   FROM w),
             fb AS (SELECT doc_id, ${h60("f")} % 4096 AS fb FROM f),
             docc AS (SELECT doc_id, fb, count(*) AS occ FROM fb GROUP BY 1, 2),
             cq AS (SELECT fb, sum(occ) AS cq FROM docc GROUP BY 1),
             nq AS (SELECT sum(cq) AS nq FROM cq),
             cp AS (SELECT fb.fb, count(*) AS cp FROM fb
                    JOIN documents d USING (doc_id)
                    WHERE d.source IN ('src1', 'src2', 'src3') GROUP BY 1),
             np AS (SELECT sum(cp) AS np FROM cp),
             rates AS (SELECT cq.fb,
                         (10000 * ((1000000 * (coalesce(cp, 0) + 1)) // (np + 4096)))
                           // greatest((1000000 * (cq + 1)) // (nq + 4096), 1) AS bp
                       FROM cq LEFT JOIN cp USING (fb)
                       CROSS JOIN np CROSS JOIN nq)
             SELECT doc_id, CAST(sum(occ) AS BIGINT) AS n_feats,
               CAST(sum(occ * bp) AS BIGINT) AS sum_bp,
               CAST(sum(occ * bp) // sum(occ) AS BIGINT) AS avg_bp
             FROM docc JOIN rates USING (fb) GROUP BY 1"""),
      // sliding-window chunking (capacity 64, stride 48): chunk k covers
      // tokens [k*48, min(k*48+64, n)); K = 1 + ceil(max(n-64,0)/48)
      "t28_chunks" ->
        (s"""WITH w AS (SELECT doc_id, $tok AS toks FROM documents
               WHERE length(trim(text)) > 0),
             n AS (SELECT doc_id, toks, length(toks) AS n FROM w),
             k AS (SELECT doc_id, toks, n,
                     unnest(range(0,
                       1 + (greatest(n - 64, 0) + 47) // 48)) AS k
                   FROM n),
             c AS (SELECT doc_id, CAST(k AS INT) AS chunk_id,
                     CAST(k * 48 AS INT) AS tok_start,
                     CAST(least(k * 48 + 64, n) AS INT) AS tok_end, toks
                   FROM k)
             SELECT doc_id, chunk_id, tok_start, tok_end,
               tok_end - tok_start AS n_toks,
               array_to_string(toks[tok_start + 1 : tok_end], ' ')
                 AS chunk_text
             FROM c"""),
      "t26_span_removal" ->
        (s"""WITH toks AS (SELECT doc_id, $tok AS w FROM documents),
            pos AS (
              SELECT doc_id, u.i AS i, u.g AS g FROM (
                SELECT doc_id,
                  unnest([{'i': i, 'g': array_to_string(w[i:i+7], ' ')}
                          for i in generate_series(1, greatest(length(w)-7, 1))]) AS u
                FROM toks) q),
            stats AS (SELECT g, count(*) AS df, min(doc_id) AS keeper
                      FROM (SELECT DISTINCT doc_id, g FROM pos) dg GROUP BY g),
            cov AS (SELECT DISTINCT doc_id, j FROM (
                      SELECT p.doc_id, unnest(generate_series(p.i, p.i + 7)) AS j
                      FROM pos p JOIN stats s USING (g)
                      WHERE s.df >= 2 AND p.doc_id <> s.keeper) c2),
            words AS (SELECT doc_id, u.p AS p, u.tok AS tok FROM (
                        SELECT doc_id,
                          unnest([{'p': i, 'tok': w[i]}
                                  for i in generate_series(1, length(w))]) AS u
                        FROM toks) q2),
            kept AS (SELECT wd.doc_id, wd.p, wd.tok
                     FROM words wd LEFT JOIN cov c
                       ON c.doc_id = wd.doc_id AND c.j = wd.p
                     WHERE c.j IS NULL),
            nt AS (SELECT doc_id, CAST(length(w) AS BIGINT) AS n_tokens FROM toks)
            SELECT nt.doc_id AS doc_id, nt.n_tokens AS n_tokens,
              CAST(nt.n_tokens - count(k.p) AS BIGINT) AS n_removed,
              coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS clean_text
            FROM nt LEFT JOIN kept k ON k.doc_id = nt.doc_id
            GROUP BY nt.doc_id, nt.n_tokens"""),
      "s1_script" -> {
        val re2 = Map(
          "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
          "devanagari" -> "[\\x{0900}-\\x{097F}]",
          "arabic" -> "[\\x{0600}-\\x{06FF}]",
          "han" -> "[\\x{4E00}-\\x{9FFF}]",
          "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
          "gurmukhi" -> "[\\x{0A00}-\\x{0A7F}]",
          "bengali" -> "[\\x{0980}-\\x{09FF}]",
          "gujarati" -> "[\\x{0A80}-\\x{0AFF}]",
          "oriya" -> "[\\x{0B00}-\\x{0B7F}]",
          "tamil" -> "[\\x{0B80}-\\x{0BFF}]",
          "telugu" -> "[\\x{0C00}-\\x{0C7F}]",
          "kannada" -> "[\\x{0C80}-\\x{0CFF}]",
          "malayalam" -> "[\\x{0D00}-\\x{0D7F}]")
        val counts = ScriptId.profiles.map { case (name, _) =>
          s"length(text) - length(regexp_replace(text, '${re2(name)}', '', 'g')) AS ${name}_chars"
        }.mkString(", ")
        val caseArms = ScriptId.profiles.dropRight(1)
          .map { case (name, _) => s"WHEN ${name}_chars = m THEN '$name'" }
          .mkString(" ")
        val lastName = ScriptId.profiles.last._1
        s"""WITH c AS (SELECT doc_id, $counts FROM documents)
            SELECT doc_id, ${ScriptId.profiles.map(p => s"${p._1}_chars").mkString(", ")},
              CASE WHEN m = 0 THEN 'unknown' $caseArms ELSE '$lastName' END AS pred_script
            FROM (SELECT *, greatest(${ScriptId.profiles.map(p => s"${p._1}_chars").mkString(", ")}) AS m FROM c)"""
      },
      "e1_knn_exact" ->
        ("""SELECT vec_id, neighbor_id, rank FROM (
              SELECT l.vec_id AS vec_id, r.vec_id AS neighbor_id,
                     row_number() OVER (PARTITION BY l.vec_id
                       ORDER BY list_cosine_similarity(l.e, r.e) DESC, r.vec_id ASC) AS rank
              FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings) l
              JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings) r
              ON l.vec_id <> r.vec_id)
            WHERE rank <= 5"""),
      "e2_knn_ivf" -> ivfKnnSql,
      // the persisted index is bit-identical to the inline plan by
      // construction (AnnIndexSpec) — same replay
      "e14_persisted_ivf" -> ivfKnnSql,
      "e16_ivf_append" -> ivfAppendSql,
      // MRL funnel replay: prefix-16 cosine shortlist (rank 20) inside
      // the shared IVF cells, exact full-width cosine top-5 above it
      "e17_mrl_rerank" ->
        (s"""WITH ${ivfAssignSql(4)},
             mprobes AS (SELECT vec_id, cell, e FROM assign WHERE rn <= 4),
             home AS (SELECT vec_id, cell, e FROM assign WHERE rn = 1),
             cand AS (SELECT l.vec_id AS a, r.vec_id AS b,
                        l.e AS ea, r.e AS eb,
                        list_cosine_similarity(l.e[1:16], r.e[1:16]) AS psim
                      FROM mprobes l JOIN home r
                        ON l.cell = r.cell AND l.vec_id <> r.vec_id),
             short AS (SELECT a, b, ea, eb FROM (
                         SELECT a, b, ea, eb, row_number() OVER (
                           PARTITION BY a ORDER BY psim DESC, b ASC) AS rs
                         FROM cand)
                       WHERE rs <= 20)
             SELECT vec_id, neighbor_id, rank FROM (
               SELECT a AS vec_id, b AS neighbor_id,
                 row_number() OVER (PARTITION BY a
                   ORDER BY list_cosine_similarity(ea, eb) DESC, b ASC)
                   AS rank
               FROM short)
             WHERE rank <= 5"""),
      "e3_label_counts" ->
        "SELECT label, count(*) AS cnt, CAST(sum(vec_id) AS BIGINT) AS id_sum FROM embeddings GROUP BY label",
      "e4_cosine_dups" ->
        (s"""WITH ${ivfAssignSql(1)},
             home AS (SELECT * FROM assign WHERE rn = 1)
             SELECT l.vec_id AS a, r.vec_id AS b
             FROM home l JOIN home r
               ON l.cell = r.cell AND l.vec_id < r.vec_id
             WHERE list_cosine_similarity(l.e, r.e) >= 0.42"""),
      "e9_dup_components" ->
        // recursive reachability over the SAME pair derivation as e4:
        // component(v) = min id reachable — the unique fixpoint the
        // Spark-side label propagation converges to
        (s"""WITH RECURSIVE pairs AS (
               SELECT a, b FROM (WITH ${ivfAssignSql(1)},
                 home AS (SELECT * FROM assign WHERE rn = 1)
                 SELECT l.vec_id AS a, r.vec_id AS b
                 FROM home l JOIN home r
                   ON l.cell = r.cell AND l.vec_id < r.vec_id
                 WHERE list_cosine_similarity(l.e, r.e) >= 0.42) t),
             edges AS (SELECT a AS src, b AS dst FROM pairs
                       UNION ALL SELECT b, a FROM pairs),
             reach AS (
               SELECT vec_id AS v, vec_id AS r FROM embeddings
               UNION
               SELECT e.src, reach.r FROM edges e JOIN reach ON reach.v = e.dst),
             comp AS (SELECT v AS vec_id, min(r) AS component
                      FROM reach GROUP BY v)
             SELECT vec_id, component,
               (vec_id = component) AS is_keeper
             FROM comp"""),
      "e5_ivf_recall" ->
        (s"""WITH ${ivfAssignSql(4)},
             probes AS (SELECT * FROM assign WHERE rn <= 4),
             home AS (SELECT * FROM assign WHERE rn = 1),
             ivf AS (SELECT a AS vec_id, b AS neighbor_id FROM (
               SELECT l.vec_id AS a, r.vec_id AS b,
                 row_number() OVER (PARTITION BY l.vec_id
                   ORDER BY list_cosine_similarity(l.e, r.e) DESC, r.vec_id ASC) AS rank
               FROM probes l JOIN home r
                 ON l.cell = r.cell AND l.vec_id <> r.vec_id)
               WHERE rank <= 5),
             exact AS (SELECT vec_id, neighbor_id FROM (
               SELECT l.vec_id AS vec_id, r.vec_id AS neighbor_id,
                 row_number() OVER (PARTITION BY l.vec_id
                   ORDER BY list_cosine_similarity(l.e, r.e) DESC, r.vec_id ASC) AS rank
               FROM v l JOIN v r ON l.vec_id <> r.vec_id)
               WHERE rank <= 5)
             SELECT count(*) AS total_pairs,
               CAST(coalesce(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 END), 0) AS BIGINT) AS hits
             FROM exact e LEFT JOIN ivf i
               ON e.vec_id = i.vec_id AND e.neighbor_id = i.neighbor_id"""),
      "e6_srp_dups" -> {
        // SRP signature replay: same md5-even Rademacher hyperplanes, same
        // floor(e_j*1e6) integer quantisation (sign sums exact in both
        // engines regardless of summation order), same 4x4-bit banding.
        val sums = (0 until 16).map(i =>
          s"sum(CASE WHEN ${h60(s"'p$i:' || CAST(j AS VARCHAR)")} % 2 = 0 " +
            s"THEN q ELSE -q END) AS s$i").mkString(", ")
        def bucket(b: Int) = (0 until 4)
          .map(k => s"CAST(CASE WHEN s${b * 4 + k} >= 0 THEN 1 ELSE 0 END AS VARCHAR)")
          .mkString(" || ',' || ")
        val bandedSelects = (0 until 4)
          .map(b => s"SELECT vec_id, $b AS band, md5(${bucket(b)}) AS bucket FROM sig")
          .mkString(" UNION ALL ")
        s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
            ex AS (SELECT vec_id, unnest(range(len(e))) AS j,
                          CAST(floor(unnest(e) * 1000000.0) AS BIGINT) AS q FROM v),
            sig AS (SELECT vec_id, $sums FROM ex GROUP BY vec_id),
            banded AS ($bandedSelects),
            cand AS (SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
                     FROM banded l JOIN banded r
                       ON l.band = r.band AND l.bucket = r.bucket
                      AND l.vec_id < r.vec_id)
            SELECT a, b FROM cand
            JOIN v va ON va.vec_id = cand.a
            JOIN v vb ON vb.vec_id = cand.b
            WHERE list_cosine_similarity(va.e, vb.e) >= 0.42"""
      },
      "e10_kmeans" -> kmeansSelect,
      // SemDeDup replay: the shared kmeans CTE chain, farthest-first rank
      // on the integer dist (vec_id-asc ties), removal iff cosine > 0.42
      // to any earlier-ranked doc in the same cluster (same threshold as
      // e4 — the |sim-0.42| > 1e-6 margin is pinned on the fixed data)
      "e15_semdedup" ->
        (s"""WITH $kmeansCtes,
             rk AS (SELECT a2.vec_id, a2.cluster, v.e,
                      row_number() OVER (PARTITION BY a2.cluster
                        ORDER BY a2.dist DESC, a2.vec_id ASC) AS rn
                    FROM a2 JOIN v ON v.vec_id = a2.vec_id),
             removed AS (SELECT DISTINCT l.vec_id
                         FROM rk l JOIN rk r
                           ON l.cluster = r.cluster AND r.rn < l.rn
                         WHERE list_cosine_similarity(l.e, r.e) > 0.42)
             SELECT a2.vec_id, a2.cluster,
                    CASE WHEN rm.vec_id IS NULL THEN 1 ELSE 0 END AS kept
             FROM a2 LEFT JOIN removed rm ON rm.vec_id = a2.vec_id"""),
      // seeded-hash per-cluster cap over the SAME replayed assignment
      "e11_cluster_sample" ->
        (s"""WITH $kmeansCtes,
             h AS (SELECT vec_id, cluster,
                     row_number() OVER (PARTITION BY cluster
                       ORDER BY ${h60("'cs:' || CAST(vec_id AS VARCHAR)")} ASC,
                                vec_id ASC) AS rank
                   FROM a2)
             SELECT vec_id, cluster, CAST(rank AS INT) AS rank
             FROM h WHERE rank <= 10"""),
      "e8_sq_knn" ->
        // IVF-SQ replay: the shared ivfAssign CTE for cells, then per-dim
        // min/max over the SAME widened doubles, the identical
        // floor((x-mn)*127.0/(mx-mn)) expression tree (bit-stable across
        // engines), and the integer dot ranked desc with id-asc ties.
        (s"""WITH ${ivfAssignSql(4)},
             ex AS (SELECT vec_id, unnest(range(len(e))) AS j, unnest(e) AS x FROM v),
             rng AS (SELECT j, min(x) AS mn, max(x) AS mx FROM ex GROUP BY j),
             q AS (SELECT vec_id, j,
                     CASE WHEN mx = mn THEN 0
                          ELSE CAST(floor((x - mn) * 127.0 / (mx - mn)) AS BIGINT)
                     END AS q
                   FROM ex JOIN rng USING (j)),
             probes AS (SELECT vec_id, cell FROM assign WHERE rn <= 4),
             home AS (SELECT vec_id, cell FROM assign WHERE rn = 1),
             pairs AS (SELECT l.vec_id AS a, r.vec_id AS b
                       FROM probes l JOIN home r
                         ON l.cell = r.cell AND l.vec_id <> r.vec_id),
             dots AS (SELECT a, b, CAST(sum(qa.q * qb.q) AS BIGINT) AS dot
                      FROM pairs
                      JOIN q qa ON qa.vec_id = pairs.a
                      JOIN q qb ON qb.vec_id = pairs.b AND qb.j = qa.j
                      GROUP BY a, b)
             SELECT vec_id, neighbor_id, rank, dot FROM (
               SELECT a AS vec_id, b AS neighbor_id, dot,
                 row_number() OVER (PARTITION BY a
                   ORDER BY dot DESC, b ASC) AS rank FROM dots)
             WHERE rank <= 5"""),
      "e12_pq_knn" -> pqAdcSql(5),
      // the persisted PQ model self-query is bit-identical to the inline
      // e12 chain by construction — same oracle
      "e18_pq_persisted" -> pqAdcSql(5),
      // two-stage retrieval: the SAME PQ/ADC chain as e12 widened to a
      // 20-candidate shortlist (nested WITH, the g6 idiom), then an exact
      // float-cosine re-rank of only those candidates to top-5
      "e13_pq_rerank" ->
        (s"""WITH cand AS (${pqAdcSql(20)}),
             v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings)
             SELECT vec_id, neighbor_id, rank FROM (
               SELECT c.vec_id, c.neighbor_id,
                 row_number() OVER (PARTITION BY c.vec_id
                   ORDER BY list_cosine_similarity(va.e, vb.e) DESC,
                            c.neighbor_id ASC) AS rank
               FROM cand c
               JOIN v va ON va.vec_id = c.vec_id
               JOIN v vb ON vb.vec_id = c.neighbor_id)
             WHERE rank <= 5"""),
      "e7_knn_ivf_hier" ->
        // two-level IVF replay: md5-stride coarse seeds ("c:"), each
        // vector's 2 nearest coarse cells, md5-stride fine seeds ("f:")
        // carrying their HOME (rnc=1) coarse cell, fine assignment only
        // within probed coarse cells, then the same per-cell knn tail as
        // e2. Params mirror the Spark call: 8 coarse, 8 fine/coarse,
        // nprobeCoarse=2, nprobe=4, k=5.
        (s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) e FROM embeddings),
             par AS (SELECT greatest(1, count(*) // 8) AS cstride,
                            greatest(1, count(*) // 64) AS fstride FROM v),
             coarse AS (SELECT vec_id AS ccell, e AS cc FROM v, par
                        WHERE ${h60("'c:' || CAST(vec_id AS VARCHAR)")} % cstride = 0),
             ca AS (SELECT vec_id, e, ccell, rnc FROM (
                      SELECT v.vec_id, v.e, coarse.ccell,
                             row_number() OVER (PARTITION BY v.vec_id
                               ORDER BY list_cosine_similarity(v.e, coarse.cc) DESC,
                                        coarse.ccell ASC) AS rnc
                      FROM v CROSS JOIN coarse)
                    WHERE rnc <= 2),
             fine0 AS (SELECT ca.ccell AS fccell, ca.vec_id AS fcell, ca.e AS fc
                       FROM ca, par
                       WHERE ca.rnc = 1
                         AND ${h60("'f:' || CAST(ca.vec_id AS VARCHAR)")} % fstride = 0),
             anchor AS (SELECT ca.ccell AS fccell, ca.vec_id AS fcell, ca.e AS fc
                        FROM ca JOIN (SELECT ccell, min(vec_id) AS mv FROM ca
                                      WHERE rnc = 1 GROUP BY ccell) m
                          ON ca.ccell = m.ccell AND ca.vec_id = m.mv
                        WHERE ca.rnc = 1),
             fine AS (SELECT fccell, fcell, fc FROM fine0
                      UNION
                      SELECT fccell, fcell, fc FROM anchor),
             assign AS (SELECT vec_id, cell, rn, e FROM (
                          SELECT ca.vec_id, fine.fcell AS cell, ca.e,
                                 row_number() OVER (PARTITION BY ca.vec_id
                                   ORDER BY list_cosine_similarity(ca.e, fine.fc) DESC,
                                            fine.fcell ASC) AS rn
                          FROM ca JOIN fine ON ca.ccell = fine.fccell)
                        WHERE rn <= 4),
             probes AS (SELECT * FROM assign),
             home AS (SELECT * FROM assign WHERE rn = 1),
             sims AS (SELECT l.vec_id AS a, r.vec_id AS b,
                             list_cosine_similarity(l.e, r.e) AS sim
                      FROM probes l JOIN home r
                        ON l.cell = r.cell AND l.vec_id <> r.vec_id)
             SELECT a AS vec_id, b AS neighbor_id, rank FROM (
               SELECT a, b, row_number() OVER (PARTITION BY a
                 ORDER BY sim DESC, b ASC) AS rank FROM sims)
             WHERE rank <= 5"""),
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
            WHERE rn <= 3"""),
      // exact-microsecond gap test replayed with date_diff (bigint, no
      // float); the running sum is the same lag→flag→cumsum chain
      "q4_sessionize" ->
        ("""SELECT user_id, event_id, session_seq FROM (
              SELECT user_id, event_id,
                     CAST(sum(CASE WHEN prev_ts IS NULL
                              OR date_diff('microsecond', prev_ts, ts) > 1800000000
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
              FROM (SELECT user_id, event_id, ts,
                           lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
                    FROM events))"""),
      // the oracle may afford the inequality join the Spark side avoids:
      // LEFT JOIN keeps no-prior-order events (one all-NULL match row),
      // rn=1 picks latest o_orderdate then highest o_orderkey — the same
      // deterministic tie rule as the union+last pattern
      "q5_asof_join" ->
        ("""SELECT event_id, o_orderkey AS last_orderkey FROM (
              SELECT e.event_id, o.o_orderkey,
                     row_number() OVER (PARTITION BY e.event_id
                       ORDER BY o.o_orderdate DESC NULLS LAST,
                                o.o_orderkey DESC NULLS LAST) AS rn
              FROM events e LEFT JOIN orders o
                ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
            WHERE rn = 1"""),
      // bit-for-bit HLL register replay: same 60-bit md5 hash (h60), top-6
      // bucket bits, rho from bin() length — bin() drops leading zeros in
      // both engines, so 55 - length(bin(rest)) is the shared rho formula
      "q6_hll_users" ->
        (s"""WITH h AS (SELECT event_type,
                              ${h60("CAST(user_id AS VARCHAR)")} AS v
                       FROM events)
             SELECT event_type, v >> 54 AS bucket,
                    max(CASE WHEN (v & ((1::BIGINT << 54) - 1)) = 0 THEN 55
                             ELSE 55 - length(bin(v & ((1::BIGINT << 54) - 1)))
                        END) AS max_rho
             FROM h GROUP BY 1, 2"""),
      // same chained min-aggregation shape as the Spark side; >= keeps
      // same-timestamp step chains
      "q7_funnel" ->
        ("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
                 s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                        JOIN s1 ON e.user_id = s1.user_id
                        WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY 1),
                 s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                        JOIN s2 ON e.user_id = s2.user_id
                        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY 1)
             SELECT s1.user_id,
                    CAST(1 + CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END
                           + CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END
                         AS BIGINT) AS stage
             FROM s1
             LEFT JOIN s2 ON s1.user_id = s2.user_id
             LEFT JOIN s3 ON s1.user_id = s3.user_id"""),
      // 5-step chain: the same nested min-agg CTE ladder one level per
      // step — replays funnelSteps(signup,view,click,purchase,error)
      "q7k_funnel5" -> {
        val steps = Seq("signup", "view", "click", "purchase", "error")
        val ctes = steps.zipWithIndex.map { case (st, i) =>
          if (i == 0)
            s"""s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                       WHERE event_type = '$st' GROUP BY 1)"""
          else
            s"""s${i + 1} AS (SELECT e.user_id, min(e.ts) AS t${i + 1}
                       FROM events e JOIN s$i ON e.user_id = s$i.user_id
                       WHERE e.event_type = '$st' AND e.ts >= s$i.t$i GROUP BY 1)"""
        }.mkString(",\n")
        val hits = (2 to steps.length).map(i =>
          s"CASE WHEN s$i.user_id IS NOT NULL THEN 1 ELSE 0 END").mkString(" + ")
        val joins = (2 to steps.length).map(i =>
          s"LEFT JOIN s$i ON s1.user_id = s$i.user_id").mkString("\n")
        s"""WITH $ctes
            SELECT s1.user_id, CAST(1 + $hits AS BIGINT) AS stage
            FROM s1
            $joins"""
      },
      // 4 row-seeded h60 hashes per event (generate_series = the Spark
      // posexplode), counters as plain counts — elementwise-identical
      "q8_cms_counters" ->
        (s"""SELECT i AS row, ${h60("'cms' || i || ':' || CAST(user_id AS VARCHAR)")} % 256 AS bucket,
                    count(*) AS cnt
             FROM events, generate_series(0, 3) t(i)
             GROUP BY 1, 2"""),
      // the oracle affords the direct inequality join over the same
      // literal bands (incl. the overlapping alert band)
      "q9_range_join" ->
        ("""WITH r(band, lo, hi) AS (VALUES
              ('tiny', 0.0, 1.0), ('small', 1.0, 5.0), ('mid', 5.0, 25.0),
              ('large', 25.0, 100.0), ('huge', 100.0, 500.0),
              ('alert', 90.0, 110.0))
            SELECT e.event_id, r.band FROM events e
            JOIN r ON e.value >= r.lo AND e.value < r.hi""")
    )
    // drop the sidecar-backed trio when no committed expectation exists
    // for this sf (driver scale sf0.01 always has them) — a missing file
    // must surface as "skipped", never as a compare against another
    // scale's expectations
    // q4b is result-identical to q4 by construction (two-phase chunked
    // sessionization, spec-proven equal) — it replays the same oracle
    val withAliases = all + ("q4b_sessionize_chunked" -> all("q4_sessionize"))
    val sidecarBacked = Map(
      "l2_merge_ensemble" -> "merge2", "l3_merge3_v3" -> "merge3v3",
      "l5_columns" -> "cols")
    sidecarBacked.foldLeft(withAliases) { case (m, (q, stem)) =>
      if (new java.io.File(s"$sidecars/${sf}_$stem.parquet").isFile) m
      else m - q
    }
  }
}
