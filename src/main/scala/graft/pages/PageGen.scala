package graft.pages

import java.sql.Timestamp

/** One Common-Crawl-style page row — the driver-fixed input shape
  * (BASELINE.json input_hint): url, crawl timestamp, raw html bytes,
  * golden extracted text, language tag. */
final case class PageRow(url: String, warc_ts: Timestamp, html: Array[Byte],
                         text: String, lang: String)

/** Deterministic synthetic page generator (FIXTURES.md §1).
  *
  * Pure function of (seed, index): builds structured HTML — boilerplate
  * chrome (header/nav/aside/footer/cookie banner, high link density) around
  * main-content paragraphs, headings, lists, tables, quotes, code — and
  * computes the EXPECTED extraction from the content parts directly (not
  * by running the extractor), so `Extractor.extract(html).text == text`
  * is a real self-consistent golden, per the extraction contract:
  * whitespace-normalised blocks, document order, '\n'-joined.
  *
  * The html-length distribution is deliberately heavy-tailed (~2% of pages
  * are 10-40× larger) so skew handling (salted repartition, AQE) is
  * exercised at bench scale.
  */
object PageGen {
  private val baseTs = 1704067200000L // 2024-01-01T00:00:00Z

  // splitmix64
  private final class Rng(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int = {
      val l = nextLong() >>> 1
      (l % bound).toInt
    }
    def nextDouble(): Double = (nextLong() >>> 11).toDouble / (1L << 53).toDouble
    def pick[A](xs: IndexedSeq[A]): A = xs(nextInt(xs.length))
  }

  private val vocabEn = Vector("the", "quick", "analysis", "shows", "that",
    "modern", "systems", "process", "large", "volumes", "of", "data",
    "across", "distributed", "clusters", "while", "keeping", "latency",
    "low", "and", "throughput", "high", "engineers", "measure", "partition",
    "skew", "before", "deploying", "pipelines", "to", "production",
    "storage", "formats", "matter", "because", "columnar", "layouts",
    "enable", "predicate", "pushdown", "which", "reduces", "scan", "cost",
    "significantly", "over", "time", "teams", "iterate", "on", "models")
  private val vocabDe = Vector("die", "schnelle", "analyse", "zeigt", "dass",
    "moderne", "systeme", "große", "datenmengen", "verarbeiten", "während",
    "verteilte", "cluster", "niedrige", "latenz", "halten", "ingenieure",
    "messen", "partitionen", "vor", "der", "bereitstellung", "speicher",
    "formate", "spaltenweise", "ermöglichen", "prädikat", "reduziert",
    "kosten", "über", "zeit", "teams", "iterieren", "straße", "fähigkeit")
  private val vocabFr = Vector("la", "rapide", "analyse", "montre", "que",
    "les", "systèmes", "modernes", "traitent", "de", "grands", "volumes",
    "données", "répartis", "tout", "en", "gardant", "latence", "faible",
    "débit", "élevé", "ingénieurs", "mesurent", "avant", "déploiement",
    "stockage", "formats", "colonnes", "permettent", "réduction", "coûts")
  private val vocabEs = Vector("el", "rápido", "análisis", "muestra", "que",
    "los", "sistemas", "modernos", "procesan", "grandes", "volúmenes",
    "datos", "distribuidos", "manteniendo", "latencia", "baja", "alto",
    "rendimiento", "ingenieros", "miden", "antes", "de", "desplegar",
    "almacenamiento", "formatos", "columnares", "permiten", "reducción")
  private val vocabHi = Vector("yah", "vishleshan", "dikhata", "hai", "ki",
    "aadhunik", "pranali", "bade", "data", "ko", "sambhalti", "hain",
    "vitrit", "cluster", "kam", "vilambata", "uchch", "praväh", "abhiyanta",
    "maapte", "pahle", "tainaati", "bhandaran", "praaroop", "stambh")

  private val langs = Vector("en", "en", "en", "en", "en", "en", "de", "fr", "es", "hi")
  private def vocabOf(lang: String) = lang match {
    case "de" => vocabDe
    case "fr" => vocabFr
    case "es" => vocabEs
    case "hi" => vocabHi
    case _    => vocabEn
  }

  /** Entity-bearing tokens: (html form, decoded expected form). */
  private val entityWords = Vector(
    ("AT&amp;T", "AT&T"), ("R&amp;D", "R&D"), ("&copy;2024", "©2024"),
    ("caf&eacute;", "café"), ("&ldquo;quoted&rdquo;", "“quoted”"),
    ("5&nbsp;&lt;&nbsp;10", "5 < 10"), ("x&nbsp;&gt;&nbsp;y", "x > y"))

  private def sentence(r: Rng, vocab: IndexedSeq[String], nWords: Int): (String, String) = {
    // returns (htmlText, expectedText)
    val hb = new StringBuilder
    val eb = new StringBuilder
    var k = 0
    while (k < nWords) {
      if (k > 0) { hb += ' '; eb += ' ' }
      if (r.nextInt(40) == 0) {
        val (h, e) = r.pick(entityWords)
        hb ++= h; eb ++= e
      } else {
        val w = r.pick(vocab)
        if (r.nextInt(25) == 0) { hb ++= s"<b>$w</b>"; eb ++= w }
        else if (r.nextInt(25) == 0) { hb ++= s"<i>$w</i>"; eb ++= w }
        else { hb ++= w; eb ++= w }
      }
      k += 1
    }
    (hb.toString, eb.toString)
  }

  private def linkList(r: Rng, vocab: IndexedSeq[String], n: Int): String =
    (0 until n).map { _ =>
      s"""<a href="/x/${r.nextInt(1000)}">${r.pick(vocab)} ${r.pick(vocab)}</a>"""
    }.mkString(" | ")

  /** Generate page #idx under `seed`. */
  def page(seed: Long, idx: Long): PageRow = {
    val r = new Rng(seed * 0x100000001b3L + idx)
    val lang = langs(r.nextInt(langs.length))
    val vocab = vocabOf(lang)
    val host = s"site${r.nextInt(500)}.example.org"
    val url = s"https://$host/articles/${idx}"

    val html = new StringBuilder(4096)
    val expected = scala.collection.mutable.ArrayBuffer.empty[String]

    html ++= "<!DOCTYPE html>\n<html><head>"
    html ++= s"<title>${r.pick(vocab)} ${r.pick(vocab)}</title>"
    html ++= "<style>body{margin:0} .content{width:960px}</style>"
    html ++= "<script>var t=1;function f(){if(t<2){t+=1}}</script>"
    html ++= "</head>\n<body>\n"

    // chrome: header + nav (dropped by tag rule)
    html ++= s"""<header class="site-header"><h1>${r.pick(vocab)}</h1>${linkList(r, vocab, 4)}</header>\n"""
    html ++= s"""<nav class="main-nav">${linkList(r, vocab, 3 + r.nextInt(6))}</nav>\n"""
    if (r.nextInt(3) == 0)
      html ++= s"""<div class="cookie-banner">We use cookies ${r.pick(vocab)} <a href="/accept">accept</a></div>\n"""

    html ++= """<div class="content">"""

    // heavy-tailed section count
    val baseSections = 1 + r.nextInt(7)
    val nSections =
      if (r.nextDouble() < 0.02) baseSections * (10 + r.nextInt(31))
      else baseSections

    // article heading
    val (h1h, h1e) = sentence(r, vocab, 2 + r.nextInt(5))
    html ++= s"<h1>$h1h</h1>\n"
    expected += h1e

    var s = 0
    while (s < nSections) {
      if (r.nextInt(3) > 0) {
        val (hh, he) = sentence(r, vocab, 2 + r.nextInt(4))
        html ++= s"<h2>$hh</h2>\n"
        expected += he
      }
      val nParas = 1 + r.nextInt(4)
      var p = 0
      while (p < nParas) {
        val (ph, pe) = sentence(r, vocab, 8 + r.nextInt(53))
        // at most one short link per paragraph keeps link density << 1/3
        val (bodyH, bodyE) =
          if (r.nextInt(4) == 0) {
            val lw = r.pick(vocab)
            (s"""$ph <a href="/ref/${r.nextInt(99)}">$lw</a>.""", s"$pe $lw.")
          } else (s"$ph.", s"$pe.")
        html ++= s"<p>$bodyH</p>\n"
        expected += bodyE
        p += 1
      }
      r.nextInt(5) match {
        case 0 => // list: items ≥5 words
          val items = (0 until 2 + r.nextInt(4)).map(_ => sentence(r, vocab, 5 + r.nextInt(6)))
          html ++= "<ul>" + items.map(i => s"<li>${i._1}</li>").mkString + "</ul>\n"
          expected ++= items.map(_._2)
        case 1 => // table: cells ≥5 words
          val rows = (0 until 1 + r.nextInt(3)).map { _ =>
            (0 until 2).map(_ => sentence(r, vocab, 5 + r.nextInt(4)))
          }
          html ++= "<table>" + rows.map(row =>
            "<tr>" + row.map(c => s"<td>${c._1}</td>").mkString + "</tr>").mkString + "</table>\n"
          expected ++= rows.flatMap(_.map(_._2))
        case 2 => // blockquote
          val (qh, qe) = sentence(r, vocab, 6 + r.nextInt(12))
          html ++= s"<blockquote>$qh</blockquote>\n"
          expected += qe
        case 3 if r.nextInt(2) == 0 => // pre: internal newlines normalise to spaces
          val lines = (0 until 2 + r.nextInt(3)).map(_ => s"val x${r.nextInt(99)} = ${r.nextInt(999)}")
          html ++= s"<pre>${lines.mkString("\n")}</pre>\n"
          expected += lines.mkString(" ")
        case _ =>
      }
      s += 1
    }
    html ++= "</div>\n"

    // chrome: related/aside/comments/footer (dropped by tag/class rules)
    html ++= s"""<aside class="sidebar"><h3>${r.pick(vocab)}</h3>${linkList(r, vocab, 5)}</aside>\n"""
    if (r.nextInt(2) == 0) {
      val (ch, _) = sentence(r, vocab, 10 + r.nextInt(20))
      html ++= s"""<div class="comments"><div class="comment">$ch</div></div>\n"""
    }
    html ++= s"""<div class="related">${linkList(r, vocab, 4)}</div>\n"""
    html ++= s"""<footer><p>&copy; 2024 $host</p>${linkList(r, vocab, 3)}</footer>\n"""
    html ++= "</body></html>\n"

    PageRow(url, new Timestamp(baseTs + idx * 1000L),
      html.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      expected.mkString("\n"), lang)
  }

  /** Deterministic page range [from, until). */
  def pages(seed: Long, from: Long, until: Long): Iterator[PageRow] =
    Iterator.range(from, until).map(page(seed, _))
}
