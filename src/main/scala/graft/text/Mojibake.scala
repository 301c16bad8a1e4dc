package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake repair — the encoding-fix pass (ftfy's core case) every
  * web-crawl pipeline runs before tokenization: UTF-8 bytes decoded as
  * Latin-1/cp1252 once leave characteristic two/three-char sequences
  * ("â€™" where "’" was meant, "Ã©" for "é"), and a model trained on
  * them learns garbage tokens. Reference scope: the corpus-pipeline
  * surface ("beyond the reference" family, like [[TextOps.piiScrub]]).
  *
  * The rule table is the high-frequency core of the UTF-8-as-cp1252
  * confusion (punctuation family "â€¦", accented-Latin family "Ã©",
  * stray "Â" before NBSP-mapped spaces). Rules apply in FIXED order as
  * literal (regex-free) replacements, so the DuckDB oracle replays the
  * identical nested `replace()` chain; every rule strictly shrinks the
  * string, so the chain terminates and `chars_fixed` =
  * len(before) − len(after) counts repairs exactly.
  *
  * Scale shape: a pure codegen'd per-row projection (built-in
  * `replace`, no UDF, no regex engine) — zero exchanges, inherits the
  * scan partitioning, whole-stage codegen keeps it inside the scan's
  * projection at any corpus size.
  */
object Mojibake {

  /** (broken, fixed), applied first-to-last. Within the "â€x" family
    * the third character disambiguates, so order is free; it is still
    * FIXED here because the oracle nests replacements in this order. */
  val Rules: Seq[(String, String)] = Seq(
    "â€™" -> "’",
    "â€œ" -> "“",
    "â€“" -> "–",
    "â€”" -> "—",
    "â€¦" -> "…",
    "Ã©" -> "é",
    "Ã¨" -> "è",
    "Ã±" -> "ñ",
    "Ã¼" -> "ü",
    "Â " -> " ")

  /** The repaired form of `c` (literal replace chain, innermost =
    * first rule — mirror the oracle's nesting). */
  def repair(c: Column): Column =
    Rules.foldLeft(c) { case (acc, (broken, fixed)) =>
      replace(acc, lit(broken), lit(fixed))
    }
}
