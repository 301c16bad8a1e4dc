package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic script identification by Unicode-range character
  * profiling — the engine analogue of the reference's script-identification
  * surface (reference: server/modules/iitb/scriptiden/, whose
  * helper shells out to a model per image; here the text itself carries
  * the script, so counting code points per range is exact and
  * SQL-expressible — every count ships with a DuckDB oracle).
  *
  * Count of chars in a range = length(text) - length(text with the range
  * stripped): pure codegen'd built-ins, no UDF, no per-char explode.
  */
object ScriptId {

  /** (script name, Java regex char class) in fold order — the winner is
    * the first script reaching the maximum count (same first-strict-max
    * fold as [[LangId]]). */
  val profiles: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-zÀ-ɏ]",
    "devanagari" -> "[ऀ-ॿ]",
    "arabic" -> "[؀-ۿ]",
    "han" -> "[一-鿿]",
    "cyrillic" -> "[Ѐ-ӿ]",
    // U+0A00–0A7F — the script of the reference's own corpus (its
    // endpoints classify en/pa and hi/pa Punjabi documents:
    // reference lang_iden_2class_enpa.sh / _hipa.sh, script_iden_v1.sh)
    "gurmukhi" -> "[਀-੿]",
    // the remaining major Indic blocks of the reference's NLTM domain
    // (Indian-language document processing): one contiguous Unicode
    // block each, mutually disjoint
    "bengali" -> "[ঀ-৿]",      // U+0980–09FF
    "gujarati" -> "[઀-૿]",     // U+0A80–0AFF
    "oriya" -> "[଀-୿]",        // U+0B00–0B7F
    "tamil" -> "[஀-௿]",       // U+0B80–0BFF
    "telugu" -> "[ఀ-౿]",      // U+0C00–0C7F
    "kannada" -> "[ಀ-೿]",     // U+0C80–0CFF
    "malayalam" -> "[ഀ-ൿ]")   // U+0D00–0D7F

  private def countOf(textCol: Column, cls: String): Column =
    length(textCol) - length(regexp_replace(textCol, cls, ""))

  /** Per document: char count per script + predicted script (first-max
    * fold; "unknown" when no profiled character occurs). */
  def predict(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val counts = profiles.map { case (name, cls) => name -> countOf(col(textCol), cls) }
    val m = greatest(counts.map(_._2): _*)
    // first script attaining the max == the strictly-greater left fold
    val pred = counts.reverse.foldLeft(lit("unknown")) {
      case (acc, (name, c)) => when(c === m && m > 0, lit(name)).otherwise(acc)
    }
    docs.select(
      (col(idCol) +: counts.map { case (n, c) => c.as(s"${n}_chars") }) :+
        pred.as("pred_script"): _*)
  }
}
