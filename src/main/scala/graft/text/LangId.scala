package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stopword-profile language identification — the engine
  * analogue of the reference's script/language classification endpoint
  * (reference: server/modules/postprocess/routes.py, which shells out to a
  * model; here a transparent heuristic built purely from codegen'd
  * expressions: distinct-stopword hits per language, ties broken by a
  * fixed language order).
  */
object LangId {
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "that", "is", "in", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "für", "auf", "dass"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "para", "que", "una", "con"),
    "hi" -> Seq("hai", "ki", "ko", "se", "ka", "aur", "yah", "par", "ke", "nahi"),
    // Punjabi (Gurmukhi) stopwords — the reference's own 2-class en/pa and
    // hi/pa language endpoints make "pa" a first-class language here
    // (reference: lang_iden_2class_enpa.sh, lang_iden_2class_hipa.sh)
    "pa" -> Seq("ਦੇ", "ਦੀ", "ਦਾ", "ਨੂੰ", "ਹੈ", "ਵਿੱਚ", "ਅਤੇ", "ਇਹ", "ਨਾਲ", "ਤੋਂ"),
    // broader Indic breadth of the NLTM domain: the scripts are disjoint
    // Unicode blocks, so these profiles can never collide with each other
    "bn" -> Seq("এবং", "এই", "করে", "থেকে", "হয়", "একটি", "যে", "তার", "সঙ্গে", "ছিল"),
    "ta" -> Seq("மற்றும்", "இந்த", "ஒரு", "என்று", "அது", "இது", "ஆனால்", "அவர்", "என", "மிகவும்"),
    "te" -> Seq("మరియు", "ఈ", "ఒక", "అది", "ఇది", "కానీ", "అతను", "ఆమె", "నుండి", "తో"))

  /** (doc table, text column name) → doc_id + predicted language. */
  def predict(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): DataFrame = {
    val w = split(trim(lower(col(textCol))), "\\s+")
    val scores: Seq[(String, Column)] = profiles.map { case (lang, stops) =>
      lang -> size(array_intersect(w, array(stops.map(lit): _*)))
    }
    // argmax with fixed-order tie-break: fold left keeping strictly-greater
    val (bestLang, _) = scores.tail.foldLeft(
      (lit(scores.head._1), scores.head._2)) {
      case ((curLang, curScore), (lang, score)) =>
        (when(score > curScore, lit(lang)).otherwise(curLang),
         when(score > curScore, score).otherwise(curScore))
    }
    docs.select(col(idCol), bestLang.as("pred_lang"))
  }
}
