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
    // argmax as array_max over (score, priority, lang) structs: struct
    // comparison is lexicographic, so the max score wins and ties go to
    // the higher priority = the EARLIER language in `profiles` — the same
    // fixed-order tie-break as a strictly-greater fold. Linear expression
    // size (one struct per language); the equivalent when/otherwise fold
    // nests the whole running CASE into each step, doubling the tree per
    // language (~2^9 here), which overflows the 64KB codegen method limit
    // and drops the stage out of whole-stage codegen entirely.
    val entries = profiles.zipWithIndex.map { case ((lang, stops), i) =>
      struct(
        size(array_intersect(w, array(stops.map(lit): _*))).as("s"),
        lit(profiles.size - i).as("p"),
        lit(lang).as("lang"))
    }
    docs.select(col(idCol),
      array_max(array(entries: _*)).getField("lang").as("pred_lang"))
  }
}
