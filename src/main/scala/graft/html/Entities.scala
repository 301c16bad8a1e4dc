package graft.html

/** HTML entity decoding — named subset + numeric forms. Deterministic and
  * allocation-light; unknown entities pass through verbatim (browser-like
  * leniency). */
object Entities {
  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u0020", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "frac12" -> "½",
    "frac14" -> "¼", "sup2" -> "²", "sup3" -> "³",
    "micro" -> "µ", "para" -> "¶", "sect" -> "§",
    "middot" -> "·", "bull" -> "•", "dagger" -> "†",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "szlig" -> "ß", "agrave" -> "à",
    "aacute" -> "á", "eacute" -> "é", "egrave" -> "è",
    "iacute" -> "í", "oacute" -> "ó", "uacute" -> "ú",
    "ntilde" -> "ñ", "uuml" -> "ü", "ouml" -> "ö",
    "auml" -> "ä", "shy" -> "­")

  /** Decode entities in `s`. A '&' starts an entity only if a valid
    * named/numeric form terminated by ';' follows within 32 chars. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var from = 0
    while (i >= 0) {
      sb.append(s, from, i)
      val semi = s.indexOf(';', i + 1)
      var consumed = false
      if (semi > i && semi - i <= 32) {
        val body = s.substring(i + 1, semi)
        if (body.startsWith("#")) {
          val numStr = body.substring(1)
          val cp =
            try {
              if (numStr.startsWith("x") || numStr.startsWith("X"))
                Integer.parseInt(numStr.substring(1), 16)
              else Integer.parseInt(numStr)
            } catch { case _: NumberFormatException => -1 }
          if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp)) {
            sb.appendCodePoint(cp)
            consumed = true
          }
        } else named.get(body) match {
          case Some(rep) => sb.append(rep); consumed = true
          case None =>
        }
      }
      if (consumed) from = semi + 1
      else { sb.append('&'); from = i + 1 }
      i = s.indexOf('&', from)
    }
    sb.append(s, from, s.length)
    sb.toString
  }
}
