package graft.html

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable.ArrayBuffer

/** HTML token stream. Text payloads are raw (entities NOT yet decoded);
  * offsets are byte offsets into the input. */
sealed trait HtmlToken
object HtmlToken {
  /** `attrs` preserves source order; names lowercased. */
  final case class Start(name: String, attrs: List[(String, String)],
                         selfClosing: Boolean, offset: Int) extends HtmlToken
  final case class End(name: String, offset: Int) extends HtmlToken
  final case class Text(raw: String, offset: Int) extends HtmlToken
  final case class Comment(offset: Int) extends HtmlToken
  final case class Doctype(offset: Int) extends HtmlToken
}

/** Single-pass streaming HTML tokenizer over raw UTF-8 bytes.
  *
  * Scale notes: structural characters (`< > = " ' / !`) are ASCII, so the
  * scan runs on bytes without decoding; only text runs and attribute
  * values are decoded (each byte is looked at O(1) times; the raw input is
  * never materialised as one big String). Script/style/noscript bodies are
  * raw text up to the matching close tag, like the HTML5 rawtext states.
  * Malformed markup never throws — a bare '<' that doesn't open a tag is
  * emitted as text.
  *
  * Replaces the reference's detector stage (SURVEY.md §2.1 S6): page →
  * ordered candidate blocks, here fed from markup instead of model
  * inference.
  */
object Tokenizer {
  private val rawTextTags = Set("script", "style", "noscript", "textarea", "title")

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  private def isNameStart(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  private def isNameChar(b: Byte): Boolean =
    isNameStart(b) || (b >= '0' && b <= '9') || b == '-' || b == '_' || b == ':'

  private def lower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  def tokenize(bytes: Array[Byte]): Vector[HtmlToken] = {
    val out = ArrayBuffer.empty[HtmlToken]
    tokenizeTo(bytes, out += _)
    out.toVector
  }

  /** Callback-style tokenization (no token buffer) — the DOM builder hooks
    * in here so one pass serves both. */
  def tokenizeTo(bytes: Array[Byte], emit: HtmlToken => Unit): Unit = {
    val n = bytes.length
    var i = 0
    var textStart = 0

    def flushText(endExclusive: Int): Unit =
      if (endExclusive > textStart)
        emit(HtmlToken.Text(new String(bytes, textStart, endExclusive - textStart, UTF_8), textStart))

    def indexOf(target: Byte, from: Int): Int = {
      var k = from
      while (k < n && bytes(k) != target) k += 1
      k
    }

    /** Case-insensitive search for `</tag` starting at `from`; returns the
      * index of '<' or n. */
    def findCloseTag(tag: String, from: Int): Int = {
      val t = tag.getBytes(UTF_8)
      var k = from
      while (k < n) {
        if (bytes(k) == '<' && k + 1 < n && bytes(k + 1) == '/') {
          var m = 0
          var ok = true
          while (ok && m < t.length) {
            val at = k + 2 + m
            ok = at < n && lower(bytes(at)) == t(m)
            m += 1
          }
          if (ok) {
            val after = k + 2 + t.length
            if (after >= n || bytes(after) == '>' || isSpace(bytes(after))) return k
          }
        }
        k += 1
      }
      n
    }

    while (i < n) {
      if (bytes(i) == '<' && i + 1 < n) {
        val next = bytes(i + 1)
        if (next == '!') {
          flushText(i)
          if (i + 3 < n && bytes(i + 2) == '-' && bytes(i + 3) == '-') {
            // comment: scan for -->
            var k = i + 4
            while (k + 2 < n && !(bytes(k) == '-' && bytes(k + 1) == '-' && bytes(k + 2) == '>')) k += 1
            emit(HtmlToken.Comment(i))
            i = math.min(n, k + 3)
          } else {
            // doctype / CDATA / bogus markup: skip to '>'
            val k = indexOf('>', i + 2)
            emit(HtmlToken.Doctype(i))
            i = math.min(n, k + 1)
          }
          textStart = i
        } else if (next == '/') {
          flushText(i)
          var k = i + 2
          val nameStart = k
          while (k < n && isNameChar(bytes(k))) k += 1
          val name = new String(bytes, nameStart, k - nameStart, UTF_8).toLowerCase
          val gt = indexOf('>', k)
          if (name.nonEmpty) emit(HtmlToken.End(name, i))
          i = math.min(n, gt + 1)
          textStart = i
        } else if (isNameStart(next)) {
          flushText(i)
          var k = i + 1
          val nameStart = k
          while (k < n && isNameChar(bytes(k))) k += 1
          val name = new String(bytes, nameStart, k - nameStart, UTF_8).toLowerCase
          // attributes
          var attrs: List[(String, String)] = Nil
          var selfClosing = false
          var done = false
          while (!done && k < n) {
            while (k < n && isSpace(bytes(k))) k += 1
            if (k >= n) done = true
            else if (bytes(k) == '>') { done = true; k += 1 }
            else if (bytes(k) == '/') {
              k += 1
              if (k < n && bytes(k) == '>') { selfClosing = true; done = true; k += 1 }
            } else {
              // attribute name
              val as = k
              while (k < n && bytes(k) != '=' && bytes(k) != '>' && bytes(k) != '/' && !isSpace(bytes(k))) k += 1
              val aname = new String(bytes, as, k - as, UTF_8).toLowerCase
              var avalue = ""
              while (k < n && isSpace(bytes(k))) k += 1
              if (k < n && bytes(k) == '=') {
                k += 1
                while (k < n && isSpace(bytes(k))) k += 1
                if (k < n && (bytes(k) == '"' || bytes(k) == '\'')) {
                  val q = bytes(k)
                  k += 1
                  val vs = k
                  while (k < n && bytes(k) != q) k += 1
                  avalue = new String(bytes, vs, k - vs, UTF_8)
                  if (k < n) k += 1
                } else {
                  val vs = k
                  while (k < n && bytes(k) != '>' && !isSpace(bytes(k))) k += 1
                  avalue = new String(bytes, vs, k - vs, UTF_8)
                }
              }
              if (aname.nonEmpty) attrs = (aname -> avalue) :: attrs
            }
          }
          emit(HtmlToken.Start(name, attrs.reverse, selfClosing, i))
          i = k
          textStart = i
          // rawtext elements: emit body as a single text token
          if (!selfClosing && rawTextTags.contains(name)) {
            val close = findCloseTag(name, i)
            if (close > i)
              emit(HtmlToken.Text(new String(bytes, i, close - i, UTF_8), i))
            // consume the close tag
            if (close < n) {
              val gt = indexOf('>', close)
              emit(HtmlToken.End(name, close))
              i = math.min(n, gt + 1)
            } else i = n
            textStart = i
          }
        } else {
          i += 1 // bare '<' in text
        }
      } else i += 1
    }
    flushText(n)
  }
}
