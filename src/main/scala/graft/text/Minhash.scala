package graft.text

/** Per-row (scalar) MinHash — the same signature convention as the
  * relational [[TextOps.minhash]] (word 3-shingles, 60-bit md5-derived
  * hashes seeded by an "i:" prefix, banded buckets as the md5 hex of the
  * comma-joined band slots), computed in one pass over a single
  * document.
  *
  * The relational explode+groupBy form is the right shape for BATCH
  * (map-side-combined, fully codegen'd); this scalar form exists for the
  * STREAMING path, where a per-row stateless projection avoids a second
  * stateful aggregation before the banded keyed state (Structured
  * Streaming allows chained stateful operators only in restricted
  * combinations, and a per-row map is strictly cheaper than a
  * shuffle-backed grouped min per micro-batch).
  */
object Minhash {

  // MessageDigest.getInstance allocates (provider lookup + digest state)
  // on every call; signature() hashes nHashes × shingles times per
  // document on the streaming ingest hot path — the same per-call md5
  // cost the crossDupCoverage batch path measured at ~150 s of a 188 s
  // pass. One digest per thread, reset by digest() itself, is free.
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = md.get().digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** First 15 hex chars of md5, base-16 — the shared 60-bit convention
    * ([[TextOps.md5Hash60]] / the DuckDB oracle's `h60`), computed
    * straight from the digest bytes (7 full bytes + the high nibble of
    * byte 7 = 60 bits), no hex string or parse on the hot path.
    * TextOpsSpec pins equality with the hex-parse formulation and with
    * the relational [[TextOps.minhash]] slots. */
  def hash60(s: String): Long = {
    val d = md.get().digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Word tokens, mirroring `split(trim(text), "\\s+")`. */
  def tokens(text: String): Array[String] = text.trim.split("\\s+")

  /** Word 3-shingles, mirroring the relational convention
    * ([[TextOps.minhash]]'s gram explosion): positions 1..max(n−2, 1),
    * each the space-join of up to 3 consecutive tokens. */
  def shingles(text: String): IndexedSeq[String] = {
    val w = tokens(text)
    val n = math.max(w.length - 2, 1)
    (0 until n).map(i => w.slice(i, i + 3).mkString(" "))
  }

  /** nHashes-slot signature: slot i = min over shingles of
    * hash60("i:" + shingle). */
  def signature(text: String, nHashes: Int = 8): Array[Long] = {
    val sig = Array.fill(nHashes)(Long.MaxValue)
    shingles(text).foreach { s =>
      var i = 0
      while (i < nHashes) {
        val h = hash60(s"$i:$s")
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Band bucket id: md5 hex of the comma-joined slots of band `b`,
    * mirroring [[TextOps.minhashPairs]]'s bucket column. */
  def bandBucket(sig: Array[Long], b: Int, bandSize: Int): String =
    md5Hex((0 until bandSize).map(k => sig(b * bandSize + k)).mkString(","))
}
