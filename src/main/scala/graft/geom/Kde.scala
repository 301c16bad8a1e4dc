package graft.geom

/** 1-D Gaussian kernel-density mode estimation.
  *
  * Re-derivation of the reference's scipy-based adaptive thresholds
  * (reference: server/modules/main/routils/kde_utils.py:8-101):
  * density is evaluated on a 1000-point inclusive linspace over
  * [min(data), max(data)] and the (first) argmax — or, for the paragraph
  * variant, the second-highest local peak — is returned, ceil'd to Int.
  *
  * scipy.stats.gaussian_kde with a scalar `bw_method` uses
  * bandwidth² = factor² · Var(data, ddof=1), and
  * density(x) = (1/n) Σᵢ exp(-(x-xᵢ)²/(2·bw²)) / sqrt(2π·bw²).
  * The trailing `ceil` absorbs most float noise between scipy and this
  * re-derivation.
  *
  * Degenerate inputs (n < 2 or zero variance) crash scipy in the reference;
  * here they deterministically return ceil(max(data)).
  */
object Kde {
  private val GRID = 1000

  private def variance(data: Array[Double]): Double = {
    val n = data.length
    var sum = 0.0
    var i = 0
    while (i < n) { sum += data(i); i += 1 }
    val mean = sum / n
    var acc = 0.0
    i = 0
    while (i < n) { val d = data(i) - mean; acc += d * d; i += 1 }
    acc / (n - 1)
  }

  /** exp(-e) underflows to exactly +0.0 for e ≥ 746 (the IEEE-754 double
    * cutoff is ≈745.13; 746 is safely past it), and `acc += +0.0` leaves a
    * non-negative accumulator bit-identical — so skipping those terms
    * changes NOTHING in the result while eliminating the exp() call.
    * Pays off when the sample range spans many bandwidths (wide-spread
    * detector boxes); measured neutral on the narrow-range synthetic
    * pages (A/B: 825 vs 822 pages/s single-thread). densityCurve remains
    * the hottest extraction frame (11.5% of bench CPU samples) — its
    * O(grid × n) shape is the reference's exact semantics, so further
    * reduction would change results. */
  private val UnderflowCut = 746.0

  /** Density curve on the linspace grid. The grid itself is affine in the
    * index (x_g = lo + g·step), so only the densities are materialised —
    * this function and its callers are the extraction hot path (2-3 KDE
    * estimates per page at 1000 grid points × n samples each) and must
    * stay free of boxing. */
  private def densityCurve(data: Array[Double], factor: Double): Array[Double] = {
    val n = data.length
    val bw2 = factor * factor * variance(data)
    val lo = data.min
    val hi = data.max
    val step = (hi - lo) / (GRID - 1)
    val norm = 1.0 / (n * math.sqrt(2.0 * math.Pi * bw2))
    val inv2bw2 = 1.0 / (2.0 * bw2)
    val ys = new Array[Double](GRID)
    var g = 0
    while (g < GRID) {
      val x = lo + g * step
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x - data(i)
        val e = d * d * inv2bw2
        if (e < UnderflowCut) acc += math.exp(-e)
        i += 1
      }
      ys(g) = acc * norm
      g += 1
    }
    ys
  }

  /** Streaming first-argmax of the density curve — same float ops in the
    * same order as [[densityCurve]] + [[firstArgmax]], without the 8 KB
    * grid array per call (the mode-only path never needs the curve). */
  private def modeIndex(data: Array[Double], factor: Double): Int = {
    val n = data.length
    val bw2 = factor * factor * variance(data)
    val lo = data.min
    val hi = data.max
    val step = (hi - lo) / (GRID - 1)
    val norm = 1.0 / (n * math.sqrt(2.0 * math.Pi * bw2))
    val inv2bw2 = 1.0 / (2.0 * bw2)
    var best = 0
    var bestY = Double.NegativeInfinity
    var g = 0
    while (g < GRID) {
      val x = lo + g * step
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = x - data(i)
        val e = d * d * inv2bw2
        if (e < UnderflowCut) acc += math.exp(-e)
        i += 1
      }
      val y = acc * norm
      if (y > bestY) { bestY = y; best = g }
      g += 1
    }
    best
  }

  /** x-coordinate of grid index g for the same linspace. */
  private def gridX(data: Array[Double], g: Int): Double = {
    val lo = data.min
    val step = (data.max - lo) / (GRID - 1)
    lo + g * step
  }

  private def firstArgmax(ys: Array[Double]): Int = {
    var best = 0
    var i = 1
    while (i < ys.length) { if (ys(i) > ys(best)) best = i; i += 1 }
    best
  }

  private def degenerate(data: Array[Double]): Boolean =
    data.length < 2 || variance(data) <= 0.0 || !data.forall(d => !d.isNaN && !d.isInfinity)

  /** Mode estimate with fixed bandwidth factor 0.1
    * (reference: kde_utils.py:8-30, the word/vertical threshold). */
  def kdeEstimate(data: Array[Double]): Int = withFactor(data, 0.1)

  /** Direction-dependent bandwidth: Scott-like n^(-1/5) for 'horizontal',
    * 0.1 for 'vertical' (reference: kde_utils.py:35-59). */
  def kdeEstimateD(data: Array[Double], horizontal: Boolean): Int = {
    val factor =
      if (horizontal) math.pow(data.length.toDouble, -1.0 / 5.0) else 0.1
    withFactor(data, factor)
  }

  private def withFactor(data: Array[Double], factor: Double): Int = {
    if (data.isEmpty) return 0
    if (degenerate(data)) return math.ceil(data.max).toInt
    math.ceil(gridX(data, modeIndex(data, factor))).toInt
  }

  /** Paragraph-threshold variant: Scott-like bandwidth, then the
    * SECOND-highest local peak of the density curve (first peak if only
    * one exists) (reference: kde_utils.py:82-101).
    *
    * Peak finding mirrors scipy.signal.find_peaks' default behaviour:
    * interior local maxima; a flat plateau peaks at its floor-midpoint;
    * array edges are never peaks.
    */
  def kdePara(data: Array[Double]): Int = {
    if (data.isEmpty) return 0
    if (degenerate(data)) return math.ceil(data.max).toInt
    val factor = math.pow(data.length.toDouble, -1.0 / 5.0)
    val ys = densityCurve(data, factor)
    val peaks = findPeaks(ys)
    val idx =
      if (peaks.isEmpty) firstArgmax(ys)
      else if (peaks.length < 2) peaks.head
      else {
        // second peak by height; ties broken toward the later index
        // (matches a reversed stable ascending argsort)
        val byHeightDesc = peaks.sortBy(p => (-ys(p), -p))
        byHeightDesc(1)
      }
    math.ceil(gridX(data, idx)).toInt
  }

  /** scipy.signal.find_peaks default local-maxima scan
    * (plateau → floor of midpoint; edges excluded). */
  private[geom] def findPeaks(ys: Array[Double]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var i = 1
    val last = ys.length - 1
    while (i < last) {
      if (ys(i - 1) < ys(i)) {
        var ahead = i + 1
        while (ahead < last && ys(ahead) == ys(i)) ahead += 1
        if (ys(ahead) < ys(i)) {
          out += (i + ahead - 1) / 2
          i = ahead
        } else i = ahead
      } else i += 1
    }
    out.result()
  }
}
