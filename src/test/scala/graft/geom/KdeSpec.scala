package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.TestData
import scala.jdk.CollectionConverters._

/** KDE mode estimates vs the independent numpy re-derivation
  * (tools/gen_goldens.py kde section). */
class KdeSpec extends AnyFunSuite {

  /** Same 64-bit LCG as the golden generator. */
  private def lcg(seed: Long, n: Int, lo: Double, hi: Double): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      lo + (s >>> 11).toDouble / (1L << 53).toDouble * (hi - lo)
    }
  }

  test("kde estimates match numpy goldens") {
    val cases = TestData.readResource("/golden/kde_cases.json").elements.asScala.toVector
    for (c <- cases) {
      val data = lcg(c.get("seed").asLong, c.get("n").asInt,
                     c.get("lo").asDouble, c.get("hi").asDouble)
      assert(Kde.kdeEstimate(data) == c.get("estimate01").asInt, s"estimate01 seed=${c.get("seed")}")
      assert(Kde.kdeEstimateD(data, horizontal = true) == c.get("estimateH").asInt, s"estimateH seed=${c.get("seed")}")
      assert(Kde.kdePara(data) == c.get("para").asInt, s"para seed=${c.get("seed")}")
    }
  }

  test("degenerate inputs are deterministic") {
    assert(Kde.kdeEstimate(Array.empty[Double]) == 0)
    assert(Kde.kdeEstimate(Array(3.2)) == 4)
    assert(Kde.kdeEstimate(Array(5.0, 5.0, 5.0)) == 5)
    assert(Kde.kdePara(Array(2.5, 2.5)) == 3)
  }

  test("mode lies within the sample range") {
    val data = lcg(123, 300, 10.0, 60.0)
    val m = Kde.kdeEstimate(data)
    assert(m >= data.min.floor && m <= data.max.ceil)
  }
}
