package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.geom.BBox
import graft.layout.Region
import scala.jdk.CollectionConverters._

/** Test-resource loading: fixture region sets + golden outputs. */
object TestData {
  private val mapper = new ObjectMapper()

  def readResource(path: String): JsonNode = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing test resource $path")
    try mapper.readTree(in) finally in.close()
  }

  private def regionOf(n: JsonNode): Region = {
    val bb = n.get("bounding_box")
    Region(
      bbox = BBox(bb.get("x").asInt, bb.get("y").asInt, bb.get("w").asInt, bb.get("h").asInt),
      order = if (n.has("order")) n.get("order").asInt else -1,
      label = if (n.has("label")) n.get("label").asText else "",
      line = if (n.has("line")) n.get("line").asInt else 0,
      confidence = if (n.has("confidence")) n.get("confidence").asDouble else 0.0)
  }

  /** Fixture file: [{image_name, regions: [...]}] → region vector. */
  def fixture(name: String): Vector[Region] =
    readResource(s"/fixtures/merge_codes/$name.json")
      .get(0).get("regions").elements.asScala.map(regionOf).toVector

  /** Golden file: flat [region, ...] with bbox/order/line payload. */
  def golden(name: String): Vector[Region] =
    readResource(s"/golden/$name.json").elements.asScala.map(regionOf).toVector

  /** Semantic payload compared against goldens. */
  def payload(rs: Seq[Region]): Vector[(BBox, Int, Int)] =
    rs.map(r => (r.bbox, r.order, r.line)).toVector
}
