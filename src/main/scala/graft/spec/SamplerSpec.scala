package graft.spec

import com.fasterxml.jackson.core.JsonParser
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** One field spec from the generator-schema DSL: a `class` naming the
  * sampler type, an optional `name`, and sampler-specific options kept as
  * the raw JSON node (each sampler reads its own options, mirroring the
  * reference's Jackson polymorphic binding on the `class` property —
  * samplers/FieldSampler.java:36-85).
  */
final case class FieldSpec(name: Option[String], clazz: String, params: JsonNode) {
  def str(key: String): Option[String] =
    Option(params.get(key)).filterNot(_.isNull).map(n => if (n.isTextual) n.asText else n.toString)
  def int(key: String): Option[Int] = Option(params.get(key)).filterNot(_.isNull).map(_.asInt)
  def long(key: String): Option[Long] = Option(params.get(key)).filterNot(_.isNull).map(_.asLong)
  def dbl(key: String): Option[Double] = Option(params.get(key)).filterNot(_.isNull).map(_.asDouble)
  def bool(key: String): Option[Boolean] =
    Option(params.get(key)).filterNot(_.isNull).map { n =>
      if (n.isBoolean) n.asBoolean else n.asText.toBoolean
    }
  def node(key: String): Option[JsonNode] = Option(params.get(key)).filterNot(_.isNull)

  /** Numeric option accepting the reference's K/M/G suffixes
    * (Util.java:47-64): "10K" → 10240? No — log-synth uses decimal
    * kilo/mega/giga multipliers (1e3/1e6/1e9).
    */
  def sizeLong(key: String): Option[Long] = str(key).map(SpecParser.parseSize)
}

/** Lenient parser for the generator-schema DSL. Accepts the same slack
  * the reference allows (SchemaSampler.java:56-59): comments, single
  * quotes, unquoted field names — plus the auto-wrap of a bare object
  * into a one-element array (DataSynthesizerBase.java:140-146).
  */
object SpecParser {
  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.configure(JsonParser.Feature.ALLOW_COMMENTS, true)
    m.configure(JsonParser.Feature.ALLOW_SINGLE_QUOTES, true)
    m.configure(JsonParser.Feature.ALLOW_UNQUOTED_FIELD_NAMES, true)
    m
  }

  /** All sampler classes this engine knows — same names as the
    * reference's registry (samplers/FieldSampler.java:36-85).
    */
  val registry: Set[String] = Set(
    "int", "integer", "double", "float", "normal", "gamma", "random-walk",
    "sequence", "id", "uuid", "date", "event", "foreign-key", "pitman_yor",
    "long-tail", "vector", "string", "name", "street-name", "address", "zip",
    "toll", "ssn", "vin", "vehicle", "country", "state", "language",
    "browser", "os", "username", "word", "text", "ipv4", "imei", "email",
    "email-name", "domain", "dns", "bursts", "common-point-of-compromise",
    "commuter", "header", "map", "flatten", "array-flatten", "join",
    "lookup", "changer", "gis", "random-int",
  )

  def parse(schema: String): Seq[FieldSpec] = {
    val trimmed = schema.trim
    val root =
      try mapper.readTree(trimmed)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"unparseable schema: ${e.getMessage}")
      }
    val arr =
      if (root.isArray) root
      else mapper.readTree(s"[${trimmed}]") // bare object auto-wrap
    arr.elements().asScala.map(parseField).toSeq
  }

  def parseField(n: JsonNode): FieldSpec = {
    val clazz = Option(n.get("class")).map(_.asText)
      .getOrElse(throw new IllegalArgumentException(s"field spec missing 'class': $n"))
    require(registry.contains(clazz), s"unknown sampler class '$clazz'")
    FieldSpec(Option(n.get("name")).filterNot(_.isNull).map(_.asText), clazz, n)
  }

  /** Parse "10", "10K", "2.5M", "1G" (decimal multipliers, Util.java:47-64). */
  def parseSize(s: String): Long = {
    val t = s.trim
    require(t.nonEmpty, "empty size value")
    val (num, mult) = t.last.toUpper match {
      case 'K' => (t.dropRight(1), 1e3)
      case 'M' => (t.dropRight(1), 1e6)
      case 'G' => (t.dropRight(1), 1e9)
      case _   => (t, 1.0)
    }
    (num.toDouble * mult).toLong
  }

  /** Parse rate strings like "5/m", "0.5/s", "100/h", "2/d" into a mean
    * inter-arrival interval in milliseconds (Util.java:110-120 contract).
    */
  def parseRateAsIntervalMs(rate: String): Double = {
    val parts = rate.trim.split("/")
    require(parts.length == 2, s"bad rate '$rate' (want N/unit)")
    val perUnit = parts(0).toDouble
    val unitMs = parts(1).trim match {
      case "ms"      => 1.0
      case "s"       => 1000.0
      case "m"       => 60 * 1000.0
      case "h"       => 3600 * 1000.0
      case "d"       => 24 * 3600 * 1000.0
      case "w"       => 7 * 24 * 3600 * 1000.0
      case u         => throw new IllegalArgumentException(s"bad rate unit '$u'")
    }
    unitMs / perUnit
  }
}
