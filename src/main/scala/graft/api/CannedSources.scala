package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.synth.Synth

/** The canned NiFi source processors (§2.1.4) as parameterized schema
  * builders over the same engine.
  */
object CannedSources {

  /** The shipped IoT schema (reference
    * processors/src/main/resources/generators/iot-data.json) — the ONE
    * copy used by iotData, both bench queries (g30 interpreter / g53
    * fast path), and tests, so the path comparison can never drift.
    */
  val iotSchemaJson: String = """[
      {"name": "device-id", "class": "uuid"},
      {"name": "device-ip", "class": "ipv4"},
      {"class": "flatten", "prefix": "",
       "value": {"class": "zip", "onlyContinental": true, "fields": "latitude, longitude"}},
      {"class": "sequence", "lengthDistribution": 100,
       "base": {"class": "map", "value": [
         {"name": "time", "class": "event", "format": "yyyy-MM-dd HH:mm:ss", "rate": "1/m"},
         {"name": "temp", "class": "random-walk", "start": 30, "mean": 0, "sd": 1}]},
       "flat": true}
    ]"""

  /** IotData (processors/synthesizers/iot/IotData.java:31-53): device
    * dims × 100-reading flat series.
    */
  def iotData(spark: SparkSession, nDevices: Long, seed: Long = 42L): DataFrame =
    Synth.dataFrameAuto(spark, iotSchemaJson, nDevices, seed)

  /** PhoneNumber (processors/synthesizers/telephony/PhoneNumber.java
    * :35-95): NNN-NNN-NNNN with optional fixed area code. The schema is
    * fully stateless, so it rides the Catalyst fast path (codegen'd,
    * partitioning-invariant — and bit-checkable by the g31 DuckDB
    * oracle, which recomputes every digit from the hash chain).
    */
  def phoneSchemaJson(areaCode: Option[Int]): String = {
    require(areaCode.forall(a => a >= 0 && a <= 999), "area-code must be <= 3 digits")
    val area = areaCode
      .map(a => s"""{"class": "int", "min": $a, "max": ${a + 1}}""")
      .getOrElse("""{"class": "int", "min": 200, "max": 999}""")
    s"""[
      {"name": "phone", "class": "join", "separator": "-",
       "value": {"class": "sequence", "array": [
         $area,
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 1000, "max": 9999}]}}
    ]"""
  }

  def phoneNumber(spark: SparkSession, n: Long, areaCode: Option[Int] = None,
      seed: Long = 42L): DataFrame =
    Synth.dataFrameAuto(spark, phoneSchemaJson(areaCode), n, seed)

  /** TextMessage (processors/synthesizers/telephony/TextMessage.java
    * :40-161): source IMEI + two numbers + timestamp + Markov message.
    */
  def textMessage(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame =
    Synth.dataFrame(spark, """[
      {"name": "source_imei", "class": "imei"},
      {"name": "from", "class": "join", "separator": "-",
       "value": {"class": "sequence", "array": [
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 1000, "max": 9999}]}},
      {"name": "to", "class": "join", "separator": "-",
       "value": {"class": "sequence", "array": [
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 200, "max": 999},
         {"class": "int", "min": 1000, "max": 9999}]}},
      {"name": "timestamp", "class": "event", "format": "yyyy-MM-dd HH:mm:ss", "rate": "2/s"},
      {"name": "message", "class": "text", "words": 12}
    ]""", n, seed)

  /** TextGenerator (processors/synthesizers/text/TextGenerator.java
    * :35-91): `wordLength` words of Markov text per row.
    */
  def textGenerator(spark: SparkSession, n: Long, wordLength: Int,
      seed: Long = 42L): DataFrame =
    Synth.dataFrame(spark,
      s"""[{"name": "message", "class": "text", "words": $wordLength}]""", n, seed)

  /** CommuterData (processors/synthesizers/cars/CommuterData.java:33-86):
    * commuter traces with an optional home zip (5-digit or zip+4
    * validated like the reference).
    */
  def commuterData(spark: SparkSession, n: Long, homeZip: Option[String] = None,
      flat: Boolean = true, seed: Long = 42L): DataFrame = {
    homeZip.foreach(z => require(z.matches("^[0-9]{5}(?:-[0-9]{4})?$"),
      s"bad home-location '$z'"))
    val home = homeZip.map(z => s""", "home": "${z.take(5)}"""").getOrElse("")
    Synth.dataFrame(spark,
      s"""[{"class": "commuter", "flat": $flat, "days": 5$home}]""", n, seed)
  }
}
