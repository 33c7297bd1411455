package graft.synth

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Structural combinators — the §2.1.3 family: the reference's
  * projection / nesting / explode layer.
  */
object Combinators {

  /** `map` (samplers/MapSampler.java:55-69): nested sub-schema → struct. */
  final class MapSampler(fields: Seq[(String, Sampler)]) extends Sampler {
    val dataType: DataType =
      StructType(fields.map { case (n, s) => StructField(n, s.dataType) })
    def sample(ctx: GenContext): Any = Row.fromSeq(fields.map(_._2.sample(ctx)))
    override def restart(): Unit = fields.foreach(_._2.restart())
  }

  /** `sequence` (samplers/SequenceSampler.java:70-145), non-flat form:
    * array from a repeated `base` sampler with a sampled length, or
    * one-each from a list of samplers. Heterogeneous element types fall
    * back to strings (Spark arrays are homogeneous; the reference emits
    * raw JSON arrays).
    */
  final class SequenceSampler(base: Either[(Sampler, Sampler), Seq[Sampler]])
      extends Sampler {
    private val elementType: DataType = base match {
      case Left((b, _)) => b.dataType
      case Right(ss) =>
        val ts = ss.map(_.dataType).distinct
        if (ts.length == 1) ts.head else StringType
    }
    private val stringify = base.isRight &&
      base.toOption.exists(_.map(_.dataType).distinct.length > 1)
    val dataType: DataType = ArrayType(elementType, containsNull = false)
    override def restart(): Unit = base match {
      case Left((b, len)) => b.restart(); len.restart()
      case Right(ss)      => ss.foreach(_.restart())
    }
    def sample(ctx: GenContext): Any = base match {
      case Left((b, len)) =>
        // the reference restarts the repeated base before every array
        // sample (SequenceSampler.java:131-138) — this is what resets an
        // embedded random-walk per record; top-level samplers never restart
        b.restart()
        val n = len.sample(ctx) match {
          case l: Long => l.toInt
          case i: Int  => i
          case d: Double => d.toInt
          case other   => other.toString.toDouble.toInt
        }
        (0 until n.max(0)).map(_ => b.sample(ctx))
      case Right(ss) =>
        val vs = ss.map(_.sample(ctx))
        if (stringify) vs.map(String.valueOf) else vs
    }
  }

  /** `join` (samplers/JoinSampler.java:32-59): string-join of an array's
    * elements (NOT a relational join).
    */
  final class JoinSampler(value: Sampler, separator: String) extends Sampler {
    val dataType: DataType = StringType
    override def restart(): Unit = value.restart()
    def sample(ctx: GenContext): Any = value.sample(ctx) match {
      case s: Seq[_] => s.map(String.valueOf).mkString(separator)
      case other     => String.valueOf(other)
    }
  }

  /** `array-flatten` (samplers/ArrayFlattener.java:33-59): flatten one
    * nesting level.
    */
  final class ArrayFlattenSampler(value: Sampler) extends Sampler {
    override def restart(): Unit = value.restart()
    val dataType: DataType = value.dataType match {
      case ArrayType(ArrayType(e, _), _) => ArrayType(e, containsNull = false)
      case other                         => other
    }
    def sample(ctx: GenContext): Any = value.sample(ctx) match {
      case s: Seq[_] => s.flatMap {
        case inner: Seq[_] => inner
        case x             => Seq(x)
      }
      case other => other
    }
  }

  /** `lookup` (samplers/FileSampler.java:45-142): rows from an external
    * .json/.csv/.tsv file, random (optionally skewed) index — the
    * reference's scan/source operator. The file is read once at compile
    * time on the driver and ships with the sampler tree (broadcast-style);
    * big dimension tables belong in a real `spark.read` join instead.
    */
  final class LookupFileSampler(rows: IndexedSeq[Row], schema: StructType, skew: Int)
      extends Sampler {
    require(rows.nonEmpty, "lookup: empty table")
    val dataType: DataType = schema
    def sample(ctx: GenContext): Any = {
      var idx = ctx.rng.nextInt(rows.length)
      var i = 0
      while (i < skew) { idx = math.min(idx, ctx.rng.nextInt(rows.length)); i += 1 }
      rows(idx)
    }
  }

  object LookupFileSampler {
    def fromFile(path: String, skew: Int): LookupFileSampler = {
      val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8)
      fromText(path, text, skew)
    }

    /** Classpath-resource lookup — reference parity with
      * FileSampler.setResource (FileSampler.java:74-84): the table ships
      * inside the jar and resolves by name on any executor, no shared
      * filesystem needed (the 100 TB-friendly way to distribute a small
      * dimension with the job). Format sniffed from the name exactly
      * like the file path (.json / .tsv / csv default).
      */
    def fromResource(name: String, skew: Int): LookupFileSampler = {
      val in = Option(Thread.currentThread.getContextClassLoader)
        .flatMap(cl => Option(cl.getResourceAsStream(name)))
        .orElse(Option(getClass.getClassLoader.getResourceAsStream(name)))
        .getOrElse(throw new IllegalArgumentException(
          s"lookup: resource '$name' not found on classpath"))
      val text =
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      fromText(name, text, skew)
    }

    private def fromText(path: String, text: String, skew: Int): LookupFileSampler = {
      val rows: Seq[Map[String, String]] =
        if (path.endsWith(".json")) {
          val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
          val root = mapper.readTree(text)
          val it = if (root.isArray) {
            import scala.jdk.CollectionConverters._
            root.elements().asScala.toSeq
          } else Seq(root)
          it.map { n =>
            import scala.jdk.CollectionConverters._
            n.properties().asScala.map(e => e.getKey ->
              (if (e.getValue.isTextual) e.getValue.asText else e.getValue.toString)).toMap
          }
        } else {
          val sep = if (path.endsWith(".tsv")) '\t' else ','
          val lines = text.split("\n").filter(_.nonEmpty)
          val hdr = lines.head.split(sep).map(_.trim)
          lines.tail.map(l => hdr.zip(l.split(sep).map(_.trim)).toMap).toSeq
        }
      require(rows.nonEmpty, s"lookup: no data rows in $path")
      val cols = rows.head.keys.toSeq.sorted
      val schema = StructType(cols.map(c => StructField(c, StringType)))
      new LookupFileSampler(
        rows.map(r => Row.fromSeq(cols.map(c => r.getOrElse(c, "")))).toIndexedSeq,
        schema, skew)
    }
  }

  /** `changer` (samplers/Changer.java:119-285): slowly-changing-dimension
    * emulator — a base record whose fields mutate at exponential event
    * times; output is an array of {time, values, changes} snapshots.
    */
  final class ChangerSampler(fields: Seq[(String, Sampler)], meanIntervalMs: Double,
      count: Sampler, startMs: Long, format: String) extends Sampler {
    private val valuesType = StructType(fields.map { case (n, s) => StructField(n, s.dataType) })
    private val changesType = StructType(fields.map { case (n, _) => StructField(n, IntegerType) })
    val dataType: DataType = ArrayType(StructType(Seq(
      StructField("time", StringType),
      StructField("values", valuesType),
      StructField("changes", changesType))), containsNull = false)
    private val ft = graft.runtime.FancyTime(format)
    def sample(ctx: GenContext): Any = {
      val n = (count.sample(ctx) match {
        case l: Long => l.toInt
        case other   => other.toString.toDouble.toInt
      }).max(1)
      var now = startMs.toDouble
      val current = fields.map(_._2.sample(ctx)).toArray
      val out = Vector.newBuilder[Row]
      out += Row(ft.formatMillis(now.toLong), Row.fromSeq(current.toSeq),
        Row.fromSeq(fields.map(_ => 1)))
      var k = 1
      while (k < n) {
        now += -math.log(ctx.rng.nextDouble()) * meanIntervalMs
        // beta-ish biased field choice: earlier fields change less often
        val idx = math.min(fields.length - 1,
          (math.pow(ctx.rng.nextDouble(), 0.5) * fields.length).toInt)
        current(idx) = fields(idx)._2.sample(ctx)
        out += Row(ft.formatMillis(now.toLong), Row.fromSeq(current.toSeq),
          Row.fromSeq(fields.indices.map(i => if (i == idx) 1 else 0)))
        k += 1
      }
      out.result()
    }
  }
}
