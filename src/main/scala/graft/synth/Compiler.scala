package graft.synth

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.types._
import graft.runtime.{FancyTime, Multinomial}
import graft.spec.{FieldSpec, SpecParser}

import scala.jdk.CollectionConverters._

/** Compiles a parsed FieldSpec tree into Sampler instances. Dispatch is
  * by `class` name, mirroring the reference's Jackson polymorphic
  * registry (samplers/FieldSampler.java:36-85); each branch documents
  * which reference semantics it reproduces.
  */
object Compiler {
  import ScalarSamplers._
  import LookupSamplers._
  import Combinators._
  import SimulationSamplers._

  /** One top-level column source. `Multi` is a flatten (one struct sample
    * splat into several columns); `Generator` is a flat array sampler
    * whose elements fan out into rows (the reference's crossProduct,
    * SchemaSampler.java:119-158 — implemented with the documented full
    * cross-product semantics, not the early-return bug noted in SURVEY
    * §7.4(5)).
    */
  sealed trait FieldEntry
  final case class Single(name: String, s: Sampler) extends FieldEntry
  final case class Multi(names: Seq[String], types: Seq[DataType], s: Sampler) extends FieldEntry
  final case class Generator(name: String, s: Sampler) extends FieldEntry

  def compileSchema(schemaJson: String): Seq[FieldEntry] =
    entries(SpecParser.parse(schemaJson))

  def entries(specs: Seq[FieldSpec]): Seq[FieldEntry] = specs.map { f =>
    f.clazz match {
      case "flatten" =>
        val value = compile(sub(f, "value"))
        val prefix = f.str("prefix").getOrElse(f.name.map(_ + "-").getOrElse(""))
        value.dataType match {
          case StructType(fields) =>
            Multi(fields.toSeq.map(prefix + _.name), fields.toSeq.map(_.dataType), value)
          case other =>
            Single(f.name.getOrElse("value"), value)
        }
      case "sequence" if f.bool("flat").contains(true) =>
        Generator(f.name.getOrElse("seq"), compile(f))
      case "dns" if f.bool("flat").contains(true) =>
        Generator(f.name.getOrElse("dns"), compile(f))
      case "commuter" if f.bool("flat").contains(true) =>
        Generator(f.name.getOrElse("commuter"), compile(f))
      case _ =>
        Single(f.name.getOrElse(f.clazz), compile(f))
    }
  }

  /** The StructType the composed record will have. */
  def structType(es: Seq[FieldEntry]): StructType = StructType(es.flatMap {
    case Single(n, s) => Seq(StructField(n, s.dataType))
    case Multi(ns, ts, _) => ns.zip(ts).map { case (n, t) => StructField(n, t) }
    case Generator(n, s) => s.dataType match {
      case ArrayType(st: StructType, _) => st.fields.toSeq
      case ArrayType(e, _)              => Seq(StructField(n, e))
      case other                        => Seq(StructField(n, other))
    }
  })

  private def sub(f: FieldSpec, key: String): FieldSpec = {
    val n = f.node(key).getOrElse(
      throw new IllegalArgumentException(s"${f.clazz} needs '$key'"))
    SpecParser.parseField(n)
  }
  private def subFields(n: JsonNode): Seq[(String, Sampler)] = {
    val arr = if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    arr.map { e =>
      val fs = SpecParser.parseField(e)
      fs.name.getOrElse(fs.clazz) -> compile(fs)
    }
  }
  /** `dist` option as a multinomial, keys parsed with `parse` — a bad
    * key names the field instead of surfacing a bare NumberFormatException.
    */
  private def distAs[T](f: FieldSpec)(parse: String => T): Option[Multinomial[T]] =
    f.node("dist").map { d =>
      Multinomial(d.properties().asScala.toSeq.map { e =>
        val k = try parse(e.getKey)
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"${f.clazz} '${f.name.getOrElse("?")}': bad dist key '${e.getKey}'")
        }
        k -> e.getValue.asDouble(1.0)
      })
    }
  private def distOf(f: FieldSpec): Option[Multinomial[String]] = distAs(f)(identity)

  def compile(f: FieldSpec): Sampler = f.clazz match {
    // ------------------------------------------------------------- scalars
    case "int" | "integer" | "random-int" =>
      new IntSampler(f.sizeLong("min").getOrElse(0L), f.sizeLong("max").getOrElse(100L),
        f.int("skew").getOrElse(0), distAs(f)(_.toLong),
        f.str("format").filter(_.contains("%")))
    case "double" | "float" =>
      new DoubleSampler(f.dbl("min").getOrElse(0.0), f.dbl("max").getOrElse(100.0),
        f.int("skew").getOrElse(0), distAs(f)(_.toDouble),
        f.str("format").filter(_.contains("%")))
    case "normal" =>
      val sd = f.dbl("sd").orElse(f.dbl("precision").map(p => 1.0 / p)).getOrElse(1.0)
      new NormalSampler(f.dbl("mean").getOrElse(0.0), sd, f.dbl("min"), f.dbl("max"))
    case "gamma" =>
      val (shape, scale) = (f.dbl("alpha"), f.dbl("beta"), f.dbl("dof"), f.dbl("scale")) match {
        case (Some(a), b, _, _) => (a, 1.0 / b.getOrElse(1.0))
        case (_, _, Some(d), s) => (d, s.getOrElse(1.0))
        case (None, Some(b), _, _) => (1.0, 1.0 / b) // beta alone applies to default alpha
        case _                  => (1.0, 1.0)
      }
      new GammaSampler(shape, scale)
    case "random-walk" =>
      val sd = f.dbl("sd")
        .orElse(f.dbl("variance").map(math.sqrt))
        .orElse(f.dbl("precision").map(p => 1.0 / math.sqrt(p)))
        .getOrElse(1.0)
      new RandomWalkSampler(f.dbl("start").getOrElse(0.0), f.dbl("mean").getOrElse(0.0),
        sd, f.bool("verbose").contains(true))
    case "id"   => new IdSampler(f.long("start").getOrElse(0L))
    case "uuid" => new UuidSampler
    case "date" =>
      val fmt = f.str("format").getOrElse("yyyy-MM-dd")
      val ft = FancyTime(fmt)
      def parse(k: String) = f.str(k).map(ft.parseMillis)
      new DateSampler(fmt, parse("start"), parse("end"))
    case "event" =>
      val fmt = f.str("format").getOrElse("yyyy-MM-dd HH:mm:ss")
      val meanMs = f.str("rate").map(SpecParser.parseRateAsIntervalMs)
        .orElse(f.dbl("meanInterval")).getOrElse(1000.0)
      val start = f.str("start").map(FancyTime(fmt).parseMillis).getOrElse(1375315200000L)
      new EventSampler(start, meanMs, fmt)
    case "foreign-key" =>
      new ForeignKeySampler(f.sizeLong("size").getOrElse(1000L),
        f.dbl("skew").getOrElse(0.5))
    case "pitman_yor" | "long-tail" =>
      new PitmanYorSampler(f.dbl("alpha").getOrElse(1.0), f.dbl("discount").getOrElse(0.0))
    case "vector" =>
      val len: Sampler = f.node("length") match {
        case Some(n) if n.isNumber => new ConstSampler(n.asLong, LongType)
        case Some(n)               => compile(SpecParser.parseField(n))
        case None                  => new ConstSampler(f.long("size").getOrElse(10000L), LongType)
      }
      val mode = if (f.dbl("mean").isDefined || f.dbl("sd").isDefined) "normal" else "uniform"
      new VectorSampler(len, mode, f.dbl("min").getOrElse(0.0), f.dbl("max").getOrElse(1.0),
        f.dbl("mean").getOrElse(0.0), f.dbl("sd").getOrElse(1.0),
        f.str("transform"), f.dbl("resolution"))

    // ------------------------------------------------------------- lookups
    case "string" =>
      new StringDistSampler(distOf(f).getOrElse(
        throw new IllegalArgumentException("string sampler needs 'dist'")))
    case "country"  => new CategorySampler(Multinomial(graft.runtime.SeedData.countries))
    case "state"    => new CategorySampler(Multinomial(graft.runtime.SeedData.states))
    case "language" => new CategorySampler(Multinomial(graft.runtime.SeedData.languages))
    case "browser"  => new CategorySampler(Multinomial(graft.runtime.SeedData.browsers))
    case "os"       => new CategorySampler(Multinomial(graft.runtime.SeedData.osList))
    case "username" => new UsernameSampler
    case "name"     => new NameSampler(f.str("type").map(_.toLowerCase).getOrElse("first_last"))
    case "street-name" => new StreetNameSampler
    case "address"  => new AddressSampler
    case "zip" | "gis" =>
      new ZipSampler(
        f.str("fields").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
        f.bool("onlyContinental").contains(true),
        f.str("zip").orElse(f.str("prefix")),
        f.dbl("latitudeMin"), f.dbl("latitudeMax"),
        f.dbl("longitudeMin"), f.dbl("longitudeMax"),
        f.dbl("latitudeFuzz").orElse(f.dbl("fuzz")),
        f.dbl("longitudeFuzz").orElse(f.dbl("fuzz")),
        f.bool("verbose").getOrElse(true))
    case "toll" =>
      val zip = new ZipSampler(None, onlyContinental = true, None, None, None, None, None, None, None, verbose = true)
      new MapSampler(Seq(
        "location" -> zip,
        "timestamp" -> new DateSampler("yyyy-MM-dd HH:mm:ss",
          Some(1375315200000L - 365L * 86400000L), Some(1375315200000L)),
        "country" -> new ConstSampler(f.str("country").getOrElse("usa"), StringType)))
    case "ssn" =>
      new SsnSampler(
        f.str("fields").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
        f.str("types").map(_.split(",").map(_.trim.toLowerCase).toSeq)
          .getOrElse(Seq("normal")))
    case "vin" =>
      // `years` is a single year or a "2007-2011" range (the reference's
      // setYears contract); yearMin/yearMax override individually
      val yearsOpt = f.str("years").map { y =>
        y.split("-") match {
          case Array(lo, hi) => (lo.trim.toInt, hi.trim.toInt)
          case Array(one)    => (one.trim.toInt, one.trim.toInt)
          case _ => throw new IllegalArgumentException(s"vin: bad years '$y'")
        }
      }
      new VinSampler(
        f.str("countries").map(_.split(",").map(_.trim.toLowerCase).toSet),
        f.str("makes").map(_.split(",").map(_.trim).toSet),
        f.int("yearMin").orElse(yearsOpt.map(_._1)).getOrElse(2000),
        f.int("yearMax").orElse(yearsOpt.map(_._2)).getOrElse(2024),
        f.bool("verbose").contains(true))
    case "vehicle" => new VehicleSampler
    case "word" =>
      new WordSampler(f.dbl("alpha").getOrElse(50.0), f.dbl("discount").getOrElse(0.3))
    case "text" =>
      // quote mode key: the reference's setType takes chucknorris /
      // backtothefuture / gameofthrones (TextSampler.java:56-68)
      (f.node("dist"), f.str("type").orElse(f.str("source")), f.int("words")) match {
        case (Some(_), _, _)    => new TextBagSampler(distOf(f).get)
        case (_, Some(src), _)  => new QuoteSampler(src)
        case (_, _, Some(n))    => new MarkovTextSampler(n)
        case _                  => new MarkovTextSampler(20)
      }
    case "ipv4" => new Ipv4Sampler(f.bool("private").contains(true))
    case "imei" => new ImeiSampler(f.bool("unique").contains(true))
    case "email" => new EmailSampler
    case "email-name" => new EmailNameSampler
    case "domain" => new DomainSampler
    case "header" =>
      new HeaderSampler(f.str("type").map(_.toLowerCase).getOrElse("normal"), f.str("prolog"))

    // --------------------------------------------------------- combinators
    case "map" => new MapSampler(subFields(f.node("value").getOrElse(
      throw new IllegalArgumentException("map needs 'value'"))))
    case "sequence" =>
      (f.node("array"), f.node("base")) match {
        case (Some(arr), _) =>
          new SequenceSampler(Right(arr.elements().asScala.toSeq
            .map(n => compile(SpecParser.parseField(n)))))
        case (_, Some(baseN)) =>
          val base = compile(SpecParser.parseField(baseN))
          val len: Sampler = f.node("lengthDistribution") match {
            case Some(n) if n.isNumber => new ConstSampler(n.asLong, LongType)
            case Some(n)               => compile(SpecParser.parseField(n))
            case None =>
              new ExpLengthSampler(f.dbl("length").getOrElse(5.0))
          }
          new SequenceSampler(Left((base, len)))
        case _ => throw new IllegalArgumentException("sequence needs 'base' or 'array'")
      }
    case "join" =>
      new JoinSampler(compile(sub(f, "value")), f.str("separator").getOrElse(","))
    case "array-flatten" => new ArrayFlattenSampler(compile(sub(f, "value")))
    case "flatten" => compile(sub(f, "value")) // nested flatten: struct passthrough
    case "lookup" =>
      // `resource`/`resource:` loads from the classpath (FileSampler
      // setResource parity); `file` reads the filesystem
      val skew = f.int("skew").getOrElse(0)
      f.str("file") match {
        case Some(p) if p.startsWith("resource:") =>
          LookupFileSampler.fromResource(p.stripPrefix("resource:"), skew)
        case Some(p) => LookupFileSampler.fromFile(p, skew)
        case None => LookupFileSampler.fromResource(
          f.str("resource").getOrElse(
            throw new IllegalArgumentException("lookup needs 'file' or 'resource'")),
          skew)
      }
    case "changer" =>
      val fields = subFields(f.node("values").orElse(f.node("value")).getOrElse(
        throw new IllegalArgumentException("changer needs 'values'")))
      val meanMs = f.str("rate").map(SpecParser.parseRateAsIntervalMs)
        .orElse(f.dbl("meanInterval")).getOrElse(86400000.0)
      val count: Sampler = f.node("count") match {
        case Some(n) if n.isNumber => new ConstSampler(n.asLong, LongType)
        case Some(n)               => compile(SpecParser.parseField(n))
        case None                  => new ExpLengthSampler(5.0)
      }
      new ChangerSampler(fields, meanMs, count, 1375315200000L,
        f.str("format").getOrElse("yyyy-MM-dd HH:mm:ss"))

    // --------------------------------------------------------- simulations
    case "dns" =>
      new DnsSampler(f.dbl("meanQueries").getOrElse(20.0),
        f.bool("flat").contains(true),
        f.str("fields").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
        f.dbl("v4Prob").orElse(f.dbl("ipV4Probability")).getOrElse(0.3))
    case "bursts" => new BurstsSampler(compile(sub(f, "value")))
    case "common-point-of-compromise" =>
      new CpocSampler(f.dbl("meanTransactions").getOrElse(30.0))
    case "commuter" =>
      new CommuterSampler(f.str("home").orElse(f.str("home-location")),
        f.int("days").getOrElse(5), f.bool("flat").contains(true),
        f.dbl("work").getOrElse(10.0))

    case other => throw new IllegalArgumentException(s"unhandled sampler class '$other'")
  }
}
