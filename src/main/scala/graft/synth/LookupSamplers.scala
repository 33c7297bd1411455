package graft.synth

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.runtime.{ChineseRestaurant, Checksums, Multinomial, SeedData}

/** Domain/lookup generators — the §2.1.2 family. All draw from the
  * compact seed tables in graft.runtime.SeedData (broadcast-sized;
  * serialized once per task with the sampler tree).
  */
object LookupSamplers {

  /** `string` (samplers/StringSampler.java:78-96): multinomial over a
    * user-supplied value→weight map.
    */
  final class StringDistSampler(dist: Multinomial[String]) extends Sampler {
    val dataType: DataType = StringType
    def sample(ctx: GenContext): Any = dist.sample(ctx.rng)
  }

  /** Weighted categorical over a seed table — covers `country`, `state`,
    * `language`, `browser`, `os` (reference CountrySampler etc., all thin
    * subclasses of StringSampler).
    */
  final class CategorySampler(dist: Multinomial[String]) extends Sampler {
    val dataType: DataType = StringType
    def sample(ctx: GenContext): Any = dist.sample(ctx.rng)
  }

  /** `username` (samplers/UsernameSampler.java:30-55): rank-weighted stem
    * plus a small numeric suffix.
    */
  final class UsernameSampler extends Sampler {
    val dataType: DataType = StringType
    private val stems = Multinomial.byRank(SeedData.usernames)
    def sample(ctx: GenContext): Any =
      stems.sample(ctx.rng) + (ctx.rng.nextInt(1000))
  }

  /** `name` (samplers/NameSampler.java:110-131): census-style first/last;
    * types first/last/first_last/last_first; publishes the drawn name on
    * the side channel for `email-name` (NameSampler.java:56,114).
    */
  final class NameSampler(tpe: String) extends Sampler {
    val dataType: DataType = StringType
    private val first = Multinomial(SeedData.maleFirst ++ SeedData.femaleFirst)
    private val last = Multinomial(SeedData.lastNames)
    def sample(ctx: GenContext): Any = {
      val f = first.sample(ctx.rng)
      val l = last.sample(ctx.rng)
      val v = tpe match {
        case "first"      => f
        case "last"       => l
        case "last_first" => s"$l, $f"
        case _            => s"$f $l"
      }
      ctx.side("previousName") = (f, l)
      v
    }
  }

  /** `street-name` (samplers/StreetNameSampler.java:63): three
    * independent draws joined with spaces.
    */
  final class StreetNameSampler extends Sampler {
    val dataType: DataType = StringType
    private val a = Multinomial.uniform(SeedData.streetFirst)
    private val b = Multinomial.uniform(SeedData.streetSecond)
    private val c = Multinomial.uniform(SeedData.streetThird)
    def sample(ctx: GenContext): Any =
      s"${a.sample(ctx.rng)} ${b.sample(ctx.rng)} ${c.sample(ctx.rng)}"
  }

  /** `address` (samplers/AddressSampler.java:41): skewed street number +
    * street name.
    */
  final class AddressSampler extends Sampler {
    val dataType: DataType = StringType
    private val fk = new ScalarSamplers.ForeignKeySampler(100000, 0.5)
    private val street = new StreetNameSampler
    def sample(ctx: GenContext): Any =
      s"${fk.sample(ctx).asInstanceOf[Long] + 1} ${street.sample(ctx)}"
  }

  /** `zip` (samplers/ZipSampler.java:148-277): a row from the zip table;
    * options: onlyContinental, zip prefix match, lat/long bounding box,
    * fuzz, `fields` projection, verbose=false → just the zip string.
    * Geo predicates pre-filter the dimension table (no rejection loop —
    * SURVEY §4's planned improvement).
    */
  final class ZipSampler(fields: Option[Seq[String]], onlyContinental: Boolean,
      prefix: Option[String], latMin: Option[Double], latMax: Option[Double],
      lonMin: Option[Double], lonMax: Option[Double],
      latFuzz: Option[Double], lonFuzz: Option[Double],
      verbose: Boolean) extends Sampler {

    private val allFields = Seq("zip", "city", "state", "latitude", "longitude")
    private val kept = fields.map(_.filter(allFields.contains)).getOrElse(allFields)
    private val rows: Vector[SeedData.ZipRow] = {
      val base = if (onlyContinental) SeedData.continentalZips else SeedData.zips
      val p = prefix.map(p => base.filter(_.zip.startsWith(p))).getOrElse(base)
      val g = p.filter(z =>
        latMin.forall(z.latitude >= _) && latMax.forall(z.latitude <= _) &&
          lonMin.forall(z.longitude >= _) && lonMax.forall(z.longitude <= _))
      require(g.nonEmpty, "zip: no rows match the requested constraints")
      g
    }
    val dataType: DataType =
      if (!verbose) StringType
      else StructType(kept.map {
        case f @ ("latitude" | "longitude") => StructField(f, DoubleType)
        case f                              => StructField(f, StringType)
      })
    def sample(ctx: GenContext): Any = {
      val z = rows(ctx.rng.nextInt(rows.length))
      if (!verbose) z.zip
      else {
        // per-axis one-sided fuzz, matching ZipSampler.java:257-260
        val lat = z.latitude + latFuzz.map(ctx.rng.nextDouble() * _).getOrElse(0.0)
        val lon = z.longitude + lonFuzz.map(ctx.rng.nextDouble() * _).getOrElse(0.0)
        Row.fromSeq(kept.map {
          case "zip"       => z.zip
          case "city"      => z.city
          case "state"     => z.state
          case "latitude"  => lat
          case "longitude" => lon
        })
      }
    }
  }

  /** `ssn` (samplers/SsnSampler.java:115-141): seeded area code + random
    * group/serial, AAA-GG-SSSS; `fields` keep-list adds state/type.
    */
  final class SsnSampler(fields: Option[Seq[String]], types: Seq[String]) extends Sampler {
    private val areas = SeedData.ssnAreas.filter(a => types.contains(a._3))
    require(areas.nonEmpty, "ssn: no area codes for requested types")
    private val kept = fields.getOrElse(Seq("ssn"))
    val dataType: DataType =
      if (kept == Seq("ssn")) StringType
      else StructType(kept.map(f => StructField(f, StringType)))
    def sample(ctx: GenContext): Any = {
      val (area, state, tpe) = areas(ctx.rng.nextInt(areas.length))
      val ssn = f"$area%03d-${ctx.rng.nextInt(99) + 1}%02d-${ctx.rng.nextInt(9999) + 1}%04d"
      if (kept == Seq("ssn")) ssn
      else Row.fromSeq(kept.map {
        case "ssn"         => ssn
        case "state"       => state
        case "description" => tpe
        case _             => ssn
      })
    }
  }

  /** `vin` (samplers/VinSampler.java:94-207): WMI by country/make, year
    * code letter, real ISO-3779 check digit, sequential tail; `verbose`
    * adds make/model/engine/year fields.
    */
  final class VinSampler(countries: Option[Set[String]], makes: Option[Set[String]],
      yearMin: Int, yearMax: Int, verbose: Boolean) extends Sampler {
    private val wmis = SeedData.vinWmi.filter { case (_, c, m) =>
      countries.forall(_.contains(c)) && makes.forall(_.contains(m))
    }
    require(wmis.nonEmpty, "vin: no WMI matches the country/make filters")
    private val vds = "ABCDEFGHJKLMNPRSTUVWXYZ0123456789"
    val dataType: DataType =
      if (!verbose) StringType
      else StructType(Seq(StructField("VIN", StringType),
        StructField("manufacturer", StringType), StructField("model", StringType),
        StructField("engine", StringType), StructField("year", IntegerType)))
    def sample(ctx: GenContext): Any = {
      val (wmi, _, make) = wmis(ctx.rng.nextInt(wmis.length))
      val year = yearMin + ctx.rng.nextInt(yearMax - yearMin + 1)
      val yearCode = SeedData.vinYearCodes.charAt(Math.floorMod(year - 1980, 30))
      val body = (1 to 5).map(_ => vds.charAt(ctx.rng.nextInt(vds.length))).mkString
      val plant = vds.charAt(ctx.rng.nextInt(vds.length))
      val serial = f"${ctx.rng.nextInt(1000000)}%06d"
      val noCheck = s"$wmi$body" + "0" + s"$yearCode$plant$serial"
      val vin = noCheck.updated(8, Checksums.vinCheckChar(noCheck))
      if (!verbose) vin
      else Row(vin, make, SeedData.vinModels(ctx.rng.nextInt(SeedData.vinModels.length)),
        SeedData.vinEngines(ctx.rng.nextInt(SeedData.vinEngines.length)), year)
    }
  }

  /** `vehicle` (samplers/AutoCertification.java:116-174): VIN + plate +
    * expiration date.
    */
  final class VehicleSampler extends Sampler {
    private val vin = new VinSampler(None, None, 2000, 2024, verbose = false)
    private val letters = "ABCDEFGHJKLMNPRSTUVWXYZ"
    val dataType: DataType = StructType(Seq(
      StructField("vin", StringType), StructField("license", StringType),
      StructField("expiration", StringType)))
    private val ft = graft.runtime.FancyTime("yyyy-MM-dd")
    def sample(ctx: GenContext): Any = {
      val plate = (1 to 3).map(_ => letters.charAt(ctx.rng.nextInt(letters.length))).mkString +
        "-" + f"${ctx.rng.nextInt(1000)}%03d"
      val expMs = 1375315200000L + (ctx.rng.nextDouble() * 3 * 365.25 * 86400000L).toLong
      Row(vin.sample(ctx), plate, ft.formatMillis(expMs))
    }
  }

  /** `word` (samplers/WordSampler.java:36, distributions/TermGenerator):
    * Pitman–Yor over a frequency-weighted vocabulary with generated
    * neologisms past the table.
    */
  final class WordSampler(alpha: Double, discount: Double) extends Sampler {
    val dataType: DataType = StringType
    private val crp = new ChineseRestaurant(alpha, discount)
    private val base = SeedData.words.map(_._1)
    def sample(ctx: GenContext): Any = {
      val idx = crp.sample(ctx.rng)
      if (idx < base.length) base(idx)
      else s"w${java.lang.Long.toUnsignedString(graft.runtime.Rng.mix(idx.toLong), 36)}"
    }
  }

  /** `text` (samplers/TextSampler.java:40-91): draws from a user bag or a
    * bundled quote table.
    */
  final class TextBagSampler(bag: Multinomial[String]) extends Sampler {
    val dataType: DataType = StringType
    def sample(ctx: GenContext): Any = bag.sample(ctx.rng)
  }

  /** `ipv4` (samplers/IpV4AddressSampler.java:44-63): public or
    * private-range dotted quad.
    */
  final class Ipv4Sampler(priv: Boolean) extends Sampler {
    val dataType: DataType = StringType
    def sample(ctx: GenContext): Any =
      if (priv) s"10.${ctx.rng.nextInt(256)}.${ctx.rng.nextInt(256)}.${ctx.rng.nextInt(254) + 1}"
      else {
        var a = ctx.rng.nextInt(223) + 1 // public unicast leading octet
        if (a == 10 || a == 127) a += 1
        s"$a.${ctx.rng.nextInt(256)}.${ctx.rng.nextInt(256)}.${ctx.rng.nextInt(254) + 1}"
      }
  }

  /** `imei` (samplers/ImeiSampler.java:74-130): 8-digit TAC + 6-digit
    * serial + Luhn check digit. Uniqueness: the full row id is embedded
    * in the 12 digits after the "35" TAC prefix — genuinely disjoint up
    * to 10^12 rows, no Bloom filter, no shared state (the reference
    * dedups through a Guava BloomFilter, which both costs memory and
    * can't coordinate across executors).
    */
  final class ImeiSampler(unique: Boolean) extends Sampler {
    val dataType: DataType = StringType
    private val tacs = Vector("35332811", "49015420", "35693803", "86723902", "01326300")
    def sample(ctx: GenContext): Any = {
      val body =
        if (unique) f"35${ctx.rowId % 1000000000000L}%012d"
        else tacs(ctx.rng.nextInt(tacs.length)) + f"${ctx.rng.nextInt(1000000)}%06d"
      body + Checksums.luhnCheckDigit(body)
    }
  }

  /** Shared domain Pitman–Yor: warm-started with corporate domains, then
    * surname+TLD coinages (reference EmailSampler.java:63-76).
    */
  final class DomainDraw extends Serializable {
    private val crp = new ChineseRestaurant(10.0, 0.3)
    private val tld = Multinomial(SeedData.tlds)
    private val last = Multinomial(SeedData.lastNames)
    private val coined = scala.collection.mutable.ArrayBuffer[String]()
    def draw(ctx: GenContext): String = {
      val idx = crp.sample(ctx.rng)
      if (idx < SeedData.corpDomains.length) SeedData.corpDomains(idx)
      else {
        val i = idx - SeedData.corpDomains.length
        if (i < coined.length) coined(i)
        else {
          val d = last.sample(ctx.rng).toLowerCase + "." + tld.sample(ctx.rng)
          coined += d
          d
        }
      }
    }
  }

  /** `email` (samplers/EmailSampler.java:169): first.last@domain. */
  final class EmailSampler extends Sampler {
    val dataType: DataType = StringType
    private val first = Multinomial(SeedData.maleFirst ++ SeedData.femaleFirst)
    private val last = Multinomial(SeedData.lastNames)
    private val domains = new DomainDraw
    def sample(ctx: GenContext): Any =
      s"${first.sample(ctx.rng).toLowerCase}.${last.sample(ctx.rng).toLowerCase}@${domains.draw(ctx)}"
  }

  /** `email-name` (samplers/EmailNameSampler.java:170-178): reuses the
    * most recent `name` draw in the same record via the side channel.
    */
  final class EmailNameSampler extends Sampler {
    val dataType: DataType = StringType
    private val fallback = new EmailSampler
    private val domains = new DomainDraw
    def sample(ctx: GenContext): Any = ctx.side.get("previousName") match {
      case Some((f: String, l: String)) =>
        s"${f.toLowerCase}.${l.toLowerCase}@${domains.draw(ctx)}"
      case _ => fallback.sample(ctx)
    }
  }

  /** `domain` (samplers/DomainSampler.java:112-123): {domain, revDomain}. */
  final class DomainSampler extends Sampler {
    val dataType: DataType = StructType(Seq(
      StructField("domain", StringType), StructField("revDomain", StringType)))
    private val domains = new DomainDraw
    def sample(ctx: GenContext): Any = {
      val d = domains.draw(ctx)
      Row(d, d.split('.').reverse.mkString("."))
    }
  }

  /** `header` (samplers/HeaderSampler.java:44-201 + the web-headers
    * template resources): HTTP request header block assembled from the
    * reference's own template structure. `type` selects the traffic
    * shape:
    *
    *   - normal: full header with UA/accept/language/encoding/referer,
    *     keep-alive, the stale `If-None-Match: "v9”` etag (curly-quote
    *     typo and all — it is part of the traffic signature);
    *   - mal1: same template but `Accept-Encoding: identity`;
    *   - mal2: same template but whitespace-only encoding;
    *   - mal3: all header names lowercased (the bot tell);
    *   - ababil: the fixed MSIE-6 flood shape (no HTTP version in the
    *     request line, `Accept-Language: fr`, no-cache pragmas).
    */
  final class HeaderSampler(tpe: String, prolog: Option[String]) extends Sampler {
    val dataType: DataType = StringType
    private val browser = Multinomial(SeedData.browsers)
    private val langCodes = Multinomial(SeedData.headerLangs)

    private def url(rng: java.util.Random, isImage: Boolean): String =
      f"http://foo.bar.com/${rng.nextInt(1000000)}%06d/${rng.nextInt(0x1000000)}%06x" +
        (if (isImage) ".jpg" else ".html")

    private def accept(isImage: Boolean): String =
      if (isImage) "image/png,image/*;q=0.8,*/*;q=0.5"
      else "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"

    private def encoding(rng: java.util.Random): String = tpe match {
      case "mal1" => "identity"
      case "mal2" => "             "
      case _ => rng.nextInt(3) match {
        case 0 => "gzip"
        case 1 => "deflate"
        case _ => "gzip, deflate"
      }
    }

    private def userAgent(rng: java.util.Random): String = {
      val b = browser.sample(rng)
      val uas = SeedData.userAgents(b)
      uas(rng.nextInt(uas.length)).replace("%d", (90 + rng.nextInt(40)).toString)
    }

    private def language(rng: java.util.Random): String = {
      val l = langCodes.sample(rng)
      s"$l-${l.toUpperCase},$l;q=0.5"
    }

    def sample(ctx: GenContext): Any = {
      val rng = ctx.rng
      val isImage = rng.nextDouble() < 0.3
      val host = f"x${rng.nextInt(5)}%03d.foo.com"
      val sb = new StringBuilder
      prolog.foreach(sb.append)
      tpe match {
        case "ababil" =>
          sb.append(s"GET ${url(rng, isImage)}\n")
          sb.append(s"Host: $host\n")
          sb.append("User-Agent: Mozilla/4.0 (compatible; MSIE 6.0; Windows NT 5.1;)\n")
          sb.append("Accept-Encoding: deflate\n")
          sb.append("Accept-Charset: UTF-8\n")
          sb.append("Accept-Language: fr\n")
          sb.append("Cache-Control: no-cache\n")
          sb.append("Pragma: no-cache\n")
          sb.append("Connection: Keep-Alive\n")
        case t =>
          // normal, mal1, mal2 share the canonical template; mal3 is the
          // same lines with lowercased header names
          def h(name: String): String = if (t == "mal3") name.toLowerCase else name
          sb.append(s"GET ${url(rng, isImage)} HTTP/1.1\n")
          sb.append(s"${h("Host")}: $host\n")
          sb.append(s"${h("User-Agent")}: ${userAgent(rng)}\n")
          sb.append(s"${h("Accept")}: ${accept(isImage)}\n")
          sb.append(s"${h("Accept-Language")}: ${language(rng)}\n")
          sb.append(s"${h("Accept-Encoding")}: ${encoding(rng)}\n")
          sb.append(s"${h("Referer")}: ${url(rng, isImage = false)}\n")
          sb.append(s"${h("Connection")}: keep-alive\n")
          sb.append(s"${h("If-None-Match")}: \"v9”\n")
          sb.append(s"${h("Cache-Control")}: max-age=0\n")
      }
      sb.toString
    }
  }
}
