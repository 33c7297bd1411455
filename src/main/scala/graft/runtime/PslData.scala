package graft.runtime

/** The public-suffix list in publicsuffix.org rule syntax: normal rules
  * ("co.uk"), wildcard rules ("*.ck" — the wildcard matches exactly one
  * label), and exception rules ("!www.ck" — the named domain is NOT a
  * public suffix even though a wildcard covers it). The implicit
  * default rule "*" (every bare TLD is a public suffix) is part of the
  * algorithm, not the data.
  *
  * r10: the FULL ~9.5k-rule public list (ICANN + private sections) is
  * bundled as a classpath resource (`graft/public_suffix_list.dat`,
  * the publicsuffix.org dat file — public data under MPL-2.0,
  * snapshot 2023-02-09) and parsed once at class load. This replaces
  * the r9 representative subset; the lookup in
  * [[graft.ops.UrlOps.registrableDomain]] compiles each per-label-count
  * rule set to one InSet hash probe, so the 25× rule growth changes
  * the literal closure size, not the plan shape.
  *
  * Unicode (IDN) rules are kept in BOTH forms: the list's unicode
  * spelling and the punycode (`xn--`) ASCII form via
  * `java.net.IDN.toASCII`, since crawl-corpus hostnames arrive
  * punycoded while the list ships unicode.
  */
object PslData {

  /** Raw rule lines from the bundled dat file: comments/blanks
    * stripped, IDN rules duplicated in punycode form.
    */
  val rules: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat resource missing")
    val raw =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      finally in.close()
    var idnDropped = 0
    val out = raw.flatMap { rule =>
      val (flag, body) =
        if (rule.startsWith("!")) ("!", rule.drop(1))
        else if (rule.startsWith("*.")) ("*.", rule.drop(2))
        else ("", rule)
      val ascii =
        try java.net.IDN.toASCII(body)
        catch { case _: Exception =>
          // IDNA2003 can reject rules IDNA2008 allows: keep the unicode
          // spelling but COUNT the missing punycode alias — a silent
          // drop would make xn-- hosts under that suffix fall to the
          // default rule with no signal
          if (body.exists(_ > 127)) idnDropped += 1
          body
        }
      if (ascii == body) Seq(rule) else Seq(rule, flag + ascii)
    }
    if (idnDropped > 0)
      System.err.println(s"[graft] PslData: $idnDropped IDN rule(s) have " +
        "no punycode alias (java.net.IDN/IDNA2003 rejected the conversion)")
    out
  }

  /** Normal rules grouped by label count (k labels -> public suffix of
    * k labels).
    */
  lazy val normalByLen: Map[Int, Set[String]] = rules
    .filterNot(r => r.startsWith("*") || r.startsWith("!"))
    .groupBy(_.count(_ == '.') + 1)
    .map { case (k, v) => k -> v.toSet }

  /** Wildcard rule BASES grouped by base label count (base of m labels
    * -> public suffix of m+1 labels when the host's last m labels equal
    * the base).
    */
  lazy val wildBaseByLen: Map[Int, Set[String]] = rules
    .filter(_.startsWith("*."))
    .map(_.drop(2))
    .groupBy(_.count(_ == '.') + 1)
    .map { case (m, v) => m -> v.toSet }

  /** Exception rules grouped by label count (k labels -> public suffix
    * of k-1 labels when the host's last k labels equal the rule).
    */
  lazy val excByLen: Map[Int, Set[String]] = rules
    .filter(_.startsWith("!"))
    .map(_.drop(1))
    .groupBy(_.count(_ == '.') + 1)
    .map { case (k, v) => k -> v.toSet }

  /** Longest public suffix any rule can produce (label count). */
  lazy val maxPsLen: Int =
    (normalByLen.keySet ++ wildBaseByLen.keySet.map(_ + 1) ++
      excByLen.keySet.map(_ - 1) + 1).max
}
