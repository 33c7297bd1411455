package graft.runtime

/** A public-suffix list in publicsuffix.org rule syntax: normal rules
  * ("co.uk"), wildcard rules ("*.ck" — the wildcard matches exactly one
  * label), and exception rules ("!www.ck" — the named domain is NOT a
  * public suffix even though a wildcard covers it). The implicit
  * default rule "*" (every bare TLD is a public suffix) is part of the
  * algorithm, not the data.
  *
  * This is an embedded REPRESENTATIVE SUBSET of the real list (the
  * full ~9k-rule file is a trivial drop-in replacement for `rules` —
  * the lookup compiles to per-label-count hash sets, so size only
  * affects the closure, not the plan shape). Coverage: the ICANN
  * second-level registrations for the most common ccTLDs in crawl
  * data, the wildcard/exception families (.ck and the Japanese
  * prefecture-city blocks), and the major private-section hosting
  * suffixes (github.io, blogspot.com, s3.amazonaws.com, ...).
  */
object PslData {

  val rules: Seq[String] = Seq(
    // ---- United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    // ---- Japan (prefecture-city wildcard blocks + city exceptions)
    "co.jp", "or.jp", "ne.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    // ---- Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    // ---- Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br", "eco.br", "eng.br", "esp.br",
    "far.br", "flog.br", "ind.br", "inf.br", "jus.br", "leg.br",
    "med.br", "mus.br", "rec.br", "srv.br", "tur.br", "vlog.br",
    "wiki.br",
    // ---- China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn", "ah.cn", "bj.cn", "cq.cn", "fj.cn", "gd.cn", "gs.cn",
    "gx.cn", "gz.cn", "ha.cn", "hb.cn", "he.cn", "hi.cn", "hl.cn",
    "hn.cn", "jl.cn", "js.cn", "jx.cn", "ln.cn", "nm.cn", "nx.cn",
    "qh.cn", "sc.cn", "sd.cn", "sh.cn", "sn.cn", "sx.cn", "tj.cn",
    "xj.cn", "xz.cn", "yn.cn", "zj.cn",
    // ---- India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    // ---- South Korea
    "co.kr", "ne.kr", "or.kr", "re.kr", "pe.kr", "go.kr", "mil.kr",
    "ac.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr",
    "busan.kr", "daegu.kr", "incheon.kr", "gwangju.kr", "daejeon.kr",
    // ---- South Africa
    "co.za", "net.za", "org.za", "ac.za", "gov.za", "edu.za", "web.za",
    "nom.za",
    // ---- New Zealand
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz", "iwi.nz", "health.nz",
    "mil.nz", "parliament.nz",
    // ---- Mexico / Argentina / Chile / Colombia / Peru / Venezuela
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "gov.ar",
    "int.ar", "mil.ar", "tur.ar", "musica.ar",
    "co.cl", "gob.cl", "gov.cl", "mil.cl",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co",
    "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe",
    "nom.pe",
    "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve", "mil.ve",
    "web.ve", "info.ve", "co.ve",
    // ---- Turkey
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr",
    "info.tr", "k12.tr", "kep.tr", "name.tr", "pol.tr", "tel.tr",
    "tsk.tr", "tv.tr", "web.tr",
    // ---- Russia / Ukraine
    "com.ru", "net.ru", "org.ru", "edu.ru", "gov.ru", "int.ru",
    "mil.ru", "msk.ru", "spb.ru", "ac.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "kiev.ua", "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua",
    // ---- Israel
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "muni.il",
    "idf.il", "k12.il",
    // ---- Singapore / Hong Kong / Taiwan
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw",
    "idv.tw", "game.tw", "ebiz.tw", "club.tw",
    // ---- Thailand / Indonesia / Malaysia / Philippines / Vietnam
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "mil.id", "web.id",
    "sch.id", "my.id", "biz.id", "desa.id", "ponpes.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph",
    "i.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    // ---- Poland
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "mil.pl",
    "info.pl", "waw.pl", "warszawa.pl", "krakow.pl", "wroclaw.pl",
    "poznan.pl", "gda.pl", "gdansk.pl", "lodz.pl", "biz.pl",
    "sklep.pl", "shop.pl", "media.pl",
    // ---- Egypt / Saudi Arabia / UAE / Nigeria / Kenya / Ghana
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "mil.eg",
    "sci.eg", "eun.eg", "name.eg",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa",
    "pub.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae",
    "sch.ae",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "mil.ng",
    "name.ng", "sch.ng", "mobi.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.gh", "org.gh", "edu.gh", "gov.gh", "mil.gh",
    // ---- wildcard-only ccTLDs (the .ck family and friends)
    "*.ck", "!www.ck",
    "*.bd", "*.er", "*.fk", "*.kh", "*.mm", "*.np", "*.pg",
    // ---- common gTLD second-levels from the ICANN section
    "gov.uk", "ac.at", "co.at", "or.at", "gv.at",
    "co.nl", "com.de", "com.se",
    // ---- private-section hosting suffixes (the crawl-relevant set)
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "blogspot.co.uk", "blogspot.com.br",
    "blogspot.in", "blogspot.de", "blogspot.jp", "blogspot.mx",
    "wordpress.com", "herokuapp.com", "appspot.com",
    "firebaseapp.com", "web.app", "netlify.app", "vercel.app",
    "pages.dev", "workers.dev", "fly.dev", "onrender.com",
    "surge.sh", "neocities.org", "readthedocs.io",
    "s3.amazonaws.com", "cloudfront.net", "elasticbeanstalk.com",
    "azurewebsites.net", "cloudapp.net", "trafficmanager.net",
    "ngrok.io", "glitch.me", "repl.co", "codeberg.page",
    "tumblr.com", "weebly.com", "wixsite.com", "squarespace.com",
    "myshopify.com", "bandcamp.com", "hatenablog.com",
    "sakura.ne.jp", "duckdns.org", "no-ip.org", "dyndns.org")

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
