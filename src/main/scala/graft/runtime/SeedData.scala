package graft.runtime

/** Compact, original seed tables for the domain/lookup samplers.
  *
  * The reference bundles large resource files (census name frequencies,
  * a zip-code database, VIN code tables — see SURVEY §2.1.2). Shipping
  * those verbatim is neither possible (zip.csv is a missing blob,
  * /root/reference/.MISSING_LARGE_BLOBS) nor desirable; these tables are
  * small original lists with the same *shape* (weighted multinomials,
  * keyed lookup rows), which is what the operator semantics need. All
  * tables are broadcast-sized by design: lookups stay map-side at any
  * scale.
  */
object SeedData {

  // ------------------------------------------------------------------ names

  val maleFirst: Vector[(String, Double)] = Vector(
    "JAMES" -> 3.3, "JOHN" -> 3.2, "ROBERT" -> 3.1, "MICHAEL" -> 3.0,
    "WILLIAM" -> 2.5, "DAVID" -> 2.4, "RICHARD" -> 1.7, "CHARLES" -> 1.5,
    "JOSEPH" -> 1.4, "THOMAS" -> 1.4, "DANIEL" -> 1.0, "MATTHEW" -> 0.9,
    "ANTHONY" -> 0.8, "MARK" -> 0.8, "DONALD" -> 0.8, "STEVEN" -> 0.8,
    "PAUL" -> 0.8, "ANDREW" -> 0.7, "JOSHUA" -> 0.7, "KENNETH" -> 0.7,
    "KEVIN" -> 0.7, "BRIAN" -> 0.7, "GEORGE" -> 0.6, "EDWARD" -> 0.6,
    "RONALD" -> 0.6, "TIMOTHY" -> 0.6, "JASON" -> 0.6, "JEFFREY" -> 0.6,
    "RYAN" -> 0.5, "JACOB" -> 0.5, "GARY" -> 0.5, "NICHOLAS" -> 0.5,
    "ERIC" -> 0.5, "JONATHAN" -> 0.5, "STEPHEN" -> 0.5, "LARRY" -> 0.4,
    "JUSTIN" -> 0.4, "SCOTT" -> 0.4, "BRANDON" -> 0.4, "BENJAMIN" -> 0.4,
    "SAMUEL" -> 0.4, "GREGORY" -> 0.4, "FRANK" -> 0.4, "ALEXANDER" -> 0.4,
    "RAYMOND" -> 0.3, "PATRICK" -> 0.3, "JACK" -> 0.3, "DENNIS" -> 0.3,
    "JERRY" -> 0.3, "TYLER" -> 0.3, "AARON" -> 0.3, "JOSE" -> 0.3,
    "ADAM" -> 0.3, "HENRY" -> 0.3, "NATHAN" -> 0.3, "DOUGLAS" -> 0.3,
    "ZACHARY" -> 0.2, "PETER" -> 0.2, "KYLE" -> 0.2, "WALTER" -> 0.2,
    "CARLOS" -> 0.4, "JUAN" -> 0.3, "LUIS" -> 0.3, "MIGUEL" -> 0.2,
    "OMAR" -> 0.2, "CHEN" -> 0.2, "RAJ" -> 0.2, "AMIR" -> 0.2,
    "IVAN" -> 0.2, "SERGEI" -> 0.1, "HIROSHI" -> 0.1, "KWAME" -> 0.1,
    "ALBERT" -> 0.2, "ARTHUR" -> 0.2, "AUSTIN" -> 0.2, "BILLY" -> 0.2,
    "BOBBY" -> 0.1, "BRADLEY" -> 0.2, "BRUCE" -> 0.2, "BRYAN" -> 0.2,
    "CALEB" -> 0.1, "CARL" -> 0.2, "CHAD" -> 0.1, "CHRISTIAN" -> 0.2,
    "CHRISTOPHER" -> 0.9, "CLARENCE" -> 0.1, "CODY" -> 0.1, "CRAIG" -> 0.2,
    "CURTIS" -> 0.1, "DALE" -> 0.1, "DANNY" -> 0.1, "DARRYL" -> 0.1,
    "DEAN" -> 0.1, "DEREK" -> 0.1, "DUSTIN" -> 0.1, "DYLAN" -> 0.2,
    "EARL" -> 0.1, "ERNEST" -> 0.1, "ETHAN" -> 0.2, "EUGENE" -> 0.1,
    "EVAN" -> 0.1, "FRANCIS" -> 0.1, "FRED" -> 0.1, "GABRIEL" -> 0.2,
    "GERALD" -> 0.2, "GLENN" -> 0.1, "GORDON" -> 0.1, "HAROLD" -> 0.2,
    "HARRY" -> 0.1, "HOWARD" -> 0.1, "IAN" -> 0.1, "ISAAC" -> 0.1,
    "JARED" -> 0.1, "JEREMY" -> 0.3, "JESSE" -> 0.2, "JOEL" -> 0.1,
    "JORDAN" -> 0.2, "JORGE" -> 0.1, "KEITH" -> 0.2, "LAWRENCE" -> 0.2,
    "LEONARD" -> 0.1, "LOGAN" -> 0.1, "LOUIS" -> 0.1, "LUCAS" -> 0.1,
    "MARTIN" -> 0.2, "MASON" -> 0.1, "NOAH" -> 0.2, "NORMAN" -> 0.1,
    "OSCAR" -> 0.1, "PHILIP" -> 0.2, "RALPH" -> 0.1, "RANDY" -> 0.1,
    "RICARDO" -> 0.1, "ROGER" -> 0.2, "ROY" -> 0.2, "RUSSELL" -> 0.1,
    "SEAN" -> 0.2, "SHANE" -> 0.1, "STANLEY" -> 0.1, "TERRY" -> 0.2,
    "TODD" -> 0.1, "TRAVIS" -> 0.2, "VICTOR" -> 0.2, "VINCENT" -> 0.2,
    "WAYNE" -> 0.2, "WESLEY" -> 0.1, "DIEGO" -> 0.1, "FELIX" -> 0.1,
    "MATEO" -> 0.1, "ANDRE" -> 0.1, "MOHAMMED" -> 0.2, "YUSUF" -> 0.1,
    "DMITRI" -> 0.1, "KENJI" -> 0.1, "MINH" -> 0.1, "ARJUN" -> 0.1,
  )
  val femaleFirst: Vector[(String, Double)] = Vector(
    "MARY" -> 2.6, "PATRICIA" -> 1.1, "LINDA" -> 1.0, "BARBARA" -> 1.0,
    "ELIZABETH" -> 0.9, "JENNIFER" -> 0.9, "MARIA" -> 0.8, "SUSAN" -> 0.8,
    "MARGARET" -> 0.7, "DOROTHY" -> 0.7, "LISA" -> 0.7, "NANCY" -> 0.7,
    "KAREN" -> 0.6, "BETTY" -> 0.6, "HELEN" -> 0.6, "SANDRA" -> 0.6,
    "DONNA" -> 0.5, "CAROL" -> 0.5, "RUTH" -> 0.5, "SHARON" -> 0.5,
    "MICHELLE" -> 0.5, "LAURA" -> 0.5, "SARAH" -> 0.5, "KIMBERLY" -> 0.5,
    "DEBORAH" -> 0.4, "JESSICA" -> 0.4, "SHIRLEY" -> 0.4, "CYNTHIA" -> 0.4,
    "ANGELA" -> 0.4, "MELISSA" -> 0.4, "BRENDA" -> 0.4, "AMY" -> 0.4,
    "ANNA" -> 0.4, "REBECCA" -> 0.3, "VIRGINIA" -> 0.3, "KATHLEEN" -> 0.3,
    "PAMELA" -> 0.3, "MARTHA" -> 0.3, "DEBRA" -> 0.3, "AMANDA" -> 0.3,
    "STEPHANIE" -> 0.3, "CAROLYN" -> 0.3, "CHRISTINE" -> 0.3, "MARIE" -> 0.3,
    "JANET" -> 0.3, "CATHERINE" -> 0.3, "FRANCES" -> 0.2, "ANN" -> 0.2,
    "JOYCE" -> 0.2, "DIANE" -> 0.2, "ALICE" -> 0.2, "JULIE" -> 0.2,
    "HEATHER" -> 0.2, "TERESA" -> 0.2, "DORIS" -> 0.2, "GLORIA" -> 0.2,
    "EVELYN" -> 0.2, "JEAN" -> 0.2, "CHERYL" -> 0.2, "MILDRED" -> 0.2,
    "WEI" -> 0.2, "FATIMA" -> 0.2, "PRIYA" -> 0.2, "SOFIA" -> 0.3,
    "ELENA" -> 0.2, "YUKI" -> 0.1, "AISHA" -> 0.1, "INGRID" -> 0.1,
    "ASHLEY" -> 0.4, "EMILY" -> 0.4, "EMMA" -> 0.3, "OLIVIA" -> 0.3,
    "HANNAH" -> 0.2, "ABIGAIL" -> 0.2, "MADISON" -> 0.2, "GRACE" -> 0.2,
    "CHLOE" -> 0.1, "NICOLE" -> 0.3, "RACHEL" -> 0.3, "LAUREN" -> 0.3,
    "MEGAN" -> 0.2, "VICTORIA" -> 0.2, "KAYLA" -> 0.2, "JASMINE" -> 0.1,
    "JULIA" -> 0.2, "NATALIE" -> 0.2, "SYDNEY" -> 0.1, "GABRIELLA" -> 0.1,
    "KATHERINE" -> 0.3, "ALEXIS" -> 0.2, "SAMANTHA" -> 0.3, "ISABELLA" -> 0.2,
  )
  val lastNames: Vector[(String, Double)] = Vector(
    "SMITH" -> 1.0, "JOHNSON" -> 0.8, "WILLIAMS" -> 0.7, "BROWN" -> 0.6,
    "JONES" -> 0.6, "GARCIA" -> 0.6, "MILLER" -> 0.5, "DAVIS" -> 0.5,
    "RODRIGUEZ" -> 0.5, "MARTINEZ" -> 0.5, "HERNANDEZ" -> 0.4, "LOPEZ" -> 0.4,
    "GONZALEZ" -> 0.4, "WILSON" -> 0.4, "ANDERSON" -> 0.4, "THOMAS" -> 0.4,
    "TAYLOR" -> 0.4, "MOORE" -> 0.3, "JACKSON" -> 0.3, "MARTIN" -> 0.3,
    "LEE" -> 0.3, "PEREZ" -> 0.3, "THOMPSON" -> 0.3, "WHITE" -> 0.3,
    "HARRIS" -> 0.3, "SANCHEZ" -> 0.3, "CLARK" -> 0.3, "RAMIREZ" -> 0.3,
    "LEWIS" -> 0.3, "ROBINSON" -> 0.3, "WALKER" -> 0.3, "YOUNG" -> 0.2,
    "ALLEN" -> 0.2, "KING" -> 0.2, "WRIGHT" -> 0.2, "SCOTT" -> 0.2,
    "TORRES" -> 0.2, "NGUYEN" -> 0.3, "HILL" -> 0.2, "FLORES" -> 0.2,
    "GREEN" -> 0.2, "ADAMS" -> 0.2, "NELSON" -> 0.2, "BAKER" -> 0.2,
    "HALL" -> 0.2, "RIVERA" -> 0.2, "CAMPBELL" -> 0.2, "MITCHELL" -> 0.2,
    "CARTER" -> 0.2, "ROBERTS" -> 0.2, "GOMEZ" -> 0.2, "PHILLIPS" -> 0.2,
    "EVANS" -> 0.2, "TURNER" -> 0.2, "DIAZ" -> 0.2, "PARKER" -> 0.2,
    "CRUZ" -> 0.2, "EDWARDS" -> 0.2, "COLLINS" -> 0.2, "REYES" -> 0.2,
    "STEWART" -> 0.2, "MORRIS" -> 0.2, "MORALES" -> 0.2, "MURPHY" -> 0.2,
    "COOK" -> 0.2, "ROGERS" -> 0.2, "GUTIERREZ" -> 0.2, "ORTIZ" -> 0.2,
    "MORGAN" -> 0.1, "COOPER" -> 0.1, "PETERSON" -> 0.1, "BAILEY" -> 0.1,
    "REED" -> 0.1, "KELLY" -> 0.1, "HOWARD" -> 0.1, "RAMOS" -> 0.1,
    "KIM" -> 0.2, "COX" -> 0.1, "WARD" -> 0.1, "RICHARDSON" -> 0.1,
    "WATSON" -> 0.1, "BROOKS" -> 0.1, "CHAVEZ" -> 0.1, "WOOD" -> 0.1,
    "JAMES" -> 0.1, "BENNETT" -> 0.1, "GRAY" -> 0.1, "MENDOZA" -> 0.1,
    "RUIZ" -> 0.1, "HUGHES" -> 0.1, "PRICE" -> 0.1, "ALVAREZ" -> 0.1,
    "CASTILLO" -> 0.1, "SANDERS" -> 0.1, "PATEL" -> 0.2, "MYERS" -> 0.1,
    "LONG" -> 0.1, "ROSS" -> 0.1, "FOSTER" -> 0.1, "JIMENEZ" -> 0.1,
    "CHEN" -> 0.2, "WANG" -> 0.2, "SINGH" -> 0.2, "COHEN" -> 0.1,
    "LIU" -> 0.1, "ZHANG" -> 0.1, "KHAN" -> 0.1, "ALI" -> 0.1,
    "TRAN" -> 0.1, "YANG" -> 0.1, "IVANOV" -> 0.05, "SATO" -> 0.05,
    "MULLER" -> 0.05, "SILVA" -> 0.1, "SANTOS" -> 0.1, "PEREIRA" -> 0.05,
    "BARNES" -> 0.1, "BELL" -> 0.1, "BLACK" -> 0.1, "BOYD" -> 0.05,
    "BRYANT" -> 0.1, "BURNS" -> 0.05, "BUTLER" -> 0.1, "CALDWELL" -> 0.05,
    "CARPENTER" -> 0.05, "CARROLL" -> 0.05, "CASTRO" -> 0.1, "COLE" -> 0.1,
    "COLEMAN" -> 0.1, "CRAWFORD" -> 0.05, "CUNNINGHAM" -> 0.05, "CURTIS" -> 0.05,
    "DANIELS" -> 0.05, "DEAN" -> 0.05, "DELGADO" -> 0.05, "DIXON" -> 0.05,
    "DOUGLAS" -> 0.05, "DUNCAN" -> 0.05, "DUNN" -> 0.05, "ELLIOTT" -> 0.05,
    "ELLIS" -> 0.1, "ESPINOZA" -> 0.05, "ESTRADA" -> 0.05, "FERGUSON" -> 0.05,
    "FERNANDEZ" -> 0.1, "FIELDS" -> 0.05, "FISHER" -> 0.1, "FITZGERALD" -> 0.05,
    "FORD" -> 0.05, "FOX" -> 0.05, "FRANKLIN" -> 0.05, "FREEMAN" -> 0.1,
    "GARDNER" -> 0.05, "GARZA" -> 0.05, "GEORGE" -> 0.05, "GIBSON" -> 0.1,
    "GILBERT" -> 0.05, "GORDON" -> 0.1, "GRAHAM" -> 0.1, "GRANT" -> 0.05,
    "GRIFFIN" -> 0.1, "GUERRERO" -> 0.05, "HAMILTON" -> 0.1, "HANSEN" -> 0.05,
    "HARPER" -> 0.05, "HARRISON" -> 0.1, "HART" -> 0.05, "HAWKINS" -> 0.05,
    "HENDERSON" -> 0.1, "HENRY" -> 0.1, "HERRERA" -> 0.1, "HICKS" -> 0.05,
    "HOFFMAN" -> 0.05, "HOLMES" -> 0.05, "HOPKINS" -> 0.05, "HUNT" -> 0.05,
    "HUNTER" -> 0.05, "JENKINS" -> 0.1, "JENSEN" -> 0.05, "JOHNSTON" -> 0.05,
    "JORDAN" -> 0.1, "KELLER" -> 0.05, "KENNEDY" -> 0.1, "KNIGHT" -> 0.05,
    "LANE" -> 0.05, "LARSON" -> 0.05, "LAWRENCE" -> 0.05, "LAWSON" -> 0.05,
    "LYNCH" -> 0.05, "MARSHALL" -> 0.1, "MASON" -> 0.1, "MCCARTHY" -> 0.05,
    "MCCOY" -> 0.05, "MCDONALD" -> 0.1, "MEDINA" -> 0.05, "MEYER" -> 0.05,
    "MILLS" -> 0.05, "MONTGOMERY" -> 0.05, "MORENO" -> 0.1, "MORRISON" -> 0.05,
    "MUNOZ" -> 0.05, "MURRAY" -> 0.1, "NICHOLS" -> 0.05, "OBRIEN" -> 0.05,
    "OLSON" -> 0.05, "OWENS" -> 0.05, "PALMER" -> 0.05, "PAYNE" -> 0.05,
    "PENA" -> 0.05, "PERKINS" -> 0.05, "PERRY" -> 0.1, "PIERCE" -> 0.05,
    "PORTER" -> 0.05, "POWELL" -> 0.1, "RAY" -> 0.05, "REYNOLDS" -> 0.1,
    "RICE" -> 0.05, "RICHARDS" -> 0.05, "RIOS" -> 0.05, "ROBERTSON" -> 0.05,
    "ROMERO" -> 0.1, "ROSE" -> 0.05, "RYAN" -> 0.05, "SALAZAR" -> 0.05,
    "SCHMIDT" -> 0.05, "SHAW" -> 0.05, "SIMMONS" -> 0.1, "SIMPSON" -> 0.05,
    "SNYDER" -> 0.05, "SOTO" -> 0.05, "SPENCER" -> 0.05, "STEPHENS" -> 0.05,
    "STEVENS" -> 0.1, "STONE" -> 0.05, "SULLIVAN" -> 0.1, "TUCKER" -> 0.05,
    "VARGAS" -> 0.05, "VASQUEZ" -> 0.05, "WAGNER" -> 0.05, "WALLACE" -> 0.05,
    "WARREN" -> 0.05, "WEAVER" -> 0.05, "WEBB" -> 0.05, "WELLS" -> 0.1,
    "WEST" -> 0.1, "WHEELER" -> 0.05, "WILLIS" -> 0.05, "WOODS" -> 0.05,
  )

  // ---------------------------------------------------------------- streets

  val streetFirst: Vector[String] = Vector(
    "OLD", "NEW", "NORTH", "SOUTH", "EAST", "WEST", "UPPER", "LOWER",
    "GRAND", "LITTLE", "BIG", "ROYAL",
  )
  val streetSecond: Vector[String] = Vector(
    "OAK", "MAPLE", "CEDAR", "PINE", "ELM", "WALNUT", "CHESTNUT", "WILLOW",
    "RIVER", "LAKE", "HILL", "VALLEY", "MEADOW", "FOREST", "SPRING", "SUNSET",
  )
  val streetThird: Vector[String] = Vector(
    "STREET", "AVENUE", "ROAD", "LANE", "DRIVE", "COURT", "PLACE", "WAY",
    "BOULEVARD", "TERRACE",
  )

  // ------------------------------------------------------------ geo / zips

  /** (cityName, state, lat, lon, zipPrefix, nZips) — coordinates are the
    * well-known public city centroids; zips are synthesized inside each
    * prefix block. 10001 → NEW YORK matches the reference's
    * lookup-consistency oracle (TestCommuterData.java:70).
    */
  val cities: Vector[(String, String, Double, Double, Int, Int)] = Vector(
    ("NEW YORK", "NY", 40.7128, -74.0060, 100, 40),
    ("LOS ANGELES", "CA", 34.0522, -118.2437, 900, 30),
    ("CHICAGO", "IL", 41.8781, -87.6298, 606, 25),
    ("HOUSTON", "TX", 29.7604, -95.3698, 770, 25),
    ("PHOENIX", "AZ", 33.4484, -112.0740, 850, 15),
    ("PHILADELPHIA", "PA", 39.9526, -75.1652, 191, 15),
    ("SAN ANTONIO", "TX", 29.4241, -98.4936, 782, 12),
    ("SAN DIEGO", "CA", 32.7157, -117.1611, 921, 12),
    ("DALLAS", "TX", 32.7767, -96.7970, 752, 12),
    ("SEATTLE", "WA", 47.6062, -122.3321, 981, 12),
    ("DENVER", "CO", 39.7392, -104.9903, 802, 10),
    ("BOSTON", "MA", 42.3601, -71.0589, 21, 10),
    ("ATLANTA", "GA", 33.7490, -84.3880, 303, 10),
    ("MIAMI", "FL", 25.7617, -80.1918, 331, 10),
    ("MINNEAPOLIS", "MN", 44.9778, -93.2650, 554, 8),
    ("DETROIT", "MI", 42.3314, -83.0458, 482, 8),
    ("PORTLAND", "OR", 45.5152, -122.6784, 972, 8),
    ("SAN FRANCISCO", "CA", 37.7749, -122.4194, 941, 12),
    ("SAN JOSE", "CA", 37.3382, -121.8863, 951, 10),
    ("AUSTIN", "TX", 30.2672, -97.7431, 787, 10),
    ("JACKSONVILLE", "FL", 30.3322, -81.6557, 322, 8),
    ("COLUMBUS", "OH", 39.9612, -82.9988, 432, 8),
    ("CHARLOTTE", "NC", 35.2271, -80.8431, 282, 8),
    ("INDIANAPOLIS", "IN", 39.7684, -86.1581, 462, 8),
    ("NASHVILLE", "TN", 36.1627, -86.7816, 372, 8),
    ("MEMPHIS", "TN", 35.1495, -90.0490, 381, 6),
    ("BALTIMORE", "MD", 39.2904, -76.6122, 212, 8),
    ("LOUISVILLE", "KY", 38.2527, -85.7585, 402, 6),
    ("MILWAUKEE", "WI", 43.0389, -87.9065, 532, 6),
    ("ALBUQUERQUE", "NM", 35.0844, -106.6504, 871, 6),
    ("TUCSON", "AZ", 32.2226, -110.9747, 857, 6),
    ("SACRAMENTO", "CA", 38.5816, -121.4944, 958, 8),
    ("KANSAS CITY", "MO", 39.0997, -94.5786, 641, 6),
    ("LAS VEGAS", "NV", 36.1699, -115.1398, 891, 8),
    ("NEW ORLEANS", "LA", 29.9511, -90.0715, 701, 6),
    ("CLEVELAND", "OH", 41.4993, -81.6944, 441, 6),
    ("PITTSBURGH", "PA", 40.4406, -79.9959, 152, 6),
    ("ST LOUIS", "MO", 38.6270, -90.1994, 631, 6),
    ("CINCINNATI", "OH", 39.1031, -84.5120, 452, 6),
    ("SALT LAKE CITY", "UT", 40.7608, -111.8910, 841, 6),
    ("RICHMOND", "VA", 37.5407, -77.4360, 232, 6),
    ("BUFFALO", "NY", 42.8864, -78.8784, 142, 6),
    ("HARTFORD", "CT", 41.7658, -72.6734, 61, 6),
    ("PROVIDENCE", "RI", 41.8240, -71.4128, 29, 4),
    ("OMAHA", "NE", 41.2565, -95.9345, 681, 4),
    ("BOISE", "ID", 43.6150, -116.2023, 837, 4),
    ("DES MOINES", "IA", 41.5868, -93.6250, 503, 4),
    ("CHARLESTON", "SC", 32.7765, -79.9311, 294, 4),
    ("BIRMINGHAM", "AL", 33.5186, -86.8104, 352, 4),
    ("OKLAHOMA CITY", "OK", 35.4676, -97.5164, 731, 6),
    ("ANCHORAGE", "AK", 61.2181, -149.9003, 995, 4),
    ("HONOLULU", "HI", 21.3069, -157.8583, 968, 4),
  )

  final case class ZipRow(zip: String, city: String, state: String,
      latitude: Double, longitude: Double)

  /** Synthesized zip table: nZips rows per city inside its prefix block,
    * jittered around the centroid with a deterministic per-zip offset.
    */
  val zips: Vector[ZipRow] = cities.flatMap { case (city, st, lat, lon, prefix, n) =>
    (1 to n).map { i =>
      val z = prefix * 100 + i
      val h = Rng.mix(z.toLong)
      val dLat = ((h & 0xffff) / 65535.0 - 0.5) * 0.4
      val dLon = (((h >>> 16) & 0xffff) / 65535.0 - 0.5) * 0.4
      ZipRow(f"$z%05d", city, st, lat + dLat, lon + dLon)
    }
  }
  /** Continental-US subset (the reference's onlyContinental flag excludes
    * AK/HI — ZipSampler latitude/longitude bounds).
    */
  val continentalZips: Vector[ZipRow] =
    zips.filterNot(z => z.state == "AK" || z.state == "HI")

  // ------------------------------------------------- categorical multinomials

  val states: Vector[(String, Double)] = Vector(
    "CA" -> 11.7, "TX" -> 8.6, "FL" -> 6.4, "NY" -> 6.0, "PA" -> 3.9,
    "IL" -> 3.8, "OH" -> 3.5, "GA" -> 3.2, "NC" -> 3.1, "MI" -> 3.0,
    "NJ" -> 2.7, "VA" -> 2.6, "WA" -> 2.3, "AZ" -> 2.2, "MA" -> 2.1,
    "TN" -> 2.0, "IN" -> 2.0, "MO" -> 1.8, "MD" -> 1.8, "WI" -> 1.7,
    "CO" -> 1.7, "MN" -> 1.7, "SC" -> 1.5, "AL" -> 1.5, "LA" -> 1.4,
    "KY" -> 1.3, "OR" -> 1.3, "OK" -> 1.2, "CT" -> 1.1, "UT" -> 1.0,
    "IA" -> 0.9, "NV" -> 0.9, "AR" -> 0.9, "MS" -> 0.9, "KS" -> 0.9,
    "NM" -> 0.6, "NE" -> 0.6, "WV" -> 0.5, "ID" -> 0.5, "HI" -> 0.4,
    "NH" -> 0.4, "ME" -> 0.4, "MT" -> 0.3, "RI" -> 0.3, "DE" -> 0.3,
    "SD" -> 0.3, "ND" -> 0.2, "AK" -> 0.2, "VT" -> 0.2, "WY" -> 0.2,
  )
  val countries: Vector[(String, Double)] = Vector(
    "united states" -> 20.0, "china" -> 18.0, "india" -> 17.0,
    "indonesia" -> 3.5, "brazil" -> 2.7, "pakistan" -> 2.8, "nigeria" -> 2.6,
    "bangladesh" -> 2.1, "russia" -> 1.9, "mexico" -> 1.6, "japan" -> 1.6,
    "germany" -> 1.1, "france" -> 0.9, "united kingdom" -> 0.9,
    "italy" -> 0.8, "canada" -> 0.5, "spain" -> 0.6, "australia" -> 0.3,
    "netherlands" -> 0.2, "sweden" -> 0.1,
  )
  val languages: Vector[(String, Double)] = Vector(
    "english" -> 25.0, "mandarin" -> 18.0, "hindi" -> 11.0, "spanish" -> 11.0,
    "french" -> 5.0, "arabic" -> 5.0, "bengali" -> 4.0, "russian" -> 4.0,
    "portuguese" -> 4.0, "indonesian" -> 3.0, "german" -> 2.0,
    "japanese" -> 2.0, "turkish" -> 1.5, "korean" -> 1.5, "italian" -> 1.0,
  )
  /** Same membership domain as the reference's dist.browser (the browser
    * membership oracle in TestDataSynthesizer.java:86-103).
    */
  val browsers: Vector[(String, Double)] = Vector(
    "Chrome" -> 50.0, "Safari" -> 18.0, "Mobile" -> 15.0,
    "Firefox" -> 12.0, "IE" -> 5.0,
  )
  val osList: Vector[(String, Double)] = Vector(
    "Windows" -> 40.0, "Android" -> 25.0, "iOS" -> 15.0, "macOS" -> 10.0,
    "Linux" -> 6.0, "ChromeOS" -> 4.0,
  )

  // --------------------------------------------------------------- usernames

  /** Rank-weighted username stems (1/rank weights, like the reference's
    * UsernameSampler names.txt).
    */
  val usernames: Vector[String] = Vector(
    "shadow", "falcon", "pixel", "nova", "echo", "raven", "atlas", "comet",
    "ember", "quartz", "drift", "onyx", "zephyr", "lumen", "vortex", "sable",
    "cinder", "frost", "blaze", "orbit", "delta", "sierra", "tango", "viper",
    "cobra", "lynx", "puma", "wolf", "hawk", "bear", "storm", "nebula",
    "photon", "raptor", "glacier", "thunder", "willow", "aurora", "phantom",
    "rogue", "titan", "spark", "flint", "jet", "crimson", "indigo", "cobalt",
    "slate", "granite", "mesa", "canyon", "summit", "ridge", "harbor",
    "anchor", "compass", "beacon", "sentinel", "nomad", "voyager", "pioneer",
    "scout", "ranger", "drifter", "wanderer", "maverick", "arrow", "bolt",
    "dash", "fury", "ghost", "haze", "iron", "jade", "karma", "legend",
  )

  // ------------------------------------------------------------------ words

  /** Frequency-weighted common-English head (Zipf-ish weights) plus a
    * long tail of regular content words; feeds the `word` / `text`
    * samplers' Pitman–Yor base distribution.
    */
  val words: Vector[(String, Double)] = {
    val head = Vector(
      "the" -> 7.0, "of" -> 3.5, "and" -> 3.0, "to" -> 2.6, "a" -> 2.3,
      "in" -> 2.1, "is" -> 1.1, "was" -> 1.0, "that" -> 1.0, "for" -> 0.9,
      "it" -> 0.9, "on" -> 0.8, "with" -> 0.7, "he" -> 0.7, "be" -> 0.7,
      "his" -> 0.6, "as" -> 0.6, "at" -> 0.5, "by" -> 0.5, "she" -> 0.5,
      "had" -> 0.4, "not" -> 0.4, "are" -> 0.4, "but" -> 0.4, "from" -> 0.4,
      "or" -> 0.3, "have" -> 0.3, "an" -> 0.3, "they" -> 0.3, "which" -> 0.3,
      "one" -> 0.3, "you" -> 0.3, "were" -> 0.3, "her" -> 0.3, "all" -> 0.3,
      "their" -> 0.2, "there" -> 0.2, "been" -> 0.2, "has" -> 0.2, "when" -> 0.2,
    )
    val tail = Vector(
      "time", "year", "people", "way", "day", "man", "thing", "woman", "life",
      "child", "world", "school", "state", "family", "student", "group",
      "country", "problem", "hand", "part", "place", "case", "week", "company",
      "system", "program", "question", "work", "government", "number", "night",
      "point", "home", "water", "room", "mother", "area", "money", "story",
      "fact", "month", "lot", "right", "study", "book", "eye", "job", "word",
      "business", "issue", "side", "kind", "head", "house", "service", "friend",
      "father", "power", "hour", "game", "line", "end", "member", "law", "car",
      "city", "community", "name", "president", "team", "minute", "idea",
      "body", "information", "back", "parent", "face", "others", "level",
      "office", "door", "health", "person", "art", "war", "history", "party",
      "result", "change", "morning", "reason", "research", "girl", "guy",
      "moment", "air", "teacher", "force", "education",
    ).map(_ -> 0.05)
    head ++ tail
  }

  // --------------------------------------------------------------- internet

  /** Accept-Language weights for the header sampler (shared by the
    * interpreter, the Catalyst lowering, and the DuckDB oracle — one
    * copy so the three can't drift).
    */
  val headerLangs: Vector[(String, Double)] = Vector("en" -> 6.0, "es" -> 1.2,
    "zh" -> 1.2, "de" -> 0.8, "fr" -> 0.8, "pt" -> 0.5, "ru" -> 0.5,
    "ja" -> 0.4, "it" -> 0.3, "ko" -> 0.3)

  val tlds: Vector[(String, Double)] = Vector(
    "com" -> 60.0, "org" -> 10.0, "net" -> 8.0, "io" -> 5.0, "co" -> 4.0,
    "edu" -> 3.0, "gov" -> 2.0, "biz" -> 2.0, "info" -> 2.0, "us" -> 2.0,
    "uk" -> 1.0, "de" -> 1.0,
  )
  /** Warm-start corporate domains for the email/domain Pitman–Yor, in the
    * role of the reference's f500-domains.csv.
    */
  val corpDomains: Vector[String] = Vector(
    "acmecorp.com", "globex.com", "initech.com", "umbrella.org",
    "stark.io", "wayne.co", "wonka.com", "tyrell.net", "cyberdyne.com",
    "aperture.org", "hooli.io", "pied-piper.com", "dunder-mifflin.com",
    "oscorp.com", "massive-dynamic.com", "soylent.co", "weyland.org",
    "vandelay.com", "prestige.net", "bluth.co", "northwind.com",
    "contoso.com", "fabrikam.net", "adventure-works.com", "wingtip.io",
    "tailspin.org", "proseware.com", "lamna.co", "fourthcoffee.com",
    "woodgrove.net", "alpineski.com", "margies-travel.com", "litware.io",
    "graphicdesign.org", "cohovineyard.com", "trey-research.net",
    "baldwin-museum.org", "city-power.com", "humongous.net",
    "southridge.io", "consolidated-messenger.com",
  )

  // -------------------------------------------------------------------- ssn

  /** Area-code → state blocks with the reference's shape (SsnSampler
    * seeds): "normal" issued areas plus the "extra" unissued set.
    */
  val ssnAreas: Vector[(Int, String, String)] = {
    // (areaCode, state, type): a compressed public-knowledge mapping of
    // the pre-2011 SSA area-number allocation (sampled blocks).
    val blocks = Vector(
      (1, 10, "NH"), (10, 34, "MA"), (35, 39, "RI"), (40, 49, "CT"),
      (50, 134, "NY"), (135, 158, "NJ"), (159, 211, "PA"), (212, 220, "MD"),
      (221, 222, "DE"), (223, 231, "VA"), (232, 236, "WV"), (237, 246, "NC"),
      (247, 251, "SC"), (252, 260, "GA"), (261, 267, "FL"), (268, 302, "OH"),
      (303, 317, "IN"), (318, 361, "IL"), (362, 386, "MI"), (387, 399, "WI"),
      (400, 407, "KY"), (408, 415, "TN"), (416, 424, "AL"), (425, 428, "MS"),
      (429, 432, "AR"), (433, 439, "LA"), (440, 448, "OK"), (449, 467, "TX"),
      (468, 477, "MN"), (478, 485, "IA"), (486, 500, "MO"), (501, 502, "ND"),
      (503, 504, "SD"), (505, 508, "NE"), (509, 515, "KS"), (516, 517, "MT"),
      (518, 519, "ID"), (520, 520, "WY"), (521, 524, "CO"), (525, 525, "NM"),
      (526, 527, "AZ"), (528, 529, "UT"), (530, 530, "NV"), (531, 539, "WA"),
      (540, 544, "OR"), (545, 573, "CA"), (574, 574, "AK"), (575, 576, "HI"),
    )
    blocks.flatMap { case (lo, hi, st) =>
      (lo to hi by math.max(1, (hi - lo) / 3)).map(a => (a, st, "normal"))
    } ++ Vector((900, "XX", "extra"), (950, "XX", "extra"))
  }

  // -------------------------------------------------------------------- vin

  /** (WMI, country, make) — public world-manufacturer-identifier examples. */
  val vinWmi: Vector[(String, String, String)] = Vector(
    ("1FA", "usa", "Ford"), ("1G1", "usa", "Chevrolet"), ("1HG", "usa", "Honda"),
    ("2T1", "canada", "Toyota"), ("3VW", "mexico", "Volkswagen"),
    ("5YJ", "usa", "Tesla"), ("JHM", "japan", "Honda"), ("JN1", "japan", "Nissan"),
    ("JT2", "japan", "Toyota"), ("KMH", "korea", "Hyundai"),
    ("KNA", "korea", "Kia"), ("WAU", "germany", "Audi"), ("WBA", "germany", "BMW"),
    ("WDB", "germany", "Mercedes-Benz"), ("WVW", "germany", "Volkswagen"),
    ("YV1", "sweden", "Volvo"), ("ZFA", "italy", "Fiat"), ("VF1", "france", "Renault"),
    ("1C3", "usa", "Chrysler"), ("1C4", "usa", "Jeep"), ("1D7", "usa", "Dodge"),
    ("1FT", "usa", "Ford"), ("1GC", "usa", "Chevrolet"), ("1GM", "usa", "Pontiac"),
    ("1J4", "usa", "Jeep"), ("1LN", "usa", "Lincoln"), ("1ME", "usa", "Mercury"),
    ("1N4", "usa", "Nissan"), ("1VW", "usa", "Volkswagen"), ("1YV", "usa", "Mazda"),
    ("2G1", "canada", "Chevrolet"), ("2HG", "canada", "Honda"),
    ("2HK", "canada", "Honda"), ("2FM", "canada", "Ford"),
    ("3FA", "mexico", "Ford"), ("3GN", "mexico", "Chevrolet"),
    ("3N1", "mexico", "Nissan"), ("4F2", "usa", "Mazda"), ("4JG", "usa", "Mercedes-Benz"),
    ("4S3", "usa", "Subaru"), ("4T1", "usa", "Toyota"), ("4US", "usa", "BMW"),
    ("5FN", "usa", "Honda"), ("5LM", "usa", "Lincoln"), ("5NP", "usa", "Hyundai"),
    ("5TD", "usa", "Toyota"), ("5XY", "usa", "Kia"),
    ("JA3", "japan", "Mitsubishi"), ("JF1", "japan", "Subaru"),
    ("JH4", "japan", "Acura"), ("JM1", "japan", "Mazda"),
    ("JTD", "japan", "Toyota"), ("JTH", "japan", "Lexus"),
    ("KM8", "korea", "Hyundai"), ("KND", "korea", "Kia"),
    ("SAJ", "uk", "Jaguar"), ("SAL", "uk", "Land Rover"),
    ("SCC", "uk", "Lotus"), ("TRU", "hungary", "Audi"),
    ("VF3", "france", "Peugeot"), ("VF7", "france", "Citroen"),
    ("W04", "germany", "Buick"), ("WA1", "germany", "Audi"),
    ("WBS", "germany", "BMW"), ("WDD", "germany", "Mercedes-Benz"),
    ("WMW", "germany", "Mini"), ("WP0", "germany", "Porsche"),
    ("YS3", "sweden", "Saab"), ("YV4", "sweden", "Volvo"),
    ("ZAM", "italy", "Maserati"), ("ZAR", "italy", "Alfa Romeo"),
    ("ZFF", "italy", "Ferrari"),
  )
  val vinModels: Vector[String] = Vector(
    "sedan", "coupe", "suv", "pickup", "wagon", "hatchback", "van", "roadster")
  val vinEngines: Vector[String] = Vector(
    "I4", "I4T", "V6", "V6T", "V8", "EV", "HYBRID", "DIESEL")

  /** VIN year code letters (public standard; I/O/Q/U/Z and 0 excluded). */
  val vinYearCodes: String = "ABCDEFGHJKLMNPRSTVWXY123456789"

  // ------------------------------------------------------------ user agents

  /** Browser → user-agent template (original strings in the public UA
    * format; the reference bundles per-browser UA frequency tables).
    */
  val userAgents: Map[String, Vector[String]] = Map(
    "Chrome" -> Vector(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/%d.0.0.0 Safari/537.36",
      "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/%d.0.0.0 Safari/537.36"),
    "Firefox" -> Vector(
      "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:%d.0) Gecko/20100101 Firefox/%d.0",
      "Mozilla/5.0 (X11; Linux x86_64; rv:%d.0) Gecko/20100101 Firefox/%d.0"),
    "Safari" -> Vector(
      "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/%d.0 Safari/605.1.15"),
    "Mobile" -> Vector(
      "Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/%d.0 Mobile/15E148 Safari/604.1",
      "Mozilla/5.0 (Linux; Android 14) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/%d.0.0.0 Mobile Safari/537.36"),
    "IE" -> Vector(
      "Mozilla/5.0 (Windows NT 10.0; WOW64; Trident/7.0; rv:11.0) like Gecko"),
  )

  /** Training text for the Markov-chain text samplers — an original
    * public-domain-style passage (the reference trains on bundled classic
    * texts; any English corpus gives the same operator semantics).
    */
  val markovTraining: String =
    """the quick brown fox jumps over the lazy dog and the dog barks at the
      |fox while the fox runs through the green field toward the old farm
      |house where the farmer keeps a flock of white geese and a herd of
      |cattle that graze beside the slow river under the wide open sky
      |every morning the farmer walks the long dirt road to the market in
      |the small town and sells fresh eggs and sweet corn to the people
      |who come from the city to buy good food and see the quiet country
      |the children play near the tall oak tree by the stone bridge and
      |watch the silver fish swim in the clear water below the mill
      |when the sun sets behind the far hills the whole valley turns gold
      |and the birds fly home to their nests in the deep woods""".stripMargin
      .replaceAll("\\s+", " ").trim
}
