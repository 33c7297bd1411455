package graft.queries

/** Generates DuckDB SQL that reproduces Spark's `xxhash64` (XXH64)
  * bit-for-bit, so hash-derived generator outputs (deterministic fan-out
  * counts, amounts) get REAL driver oracles instead of rows-only checks.
  *
  * Arithmetic runs in HUGEINT (int128) with explicit mod-2^64 wraparound:
  * DuckDB has no unsigned-64 wraparound multiply, so `a*b mod 2^64` is
  * split as `(lo(a)*b + (hi(a)*b mod 2^32) * 2^32) mod 2^64` — every
  * intermediate stays below 2^97, inside HUGEINT range. XOR runs through
  * UBIGINT casts (DuckDB's xor() is defined on integer types; values are
  * always in [0, 2^64) here so the casts are lossless).
  *
  * Each hash step is emitted as one nested-SELECT stage: fmix-style
  * `x ^= x >> n` uses its input twice, and inlining would blow up the
  * expression tree exponentially across an 11-step hash.
  *
  * Validated (this repo's round-4 notes): matches
  * `org.apache.spark.sql.functions.xxhash64` on long and short-string
  * inputs exactly, including Spark's multi-argument chaining (each
  * argument hashed with the running hash as seed, initial seed 42).
  */
object DuckXxHash {
  private val M = "18446744073709551616::HUGEINT" // 2^64
  private val HALF = "9223372036854775808::HUGEINT" // 2^63
  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)

  /** `a * b mod 2^64` for HUGEINT expression `a`, constant `b`. */
  private def mulmod(a: String, b: BigInt): String =
    s"(((($a) % 4294967296) * $b::HUGEINT + " +
      s"(((($a) // 4294967296) * $b::HUGEINT) % 4294967296) * 4294967296) % $M)"

  private def rotl(x: String, n: Int): String = {
    val s = BigInt(1) << n
    val h = BigInt(1) << (64 - n)
    s"(((($x) % $h::HUGEINT) * $s::HUGEINT) + (($x) // $h::HUGEINT))"
  }

  private def xor(a: String, b: String): String =
    s"xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT))::HUGEINT"

  private def shr(x: String, n: Int): String =
    s"(($x) // ${BigInt(1) << n}::HUGEINT)"

  private def fmixSteps(pfx: String, in: String): Seq[(String, String)] = Seq(
    s"${pfx}f1" -> xor(in, shr(in, 33)),
    s"${pfx}f2" -> mulmod(s"${pfx}f1", P2),
    s"${pfx}f3" -> xor(s"${pfx}f2", shr(s"${pfx}f2", 29)),
    s"${pfx}f4" -> mulmod(s"${pfx}f3", P3),
    s"${pfx}out" -> xor(s"${pfx}f4", shr(s"${pfx}f4", 32)))

  /** XXH64 of one 8-byte long (Spark's per-argument primitive for
    * LongType). `v` and `seed` are HUGEINT expressions in [0, 2^64);
    * result lands in column `<pfx>out`.
    */
  def hashLongSteps(pfx: String, v: String, seed: String): Seq[(String, String)] = Seq(
    s"${pfx}a0" -> s"((($seed) + $P5::HUGEINT + 8) % $M)",
    s"${pfx}k1" -> mulmod(v, P2),
    s"${pfx}k2" -> rotl(s"${pfx}k1", 31),
    s"${pfx}k3" -> mulmod(s"${pfx}k2", P1),
    s"${pfx}a1" -> xor(s"${pfx}a0", s"${pfx}k3"),
    s"${pfx}a2" -> s"((${mulmod(rotl(s"${pfx}a1", 27), P1)} + $P4::HUGEINT) % $M)"
  ) ++ fmixSteps(pfx, s"${pfx}a2")

  /** SplitMix64 finalizer (graft.runtime.Rng.mix) over a HUGEINT
    * expression in [0, 2^64); result lands in `<pfx>out`. Unlocks SQL
    * replays of the interpreter-side stub seams (e.g. the multimodal
    * decodeStub) that derive values from Rng.mix rather than xxhash64.
    */
  def mixSteps(pfx: String, v: String): Seq[(String, String)] = Seq(
    s"${pfx}z0" -> s"((($v) + ${BigInt("9e3779b97f4a7c15", 16)}::HUGEINT) % $M)",
    s"${pfx}z1" -> mulmod(xor(s"${pfx}z0", shr(s"${pfx}z0", 30)),
      BigInt("bf58476d1ce4e5b9", 16)),
    s"${pfx}z2" -> mulmod(xor(s"${pfx}z1", shr(s"${pfx}z1", 27)),
      BigInt("94d049bb133111eb", 16)),
    s"${pfx}out" -> xor(s"${pfx}z2", shr(s"${pfx}z2", 31)))

  /** XXH64 of one 4-byte int (Spark's per-argument primitive for
    * IntegerType — e.g. `sequence()` element indexes). `v` is a HUGEINT
    * expression in [0, 2^32); result lands in `<pfx>out`.
    */
  def hashIntSteps(pfx: String, v: String, seed: String): Seq[(String, String)] = Seq(
    s"${pfx}a0" -> s"((($seed) + $P5::HUGEINT + 4) % $M)",
    s"${pfx}k1" -> mulmod(s"(($v) % 4294967296)", P1),
    s"${pfx}a1" -> xor(s"${pfx}a0", s"${pfx}k1"),
    s"${pfx}a2" -> s"((${mulmod(rotl(s"${pfx}a1", 23), P2)} + $P3::HUGEINT) % $M)"
  ) ++ fmixSteps(pfx, s"${pfx}a2")

  /** XXH64 of a constant byte string shorter than 4 bytes (the 1-byte
    * tail loop only) — enough for Spark's `lit("amt")`-style salts.
    */
  def hashShortBytesSteps(pfx: String, bytes: Seq[Int], seed: String): Seq[(String, String)] = {
    require(bytes.length < 4, "only the 1-byte tail path is emitted")
    val init = Seq(s"${pfx}b0" -> s"((($seed) + $P5::HUGEINT + ${bytes.length}) % $M)")
    val tail = bytes.zipWithIndex.flatMap { case (b, i) =>
      val prev = if (i == 0) s"${pfx}b0" else s"${pfx}b${i}r"
      Seq(
        s"${pfx}b${i + 1}x" -> xor(prev, (BigInt(b & 0xff) * P5).mod(BigInt(1) << 64).toString),
        s"${pfx}b${i + 1}r" -> mulmod(rotl(s"${pfx}b${i + 1}x", 11), P1))
    }
    // rename the last rotated value into the chain position fmix expects
    (init ++ tail :+ (s"${pfx}tl" -> s"${pfx}b${bytes.length}r")) ++ fmixSteps(pfx, s"${pfx}tl")
  }

  // -------------------------------------- XXH64 over VARCHAR (any length)

  private def addmod(a: String, b: String): String = s"((($a) + ($b)) % $M)"

  /** Byte `pos` (1-based SQL int expr) of the column `hxCol` (a hex
    * rendering of the UTF-8 bytes) as HUGEINT in [0, 255].
    */
  private def byteAt(hxCol: String, pos: String): String =
    s"((strpos('0123456789ABCDEF', substr($hxCol, 2*($pos)-1, 1))-1)*16 + " +
      s"strpos('0123456789ABCDEF', substr($hxCol, 2*($pos), 1))-1)::HUGEINT"

  /** Little-endian lane of `nBytes` from a byte-list column (1-based
    * start `pos`) — the compact form: the verbose hex-parsing byteAt
    * text appears ONCE (in the `<pfx>bl` step) instead of once per
    * byte per lane, which mattered for DuckDB's optimizer (planning
    * time is superlinear in expression bytes: the inlined-byteAt form
    * of the full string hash planned in ~10 s PER QUERY at 39 KB;
    * this form plans in milliseconds).
    */
  private def lane(blCol: String, pos: String, nBytes: Int): String =
    "(" + (0 until nBytes)
      .map(b => s"$blCol[CAST(($pos)+$b AS INT)] * ${BigInt(1) << (8 * b)}::HUGEINT")
      .mkString(" + ") + s") % $M"

  /** XXH64 of a VARCHAR column's UTF-8 bytes, seed 42 — Spark's
    * `xxhash64(stringCol)` — for ARBITRARY lengths: the full canonical
    * algorithm (4-lane 32-byte stripes, 8-byte tail chunks, 4-byte
    * word, byte loop, avalanche), validated byte-for-byte against Spark
    * on every code path (tools/XxhStringRef corpus: empty, <4, 4–7, 8,
    * 9–31, 32, >32, multi-stripe, multibyte UTF-8).
    *
    * Emitted as ~14 MATERIALIZED stages (the repo-wide rule: fmix-style
    * steps reference their input twice, so inlining explodes). The
    * sequential chunk folds run as `list_reduce` lambdas — inside a
    * lambda the accumulator is a variable, so the textual duplication
    * in each step is O(1). The four stripe lanes are INDEPENDENT folds
    * (lane N only ever consumes stripe words N), which is what makes
    * the >= 32 path expressible without a struct accumulator.
    *
    * Prerequisite columns in the chain: `<pfx>hx` = hex bytes and
    * `<pfx>ln` = octet length (emit them in a prior stage, e.g.
    * `hex(encode(s))` / `octet_length(encode(s))`). Result lands in
    * `<pfx>out` (unsigned HUGEINT).
    */
  def hashStringSteps(pfx: String): Seq[(String, String)] = {
    val seed = 42L
    val hx = s"${pfx}bl"
    val ln = s"${pfx}ln"
    val blStep = s"${pfx}bl" -> byteListSql(s"${pfx}hx", ln)
    val init = Seq(
      (BigInt(seed) + P1 + P2).mod(BigInt(1) << 64),
      (BigInt(seed) + P2).mod(BigInt(1) << 64),
      BigInt(seed),
      (BigInt(seed) - P1).mod(BigInt(1) << 64))
    def roundStep(acc: String, k: String): String =
      mulmod(rotl(addmod(acc, mulmod(k, P2)), 31), P1)
    def round0(v: String): String = mulmod(rotl(mulmod(v, P2), 31), P1)
    val vCols = (0 until 4).map { n =>
      val lst = s"[ ${lane(hx, s"32*t + ${8 * n} + 1", 8)} " +
        s"for t in generate_series(0, $ln//32 - 1) ]"
      s"${pfx}v${n + 1}" ->
        (s"list_reduce(list_prepend(${init(n)}::HUGEINT, $lst), " +
          s"(acc, k) -> ${roundStep("acc", "k")})")
    }
    val merged = addmod(
      addmod(rotl(s"${pfx}v1", 1), rotl(s"${pfx}v2", 7)),
      addmod(rotl(s"${pfx}v3", 12), rotl(s"${pfx}v4", 18)))
    val smallInit = (BigInt(seed) + P5).mod(BigInt(1) << 64)
    val h0 = s"${pfx}m0" ->
      s"(CASE WHEN $ln >= 32 THEN $merged ELSE $smallInit::HUGEINT END)"
    val mergeRounds = (0 until 4).map { n =>
      val prev = if (n == 0) s"${pfx}m0" else s"${pfx}m$n"
      s"${pfx}m${n + 1}" ->
        (s"(CASE WHEN $ln >= 32 THEN " +
          s"${addmod(mulmod(xor(prev, round0(s"${pfx}v${n + 1}")), P1), s"$P4::HUGEINT")} " +
          s"ELSE $prev END)")
    }
    val hLen = s"${pfx}hl" -> addmod(s"${pfx}m4", s"$ln::HUGEINT")
    val t8Step = addmod(mulmod(rotl(xor("acc", round0("k")), 27), P1), s"$P4::HUGEINT")
    val t8 = s"${pfx}t8" ->
      (s"list_reduce(list_prepend(${pfx}hl, " +
        s"[ ${lane(hx, s"32*($ln//32) + 8*u + 1", 8)} " +
        s"for u in generate_series(0, ($ln % 32)//8 - 1) ]), " +
        s"(acc, k) -> $t8Step)")
    val k4 = lane(hx, s"32*($ln//32) + 8*(($ln % 32)//8) + 1", 4)
    val h4 = s"${pfx}t4" ->
      (s"(CASE WHEN ($ln % 32) % 8 >= 4 THEN " +
        s"${addmod(mulmod(rotl(xor(s"${pfx}t8", mulmod(k4, P1)), 23), P2), s"$P3::HUGEINT")} " +
        s"ELSE ${pfx}t8 END)")
    val bStep = mulmod(rotl(xor("acc", mulmod("bv", P5)), 11), P1)
    val hb = s"${pfx}tb" ->
      (s"list_reduce(list_prepend(${pfx}t4, " +
        s"[ $hx[CAST($ln - ($ln % 32) % 4 + u + 1 AS INT)] " +
        s"for u in generate_series(0, ($ln % 32) % 4 - 1) ]), " +
        s"(acc, bv) -> $bStep)")
    (blStep +: vCols :+ h0) ++ mergeRounds ++ Seq(hLen, t8, h4, hb) ++ fmixSteps(pfx, s"${pfx}tb")
  }

  // ------------------------------------------- expression-form rendering

  /** A step sequence folded into ONE scalar expression: each step is a
    * let-binding emitted as a single-element `list_transform` whose
    * lambda variable is the step name — later steps reference earlier
    * ones as captured lambda variables, so an fmix-style step that uses
    * its input twice costs O(1) text instead of doubling the tree (the
    * same property the MATERIALIZED chain bought, without the chain).
    *
    * Why this exists (r9, the driver-gate budget fix): DuckDB 1.0 scans
    * a MATERIALIZED CTE single-threaded, so every step chain ran serial
    * regardless of thread count — the 210-oracle replay took 775 s and
    * timed the driver phase out two rounds running. Expression-form
    * steps run inside ONE projection, and `sliced`/`uniformChain` fan
    * that projection out over UNION ALL branches, which DuckDB schedules
    * as concurrent pipelines (measured 29 s -> 1.5 s on the g46
    * 64-permutation expansion, bit-identical output).
    *
    * Constraint: step expressions may reference row columns, constants,
    * and EARLIER step names only — exactly the contract the chain form
    * already obeyed.
    */
  def expr(steps: Seq[(String, String)]): String =
    steps.foldRight(steps.last._1) { case ((n, e), acc) =>
      if (acc == n) s"($e)"
      else s"list_transform([$e], $n -> ($acc))[1]"
    }

  /** Expression-form XXH64 of a long: `v` and `seed` must be column /
    * lambda-variable references or literals (v is referenced twice).
    */
  def hashLongExpr(pfx: String, v: String, seed: String): String =
    expr(hashLongSteps(pfx, v, seed))

  /** Expression-form XXH64 of a 4-byte int (same reference caveat). */
  def hashIntExpr(pfx: String, v: String, seed: String): String =
    expr(hashIntSteps(pfx, v, seed))

  /** XXH64 of a CONSTANT long under a variable seed, with the
    * v-dependent prefix (k1 = v*P2, k2 = rotl31, k3 = k2*P1) folded to
    * one literal in Scala — 4 fewer let-bindings per hash, and the
    * salt side of every fast-path field hash is exactly this shape.
    */
  def hashLongConstExpr(pfx: String, constV: BigInt, seed: String): String = {
    val mask = (BigInt(1) << 64) - 1
    def rotl31(x: BigInt): BigInt = ((x << 31) | (x >> 33)) & mask
    val k3 = (rotl31((constV * P2) & mask) * P1) & mask
    val steps = Seq(
      s"${pfx}a0" -> s"((($seed) + $P5::HUGEINT + 8) % $M)",
      s"${pfx}a1" -> xor(s"${pfx}a0", s"$k3::HUGEINT"),
      s"${pfx}a2" -> s"((${mulmod(rotl(s"${pfx}a1", 27), P1)} + $P4::HUGEINT) % $M)"
    ) ++ fmixSteps(pfx, s"${pfx}a2")
    expr(steps)
  }

  /** The fast-path field salt as a BigInt (see saltLit). */
  def saltVal(path: String, seed: Long = 42L): BigInt =
    BigInt(graft.runtime.Rng.mix2(seed, path.hashCode.toLong)) &
      ((BigInt(1) << 64) - 1)

  // NOTE deliberately NO hashStringExpr: the nested-lambda form of the
  // string hash planned in ~13 s per query (depth x bytes blowup) —
  // hashStringSteps must stay in per-step chain form.

  /** The byte-list-from-hex prep shared by hashStringSteps' `<pfx>bl`
    * step and the CRC-32 oracles: ONE copy of the hex-parse convention
    * (a second copy drifting silently would desynchronize the oracles
    * built on it). `hxCol` = hex(encode(s)), `lnCol` = octet length.
    */
  def byteListSql(hxCol: String, lnCol: String): String =
    s"[${byteAt(hxCol, "p")} for p in generate_series(1, $lnCol)]"

  /** CRC-32 (the zlib/ISO-HDLC polynomial, reflected 0xEDB88320) over a
    * byte-list column — the standard byte-at-a-time table fold as one
    * `list_reduce`: `crc' = (crc >> 8) XOR T[(crc XOR b) & 0xff]`,
    * seeded and finalized with 0xFFFFFFFF. All values stay below 2^32,
    * so plain BIGINT xor/shift arithmetic is exact. Matches
    * `java.util.zip.CRC32` bit-for-bit (CompressionSpec). `blCol` is a
    * list of byte values 0-255 (the hashStringSteps `<pfx>bl` shape).
    */
  def crc32Expr(blCol: String): String = {
    val table = (0 until 256).map { n =>
      var c = n.toLong
      for (_ <- 0 until 8)
        c = if ((c & 1L) != 0L) 0xEDB88320L ^ (c >>> 1) else c >>> 1
      c
    }
    val t = table.mkString("[", ",", "]")
    s"xor(list_reduce(list_prepend(4294967295::BIGINT, " +
      s"list_transform($blCol, zb -> CAST(zb AS BIGINT))), " +
      s"(zc, zb) -> xor(zc // 256, $t[CAST(xor(zc, zb) % 256 AS INT) + 1])), " +
      "4294967295)"
  }

  /** The full MinHash draw list for one pre-hash: `[hashInt(j, pre)
    * for j in 0 until numHashes]` as a LIST of signed BIGINTs, with the
    * j-dependent k1 = j*P1 folded to literals — the oracle-side replay
    * of the 64-permutation signature expansion, one expression instead
    * of a 1M-row materialized chain (29 s -> ~1 s at sf0.01).
    * `pre` is referenced once and may be any expression.
    */
  def minhashListExpr(pre: String, numHashes: Int): String = {
    val mask = (BigInt(1) << 64) - 1
    val k1s = (0 until numHashes).map(j => (BigInt(j) * P1) & mask)
    val tail = Seq(
      "mqa1" -> xor("mqa0", "mqk1"),
      "mqa2" -> s"((${mulmod(rotl("mqa1", 23), P2)} + $P3::HUGEINT) % $M)"
    ) ++ fmixSteps("mq", "mqa2") :+ ("mqs" -> signed("mqout"))
    s"list_transform([(($pre) + $P5::HUGEINT + 4) % $M], mqa0 -> " +
      s"list_transform([${k1s.map(k => s"$k::HUGEINT").mkString(",")}], " +
      s"mqk1 -> ${expr(tail)}))[1]"
  }

  /** N UNION ALL branches, each `SELECT <select> FROM <from> WHERE
    * <slicePred k>` — the DuckDB-1.0 parallelism idiom: branches are
    * independent pipelines and run concurrently even when each branch's
    * source scan is serial (materialized CTEs, small parquet files,
    * range()).
    */
  def sliced(slices: Int, branch: Int => String): String =
    (0 until slices).map(branch).mkString(" UNION ALL ")

  /** A chain of MATERIALIZED CTEs, one per hash step. MATERIALIZED is
    * load-bearing: DuckDB inlines plain subqueries/CTEs into a single
    * projection, and an 11-step hash whose steps each reference their
    * input 2-3 times explodes exponentially under inlining (the
    * un-materialized form never finished planning on 15k rows; the
    * materialized form runs in ~5 s). For row counts above a few
    * thousand prefer the expression form + `sliced` (above): chains
    * execute single-threaded.
    */
  final case class Chain(ctes: Seq[(String, String)], last: String) {
    /** Append one CTE per (column, expr) step, each selecting the
      * previous CTE's columns plus the new one.
      */
    def steps(ss: Seq[(String, String)]): Chain =
      ss.foldLeft(this) { case (ch, (name, expr)) =>
        ch.cte(s"c_$name", s"SELECT *, ($expr) AS $name FROM ${ch.last}")
      }
    /** One CTE stage computing a whole step sequence as a single
      * nested-lambda expression — only the FINAL step's column is
      * added (intermediates become lambda variables). Use for step
      * sequences <= ~12 deep with compact step text (hashLong/hashInt/
      * mix); the planner is explosive in nesting depth x expression
      * bytes, so hashStringSteps must stay in per-step chain form.
      */
    def stepsExpr(ss: Seq[(String, String)]): Chain =
      exprStage(Seq(ss))
    /** One CTE stage adding SEVERAL independent fused step sequences
      * at once (each sequence's final column) — e.g. the nine per-index
      * hashInt chains of an unrolled series oracle in one projection.
      */
    def exprStage(groups: Seq[Seq[(String, String)]],
        slices: Int = 1, sliceKey: String = "i"): Chain = {
      val cols = groups
        .map(ss => s"(${DuckXxHash.expr(ss)}) AS ${ss.last._1}")
        .mkString(", ")
      val body =
        if (slices <= 1) s"SELECT *, $cols FROM $last"
        else DuckXxHash.sliced(slices, k =>
          s"SELECT *, $cols FROM $last WHERE $sliceKey % $slices = $k")
      cte(s"c_${groups.head.last._1}", body)
    }
    def cte(name: String, sql: String): Chain = Chain(ctes :+ (name -> sql), name)
    def render(finalSelect: String): String =
      s"WITH ${ctes.map { case (n, q) => s"$n AS MATERIALIZED ($q)" }.mkString(",\n")}\n$finalSelect"
  }
  def chain(baseName: String, baseSql: String): Chain =
    Chain(Seq(baseName -> baseSql), baseName)

  /** A signed BIGINT column reinterpreted as unsigned-64 HUGEINT. */
  def unsigned(col: String): String =
    s"(((CAST($col AS HUGEINT) % $M) + $M) % $M)"

  /** An unsigned-64 HUGEINT expression reinterpreted as signed BIGINT. */
  def signed(expr: String): String =
    s"CAST(CASE WHEN ($expr) >= $HALF THEN ($expr) - $M ELSE ($expr) END AS BIGINT)"

  /** Spark `pmod(<signed hash>, n)` over an unsigned-64 hash expression. */
  def pmod(expr: String, n: Long): String =
    s"CAST((((${signed(expr)} % $n) + $n) % $n) AS BIGINT)"

  // ---- shared ColumnCompiler-lowering reconstructions. ONE copy of the
  // salt/uniform/CASE conventions: these must stay bit-identical to
  // ColumnCompiler.Ctx.salt / u() / multinomialCol, and a second copy
  // drifting silently would desynchronize every oracle built on them.

  private val Mask64 = (BigInt(1) << 64) - 1

  /** The fast path's field salt (ColumnCompiler.Ctx.salt) as an
    * unsigned-HUGEINT literal.
    */
  def saltLit(path: String, seed: Long = 42L): String =
    s"${BigInt(graft.runtime.Rng.mix2(seed, path.hashCode.toLong)) & Mask64}::HUGEINT"

  /** The fast path's uniform: (hash >>> 11) * 2^-53 over a chain output. */
  def uniform(hOut: String): String =
    s"(($hOut // 2048) * 1.1102230246251565e-16)"

  /** The fast-path int lowering: floor(u * (max-min) + min) as BIGINT. */
  def fastPathInt(hOut: String, min: Long, max: Long): String =
    s"CAST(floor(${uniform(hOut)} * ${max - min} + $min) AS BIGINT)"

  /** The multinomial CASE ladder with the EXACT cumulative-weight double
    * literals the Spark side compiled (ColumnCompiler.cumWeights).
    */
  def caseLadder(uCol: String, items: Seq[(String, Double)]): String = {
    val cums = graft.synth.ColumnCompiler.cumWeights(items)
    // bind the draw once: a wide ladder would otherwise re-evaluate the
    // uniform expression (a HUGEINT division) in EVERY branch compare —
    // measured as most of g63's execution time at 500-entry ladders
    val whens = cums.init.map { case (v, c) => s"WHEN zlu < $c THEN '$v'" }
      .mkString(" ")
    s"list_transform([$uCol], zlu -> " +
      s"(CASE $whens ELSE '${items.last._1}' END))[1]"
  }

  /** The numeric-valued CASE ladder (ColumnCompiler's foreign-key
    * lowering): same cumulative-weight double literals, BIGINT branches.
    */
  def caseLadderLong(uCol: String, items: Seq[(String, Double)]): String = {
    val cums = graft.synth.ColumnCompiler.cumWeights(items)
    val whens = cums.init.map { case (v, c) => s"WHEN zlu < $c THEN $v" }
      .mkString(" ")
    s"CAST(list_transform([$uCol], zlu -> " +
      s"(CASE $whens ELSE ${items.last._1} END))[1] AS BIGINT)"
  }

  /** One full fast-path hash per (alias, saltPath): `xxhash64(id, salt)`
    * = hash(id, seed=42) chained into hash(salt, seed=·), landing in
    * column `h_<alias>` (unsigned HUGEINT) — plus `h0` = the shared
    * inner `hash(id, 42)` (identical for every field, computed once).
    *
    * r9 rewrite for the driver-gate budget (VERDICT r8 item 1): ONE
    * materialized CTE whose body is `slices` UNION ALL branches over
    * disjoint id ranges, each branch computing every field hash as a
    * nested-lambda expression — DuckDB runs the branches as concurrent
    * pipelines, where the old one-CTE-per-hash-step chain executed
    * every step single-threaded (g51's oracle: 240 s -> ~1 s at the
    * same row count).
    */
  def uniformChain(n: Long, fields: Seq[(String, String)],
      seed: Long = 42L, slices: Int = 0): Chain = {
    // planning cost scales with slices x fields (each branch re-plans
    // every lambda chain), so only fan out when the row count pays for
    // it: ~5k rows per branch, capped at 32 branches
    val nSlices =
      if (slices > 0) slices
      else math.max(1, math.min(32, (n / 5000L).toInt))
    val body = sliced(nSlices, { k =>
      val lo = n * k / nSlices
      val hi = n * (k + 1) / nSlices
      val fieldCols = fields.map { case (alias, path) =>
        s"${hashLongConstExpr(s"${alias}b", saltVal(path, seed), "h0")} AS h_$alias"
      }.mkString(", ")
      s"SELECT i, v, h0${if (fields.isEmpty) "" else ", " + fieldCols} FROM " +
        s"(SELECT i, v, ${hashLongExpr("h0s", "v", "42::HUGEINT")} AS h0 FROM " +
        s"(SELECT range AS i, CAST(range AS HUGEINT) AS v FROM range($lo, $hi)))"
    })
    chain("p_all", body)
  }
}
