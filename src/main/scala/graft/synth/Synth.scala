package graft.synth

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{ArrayType, StructType}
import graft.runtime.Rng

/** The DataSynthesizer analog (processors/DataSynthesizer.java:59-108,
  * CLI Synth.java:63-193), Spark-first:
  *
  *   - the generator schema compiles ONCE per task (vs per-thread
  *     ThreadLocal re-parse) and the record schema is computed statically
  *     from the sampler tree (vs sample-one-and-infer,
  *     DataSynthesizerBase.java:176-207);
  *   - generation is a `mapPartitions` source over `spark.range(n)` —
  *     the one legitimately imperative per-partition stage; everything
  *     downstream is ordinary Catalyst;
  *   - each partition's RNG stream is seeded from (seed, partitionId), so
  *     a run is bit-reproducible under any scheduling and scales to any
  *     executor count with zero coordination or shuffle. At 100 TB this
  *     is embarrassingly parallel: rows/partitions never communicate.
  */
object Synth {

  /** Topology-independent default partition count for the INTERPRETER
    * path. Per-partition RNG streams make the partition count part of
    * the output contract — the same (schema, seed, n) must yield
    * identical bytes on a laptop and a 1000-executor cluster — so the
    * default cannot come from the session: `defaultParallelism` differs
    * per topology (measured under local-cluster[2,4] vs local[32], the
    * nine stateful simulation queries produced different bytes, and the
    * commuter/dns simulators different ROW COUNTS). 32 partitions up to
    * ~2M ids, then one partition per 64k ids: small runs stay parallel,
    * large generations grow the task count linearly, and the value is a
    * pure function of `n`. Pass `partitions` explicitly to override —
    * it is then part of the reproducibility key, like the seed.
    * (The column fast path needs none of this: its expressions derive
    * every draw from the row id, so its bytes are partition-invariant
    * and it keeps `defaultParallelism` for free parallelism.)
    */
  def pinnedPartitions(n: Long): Int =
    // cap at Int.MaxValue: a plain .toInt would wrap NEGATIVE at
    // n >= 2^31 * 64k, and a negative partition count silently planned
    // ZERO input partitions downstream
    math.max(32L, math.min((n + 65535) / 65536, Int.MaxValue.toLong)).toInt

  /** Generate with the best available lowering: the Catalyst column fast
    * path when every field is stateless (fully codegen'd, reproducible
    * under any partitioning), else the interpreter source. The two paths
    * draw from different (both deterministic) random streams.
    */
  def dataFrameAuto(spark: SparkSession, schemaJson: String, n: Long,
      seed: Long = 42L, partitions: Int = 0): DataFrame = {
    // GraftExtensions installed → the compiler may emit graft's native
    // codegen'd expressions (synth_series, prefix_sum) instead of the
    // interpreted higher-order-function fallbacks
    val nativeFns =
      try spark.catalog.functionExists("synth_series")
      catch { case _: Exception => false }
    fastOrInterp(spark, schemaJson, n, seed, partitions, nativeFns)
  }

  /** Fast path with the lowering choice pinned — test seam for the
    * native-vs-builtin bit-equality guarantee.
    */
  private[graft] def fastOrInterp(spark: SparkSession, schemaJson: String,
      n: Long, seed: Long, partitions: Int, nativeFns: Boolean): DataFrame = {
    ColumnCompiler.compilePlan(schemaJson, seed, nativeFns) match {
      case Some(plan) =>
        val p = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
        val base = spark.range(0L, n, 1L, p)
        plan.flat match {
          case None =>
            base.select(plan.scalars.map { case (nm, c) => c.as(nm) }: _*)
          case Some(ColumnCompiler.FlatSeq(elemFields, arr, mayBeEmpty)) =>
            import org.apache.spark.sql.functions.{col => fcol, explode_outer}
            // one explode over the zipped element structs; scalar columns
            // repeat per element, and the element fields land at the flat
            // sequence's spec position (matching the interpreter layout).
            // The scalars and the element array are materialized in their
            // OWN projection and the explode sees only column references:
            // putting expressions in the same select as the explode makes
            // ExtractGenerator hoist them into the Project above Generate,
            // where they re-evaluate once per OUTPUT element — n× the
            // work for an n-element sequence (measured 10× on the IoT
            // schema: uuid hashes and seed-table element_at picks ran 100
            // times per device).
            base
              .select((plan.scalars.map { case (nm, c) => c.as(nm) } :+
                arr.as("__arr")): _*)
              // Literal lengths: explode_outer — the array always has
              // n >= 1 elements (flatSequence rejects n <= 0), and
              // InferFiltersFromGenerate skips outer generates, whereas
              // plain explode would get a size(arr) > 0 filter that
              // re-evaluates the whole series expression a second time
              // per input row. Variable lengths: plain explode — a
              // 0-length draw produces an EMPTY array and the record
              // must be DROPPED (the interpreter's cross product with an
              // empty element list emits no rows).
              .select((plan.scalars.map { case (nm, _) => fcol(nm) } :+
                (if (mayBeEmpty) org.apache.spark.sql.functions.explode(fcol("__arr"))
                 else explode_outer(fcol("__arr"))).as("__e")): _*)
              .select((plan.before.map { case (nm, _) => fcol(nm) } ++
                elemFields.map(f => fcol(s"__e.$f")) ++
                plan.after.map { case (nm, _) => fcol(nm) }): _*)
        }
      case None => dataFrame(spark, schemaJson, n, seed, partitions)
    }
  }

  /** Generate `n` records of `schemaJson` (the generator DSL of SURVEY
    * §1.2) as a DataFrame.
    */
  def dataFrame(spark: SparkSession, schemaJson: String, n: Long,
      seed: Long = 42L, partitions: Int = 0): DataFrame = {
    // compile on the driver first: validates the spec and fixes the schema
    val schema = Compiler.structType(Compiler.compileSchema(schemaJson))
    val p = if (partitions > 0) partitions else pinnedPartitions(n)
    // typed mapPartitions with a Row encoder: the encoder's codegen'd
    // serializer converts each Row once, instead of the slower
    // CatalystTypeConverters walk that createDataFrame(rdd, schema) does
    implicit val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.range(0L, n, 1L, p).mapPartitions { ids =>
      if (!ids.hasNext) Iterator.empty
      else {
        val buffered = ids.buffered
        // the partition index must come from the DATA, not the task:
        // TaskContext.getPartitionId() is task-level, so a downstream
        // coalesce/AQE merge computes several range partitions inside one
        // task and every one of them would see the SAME id — identical
        // RNG streams, duplicated records (observed: coalesce(1) over 4
        // partitions left each value exactly 4×). Range partition i
        // covers [⌊i·n/p⌋, ⌊(i+1)·n/p⌋), whose exact inverse is
        // ⌊((id+1)·p − 1)/n⌋ — same seeding as before in every
        // un-coalesced plan, stable under any replan.
        // BigInt: (id+1)·p can overflow Long at extreme n·p; once per
        // partition, so the cost is nil
        val pid = (((BigInt(buffered.head) + 1) * p - 1) / n).toInt
        val entries = Compiler.compileSchema(schemaJson) // fresh state per task
        val ctx = new GenContext(Rng.forPartition(seed, pid), 0L)
        buffered.flatMap(id => emitRows(entries, ctx, id))
      }
    }
  }

  /** Assemble the output row(s) for one input id. Flat generators fan out
    * into the full cross product of their element lists (the documented
    * semantics of the reference's crossProduct, SchemaSampler.java:132-158;
    * its early-return bug is intentionally not reproduced — SURVEY §7.4(5)).
    */
  private[graft] def emitRows(entries: Seq[Compiler.FieldEntry], ctx: GenContext,
      id: Long): Iterator[Row] = {
    ctx.newRecord(id)
    // NO top-level restart: the reference's SchemaSampler.sample()
    // (SchemaSampler.java:87-129) never calls restart() while generating —
    // restart() is only invoked by containers on their children
    // (SequenceSampler.java:134 restarts its base per array sample;
    // MapSampler delegates). So a top-level random-walk drifts
    // cumulatively across records; one embedded in a sequence resets per
    // record via the sequence's own base.restart().
    // Sample every entry once, in spec order (side-channel coupling and
    // per-record state depend on that order).
    val sampled: Seq[(Compiler.FieldEntry, Any)] = entries.map(e => e -> (e match {
      case Compiler.Single(_, s)      => s.sample(ctx)
      case Compiler.Multi(_, _, s)    => s.sample(ctx)
      case Compiler.Generator(_, s)   => s.sample(ctx)
    }))
    val genLists: Seq[Seq[Any]] = sampled.collect {
      case (_: Compiler.Generator, v) => v.asInstanceOf[Seq[Any]]
    }
    if (genLists.isEmpty) {
      Iterator.single(Row.fromSeq(sampled.flatMap {
        case (_: Compiler.Single, v)   => Seq(v)
        case (_: Compiler.Multi, v)    => v.asInstanceOf[Row].toSeq
        case _                         => Nil
      }))
    } else {
      // full cross product over generator element lists (usually one list)
      val cross: Iterator[Seq[Any]] =
        genLists.foldLeft(Iterator.single(Seq.empty[Any])) { (acc, list) =>
          acc.flatMap(prefix => list.iterator.map(prefix :+ _))
        }
      cross.map { chosen =>
        var gi = 0
        val cells = sampled.flatMap {
          case (_: Compiler.Single, v) => Seq(v)
          case (_: Compiler.Multi, v)  => v.asInstanceOf[Row].toSeq
          case (g: Compiler.Generator, _) =>
            val elem = chosen(gi); gi += 1
            (elem, g.s.dataType) match {
              case (r: Row, ArrayType(_: StructType, _)) => r.toSeq
              case (v, _)                                => Seq(v)
            }
        }
        Row.fromSeq(cells)
      }
    }
  }
}
