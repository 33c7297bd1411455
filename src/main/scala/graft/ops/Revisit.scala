package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC revisit resolution — crawl-level dedup replay. Real crawlers
  * (the identical-payload-digest convention) store a page refetch
  * whose bytes did not change as a `revisit` record: a stub carrying
  * the new fetch's HTTP head plus WARC-Payload-Digest and (optionally)
  * WARC-Refers-To naming the response that holds the actual bytes. A
  * corpus consumer must re-attach those bytes before any content work,
  * or silently drop every re-crawled page.
  *
  * Resolution order per revisit: WARC-Refers-To record id when present
  * (exact, the spec's pointer), else WARC-Payload-Digest equality
  * against the response corpus. Unresolvable revisits (digest absent —
  * the referred segment wasn't ingested) keep a NULL payload rather
  * than their stub bytes: honest, and filterable.
  *
  * 100 TB shape: responses dedup to ONE candidate per digest with a
  * map-side-combinable `min_by` (earliest (warc_date, record_id) — a
  * deterministic canonical original), then two shuffle hash joins
  * keyed by record id and by digest. No broadcast assumption: both
  * keys are high-cardinality, and the digest join is exactly the
  * shape a crawl-scale dedup replay is — payload bytes move only for
  * the matched originals, never the whole response corpus twice.
  */
object Revisit {

  /** Returns the input rows with `revisit_of` appended: null for
    * non-revisit rows (payload untouched), the canonical original's
    * record id for resolved revisits (whose payload/payload_len become
    * the original's), null payload for unresolvable ones.
    */
  def resolve(warc: DataFrame): DataFrame = {
    val resp = warc.filter(col("warc_type") === "response")
    // canonical original per digest: earliest (warc_date, record_id)
    val byDigest = resp.filter(col("payload_digest").isNotNull)
      .groupBy(col("payload_digest").as("d_key"))
      .agg(min_by(
        struct(col("record_id"), col("payload"), col("payload_len")),
        struct(col("warc_date"), col("record_id"))).as("o"))
      .select(col("d_key"), col("o.record_id").as("d_id"),
        col("o.payload").as("d_payload"), col("o.payload_len").as("d_len"))
    // record ids are unique by corpus invariant; min_by makes a
    // violated invariant deterministic instead of a join fan-out (the
    // groupBy key IS the join key — one shuffle serves both)
    val byId = resp
      .groupBy(col("record_id").as("i_id"))
      .agg(min_by(struct(col("payload"), col("payload_len")),
        col("warc_date")).as("o"))
      .select(col("i_id"), col("o.payload").as("i_payload"),
        col("o.payload_len").as("i_len"))

    val rev = warc.filter(col("warc_type") === "revisit")
    val passthrough = warc.schema.fieldNames.filterNot(n =>
      n == "payload" || n == "payload_len").map(n => col("r." + n))
    val resolved = rev.alias("r")
      .join(byId.alias("i"), col("r.refers_to") === col("i.i_id"), "left")
      .join(byDigest.alias("d"),
        col("r.payload_digest") === col("d.d_key"), "left")
      .select(passthrough.toIndexedSeq :+
        coalesce(col("i.i_payload"), col("d.d_payload")).as("payload") :+
        coalesce(col("i.i_len"), col("d.d_len")).as("payload_len") :+
        coalesce(col("i.i_id"), col("d.d_id")).as("revisit_of"): _*)

    warc.filter(col("warc_type") =!= "revisit")
      .withColumn("revisit_of", lit(null).cast("string"))
      .unionByName(resolved)
  }
}
