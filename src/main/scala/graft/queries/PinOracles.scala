package graft.queries

/** Captured-constant pinning oracles (VERDICT r9 item 1 — the
  * g121/g78/g40 convention generalized): each entry is a DuckDB
  * constant SELECT whose values were captured from the pinned-seed
  * query output, so the driver gate hash-checks these queries instead
  * of recording `no_oracle` rows.
  *
  * What makes a pin honest here:
  *  - g30-g39 reduce to (n_rows, content_digest) over generator output
  *    that is seed-pinned and partitioning-invariant (cluster / conf /
  *    fault parity run the full suite with 0 digest mismatches), so
  *    both numbers are reproducible facts of the sampler family — the
  *    digest is an order-independent sum of per-row xxhash64 over the
  *    checker-safe JSON row encoding, i.e. full content pinning, not a
  *    row count.
  *  - the ANN family (g49/g67/g86/g89/g91/g107) reduces to (n_rows,
  *    n_queries, pair_digest) where the digest covers the integer
  *    (qid, rnk, neighbor) triples — the semantic serving output —
  *    and deliberately excludes the float score cell. The k-means /
  *    PQ fits are driver-side sequential over a deterministically
  *    ordered sample (see Similarity.fitCentroids), so the triples are
  *    reproducible; parity tools re-verify that every round.
  *  - g94 pins the learned BPE merge table as literal VALUES (ranks,
  *    pairs and integer counts — the whole output).
  *
  * Scale scope: the g30-g39 pins are generator facts (independent of
  * the sf dir). The ANN + BPE pins are facts of the **sf0.01 gate
  * corpus** — the driver contract runs Verify at sf0.01; running
  * Verify at another sf will (correctly) mismatch these entries.
  *
  * Regenerate after any INTENTIONAL sampler/fit change with
  *   sbt "runMain graft.tools.CapturePins /root/testdata/sf0.01"
  * which prints this map's generated section ready to paste.
  */
object PinOracles {
  val sql: Map[String, String] = Map(
    // --- BEGIN GENERATED (graft.tools.CapturePins, sf0.01) ---
    "g30_synth_iot" ->
      "SELECT CAST(100000 AS BIGINT) AS \"n_rows\", CAST(50039991594912 AS BIGINT) AS \"content_digest\"",
    "g32_synth_textmessage" ->
      "SELECT CAST(20000 AS BIGINT) AS \"n_rows\", CAST(9984471771037 AS BIGINT) AS \"content_digest\"",
    "g33_synth_commuter" ->
      "SELECT CAST(207856 AS BIGINT) AS \"n_rows\", CAST(103926323886084 AS BIGINT) AS \"content_digest\"",
    "g34_synth_dns_flat" ->
      "SELECT CAST(49450 AS BIGINT) AS \"n_rows\", CAST(24828536778377 AS BIGINT) AS \"content_digest\"",
    "g35_synth_cpoc" ->
      "SELECT CAST(2000 AS BIGINT) AS \"n_rows\", CAST(1006872876062 AS BIGINT) AS \"content_digest\"",
    "g36_synth_changer" ->
      "SELECT CAST(2000 AS BIGINT) AS \"n_rows\", CAST(999585369261 AS BIGINT) AS \"content_digest\"",
    "g37_synth_vehicle" ->
      "SELECT CAST(20000 AS BIGINT) AS \"n_rows\", CAST(10040038336215 AS BIGINT) AS \"content_digest\"",
    "g38_synth_identity" ->
      "SELECT CAST(20000 AS BIGINT) AS \"n_rows\", CAST(9980598204887 AS BIGINT) AS \"content_digest\"",
    "g39_synth_header" ->
      "SELECT CAST(10000 AS BIGINT) AS \"n_rows\", CAST(5007993902269 AS BIGINT) AS \"content_digest\"",
    "g49_ann_ivf" ->
      "SELECT CAST(100 AS BIGINT) AS \"n_rows\", CAST(10 AS BIGINT) AS \"n_queries\", CAST(49523057086 AS BIGINT) AS \"pair_digest\"",
    "g67_ann_ivf_disk" ->
      "SELECT CAST(100 AS BIGINT) AS \"n_rows\", CAST(10 AS BIGINT) AS \"n_queries\", CAST(49523057086 AS BIGINT) AS \"pair_digest\"",
    "g86_ann_ivf_quant" ->
      "SELECT CAST(100 AS BIGINT) AS \"n_rows\", CAST(10 AS BIGINT) AS \"n_queries\", CAST(51386496865 AS BIGINT) AS \"pair_digest\"",
    "g89_ann_pq" ->
      "SELECT CAST(100 AS BIGINT) AS \"n_rows\", CAST(10 AS BIGINT) AS \"n_queries\", CAST(47463224016 AS BIGINT) AS \"pair_digest\"",
    "g91_ann_ivfpq" ->
      "SELECT CAST(100 AS BIGINT) AS \"n_rows\", CAST(10 AS BIGINT) AS \"n_queries\", CAST(48896749087 AS BIGINT) AS \"pair_digest\"",
    "g107_ann_residual_pq" ->
      "SELECT CAST(100 AS BIGINT) AS \"n_rows\", CAST(10 AS BIGINT) AS \"n_queries\", CAST(47876807165 AS BIGINT) AS \"pair_digest\"",
    "g94_bpe_merges" ->
      "SELECT * FROM (VALUES (CAST(0 AS BIGINT), 'e', 'r', CAST(4568 AS BIGINT)), (CAST(1 AS BIGINT), 'e', '</w>', CAST(4473 AS BIGINT)), (CAST(2 AS BIGINT), 'n', '</w>', CAST(2834 AS BIGINT)), (CAST(3 AS BIGINT), 'er', '</w>', CAST(2779 AS BIGINT)), (CAST(4 AS BIGINT), 'o', 'w', CAST(2747 AS BIGINT)), (CAST(5 AS BIGINT), 'ow', '</w>', CAST(2747 AS BIGINT)), (CAST(6 AS BIGINT), 'o', 'r', CAST(2696 AS BIGINT)), (CAST(7 AS BIGINT), 's', 't', CAST(2676 AS BIGINT)), (CAST(8 AS BIGINT), 'h', '</w>', CAST(1884 AS BIGINT)), (CAST(9 AS BIGINT), 'a', 't', CAST(1845 AS BIGINT))) AS t(\"rank\", \"left\", \"right\", \"pair_count\")",
    // --- END GENERATED ---
  )
}
