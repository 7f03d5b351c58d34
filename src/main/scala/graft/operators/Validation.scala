package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Read-only "validation compaction" (SURVEY §2.7): stream the table in
  * token order and produce per-bucket digests — the Merkle-tree row-hash
  * scan of service/AntiEntropyService.java:58-300 + utils/MerkleTree.java,
  * collapsed to per-bucket order-insensitive checksums (count + sum/xor of
  * a row hash). Two stores replicate-agree iff their digest sets match.
  */
object Validation {

  /** Per-bucket digests with a caller-supplied row hash (use an
    * oracle-computable arithmetic hash for cross-engine checks, or
    * xxhash64 for engine-internal comparisons).
    */
  def bucketChecksums(df: DataFrame, bucket: Column, rowHash: Column): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), sum(rowHash).as("checksum"))

  /** Engine-internal digest over cells: xxhash64 of the full cell tuple,
    * bit_xor-aggregated (order-insensitive, collision-resistant enough for
    * anti-entropy comparison).
    */
  def cellDigests(cells: DataFrame, buckets: Int): DataFrame =
    cells
      .groupBy(pmod(xxhash64(col("key")), lit(buckets)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("key"), col("super_name"), col("col_name"),
          col("value"), col("ts"), col("tombstone"))).as("digest"))

  /** Anti-entropy range diff (the MerkleTree.difference step of
    * service/AntiEntropyService.java:58-300 / utils/MerkleTree.java:51-700
    * collapsed to one level): compare two stores' bucket digests and
    * return only the buckets that disagree, tagged with the side counts —
    * the "which token ranges need repair" answer. A full outer join of
    * two tiny digest tables; each side's digest pass is one scan.
    */
  def diffRanges(a: DataFrame, b: DataFrame, buckets: Int): DataFrame =
    diffOn(cellDigests(a, buckets), cellDigests(b, buckets))

  private def diffOn(da0: DataFrame, db0: DataFrame): DataFrame = {
    val da = da0.select(col("bucket"), col("n").as("n_a"), col("digest").as("digest_a"))
    val db = db0.select(col("bucket"), col("n").as("n_b"), col("digest").as("digest_b"))
    da.join(db, Seq("bucket"), "full_outer")
      .filter(
        col("n_a").isNull || col("n_b").isNull ||
          col("n_a") =!= col("n_b") || col("digest_a") =!= col("digest_b"))
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
  }

  // ---- token-range Merkle leaves with adaptive depth ----

  /** Tree depth (in hex digits of the token, 4 bits ≙ 16-way fan-out per
    * digit) sized to the row count — the analog of MerkleTree.init
    * (utils/MerkleTree.java:51-120), which splits ranges until the leaf
    * count covers the estimated keys within `maxsize`. Smallest depth
    * whose 16^d leaves hold ≤ targetRowsPerLeaf rows each IF tokens were
    * uniform; real (skewed) stores simply get oversized leaves, exactly
    * like the reference's fixed-fan-out tree, and a deeper tree — one
    * more digit — quarters... sixteenths the repair granularity at the
    * cost of a 16× larger (still tiny) digest table.
    */
  def merkleDepthFor(rowCount: Long, targetRowsPerLeaf: Long = 1L << 17): Int = {
    require(targetRowsPerLeaf > 0, "targetRowsPerLeaf must be positive")
    var d = 1
    var leaves = 16L
    while (d < 8 && leaves * targetRowsPerLeaf < rowCount) { d += 1; leaves *= 16L }
    d
  }

  /** Per-token-range digests: the Merkle LEAF row of a depth-d tree over
    * the hex-token ring — leaf id = the first `depthHex` hex digits of
    * the token, so a disagreeing leaf names a CONTIGUOUS token range
    * `[prefix000…, prefixfff…]` to re-stream, the same repair unit as
    * the reference's tree (hash-bucketed [[cellDigests]] cannot name a
    * range: its buckets interleave the whole ring). One scan, one
    * map-side-combined aggregate; the digest table is ≤ 16^depth rows.
    */
  def merkleLeafDigests(cells: DataFrame, token: Column, depthHex: Int): DataFrame = {
    require(depthHex >= 1 && depthHex <= 8, "depthHex must be in [1, 8]")
    cells
      .groupBy(substring(token, 1, depthHex).as("bucket"))
      .agg(count(lit(1)).as("n"),
        bit_xor(xxhash64(col("key"), col("super_name"), col("col_name"),
          col("value"), col("ts"), col("tombstone"))).as("digest"))
  }

  /** [[diffRanges]] over token-range Merkle leaves: disagreeing CONTIGUOUS
    * token ranges at the given depth. Pass the same depth both sides (the
    * reference invalidates and rebuilds both trees at one depth per
    * repair session, AntiEntropyService:58-300).
    */
  def merkleDiffRanges(a: DataFrame, b: DataFrame, token: Column,
      depthHex: Int): DataFrame =
    diffOn(merkleLeafDigests(a, token, depthHex),
      merkleLeafDigests(b, token, depthHex))
}
