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
  def diffRanges(a: DataFrame, b: DataFrame, buckets: Int): DataFrame = {
    val da = cellDigests(a, buckets)
      .select(col("bucket"), col("n").as("n_a"), col("digest").as("digest_a"))
    val db = cellDigests(b, buckets)
      .select(col("bucket"), col("n").as("n_b"), col("digest").as("digest_b"))
    da.join(db, Seq("bucket"), "full_outer")
      .filter(
        col("n_a").isNull || col("n_b").isNull ||
          col("n_a") =!= col("n_b") || col("digest_a") =!= col("digest_b"))
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
  }
}
