package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact (hash-groupBy),
  * MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every variant reduces to (a) a narrow per-row signature
  * projection, then (b) an equi-shuffle on a SMALL key (16-byte md5, a band
  * hash, or a 64-bit simhash) — never a shuffle of document text, and never a
  * cross join. Candidate verification joins back by doc id.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct content fingerprint with the
    * deterministic representative (min doc id) and the duplicate count.
    * Map-side partial aggregation applies; the shuffle carries only
    * (fingerprint, min_id, count).
    */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fp", Text.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("dup_cnt"))

  /** Deterministic 64-bit token hash derived from md5 (first 15 hex chars →
    * 60 bits). Portable: any engine with md5 + hex parsing reproduces it.
    */
  def tokenHash64(tok: Column): Column =
    conv(substring(md5(tok), 1, 15), 16, 10).cast("long")

  /** MinHash signature: for each of `nHashes` permutations i, the minimum of
    * (aᵢ·h(tok) + bᵢ) mod p over the document's distinct tokens. Pure array
    * expressions — the signature is computed per-row with no shuffle.
    */
  def minhashSignature(text: Column, nHashes: Int, seed: Long = 42L): Column = {
    val p = 2147483647L // 2^31 - 1, Mersenne prime
    def mix(i: Long, salt: Long): Long = {
      var z = seed + i * 0x9E3779B97F4A7C15L + salt
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      math.abs(z ^ (z >>> 31)) % p
    }
    val toks = array_distinct(Text.tokens(text))
    val hashes = transform(toks, t => tokenHash64(t))
    val mins = (0 until nHashes).map { i =>
      val a = mix(i.toLong, 0x51AB4D2EL) | 1L // odd, non-zero
      val b = mix(i.toLong, 0x7F4E6C3DL)
      // reduce h mod p BEFORE multiplying: h < 2^60 and a < 2^31 would
      // overflow Long; (h mod p) * a < 2^62 stays safe.
      aggregate(
        hashes,
        lit(p),
        (acc, h) => least(acc, pmod(pmod(h, lit(p)) * a + b, lit(p))))
    }
    array(mins: _*)
  }

  /** LSH banding over a MinHash signature: `nBands` band keys, each an md5 of
    * (band index, the band's slice of the signature). Docs sharing any band
    * key are near-dup candidates.
    */
  def minhashBands(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    array((0 until nBands).map { b =>
      md5(concat_ws("_", lit(b) +: (0 until rowsPerBand).map(r => sig.getItem(b * rowsPerBand + r)): _*))
    }: _*)

  /** MinHash/LSH near-duplicate candidate pairs with estimated Jaccard
    * (fraction of matching signature positions).
    *
    * Plan shape: signature projection (narrow) → explode bands →
    * equi-shuffle on band key → per-bucket pair join → distinct pairs →
    * signature-agreement estimate. No document text crosses the wire.
    */
  def minhashCandidates(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id",
      nHashes: Int = 32,
      nBands: Int = 8,
      seed: Long = 42L): DataFrame = {
    val rowsPerBand = nHashes / nBands
    val sigs = docs
      .select(col(idCol).as("id"), minhashSignature(col(textCol), nHashes, seed).as("sig"))
    val banded = sigs.select(col("id"), col("sig"), explode(minhashBands(col("sig"), nBands, rowsPerBand)).as("band"))
    val a = banded.select(col("band"), col("id").as("a_id"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("band"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sig"), col("b_sig"))
      .distinct()
      .withColumn(
        "est_jaccard",
        size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), m => m)).cast("double")
          / size(col("a_sig")))
      .select(col("a_id"), col("b_id"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash over token hashes: sign of the per-bit weighted sum. */
  def simhash64(text: Column): Column = {
    val hashes = transform(array_distinct(Text.tokens(text)), t => tokenHash64(t))
    val bits = (0 until 60).map { b =>
      val votes = aggregate(
        hashes,
        lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Exact token-set Jaccard for a candidate pair of text columns. */
  def jaccardTokens(a: Column, b: Column): Column = {
    val sa = array_distinct(split(a, " "))
    val sb = array_distinct(split(b, " "))
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter)
  }
}
