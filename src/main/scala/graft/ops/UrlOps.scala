package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters

/** URL operators + Gopher-style per-domain frequency caps (round-11
  * verdict #3): web-scale training corpora over-sample a handful of hosts
  * (link aggregators, boilerplate farms), and the standard curation move —
  * Gopher / RefinedWeb / Dolma all do a variant — is "keep at most `cap`
  * documents per domain".
  *
  * Composition, not new machinery: candidate heavy domains come from the
  * Misra–Gries sketch ([[HeavyHitters]], q94 — fixed memory, map-side,
  * no full-domain aggregation), the candidates are confirmed with an exact
  * count over the BOUNDED candidate set, and the cap itself is the
  * content-stable fixed-size carve ([[Sampling.takePerStratum]], q96 —
  * hash-rank order, so replays and repartitions keep the same docs).
  *
  * Scale shape (100 TB): the sketch pass shuffles nothing (one typed
  * aggregation to a single summary), the confirm aggregates only rows in
  * ≤ capacity candidate hosts, and the carve's window shuffle moves ONLY
  * the heavy-host rows — the long tail of domains passes through without
  * ever entering an exchange. Soundness: Misra–Gries guarantees every item
  * with frequency > n/(capacity+1) survives the sketch, so with
  * capacity ≥ n/cap every host that could exceed the cap is a candidate —
  * [[capPerDomain]] documents the requirement, [[capPerDomainAuto]]
  * derives the capacity from one count.
  */
object UrlOps {

  /** Host (authority) component of a URL — scheme-prefixed, up to the
    * first `/`, `?` or `#`. ONE constant, interpolated into the generated
    * oracle SQL (the q68 shared-pattern contract; both engines implement
    * leftmost group extraction identically).
    */
  val HostPattern: String = "^[a-z][a-z0-9+.-]*://([^/?#]+)"

  /** Registrable-domain heuristic: the last two dot-labels of a host
    * ("news.site7.example.com" → "example.com"). A public-suffix list
    * would refine multi-label TLDs; the operator contract (and the oracle)
    * is this shared regex.
    */
  val DomainPattern: String = "([^.]+\\.[^.]+)$"

  def host(url: Column): Column = regexp_extract(url, HostPattern, 1)

  def registrableDomain(h: Column): Column = regexp_extract(h, DomainPattern, 1)

  /** Keep at most `cap` docs per `hostCol` value, content-stably.
    *
    * REQUIRES capacity ≥ n/cap (n = row count) for the sketch's
    * containment guarantee to make the result exact — use
    * [[capPerDomainAuto]] when n is not known. Tail hosts (count ≤ cap)
    * bypass the window entirely; heavy hosts keep their `cap` hash-rank
    * winners (the q96 carve, salted independently of other key decisions).
    */
  def capPerDomain(
      df: DataFrame,
      hostCol: String,
      idCol: String,
      cap: Int,
      capacity: Int,
      salt: String = ""): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val spark = df.sparkSession
    import spark.implicits._
    // 1. fixed-memory candidate sketch (map-side combine; one summary row)
    val candidates = df.select(col(hostCol).cast("string").as[String])
      .select(new HeavyHitters.MisraGries(capacity).toColumn)
      .head().items.map(_.item)
    if (candidates.isEmpty) return df
    // 2. exact confirmation over the bounded candidate set only
    val heavy = df.filter(col(hostCol).isInCollection(candidates))
      .groupBy(hostCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(col(hostCol).cast("string")).as[String].collect().toSeq
    if (heavy.isEmpty) return df
    // 3. carve the heavy hosts; the tail never enters the exchange
    val isHeavy = col(hostCol).isInCollection(heavy)
    Sampling.takePerStratum(df.filter(isHeavy), idCol, hostCol, cap, salt)
      .unionByName(df.filter(!isHeavy))
  }

  /** [[capPerDomain]] with the sketch capacity derived from one count:
    * capacity = max(16, ⌈n/cap⌉) makes the containment guarantee
    * unconditional (n/(capacity+1) < cap for every distribution).
    */
  def capPerDomainAuto(
      df: DataFrame,
      hostCol: String,
      idCol: String,
      cap: Int,
      salt: String = ""): DataFrame = {
    val n = df.count()
    val capacity = math.max(16L, (n + cap - 1) / cap).toInt
    capPerDomain(df, hostCol, idCol, cap, capacity, salt)
  }

  /** Per-domain doc counts with the capped-kept count beside them — the
    * audit view curation reports are built from.
    */
  def domainStats(df: DataFrame, hostCol: String, cap: Int): DataFrame =
    df.groupBy(hostCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("n_kept", least(col("n_docs"), lit(cap.toLong)))
      .withColumn("capped", (col("n_docs") > cap).cast("long"))
}
