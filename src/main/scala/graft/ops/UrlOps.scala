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
    // 1. fixed-memory candidate sketch (map-side combine; one summary row).
    // Null hosts can't be capped — they ride the tail branch untouched
    // (same policy as [[capPerDomainExact]], pinned by UrlOpsSpec).
    val candidates = df.filter(col(hostCol).isNotNull)
      .select(col(hostCol).cast("string").as[String])
      .select(new HeavyHitters.MisraGries(capacity).toColumn)
      .head().items.map(_.item)
    if (candidates.isEmpty) return df
    // 2. exact confirmation over the bounded candidate set only
    val heavy = df.filter(col(hostCol).isInCollection(candidates))
      .groupBy(hostCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(col(hostCol).cast("string")).as[String].collect().toSeq
    if (heavy.isEmpty) return df
    // 3. carve the heavy hosts; the tail (incl. null hosts) never enters
    // the exchange
    val isHeavy = coalesce(col(hostCol).isInCollection(heavy), lit(false))
    Sampling.takePerStratum(df.filter(isHeavy), idCol, hostCol, cap, salt)
      .unionByName(df.filter(!isHeavy))
  }

  /** Largest sketch the auto variant will hold driver-side: 2²² counters
    * (≈ tens of MB of host strings). Past it the lossless-capacity
    * derivation stops being a sane memory envelope — and long before
    * Int.MaxValue it would silently wrap the capacity (round-12 advice).
    */
  val MaxAutoSketchCapacity: Int = 1 << 22

  /** [[capPerDomain]] with the sketch capacity derived from one count:
    * capacity = max(16, ⌈n/cap⌉) makes the containment guarantee
    * unconditional (n/(capacity+1) < cap for every distribution).
    *
    * Memory envelope: the derived capacity is the sketch's driver-side
    * counter count, so it is bounded at `maxCapacity` — when ⌈n/cap⌉
    * exceeds it (10¹¹ docs at cap=1000 would ask for 10⁸ counters), the
    * call DEGRADES to [[capPerDomainExact]], which keeps the guarantee
    * with zero driver memory at the price of one more shuffle. The result
    * is identical either way; only the plan changes.
    */
  def capPerDomainAuto(
      df: DataFrame,
      hostCol: String,
      idCol: String,
      cap: Int,
      salt: String = "",
      maxCapacity: Int = MaxAutoSketchCapacity): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    require(maxCapacity >= 16, s"maxCapacity must be >= 16, got $maxCapacity")
    val n = df.count()
    val capacity = math.max(16L, (n + cap - 1) / cap)
    if (capacity <= maxCapacity) capPerDomain(df, hostCol, idCol, cap, capacity.toInt, salt)
    else capPerDomainExact(df, hostCol, idCol, cap, salt)
  }

  /** The fully-distributed exact cap — no sketch, no driver-side
    * candidate set at all: per-host counts from one hash aggregation
    * (map-side combine reduces each partition to its distinct hosts),
    * heavy flags joined back on the host key (broadcast when few hosts
    * are heavy, an ordinary equi-join otherwise — no hint, the optimizer
    * picks by size), then the same q96 carve on the heavy branch while
    * the tail unions through without entering the window. This is the
    * scale path when ⌈n/cap⌉ outgrows any sane sketch: at 10¹¹ docs with
    * cap=1000 there can be 10⁸ over-cap hosts — a set NO driver should
    * hold, which is exactly why this variant never collects one.
    */
  def capPerDomainExact(
      df: DataFrame,
      hostCol: String,
      idCol: String,
      cap: Int,
      salt: String = ""): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val heavy = df.groupBy(hostCol).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap)
      .select(col(hostCol), lit(1).as("__graft_heavy"))
    // an equi-join on the key Seq moves the key column first — restore
    // the caller's column order so the cap is schema-transparent
    val flagged = df.join(heavy, Seq(hostCol), "left")
    Sampling.takePerStratum(
        flagged.filter(col("__graft_heavy").isNotNull), idCol, hostCol, cap, salt)
      .unionByName(flagged.filter(col("__graft_heavy").isNull))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-domain doc counts with the capped-kept count beside them — the
    * audit view curation reports are built from.
    */
  def domainStats(df: DataFrame, hostCol: String, cap: Int): DataFrame =
    df.groupBy(hostCol).agg(count(lit(1)).as("n_docs"))
      .withColumn("n_kept", least(col("n_docs"), lit(cap.toLong)))
      .withColumn("capped", (col("n_docs") > cap).cast("long"))
}
