package graft.plans

import org.apache.spark.sql.DataFrame

/** Physical-operator census of a query plan: node-kind → count, extracted
  * from the UNEXECUTED physical plan (AQE initial plan, `isFinalPlan=false`).
  *
  * Why it exists (round-13 verdict, stretch 9): `PlanAuditSpec` pins ~20
  * hand-picked plan properties, but a plan regression on any of the other
  * ~100 registry queries (the round-12 q101 interpreted-`transform` blowup
  * was exactly this class) only surfaced in the BENCH, a full round later.
  * The census turns "the plan changed shape" into a gate failure: every
  * registry query's operator counts are pinned in `PLAN_CENSUS.json` and
  * diffed by `PlanCensusSpec`; `graft.Verify` additionally dumps the census
  * it observed (`_plan_census.json`) so the driver artifacts record the
  * plan shapes each round actually ran.
  *
  * What is counted: the first operator identifier of every tree line of
  * `executedPlan.toString` — `Exchange`, `BroadcastExchange`, `FileScan`,
  * `HashAggregate`, `SortMergeJoin`, `Generate`, … — with the whole-stage
  * codegen `*(n)` marker stripped. Operator ARGUMENTS (partition counts,
  * expression ids, paths) are deliberately excluded: they vary with SF and
  * session parallelism, while the operator multiset is the shape the 100 TB
  * analysis in PLANS.md reasons about. Counts are taken before execution,
  * so no AQE runtime nodes (`ShuffleQueryStage`, `AQEShuffleRead`) appear
  * and the census is deterministic for a fixed (code, SF) pair.
  */
object PlanCensus {

  /** Tree lines look like `   +- *(2) HashAggregate(keys=[…]` or
    * `:  +- BroadcastExchange HashedRelationBroadcastMode(…)` — optional
    * tree-drawing prefix, optional codegen marker, then the node name.
    */
  private val NodeLine =
    """^[\s:+\-]*(?:\*\(\d+\)\s*)?([A-Z][A-Za-z0-9]*)""".r

  /** Node-kind counts of a physical plan string (one node per tree line;
    * section separators like `== Initial Plan ==` match nothing and are
    * skipped).
    */
  def censusOfPlanString(plan: String): Map[String, Int] =
    plan.linesIterator
      .flatMap(l => NodeLine.findFirstMatchIn(l).map(_.group(1)))
      .toSeq
      .groupBy(identity)
      .map { case (k, v) => k -> v.size }

  /** Census of a DataFrame's physical plan WITHOUT executing it. Touching
    * `executedPlan` runs planning + preparation only; under AQE the
    * resulting `AdaptiveSparkPlan` stringifies its initial plan until
    * something consumes the query, which is exactly the deterministic
    * pre-runtime shape the golden file pins.
    */
  def census(df: DataFrame): Map[String, Int] =
    censusOfPlanString(df.queryExecution.executedPlan.toString)

  /** Canonical JSON rendering: queries sorted, node kinds sorted, stable
    * byte-for-byte across runs so the golden file diffs cleanly in git.
    */
  def toJson(all: Map[String, Map[String, Int]]): String = {
    val entries = all.toSeq.sortBy(_._1).map { case (q, kinds) =>
      val body = kinds.toSeq.sortBy(_._1)
        .map { case (k, n) => s"${graft.Jsons.q(k)}: $n" }
        .mkString("{", ", ", "}")
      s"  ${graft.Jsons.q(q)}: $body"
    }
    entries.mkString("{\n", ",\n", "\n}\n")
  }
}
