package graft.plans

import java.io.File
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

import graft.{SparkEntry, SparkSpec}

/** The golden physical-operator census gate (round-13 verdict, stretch 9):
  * every registry query's plan-node counts at sf0.001 are pinned in
  * `PLAN_CENSUS.json` and diffed here, so a plan-shape regression on ANY
  * query — an interpreted HOF sneaking a Generate+Exchange into a scan
  * pipeline, a broadcast silently degrading to a sort-merge join — fails
  * the test gate instead of surfacing a round later in the bench.
  *
  * Regenerating after a DELIBERATE plan change:
  * `GRAFT_REGEN_PLAN_CENSUS=1 sbt "testOnly graft.plans.PlanCensusSpec"`
  * then review the golden-file diff in git — the diff IS the review
  * artifact; an unexplained delta on a query you didn't touch means the
  * change had wider blast radius than intended.
  *
  * The census counts operator KINDS only (arguments, partition counts and
  * expression ids excluded — see [[PlanCensus]]), so the golden holds
  * across session parallelism and both SQL modes, modulo one measured
  * exprId-order instability excluded per-kind ([[unstableKinds]]).
  */
class PlanCensusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val goldenPath = Paths.get(sys.props("user.dir"), "PLAN_CENSUS.json")

  /** Measured instability, excluded EXACTLY (one kind on one query, never
    * a loose allowlist): q89's Project count flips between 3 and 4 across
    * JVMs in the SAME SQL mode — the optimizer's constraint inference
    * iterates exprId-hash-ordered sets, and whether one collapsible
    * Project survives around the range-join rewrite depends on the global
    * expression-id counter's state, i.e. on what ran earlier in the JVM.
    * Every other kind on q89 (the load-bearing Generate + single
    * Exchange + BroadcastHashJoin shape) stays pinned, as does Project
    * everywhere else. Applied to both sides of the diff and at regen
    * time, so the golden never records the noisy value.
    */
  private val unstableKinds: Map[String, Set[String]] =
    Map("q89_sql_range_join" -> Set("Project"))

  private def normalized(q: String, census: Map[String, Int]): Map[String, Int] =
    census -- unstableKinds.getOrElse(q, Set.empty)

  private def readGolden(): Map[String, Map[String, Int]] = {
    val root = new ObjectMapper().readTree(goldenPath.toFile)
    root.properties().asScala.map { e =>
      e.getKey -> e.getValue.properties().asScala
        .map(f => f.getKey -> f.getValue.asInt()).toMap
    }.toMap
  }

  private def diffLine(q: String, want: Map[String, Int], got: Map[String, Int]): String = {
    val kinds = (want.keySet ++ got.keySet).toSeq.sorted
    val deltas = kinds.flatMap { k =>
      val (w, g) = (want.getOrElse(k, 0), got.getOrElse(k, 0))
      if (w == g) None else Some(s"$k $w->$g")
    }
    s"  $q: ${deltas.mkString(", ")}"
  }

  test("every registry query's physical-operator census matches PLAN_CENSUS.json") {
    val got: Map[String, Map[String, Int]] =
      SparkEntry.queries.keys.toSeq.sorted.map { q =>
        q -> normalized(q, PlanCensus.census(SparkEntry.queries(q)(spark, dir)))
      }.toMap

    if (sys.env.get("GRAFT_REGEN_PLAN_CENSUS").contains("1")) {
      assert(!graft.GraftSession.ansiSweep,
        "regenerate the golden in the DEFAULT mode (the gated baseline)")
      Files.writeString(goldenPath, PlanCensus.toJson(got))
      info(s"regenerated $goldenPath with ${got.size} queries — review the git diff")
    } else {
      assert(Files.exists(goldenPath),
        s"$goldenPath missing — run with GRAFT_REGEN_PLAN_CENSUS=1 to create it")
      val want = readGolden()
      val missing = (got.keySet diff want.keySet).toSeq.sorted
      val stale = (want.keySet diff got.keySet).toSeq.sorted
      val drifted = got.keySet.intersect(want.keySet).toSeq.sorted
        .filter(q => normalized(q, want(q)) != got(q))
      assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
        s"""plan census drift vs PLAN_CENSUS.json —
           |new queries not in golden: ${missing.mkString(", ")}
           |golden queries no longer registered: ${stale.mkString(", ")}
           |shape changes (kind want->got):
           |${drifted.map(q => diffLine(q, normalized(q, want(q)), got(q))).mkString("\n")}
           |If deliberate: GRAFT_REGEN_PLAN_CENSUS=1 sbt "testOnly graft.plans.PlanCensusSpec"
           |and review the golden diff.""".stripMargin)
    }
  }

  test("census extraction parses tree prefixes, codegen markers and skips separators") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=false
        |+- Sort [a ASC NULLS FIRST], true, 0
        |   +- Exchange rangepartitioning(a ASC, 2), ENSURE_REQUIREMENTS, [plan_id=42]
        |      +- *(2) HashAggregate(keys=[a], functions=[sum(b)])
        |         +- Exchange hashpartitioning(a, 2), ENSURE_REQUIREMENTS, [plan_id=39]
        |            +- *(1) HashAggregate(keys=[a], functions=[partial_sum(b)])
        |               :- BroadcastExchange HashedRelationBroadcastMode(List(x))
        |               +- == Initial Plan ==
        |               +- FileScan parquet [a,b] Batched: true
        |""".stripMargin
    val c = PlanCensus.censusOfPlanString(plan)
    assert(c == Map(
      "AdaptiveSparkPlan" -> 1, "Sort" -> 1, "Exchange" -> 2,
      "HashAggregate" -> 2, "BroadcastExchange" -> 1, "FileScan" -> 1))
  }

  test("toJson is canonical: sorted queries, sorted kinds, trailing newline") {
    val j = PlanCensus.toJson(Map(
      "q2" -> Map("B" -> 1, "A" -> 2), "q1" -> Map("Z" -> 3)))
    assert(j ==
      "{\n  \"q1\": {\"Z\": 3},\n  \"q2\": {\"A\": 2, \"B\": 1}\n}\n")
  }
}
