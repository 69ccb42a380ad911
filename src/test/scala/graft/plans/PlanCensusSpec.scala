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
  * across session parallelism; the ANSI sweep matches too, modulo one
  * measured, exactly-pinned delta ([[ansiDeltas]]).
  */
class PlanCensusSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val goldenPath = Paths.get(sys.props("user.dir"), "PLAN_CENSUS.json")

  /** The golden is generated in the default (permissive) mode; the ANSI
    * sweep re-plans everything and — measured — differs in exactly one
    * place: ANSI's cast semantics let Catalyst collapse one no-op cast
    * Project inside q89's SQL range-join rewrite. The delta is pinned
    * EXACTLY (not allowlisted loosely), so any other mode-dependent plan
    * drift still fails the gate in the sweep.
    */
  private val ansiDeltas: Map[String, Map[String, Int]] =
    Map("q89_sql_range_join" -> Map("Project" -> -1))

  private def expectedFor(q: String, want: Map[String, Int]): Map[String, Int] =
    if (!graft.GraftSession.ansiSweep) want
    else ansiDeltas.getOrElse(q, Map.empty).foldLeft(want) {
      case (acc, (kind, d)) =>
        val n = acc.getOrElse(kind, 0) + d
        if (n == 0) acc - kind else acc.updated(kind, n)
    }

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
        q -> PlanCensus.census(SparkEntry.queries(q)(spark, dir))
      }.toMap

    if (sys.env.get("GRAFT_REGEN_PLAN_CENSUS").contains("1")) {
      assert(!graft.GraftSession.ansiSweep,
        "regenerate the golden in the DEFAULT mode — the ANSI sweep's " +
          "measured deltas are pinned separately in ansiDeltas")
      Files.writeString(goldenPath, PlanCensus.toJson(got))
      info(s"regenerated $goldenPath with ${got.size} queries — review the git diff")
    } else {
      assert(Files.exists(goldenPath),
        s"$goldenPath missing — run with GRAFT_REGEN_PLAN_CENSUS=1 to create it")
      val want = readGolden()
      val missing = (got.keySet diff want.keySet).toSeq.sorted
      val stale = (want.keySet diff got.keySet).toSeq.sorted
      val drifted = got.keySet.intersect(want.keySet).toSeq.sorted
        .filter(q => expectedFor(q, want(q)) != got(q))
      assert(missing.isEmpty && stale.isEmpty && drifted.isEmpty,
        s"""plan census drift vs PLAN_CENSUS.json —
           |new queries not in golden: ${missing.mkString(", ")}
           |golden queries no longer registered: ${stale.mkString(", ")}
           |shape changes (kind want->got):
           |${drifted.map(q => diffLine(q, expectedFor(q, want(q)), got(q))).mkString("\n")}
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
