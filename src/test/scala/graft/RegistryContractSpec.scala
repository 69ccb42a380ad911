package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guard for the query/oracle registry: the driver's
  * correctness gate records a weaker rows-only check for any query missing
  * its oracle, and a key typo between the two maps silently downgrades a
  * query without failing anything — so the pairing is pinned here.
  */
class RegistryContractSpec extends AnyFunSuite {

  test("every registry query has exactly one oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q diff o).isEmpty, s"queries without oracle: ${(q diff o).toSeq.sorted}")
    assert((o diff q).isEmpty, s"oracles without query: ${(o diff q).toSeq.sorted}")
  }

  test("oracleSqlFor is key-stable across sf dirs and only fixture paths vary") {
    val a = SparkEntry.oracleSqlFor("/root/testdata/sf0.01")
    val b = SparkEntry.oracleSqlFor("/root/testdata/sf0.1")
    assert(a.keySet == b.keySet)
    val differing = a.keySet.filter(k => a(k) != b(k)).toSeq.sorted
    // exactly the fixture-reading oracles may vary, and only in their path
    assert(differing == Seq("q47_json_raw_lake", "q79_ivf_index_health"),
      s"unexpected sf-dependent oracles: $differing")
    differing.foreach { k =>
      assert(a(k).contains("_root_testdata_sf0_01") && b(k).contains("_root_testdata_sf0_1"),
        s"$k oracle does not carry its sf-scoped fixture path")
    }
  }

  test("registry naming and oracle content sanity") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d{2}_[a-z0-9_]+"), s"non-conforming query name: $k")
    }
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle for $k")
      assert(sql.toUpperCase.contains("SELECT"), s"oracle for $k is not a query")
    }
  }
}
