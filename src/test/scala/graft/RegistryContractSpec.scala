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
    // (q97 joins the BPE expected table, q100 reads the IVF lists)
    assert(differing == Seq("q100_semantic_carve", "q101_lm_perplexity",
        "q102_bpe_packing", "q105_bpe_token_ids", "q108_lm_incremental",
        "q110_lm_trigram", "q111_bpe_byte_fallback", "q112_csv_lake",
        "q119_bm25_retrieval", "q120_hard_negatives", "q121_unigram_tokenize",
        "q122_bm25_index_append", "q123_bm25_bucketed_serve",
        "q124_retrieval_decontam", "q125_unigram_packing",
        "q126_unigram_token_ids", "q127_decontam_calibration",
        "q128_unigram_byte_ids", "q131_dsir_resample",
        "q47_json_raw_lake", "q79_ivf_index_health", "q97_bpe_tokenize"),
      s"unexpected sf-dependent oracles: $differing")
    differing.foreach { k =>
      assert(a(k).contains("_root_testdata_sf0_01") && b(k).contains("_root_testdata_sf0_1"),
        s"$k oracle does not carry its sf-scoped fixture path")
    }
  }

  /** Offsets of DuckDB floor-division (`//`) occurrences in `sql` that are
    * not inside any enclosing `CAST(...)`. DuckDB widens `SUM(BIGINT)` to
    * HUGEINT, so an un-cast `ExactAgg.Sql.divHalfUp`/`floorDiv` output
    * column silently emits int128 — values identical to Spark's BIGINT but
    * hash-failed by the driver's type-sensitive compare (q79, rounds 8-10).
    */
  private def uncastFloorDivs(rawSql: String): Seq[Int] = {
    // mask single-quoted string literal CONTENTS (offsets preserved) so a
    // `//` inside a URL regex literal isn't mistaken for floor division
    val sb = new StringBuilder(rawSql)
    var inStr = false
    var p = 0
    while (p < sb.length) {
      if (sb.charAt(p) == '\'') inStr = !inStr
      else if (inStr) sb.setCharAt(p, ' ')
      p += 1
    }
    val sql = sb.toString
    val idxs = Iterator.iterate(sql.indexOf("//"))(i => sql.indexOf("//", i + 1))
      .takeWhile(_ >= 0).toSeq
    idxs.filterNot { i =>
      var depth = 0
      var j = i - 1
      var cast = false
      while (j >= 0 && !cast) {
        sql.charAt(j) match {
          case ')' => depth += 1
          case '(' =>
            if (depth == 0) {
              // an enclosing open paren — is it CAST's?
              var k = j - 1
              while (k >= 0 && sql.charAt(k).isWhitespace) k -= 1
              if (k >= 3 && sql.substring(k - 3, k + 1).equalsIgnoreCase("CAST"))
                cast = true
            } else depth -= 1
          case _ =>
        }
        j -= 1
      }
      cast
    }
  }

  test("every oracle floor-division output is wrapped in an explicit CAST") {
    // self-check: the guard must flag a deliberately un-cast divHalfUp
    val poison =
      s"SELECT ${functions.ExactAgg.Sql.divHalfUp("SUM(n)", "COUNT(*)")} AS x FROM t"
    assert(uncastFloorDivs(poison).nonEmpty,
      "guard failed to flag an un-cast divHalfUp output")
    assert(uncastFloorDivs(
      s"SELECT CAST(${functions.ExactAgg.Sql.divHalfUp("SUM(n)", "COUNT(*)")} AS BIGINT) AS x FROM t").isEmpty,
      "guard false-positived on a cast divHalfUp output")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      val bad = uncastFloorDivs(sql)
      assert(bad.isEmpty,
        s"$k: un-cast floor-division at offsets $bad — DuckDB will type it " +
          s"HUGEINT and the driver hash will fail with matching values")
    }
  }

  test("registry naming and oracle content sanity") {
    SparkEntry.queries.keys.foreach { k =>
      assert(k.matches("q\\d{2,3}_[a-z0-9_]+"), s"non-conforming query name: $k")
    }
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle for $k")
      assert(sql.toUpperCase.contains("SELECT"), s"oracle for $k is not a query")
    }
  }
}
