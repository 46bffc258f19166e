package graft

/** Driver-contract drift gates. */
class ContractSpec extends SparkSpec {

  test("every driver query has a DuckDB oracle (no silent rows-only fallbacks)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q === o, s"queries without oracle: ${q -- o}; oracles without query: ${o -- q}")
  }

  test("entry() produces rows on sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).limit(1).count() === 1L)
  }

  test("oracle SQL contains no stripMargin-mangled fragments") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\n|"), s"$name: unstripped margin")
      // a line starting with a single '|' means stripMargin ate a '||'
      sql.linesIterator.foreach { l =>
        val t = l.trim
        assert(!(t.startsWith("|") && !t.startsWith("||")),
          s"$name: suspicious line '$t'")
      }
    }
  }
}
