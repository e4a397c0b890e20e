package graft

/** t1-smoke mirror + registry invariants. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every query in the registry runs on sf0.001") {
    Registry.all.foreach { q =>
      val n = q.fn(spark, sf).count()
      withClue(q.name)(assert(n >= 0))
    }
  }

  test("oracle coverage: every query has oracle SQL") {
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
