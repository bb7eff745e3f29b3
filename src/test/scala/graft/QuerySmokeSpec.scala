package graft

import graft.queries.Registry

/** t1 smoke: every declared query executes at sf0.001 (the oracle compare
  * is the driver's t2 loop, reproduced locally by tools/oracle_check.py).
  */
class QuerySmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry has no duplicate names and every oracle key has a query") {
    assert(Registry.all.map(_.name).distinct.size == Registry.all.size)
  }

  Registry.all.foreach { q =>
    test(s"${q.name} executes at sf0.001") {
      assert(q.build(spark, sf).count() >= 0)
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
