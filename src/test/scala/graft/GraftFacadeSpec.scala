package graft

import graft.SparkSpec

/** The facade must make the whole surface reachable from plain SQL. */
class GraftFacadeSpec extends SparkSpec {

  test("open registers every table view and the custom SQL functions") {
    Graft.open(spark, sf())
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").count() == 1L, s"view $n")
    }
    // custom expressions callable from SQL against the views
    val r = spark.sql(
      """SELECT doc_id, fnv1a64(text) AS fp,
        |  simhash64(word_shingles(text, 3)) AS sh
        |FROM documents ORDER BY doc_id LIMIT 3""".stripMargin).collect()
    assert(r.length == 3 && r.forall(!_.isNullAt(1)))
    // events view carries the µs-grain event-time contract
    val ts = spark.sql("SELECT ts_us, ts FROM events LIMIT 1").schema
    assert(ts("ts").dataType.typeName == "timestamp")
  }

  test("a reference-style dashboard query runs as one SQL statement") {
    Graft.open(spark, sf())
    val out = spark.sql(
      """SELECT c_mktsegment AS segment,
        |  ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin)
    assert(out.count() == 5)
  }

  test("query() dispatches by inventory name and rejects unknowns") {
    assert(Graft.query(spark, sf(), "q01_pricing_summary").count() > 0)
    intercept[NoSuchElementException] {
      Graft.query(spark, sf(), "q999_nope")
    }
  }
}
