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
        |  simhash60(word_shingles(text, 3)) AS sh
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

  test("spark.sql.extensions=graft.GraftExtensions registers the SQL functions at build time") {
    // extensions apply only at SESSION construction; clear the JVM's
    // default/active session so getOrCreate builds a genuinely new one
    // (sharing the context) with the extension installed — the functions
    // must then resolve WITHOUT any registerAll call
    import org.apache.spark.sql.SparkSession
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // the string form (`.config("spark.sql.extensions", ...)`) only
      // takes effect when the SparkCONTEXT is created with it, which the
      // shared test context wasn't — withExtensions exercises the same
      // injectFunction path through the public builder API
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val r = s2.sql(
        "SELECT poly_hash64('abc') AS p, fnv1a64('abc') AS f, simhash60(array('a','b')) AS s")
        .collect()(0)
      assert(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("query() dispatches by inventory name and rejects unknowns") {
    assert(Graft.query(spark, sf(), "q01_pricing_summary").count() > 0)
    intercept[NoSuchElementException] {
      Graft.query(spark, sf(), "q999_nope")
    }
  }
}
