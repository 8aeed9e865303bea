package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contract checks for the shared prefix-scan idiom: the global-order
  * arithmetic is pinned by its consumers' hash oracles (q108/q150/q162/
  * q164); these pin the interface — injected-name collisions fail
  * loudly, and offsets really are the exclusive prefix totals. */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  test("offsets are exclusive prefix totals under the sort order") {
    val df = (1L to 1000L).map(i => (i, i % 7)).toDF("v", "w")
    val scanned = PrefixScan.withLongOffsets(df, Seq(col("v")), col("w"))
    // per-partition check: off == sum of w over all rows sorting before
    // this partition
    val rows = scanned.select("pid", "off", "v", "w")
      .as[(Int, Long, Long, Long)].collect()
    val byPid = rows.groupBy(_._1)
    val starts = byPid.view.mapValues(_.map(_._3).min).toMap
    byPid.foreach { case (pid, part) =>
      val expected = rows.filter(r => r._3 < starts(pid)).map(_._4).sum
      assert(part.head._2 == expected,
        s"pid $pid off ${part.head._2} != $expected")
    }
  }

  test("a frame already carrying pid or off is rejected, not silently joined") {
    val hasPid = Seq((1L, 2)).toDF("v", "pid")
    val e1 = intercept[IllegalArgumentException] {
      PrefixScan.withLongOffsets(hasPid, Seq(col("v")), lit(1L))
    }
    assert(e1.getMessage.contains("pid"))
    val hasOff = Seq((1L, 2)).toDF("v", "off")
    val e2 = intercept[IllegalArgumentException] {
      PrefixScan.withDecimalOffsets(hasOff, Seq(col("v")),
        lit(java.math.BigDecimal.ONE).cast("decimal(38,2)"), 2)
    }
    assert(e2.getMessage.contains("off"))
  }
}
