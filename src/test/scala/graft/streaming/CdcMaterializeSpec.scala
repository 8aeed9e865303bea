package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Cdc

/** The streaming CDC upsert view agrees with the batch materialization
  * (`Cdc.materializeLatest`) — the reference's dual-implementation
  * cross-check (SURVEY.md §5.3) applied to the changelog consumer, and
  * the log-replay idempotence the reference leans on for its Redis SET
  * sink (`RedisSink.kt:10-12`). */
class CdcMaterializeSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sf()

  /** Fold the emitted Update-mode rows to the final view: last image
    * per key wins (memory-sink rows arrive in batch order), tombstones
    * drop the key. */
  private def foldView(rows: Seq[(String, Long, Boolean, Long, Int,
                                  Option[Long], Option[Double], Option[Double])]) =
    rows.groupBy(_._1).values
      .map(_.maxBy(_._2)) // newest lsn per key
      .filterNot(_._3)    // drop tombstones
      .map(r => (r._4, r._5, r._6, r._7, r._8))
      .toSet

  test("streaming upsert view equals the batch materialization, in-order and shuffled") {
    val wire = Cdc.versionedEnvelope(spark, sfDir)
      .limit(3000) // keep the spec fast; coverage doesn't need the full log
      .collect().map(_.getString(1))
    val batchExpected = {
      // batch twin restricted to the same subset of the log
      val subset = wire.toSeq.toDF("value")
      val decoded = CdcMaterialize.decode(subset)
      import org.apache.spark.sql.expressions.Window
      val byKey = Window.partitionBy($"order_id", $"line_no").orderBy($"lsn".desc)
      decoded.withColumn("rn", row_number().over(byKey))
        .filter($"rn" === 1 && $"op" =!= "d")
        .select($"order_id", $"line_no", $"part_id", $"quantity", $"price")
        .as[(Long, Int, Option[Long], Option[Double], Option[Double])]
        .collect().toSet
    }

    for ((order, label) <- Seq[(Array[String] => Array[String], String)](
        (identity, "inorder"),
        (a => a.reverse, "reversed"),
        (a => a.sortBy(_.hashCode), "shuffled"))) {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[String]
      val changes = CdcMaterialize.decode(mem.toDF().toDF("value"))
      val q = CdcMaterialize.upsertView(changes)
        .writeStream.format("memory").queryName(s"cdc_view_$label")
        .outputMode(CdcMaterialize.outputMode).start()
      try {
        // feed in two batches so cross-batch state (not just batch-local
        // maxBy) is exercised
        val (first, second) = order(wire).splitAt(wire.length / 2)
        mem.addData(first.toIndexedSeq: _*)
        q.processAllAvailable()
        mem.addData(second.toIndexedSeq: _*)
        q.processAllAvailable()
        val got = foldView(spark.table(s"cdc_view_$label")
          .as[(String, Long, Boolean, Long, Int,
               Option[Long], Option[Double], Option[Double])]
          .collect().toSeq)
        assert(got == batchExpected,
          s"$label replay diverged: got ${got.size} keys, expected ${batchExpected.size}")
      } finally q.stop()
    }
  }

  test("replaying the full log a second time leaves the view unchanged (idempotent upsert)") {
    implicit val sqlCtx = spark.sqlContext
    val wire = Cdc.versionedEnvelope(spark, sfDir)
      .limit(1000).collect().map(_.getString(1))
    val mem = MemoryStream[String]
    val q = CdcMaterialize.upsertView(CdcMaterialize.decode(mem.toDF().toDF("value")))
      .writeStream.format("memory").queryName("cdc_view_replay")
      .outputMode(CdcMaterialize.outputMode).start()
    try {
      mem.addData(wire.toIndexedSeq: _*)
      q.processAllAvailable()
      val once = foldView(spark.table("cdc_view_replay")
        .as[(String, Long, Boolean, Long, Int,
             Option[Long], Option[Double], Option[Double])].collect().toSeq)
      mem.addData(wire.toIndexedSeq: _*) // full re-delivery
      q.processAllAvailable()
      val twice = foldView(spark.table("cdc_view_replay")
        .as[(String, Long, Boolean, Long, Int,
             Option[Long], Option[Double], Option[Double])].collect().toSeq)
      assert(once == twice && once.nonEmpty)
    } finally q.stop()
  }
}
