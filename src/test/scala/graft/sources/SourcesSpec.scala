package graft.sources

import java.nio.file.Files

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("csv scan: explicit schema, header skip, malformed lines dropped") {
    val dir = Files.createTempDirectory("csvsrc").toFile
    val f = new java.io.File(dir, "orders.csv")
    Files.writeString(f.toPath,
      """order_id,bid_time,price,item,supplier
        |o1,2024-01-01 00:00:01,10.5,widget,Alice
        |o2,2024-01-01 00:00:02,not_a_number,widget,Bob
        |o3,2024-01-01 00:00:03,7.25,gadget,Carol
        |""".stripMargin)
    val df = Sources.csvOrders(spark, f.getAbsolutePath)
    val rows = df.orderBy("order_id").collect()
    // header consumed; o2's unparseable price dropped (DROPMALFORMED,
    // the FileSourceFactory.kt:80-106 semantics)
    assert(rows.map(_.getString(0)).toSeq == Seq("o1", "o3"))
    assert(rows(0).getDouble(2) == 10.5)
    assert(df.schema == Sources.orderCsvSchema)
  }

  test("csv parses into the streaming pipeline shape") {
    val dir = Files.createTempDirectory("csvsrc2").toFile
    val f = new java.io.File(dir, "orders.csv")
    Files.writeString(f.toPath,
      """order_id,bid_time,price,item,supplier
        |o1,2024-01-01 00:00:01,10.5,widget,Alice
        |o1b,2024-01-01 00:00:04,4.5,widget,Alice
        |""".stripMargin)
    // CSV rows → the same tumbling agg the Kafka path uses (file
    // bootstrap ≡ stream replay, the S18 pattern at the source level)
    val parsed = Sources.csvOrders(spark, f.getAbsolutePath)
      .selectExpr("to_timestamp(bid_time, 'yyyy-MM-dd HH:mm:ss') AS bid_time",
        "price", "supplier")
    val stats = graft.operators.SupplierStats.tumble(
      parsed, $"bid_time", $"supplier", $"price")
    val r = stats.collect()(0)
    assert(r.getAs[Double]("total_price") == 15.0 && r.getAs[Long]("cnt") == 2L)
  }
}
