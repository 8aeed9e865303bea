package graft.sources

import graft.SparkSpec
import graft.sources.AvroSerde.OrderRow

class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    OrderRow("o1", "2024-01-01 00:00:01", 10.50, "widget", "Alice"),
    OrderRow("o2", "2024-01-01 00:00:02", 7.25, "gadget", "Bob"),
    OrderRow("o3", "2024-01-01 00:00:03", 0.0, "", "Carol"))

  test("binary Avro round-trips the order stream exactly") {
    val encoded = AvroSerde.encodeOrders(rows.toDS())
    assert(encoded.columns.toSeq == Seq("key", "value")) // Kafka wire shape
    val back = AvroSerde.decodeOrders(encoded).collect().sortBy(_.order_id).toSeq
    assert(back == rows)
  }

  test("avro payloads feed the same stats pipeline as JSON") {
    import org.apache.spark.sql.functions._
    val decoded = AvroSerde.decodeOrders(AvroSerde.encodeOrders(rows.toDS())).toDF()
      .withColumn("bid_time", to_timestamp(col("bid_time"), "yyyy-MM-dd HH:mm:ss"))
    val stats = graft.operators.SupplierStats.tumble(
      decoded, col("bid_time"), col("supplier"), col("price"))
    assert(stats.count() == 3) // one window-supplier row per order here
    val total = stats.agg(sum("total_price")).collect()(0).getDouble(0)
    assert(total == 17.75)
  }

  test("registry-framed Avro round-trips: magic + big-endian schema id + body") {
    val framed = AvroSerde.encodeOrdersFramed(rows.toDS())
    // wire shape: every payload starts with the 5-byte Confluent header
    val payloads = framed.select("value").collect().map(_.getAs[Array[Byte]](0))
    assert(payloads.forall(p => p.length > 5 && p(0) == AvroSerde.WireMagic))
    assert(payloads.forall { p =>
      val id = ((p(1) & 0xff) << 24) | ((p(2) & 0xff) << 16) |
        ((p(3) & 0xff) << 8) | (p(4) & 0xff)
      id == AvroSerde.OrderSchemaId
    })
    // the framed body IS the bare encoding plus the header - nothing else
    val bare = AvroSerde.encodeOrders(rows.toDS())
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    framed.collect().foreach { r =>
      val p = r.getAs[Array[Byte]](1)
      assert(p.drop(5).sameElements(bare(r.getString(0))))
    }
    val back = AvroSerde.decodeOrdersFramed(framed).collect().sortBy(_.order_id).toSeq
    assert(back == rows)
  }

  test("framed decode rejects unframed payloads and unknown schema ids") {
    val bare = AvroSerde.encodeOrders(rows.toDS())
    intercept[org.apache.spark.SparkException] {
      AvroSerde.decodeOrdersFramed(bare).collect() // magic byte won't match
    }
    val wrongId = AvroSerde.encodeOrdersFramed(rows.toDS(), schemaId = 99)
    intercept[org.apache.spark.SparkException] {
      AvroSerde.decodeOrdersFramed(wrongId).collect() // id 99 not registered
    }
    // but a registry that KNOWS id 99 resolves it fine
    val reg = AvroSerde.SchemaRegistryStub(Map(99 -> AvroSerde.orderSchemaJson))
    assert(AvroSerde.decodeOrdersFramed(wrongId, reg).count() == 3)
  }

  test("framed Avro feeds the stats pipeline through the stream entry point") {
    val parsed = graft.streaming.SupplierStatsStream.parseAvroFramedOrders(
      AvroSerde.encodeOrdersFramed(rows.toDS()))
    assert(parsed.columns.toSeq ==
      Seq("order_id", "bid_time", "price", "item", "supplier"))
    import org.apache.spark.sql.functions._
    val stats = graft.operators.SupplierStats.tumble(
      parsed, col("bid_time"), col("supplier"), col("price"))
    assert(stats.agg(sum("total_price")).collect()(0).getDouble(0) == 17.75)
  }
}
