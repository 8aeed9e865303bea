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
}
