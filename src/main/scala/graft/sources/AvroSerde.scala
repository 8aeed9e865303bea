package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Avro wire serde for the orders stream (S9/S12): the reference
  * produces/consumes Avro `Order` records
  * (`orders-avro-clients/src/main/avro/Order.avsc:5-11`) through a
  * Schema Registry. The spark-avro connector isn't on this classpath,
  * but avro-core is — so the engine carries the serde itself:
  * per-partition datum reader/writer over binary Avro (the registry's
  * 5-byte header is transport framing, stripped/added by the Kafka
  * layer, not part of record encoding).
  *
  * Shape note: `mapPartitions` with one reader per partition, not a
  * per-row UDF — reader construction amortizes across the batch, the
  * same pattern as the decode stub in `Multimodal`.
  */
object AvroSerde {

  /** Mirror of the reference's Order.avsc. */
  val orderSchemaJson: String =
    """{"type":"record","name":"Order","namespace":"demo","fields":[
      |{"name":"order_id","type":"string"},
      |{"name":"bid_time","type":"string"},
      |{"name":"price","type":"double"},
      |{"name":"item","type":"string"},
      |{"name":"supplier","type":"string"}]}""".stripMargin

  case class OrderRow(order_id: String, bid_time: String, price: Double,
                      item: String, supplier: String)

  /** Encode typed rows to binary Avro payloads. */
  def encodeOrders(ds: Dataset[OrderRow]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(orderSchemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      rows.map { r =>
        val rec = new GenericData.Record(schema)
        rec.put("order_id", r.order_id)
        rec.put("bid_time", r.bid_time)
        rec.put("price", r.price)
        rec.put("item", r.item)
        rec.put("supplier", r.supplier)
        val bos = new ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(bos, null)
        writer.write(rec, enc)
        enc.flush()
        (r.order_id, bos.toByteArray)
      }
    }.toDF("key", "value")
  }

  /** Decode binary Avro payloads back to typed rows (the from_avro
    * analog). */
  def decodeOrders(df: DataFrame, valueCol: String = "value"): Dataset[OrderRow] = {
    import df.sparkSession.implicits._
    df.select(col(valueCol)).as[Array[Byte]].mapPartitions { payloads =>
      val schema = new Schema.Parser().parse(orderSchemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      payloads.map { bytes =>
        val dec = DecoderFactory.get().binaryDecoder(bytes, null)
        val rec = reader.read(null, dec)
        OrderRow(
          rec.get("order_id").toString,
          rec.get("bid_time").toString,
          rec.get("price").asInstanceOf[Double],
          rec.get("item").toString,
          rec.get("supplier").toString)
      }
    }
  }
}
