package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CDC envelope semantics beyond the oracle round-trips (q16/q46):
  * wire-level robustness and delete-rewrite invariants. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("malformed envelope bytes surface as null payloads, never crash the unwrap") {
    val wire = Seq(
      """{"order_id":1,"order_status":"O","total_price":10.5,"order_date":"1995-01-01 00:00:00","op":"c","db":"demo","table":"orders","lsn":1}""",
      """not json at all""",
      """{"order_id":"wrong-type"}""",
      """{"order_id":2,"op":"u","lsn":2}""").toDF("value")
    val out = wire
      .select(from_json($"value", Cdc.ordersEnvelopeSchema).as("payload"))
      .select($"payload.order_id", $"payload.op")
      .collect()
    assert(out.length == 4, "row count preserved")
    assert(out.count(_.isNullAt(0)) == 2, "two undecodable order_ids")
    // partial envelopes keep the fields they carry
    assert(out.exists(r => !r.isNullAt(0) && r.getLong(0) == 2L && r.getString(1) == "u"))
  }

  test("delete rewrite nulls the payload but keeps key and lsn") {
    val env = Cdc.lineitemEnvelope(spark, sf())
      .select(from_json($"value", Cdc.lineitemEnvelopeSchema).as("p"))
      .select($"p.*").cache()
    val deletes = env.filter($"op" === "d")
    assert(deletes.count() > 0)
    assert(deletes.filter($"part_id".isNotNull || $"quantity".isNotNull ||
      $"price".isNotNull).count() == 0, "delete payload must be nulled")
    assert(deletes.filter($"order_id".isNull || $"lsn".isNull ||
      $"__deleted" =!= "true").count() == 0, "delete keeps key, lsn, marker")
    // non-deletes carry full payload
    assert(env.filter($"op" =!= "d" && $"part_id".isNull).count() == 0)
  }
}
