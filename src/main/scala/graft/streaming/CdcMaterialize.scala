package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Cdc

/** Streaming materialized view over a CDC changelog: the stateful upsert
  * that turns a Debezium-style c/u/d stream into the current table
  * image — the consumer the reference's CDC pipeline stops short of
  * (`cdc-local/ps_sub.py:36-43` just prints the envelope payloads).
  *
  * Per key, `GroupState` holds the max-lsn image seen so far; each
  * micro-batch emits the key's refreshed row (or a tombstone flag when
  * the latest op is a delete), so a `foreachBatch` upsert sink keeps an
  * exact replica of the captured table. Out-of-order delivery within
  * and across batches is absorbed by the lsn comparison — replaying the
  * log in any order converges to the same view (idempotent upsert, the
  * same property the reference leans on for its Redis SET sink,
  * `recsys-trainer/.../RedisSink.kt:10-12`).
  *
  * State scale: one (lsn, image) entry per live key — the size of the
  * captured table, not of the changelog; partitioned by key hash, so it
  * shards across executors like any keyed aggregation.
  */
object CdcMaterialize {

  /** Latest-image state per key. `deleted` marks a tombstone (the key's
    * newest op is 'd'); the image fields carry the newest non-null
    * payload. Flat case class — encoder-friendly state. */
  case class RowImage(key: String, lsn: Long, deleted: Boolean,
                      orderId: Long, lineNo: Int,
                      partId: Option[Long], quantity: Option[Double],
                      price: Option[Double])

  /** Typed change record (public: encoder codegen needs to reach the
    * class from generated code). */
  case class Change(key: String, lsn: Long, op: String,
                    order_id: Long, line_no: Int,
                    part_id: Option[Long], quantity: Option[Double],
                    price: Option[Double])

  /** Decode the wire envelope into the typed change record (same schema
    * as the batch path, [[Cdc.lineitemEnvelopeSchema]]). */
  def decode(wire: DataFrame): DataFrame =
    wire.select(from_json(col("value"), Cdc.lineitemEnvelopeSchema).as("p"))
      .select(
        concat_ws("-", col("p.order_id"), col("p.line_no")).as("key"),
        col("p.lsn"), col("p.op"), col("p.order_id"), col("p.line_no"),
        col("p.part_id"), col("p.quantity"), col("p.price"))

  /** The upsert view: one output row per key per micro-batch in which
    * that key changed, carrying the key's CURRENT image (post-batch).
    * Downstream: `foreachBatch { b => view.upsert(b) }` where a
    * `deleted=true` row removes the key. */
  def upsertView(changes: DataFrame): Dataset[RowImage] = {
    implicit val changeEnc = Encoders.product[Change]
    implicit val imageEnc = Encoders.product[RowImage]
    implicit val keyEnc = Encoders.STRING
    changes.as[Change]
      .groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[Change], state: GroupState[RowImage]) =>
          // newest change in this batch by lsn; compare against held state
          val top = batch.maxBy(_.lsn)
          val cur = state.getOption
          if (cur.exists(_.lsn >= top.lsn)) cur.get
          else {
            val next = RowImage(key, top.lsn, top.op == "d",
              top.order_id, top.line_no, top.part_id, top.quantity, top.price)
            state.update(next)
            next
          }
      }
  }

  /** Output mode for [[upsertView]]: mapGroupsWithState requires
    * Update — each emitted row replaces the key's previous image. */
  val outputMode: OutputMode = OutputMode.Update()
}
