package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ml.LinUCB.{invertRowMajor, outerAccum, Feedback, Model}

/** A10/T9/T10: the streaming LinUCB trainer — the reference's
  * `KeyedProcessFunction` with `ValueState[A], ValueState[b]` and a
  * processing-time timer that inverts and emits once per 5 s per product
  * (`recsys-trainer/.../LinUCBUpdater.kt:28-131`) — as
  * `flatMapGroupsWithState` with `GroupState` + `ProcessingTimeTimeout`.
  *
  * State is flat `Array[Double]` (encoder-friendly; RocksDB/HDFS state
  * store serializes it without boxing). The update `A += x·xᵀ,
  * b += r·x` is identical to the batch-seed Aggregator's `reduce`, so
  * bootstrap-then-live (T13/S18) is: run [[graft.ml.LinUCB.seed]] over
  * history, hand its (A,b) in as `initialState`, continue streaming —
  * the semantic redesign of Flink's HybridSource documented in
  * SURVEY §7.3.
  */
object LinUCBStream {

  /** Keyed training state: A (d×d row-major, starts at I), b, count. */
  case class ArmState(d: Int, a: Array[Double], b: Array[Double], n: Long,
                      dirty: Boolean)

  object ArmState {
    def zero(d: Int): ArmState = {
      val a = new Array[Double](d * d)
      var i = 0
      while (i < d) { a(i * d + i) = 1.0; i += 1 }
      ArmState(d, a, new Array[Double](d), 0L, dirty = false)
    }

    def fromModelBuf(d: Int, a: Array[Double], b: Array[Double], n: Long): ArmState =
      ArmState(d, a.clone(), b.clone(), n, dirty = false)
  }

  /** The per-group state function. Emission policy mirrors the
    * reference's timer coalescing: models are NOT emitted per event but
    * once per `emitEveryMs` per arm (`LinUCBUpdater.kt:40,94-99`), and
    * only if the arm saw new data (`dirty`). With `emitEveryMs <= 0` it
    * emits on every invocation — the deterministic mode batch-vs-stream
    * tests use (timers depend on wall clock). */
  def updateArm(dim: Int, emitEveryMs: Long)(
      productId: String, events: Iterator[Feedback],
      state: GroupState[ArmState]): Iterator[Model] = {

    if (state.hasTimedOut) {
      val s = state.get
      state.setTimeoutDuration(emitEveryMs)
      if (s.dirty) {
        state.update(s.copy(dirty = false))
        Iterator.single(Model(productId, invertRowMajor(s.a, s.d), s.b.clone(), s.d, s.n))
      } else Iterator.empty
    } else {
      val s = state.getOption.getOrElse(ArmState.zero(dim))
      var n = s.n
      var saw = false
      events.foreach { f =>
        outerAccum(s.a, f.x)
        var i = 0
        while (i < dim) { s.b(i) += f.reward * f.x(i); i += 1 }
        n += 1
        saw = true
      }
      val dirty = s.dirty || saw
      if (emitEveryMs > 0) {
        state.update(ArmState(dim, s.a, s.b, n, dirty))
        if (!state.getOption.isDefined || !state.hasTimedOut)
          state.setTimeoutDuration(emitEveryMs)
        Iterator.empty
      } else {
        state.update(ArmState(dim, s.a, s.b, n, dirty = false))
        Iterator.single(Model(productId, invertRowMajor(s.a, s.d), s.b.clone(), s.d, n))
      }
    }
  }

  /** Wire the stateful trainer onto a feedback stream. Output mode for
    * the query must be Update (state-emitting operator). */
  def train(feedback: Dataset[Feedback], dim: Int,
            emitEveryMs: Long = 5000L): Dataset[Model] = {
    import feedback.sparkSession.implicits._
    val timeout =
      if (emitEveryMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    feedback.groupByKey(_.productId)
      .flatMapGroupsWithState[ArmState, Model](
        OutputMode.Update(), timeout)(updateArm(dim, emitEveryMs))
  }

  /** S18/T13: bootstrap-then-live. Flink's HybridSource (bounded file →
    * unbounded Kafka, `recsys-trainer/.../ParameterUpdateJob.kt:43-61`)
    * has no Structured Streaming equivalent — SS cannot switch sources
    * mid-query. The semantic redesign (SURVEY §7.3): run the batch seed
    * over history, hand each arm's accumulated (A, b, n) to the stateful
    * operator as INITIAL STATE, then stream live events into it. The
    * update algebra is identical on both sides, so
    * seed(history) ⊕ stream(live) ≡ seed(history ++ live) — asserted by
    * spec. */
  def trainWithBootstrap(history: Dataset[Feedback], live: Dataset[Feedback],
                         dim: Int, emitEveryMs: Long = 5000L): Dataset[Model] = {
    import live.sparkSession.implicits._
    val timeout =
      if (emitEveryMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val initial = history.groupByKey(_.productId)
      .agg(new graft.ml.LinUCB.RawAggregator(dim).toColumn.name("buf"))
      .map { case (pid, buf) =>
        (pid, ArmState.fromModelBuf(dim, buf.a, buf.b, buf.n))
      }
      .groupByKey(_._1).mapValues(_._2)
    live.groupByKey(_.productId)
      .flatMapGroupsWithState[ArmState, Model](
        OutputMode.Update(), timeout, initial)(updateArm(dim, emitEveryMs))
  }
}
