package graft.tools

/** Targeted idle re-measure: time the NAMED queries at an arbitrary
  * lake without the full bench battery around them — the tool behind
  * the PLANS.md adjudication entries (a flagged reading gets one quiet
  * re-measure through the same noop-sink timing ScaleBench uses).
  * Each query runs twice; both times print (first carries any cold
  * layer builds it needs, second is the steady-state number), along
  * with the HostMeter provenance of the whole pass.
  *
  * Usage: `runMain graft.tools.TimeOne <lakeDir> <q1,q2,...>`. */
object TimeOne {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeOne <lakeDir> <q1,q2,...>")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val meter0 = graft.HostMeter.mark()
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { n =>
      // a lake may lack optional tables — skip those, but let fatal
      // errors (OOM, linkage) abort rather than time a cold path
      try graft.Tables.read(spark, dir, n).foreach(_ => ())
      catch { case scala.util.control.NonFatal(_) => () }
    }
    names.foreach { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $q%-28s cold ${times.head}%8.2f s   warm ${times.last}%8.2f s   ($dir)")
    }
    println("[time] " + graft.HostMeter.provenanceJson(meter0, graft.HostMeter.mark()))
    spark.stop()
  }
}
