package graft.tools

/** Print the DuckDB oracle SQL for the named queries (all with no
  * args) — local iteration aid: pipe the output straight into duckdb
  * against the testdata parquet without running a full Verify dump. */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.oracleSql.keys.toSeq.sorted
    names.foreach { n =>
      graft.SparkEntry.oracleSql.get(n) match {
        case Some(sql) => println(s"-- ${n}\n$sql\n;")
        case None => System.err.println(s"no oracle for $n")
      }
    }
  }
}
