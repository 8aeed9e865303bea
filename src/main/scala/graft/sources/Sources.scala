package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** File sources (SURVEY §2.1 S1/S17).
  *
  * The reference reads CSVs two ways: a plain DictReader scan
  * (`cdc-local/src/utils.py:113-119`) and a hand-rolled Flink
  * FileSource format that skips the header and silently drops
  * malformed lines (`recsys-trainer/.../FileSourceFactory.kt:30-107`).
  * Spark's csv reader covers both: explicit schema (never inferred),
  * `header=true`, `mode=DROPMALFORMED`. The same reader binds to
  * `readStream` for the streaming analog (bounded directory → file
  * stream).
  */
object Sources {

  /** Wire schema of the order stream in CSV form (the reference's
    * training-log pattern: typed columns, header row, bad lines
    * dropped). */
  val orderCsvSchema: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("bid_time", StringType),
    StructField("price", DoubleType),
    StructField("item", StringType),
    StructField("supplier", StringType)))

  def csvOrders(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(orderCsvSchema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)

  /** Streaming variant over a directory (file-arrival micro-batches). */
  def csvOrdersStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(orderCsvSchema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(dir)

  // --- Additional columnar/text formats ---
  // The engine is format-agnostic past the DataFrameReader boundary:
  // the same plans run over parquet (default), ORC (the other columnar
  // format with predicate pushdown + column pruning), and JSON-lines
  // (schema'd, PERMISSIVE/DROPMALFORMED like the CSV path). These two
  // helpers pin that contract so a lake migration is a reader swap.

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** The reference's supplier alternation, verbatim
    * (`orders-json-clients/.../ProducerApp.kt:51` `faker.regexify`). */
  val SupplierPattern =
    "(Alice|Bob|Carol|Dave|Eve|Frank|Grace|Heidi)"

  /** F6/F11 as ENGINE operators: the reference's producer synthesizes
    * each order with `UUID.randomUUID()` + `faker.regexify` from global
    * RNGs (`ProducerApp.kt:47-53`) — irreproducible by design. The
    * engine's twin derives both from a content seed, so a synthetic
    * stream regenerates bit-identically on any run/partitioning/replay
    * (spec-asserted); downstream joins on the generated keys are
    * therefore stable. Map-only, codegen'd, no RNG state anywhere. */
  def syntheticOrders(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.Tables.events(spark, sfDir).select(
      col("event_id"),
      graft.functions.seededUuid(xxhash64(col("event_id"), lit("oid")))
        .as("order_id"),
      graft.functions.regexGen(SupplierPattern,
        xxhash64(col("event_id"), lit("sup"))).as("supplier"),
      round(col("value"), 2).as("price"))
  }
}
