package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tables.loadEvents must tolerate every physical `ts` encoding the
  * testdata generator has shipped: TIMESTAMP(NANOS) — which Spark only
  * reads as a raw epoch-ns long under the legacy nanosAsLong conf — and
  * native TIMESTAMP(MICROS) (TimestampType or TimestampNTZType depending
  * on isAdjustedToUTC). Round 7 hard-assumed nanos and lost the entire
  * events/temporal surface when the testdata switched to micros; this
  * spec fabricates both encodings and pins that the loader's uniform
  * surface (`ts` TimestampType + exact whole-seconds BIGINT `ts_sec`)
  * is identical across them.
  */
/** Tiny events fixtures in both physical timestamp encodings the
  * testdata generator has shipped — shared by the loader spec and the
  * streaming spec so batch and streaming stay pinned to both. */
object EventFixtures {
  import TestSpark.spark.implicits._

  val rows = Seq(
    (1L, 1700000000L, 7L, "click", 1.5, """{"k":"a"}"""),
    (2L, 1700000123L, 7L, "view", 2.0, """{"k":"b"}"""),
    (3L, 1700086400L, 9L, "click", 0.5, """{"k":"c"}"""))

  /** Write an events dir whose ts column is a raw epoch-ns long — byte-wise
    * what the nanosAsLong reader produces from a TIMESTAMP(NANOS) file, and
    * exactly the LongType branch of the loader.
    */
  def writeNanosFixture(): String = {
    val dir = Files.createTempDirectory("events_nanos").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts") * lit(1000000000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Write an events dir with a native TimestampType (micros) ts column —
    * the current testdata generation.
    */
  def writeMicrosFixture(): String = {
    val dir = Files.createTempDirectory("events_micros").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_seconds(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
}

class EventsLoaderSpec extends SparkSpecBase {
  import EventFixtures.{writeMicrosFixture, writeNanosFixture}
  import TestSpark.spark.implicits._

  private def surface(dir: String): (Seq[(Long, Long, Long)], DataType) = {
    val df = Tables.loadEvents(spark, dir)
    val out = df.select($"event_id", $"ts_sec", unix_timestamp($"ts").as("ts_u"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    (out, df.schema("ts").dataType)
  }

  test("loadEvents yields identical ts/ts_sec for nanos-long and micros-timestamp encodings") {
    val (nanosOut, nanosTsType) = surface(writeNanosFixture())
    val (microsOut, microsTsType) = surface(writeMicrosFixture())
    assert(nanosTsType === TimestampType)
    assert(microsTsType === TimestampType)
    assert(nanosOut === microsOut)
    assert(nanosOut.map(r => (r._1, r._2)) ===
      Seq((1L, 1700000000L), (2L, 1700000123L), (3L, 1700086400L)))
  }

  test("loadEvents reads the live testdata regardless of its current ts encoding") {
    val df = Tables.loadEvents(spark, sf)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.schema("ts_sec").dataType === LongType)
    val n = df.filter($"ts_sec" === unix_timestamp($"ts")).count()
    assert(n === df.count() && n > 0)
  }
}
