package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class StreamingOpsSpec extends SparkSpec {

  import spark.implicits._
  import StreamingOps._

  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val base = Timestamp.valueOf("2024-01-01 10:00:00")
  private def ts(minute: Int): Timestamp = new Timestamp(base.getTime + minute * 60000L)

  test("streaming hourlyTypeCounts matches the batch computation") {
    val events = Seq(
      Event(1, ts(0), 1, "view", 1.0),
      Event(2, ts(10), 1, "view", 2.0),
      Event(3, ts(70), 2, "purchase", 3.5))
    val mem = MemoryStream[Event]
    mem.addData(events: _*)
    val q = hourlyTypeCounts(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("hourly").outputMode(OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hourly").collect()
        .map(r => (r.getAs[Long]("hour_us"), r.getAs[String]("event_type")) ->
          (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
      assert(rows.values.map(_._1).sum == 3)
      assert(rows.exists { case ((_, t), (n, v)) => t == "view" && n == 2 && v == 3.0 })
      assert(rows.exists { case ((_, t), (n, v)) => t == "purchase" && n == 1 && v == 3.5 })
    } finally q.stop()
  }

  test("streaming sessionize closes sessions on 30-min gaps across batches") {
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions").outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two events 10 min apart (one open session)
      mem.addData(Event(1, ts(0), 7, "view", 1.0), Event(2, ts(10), 7, "view", 2.0))
      q.processAllAvailable()
      // batch 2: event 60 min later → closes first session, opens second
      mem.addData(Event(3, ts(70), 7, "purchase", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sessions").as[SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7)
      assert(closed.head.n_events == 2)
      assert(closed.head.session_value == 3.0)
    } finally q.stop()
  }
}
