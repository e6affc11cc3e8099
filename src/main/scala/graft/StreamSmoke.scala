package graft

import graft.streaming.EventStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Streaming-tier smoke entry: feeds two micro-batches through the
  * windowed-count pipeline and prints the materialized windows —
  * a driveable surface for the streaming operators (the batch
  * operators' surface is Verify/Bench).
  */
object StreamSmoke {
  final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                      event_type: String, value: Double, props: String)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[Ev]
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("smoke_windows").outputMode("update").start()
    mem.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-01 10:02:00"), 1, "view", 2.0, "{}"),
      Ev(3, Timestamp.valueOf("2024-01-01 10:07:00"), 2, "buy", 5.0, "{}"))
    q.processAllAvailable()
    mem.addData(Ev(4, Timestamp.valueOf("2024-01-01 10:08:00"), 2, "buy", 7.0, "{}"))
    q.processAllAvailable()
    spark.table("smoke_windows").orderBy("win_start", "event_type")
      .collect().foreach(r => println(s"STREAM_WINDOW $r"))
    q.stop()
    spark.stop()
  }
}
