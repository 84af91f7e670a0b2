package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** T6: checkpointed exactly-once file sink — stop a query mid-stream,
  * restart from the same checkpoint, and confirm no rows are lost or
  * duplicated (reference `KafkaKpiPipeline.scala:191,296` semantics). */
class CheckpointSpec extends SparkSpec {
  import spark.implicits._

  test("parquet sink resumes from checkpoint without loss or duplication") {
    val dir = Files.createTempDirectory("graft_ckpt_").toFile.getAbsolutePath
    val out = s"$dir/out"
    val ckpt = s"$dir/ckpt"
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[(Long, Double)]
    def start() = mem.toDF().toDF("id", "v")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    val q1 = start()
    mem.addData((1L, 1.0), (2L, 2.0))
    q1.processAllAvailable()
    q1.stop()

    // second incarnation, same checkpoint: must pick up exactly where the
    // first left off
    val q2 = start()
    mem.addData((3L, 3.0))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(out).select("id").as[Long].collect().sorted
    assert(rows.toSeq == Seq(1L, 2L, 3L), s"got ${rows.toSeq}")
  }
}
