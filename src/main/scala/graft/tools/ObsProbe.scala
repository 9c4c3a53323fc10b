package graft.tools

import org.apache.spark.sql.functions._

/** Scratch probe: does org.apache.spark.sql.Observation deliver its
  * metrics when the observing action is an EAGER localCheckpoint?
  * (Decides whether the CC loop can fuse its convergence count into
  * the round's one materializing job.) Dev tool. */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local("obs-probe", cpusDefault = "4")
    import spark.implicits._
    val df = (1 to 1000).toDF("x")
      .withColumn("y", col("x") % 7)
    val obs = org.apache.spark.sql.Observation("probe")
    val pinned = df.observe(obs, count(when(col("y") === 0, 1)).as("c"))
      .localCheckpoint()
    println("[obs] checkpointed; blocking get with 10s watchdog ...")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val m = try Some(Await.result(Future(obs.get), 10.seconds))
      catch { case _: java.util.concurrent.TimeoutException => None }
    println(s"[obs] metrics=$m rows=${pinned.count()}")
    spark.stop()
  }
}
