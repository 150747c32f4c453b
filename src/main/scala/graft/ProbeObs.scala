package graft
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe: does an eager localCheckpoint fire Observation
  * metrics (i.e. can an iterative frontier's row count ride the
  * checkpoint job instead of a separate count() action)?
  */
object ProbeObs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val obs = Observation("rc")
    val df = spark.range(1000).toDF("id")
      .withColumn("b", col("id") % 7)
      .groupBy("b").agg(count(lit(1)).as("c"))
      .observe(obs, count(lit(1)).as("n"), sum(col("c")).as("s"))
    val cp = df.localCheckpoint(eager = true)
    // bounded wait: get blocks forever if the metrics never fire
    val fut = scala.concurrent.Future(obs.get)(
      scala.concurrent.ExecutionContext.global)
    val got = try scala.concurrent.Await.result(fut,
        scala.concurrent.duration.Duration("5s")).toString
      catch { case _: java.util.concurrent.TimeoutException => "TIMEOUT" }
    println(s"[probeobs] metrics after eager localCheckpoint: $got")
    println(s"[probeobs] cp rows = ${cp.count()}")
    spark.stop()
  }
}
