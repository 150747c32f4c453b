package graft
import org.apache.spark.sql.SparkSession

/** Measurement tooling (r18): dump whole-stage-codegen health for a
  * named query subset — for each WholeStageCodegen subtree, the
  * generated class's line count and whether janino ACCEPTS it (the
  * same compile the executor would attempt; a failure here is exactly
  * the silent interpreted-fallback the bench logs show as
  * InternalCompilerException). Tooling only — no driver contract.
  */
object ProbeCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE wraps stages lazily at execution, so the pre-execution
      // plan carries no WholeStageCodegen nodes to audit; runtime
      // codegen per stage is identical either way
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    val names =
      if (args.sameElements(Array("ALL"))) qs.keys.toSeq.sorted
      else args.toSeq
    names.foreach { name =>
      qs.get(name) match {
        case None => println(s"[codegen] UNKNOWN query: $name")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.executedPlan
            import org.apache.spark.sql.execution.WholeStageCodegenExec
            val stages = plan.collect {
              case w: WholeStageCodegenExec => w
            }
            // also walk inside AQE wrappers
            val aqe = plan.collect {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                a.executedPlan.collect { case w: WholeStageCodegenExec => w }
            }.flatten
            (stages ++ aqe).zipWithIndex.foreach { case (w, i) =>
              val (_, src) = w.doCodeGen()
              val code = src.body
              val nLines = code.count(_ == '\n')
              val status =
                try {
                  org.apache.spark.sql.catalyst.expressions.codegen
                    .CodeGenerator.compile(src)
                  "OK"
                } catch { case e: Throwable =>
                  "FAIL: " + e.getClass.getSimpleName + " " +
                    String.valueOf(e.getMessage).take(120)
                }
              val head = w.child.getClass.getSimpleName
              println(f"[codegen] $name%-22s stage#$i%-3d lines=$nLines%-6d root=$head%-28s $status")
              if (!status.startsWith("OK") || sys.env.contains("GRAFT_CODEGEN_DUMP_ALL")) {
                val p = s"/tmp/codegen_${name}_stage$i.java"
                java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
                  org.apache.spark.sql.catalyst.expressions.codegen
                    .CodeFormatter.format(src) + "\n\n/* PLAN:\n" +
                  w.treeString + "\n*/\n")
                println(s"[codegen]   dumped $p")
              }
            }
          } catch {
            case e: Throwable =>
              println(s"[codegen] $name ERROR building plan: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
