package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: run one SparkEntry query by name against a testdata dir,
  * print row count + wall time per repetition (first rep = cold plan,
  * later reps = warm), and optionally the formatted physical plan.
  *
  *   sbt "runMain graft.RunQuery q21_jaccard_pairs /root/testdata/sf0.1 3 explain"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm:<dir> replicates Bench's warm-up-at-small-sf pattern
    args.find(_.startsWith("warm:")).foreach { w =>
      val t0 = System.nanoTime()
      fn(spark, w.stripPrefix("warm:")).count()
      println(f"[runquery] $name warmup: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[runquery] $name rep$i: $n rows, ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
