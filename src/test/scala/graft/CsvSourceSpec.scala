package graft

import java.nio.file.Files

import graft.sources.CsvSource

/** S3/S4 CSV scans: seed-url extraction with quote handling + https
  * filter, id artifacts, and the broadcast semi-join id selection. */
class CsvSourceSpec extends SparkSuite {

  test("seedUrls reads quoted csv, keeps https only, dedups (S4)") {
    val s = initSpark()
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/seeds.csv"),
      """url,label
        |https://a.example.org/1,"first, quoted"
        |http://insecure.example.org/2,plain
        |https://a.example.org/1,dup
        |https://b.example.org/3,ok
        |""".stripMargin)
    val got = CsvSource.seedUrls(s, s"$dir/seeds.csv")
      .collect().map(_.getString(0)).sorted
    assert(got === Array("https://a.example.org/1",
      "https://b.example.org/3"))
  }

  test("idArtifact + selectByIds is a broadcast semi-join (S3/S1)") {
    val s = initSpark()
    import s.implicits._
    val dir = Files.createTempDirectory("graft_ids").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/batch_ids.csv"),
      "d2\nd4\n")
    val ids = CsvSource.idArtifact(s, s"$dir/batch_ids.csv")
    val table = Seq(("d1", 1), ("d2", 2), ("d3", 3), ("d4", 4))
      .toDF("document_id", "v")
    val picked = CsvSource.selectByIds(table, ids, "document_id")
    assert(picked.collect().map(_.getString(0)).sorted ===
      Array("d2", "d4"))
    val plan = picked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftSemi"), s"expected broadcast semi join:\n$plan")
  }
}
