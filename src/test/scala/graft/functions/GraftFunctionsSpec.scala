package graft.functions

import graft.ingest.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("registerAll exposes the scalar suite to spark.sql") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      """SELECT
        |  graft_slugify('Héllo, World!') AS slug,
        |  graft_simhash(array('a', 'b')) AS sh,
        |  graft_minhash(array('a', 'b', 'c', 'd'), 4, 3)[0] AS mh0,
        |  graft_upload_filename('h', 'n', '.pdf', 'p') AS key,
        |  graft_content_type(CAST('x' AS BINARY), 'http://a/b.pdf', '') AS ct
        |""".stripMargin).head()
    assert(r.getAs[String]("slug") === "hello-world")
    assert(r.getAs[Long]("sh") === DedupFunctions.simhash64(Seq("a", "b")))
    assert(r.getAs[Long]("mh0") ===
      DedupFunctions.minhashSigFast(Seq("a", "b", "c", "d"), 4, 3)(0))
    assert(r.getAs[String]("key") === "p/n_h.pdf")
    assert(r.getAs[String]("ct") === "application/pdf")
  }
}
