package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.DataServer

/** S6 contract (the reference R2 worker, examples/basic/worker/index.ts:26-52):
  * routed GET serves the exact parquet bytes with the content-type / etag /
  * cache-control header trio, unknown paths 404, and If-None-Match
  * revalidates to 304 — then the served bytes round-trip through a real
  * Spark parquet read.
  */
class DataServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("routed GET serves exact bytes with the R2 worker's header contract") {
    val dir = Files.createTempDirectory("graft_dataserver")
    val pq = dir.resolve("pts.parquet")
    spark.range(1000).selectExpr("id", "id * 2 AS v")
      .coalesce(1).write.mode("overwrite").parquet(dir.resolve("out").toString)
    val part = Files.list(dir.resolve("out")).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    Files.copy(part, pq)

    val srv = DataServer.start(Map("/data/pts.parquet" -> pq.toString))
    try {
      val client = HttpClient.newHttpClient()
      val base = s"http://127.0.0.1:${srv.port}"

      val ok = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/data/pts.parquet")).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(ok.statusCode() == 200)
      assert(ok.headers().firstValue("content-type").get() == "application/vnd.apache.parquet")
      assert(ok.headers().firstValue("cache-control").get() == "public, max-age=86400")
      val etag = ok.headers().firstValue("etag").get()
      assert(etag.startsWith("\"") && etag.endsWith("\""))
      assert(ok.body().toSeq == Files.readAllBytes(pq).toSeq, "served bytes identical")

      // revalidation: etag hit → 304, no body
      val cached = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/data/pts.parquet"))
          .header("If-None-Match", etag).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(cached.statusCode() == 304 && cached.body().isEmpty)

      // unknown route → 404 (worker fallthrough)
      val miss = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/data/other.parquet")).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(miss.statusCode() == 404)

      // end-to-end: the served bytes are a readable parquet dataset
      val dl = Files.createTempFile("graft_served", ".parquet")
      Files.write(dl, ok.body())
      val back = spark.read.parquet(dl.toString)
      assert(back.count() == 1000)
      assert(back.agg(sum(col("v"))).collect()(0).getLong(0) == 999L * 1000L)
    } finally srv.stop()
  }
}
