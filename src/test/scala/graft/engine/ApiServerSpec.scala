package graft.engine

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-trips the reference's `POST /api/translate` endpoint
  * (`api.py:43-45`) over the real socket: rule in, Result JSON out,
  * validation failure → 422 pydantic envelope, wrong method → 405.
  */
class ApiServerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def post(uri: String, body: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(uri))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /api/translate: rule in, script + warnings out; 422 on invalid; 405 on GET") {
    val server = ApiServer.start(spark, port = 0, configure = { e =>
      e.registerSource("cerner", "p", Seq((1L, 1980)).toDF("id", "y"))
    })
    try {
      val base = s"http://localhost:${server.getAddress.getPort}/api/translate"
      // same JSON body the reference endpoint takes (JSON is valid YAML)
      val rule = """{"name": "person",
        |"primary_key": {"name": "person_id",
        |  "sources": {"p_pk": {"table": "p", "columns": {"id": "bigint"}}}},
        |"columns": [
        |  {"name": "year_of_birth", "tables": ["p"], "expression": "p.y"}]}""".stripMargin
      val ok = post(s"$base?name=person", rule)
      assert(ok.statusCode() == 200)
      assert(ok.headers().firstValue("Content-Type").orElse("") == "application/json")
      assert(ok.body().contains("\"script\":"))
      assert(ok.body().contains("person: spine_select"))
      assert(ok.body().contains("person: column_update"))
      // structured warnings in the pydantic envelope shape
      assert(ok.body().contains("\"loc\":[\"body\",\"columns\"]"))
      assert(ok.body().contains("Column \\\"gender_concept_id\\\" is not defined"))
      assert(ok.body().contains("\"type\":\"value_error\""))

      // a document that is valid YAML but not a target table → 422
      val bad = post(base, """{"scripts": ["not a table rule"]}""")
      assert(bad.statusCode() == 422)
      assert(bad.body().contains("\"detail\""))
      assert(bad.body().contains("\"type\":\"value_error\""))

      // non-POST → 405
      val get = HttpClient.newHttpClient().send(
        HttpRequest.newBuilder(URI.create(base)).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405)
    } finally server.stop(0)
  }

  test("binds loopback by default — not the wildcard address") {
    val server = ApiServer.start(spark, port = 0)
    try {
      assert(server.getAddress.getAddress.isLoopbackAddress)
      assert(!server.getAddress.getAddress.isAnyLocalAddress)
    } finally server.stop(0)
  }

  test("oversized request body -> 413 before translation runs") {
    val server = ApiServer.start(spark, port = 0)
    try {
      val base = s"http://localhost:${server.getAddress.getPort}/api/translate"
      // HttpClient sends an accurate Content-Length for ofString, so a
      // body one byte over the cap exercises the pre-read rejection.
      // Bounded retry on IOException: rejecting an upload mid-send is
      // inherently racy at the TCP level (the server drains with a
      // liveness deadline; if box load stalls the send past it, the
      // close resets the connection before the client reads the 413 —
      // com.sun.net.httpserver exposes no lingering-close). One clean
      // response proves the contract; three consecutive resets fail.
      val r = Iterator.range(0, 3).map { i =>
        try Some(post(base, "x" * (ApiServer.MaxBodyBytes.toInt + 1)))
        catch { case _: java.io.IOException if i < 2 => Thread.sleep(200); None }
      }.collectFirst { case Some(resp) => resp }.get
      assert(r.statusCode() == 413)
      assert(r.body().contains("exceeds"))
    } finally server.stop(0)
  }
}
