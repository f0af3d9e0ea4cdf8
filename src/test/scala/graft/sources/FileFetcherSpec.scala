package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.HttpServer

import graft.SparkTestBase
import graft.model.SchemaLoader

/** S8 remote config/schema fetch against a local HTTP fixture: happy-path
  * GET through the schema loader, non-2xx raising, file:// and plain-path
  * parity through the Hadoop FS branch.
  */
class FileFetcherSpec extends SparkTestBase {

  private val schemaJson =
    """{ "$defs": { "participant": {
      |    "type": "object",
      |    "properties": { "participant_id": { "type": "string" } },
      |    "required": ["participant_id"] } } }""".stripMargin

  private def withServer(test: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schema.json", exchange => {
      val body = schemaJson.getBytes("UTF-8")
      exchange.sendResponseHeaders(200, body.length)
      exchange.getResponseBody.write(body)
      exchange.close()
    })
    server.createContext("/missing.json", exchange => {
      exchange.sendResponseHeaders(404, -1)
      exchange.close()
    })
    server.start()
    try test(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("http fetch: schema loads from a URL") {
    withServer { port =>
      val schema = SchemaLoader.fromFile(s"http://127.0.0.1:$port/schema.json")
      assert(schema.nodes.keySet == Set("participant"))
      assert(schema.nodes("participant").props.map(_.name) == Seq("participant_id"))
    }
  }

  test("http fetch: non-2xx raises") {
    withServer { port =>
      val e = intercept[RuntimeException] {
        FileFetcher.fetchString(s"http://127.0.0.1:$port/missing.json")
      }
      assert(e.getMessage.contains("404"))
    }
  }

  test("file:// URL and plain path resolve through the filesystem branch") {
    val f = java.nio.file.Files.createTempFile("fetch", ".json")
    java.nio.file.Files.write(f, schemaJson.getBytes("UTF-8"))
    assert(FileFetcher.fetchString(f.toString) == schemaJson)
    assert(FileFetcher.fetchString(f.toUri.toString) == schemaJson)
    java.nio.file.Files.delete(f)
  }
}
