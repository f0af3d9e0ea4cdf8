package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** S8: remote config/schema fetch — the reference loads transformation
  * mappings and the JSON schema from http(s) URLs or files
  * (etl/target/c3dc_etl.py:331-346 via
  * file_manager/c3dc_file_manager.py:210-225).
  *
  * Driver-side, plan-time IO for KB-scale configuration artifacts — data
  * never flows through here. http(s) uses the JDK HttpClient (30 s
  * timeout, redirects followed, non-2xx raises — mirroring
  * `requests.get(...).raise_for_status()`); every other location
  * (plain path, `file://`, `hdfs://`, `s3a://`) resolves through the
  * Hadoop FileSystem abstraction, which is also how the engine reaches
  * S3 for data (SURVEY §2.1 K7) — no bespoke S3 client. Bodies larger
  * than the reference's 8 MiB threshold
  * (c3dc_file_manager.py:245-246) log the same "shouldn't be doing
  * this for big files" warning.
  */
object FileFetcher {

  val WarnBytes: Long = 8L * 1024 * 1024

  private lazy val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  def fetchString(location: String): String =
    new String(fetchBytes(location), StandardCharsets.UTF_8)

  def fetchBytes(location: String): Array[Byte] = {
    val scheme = location.toLowerCase.takeWhile(_ != ':')
    val bytes =
      if (location.contains("://") && (scheme == "http" || scheme == "https")) {
        val req = HttpRequest.newBuilder(URI.create(location))
          .timeout(Duration.ofSeconds(30)).GET().build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofByteArray())
        if (resp.statusCode() < 200 || resp.statusCode() > 299)
          throw new RuntimeException(
            s"fetch of $location failed with HTTP ${resp.statusCode()}")
        resp.body()
      } else {
        val conf = SparkSession.getActiveSession
          .map(_.sparkContext.hadoopConfiguration)
          .getOrElse(new Configuration())
        val p = new Path(location)
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          out.toByteArray
        } finally in.close()
      }
    if (bytes.length > WarnBytes)
      System.err.println(
        s"[graft] WARN: fetched ${bytes.length} bytes from $location " +
          s"(> ${WarnBytes} threshold) — config fetch is for small artifacts")
    bytes
  }
}
