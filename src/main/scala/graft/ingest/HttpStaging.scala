package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path}
import java.time.Duration

/** The reference's extract step (`requests.get(OWID_URL, timeout=60)` +
  * `raise_for_status()`, `/root/reference/etl_pipeline.py:28-31,51-52`)
  * as a driver-side staging fetch: one GET, 60 s timeout, fail on any
  * non-2xx, body written to a local staging file that
  * [[WideCsvIngest.readWideCsv]] then reads.
  *
  * Deliberately driver-side (SURVEY §2.1 S1): the upstream is a single
  * CSV document, so there is nothing to parallelize — executors enter
  * the picture at the parse/transform stage, not the fetch. At 100 TB
  * the equivalent stage is a distributed object-store scan, which is
  * `spark.read` itself, not HTTP.
  */
object HttpStaging {

  /** GET `url` into `stagingPath` (parents created). Returns the path.
    * Throws [[java.io.IOException]] on non-2xx (the staged partial body
    * is removed) — the reference's `raise_for_status` parity. */
  def fetchToStaging(url: String, stagingPath: String, timeoutSeconds: Long = 60): String = {
    val target = Path.of(stagingPath)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSeconds))
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val request = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofSeconds(timeoutSeconds))
      .GET()
      .build()
    // TRUNCATE_EXISTING: a re-fetch over an existing staging file must
    // not leave the old body's tail when the new one is shorter
    val response = client.send(request, HttpResponse.BodyHandlers.ofFile(target,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    if (response.statusCode() / 100 != 2) {
      Files.deleteIfExists(target)
      throw new java.io.IOException(
        s"GET $url failed: HTTP ${response.statusCode()}")
    }
    stagingPath
  }
}
