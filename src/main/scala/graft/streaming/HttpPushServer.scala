package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's exact wire entrance, loopback-runnable: an HTTP front
  * door accepting `POST /{stream-name}` whose body is base64-wrapped into a
  * delivery record — what the API Gateway REST resource + VTL mapping
  * template do before handing to Firehose
  * (cdk_datalake_mvp/cdk_datalake_mvp_stack.py:273-316: `"Data":
  * "$util.base64Encode($input.body)"`, stream name from the path).
  *
  * Architecture mirrors the reference's buffering split, Spark-first:
  * the server SPOOLS (one base64 line per record, atomic tmp+rename into
  * `<spoolDir>/<stream>/`), and [[EnvelopeSources.textLineStream]] — the
  * 60 s / 64 MB buffered reader — plays Firehose, admitting the spool into
  * bounded micro-batches on the same envelope decode path as every other
  * adapter. Durable and replayable (unlike the socket adapter): records
  * are on disk before the 200 returns, and the file source's offsets make
  * re-reads exact.
  *
  * JDK-only (`com.sun.net.httpserver`), no added dependency. A dev/demo
  * front door like [[EnvelopeSources.fromSocket]]; the production entrance
  * stays Kafka ([[EnvelopeSources.fromKafka]]) — a single JVM endpoint is
  * not a 100 TB ingress, but the envelope contract downstream of it is
  * identical, which is the semantic the reference defines.
  *
  * Response mirrors the PutRecord surface: 200 + `{"recordId": "..."}`;
  * non-POST → 405; missing/nested stream path → 404.
  */
final class HttpPushServer(spoolDir: String) {
  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  // Seed past any record already on disk: a fresh instance over an existing
  // spool must NOT restart at 1 — rec-N.txt collisions would atomically
  // REPLACE spooled records, and a file-source checkpoint that has already
  // seen the path would never re-read it (silent data loss behind a 200).
  private val seq = new AtomicLong(maxSpooledSeq())

  private def maxSpooledSeq(): Long = {
    val root = Paths.get(spoolDir).toFile
    val streams = Option(root.listFiles()).getOrElse(Array.empty)
    val recs = streams.filter(_.isDirectory)
      .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty))
    val Rec = "rec-(\\d+)\\.txt".r
    recs.map(_.getName).collect { case Rec(n) => n.toLong }
      .foldLeft(0L)(math.max)
  }

  server.createContext("/", (ex: HttpExchange) => {
    try handle(ex)
    catch {
      // Spool I/O failure (disk full, permissions): the client must see a
      // 5xx it can retry on, not a reset connection.
      case _: Exception =>
        try respond(ex, 500, """{"message":"internal error"}""")
        catch { case _: Exception => () }
    }
    finally ex.close()
  })

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
  }

  private def handle(ex: HttpExchange): Unit = {
    if (ex.getRequestMethod != "POST")
      return respond(ex, 405, """{"message":"POST only"}""")
    val stream = ex.getRequestURI.getPath.stripPrefix("/")
    if (stream.isEmpty || stream.contains("/") || stream.contains(".."))
      return respond(ex, 404,
        """{"message":"expected POST /{stream-name}"}""")
    val body = ex.getRequestBody.readAllBytes()
    // the VTL wrap, verbatim: the record's data IS base64 of the raw body
    val data = java.util.Base64.getEncoder.encodeToString(body)
    val n = seq.incrementAndGet()
    val dir = Paths.get(spoolDir, stream)
    Files.createDirectories(dir)
    // one record per file, written tmp-then-rename so the streaming reader
    // can never observe a torn line; the dot prefix keeps the tmp name out
    // of the file source's glob until the atomic move publishes it
    val tmp = dir.resolve(s".rec-$n.tmp")
    try {
      Files.write(tmp, (data + "\n").getBytes(UTF_8))
      Files.move(tmp, dir.resolve(s"rec-$n.txt"),
        StandardCopyOption.ATOMIC_MOVE)
    } catch {
      case e: Exception =>
        // don't leave a half-written tmp behind — the dot prefix hides it
        // from the glob, so it would otherwise linger invisibly forever
        try Files.deleteIfExists(tmp) catch { case _: Exception => () }
        throw e
    }
    respond(ex, 200, s"""{"recordId":"$stream-$n"}""")
  }

  /** Bind and serve; returns the ephemeral port. */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)

  /** The Spark side of the contract: the buffered envelope stream over this
    * server's spool for `stream` — exactly
    * [[EnvelopeSources.textLineStream]] on the stream's spool dir. */
  def envelopeStream(spark: org.apache.spark.sql.SparkSession,
      stream: String): org.apache.spark.sql.DataFrame =
    EnvelopeSources.textLineStream(spark,
      Paths.get(spoolDir, stream).toString)
}
