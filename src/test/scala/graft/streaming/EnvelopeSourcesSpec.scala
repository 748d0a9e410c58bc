package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.ingest.IngestTransforms

class EnvelopeSourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  val headerJson =
    s"""{"packetId":1,"deviceType":1,"deviceId":5,"userApplicationId":1,"organizationId":1,"len":1,"status":0,"hiveRxTime":"x","data":"${b64("""{"ln":1.0,"lt":2.0,"d":1678759166}""")}"}"""

  test("kafka frames map to the envelope contract and classify") {
    val kafka = Seq(
      ("ingest", 0, 41L, "k1".getBytes, headerJson.getBytes))
      .toDF("topic", "partition", "offset", "key", "value")
    val env = EnvelopeSources.fromKafka(kafka)
    assert(env.columns.toSeq == Seq("recordId", "data"))
    val row = env.collect().head
    assert(row.getString(0) == "ingest-0-41")
    val cls = IngestTransforms.classify(env).select("cls").as[String].collect()
    assert(cls.toSeq == Seq("soh"))
  }

  test("text-line drops map to the envelope contract and classify") {
    val lines = Seq(b64(headerJson)).toDF("value")
    val env = EnvelopeSources.fromTextLines(lines)
    assert(env.columns.toSeq == Seq("recordId", "data"))
    val cls = IngestTransforms.classify(env).select("cls").as[String].collect()
    assert(cls.toSeq == Seq("soh"))
  }

  test("socket-shaped lines map to the envelope contract and classify (S1 live-push analog)") {
    val lines = Seq(b64(headerJson)).toDF("value")
    val env = EnvelopeSources.fromSocketLines(lines)
    assert(env.columns.toSeq == Seq("recordId", "data"))
    val row = env.collect().head
    assert(row.getString(0).startsWith("sock-"))
    val cls = IngestTransforms.classify(env).select("cls").as[String].collect()
    assert(cls.toSeq == Seq("soh"))
  }

  test("live socket push lands a TCP line through the envelope contract (S1)") {
    // a real localhost TCP endpoint: the spec plays device gateway, Spark's
    // socket source connects as the client — the closest sandbox-runnable
    // form of "point a device gateway at it"
    val server = new java.net.ServerSocket(0)
    @volatile var pushErr: Throwable = null
    val pusher = new Thread(() => {
      try {
        val s = server.accept()
        val w = new java.io.PrintWriter(s.getOutputStream, true)
        w.println(b64(headerJson))
        w.flush()
        Thread.sleep(5000) // hold the connection open while the batch drains
        w.close(); s.close()
      } catch { case e: Throwable => pushErr = e }
    })
    pusher.setDaemon(true)
    pusher.start()
    val env = EnvelopeSources.fromSocket(spark, "localhost", server.getLocalPort)
    val got = new java.util.concurrent.LinkedBlockingQueue[String]()
    val q = env.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got.add(r.getString(1)))
        ()
      }.start()
    try {
      val v = got.poll(60, java.util.concurrent.TimeUnit.SECONDS)
      assert(pushErr == null, s"pusher failed: $pushErr")
      assert(v == b64(headerJson), "the pushed line arrives as the envelope data")
    } finally { q.stop(); server.close() }
  }

  test("HTTP POST /{stream-name} lands a body through the VTL wrap into the stage row (S1)") {
    // the reference's exact front door, loopback: POST a RAW JSON body (the
    // device speaks plain JSON; the VTL template does the base64 wrap,
    // stack.py:273-316), then consume the spool with the buffered envelope
    // stream and assert the record classifies — the full wire-to-stage path
    val spool = java.nio.file.Files.createTempDirectory("graft-httppush")
    val srv = new HttpPushServer(spool.toString)
    val port = srv.start()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def post(path: String, body: String) = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port$path"))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      val ok = post("/ingest-stream", headerJson)
      assert(ok.statusCode() == 200 && ok.body().contains("recordId"))
      assert(post("/", "x").statusCode() == 404, "stream name is required")
      val get = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/ingest-stream")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(get.statusCode() == 405, "the front door is POST-only")
      val env = srv.envelopeStream(spark, "ingest-stream")
      val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val q = env.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          IngestTransforms.classify(b).select("recordId", "cls")
            .collect().foreach(r =>
              rows.synchronized { rows += ((r.getString(0), r.getString(1))) })
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-httppush-ckpt").toString)
        .start()
      q.awaitTermination(60000)
      q.stop()
      assert(rows.map(_._2).toSeq == Seq("soh"),
        "the POSTed body must classify as a SOH stage row")
    } finally srv.stop()
  }

  test("HTTP push restart seeds past spooled records — no rec-N collisions (durability)") {
    // review finding, round 6: a fresh instance restarting seq at 1 would
    // ATOMIC_MOVE-replace rec-1.txt, losing the old record, and a file-source
    // checkpoint that already saw that path would never read the new one.
    // The server must seed its sequence past everything already on disk.
    val spool = java.nio.file.Files.createTempDirectory("graft-httppush-restart")
    val srv1 = new HttpPushServer(spool.toString)
    val port1 = srv1.start()
    val client = java.net.http.HttpClient.newHttpClient()
    def post(port: Int, body: String) = client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"http://127.0.0.1:$port/s1"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    try {
      assert(post(port1, "first").statusCode() == 200)
      assert(post(port1, "second").statusCode() == 200)
    } finally srv1.stop()
    // "process restart": a new instance over the SAME spool dir
    val srv2 = new HttpPushServer(spool.toString)
    val port2 = srv2.start()
    try {
      assert(post(port2, "third").statusCode() == 200)
    } finally srv2.stop()
    val files = Option(spool.resolve("s1").toFile.listFiles())
      .getOrElse(Array.empty).map(_.getName).sorted.toSeq
    assert(files.size == 3, s"all three records must be on disk, got $files")
    val bodies = files.map(f => new String(java.nio.file.Files.readAllBytes(
      spool.resolve("s1").resolve(f)), "UTF-8").trim)
      .map(b => new String(java.util.Base64.getDecoder.decode(b), "UTF-8"))
    assert(bodies.toSet == Set("first", "second", "third"),
      "no record may be overwritten by a post-restart name collision")
  }

  test("size-capped file stream splits a backlog into bounded micro-batches (S2 64 MB analog)") {
    // four one-line drop files; a byte cap far below one file's size forces
    // one file per micro-batch (file granularity: at least one file always
    // admits), while the uncapped reader drains the backlog in one batch —
    // the Firehose 64 MB buffer-flush analog (stack.py:165-168).
    val dir = java.nio.file.Files.createTempDirectory("graft-sizecap")
    (1 to 4).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"drop-$i.txt"),
        (b64(headerJson) + "\n").getBytes("UTF-8"))
    }
    def runAndCountBatches(maxBytes: Option[Long]): (Int, Long) = {
      val env = EnvelopeSources.textLineStream(spark, dir.toString, maxBytes)
      val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = env.writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          if (n > 0) sizes.synchronized { sizes += n }
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-sizecap-ckpt").toString)
        .start()
      q.awaitTermination(60000)
      q.stop()
      (sizes.size, sizes.sum)
    }
    val (cappedBatches, cappedRows) = runAndCountBatches(Some(1L))
    assert(cappedRows == 4, "every dropped record is delivered exactly once")
    assert(cappedBatches == 4, "1-byte cap admits exactly one file per batch")
    val (openBatches, openRows) = runAndCountBatches(None)
    assert(openRows == 4)
    assert(openBatches == 1, "uncapped reader drains the backlog in one batch")
  }
}
