package graft

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{CompletionStage, CountDownLatch, TimeUnit}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.operators.BookServing
import graft.serving.WsServer
import graft.streaming.OrderBookStream

/** Q8/S11 live: the WebSocket push edge driven by the JDK's own RFC 6455
  * client — subscribe receives the current book snapshot, and the streaming
  * change feed pushes re-rendered books to subscribers as micro-batches
  * land (server.ts:26-51 semantics, without its unawaited-Promise bug).
  */
class WsServerSpec extends SparkSpec {

  private class Collector extends WebSocket.Listener {
    val messages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val buf = new StringBuilder
    @volatile var latch = new CountDownLatch(1)
    override def onText(ws: WebSocket, data: CharSequence,
                        last: Boolean): CompletionStage[_] = {
      buf.append(data)
      if (last) { messages.add(buf.toString); buf.clear(); latch.countDown() }
      ws.request(1)
      null
    }
  }

  private def connect(port: Int, c: Collector): WebSocket =
    HttpClient.newHttpClient().newWebSocketBuilder()
      .buildAsync(URI.create(s"ws://127.0.0.1:$port/"), c)
      .get(10, TimeUnit.SECONDS)

  test("subscribe:orderbook:<pool> delivers the current snapshot, then pushes on change") {
    val srv = WsServer.start(pool => Some(s"""{"pool":"$pool","snapshot":true}"""))
    try {
      val c = new Collector
      val ws = connect(srv.port, c)
      ws.sendText("subscribe:orderbook:click", true).get(5, TimeUnit.SECONDS)
      assert(c.latch.await(5, TimeUnit.SECONDS), "no snapshot frame arrived")
      assert(c.messages.poll() == """{"pool":"click","snapshot":true}""")
      assert(srv.subscriberCount("click") == 1)

      // push fan-out: only the subscribed room receives frames
      c.latch = new CountDownLatch(1)
      srv.push("other", """{"pool":"other"}""") // not subscribed — no frame
      srv.push("click", """{"pool":"click","v":2}""")
      assert(c.latch.await(5, TimeUnit.SECONDS), "no push frame arrived")
      assert(c.messages.poll() == """{"pool":"click","v":2}""")
      assert(c.messages.isEmpty, "received a frame for an unsubscribed room")

      ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
    } finally srv.stop()
  }

  test("protocol robustness: ping gets ponged, garbage subscribe ignored, connection stays usable") {
    val srv = WsServer.start(pool => Some(s"""{"pool":"$pool"}"""))
    try {
      val c = new Collector
      val ws = connect(srv.port, c)
      // ping → pong keeps the connection alive (JDK client handles the pong
      // transparently; a broken pong frame would kill the connection)
      ws.sendPing(java.nio.ByteBuffer.wrap("hi".getBytes)).get(5, TimeUnit.SECONDS)
      // a non-subscribe text frame is ignored, not fatal
      ws.sendText("bogus command", true).get(5, TimeUnit.SECONDS)
      // the connection still works: a real subscribe gets its snapshot
      ws.sendText("subscribe:orderbook:click", true).get(5, TimeUnit.SECONDS)
      assert(c.latch.await(5, TimeUnit.SECONDS), "connection died before subscribe")
      assert(c.messages.poll() == """{"pool":"click"}""")
      ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
    } finally srv.stop()
  }

  test("change feed → WebSocket: streamed micro-batches push changed pools' books to a live client") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // serving edge: snapshot = the rendered nested book for the pool (A7/S12)
    val srv = WsServer.start { pool =>
      BookServing.orderBookJson(spark, sfTiny)
        .filter(org.apache.spark.sql.functions.col("pool") === pool)
        .collect().headOption.map(_.getString(1))
    }
    val ckpt = java.nio.file.Files.createTempDirectory("ws-feed-").toString
    try {
      val c = new Collector
      val ws = connect(srv.port, c)
      ws.sendText("subscribe:orderbook:click", true).get(5, TimeUnit.SECONDS)
      assert(c.latch.await(10, TimeUnit.SECONDS), "no snapshot frame")
      val snap = c.messages.poll()
      assert(snap.contains("\"bids\":[") && snap.contains("\"asks\":["))

      // stream the typed events; each batch pushes changed pools to their
      // rooms (the reference's update chain: fold → changed pools → emit)
      val evs = OrderBookStream.toEventStream(
        graft.sources.Tables.events(spark, sfTiny)).collect()
      val evSource = MemoryStream[graft.operators.OrderFold.Ev]
      c.latch = new CountDownLatch(1)
      val query = OrderBookStream.foldStream(evSource.toDS()).writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Update())
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[graft.operators.OrderFold.St], _: Long) =>
            batch.select("pool").distinct().collect().map(_.getString(0))
              .foreach(p => srv.push(p, s"""{"pool":"$p","changed":true}"""))
        }
        .start()
      try {
        evSource.addData(evs.toIndexedSeq)
        query.processAllAvailable()
        assert(c.latch.await(10, TimeUnit.SECONDS), "no change push arrived")
        assert(c.messages.poll() == """{"pool":"click","changed":true}""")
      } finally query.stop()
      ws.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
    } finally {
      srv.stop()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }
}
