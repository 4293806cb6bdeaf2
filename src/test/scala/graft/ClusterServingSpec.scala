package graft

import java.net.URI
import java.net.http.{HttpClient, WebSocket}
import java.util.concurrent.{CompletionStage, CountDownLatch, TimeUnit}

import graft.serving.{ClusterFeed, WsServer}
import graft.streaming.MixedIngest

/** The maintained-view serving bridge (verdict r13 item 7): the WS edge
  * serves the STREAMING cluster view — subscribe delivers the current
  * resolved assignment's snapshot, and every committed merge pushes the
  * touched clusters, fed by [[graft.streaming.MixedIngest]]'s commit hook
  * reading the committed DELTA table (no recompute, no diffing). Driven by
  * the JDK's own RFC 6455 client, like `WsServerSpec`.
  */
class ClusterServingSpec extends SparkSpec {

  private val prefix = "clserve"

  private def dropPrefixTables(): Unit =
    spark.catalog.listTables().collect()
      .filter(_.name.startsWith(prefix)).foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${t.name}"))

  private def feedDf(adds: Seq[(Long, Long)], dels: Seq[Long]) = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    adds.toDF("id1", "id2").withColumn("op", lit("add"))
      .unionByName(dels.toDF("id1")
        .withColumn("id2", lit(null).cast("long"))
        .withColumn("op", lit("del")))
      .select("op", "id1", "id2")
  }

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

  test("subscribe:clusters delivers the maintained view's snapshot, then the stream's merges push changes") {
    dropPrefixTables()
    MixedIngest.invalidateCursor(spark, prefix)
    // the maintained view before any subscriber: {1,2,3} and {10,11}
    MixedIngest.mergeBatch(
      feedDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)), Seq.empty), prefix, 0L)

    val ws = WsServer.start(k => ClusterFeed.snapshotFor(spark, prefix)(k))
    try {
      ClusterFeed.attach(spark, prefix, ws)

      // cluster-room subscriber: snapshot = the resolved membership
      val c1 = new Collector
      val s1 = connect(ws.port, c1)
      s1.sendText(s"subscribe:clusters:$prefix:1", true).get(5, TimeUnit.SECONDS)
      assert(c1.latch.await(5, TimeUnit.SECONDS), "no cluster snapshot")
      assert(c1.messages.poll() ==
        """{"cluster_id":1,"size":3,"members":[1,2,3]}""")

      // summary-room subscriber
      val c2 = new Collector
      val s2 = connect(ws.port, c2)
      s2.sendText(s"subscribe:clusters:$prefix", true).get(5, TimeUnit.SECONDS)
      assert(c2.latch.await(5, TimeUnit.SECONDS), "no summary snapshot")
      assert(c2.messages.poll() ==
        s"""{"prefix":"$prefix","docs":5,"clusters":2}""")

      // a streamed merge extends cluster 1 → the cluster room gets the
      // re-rendered membership, the summary room the change set
      c1.latch = new CountDownLatch(1)
      c2.latch = new CountDownLatch(1)
      MixedIngest.mergeBatch(feedDf(Seq((3L, 4L)), Seq.empty), prefix, 1L)
      assert(c1.latch.await(5, TimeUnit.SECONDS), "no cluster push")
      assert(c1.messages.poll() ==
        """{"cluster_id":1,"size":4,"members":[1,2,3,4]}""")
      assert(c2.latch.await(5, TimeUnit.SECONDS), "no summary push")
      assert(c2.messages.poll() ==
        s"""{"prefix":"$prefix","version":1,"changed_clusters":[1],"erased_docs":[]}""")

      // a takedown that SPLITS cluster 1 (delete 2: survivors 1 and 3-4
      // lose their bridge; 3-4 stay connected via the new edge, 1 drops
      // out) pushes the erasures to the summary room — the cluster-1 room
      // stays silent because cluster 1 no longer exists
      c2.latch = new CountDownLatch(1)
      MixedIngest.mergeBatch(feedDf(Seq.empty, Seq(2L)), prefix, 2L)
      assert(c2.latch.await(5, TimeUnit.SECONDS), "no takedown summary push")
      assert(c2.messages.poll() ==
        s"""{"prefix":"$prefix","version":2,"changed_clusters":[3],"erased_docs":[1,2]}""")
      // fresh subscriber to the SPLIT-OFF cluster sees the new membership
      val c3 = new Collector
      val s3 = connect(ws.port, c3)
      s3.sendText(s"subscribe:clusters:$prefix:3", true).get(5, TimeUnit.SECONDS)
      assert(c3.latch.await(5, TimeUnit.SECONDS), "no post-split snapshot")
      assert(c3.messages.poll() ==
        """{"cluster_id":3,"size":2,"members":[3,4]}""")

      s1.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
      s2.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
      s3.sendClose(WebSocket.NORMAL_CLOSURE, "done").get(5, TimeUnit.SECONDS)
    } finally {
      ClusterFeed.detach(prefix)
      ws.stop()
    }
  }
}
