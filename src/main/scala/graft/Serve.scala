package graft

import org.apache.spark.sql.SparkSession
import graft.serving.{RestServer, WsServer}

/** Runnable serving edge — `server.ts`'s role: one process exposing the
  * REST routes and the WebSocket push endpoint over a warmed engine.
  *
  * {{{ sbt "runMain graft.Serve [sfDir] [httpPort] [wsPort]" }}}
  *
  * HTTP serves the seven `routes.ts` endpoints ([[graft.serving.RestServer]]);
  * WS accepts `subscribe:orderbook:<pool>` and answers with the current
  * nested book ([[graft.serving.WsServer]]). Ports default to 8080/8081
  * (pass 0 for ephemeral). Blocks until killed.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val httpPort = if (args.length > 1) args(1).toInt else 8080
    val wsPort = if (args.length > 2) args(2).toInt else 8081
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rest = RestServer.start(spark, sfDir, httpPort)
    val ws = WsServer.start({ pool =>
      graft.operators.BookServing.orderBookJson(spark, sfDir)
        .filter(org.apache.spark.sql.functions.col("pool") === pool)
        .collect().headOption.map(_.getString(1))
    }, wsPort)
    // warm the fold view so the first request doesn't pay plan+fold cost
    graft.operators.BookQueries.poolInfo(spark, sfDir).collect()
    println(s"[serve] REST on :${rest.port}  WS on :${ws.port}  data=$sfDir")
    Thread.currentThread.join() // serve until killed
  }
}
