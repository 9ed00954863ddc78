package graft

import graft.streaming.GraphiteServerRegistry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Custom TCP micro-batch source: real socket in, receive-stamped lines
  * out, offsets commit and trim.
  */
class GraphiteSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("lines pushed over TCP arrive as micro-batch rows") {
    val serverName = s"test-${System.nanoTime()}"
    val stream = spark.readStream
      .format("graft.streaming.GraphiteSourceProvider")
      .option("port", "0")
      .option("name", serverName)
      .load()
    assert(stream.schema.fieldNames.toSeq == Seq("line", "updated"))

    val dir = java.nio.file.Files.createTempDirectory("graft_tcp").toString
    val q = stream.writeStream
      .format("memory")
      .queryName(s"tcp_out_${serverName.replace("-", "_")}")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      // wait for the server socket to come up, then push lines
      var port = 0
      val deadline = System.currentTimeMillis() + 10000
      while (port == 0 && System.currentTimeMillis() < deadline) {
        GraphiteServerRegistry.boundPort(serverName).foreach(p => port = p)
        Thread.sleep(50)
      }
      assert(port > 0, "server did not bind")
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      out.println("one_min.app.host1.requests 12.0 1542199560")
      out.println("one_min.app.host2.requests 7.5 1542199620")
      out.flush()
      sock.close()
      // lines land in the buffer asynchronously; poll until visible
      val deadline2 = System.currentTimeMillis() + 15000
      var n = 0L
      while (n < 2 && System.currentTimeMillis() < deadline2) {
        q.processAllAvailable()
        n = spark.table(s"tcp_out_${serverName.replace("-", "_")}").count()
        if (n < 2) Thread.sleep(100)
      }
      assert(n == 2, s"expected 2 rows, got $n")
      val rows = spark.table(s"tcp_out_${serverName.replace("-", "_")}")
        .select("line", "updated").collect()
      assert(rows.map(_.getString(0)).toSet == Set(
        "one_min.app.host1.requests 12.0 1542199560",
        "one_min.app.host2.requests 7.5 1542199620"))
      assert(rows.forall(_.getInt(1) > 1700000000), "receive-timestamped")
    } finally q.stop()
  }

  test("restart from checkpoint offsets beyond the live buffer realigns instead of crashing") {
    import graft.streaming.{CountOffset, GraphiteMicroBatchStream}
    // fresh stream (empty buffer, dropped=0) handed a checkpointed offset
    // of 40: the replayed batch [25, 40) must serve empty, not throw
    val s = new GraphiteMicroBatchStream(0, s"restart-${System.nanoTime()}")
    try {
      val start = s.deserializeOffset("25")
      val end = s.deserializeOffset("40")
      val parts = s.planInputPartitions(start, end)
      val reader = s.createReaderFactory().createReader(parts.head)
      assert(!reader.next(), "replayed batch after data loss must be empty")
      s.commit(end)
      // post-restart offsets resume at the checkpoint, not at zero
      assert(s.latestOffset().asInstanceOf[CountOffset].n == 40)
    } finally s.stop()
  }

  test("buffer capacity bounds memory; overflow lines counted as drops") {
    import graft.streaming.{CountOffset, GraphiteMicroBatchStream}
    val name = s"cap-${System.nanoTime()}"
    val s = new GraphiteMicroBatchStream(0, name, capacity = 3)
    try {
      val port = GraphiteServerRegistry.boundPort(name).get
      val sock = new java.net.Socket("127.0.0.1", port)
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      (1 to 10).foreach(i => out.println(s"a.b.c $i 1542199560"))
      out.flush(); sock.close()
      val deadline = System.currentTimeMillis() + 10000
      while (GraphiteServerRegistry.droppedLines(name) < 7 &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(s.latestOffset().asInstanceOf[CountOffset].n == 3, "buffer capped at capacity")
      assert(GraphiteServerRegistry.droppedLines(name) == 7, "rejected lines accounted")
    } finally s.stop()
  }
}
