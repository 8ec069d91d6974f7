package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The `graft.Cli` command surface against live stubs (`cli.py:42-192`
  * semantics): validate reporting, deploy/undeploy against an in-memory
  * Connect REST stub (with the `name`-injection shape real Connect
  * uses), health probing, the console consumer, and a full config-driven
  * run.
  */
class CliSpec extends SparkSpec {

  private def cli(args: String*): (Int, String) = {
    val buf = new ByteArrayOutputStream()
    val code = Cli.run(args.toSeq, new PrintStream(buf, true, "UTF-8"), Some(spark))
    (code, buf.toString("UTF-8"))
  }

  private def writeCfg(dir: String, body: String): String = {
    val p = Paths.get(dir, "pipeline.yaml")
    Files.writeString(p, body)
    p.toString
  }

  private def baseCfg(src: String, ckpt: String, lake: String): String =
    s"""pipeline_id: p1
       |source:
       |  database: appdb
       |  tables: ["public.users"]
       |source_dir: $src
       |checkpoint_dir: $ckpt
       |sinks:
       |  - sink_id: lh
       |    sink_type: lakehouse
       |    lakehouse:
       |      table_path: $lake
       |""".stripMargin

  test("validate: reports pipeline summary and exits 0") {
    val d = tmpDir("cli-v")
    val cfg = writeCfg(d, baseCfg(tmpDir("cli-v-src"), tmpDir("cli-v-ck"), tmpDir("cli-v-lh")))
    val (code, out) = cli("validate", cfg)
    assert(code === 0, out)
    assert(out.contains("Valid — pipeline_id=p1"))
    assert(out.contains("tables: public.users"))
    assert(out.contains("- lh (lakehouse) [enabled]"))
  }

  test("validate: config errors exit 1 with the loader's message") {
    val d = tmpDir("cli-vb")
    val cfg = writeCfg(d, baseCfg(tmpDir("s"), tmpDir("c"), tmpDir("l"))
      .replace("public.users", "users"))
    val (code, out) = cli("validate", cfg)
    assert(code === 1)
    assert(out.contains("Validation error"))
    assert(out.contains("must be schema- or db-qualified"))
    val (code2, out2) = cli("validate", s"$d/nope.yaml")
    assert(code2 === 1 && out2.contains("Validation error"))
  }

  test("validate: --platform-config drives the transport summary; platform errors exit 1") {
    val d = tmpDir("cli-vp")
    val cfg = writeCfg(d, baseCfg(tmpDir("s2"), tmpDir("c2"), tmpDir("l2")))
    // defaults when no platform config given
    val (_, out0) = cli("validate", cfg)
    assert(out0.contains("transport: kafka"))
    assert(out0.contains("platform config: (defaults)"))
    val pp = Paths.get(d, "platform.yaml")
    Files.writeString(pp,
      """transport_mode: kafka
        |kafka:
        |  bootstrap_servers: broker:9092
        |""".stripMargin)
    val (code, out) = cli("validate", cfg, s"--platform-config=$pp")
    assert(code === 0, out)
    assert(out.contains("kafka:  broker:9092"))
    assert(out.contains(s"platform config: $pp"))
    // invalid platform config fails validate
    Files.writeString(pp, "transport_mode: pubsub\n")
    val (code2, out2) = cli("validate", cfg, s"--platform-config=$pp")
    assert(code2 === 1)
    assert(out2.contains("pubsub config is required"))
  }

  test("deploy: connect endpoint resolves from the platform config when no flag is given") {
    val stub = new ConnectStub
    try {
      val d = tmpDir("cli-dp")
      val cfg = writeCfg(d, baseCfg(tmpDir("cli-dp-src"), tmpDir("cli-dp-ck"), tmpDir("cli-dp-lh")))
      val pp = Paths.get(d, "platform.yaml")
      Files.writeString(pp,
        s"""connector:
           |  connect_url: ${stub.url}
           |""".stripMargin)
      val (code, out) = cli("deploy", cfg, s"--platform-config=$pp")
      assert(code === 0, out)
      assert(out.contains("Provisioned: cdc-p1 (Created)"), out)
      assert(stub.connectors.contains("cdc-p1"))
    } finally stub.stop()
  }

  test("lakehouse sub-app: snapshots/query/rollback against a real table (cli.py:251-366)") {
    import spark.implicits._
    val dir = tmpDir("cli-lh-table")
    val table = new graft.lakehouse.LakehouseTable(spark, dir)
    table.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    table.append(Seq((3L, "c")).toDF("id", "v"))
    val (c1, snaps) = cli("lakehouse", "snapshots", dir)
    assert(c1 === 0, snaps)
    assert(snaps.linesIterator.count(_.matches("""\d+ .*append.*""")) === 2, snaps)
    val firstId = snaps.linesIterator.drop(1).next().trim.split("\\s+").head.toLong
    val (c2, q) = cli("lakehouse", "query", dir, firstId.toString)
    assert(c2 === 0 && q.contains("id\tv") && q.contains("1\ta") && !q.contains("3\tc"), q)
    val (c3, rb) = cli("lakehouse", "rollback", dir, firstId.toString)
    assert(c3 === 0 && rb.contains("rolled back"), rb)
    assert(table.read().count() === 2)
    assert(cli("lakehouse", "frobnicate", dir)._1 === 2)
  }

  test("lakehouse sub-app: changes and zorder (engine extensions)") {
    import spark.implicits._
    val dir = tmpDir("cli-lh-ext")
    val table = new graft.lakehouse.LakehouseTable(spark, dir)
    val s1 = table.append(Seq((1L, 10L), (2L, 20L)).toDF("id", "k").repartition(1))
    val s2 = table.append(Seq((3L, 30L)).toDF("id", "k").repartition(1))
    val (c1, ch) = cli("lakehouse", "changes", dir,
      s1.snapshotId.toString, s2.snapshotId.toString)
    assert(c1 === 0 && ch.contains("insert") && ch.contains("3"), ch)
    assert(!ch.contains("delete"), ch)
    val (c2, z) = cli("lakehouse", "zorder", dir, "id,k", "1")
    assert(c2 === 0 && z.contains("zorder: new snapshot"), z)
    assert(table.read().count() === 3)
    // missing operands print usage, exit 2
    assert(cli("lakehouse", "changes", dir)._1 === 2)
    assert(cli("lakehouse", "zorder", dir)._1 === 2)
  }

  test("lakehouse sub-app: predicated query and ann index lifecycle (engine extensions)") {
    import spark.implicits._
    // predicated query rides the automatic skipping read path
    val dir = tmpDir("cli-lh-pred")
    val table = new graft.lakehouse.LakehouseTable(spark, dir)
    table.append((0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    val (c1, q1) = cli("lakehouse", "query", dir, "current", "5", "id=42")
    assert(c1 === 0 && q1.contains("42\tv42") && !q1.contains("41\t"), q1)
    val (c2, q2) = cli("lakehouse", "query", dir, "current", "5", "id=2..4")
    assert(c2 === 0 && q2.contains("2\tv2") && q2.contains("4\tv4") && !q2.contains("5\tv5"), q2)

    // ann build + status over a (vec_id, embedding) vector table
    def vec(id: Long): Seq[Float] =
      (0 until 64).map(d => (((id * 31 + d * 17) % 97).toFloat - 48f) / 48f)
    val vdir = tmpDir("cli-lh-vec")
    val vt = new graft.lakehouse.LakehouseTable(spark, vdir)
    vt.append((0L until 64L).map(i => (i, vec(i))).toDF("vec_id", "embedding"))
    val idxRoot = tmpDir("cli-lh-idx")
    val (c3, b) = cli("lakehouse", "annbuild", vdir, idxRoot)
    assert(c3 === 0 && b.contains("coded vectors"), b)
    assert(b.contains("64 coded vectors"), b)
    val (c4, st) = cli("lakehouse", "annstatus", vdir, idxRoot)
    assert(c4 === 0 && st.contains("trained cells") && st.contains("64 coded vectors"), st)
    assert(cli("lakehouse", "annbuild", vdir)._1 === 2)
    // removal: the listed ids stop serving, the rest remain
    val (c5, rm) = cli("lakehouse", "annremove", vdir, idxRoot, "3,7,11")
    assert(c5 === 0 && rm.contains("3 vector(s) removed"), rm)
    val (c6, st2) = cli("lakehouse", "annstatus", vdir, idxRoot)
    assert(c6 === 0 && st2.contains("61 coded vectors"), st2)
    assert(cli("lakehouse", "annremove", vdir, idxRoot)._1 === 2)

    // one-command replication: initial catch-up, then an incremental
    // rerun picks up exactly the diff (the checkpoint makes it resume)
    val dst = tmpDir("cli-lh-dst")
    val (c7, r1) = cli("lakehouse", "replicate", dir, dst, "id")
    assert(c7 === 0 && r1.contains("100 rows"), r1)
    table.upsert(Seq((42L, "V42"), (200L, "v200")).toDF("id", "v"), Seq("id"))
    val (c8, r2) = cli("lakehouse", "replicate", dir, dst, "id")
    assert(c8 === 0 && r2.contains("101 rows"), r2)
    val dstT = new graft.lakehouse.LakehouseTable(spark, dst)
    assert(dstT.read()
      .filter(org.apache.spark.sql.functions.col("id") === 42L)
      .select("v").head.getString(0) === "V42")
    assert(cli("lakehouse", "replicate", dir, dst)._1 === 2)
    // admission flags: a bounded re-drain converges identically, and a
    // bad flag is usage (exit 2), never a stack trace
    table.upsert(Seq((300L, "v300")).toDF("id", "v"), Seq("id"))
    val (c9, r3) = cli("lakehouse", "replicate", dir, dst, "id",
      "--max-snapshots=1", "--max-files=2", "--max-bytes=1048576")
    assert(c9 === 0 && r3.contains("102 rows"), r3)
    assert(cli("lakehouse", "replicate", dir, dst, "id", "--max-files=abc")._1 === 2)
    assert(cli("lakehouse", "replicate", dir, dst, "id", "--bogus=1")._1 === 2)
    // malformed predicate: usage + exit 2, never a stack trace
    assert(cli("lakehouse", "query", dir, "current", "5", "id42")._1 === 2)
    assert(cli("lakehouse", "query", dir, "current", "5", "=42")._1 === 2)
  }

  test("lakehouse sub-app: clone + replicate --starting-tag is the zero-copy seeding story") {
    import spark.implicits._
    val src = tmpDir("cli-clone-src")
    val t = new graft.lakehouse.LakehouseTable(spark, src)
    t.append((0L until 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1))
    t.setTag("rel", t.currentSnapshot().get.snapshotId)
    // seed the replica at the release BY REFERENCE (one metadata commit)
    val dst = tmpDir("cli-clone-dst") + "-t"
    val (c1, o1) = cli("lakehouse", "clone", src, dst, "--tag=rel")
    assert(c1 === 0 && o1.contains("zero-copy") &&
      o1.contains("pinned by source tag 'rel'"), o1)
    // the source advances past the release
    t.upsert(Seq((7L, "V7"), (100L, "v100")).toDF("id", "v"), Seq("id"))
    // catch-up streams ONLY the post-release changes into the clone
    val (c2, o2) = cli("lakehouse", "replicate", src, dst, "id", "--starting-tag=rel")
    assert(c2 === 0 && o2.contains("51 rows"), o2)
    val d = new graft.lakehouse.LakehouseTable(spark, dst)
    assert(d.read().filter(org.apache.spark.sql.functions.col("id") === 7L)
      .select("v").head.getString(0) === "V7")
    // deepen localizes and reports
    val (c3, o3) = cli("lakehouse", "deepen", dst)
    assert(c3 === 0 && o3.contains("localized"), o3)
    assert((new graft.lakehouse.LakehouseTable(spark, dst).currentSnapshot().get.files)
      .forall(f => !java.nio.file.Paths.get(f).isAbsolute))
    val (c4, o4) = cli("lakehouse", "deepen", dst)
    assert(c4 === 0 && o4.contains("0 file(s)"), o4)
    // snapshot-pinned + deep forms, flag validation
    val dst2 = tmpDir("cli-clone-dst2") + "-s"
    val (c5, o5) = cli("lakehouse", "clone", src, dst2, "--snapshot=1", "--deep")
    assert(c5 === 0 && o5.contains("deep copy") && !o5.contains("pinned"), o5)
    assert(new graft.lakehouse.LakehouseTable(spark, dst2).read().count() === 50L)
    assert(cli("lakehouse", "clone", src, dst2 + "x", "--tag=rel", "--snapshot=1")._1 === 2)
    assert(cli("lakehouse", "clone", src, dst2 + "x", "--bogus")._1 === 2)
    assert(cli("lakehouse", "clone", src)._1 === 2)
  }

  test("unknown / missing command prints usage and exits 2") {
    assert(cli()._1 === 2)
    assert(cli("frobnicate", "x.yaml")._1 === 2)
    assert(cli("validate")._1 === 2)
  }

  // ---- minimal Connect REST stub (create/status/list/delete), with
  //      real Connect's `name` injection on the config GET ----
  private final class ConnectStub {
    val connectors = scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]
    @volatile var putCount = 0

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length)
      if (b.nonEmpty) ex.getResponseBody.write(b)
      ex.close()
    }
    private def js(c: Map[String, String]): String =
      c.map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")

    val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { ex =>
      val path = ex.getRequestURI.getPath
      (ex.getRequestMethod, path.split("/").filter(_.nonEmpty).toList) match {
        case ("GET", Nil) => respond(ex, 200, """{"version":"3.6.0"}""")
        case ("GET", List("connectors")) =>
          respond(ex, 200, connectors.keys.toSeq.sorted.map(n => s""""$n"""")
            .mkString("[", ",", "]"))
        case ("GET", List("connectors", n, "config")) =>
          connectors.get(n) match {
            case Some(c) => respond(ex, 200, js(c + ("name" -> n)))
            case None => respond(ex, 404, "")
          }
        case ("PUT", List("connectors", n, "config")) =>
          putCount += 1
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val parsed = org.json4s.jackson.JsonMethods.parse(body) match {
            case org.json4s.JObject(fs) =>
              fs.collect { case (k, org.json4s.JString(v)) => k -> v }.toMap
            case _ => Map.empty[String, String]
          }
          val existed = connectors.contains(n)
          connectors(n) = parsed
          respond(ex, if (existed) 200 else 201, js(parsed))
        case ("GET", List("connectors", n, "status")) =>
          if (!connectors.contains(n)) respond(ex, 404, "")
          else respond(ex, 200,
            s"""{"name":"$n","connector":{"state":"RUNNING"},"tasks":[]}""")
        case ("DELETE", List("connectors", n)) =>
          if (connectors.remove(n).isDefined) respond(ex, 204, "") else respond(ex, 404, "")
        case (m, p) => respond(ex, 400, s"unhandled $m $p")
      }
    })
    server.start()
    def url: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def stop(): Unit = server.stop(0)
  }

  test("deploy: provisions channels + registers the connector; identical redeploy is a no-op PUT-wise") {
    val stub = new ConnectStub
    try {
      val src = tmpDir("cli-d-src")
      val cfg = writeCfg(tmpDir("cli-d"), baseCfg(src, tmpDir("cli-d-ck"), tmpDir("cli-d-lh")))
      val (code, out) = cli("deploy", cfg, s"--connect-url=${stub.url}")
      assert(code === 0, out)
      assert(out.contains("Provisioned: cdc-p1 (Created)"), out)
      assert(Files.isDirectory(Paths.get(src, "cdc.public.users")))
      assert(Files.isDirectory(Paths.get(src, "cdc.public.users.dlq")))
      assert(stub.connectors.contains("cdc-p1"))
      assert(stub.putCount === 1)

      // redeploy with the unchanged config: the stub injects `name`
      // into the config GET like real Connect — the client must strip
      // it and recognize the no-op instead of PUTting again
      val (code2, out2) = cli("deploy", cfg, s"--connect-url=${stub.url}")
      assert(code2 === 0)
      assert(out2.contains("Provisioned: cdc-p1 (Unchanged)"), out2)
      assert(stub.putCount === 1, "identical redeploy must not PUT")
    } finally stub.stop()
  }

  test("undeploy: removes the connector and reports teardown") {
    val stub = new ConnectStub
    try {
      val cfg = writeCfg(tmpDir("cli-u"),
        baseCfg(tmpDir("cli-u-src"), tmpDir("cli-u-ck"), tmpDir("cli-u-lh")))
      cli("deploy", cfg, s"--connect-url=${stub.url}")
      assert(stub.connectors.contains("cdc-p1"))
      val (code, out) = cli("undeploy", cfg, s"--connect-url=${stub.url}")
      assert(code === 0)
      assert(out.contains("Teardown complete: p1"))
      assert(!stub.connectors.contains("cdc-p1"))
    } finally stub.stop()
  }

  test("health: all probes green exits 0; a failing probe exits 1") {
    val cfg = writeCfg(tmpDir("cli-h"),
      baseCfg(tmpDir("cli-h-src"), tmpDir("cli-h-ck"), tmpDir("cli-h-lh")))
    val (code, out) = cli("health", cfg)
    assert(code === 0, out)
    assert(out.contains("healthy"))
    assert(out.contains("source-dir") && out.contains("checkpoint-dir"))

    // unreachable registry → unhealthy report, exit 1
    val bad = writeCfg(tmpDir("cli-hb"),
      baseCfg(tmpDir("cli-hb-src"), tmpDir("cli-hb-ck"), tmpDir("cli-hb-lh")) +
        "registry:\n  url: http://127.0.0.1:1/\n")
    val (code2, out2) = cli("health", bad)
    assert(code2 === 1)
    assert(out2.contains("UNHEALTHY"))
  }

  test("consume: prints each event's coordinates, key and value in order") {
    val src = tmpDir("cli-c-src")
    Files.writeString(Paths.get(src, "b.json"), Seq(
      """{"topic":"cdc.public.users","partition":0,"offset":0,"op":"c","ts_ms":1,"key":"{\"id\":1}","before":null,"after":"{\"id\":1,\"n\":\"a\"}"}""",
      """{"topic":"cdc.public.users","partition":0,"offset":1,"op":"c","ts_ms":2,"key":"{\"id\":2}","before":null,"after":"{\"id\":2,\"n\":\"b\"}"}"""
    ).mkString("\n"))
    val cfg = writeCfg(tmpDir("cli-c"),
      baseCfg(src, tmpDir("cli-c-ck"), tmpDir("cli-c-lh")))
    val (code, out) = cli("consume", cfg)
    assert(code === 0, out)
    val i0 = out.indexOf("cdc.public.users p=0 o=0")
    val i1 = out.indexOf("cdc.public.users p=0 o=1")
    assert(i0 >= 0 && i1 > i0, out)
    assert(out.contains("""key:   {"id":1}"""))
    assert(out.contains("""value: {"id":2,"n":"b"}"""))
  }

  test("run: health endpoint starts beside the pipeline and stops with it (runner.py:97-103)") {
    val src = tmpDir("cli-rh-src")
    Files.writeString(Paths.get(src, "b.json"),
      """{"topic":"cdc.public.users","partition":0,"offset":0,"op":"c","ts_ms":1,"key":"{\"id\":1}","before":null,"after":"{\"id\":1}"}""")
    val d = tmpDir("cli-rh")
    val cfg = writeCfg(d, baseCfg(src, tmpDir("cli-rh-ck"), tmpDir("cli-rh-lh")))
    val stub = new ConnectStub // platform health probes the Connect endpoint
    val pp = Paths.get(d, "platform.yaml")
    Files.writeString(pp,
      s"""health_port: 0
         |connector:
         |  connect_url: ${stub.url}
         |""".stripMargin)
    // follow-mode run in a thread so the health endpoint is observable live
    val buf = new java.io.ByteArrayOutputStream()
    val t = new Thread(() => Cli.run(
      Seq("run", cfg, s"--platform-config=$pp", "--follow"),
      new PrintStream(buf, true, "UTF-8"), Some(spark)))
    t.start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      var port = -1
      val re = """health: http://127\.0\.0\.1:(\d+)/health""".r
      while (port < 0 && System.currentTimeMillis() < deadline) {
        re.findFirstMatchIn(buf.toString("UTF-8")).foreach(m => port = m.group(1).toInt)
        Thread.sleep(100)
      }
      assert(port > 0, s"health port never announced:\n${buf.toString("UTF-8")}")
      val client = java.net.http.HttpClient.newHttpClient()
      val resp = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/health/platform")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() === 200, resp.body())
      assert(resp.body().contains("\"healthy\""))
      // consumer-lag block served beside the probes (runner.py:408-415)
      val lag = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/health/lag")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(lag.statusCode() === 200, lag.body())
      assert(lag.body().contains("\"consumer_lag\""), lag.body())
      assert(lag.body().contains("\"high_watermark\":0"), lag.body())
      // stop the streaming query -> run returns -> Running.stop closes the server
      spark.streams.active.foreach(_.stop())
      t.join(30000)
      assert(!t.isAlive)
      val after = intercept[Exception] {
        client.send(
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
      }
      assert(after != null) // connection refused once stopped
    } finally {
      spark.streams.active.foreach(_.stop())
      t.join(10000)
      stub.stop()
    }
  }

  test("consume is checkpoint-isolated: a later run still delivers every event") {
    // regression: consume once shared cfg.checkpointDir with run, so
    // eyeballing events marked them consumed and the real pipeline
    // silently skipped them (the reference's console consumer uses an
    // isolated consumer group for exactly this reason, cli.py:148)
    val src = tmpDir("cli-ci-src")
    val lake = tmpDir("cli-ci-lh")
    Files.writeString(Paths.get(src, "b.json"), Seq(
      """{"topic":"cdc.public.users","partition":0,"offset":0,"op":"c","ts_ms":1,"key":"{\"id\":1}","before":null,"after":"{\"id\":1,\"n\":\"a\"}"}""",
      """{"topic":"cdc.public.users","partition":0,"offset":1,"op":"c","ts_ms":2,"key":"{\"id\":2}","before":null,"after":"{\"id\":2,\"n\":\"b\"}"}"""
    ).mkString("\n"))
    val cfg = writeCfg(tmpDir("cli-ci"), baseCfg(src, tmpDir("cli-ci-ck"), lake))
    val (c1, out1) = cli("consume", cfg)
    assert(c1 === 0 && out1.contains("cdc.public.users p=0 o=1"), out1)
    val (c2, _) = cli("run", cfg)
    assert(c2 === 0)
    assert(new graft.lakehouse.LakehouseTable(spark, lake).read().count() === 2,
      "events consumed for debugging must still reach the sinks")
  }

  test("flags: space-separated form works; unknown flags exit 2") {
    val stub = new ConnectStub
    try {
      val cfg = writeCfg(tmpDir("cli-f"),
        baseCfg(tmpDir("cli-f-src"), tmpDir("cli-f-ck"), tmpDir("cli-f-lh")))
      // `--connect-url URL` — the exact shape the usage string shows
      val (code, out) = cli("deploy", cfg, "--connect-url", stub.url)
      assert(code === 0, out)
      assert(out.contains("Provisioned: cdc-p1 (Created)"), out)
      // an unrecognized flag must be an error, not a silent no-op that
      // leaves the connector unregistered
      val (code2, out2) = cli("deploy", cfg, "--conect-url", stub.url)
      assert(code2 === 2)
      assert(out2.contains("Unknown or valueless flag: --conect-url"), out2)
    } finally stub.stop()
  }

  test("run: drives the configured pipeline end-to-end (events land in the lakehouse sink)") {
    val src = tmpDir("cli-r-src")
    val lake = tmpDir("cli-r-lh")
    Files.writeString(Paths.get(src, "b.json"), Seq(
      """{"topic":"cdc.public.users","partition":0,"offset":0,"op":"c","ts_ms":1,"key":"{\"id\":1}","before":null,"after":"{\"id\":1,\"n\":\"a\"}"}""",
      """{"topic":"cdc.public.users","partition":0,"offset":1,"op":"c","ts_ms":2,"key":"{\"id\":2}","before":null,"after":"{\"id\":2,\"n\":\"b\"}"}"""
    ).mkString("\n"))
    val cfg = writeCfg(tmpDir("cli-r"), baseCfg(src, tmpDir("cli-r-ck"), lake))
    val (code, out) = cli("run", cfg)
    assert(code === 0, out)
    assert(out.contains("Starting pipeline: p1"))
    assert(out.contains("sink: lh (lakehouse)"))
    val rows = new graft.lakehouse.LakehouseTable(spark, lake).read()
    assert(rows.count() === 2)
    assert(rows.columns.contains("_cdc_offset"))
  }
}
