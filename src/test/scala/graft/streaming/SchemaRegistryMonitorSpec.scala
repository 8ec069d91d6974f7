package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import com.sun.net.httpserver.HttpServer
import org.scalatest.funsuite.AnyFunSuite

/** Registry flow against a live local registry stub: version polling,
  * first-sight registration, compatibility POST on change, and the
  * stop-on-incompatible callback (`streaming/schema_monitor.py:51-130`).
  */
class SchemaRegistryMonitorSpec extends AnyFunSuite {

  private def withRegistry(test: (String, AtomicReference[Int], AtomicBoolean, AtomicInteger) => Unit): Unit = {
    val version = new AtomicReference[Int](1)
    val compatible = new AtomicBoolean(true)
    val compatPosts = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/subjects/", { ex =>
      // only the -value subject exists; -key returns 404 like an
      // unregistered subject
      val body =
        if (ex.getRequestURI.getPath.contains("-key")) null
        else s"""{"version":${version.get},"id":${version.get * 10},"schema":"{\\"v\\":${version.get}}"}"""
      if (body == null) { ex.sendResponseHeaders(404, -1); ex.close() }
      else {
        val b = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
      }
    })
    server.createContext("/compatibility/", { ex =>
      compatPosts.incrementAndGet()
      val b = s"""{"is_compatible":${compatible.get}}""".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try test(s"http://127.0.0.1:${server.getAddress.getPort}", version, compatible, compatPosts)
    finally server.stop(0)
  }

  test("first sight registers silently; unchanged version does nothing") {
    withRegistry { (url, _, _, posts) =>
      val fired = new AtomicBoolean(false)
      val m = new SchemaRegistryMonitor(url, Seq("cdc.public.users"),
        stopOnIncompatible = true, onIncompatible = () => fired.set(true))
      m.checkOnce()
      assert(m.knownVersions === Map("cdc.public.users-value" -> 1))
      m.checkOnce() // same version: no compat call, no callback
      assert(posts.get === 0 && !fired.get && !m.incompatibleDetected)
    }
  }

  test("compatible version change updates state without stopping") {
    withRegistry { (url, version, _, posts) =>
      val fired = new AtomicBoolean(false)
      val m = new SchemaRegistryMonitor(url, Seq("cdc.public.users"),
        stopOnIncompatible = true, onIncompatible = () => fired.set(true))
      m.checkOnce()
      version.set(2)
      m.checkOnce()
      assert(m.knownVersions("cdc.public.users-value") === 2)
      assert(posts.get === 1 && !fired.get && !m.incompatibleDetected)
    }
  }

  test("incompatible change latches the flag and fires the stop hook") {
    withRegistry { (url, version, compatible, _) =>
      val fired = new AtomicBoolean(false)
      val m = new SchemaRegistryMonitor(url, Seq("cdc.public.users"),
        stopOnIncompatible = true, onIncompatible = () => fired.set(true))
      m.checkOnce()
      version.set(2); compatible.set(false)
      m.checkOnce()
      assert(fired.get && m.incompatibleDetected)
      // version still advances (reference records the new version too)
      assert(m.knownVersions("cdc.public.users-value") === 2)
    }
  }

  test("without stopOnIncompatible no compatibility POST is made") {
    withRegistry { (url, version, compatible, posts) =>
      val m = new SchemaRegistryMonitor(url, Seq("cdc.public.users"))
      m.checkOnce()
      version.set(2); compatible.set(false)
      m.checkOnce()
      assert(posts.get === 0 && !m.incompatibleDetected)
    }
  }

  test("registry down: check is a no-op, never throws") {
    val m = new SchemaRegistryMonitor("http://127.0.0.1:1", Seq("t"))
    m.checkOnce()
    assert(m.knownVersions.isEmpty)
  }
}
