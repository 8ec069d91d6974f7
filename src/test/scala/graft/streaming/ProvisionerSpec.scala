package graft.streaming

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** S16 provisioning: idempotent create + best-effort rollback. */
class ProvisionerSpec extends AnyFunSuite {
  private def tmp() = Files.createTempDirectory("prov").toString

  test("topic naming: per-table channel + dlq side-channel") {
    val p = new Provisioner(tmp())
    assert(p.topicsFor("cdc", Seq("public.users")) ===
      Seq("cdc.public.users", "cdc.public.users.dlq"))
  }

  test("provision is idempotent; second run creates nothing") {
    val root = tmp()
    val p = new Provisioner(root)
    val topics = p.topicsFor("cdc", Seq("public.users", "public.orders"))
    assert(p.provision(topics).size === 4)
    assert(p.provision(topics) === Nil)
    topics.foreach(t => assert(Files.isDirectory(Paths.get(root, t))))
  }

  test("failure rolls back THIS invocation's creations, keeps pre-existing") {
    val root = tmp()
    val p = new Provisioner(root)
    p.provision(Seq("cdc.keep.me"))
    val ex = intercept[IllegalArgumentException](
      p.provision(Seq("cdc.new.topic", "../escape")))
    assert(ex.getMessage.contains("invalid topic name"))
    assert(Files.isDirectory(Paths.get(root, "cdc.keep.me")), "pre-existing survives")
    assert(!Files.exists(Paths.get(root, "cdc.new.topic")), "partial creation rolled back")
  }
}
