package graft.operators

import java.io.File
import org.scalatest.funsuite.AnyFunSuite

/** The shared build-if-missing publish protocol ([[Artifacts.ensureRoot]])
  * that every per-dataset index rides: completeness gating, crashed-build
  * cleanup, racing-builder convergence, and tmp hygiene.
  */
class ArtifactsSpec extends AnyFunSuite {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-ensure").toString + "/idx"

  private def writeArtifact(root: String, tag: String): Unit = {
    val d = new File(root, "data")
    d.mkdirs()
    java.nio.file.Files.write(new File(d, "payload").toPath,
      tag.getBytes("UTF-8")): Unit
    new File(d, "_SUCCESS").createNewFile(): Unit
  }

  private def payload(root: String): String =
    new String(java.nio.file.Files.readAllBytes(
      new File(s"$root/data/payload").toPath), "UTF-8")

  private def complete(p: String): Boolean =
    new File(s"$p/data/_SUCCESS").exists()

  test("builds once, then serves without rebuilding") {
    val root = tmpRoot()
    var builds = 0
    def ensure() = Artifacts.ensureRoot(root)(complete) { tmp =>
      builds += 1; writeArtifact(tmp, s"build-$builds")
    }
    assert(ensure() == root && builds == 1)
    assert(ensure() == root && builds == 1, "complete root must not rebuild")
    assert(payload(root) == "build-1")
    assert(new File(root, "_SUCCESS").exists())
  }

  test("a root missing its per-artifact marker is wreckage: deleted and rebuilt") {
    val root = tmpRoot()
    Artifacts.ensureRoot(root)(complete)(writeArtifact(_, "good"))
    // simulate a crash inside a swap: artifact marker gone, root marker kept
    assert(new File(s"$root/data/_SUCCESS").delete())
    Artifacts.ensureRoot(root)(complete)(writeArtifact(_, "rebuilt"))
    assert(complete(root) && payload(root) == "rebuilt")
  }

  test("racing cross-process builders converge: first publish wins, loser discards") {
    // the in-JVM lock serializes threads, so simulate the CROSS-PROCESS
    // interleaving the rename protocol exists for: builder B commits the
    // root while builder A is still building — A's rename must lose,
    // validate the winner, and discard its own tmp tree
    val root = tmpRoot()
    Artifacts.ensureRoot(root)(complete) { tmp =>
      writeArtifact(tmp, "slow-A")
      // another JVM completes and publishes while we build
      val other = s"$root.other-${java.util.UUID.randomUUID()}"
      writeArtifact(other, "fast-B")
      new File(other, "_SUCCESS").createNewFile()
      require(new File(other).renameTo(new File(root)))
    }
    assert(complete(root) && payload(root) == "fast-B",
      "the committed winner must keep serving")
    val parent = new File(root).getParentFile
    assert(!parent.listFiles().exists(_.getName.contains(".tmp-")),
      "the losing builder's tmp tree must be discarded")
  }

  test("recoverDirSwaps heals a crashed swap of a partition VALUE " +
      "containing a dot (lang=pt.BR) — suffix-stripping, not " +
      "first-dot truncation") {
    val parent = java.nio.file.Files
      .createTempDirectory("graft-dotheal").toString
    // crashed aside-then-swap: live dir gone, one aside present — the
    // heal must rename the aside back under its FULL dotted name; the
    // old takeWhile(_ != '.') derived "lang=pt" and left the aside as
    // residue forever (r14 ADVICE)
    val aside = new File(parent, "lang=pt.BR.old-deadbeef")
    assert(aside.mkdirs())
    java.nio.file.Files.write(new File(aside, "part-0.parquet").toPath,
      "x".getBytes("UTF-8")): Unit
    // plus a stale tmp tree under another dotted value
    assert(new File(parent, "lang=zh.TW.tmp-cafebabe").mkdirs())
    Artifacts.recoverDirSwaps(parent, "lang=")
    assert(new File(parent, "lang=pt.BR/part-0.parquet").exists(),
      "aside not renamed back under the dotted partition value")
    assert(Artifacts.dirResidue(parent, "lang=").isEmpty,
      "residue must be fully healed so serving gates re-engage")
  }

  test("maintenance lease: a second maintainer refuses on a live " +
      "foreign lease; same owner re-acquires; scoped entries release; " +
      "a stale lease is stolen after patience") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-lease").toString
    // sticky acquisition (a tagged stream's entry) leaves the lease
    // standing after the entry returns
    Artifacts.withLease(root, "streamA", sticky = true) { () }
    val lease = new File(root, "_lease")
    assert(lease.exists(), "sticky lease must stand after the entry")
    // a second maintainer — tagged or ad-hoc — refuses loudly
    val e = intercept[IllegalStateException] {
      Artifacts.withLease(root, "streamB", sticky = true) { () }
    }
    assert(e.getMessage.contains("streamA"), e.getMessage)
    intercept[IllegalStateException] {
      Artifacts.withLease(root, "adhoc-x", sticky = false) { () }
    }
    // the SAME owner re-acquires freely (the crash-replay successor),
    // and nested entries of one maintenance chain re-enter without
    // re-acquiring
    Artifacts.withLease(root, "streamA", sticky = true) {
      Artifacts.withLease(root, "streamA", sticky = true) { () }
    }
    // crashed-maintainer takeover: a lapsed lease may be stolen — but
    // ONLY by a tagged successor; an ad-hoc entry has no standing to
    // accept the replay-handoff contract and must releaseLease
    // explicitly instead
    def lapse(): Unit = assert(lease.setLastModified(
      System.currentTimeMillis() - Artifacts.defaultLeasePatienceMs - 1000))
    lapse()
    val adhoc = intercept[IllegalStateException] {
      Artifacts.withLease(root, "adhoc-y", sticky = false) { () }
    }
    assert(adhoc.getMessage.contains("LAPSED") &&
      adhoc.getMessage.contains("releaseLease"), adhoc.getMessage)
    lapse()
    Artifacts.withLease(root, "streamB", sticky = true) { () }
    assert(Artifacts.parseKvFile(lease).exists(_.get("owner")
      .contains("streamB")))
    // graceful handoff: release, then a third owner acquires at once
    Artifacts.releaseLease(root, "streamB")
    assert(!lease.exists())
    Artifacts.withLease(root, "streamC", sticky = false) {
      assert(lease.exists(), "lease must be held during the entry")
    }
    assert(!lease.exists(), "a scoped (untagged) entry releases at exit")
  }

  test("lease: a lapsed AD-HOC lease is reclaimable by anyone (crashed " +
      "untagged streaming maintainer must not wedge its root forever); " +
      "forceReleaseLease evicts any holder") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-lease-adhoc").toString
    val lease = new File(root, "_lease")
    // simulate a hard crash inside an untagged per-batch entry
    // (kmvAppendStream's shape): the scoped release never ran, the
    // dead owner is a fresh adhoc UUID no restart will ever reuse
    val crashed = intercept[RuntimeException] {
      Artifacts.withLease(root, "adhoc-dead-uuid", sticky = false) {
        // a crash leaves the lease file standing: re-create it as the
        // holder would have (release runs in the finally, so mimic the
        // torn state after the entry by re-claiming below)
        throw new RuntimeException("boom")
      }
    }
    assert(crashed.getMessage == "boom")
    // the finally released it (in-process crash ≠ JVM death); rebuild
    // the dead-holder state directly
    Artifacts.withLease(root, "adhoc-dead-uuid", sticky = true) { () }
    assert(Artifacts.parseKvFile(lease).exists(_.get("owner")
      .contains("adhoc-dead-uuid")))
    // while fresh, a new untagged entry still refuses (overlap exclusion)
    intercept[IllegalStateException] {
      Artifacts.withLease(root, "adhoc-new", sticky = false) { () }
    }
    // once lapsed, the restarted untagged maintainer reclaims — an
    // exactly-once owner has no replay window to hand off, so the
    // tagged-successor-only restriction does not apply (ADVICE r15)
    assert(lease.setLastModified(
      System.currentTimeMillis() - Artifacts.defaultLeasePatienceMs - 1000))
    Artifacts.withLease(root, "adhoc-new", sticky = false) {
      assert(Artifacts.parseKvFile(lease).exists(_.get("owner")
        .contains("adhoc-new")))
    }
    assert(!lease.exists(), "scoped reclaim releases at exit")
    // a lapsed TAGGED lease still refuses ad-hoc entries (unchanged)
    Artifacts.withLease(root, "streamZ", sticky = true) { () }
    assert(lease.setLastModified(
      System.currentTimeMillis() - Artifacts.defaultLeasePatienceMs - 1000))
    intercept[IllegalStateException] {
      Artifacts.withLease(root, "adhoc-late", sticky = false) { () }
    }
    // the admin recovery evicts whoever holds the lease, loudly
    assert(Artifacts.forceReleaseLease(root).contains("streamZ"))
    assert(!lease.exists())
    Artifacts.withLease(root, "adhoc-after-force", sticky = false) { () }
  }

  test("lease: a tagged streamId must not squat the reserved 'adhoc-' " +
      "owner namespace (its lapsed lease would be silently stealable, " +
      "bypassing the replay-handoff protection — ADVICE r16)") {
    val bad = intercept[IllegalArgumentException] {
      Artifacts.leaseIdentity(Some("adhoc-sneaky" -> "b1"))
    }
    assert(bad.getMessage.contains("reserved"), bad.getMessage)
    // untagged identities still mint in that namespace, scoped
    val (owner, sticky) = Artifacts.leaseIdentity(None)
    assert(owner.startsWith("adhoc-") && !sticky)
    // and a normal tagged identity is untouched
    assert(Artifacts.leaseIdentity(Some("streamA" -> "b1")) ==
      ("streamA" -> true))
  }

  test("a broken build fails loudly at publish time and never goes live") {
    val root = tmpRoot()
    // a build whose artifact marker never landed (lost task, partial
    // write) must be refused BEFORE the rename — readers can never trip
    // on published wreckage — and a later correct build proceeds
    intercept[IllegalArgumentException] {
      Artifacts.ensureRoot(root)(complete) { tmp =>
        new File(tmp, "data").mkdirs(): Unit
      }
    }
    assert(!new File(root).exists(), "incomplete tree must not publish")
    Artifacts.ensureRoot(root)(complete)(writeArtifact(_, "healed"))
    assert(complete(root) && payload(root) == "healed")
  }
}
