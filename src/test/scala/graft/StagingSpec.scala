package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** [[Staging]] lifecycle: build-once per fingerprint, rebuild +
  * superseded-dir deletion on fingerprint change (the q99/q113 stage
  * caches must never leak a dir for the JVM lifetime when data under
  * a path is rewritten mid-JVM).
  */
class StagingSpec extends AnyFunSuite {

  test("same fingerprint builds once and returns the same dir") {
    var builds = 0
    val d1 = Staging.stage("spec_same", "fp1") { d =>
      builds += 1; Files.writeString(Paths.get(d, "a.txt"), "one")
    }
    val d2 = Staging.stage("spec_same", "fp1") { d => builds += 1 }
    assert(d1 === d2)
    assert(builds === 1)
    assert(Files.exists(Paths.get(d1, "a.txt")))
  }

  test("fingerprint change rebuilds and deletes the superseded dir") {
    val d1 = Staging.stage("spec_super", "fp1") { d =>
      Files.createDirectory(Paths.get(d, "nested"))
      Files.writeString(Paths.get(d, "nested", "a.txt"), "one")
    }
    val d2 = Staging.stage("spec_super", "fp2") { d =>
      Files.writeString(Paths.get(d, "b.txt"), "two")
    }
    assert(d1 !== d2)
    assert(!Files.exists(Paths.get(d1)), "superseded stage dir must be deleted")
    assert(Files.exists(Paths.get(d2, "b.txt")))
  }

  test("distinct keys stage independently") {
    val d1 = Staging.stage("spec_k1", "fp") { _ => }
    val d2 = Staging.stage("spec_k2", "fp") { _ => }
    assert(d1 !== d2)
    assert(Files.exists(Paths.get(d1)) && Files.exists(Paths.get(d2)))
  }
}
