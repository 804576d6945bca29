package graft.pipeline

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class ManifestSpec extends AnyFunSuite {
  import Ingest.{Manifest, ManifestEntry}

  test("ledger round-trips filenames with quotes, backslashes, controls") {
    val dir = Files.createTempDirectory("manifest").toString
    val path = s"$dir/ledger.json"
    val entries = Seq(
      ManifestEntry("id:1", """we"ird "name".csv""", "raw/other/x.csv",
        "2024-01-01T00:00:00Z"),
      ManifestEntry("id:2", """back\slash\file.csv""", "raw/other/y.csv",
        "2024-01-01T00:00:00Z"),
      ManifestEntry("id:3", "tab\there.csv", "raw/other/z.csv",
        "2024-01-01T00:00:00Z"))
    Manifest.save(path, entries)
    assert(Manifest.load(path) == entries)
  }

  test("re-save after load keeps identity (no double-escaping drift)") {
    val dir = Files.createTempDirectory("manifest2").toString
    val path = s"$dir/ledger.json"
    val e = Seq(ManifestEntry("a", """q"b\c""", "d", "t"))
    Manifest.save(path, e)
    Manifest.save(path, Manifest.load(path))
    assert(Manifest.load(path) == e)
  }
}
