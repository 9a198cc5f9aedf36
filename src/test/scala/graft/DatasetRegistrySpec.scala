package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DatasetRegistry

/** Filename classification against all 8 patterns + rejects + the
  * two-digit-year pivot (SURVEY §5.2; reference load.go:46-53,58,64).
  */
class DatasetRegistrySpec extends AnyFunSuite {

  test("all 8 datasets classify with the yyMMdd date normalized") {
    DatasetRegistry.datasets.foreach { ds =>
      val c = DatasetRegistry.classify(s"VIC240115_ABR_$ds.txt")
      assert(c.contains(DatasetRegistry.Classified(ds, "2024-01-15")), ds)
    }
  }

  test("rejects: wrong prefix, unknown dataset, wrong extension, " +
       "short date, trailing garbage") {
    val bad = Seq(
      "NSW240115_ABR_ACNC.txt",          // wrong state prefix
      "VIC240115_ABR_Nonexistent.txt",   // unknown dataset
      "VIC240115_ABR_ACNC.csv",          // wrong extension
      "VIC2401_ABR_ACNC.txt",            // 4-digit date
      "VIC240115_ABR_ACNC.txt.bak",      // not anchored at end
      "README.txt")
    bad.foreach(f => assert(DatasetRegistry.classify(f).isEmpty, f))
  }

  test("non-calendar dates are rejected, not mis-parsed") {
    assert(DatasetRegistry.classify("VIC991332_ABR_ACNC.txt").isEmpty)
    assert(DatasetRegistry.classify("VIC240230_ABR_ACNC.txt").isEmpty) // Feb 30
  }

  test("two-digit-year pivot matches Go: 69-99 -> 19xx, 00-68 -> 20xx") {
    assert(DatasetRegistry.classify("VIC690101_ABR_ACNC.txt")
      .exists(_.importdate == "1969-01-01"))
    assert(DatasetRegistry.classify("VIC680101_ABR_ACNC.txt")
      .exists(_.importdate == "2068-01-01"))
  }

  test("a filename classifies to exactly one dataset") {
    val matches = DatasetRegistry.patterns.values
      .count(_.findFirstIn("VIC240115_ABR_Agency_Data.txt").isDefined)
    assert(matches == 1)
  }
}
