package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.JobConfig

class JobConfigSpec extends AnyFunSuite {
  test("job name splitting derives database/table/paths") {
    val c = JobConfig.fromJobName("dev-inbound-prospect-job", "20231130", "/data/out")
    assert(c.database == "inbound")
    assert(c.targetTable == "prospect")
    assert(c.targetWritePath == "/data/out/prospect/dataset_date=20231130")
  }

  test("malformed job names are rejected") {
    intercept[IllegalArgumentException] {
      JobConfig.fromJobName("oops", "20231130", "/data/out")
    }
  }
}
