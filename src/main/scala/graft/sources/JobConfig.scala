package graft.sources

/** Job configuration derivation — the reference's TASK-0/1 frame
  * (`FULL:6-98`, `TMPL`): job args arrive as a job name + dataset date,
  * and database / target table / paths are derived by splitting the job
  * name on '-' (`FULL:58-73`). Pure driver-side logic, reimplemented so
  * the pipeline entry points are parameterized the same way.
  */
final case class JobConfig(
    jobName: String,
    datasetDate: String,
    database: String,
    targetTable: String,
    targetBasePath: String) {
  /** Hive-style partitioned output location (`FULL:72`):
    * `<base>/<table>/dataset_date=<d>/`. */
  def targetWritePath: String =
    s"$targetBasePath/$targetTable/dataset_date=$datasetDate"
}

object JobConfig {
  /** `<env>-<database>-<table>-job` → (database, table), mirroring the
    * reference's `JOB_NAME.split('-')` convention. */
  def fromJobName(jobName: String, datasetDate: String,
      targetBasePath: String): JobConfig = {
    val parts = jobName.split("-")
    require(parts.length >= 3,
      s"job name '$jobName' must look like <env>-<database>-<table>[-suffix]")
    JobConfig(jobName, datasetDate,
      database = parts(1),
      targetTable = parts(2),
      targetBasePath = targetBasePath)
  }
}
