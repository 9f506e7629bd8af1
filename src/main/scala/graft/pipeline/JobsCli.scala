package graft.pipeline

/** Reference-shaped command-line surface for the job drivers
  * (mls_listings_curated.py:18-56's argparse block): date window, input
  * dirs (comma-separated), optional MLS isin filter, output-file count,
  * retention-vacuum hours, shuffle partitions, reject dir, debug/logging
  * switches. Flags keep the reference's exact names so an operator's
  * existing invocation translates 1:1.
  */
final case class JobsCliArgs(
    fromDate: String,                       // YYYYMMDD, inclusive
    toDate: String,                         // YYYYMMDD, inclusive
    inputDirListings: Seq[String],
    listingsOutputDir: String,
    inputMlsList: Option[Seq[String]] = None,
    rejectDataDir: Option[String] = None,
    numOutputFiles: Int = 100,
    vacuumHrs: Option[Double] = None,
    shufflePartitions: Int = 2,
    propertyIdSource: String = "NONE",          // API | MSSQL | NONE
    propertyIdApiEndpoint: Option[String] = None,
    propertyIdApiBatchSize: Int = 500,
    propertyIdApiSleep: Double = 0.01,          // seconds, like the reference
    propertyIdModes: Seq[String] = Seq("New", "Null"), // argparse default
    propertyIdLimit: Option[Int] = None,        // lookup budget; None = all
    debug: Boolean = false,
    logRejectedRecords: Boolean = false) {
  def fromDateIso: String = JobsCli.iso(fromDate)
  def toDateIso: String = JobsCli.iso(toDate)
}

object JobsCli {

  private val DatePattern = "(\\d{4})(\\d{2})(\\d{2})".r

  private[pipeline] def iso(yyyymmdd: String): String = yyyymmdd match {
    case DatePattern(y, m, d) => s"$y-$m-$d"
    case other => throw new IllegalArgumentException(
      s"date '$other' is not in YYYYMMDD format")
  }

  /** Parse reference-style argv. Required: --from_date, --to_date,
    * --input_dir_listings, --listings_output_dir. Unknown flags fail
    * loudly (a typo silently ignored is a misconfigured production run). */
  def parse(argv: Seq[String]): JobsCliArgs = {
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)
    var opts = Map.empty[String, String]
    var switches = Set.empty[String]
    val known = Set("--from_date", "--to_date", "--input_dir_listings",
      "--input_mls_list", "--listings_output_dir", "--reject_data_dir",
      "--num_output_files", "--vacuum_hrs", "--shuffle_partitions",
      "--property_id_source", "--property_id_api_endpoint",
      "--property_id_api_batch_size", "--property_id_api_sleep",
      "--property_id_modes", "--property_id_limit")
    val knownSwitches = Set("--debug", "--log_rejected_records")
    var i = 0
    while (i < argv.length) {
      val a = argv(i)
      if (knownSwitches(a)) { switches += a; i += 1 }
      else if (known(a)) {
        if (i + 1 >= argv.length) fail(s"flag $a needs a value")
        opts += a -> argv(i + 1); i += 2
      }
      else fail(s"unknown flag '$a'")
    }
    def req(k: String): String =
      opts.getOrElse(k, fail(s"missing required flag $k"))
    def list(v: String): Seq[String] =
      v.split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val args = JobsCliArgs(
      fromDate = req("--from_date"),
      toDate = req("--to_date"),
      inputDirListings = list(req("--input_dir_listings")),
      listingsOutputDir = req("--listings_output_dir"),
      inputMlsList = opts.get("--input_mls_list").map(list),
      rejectDataDir = opts.get("--reject_data_dir"),
      numOutputFiles = opts.get("--num_output_files").map(_.toInt).getOrElse(100),
      vacuumHrs = opts.get("--vacuum_hrs").map(_.toDouble),
      shufflePartitions =
        opts.get("--shuffle_partitions").map(_.toInt).getOrElse(2),
      propertyIdSource =
        opts.getOrElse("--property_id_source", "NONE"),
      propertyIdApiEndpoint = opts.get("--property_id_api_endpoint"),
      propertyIdApiBatchSize =
        opts.get("--property_id_api_batch_size").map(_.toInt).getOrElse(500),
      propertyIdApiSleep =
        opts.get("--property_id_api_sleep").map(_.toDouble).getOrElse(0.01),
      propertyIdModes = opts.get("--property_id_modes").map(list)
        .getOrElse(Seq("New", "Null")),
      propertyIdLimit = opts.get("--property_id_limit").map(_.toInt),
      debug = switches("--debug"),
      logRejectedRecords = switches("--log_rejected_records"))
    iso(args.fromDate); iso(args.toDate) // validate eagerly
    require(args.inputDirListings.nonEmpty, "empty --input_dir_listings")
    require(args.numOutputFiles > 0,
      s"--num_output_files ${args.numOutputFiles} must be positive")
    require(Set("API", "MSSQL", "NONE")(args.propertyIdSource),
      s"--property_id_source '${args.propertyIdSource}' not in API|MSSQL|NONE")
    require(args.propertyIdSource != "API" ||
      args.propertyIdApiEndpoint.nonEmpty,
      "--property_id_source API needs --property_id_api_endpoint")
    val validModes = Set("New", "Null", "Provisional", "Final")
    val badModes = args.propertyIdModes.filterNot(validModes)
    require(badModes.isEmpty,
      s"--property_id_modes ${badModes.mkString(",")} not in " +
        "New|Null|Provisional|Final")
    args.propertyIdLimit.foreach(n =>
      require(n > 0, s"--property_id_limit $n must be positive"))
    args
  }
}
