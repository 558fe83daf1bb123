package graft.core

/** CLI argument parsing with the reference's flag surface and conflict matrix
  * (Arguments.java:111-272). Returns Left(message) for invalid input; the CLI
  * maps that to exit code -1 (DistCPPlus.java:312-332).
  */
object Args {

  def parse(argv: Seq[String]): Either[String, CopyConfig] = {
    var c = CopyConfig()
    var positional = Vector.empty[String]
    var i = 0
    def next(flag: String): Either[String, String] =
      if (i + 1 < argv.length) { i += 1; Right(argv(i)) }
      else Left(s"$flag requires a value")

    var err: Option[String] = None
    while (i < argv.length && err.isEmpty) {
      argv(i) match {
        case "-update" => c = c.copy(update = true)
        case "-overwrite" => c = c.copy(overwrite = true)
        case "-delete" => c = c.copy(delete = true)
        case "-i" => c = c.copy(ignoreFailures = true)
        case "-skipcrccheck" => c = c.copy(skipCrc = true)
        case "-skiptscheck" => c = c.copy(skipTs = true)
        case "-exportOnly" => c = c.copy(exportOnly = true)
        case "-exportPath" =>
          next("-exportPath") match {
            case Left(e) => err = Some(e)
            case Right(v) => c = c.copy(exportPath = Some(v))
          }
        case s if s.startsWith("-p") && s != "-p" =>
          FileAttribute.parse(s.drop(2)) match {
            case Left(e) => err = Some(e)
            case Right(attrs) => c = c.copy(preserve = attrs)
          }
        case "-p" => c = c.copy(preserve = FileAttribute.all.toSet)
        case "-filelimit" =>
          next("-filelimit").flatMap(PathUtils.parseSizeLiteral) match {
            case Left(e) => err = Some(e)
            case Right(n) => c = c.copy(fileLimit = n)
          }
        case "-sizelimit" =>
          next("-sizelimit").flatMap(PathUtils.parseSizeLiteral) match {
            case Left(e) => err = Some(e)
            case Right(n) => c = c.copy(sizeLimit = n)
          }
        case "-m" =>
          next("-m").flatMap(v => v.toIntOption.toRight(s"bad -m value '$v'")) match {
            case Left(e) => err = Some(e)
            case Right(n) => c = c.copy(maxTasks = n)
          }
        case "-mapper" =>
          next("-mapper") match {
            case Left(e) => err = Some(e)
            case Right(v) => c = c.copy(mapperClass = Some(v))
          }
        case "-market" =>
          next("-market").flatMap(v => v.toIntOption.toRight(s"bad -market value '$v'")) match {
            case Left(e) => err = Some(e)
            case Right(n) => c = c.copy(marketId = n)
          }
        case "-f" =>
          next("-f") match {
            case Left(e) => err = Some(e)
            case Right(v) => c = c.copy(fileList = Some(v))
          }
        case "-rg" =>
          next("-rg") match {
            case Left(e) => err = Some(e)
            case Right(v) => c = c.copy(flatRegex = Some(v))
          }
        case "-regexPath" =>
          // -regexPath <root> <rx1/rx2/...> (Arguments.java:127-133,363-437)
          (for { root <- next("-regexPath"); pat <- next("-regexPath") } yield (root, pat)) match {
            case Left(e) => err = Some(e)
            case Right((root, pat)) =>
              positional = positional :+ root
              c = c.copy(depthRegexes = pat.split('/').toSeq)
          }
        case s if s.startsWith("-") => err = Some(s"unknown flag '$s'")
        case p => positional = positional :+ p
      }
      i += 1
    }

    err.toLeft(()).flatMap { _ =>
      if (positional.isEmpty)
        Left("need <src...> <dst>")
      else if (positional.length < 2 && c.fileList.isEmpty && c.flatRegex.isEmpty)
        Left("need <src...> <dst>")
      else
        validate(c.copy(srcs = positional.dropRight(1), dst = positional.last))
    }
  }

  /** Conflict matrix (Arguments.java:248-268). */
  def validate(c: CopyConfig): Either[String, CopyConfig] =
    if (c.update && c.overwrite) Left("-update and -overwrite are mutually exclusive")
    else if (c.delete && !c.update && !c.overwrite) Left("-delete requires -update or -overwrite")
    else if (c.skipCrc && !c.update) Left("-skipcrccheck requires -update")
    else if (c.skipTs && !c.update) Left("-skiptscheck requires -update")
    else Right(c)
}
