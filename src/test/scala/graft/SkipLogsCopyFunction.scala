package graft

import org.apache.hadoop.conf.Configuration

import graft.core.{CopyConfig, CopyResult, CopyTask}
import graft.exec.Executor

/** Example custom copy function (ref op 13 "-mapper", used for filtering):
  * skips *.log files, delegates everything else to the default copy. */
class SkipLogsCopyFunction extends Executor.CopyFunction {
  def apply(conf: Configuration, task: CopyTask, dstRoot: String, cfg: CopyConfig, attempt: String): CopyResult =
    if (!task.src.isDir && task.relDst.endsWith(".log"))
      CopyResult(task.relDst, task.src.path, "SKIP", 0L, "")
    else Executor.copyOne(conf, task, dstRoot, cfg, attempt)
}
