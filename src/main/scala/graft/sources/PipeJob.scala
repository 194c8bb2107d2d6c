package graft.sources

/** Shared external-process plumbing for the user-job pipe operators
  * (Dsv/Skiff/Protobuf pipeMap): stdin fed from a daemon thread,
  * stdout drained as the task's output iterator, stderr captured
  * (bounded) on a third thread so a chatty job can't deadlock the
  * pipe buffers.
  *
  * Exit-code contract (reference user_job.cpp "User job failed with
  * exit code"): once stdout is exhausted the process must have exited
  * 0, otherwise the TASK fails with the code and a stderr excerpt.
  * Without this check a crashing job (OOM-kill, segfault, nonzero
  * exit) looks exactly like clean EOF and silently truncates the
  * operation's output — at 100 TB that is data loss, not an error.
  */
private[graft] object PipeJob {
  private val StderrCap = 8192

  def run[T](command: Seq[String],
      write: java.io.OutputStream => Unit,
      read: java.io.InputStream => Iterator[T],
      env: Map[String, String] = Map.empty): Iterator[T] = {
    val pb = new ProcessBuilder(command: _*)
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    val proc = pb.start()
    val stderr = new java.lang.StringBuilder
    val errThread = new Thread {
      override def run(): Unit = {
        val in = proc.getErrorStream
        val buf = new Array[Byte](1024)
        var n = in.read(buf)
        while (n >= 0) {
          if (stderr.length < StderrCap)
            stderr.append(new String(buf, 0, n,
              java.nio.charset.StandardCharsets.UTF_8))
          n = in.read(buf)
        }
      }
    }
    errThread.setDaemon(true)
    errThread.start()
    val writer = new Thread {
      override def run(): Unit = {
        val os = new java.io.BufferedOutputStream(proc.getOutputStream)
        // a broken pipe here means the job exited mid-read; the exit
        // code check below reports it — don't mask it with an IO trace
        try { write(os); os.close() }
        catch { case _: java.io.IOException => }
      }
    }
    writer.setDaemon(true)
    writer.start()
    val out = read(new java.io.BufferedInputStream(proc.getInputStream))
    out ++ {
      val code = proc.waitFor()
      errThread.join(2000)
      if (code != 0)
        throw new RuntimeException(
          s"User job failed with exit code $code" +
            (if (stderr.length > 0) s"; stderr: ${stderr.toString.take(StderrCap)}"
             else ""))
      Iterator.empty
    }
  }
}
