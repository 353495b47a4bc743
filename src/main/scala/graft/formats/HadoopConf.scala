package graft.formats

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper shipping the session's Hadoop configuration to
  * executors — without it, executor-side `new Configuration()` loses every
  * `spark.hadoop.*` setting (S3 credentials, endpoints, custom FS), so
  * jobs that work on file:// fail on any real storage layer. */
final class SerializableHadoopConf(@transient var value: Configuration)
  extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
