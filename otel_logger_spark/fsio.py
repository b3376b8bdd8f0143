"""Filesystem seam for lineage/manifest IO, routed through the Hadoop
FileSystem API (via the Spark JVM gateway).

The lineage layer must work wherever the sinks live: local disks in this
sandbox, HDFS or an object store (s3a://, gs://, abfs://) on the 100 TB
deployment. Raw ``os.*`` calls only work for the first case, so every
manifest read/write and parquet-footer enumeration goes through
``org.apache.hadoop.fs.FileSystem`` resolved from the path's own scheme —
identical code paths for file:/ and s3a:/ URIs (the resume test exercises
file:/ URIs explicitly to prove no raw-os dependency).

Footer row counts come from ``parquet-hadoop``'s ``ParquetFileReader``
(already on Spark's classpath), which on object storage issues ranged GETs
for the footer only.
"""

from __future__ import annotations


def join_path(*parts: str) -> str:
    """URI-safe path join (os.path.join would mangle scheme-qualified
    paths on Windows-style separators and cannot express s3a:// roots)."""
    cleaned = [p.rstrip("/") for p in parts if p]
    return "/".join(cleaned)


class HadoopFS:
    """Thin wrapper over the Hadoop FileSystem of a given path's scheme."""

    def __init__(self, spark, path: str):
        self._jvm = spark._jvm
        self._gateway = spark.sparkContext._gateway
        self._conf = spark._jsc.hadoopConfiguration()
        self._Path = self._jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(path).getFileSystem(self._conf)

    def _p(self, path: str):
        return self._Path(path)

    def exists(self, path: str) -> bool:
        return self._fs.exists(self._p(path))

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def read_text(self, path: str) -> str:
        stream = self._fs.open(self._p(path))
        try:
            return self._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()

    def write_text_atomic(self, path: str, text: str) -> None:
        """tmp-write + overwrite-rename. The rename goes through
        ``FileContext.rename(..., Options.Rename.OVERWRITE)`` — one atomic
        step on HDFS and local FS, so there is never an instant where the
        target is absent (a delete-then-rename pair would lose the manifest
        to a crash between the two calls and silently restart every sink on
        resume). Schemes without an AbstractFileSystem binding (some
        object-store connectors) fall back to delete+rename; readers cover
        that window by falling back to the completed ``.tmp`` file
        (read_text_with_fallback) — the tmp is fully written and closed
        before any rename/delete starts, so the fallback never sees a
        partial manifest."""
        tmp = path + ".tmp"
        out = self._fs.create(self._p(tmp), True)
        try:
            out.write(bytearray(text.encode("utf-8")))
        finally:
            out.close()
        target = self._p(path)
        try:
            fc = self._jvm.org.apache.hadoop.fs.FileContext.getFileContext(
                target.toUri(), self._conf
            )
            Rename = self._jvm.org.apache.hadoop.fs.Options.Rename
            opts = self._gateway.new_array(Rename, 1)
            opts[0] = Rename.OVERWRITE
            fc.rename(self._p(tmp), target, opts)
        except Exception:
            # no FileContext for this scheme (UnsupportedFileSystemException,
            # typical of object stores): non-atomic fallback; a real rename
            # failure (missing tmp, permissions) re-raises from here too
            if self._fs.exists(target):
                self._fs.delete(target, False)
            self._fs.rename(self._p(tmp), target)

    def read_text_with_fallback(self, path: str) -> str | None:
        """Read ``path``; if absent, read the completed ``path``.tmp left by
        a crash inside the non-atomic fallback rename window; None if
        neither exists."""
        if self.exists(path):
            return self.read_text(path)
        tmp = path + ".tmp"
        if self.exists(tmp):
            return self.read_text(tmp)
        return None

    def file_count(self, path: str) -> int:
        """Recursive file count under ``path`` in ONE gateway call
        (ContentSummary — a namenode-side aggregate on HDFS, a LIST on
        object stores). Used to pick the lineage strategy without paying
        a per-file listing first."""
        return int(self._fs.getContentSummary(self._p(path)).getFileCount())

    def list_files_recursive(self, path: str, suffix: str = ".parquet"):
        """Yield paths (as strings) of all files under ``path`` with the
        given suffix, any partitionBy nesting depth."""
        it = self._fs.listFiles(self._p(path), True)
        out = []
        while it.hasNext():
            st = it.next()
            p = st.getPath().toString()
            if p.endswith(suffix):
                out.append(p)
        return out

    def parquet_row_count(self, path: str) -> int:
        """Footer-only row count of ONE file via parquet-hadoop (ranged GET
        on object storage; no data pages read). Lineage loops this on the
        driver ONLY for small sinks (<= the file-count threshold in
        sinks.parquet_partition_lineage, where a handful of ms-scale footer
        reads beats a Spark job's fixed scheduling cost); big sinks use the
        one distributed job. The test suite also uses it to cross-check the
        distributed counts."""
        HadoopInputFile = self._jvm.org.apache.parquet.hadoop.util.HadoopInputFile
        ParquetFileReader = self._jvm.org.apache.parquet.hadoop.ParquetFileReader
        reader = ParquetFileReader.open(
            HadoopInputFile.fromPath(self._p(path), self._conf)
        )
        try:
            return int(reader.getRecordCount())
        finally:
            reader.close()

    def relativize(self, base: str, path: str) -> str:
        """Path of ``path`` relative to directory ``base`` (both may be
        scheme-qualified; comparison happens on fully-qualified URIs)."""
        base_q = self._fs.makeQualified(self._p(base)).toString().rstrip("/")
        full_q = self._fs.makeQualified(self._p(path)).toString()
        if full_q.startswith(base_q + "/"):
            return full_q[len(base_q) + 1 :]
        return full_q

    def relativize_many(self, base: str, paths: list[str]) -> list[str]:
        """Relativize many already-fully-qualified URIs (e.g. from
        ``input_file_name()``) against ``base`` with ONE py4j round-trip —
        the per-path comparison is pure-Python URI parsing, so this stays
        O(1) gateway calls however many part files a sink has. Handles the
        ``file:///p`` (input_file_name) vs ``file:/p`` (Hadoop
        Path.toString) rendering split by comparing parsed components."""
        from urllib.parse import urlparse

        bq = urlparse(self._fs.makeQualified(self._p(base)).toString())
        bpath = bq.path.rstrip("/")
        out = []
        for p in paths:
            q = urlparse(p)
            if (
                q.scheme == bq.scheme
                and q.netloc == bq.netloc
                and q.path.startswith(bpath + "/")
            ):
                out.append(q.path[len(bpath) + 1 :])
            else:
                out.append(p)
        return out
