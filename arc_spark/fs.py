"""Filesystem abstraction for driver-side metadata and small-object IO.

Spark executors read/write DATA files (parquet, text parts) through
Hadoop's FileSystem connectors for whatever scheme the path carries —
that side needs no abstraction. What does need one is the DRIVER-side
metadata work the lake table and single-file loads do: listing manifests,
reading/writing small JSON objects, the atomic commit CAS, orphan-file
cleanup, and streaming single-file assembly. The reference routes all of
it through Hadoop ``FileSystem`` (e.g. ``load/TextLoad.scala:173-248``
opens ``FileSystem.create`` streams; ``util/CloudUtils.scala`` wires
per-stage credentials into the Hadoop configuration); this module is the
same idea with three backends:

- ``LocalFS``      — plain POSIX, the default for bare paths.
- ``HadoopFS``     — py4j bridge to ``org.apache.hadoop.fs.FileSystem``;
  handles every scheme the cluster has a connector for (``hdfs://``,
  ``s3a://``, ``abfss://``, ``gs://``, and ``file:/``, which is how tests
  exercise this code path without cloud credentials).
- ``MemoryFS``     — in-process dict with object-store-like conditional
  PUT; unit-tests the commit CAS and concurrency without any disk.

- ``S3ObjectFS``    — native S3 API (boto3, optional dependency) whose
  ``create_exclusive`` is a genuinely ATOMIC ``If-None-Match: *``
  conditional PUT (S3 conditional writes, GA since late 2024) — the
  commit CAS needs no side store on s3:// anymore.

Commit CAS semantics by backend, advertised by each backend's
``atomic_create_exclusive`` flag: LocalFS/MemoryFS use create-exclusive
(atomic); S3ObjectFS uses the conditional PUT (atomic); HadoopFS writes
a temp object then ``rename`` with no-overwrite, which is atomic on
HDFS but races on object-store connectors (rename is copy+delete on
S3A) — deployments stuck on the Hadoop path for S3 (no boto3, or
``ARC_S3_FS=hadoop``) inject a :class:`CommitLocker`
(``LakeTable(root, locker=ConditionalPutLocker(...))``), which turns
the commit into a LOCKED check-then-put exactly as Iceberg's DynamoDB
S3 committers do; without one, LakeTable logs a prominent warning at
commit time when the resolved backend's CAS is not atomic. The manifest
naming is lock-friendly: one immutable object per version,
winner-takes-name.
"""

from __future__ import annotations

import io
import os
import posixpath
import shutil
import threading
from urllib.parse import urlparse


#: rename is copy+delete (or the no-overwrite check races) on these —
#: the manifest-commit CAS is NOT atomic without an external lock
OBJECT_STORE_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
     "cos", "swift"}
)


def scheme_of(path: str) -> str:
    """URI scheme of ``path`` ('' for bare POSIX paths). Windows drive
    letters are not a concern on cluster deployments."""
    p = urlparse(path)
    return p.scheme if len(p.scheme) > 1 else ""


def join(base: str, *parts: str) -> str:
    """Scheme-preserving path join (always '/')."""
    return posixpath.join(base, *parts)


class ArcFileSystem:
    """Driver-side filesystem operations for metadata and small objects."""

    #: True when ``create_exclusive`` is genuinely atomic on this backend
    #: (the manifest-commit CAS is multi-writer-safe without a locker)
    atomic_create_exclusive: bool = True

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        """Child NAMES (not paths) of a directory; [] if missing."""
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def size(self, path: str) -> int:
        """File size in bytes (metadata call where the backend has one)."""
        return len(self.read_bytes(path))

    def write_bytes(self, path: str, data: bytes) -> None:
        """Create or overwrite; parents created as needed."""
        raise NotImplementedError

    def create_exclusive(self, path: str, data: bytes) -> None:
        """Atomically create ``path`` with ``data`` iff absent — the
        manifest-commit CAS. Raises FileExistsError on conflict."""
        raise NotImplementedError

    def open_output(self, path: str):
        """Binary write stream (overwrite) — for streaming single-file
        assembly; parents created as needed."""
        raise NotImplementedError

    def open_append(self, path: str):
        """Binary append stream. Backends without native append fall back
        to read-existing + rewrite (O(existing bytes) — documented cost of
        append-mode single files on object storage)."""
        raise NotImplementedError

    def open_input(self, path: str):
        """Binary read stream."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        """Remove a file (no error if already gone)."""
        raise NotImplementedError

    def delete_if_unchanged(self, path: str, expected: bytes) -> bool:
        """Conditional delete: remove ``path`` only if its content still
        equals ``expected``. Returns True if the object is gone (deleted
        here, or already absent), False if it is present but changed.

        Backends modeling a conditional-write side-store (MemoryFS — the
        DynamoDB pattern, which has conditional deletes) override this
        with a genuinely atomic compare-and-delete; this default is
        read-compare-delete, which SHRINKS but cannot close the window
        (the same caveat as any lock store without CAS primitives)."""
        try:
            if self.read_bytes(path) != bytes(expected):
                return False
        except FileNotFoundError:
            return True
        self.delete(path)
        return True

    def rmdir_if_empty(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def mkdirs(self, path: str) -> None:
        raise NotImplementedError

    def walk_files(self, path: str):
        """Yield (file_path, name) for every file under ``path``."""
        stack = [path]
        while stack:
            d = stack.pop()
            for name in self.listdir(d):
                p = join(d, name)
                if self.isdir(p):
                    stack.append(p)
                else:
                    yield p, name

    def seekable_input(self, path: str):
        """Seekable binary file-like (for parquet footer reads)."""
        return io.BytesIO(self.read_bytes(path))


class CommitLocker:
    """Mutual exclusion around a commit CAS for stores whose
    create-if-absent is not atomic (the S3 rename race documented on
    ``HadoopFS.create_exclusive``). The contract is DynamoDB-lock-shaped:
    ``acquire`` blocks until it owns ``key`` (or times out), returns an
    opaque token; ``release`` frees only if the token still owns it.
    Inject into ``LakeTable(root, locker=...)`` — with a locker the
    commit does locked check-then-put, which is safe on ANY backend."""

    def acquire(self, key: str, timeout: float = 30.0) -> str:
        raise NotImplementedError

    def release(self, key: str, token: str) -> None:
        raise NotImplementedError


class ConditionalPutLocker(CommitLocker):
    """CommitLocker over any ArcFileSystem whose ``create_exclusive`` IS
    atomic: the lock object for ``key`` is created exclusively (one
    winner); losers poll until it disappears. MemoryFS backs the tests;
    a production S3 deployment points this at a consistent side-store
    (the DynamoDB pattern Iceberg's S3 committers use) — the LOCK store
    needs atomicity, the data store does not.

    ``lease_seconds``: opt-in crash recovery. Without it a writer that
    dies while holding the lock deadlocks every future commit until an
    operator deletes the lock object. With it the lock carries an
    expiry; an acquirer finding an EXPIRED lock verifies it unchanged,
    deletes it, and races ``create_exclusive`` again (exactly one
    stealer wins — the create is atomic). Standard lease caveats apply,
    same as a DynamoDB lock without fencing tokens: expiry compares the
    HOLDER's clock at write time to the STEALER's at read time (keep
    leases ≫ plausible clock skew), and a holder paused longer than its
    lease can wake believing it still owns the lock — size the lease
    well above the longest plausible commit, not at its average."""

    def __init__(
        self,
        fs: ArcFileSystem,
        root: str,
        poll_interval: float = 0.05,
        lease_seconds: float | None = None,
    ):
        self.fs = fs
        self.root = root
        self.poll_interval = poll_interval
        self.lease_seconds = lease_seconds

    def _lock_path(self, key: str) -> str:
        import hashlib

        return join(self.root, hashlib.sha256(key.encode()).hexdigest() + ".lock")

    def _steal_if_expired(self, path: str) -> bool:
        """True if the caller should immediately retry create_exclusive:
        the lock vanished, or it carried an expiry in the past and was
        conditionally deleted. The delete compares against the exact
        payload whose lease we judged expired (fs.delete_if_unchanged):
        on an atomic-compare store (MemoryFS / a DynamoDB-style side
        store) a stealer holding a stale read can NEVER remove a lock
        that was re-acquired after that read; on plain filesystems the
        fallback shrinks the window without closing it. The atomic
        create after the delete guarantees a single winner among
        stealers either way."""
        import json as _json
        import time

        try:
            raw = self.fs.read_bytes(path)
        except FileNotFoundError:
            return True
        try:
            exp = _json.loads(raw.decode())["expires_at"]
        except (ValueError, KeyError, TypeError, UnicodeDecodeError):
            return False  # lease-less payload: never steal
        if time.time() < float(exp):
            return False
        return self.fs.delete_if_unchanged(path, raw)

    def acquire(self, key: str, timeout: float = 30.0) -> str:
        import json as _json
        import time

        token = os.urandom(8).hex()
        path = self._lock_path(key)
        deadline = time.monotonic() + timeout
        while True:
            payload = (
                _json.dumps(
                    {"token": token, "expires_at": time.time() + self.lease_seconds}
                ).encode()
                if self.lease_seconds
                else token.encode()
            )
            try:
                self.fs.create_exclusive(path, payload)
                return token
            except FileExistsError:
                if self.lease_seconds and self._steal_if_expired(path):
                    continue
                if time.monotonic() >= deadline:
                    raise TimeoutError(
                        f"commit lock for {key!r} still held after {timeout}s"
                    ) from None
                time.sleep(self.poll_interval)

    def release(self, key: str, token: str) -> None:
        import json as _json

        path = self._lock_path(key)
        try:
            held = self.fs.read_bytes(path).decode()
        except FileNotFoundError:
            return
        try:
            held = _json.loads(held)["token"]
        except (ValueError, KeyError, TypeError):
            pass  # lease-less payload: the bare token
        if held == token:
            self.fs.delete(path)


class LocalFS(ArcFileSystem):
    def _p(self, path: str) -> str:
        return path[len("file://"):] if path.startswith("file://") else (
            path[len("file:"):] if path.startswith("file:") else path
        )

    def exists(self, path):
        return os.path.exists(self._p(path))

    def isdir(self, path):
        return os.path.isdir(self._p(path))

    def listdir(self, path):
        p = self._p(path)
        return os.listdir(p) if os.path.isdir(p) else []

    def read_bytes(self, path):
        with open(self._p(path), "rb") as f:
            return f.read()

    def size(self, path):
        return os.path.getsize(self._p(path))

    def write_bytes(self, path, data):
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(data)

    def create_exclusive(self, path, data):
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "xb") as f:
            f.write(data)

    def open_output(self, path):
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, "wb")

    def open_input(self, path):
        return open(self._p(path), "rb")

    def open_append(self, path):
        p = self._p(path)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return open(p, "ab")

    def delete(self, path):
        try:
            os.remove(self._p(path))
        except FileNotFoundError:
            pass

    def rmdir_if_empty(self, path):
        p = self._p(path)
        if os.path.isdir(p) and not os.listdir(p):
            os.rmdir(p)

    def rmtree(self, path):
        shutil.rmtree(self._p(path), ignore_errors=True)

    def mkdirs(self, path):
        os.makedirs(self._p(path), exist_ok=True)

    def seekable_input(self, path):
        return open(self._p(path), "rb")


class MemoryFS(ArcFileSystem):
    """In-process object store: flat {path: bytes} with directories
    implied by prefixes (like S3). ``create_exclusive`` is a true
    conditional PUT under a lock."""

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    def _norm(self, path: str) -> str:
        return path.rstrip("/")

    def exists(self, path):
        p = self._norm(path)
        with self._lock:
            return p in self._objects or any(
                k.startswith(p + "/") for k in self._objects
            )

    def isdir(self, path):
        p = self._norm(path)
        with self._lock:
            return p not in self._objects and any(
                k.startswith(p + "/") for k in self._objects
            )

    def listdir(self, path):
        p = self._norm(path)
        names = set()
        with self._lock:
            for k in self._objects:
                if k.startswith(p + "/"):
                    names.add(k[len(p) + 1:].split("/", 1)[0])
        return sorted(names)

    def read_bytes(self, path):
        with self._lock:
            try:
                return self._objects[self._norm(path)]
            except KeyError:
                raise FileNotFoundError(path) from None

    def write_bytes(self, path, data):
        with self._lock:
            self._objects[self._norm(path)] = bytes(data)

    def create_exclusive(self, path, data):
        p = self._norm(path)
        with self._lock:
            if p in self._objects:
                raise FileExistsError(path)
            self._objects[p] = bytes(data)

    def open_output(self, path):
        fs, p = self, self._norm(path)

        class _Out(io.BytesIO):
            def close(self_inner):
                fs.write_bytes(p, self_inner.getvalue())
                super().close()

            def __exit__(self_inner, *a):
                self_inner.close()

        return _Out()

    def open_input(self, path):
        return io.BytesIO(self.read_bytes(path))

    def open_append(self, path):
        try:
            existing = self.read_bytes(path)
        except FileNotFoundError:
            existing = b""
        out = self.open_output(path)
        out.write(existing)
        return out

    def delete(self, path):
        with self._lock:
            self._objects.pop(self._norm(path), None)

    def delete_if_unchanged(self, path, expected):
        # true atomic compare-and-delete (the DynamoDB conditional-delete
        # pattern) — closes the lease-steal read/delete window entirely
        p = self._norm(path)
        with self._lock:
            cur = self._objects.get(p)
            if cur is None:
                return True
            if cur != bytes(expected):
                return False
            del self._objects[p]
            return True

    def rmdir_if_empty(self, path):
        pass  # directories are implicit

    def rmtree(self, path):
        p = self._norm(path)
        with self._lock:
            for k in [k for k in self._objects if k == p or k.startswith(p + "/")]:
                del self._objects[k]

    def mkdirs(self, path):
        pass  # directories are implicit


class HadoopFS(ArcFileSystem):
    """Hadoop FileSystem bridge (py4j): any scheme the cluster's
    connectors support. Used driver-side only — executors never touch
    this class (data goes through Spark's own readers/writers)."""

    def __init__(self, spark, base_uri: str):
        self._jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        uri = self._jvm.java.net.URI.create(base_uri)
        self._fs = self._jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
        # rename-if-absent is atomic on HDFS/posix, copy+delete (racy) on
        # object-store connectors — advertise honestly so LakeTable warns
        self.atomic_create_exclusive = (
            scheme_of(base_uri) not in OBJECT_STORE_SCHEMES
        )

    def _path(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def exists(self, path):
        return self._fs.exists(self._path(path))

    def isdir(self, path):
        p = self._path(path)
        return self._fs.exists(p) and self._fs.getFileStatus(p).isDirectory()

    def listdir(self, path):
        p = self._path(path)
        if not self._fs.exists(p):
            return []
        return [st.getPath().getName() for st in self._fs.listStatus(p)]

    def read_bytes(self, path):
        stream = self._fs.open(self._path(path))
        try:
            out = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, False)
            return bytes(out.toByteArray())
        finally:
            stream.close()

    def size(self, path):
        return self._fs.getFileStatus(self._path(path)).getLen()

    def write_bytes(self, path, data):
        stream = self._fs.create(self._path(path), True)
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def create_exclusive(self, path, data):
        # write-temp + rename-if-absent: atomic on HDFS (rename fails when
        # the destination exists); see module docstring for the S3 caveat
        tmp = path + ".tmp-" + os.urandom(4).hex()
        self.write_bytes(tmp, data)
        ok = self._fs.rename(self._path(tmp), self._path(path))
        if not ok:
            self.delete(tmp)
            raise FileExistsError(path)

    class _JStreamWriter:
        def __init__(self, stream):
            self._s = stream

        def write(self, data):
            self._s.write(bytearray(data))
            return len(data)

        def close(self):
            self._s.close()

        def __enter__(self):
            return self

        def __exit__(self, *a):
            self.close()

    def open_output(self, path):
        return self._JStreamWriter(self._fs.create(self._path(path), True))

    def open_append(self, path):
        if not self.exists(path):
            return self.open_output(path)
        try:
            return self._JStreamWriter(self._fs.append(self._path(path)))
        except Exception:
            # connector without append (e.g. local checksum FS, s3a):
            # re-stage the existing bytes into a fresh stream
            existing = self.read_bytes(path)
            out = self.open_output(path)
            out.write(existing)
            return out

    class _JStreamReader(io.RawIOBase):
        def __init__(self, fs, path):
            self._s = fs._fs.open(fs._path(path))
            self._len = fs._fs.getFileStatus(fs._path(path)).getLen()

        def readable(self):
            return True

        def seekable(self):
            return True

        def seek(self, pos, whence=io.SEEK_SET):
            if whence == io.SEEK_SET:
                self._s.seek(pos)
            elif whence == io.SEEK_CUR:
                self._s.seek(self._s.getPos() + pos)
            else:
                self._s.seek(self._len + pos)
            return self._s.getPos()

        def tell(self):
            return self._s.getPos()

        def read(self, n=-1):
            if n is None or n < 0:
                n = self._len - self._s.getPos()
            if n <= 0:
                return b""
            # readNBytes RETURNS the array — py4j does not copy back
            # mutations made to a byte[] argument, so read(buf, off, len)
            # silently yields zeros
            return bytes(self._s.readNBytes(int(n)))

        def readinto(self, b):
            data = self.read(len(b))
            b[: len(data)] = data
            return len(data)

        def close(self):
            self._s.close()
            super().close()

    def open_input(self, path):
        return io.BufferedReader(self._JStreamReader(self, path))

    def seekable_input(self, path):
        return io.BufferedReader(self._JStreamReader(self, path))

    def delete(self, path):
        self._fs.delete(self._path(path), False)

    def rmdir_if_empty(self, path):
        p = self._path(path)
        if self._fs.exists(p) and len(self._fs.listStatus(p)) == 0:
            self._fs.delete(p, False)

    def rmtree(self, path):
        self._fs.delete(self._path(path), True)

    def mkdirs(self, path):
        self._fs.mkdirs(self._path(path))


def _s3_error(e) -> tuple[str, int | None]:
    """(error code, HTTP status) from a botocore-shaped ClientError —
    duck-typed so injected test doubles need no botocore import."""
    r = getattr(e, "response", None) or {}
    code = (r.get("Error") or {}).get("Code", "")
    status = (r.get("ResponseMetadata") or {}).get("HTTPStatusCode")
    return str(code), status


class S3ObjectFS(ArcFileSystem):
    """Native S3 backend (boto3) for ``s3://bucket/key`` metadata IO.

    The point of this class is one call: ``create_exclusive`` maps to
    ``PutObject`` with ``If-None-Match: *`` — S3's server-side
    conditional write (GA since late 2024) — so the manifest-commit CAS
    is GENUINELY atomic on S3 itself, with no DynamoDB-style side store
    and no locker required. A lost race surfaces as HTTP 412
    (PreconditionFailed) or 409 (ConditionalRequestConflict — a
    concurrent conditional write on the same key was in flight), both of
    which mean "someone else created it": FileExistsError.

    ``delete_if_unchanged`` (the lease-steal compare-and-delete) reads
    the object WITH its ETag, verifies content, then deletes with
    ``If-Match: <etag>`` where the deployment supports conditional
    deletes; if the client rejects the parameter it falls back to plain
    delete after the content check — a shrunken-but-open window,
    documented on the base class, still strictly better than the Hadoop
    path.

    ``client`` is injectable for tests (fault-injecting doubles) and for
    custom endpoints (MinIO, S3-compatible stores:
    ``boto3.client("s3", endpoint_url=...)``). boto3 is an OPTIONAL
    dependency — constructing without a client raises ImportError where
    it's absent, and ``get_fs`` falls back to HadoopFS (with its
    documented locker requirement)."""

    atomic_create_exclusive = True

    def __init__(self, client=None):
        if client is None:
            import boto3  # optional dependency, import-guarded

            client = boto3.client("s3")
        self.c = client

    @staticmethod
    def _bk(path: str) -> tuple[str, str]:
        p = urlparse(path)
        return p.netloc, p.path.lstrip("/")

    def exists(self, path):
        b, k = self._bk(path)
        try:
            self.c.head_object(Bucket=b, Key=k)
            return True
        except Exception as e:
            code, status = _s3_error(e)
            if code not in ("404", "NoSuchKey", "NotFound") and status != 404:
                raise
        return self.isdir(path)

    def isdir(self, path):
        b, k = self._bk(path)
        k = k.rstrip("/")
        resp = self.c.list_objects_v2(Bucket=b, Prefix=k + "/", MaxKeys=1)
        return bool(resp.get("KeyCount", 0) or resp.get("Contents"))

    def listdir(self, path):
        b, k = self._bk(path)
        k = k.rstrip("/")
        names: set[str] = set()
        token = None
        while True:
            kw = {"Bucket": b, "Prefix": k + "/", "Delimiter": "/"}
            if token:
                kw["ContinuationToken"] = token
            resp = self.c.list_objects_v2(**kw)
            for o in resp.get("Contents") or []:
                names.add(o["Key"][len(k) + 1:])
            for p in resp.get("CommonPrefixes") or []:
                names.add(p["Prefix"][len(k) + 1:].rstrip("/"))
            if not resp.get("IsTruncated"):
                break
            token = resp.get("NextContinuationToken")
        return sorted(n for n in names if n)

    def _get(self, path: str):
        b, k = self._bk(path)
        try:
            resp = self.c.get_object(Bucket=b, Key=k)
        except Exception as e:
            code, status = _s3_error(e)
            if code in ("404", "NoSuchKey", "NotFound") or status == 404:
                raise FileNotFoundError(path) from None
            raise
        return resp["Body"].read(), resp.get("ETag")

    def read_bytes(self, path):
        return self._get(path)[0]

    def size(self, path):
        b, k = self._bk(path)
        try:
            return int(self.c.head_object(Bucket=b, Key=k)["ContentLength"])
        except KeyError:
            return len(self.read_bytes(path))

    def write_bytes(self, path, data):
        b, k = self._bk(path)
        self.c.put_object(Bucket=b, Key=k, Body=bytes(data))

    def create_exclusive(self, path, data):
        b, k = self._bk(path)
        try:
            self.c.put_object(
                Bucket=b, Key=k, Body=bytes(data), IfNoneMatch="*"
            )
        except Exception as e:
            code, status = _s3_error(e)
            if code in (
                "PreconditionFailed", "ConditionalRequestConflict", "412", "409",
            ) or status in (412, 409):
                raise FileExistsError(path) from None
            raise

    def delete(self, path):
        b, k = self._bk(path)
        self.c.delete_object(Bucket=b, Key=k)

    def delete_if_unchanged(self, path, expected):
        try:
            data, etag = self._get(path)
        except FileNotFoundError:
            return True
        if data != bytes(expected):
            return False
        b, k = self._bk(path)
        try:
            if etag:
                self.c.delete_object(Bucket=b, Key=k, IfMatch=etag)
                return True
        except Exception as e:
            code, status = _s3_error(e)
            if code in ("PreconditionFailed", "412") or status == 412:
                return False  # re-acquired after our read: NOT removed
            if code not in (
                "InvalidArgument", "NotImplemented", "ParamValidationError",
            ):
                raise
            # else: deployment without conditional delete — fall through
        self.c.delete_object(Bucket=b, Key=k)
        return True

    def open_output(self, path):
        fs = self

        class _Out(io.BytesIO):
            def close(self_inner):
                fs.write_bytes(path, self_inner.getvalue())
                super().close()

            def __exit__(self_inner, *a):
                self_inner.close()

        return _Out()

    def open_input(self, path):
        return io.BytesIO(self.read_bytes(path))

    def open_append(self, path):
        try:
            existing = self.read_bytes(path)
        except FileNotFoundError:
            existing = b""
        out = self.open_output(path)
        out.write(existing)
        return out

    def rmdir_if_empty(self, path):
        pass  # directories are implicit

    def mkdirs(self, path):
        pass  # directories are implicit

    def rmtree(self, path):
        b, k = self._bk(path)
        k = k.rstrip("/")
        keys: list[str] = []
        token = None
        while True:
            kw = {"Bucket": b, "Prefix": k + "/"}
            if token:
                kw["ContinuationToken"] = token
            resp = self.c.list_objects_v2(**kw)
            keys += [o["Key"] for o in resp.get("Contents") or []]
            if not resp.get("IsTruncated"):
                break
            token = resp.get("NextContinuationToken")
        try:
            self.c.head_object(Bucket=b, Key=k)
            keys.append(k)
        except Exception:
            pass
        for i in range(0, len(keys), 1000):
            self.c.delete_objects(
                Bucket=b,
                Delete={"Objects": [{"Key": x} for x in keys[i:i + 1000]]},
            )


_memory_fs = MemoryFS()
_local_fs = LocalFS()


def get_fs(path: str, spark=None) -> ArcFileSystem:
    """Resolve the filesystem for ``path`` by scheme. ``memory://`` is the
    in-process test store; bare paths are POSIX; ``s3://`` prefers the
    native conditional-PUT backend when boto3 is importable
    (``ARC_S3_FS=hadoop`` forces the connector path, ``=native`` makes a
    missing boto3 an error); anything else goes through Hadoop (requires
    an active SparkSession for the JVM)."""
    s = scheme_of(path)
    if s in ("", "file") and os.environ.get("ARC_FORCE_HADOOP_FS") != "1":
        return _local_fs
    if s == "memory":
        return _memory_fs
    if s in ("s3", "s3a", "s3n"):
        mode = os.environ.get("ARC_S3_FS", "auto")
        if mode != "hadoop":
            try:
                return S3ObjectFS()
            except ImportError:
                if mode == "native":
                    raise
    if spark is None:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError(
                f"a SparkSession is required to access {path!r} via Hadoop FS"
            )
    return HadoopFS(spark, path)
