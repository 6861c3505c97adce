"""Out-of-process socket KV storage backend — the live counterpart of the
reference's networked storage (`IgniteStorage.java:48-101`: every
``cache.get/getAndPut/remove/query`` is a client→server RPC with values
serialized through a ``Serde<E>`` — `Serde.java:20-24`; its ``list()`` is
a server-side ``ScanQuery``, `IgniteStorage.java:88-101`).

Two halves, both stdlib-only:

* :class:`KVServer` / ``python -m mdbloom.spark.kvserver`` — a threaded
  TCP server holding the multimap ``{index path -> {schema, shards}}``
  in its own process. Protocol: 4-byte big-endian length + JSON
  (value blobs base64), ops ``put_shards`` (dynamic-overwrite: replace
  exactly the shards present), ``scan``, ``exists``, ``clear``,
  ``drop_shards``, ``ping``.
* :class:`SocketKVStorage` — a :class:`~mdbloom.spark.storage
  .StorageBackend` client: payload rows cross the wire as Serde bytes
  (index-native columns shard/key/filter bypass the Serde, exactly the
  reference's rule — `IgniteStorage.java:43-46`).

Failure semantics (tested): a dead/unreachable server makes
``exists()`` return False — so ``build(resume=True)``'s
storage-existence guard forces a clean rebuild instead of resuming onto
missing values (the same guard the driver-resident memory backend
trips in a new process) — while ``read()`` raises a clear
``ConnectionError`` (a query cannot silently return empty results
because its storage vanished).

Scale contract (stated, as for MemoryKVStorage): the client moves rows
through the driver — this backend exists to prove the SPI against real
process/network boundaries and latency, not to be the 100 TB path
(that is parquet/Iceberg). A production KV backend keeps this exact
interface and streams per-partition.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import socket
import socketserver
import struct
import subprocess
import sys
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from mdbloom.spark.storage import JsonSerde, Serde, StorageBackend


# ------------------------------------------------------------- framing
def _send_msg(sock: socket.socket, obj: dict) -> None:
    data = json.dumps(obj).encode()
    sock.sendall(struct.pack(">I", len(data)) + data)


def _recv_msg(sock: socket.socket) -> dict:
    hdr = _recv_exact(sock, 4)
    (n,) = struct.unpack(">I", hdr)
    return json.loads(_recv_exact(sock, n).decode())


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("KV peer closed mid-message")
        buf.extend(chunk)
    return bytes(buf)


# -------------------------------------------------------------- server
class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        stores = self.server.stores        # type: ignore[attr-defined]
        lock = self.server.lock            # type: ignore[attr-defined]
        try:
            while True:
                req = _recv_msg(self.request)
                op = req["op"]
                path = req.get("path")
                with lock:
                    if op == "ping":
                        resp = {"ok": True}
                    elif op == "put_shards":
                        st = stores.setdefault(
                            path, {"schema": None, "shards": {}})
                        st["schema"] = req["schema"]
                        # dynamic-overwrite: replace ONLY shards present
                        for s, recs in req["shards"].items():
                            st["shards"][int(s)] = recs
                        resp = {"ok": True}
                    elif op == "scan":  # IgniteStorage.java:88-101
                        st = stores.get(path)
                        if st is None or st["schema"] is None:
                            resp = {"ok": True, "schema": None,
                                    "rows": []}
                        else:
                            rows = [r for recs in st["shards"].values()
                                    for r in recs]
                            resp = {"ok": True, "schema": st["schema"],
                                    "rows": rows}
                    elif op == "exists":
                        st = stores.get(path)
                        resp = {"ok": True,
                                "exists": bool(st and st["schema"])}
                    elif op == "clear":
                        stores.pop(path, None)
                        resp = {"ok": True}
                    elif op == "drop_shards":
                        st = stores.get(path)
                        if st is not None:
                            for s in req["shards"]:
                                st["shards"].pop(int(s), None)
                        resp = {"ok": True}
                    else:
                        resp = {"ok": False,
                                "error": f"unknown op {op!r}"}
                _send_msg(self.request, resp)
        except (ConnectionError, OSError):
            return  # client went away — per-connection loop ends


class KVServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        super().__init__((host, port), _Handler)
        self.stores: dict = {}
        self.lock = threading.Lock()


def serve(host: str = "127.0.0.1", port: int = 0) -> None:
    srv = KVServer(host, port)
    # parent reads the bound port from the first stdout line
    print(f"KVSERVER PORT {srv.server_address[1]}", flush=True)
    srv.serve_forever()


def spawn_kv_server() -> tuple[subprocess.Popen, int]:
    """Launch the server as a SUBPROCESS (real process boundary) and
    return (proc, port). Caller owns the lifecycle (terminate())."""
    proc = subprocess.Popen(
        [sys.executable, "-m", "mdbloom.spark.kvserver"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        cwd=os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))),
        text=True)
    line = proc.stdout.readline()
    if not line.startswith("KVSERVER PORT "):
        proc.terminate()
        raise RuntimeError(f"kv server failed to start: {line!r}")
    return proc, int(line.split()[-1])


# -------------------------------------------------------------- client
class SocketKVStorage(StorageBackend):
    """StorageBackend over the socket server — the IgniteStorage client
    role. Register under a name and point ``IndexConfig.storage_backend``
    at it; every process opening the index must register a client for
    the SAME server (the reference's Ignite client carries the same
    deployment contract)."""

    name = "socket"

    def __init__(self, host: str, port: int,
                 serde: Serde | None = None,
                 timeout_s: float = 10.0):
        self.host, self.port = host, int(port)
        self.serde = serde or JsonSerde()
        self.timeout_s = timeout_s

    NATIVE = ("shard", "key", "filter")

    def _rpc(self, req: dict) -> dict:
        with socket.create_connection((self.host, self.port),
                                      timeout=self.timeout_s) as s:
            _send_msg(s, req)
            resp = _recv_msg(s)
        if not resp.get("ok"):
            raise RuntimeError(f"KV server error: {resp.get('error')}")
        return resp

    def write(self, df: DataFrame, path: str) -> None:
        cols = df.columns
        native = [c for c in cols if c in self.NATIVE]
        payload = [c for c in cols if c not in self.NATIVE]
        by_shard: dict[int, list] = {}
        for row in df.collect():
            d = row.asDict()
            rec = [
                {c: self._enc_native(d[c]) for c in native},
                base64.b64encode(self.serde.serialize(
                    {c: d[c] for c in payload})).decode(),
            ]
            by_shard.setdefault(int(d["shard"]), []).append(rec)
        self._rpc({"op": "put_shards", "path": os.path.abspath(path),
                   "schema": df.schema.json(),
                   "shards": {str(s): r for s, r in by_shard.items()}})

    @staticmethod
    def _enc_native(v):
        # native columns are shard:int, key:str, filter:array<long> —
        # JSON-safe except that Spark hands filter back as a list already
        return list(v) if isinstance(v, (tuple,)) else v

    def read(self, spark: SparkSession, path: str) -> DataFrame:
        try:
            resp = self._rpc({"op": "scan",
                              "path": os.path.abspath(path)})
        except (ConnectionError, OSError) as ex:
            raise ConnectionError(
                f"socket KV storage for index {path!r} is unreachable "
                f"at {self.host}:{self.port} ({ex}) — a query cannot "
                "proceed without its value store; restart the server or "
                "rebuild on a reachable backend") from ex
        if resp["schema"] is None:
            raise KeyError(
                f"no socket-KV storage for index {path!r} on "
                f"{self.host}:{self.port} — rebuild the index against "
                "this server")
        schema = StructType.fromJson(json.loads(resp["schema"]))
        rows = []
        for native, blob in resp["rows"]:
            d = dict(native)
            d.update(self.serde.deserialize(base64.b64decode(blob)))
            rows.append(tuple(d[f.name] for f in schema.fields))
        return spark.createDataFrame(rows, schema)

    def exists(self, path: str) -> bool:
        try:
            return bool(self._rpc({"op": "exists",
                                   "path": os.path.abspath(path)}
                                  )["exists"])
        except (ConnectionError, OSError):
            # server gone == store gone: the resume guard must force a
            # clean rebuild, exactly like the memory backend in a new
            # process (tested: test_storage_spi.py)
            return False

    def clear(self, path: str) -> None:
        try:
            self._rpc({"op": "clear", "path": os.path.abspath(path)})
        except (ConnectionError, OSError):
            pass  # nothing reachable to clear

    def drop_shards(self, path: str, shards: list) -> None:
        self._rpc({"op": "drop_shards", "path": os.path.abspath(path),
                   "shards": [int(s) for s in shards]})


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=0)
    args = ap.parse_args()
    serve(args.host, args.port)
