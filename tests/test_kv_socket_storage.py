"""Out-of-process socket KV storage (mdbloom.spark.kvserver) — the
reference's networked-storage role (`IgniteStorage.java:48-101`) proven
against a REAL process boundary: a stdlib TCP server subprocess holds the
value multimap, the client backend moves payloads through the Serde, and
failure injection (server killed) must trip the resume guard, not corrupt
results."""

import pytest

from mdbloom.spark.build import BloomIndexWriter, IndexConfig
from mdbloom.spark.query import BloomIndexReader
from mdbloom.spark.kvserver import SocketKVStorage, spawn_kv_server
from mdbloom.spark.storage import register_storage_backend
from mdbloom.spark.transcripts import synthesize_transcripts


def _rows(df, cols=("conv_id", "turn_idx")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture(scope="module")
def kv_server():
    proc, port = spawn_kv_server()
    yield port
    proc.terminate()
    proc.wait(timeout=10)


@pytest.fixture(scope="module")
def small_df(spark):
    return synthesize_transcripts(spark, 600, seed=42).cache()


@pytest.fixture(scope="module")
def socket_paths(spark, small_df, kv_server, tmp_path_factory):
    """The SAME input built under parquet and the socket backend."""
    register_storage_backend("socket",
                             SocketKVStorage("127.0.0.1", kv_server))
    base = tmp_path_factory.mktemp("kv")
    paths = {}
    for name in ("parquet", "socket"):
        cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                          chunk_slots=256, storage_backend=name)
        p = str(base / name)
        BloomIndexWriter(spark, cfg).build(small_df, p)
        paths[name] = p
    return paths


def test_socket_backend_answers_identically(spark, socket_paths):
    """search / linear / batched search return THE SAME ROWS whether the
    value multimap lives in parquet or across the socket — storage
    placement cannot change query answers (the q38/q45 contract)."""
    rp = BloomIndexReader(spark, socket_paths["parquet"])
    rs = BloomIndexReader(spark, socket_paths["socket"])
    assert rs.cfg.storage_backend == "socket"
    q = rp.transcript_query_tokens("assistant", "Bash", ["w00001"])
    assert _rows(rp.search(q)) == _rows(rs.search(q))
    assert _rows(rp.search_linear(q)) == _rows(rs.search_linear(q))
    batch = {"a": q, "every": [], "miss": ["tok=absentzz"]}
    cols = ("query", "conv_id", "turn_idx")
    assert _rows(rp.search_many(batch), cols) \
        == _rows(rs.search_many(batch), cols)


def test_socket_backend_full_row_parity(spark, socket_paths):
    """Every storage row round-trips the wire Serde byte-faithfully:
    the COMPLETE storage table (all columns, same dtypes) from the
    socket store equals the parquet store's."""
    rp = BloomIndexReader(spark, socket_paths["parquet"])
    rs = BloomIndexReader(spark, socket_paths["socket"])
    cols = sorted(c for c in rp.storage().columns if c != "filter")
    a = sorted(map(tuple, rp.storage().select(*cols).collect()))
    b = sorted(map(tuple, rs.storage().select(*cols).collect()))
    assert a == b and len(a) >= 500


def test_socket_backend_resume_skips_then_killed_server_forces_rebuild(
        spark, small_df, tmp_path):
    """Lifecycle + failure injection: resume with a LIVE server skips all
    fingerprint-matched shards; with the server KILLED, exists() is
    False so the guard forces a clean rebuild (onto a fresh server)
    instead of resuming onto missing values; read() against the dead
    server fails loudly with the remedy."""
    proc, port = spawn_kv_server()
    register_storage_backend("socket-fi",
                             SocketKVStorage("127.0.0.1", port))
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                      chunk_slots=256, storage_backend="socket-fi")
    p = str(tmp_path / "idx")
    w = BloomIndexWriter(spark, cfg)
    w.build(small_df, p)
    n = small_df.count()
    stats = w.build(small_df, p, resume=True)
    assert stats["built"] == 0 and stats["skipped"] == 4
    r = BloomIndexReader(spark, p)
    assert r.storage().count() == n

    proc.terminate()
    proc.wait(timeout=10)
    with pytest.raises(Exception, match="unreachable"):
        BloomIndexReader(spark, p).storage().count()

    # new server (fresh, empty store) at a new port under the same name:
    # exists() finds nothing -> full rebuild, then queries work again
    proc2, port2 = spawn_kv_server()
    try:
        register_storage_backend("socket-fi",
                                 SocketKVStorage("127.0.0.1", port2))
        stats = BloomIndexWriter(spark, cfg).build(small_df, p,
                                                   resume=True)
        assert stats["built"] == 4 and stats["skipped"] == 0
        assert BloomIndexReader(spark, p).storage().count() == n
    finally:
        proc2.terminate()
        proc2.wait(timeout=10)


def test_socket_backend_remove_and_drop_shards(spark, small_df,
                                               kv_server, tmp_path):
    """Deletes stay durable parquet tombstones; the reader's anti-join
    hides removed rows from the socket store too, and compaction's
    drop_shards reaches across the wire."""
    import os
    register_storage_backend("socket",
                             SocketKVStorage("127.0.0.1", kv_server))
    cfg = IndexConfig(n_per_record=40, probability=1e-3, n_shards=4,
                      chunk_slots=256, storage_backend="socket")
    p = str(tmp_path / "idx")
    w = BloomIndexWriter(spark, cfg)
    w.build(small_df, p)
    n = small_df.count()
    victim = small_df.orderBy("conv_id", "turn_idx").limit(1)
    w.remove(victim.select("conv_id", "turn_idx"), p)
    assert os.path.isdir(os.path.join(p, "tombstones"))
    assert BloomIndexReader(spark, p).storage().count() == n - 1
