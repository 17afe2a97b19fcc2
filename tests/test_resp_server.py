"""In-process RESP integration tests.

Mirrors the reference's pattern of constructing a real server on a random
port inside the test and driving it with a Redis client (SURVEY §4
pattern 2; ref: CommandRegistryTests.cs:16-63, BasicConnectionTests.cs,
tests/smoke_test.py) — here with our own RespServer + RespClient.
"""

import asyncio
import json
import threading

import numpy as np
import pytest

from pyrope_tpu.cache import StaticPolicyEngine
from pyrope_tpu.security import AuthSettings
from pyrope_tpu.server.engine import EngineConfig, PyropeEngine
from pyrope_tpu.server.resp import RespServer
from pyrope_tpu.server.resp_client import RespClient, RespError
from pyrope_tpu.utils.parsing import encode_vector


class ServerHandle:
    def __init__(self, auth_enabled=False):
        self.engine = PyropeEngine(
            EngineConfig(auth=AuthSettings(enabled=auth_enabled, admin_api_key="adm"))
        )
        self.engine.policy = StaticPolicyEngine(ttl_seconds=60)
        self.server = RespServer(self.engine, "127.0.0.1", 0)
        self.loop = asyncio.new_event_loop()
        self._started = threading.Event()
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()
        self._started.wait(timeout=10)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_until_complete(self.server.start())
        self._started.set()
        self.loop.run_forever()

    def client(self) -> RespClient:
        return RespClient("127.0.0.1", self.server.port)

    def stop(self):
        asyncio.run_coroutine_threadsafe(self.server.stop(), self.loop).result(5)
        self.loop.call_soon_threadsafe(self.loop.stop)
        self.thread.join(timeout=5)


@pytest.fixture(scope="module")
def srv():
    h = ServerHandle(auth_enabled=False)
    yield h
    h.stop()


@pytest.fixture(scope="module")
def auth_srv():
    h = ServerHandle(auth_enabled=True)
    h.engine.tenants.create("t1", api_key="sekret")
    yield h
    h.stop()


def test_ping_echo(srv):
    with srv.client() as c:
        assert c.ping()
        assert c.execute("ECHO", "hello") == "hello"


def test_add_search_roundtrip_json_payload(srv):
    with srv.client() as c:
        for i in range(20):
            v = [float(i), float(i) * 2, 0.5, 1.0]
            assert c.vec_add("t1", "rt", f"v{i}", json.dumps(v).encode()) == "VEC_OK"
        hits = c.vec_search("t1", "rt", json.dumps([5.0, 10.0, 0.5, 1.0]).encode(), 3)
        assert hits[0][0] == "v5"
        # scores descending
        scores = [float(h[1]) for h in hits]
        assert scores == sorted(scores, reverse=True)


def test_binary_payload_and_stats(srv):
    rng = np.random.default_rng(0)
    vecs = rng.random((10, 16), dtype=np.float32)
    with srv.client() as c:
        for i in range(10):
            assert c.vec_upsert("t2", "bin", f"b{i}", encode_vector(vecs[i])) == "VEC_OK"
        hits = c.vec_search("t2", "bin", encode_vector(vecs[4]), 1)
        assert hits[0][0] == "b4"
        stats = c.vec_stats("t2", "bin")
        assert stats["count"] == 10 and stats["dim"] == 16


def test_filter_and_with_meta(srv):
    with srv.client() as c:
        c.vec_add("t1", "fm", "a", b"[1,0]", "META", '{"lang":"en"}', "TAGS", "x,y")
        c.vec_add("t1", "fm", "b", b"[0.9,0]", "TAGS", "x")
        hits = c.vec_search("t1", "fm", b"[1,0]", 5, "FILTER", "y", "WITH_META")
        assert len(hits) == 1
        assert hits[0][0] == "a"
        assert json.loads(hits[0][2]) == {"lang": "en"}


def test_trace_second_element(srv):
    with srv.client() as c:
        c.vec_add("t1", "tr", "a", b"[1,2,3]")
        reply = c.vec_search("t1", "tr", b"[1,2,3]", 1, "TRACE", "REQUEST_ID", "r-9")
        hits, trace_json = reply
        tr = json.loads(trace_json)
        assert tr["request_id"] == "r-9"
        assert tr["cache_hit"] is False
        # repeat -> cache hit in trace
        reply2 = c.vec_search("t1", "tr", b"[1,2,3]", 1, "TRACE")
        tr2 = json.loads(reply2[1])
        assert tr2["cache_hit"] is True and tr2["cache_level"] == "L0"


def test_delete_visibility(srv):
    with srv.client() as c:
        c.vec_add("t1", "dv", "gone", b"[5,5]")
        c.vec_add("t1", "dv", "stay", b"[5,4]")
        assert c.vec_del("t1", "dv", "gone") == "VEC_OK"
        hits = c.vec_search("t1", "dv", b"[5,5]", 5)
        assert [h[0] for h in hits] == ["stay"]
        with pytest.raises(RespError) as e:
            c.vec_del("t1", "dv", "gone")
        assert e.value.code == "VEC_ERR_NOT_FOUND"


def test_dim_mismatch_error(srv):
    with srv.client() as c:
        c.vec_add("t1", "dim", "a", b"[1,2,3]")
        with pytest.raises(RespError) as e:
            c.vec_search("t1", "dim", b"[1,2]", 5)
        assert e.value.code == "VEC_ERR_DIM"


def test_unknown_command(srv):
    with srv.client() as c:
        with pytest.raises(RespError) as e:
            c.execute("VEC.NOPE")
        assert "unknown command" in str(e.value)


def test_search_options_passthrough(srv):
    with srv.client() as c:
        for i in range(30):
            c.vec_add("t1", "opt", f"o{i}", json.dumps([float(i)] * 4).encode())
        hits = c.vec_search(
            "t1", "opt", json.dumps([3.0] * 4).encode(), 5, "MAX_SCANS", 5
        )
        assert len(hits) <= 5


def test_auth_required(auth_srv):
    with auth_srv.client() as c:
        with pytest.raises(RespError) as e:
            c.vec_add("t1", "ax", "a", b"[1,2]")
        assert e.value.code == "VEC_ERR_AUTH"
        # per-command API_KEY works without session auth
        assert c.vec_add("t1", "ax", "a", b"[1,2]", "API_KEY", "sekret") == "VEC_OK"


def test_auth_session_flow(auth_srv):
    with auth_srv.client() as c:
        with pytest.raises(RespError):
            c.auth("t1", "wrong")
        assert c.auth("t1", "sekret")
        assert c.vec_add("t1", "ax2", "a", b"[1,2]") == "VEC_OK"
        hits = c.vec_search("t1", "ax2", b"[1,2]", 1)
        assert hits[0][0] == "a"
    # a NEW connection has no session
    with auth_srv.client() as c2:
        with pytest.raises(RespError) as e:
            c2.vec_add("t1", "ax2", "b", b"[3,4]")
        assert e.value.code == "VEC_ERR_AUTH"


def test_session_scoped_search_without_tenant_arg(auth_srv):
    with auth_srv.client() as c:
        assert c.auth("t1", "sekret")
        c.vec_add("t1", "sc", "a", b"[7,8]")
        # reference form: VEC.SEARCH index TOPK k VECTOR ... (tenant from session)
        hits = c.execute("VEC.SEARCH", "sc", "TOPK", 1, "VECTOR", b"[7,8]")
        assert hits[0][0] == "a"


def test_concurrent_clients(srv):
    # multi-client smoke: the asyncio server interleaves connections
    def worker(n, out):
        with srv.client() as c:
            for i in range(10):
                c.vec_upsert("tc", "cc", f"w{n}-{i}", encode_vector(
                    np.full(8, n * 100 + i, np.float32)))
            out.append(True)

    threads, out = [], []
    for n in range(4):
        t = threading.Thread(target=worker, args=(n, out))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=30)
    assert len(out) == 4
    with srv.client() as c:
        assert c.vec_stats("tc", "cc")["count"] == 40


# ---- write coalescing (engine.write_batch + AsyncWriteCoalescer) -----------

def test_concurrent_writers_coalesce(srv):
    """Concurrent per-row VEC.UPSERTs share engine.write_batch passes; every
    row lands and is searchable, and the coalescer saw multi-row groups."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(160, 8)).astype(np.float32)
    # prime: the FIRST write auto-creates the index on the thread-pool path
    # (host_write_cheap is unknowable before the index exists), so it never
    # rides the coalescer — create the index before counting
    with srv.client() as c:
        assert c.vec_upsert("t", "coal", "prime",
                            encode_vector(vecs[0])) == "VEC_OK"
    before = srv.server.write_coalescer.stats.queries

    def writer(w):
        with srv.client() as c:
            for i in range(w * 40, (w + 1) * 40):
                assert c.vec_upsert("t", "coal", f"w{i}",
                                    encode_vector(vecs[i])) == "VEC_OK"

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    st = srv.server.write_coalescer.to_dict()
    assert srv.server.write_coalescer.stats.queries - before == 160
    # the drain rounds must produce real multi-row groups under 4
    # concurrent writers (1 would mean every write ran solo)
    assert st["max_batch_seen"] >= 2
    with srv.client() as c:
        hits = c.vec_search("t", "coal", encode_vector(vecs[7]), 1)
        assert hits[0][0] == "w7"


def test_write_batch_per_row_errors(srv):
    """A duplicate ADD inside a coalesced group fails only its own row."""
    from pyrope_tpu.service import VectorRecord

    v = np.ones(8, np.float32)
    recs = [VectorRecord(id="dup", vector=v), VectorRecord(id="dup", vector=v),
            VectorRecord(id="okx", vector=v * 2),
            VectorRecord(id="bad", vector=np.ones(5, np.float32))]
    out = srv.engine.write_batch("t", "wb", recs, [False] * 4)
    assert [r.ok for r in out] == [True, False, True, False]
    assert "exists" in out[1].error_message
    assert "dim" in out[3].error_message
    # upsert of the same id succeeds per-row
    out2 = srv.engine.write_batch("t", "wb", recs[:1], [True])
    assert out2[0].ok


def test_pipelined_writer_roundtrip(srv):
    """RESP pipelining: N outstanding upserts on one connection, replies in
    FIFO order."""
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(32, 8)).astype(np.float32)
    with srv.client() as c:
        for i in range(32):
            c.send("VEC.UPSERT", "t", "pipe", f"p{i}", "VECTOR",
                   encode_vector(vecs[i]))
        for i in range(32):
            assert c.read_reply() == "VEC_OK"
        hits = c.vec_search("t", "pipe", encode_vector(vecs[11]), 1)
        assert hits[0][0] == "p11"
