"""RESP (Redis Serialization Protocol) codec + asyncio data-plane server.

Rebuild of the reference's Garnet-hosted command surface
(ref: Services/GarnetService.cs:92-104 registers VEC.ADD/VEC.UPSERT/
VEC.DEL/VEC.SEARCH/VEC.STATS; Extensions/VectorCommandSet.cs dispatches
them; Security/PyropeGarnetAuthenticator.cs:16-98 maps Redis ``AUTH
tenant:key`` onto the session). The reference embeds Microsoft Garnet; the
rebuild implements RESP2 directly on asyncio — any Redis client
(redis-cli, redis-py, StackExchange.Redis) can speak to it.

Blocking device work (index search) runs in a thread pool via
``asyncio.to_thread`` so the event loop keeps servicing connections while
the TPU computes.
"""

from __future__ import annotations

import asyncio
import json
from typing import Optional

from pyrope_tpu.security import SessionAuthContext
from pyrope_tpu.server import errors as ec
from pyrope_tpu.server.engine import PyropeEngine
from pyrope_tpu.server.parser import (
    ParseError,
    parse_delete,
    parse_search,
    parse_stats,
    parse_write,
)

CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# RESP2 encoding
# ---------------------------------------------------------------------------

def _line_safe(s: str) -> bytes:
    """Simple strings/errors are line-terminated; strip CR/LF from embedded
    (possibly client-supplied) text so replies can't be smuggled."""
    return s.replace("\r", " ").replace("\n", " ").encode()


def encode_simple(s: str) -> bytes:
    return b"+" + _line_safe(s) + CRLF


def encode_error(msg: str) -> bytes:
    return b"-" + _line_safe(msg) + CRLF


def encode_integer(n: int) -> bytes:
    return b":" + str(n).encode() + CRLF


def encode_bulk(data: "bytes | str | None") -> bytes:
    if data is None:
        return b"$-1" + CRLF
    if isinstance(data, str):
        data = data.encode()
    return b"$" + str(len(data)).encode() + CRLF + data + CRLF


def encode_array(items: "list | None") -> bytes:
    if items is None:
        return b"*-1" + CRLF
    out = b"*" + str(len(items)).encode() + CRLF
    for it in items:
        if isinstance(it, list):
            out += encode_array(it)
        elif isinstance(it, int):
            out += encode_integer(it)
        elif isinstance(it, float):
            out += encode_bulk(f"{it:.6g}")
        else:
            out += encode_bulk(it)
    return out


# ---------------------------------------------------------------------------
# RESP2 request parsing
# ---------------------------------------------------------------------------

class RespProtocolError(Exception):
    pass


async def read_command(reader: asyncio.StreamReader) -> Optional[list[bytes]]:
    """Read one client command: RESP array of bulk strings, or an inline
    command line. Returns None on clean EOF."""
    try:
        line = await reader.readline()
    except (ConnectionResetError, asyncio.IncompleteReadError):
        return None
    if not line:
        return None
    line = line.rstrip(b"\r\n")
    if not line:
        return []
    if line[0:1] == b"*":
        try:
            n = int(line[1:])
        except ValueError:
            raise RespProtocolError("bad array header")
        if n < 0 or n > 1024:
            raise RespProtocolError("bad array length")
        args: list[bytes] = []
        for _ in range(n):
            hdr = await reader.readline()
            if not hdr.startswith(b"$"):
                raise RespProtocolError("expected bulk string")
            try:
                ln = int(hdr[1:].rstrip(b"\r\n"))
            except ValueError:
                raise RespProtocolError("bad bulk length")
            if ln < 0 or ln > 64 * 1024 * 1024:
                raise RespProtocolError("bulk too large")
            data = await reader.readexactly(ln + 2)
            args.append(data[:-2])
        return args
    # inline command (redis-cli convenience)
    return line.split()


# ---------------------------------------------------------------------------
# Server
# ---------------------------------------------------------------------------

class RespServer:
    def __init__(self, engine: PyropeEngine, host: str = "127.0.0.1", port: int = 6379):
        self.engine = engine
        self.host = host
        self.port = port
        self._server: Optional[asyncio.AbstractServer] = None

    async def start(self) -> None:
        self._server = await asyncio.start_server(self._handle, self.host, self.port)
        addr = self._server.sockets[0].getsockname()
        self.port = addr[1]

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            await self._server.wait_closed()
            self._server = None

    async def serve_forever(self) -> None:
        if self._server is None:
            await self.start()
        async with self._server:
            await self._server.serve_forever()

    # ---- connection handler ----------------------------------------------

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        SessionAuthContext.clear()  # fresh per connection task
        try:
            while True:
                try:
                    args = await read_command(reader)
                except RespProtocolError as e:
                    writer.write(encode_error(f"ERR protocol: {e}"))
                    await writer.drain()
                    break
                if args is None:
                    break
                if not args:
                    continue
                resp = await self._dispatch(args)
                if resp is None:  # QUIT
                    writer.write(encode_simple("OK"))
                    await writer.drain()
                    break
                writer.write(resp)
                # drain() is flow control, not a flush — it only needs to
                # run when the transport buffer is actually backed up, and
                # awaiting it per response costs a scheduler hop on the hot
                # path (asyncio writes go to the socket from write() itself)
                if writer.transport.get_write_buffer_size() > 65536:
                    await writer.drain()
        except (ConnectionResetError, asyncio.IncompleteReadError, BrokenPipeError):
            pass
        finally:
            writer.close()
            try:
                await writer.wait_closed()
            except Exception:
                pass

    async def _dispatch(self, args: list[bytes]) -> Optional[bytes]:
        cmd = args[0].decode("utf-8", "replace").upper()
        try:
            if cmd == "PING":
                return encode_simple("PONG")
            if cmd == "QUIT":
                return None
            if cmd == "ECHO" and len(args) == 2:
                return encode_bulk(args[1])
            if cmd == "AUTH":
                return self._auth(args[1:])
            if cmd == "COMMAND":
                return encode_array([])
            if cmd == "VEC.ADD":
                return await self._write(args[1:], upsert=False)
            if cmd == "VEC.UPSERT":
                return await self._write(args[1:], upsert=True)
            if cmd == "VEC.DEL":
                return await self._delete(args[1:])
            if cmd == "VEC.SEARCH":
                return await self._search(args[1:])
            if cmd == "VEC.STATS":
                return self._stats(args[1:])
            return encode_error(f"ERR unknown command '{cmd}'")
        except ParseError as e:
            return encode_error(f"{ec.VEC_ERR_DIM} {e}")
        except Exception as e:  # never kill the connection on a bug
            return encode_error(f"ERR internal: {type(e).__name__}: {e}")

    # ---- AUTH (ref: PyropeGarnetAuthenticator.cs:16-98) --------------------

    def _auth(self, args: list[bytes]) -> bytes:
        if len(args) == 1:
            token = args[0].decode()
            if ":" in token:
                tenant, key = token.split(":", 1)
            else:
                return encode_error(f"{ec.VEC_ERR_AUTH} use AUTH tenant:key")
        elif len(args) == 2:  # ACL-style AUTH user pass == AUTH tenant key
            tenant, key = args[0].decode(), args[1].decode()
        else:
            return encode_error("ERR wrong number of arguments for AUTH")
        if self.engine.authenticator.authenticate(tenant, key):
            SessionAuthContext.set_tenant(tenant)
            return encode_simple("OK")
        SessionAuthContext.clear()
        return encode_error(f"{ec.VEC_ERR_AUTH} invalid credentials")

    # ---- VEC.* -------------------------------------------------------------

    async def _write(self, args: list[bytes], upsert: bool) -> bytes:
        req = parse_write(args)
        # buffer/slab-backed families write in microseconds of host work
        # (host_write_cheap) — serve those inline on the event loop; graph
        # families (HNSW per-row insert) and index auto-creation keep the
        # thread pool
        state = self.engine.registry.try_get(req.tenant, req.index)

        def call():
            return self.engine.add(
                req.tenant, req.index, req.id, req.vector,
                api_key=req.api_key, meta=req.meta, tags=req.tags,
                numeric_fields=req.numeric_fields, upsert=upsert,
            )

        if state is not None and state.index.host_write_cheap:
            r = call()
        else:
            r = await asyncio.to_thread(call)
        if r.ok:
            return encode_simple(ec.VEC_OK)
        return encode_error(f"{r.error_code} {r.error_message}")

    async def _delete(self, args: list[bytes]) -> bytes:
        req = parse_delete(args)
        # deletes are tombstones in every family — host dict work, inline
        r = self.engine.delete(
            req.tenant, req.index, req.id, api_key=req.api_key
        )
        if r.ok:
            return encode_simple(ec.VEC_OK)
        return encode_error(f"{r.error_code} {r.error_message}")

    async def _search(self, args: list[bytes]) -> bytes:
        req = parse_search(args, default_tenant=SessionAuthContext.get_tenant())
        # host-only leg INLINE on the event loop: a cache hit is ~70 us of
        # dict/numpy work, while the executor hop alone costs more — only a
        # miss (device work: L2 probe + engine dispatch) pays the thread
        r, cont = self.engine.search_begin(
            req.tenant, req.index, req.vector, req.top_k,
            api_key=req.api_key, filter_tags=req.filter_tags,
            with_meta=req.with_meta, trace=req.trace,
            request_id=req.request_id, cache_hint_force=req.cache_hint_force,
            options=req.options,
        )
        if r is None:
            try:
                r = await asyncio.get_running_loop().run_in_executor(
                    None, self.engine.search_resume, cont
                )
            except asyncio.CancelledError:
                # a cancel before the executor starts the fn means
                # search_resume (whose finally owns the release) never
                # runs — free the tenant lease here; release() is
                # idempotent, so a post-start cancel double-release is safe
                if cont.lease is not None:
                    cont.lease.release()
                raise
        if not r.ok:
            return encode_error(f"{r.error_code} {r.error_message}")
        hits = []
        for h in r.hits:
            row: list = [h.id, f"{h.score:.6g}"]
            if req.with_meta:
                row.append(json.dumps(h.meta) if h.meta is not None else None)
            hits.append(row)
        if req.trace and r.trace is not None:
            # hits array + trace JSON as 2nd element (ref :849-882)
            return encode_array([hits, json.dumps(r.trace.to_dict())])
        return encode_array(hits)

    def _stats(self, args: list[bytes]) -> bytes:
        req = parse_stats(args, default_tenant=SessionAuthContext.get_tenant())
        # same auth contract as every other VEC.* command (session or API_KEY)
        if not self.engine._authenticate(req.tenant, req.api_key):
            return encode_error(f"{ec.VEC_ERR_AUTH} authentication failed")
        s = self.engine.stats(req.tenant, req.index)
        if s is None:
            return encode_error(f"{ec.VEC_ERR_NOT_FOUND} index not found")
        flat: list = []
        for k, v in s.items():
            flat.append(k)
            flat.append(v if isinstance(v, int) else str(v))
        return encode_array(flat)
