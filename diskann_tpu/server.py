"""Vector-set wire protocol: a RESP2 (Redis protocol) server + client.

The reference ships its vector-set surface as a Garnet (Redis-dialect
server) module over C FFI (`diskann-garnet/src/lib.rs:222-835`), serving
the `VADD` / `VSIM` command family; the separate `vectorset` crate is the
wire client.  The TPU-native analogue keeps the index engine in-process
with the device (one Python host owns the chip — a C ABI boundary would
only add a copy) and exposes the SAME command contract over real RESP2,
so any Redis-protocol client can drive it:

    VCREATE key dim [METRIC l2|ip|cosine] [M maxdeg] [EF lbuild]
    VDROP key
    VLIST
    VADD key VALUES n v1..vn ELE name [SETATTR json]   -> :1 / :0 (dup name)
    VREM key name                                      -> :1 / :0
    VCARD key                                          -> :n
    VSIM key (VALUES n v1..vn | ELE name) [COUNT k] [EF l]
         [FILTER expr] [WITHSCORES]                    -> names [+ scores]
    VSETATTR key name json / VGETATTR key name
    VQUANT key kind        (build_quant_table + backfill_quant_vectors)
    VSCAN key VALUES n v1..vn [COUNT page]  -> [cursor, names...]
    VSCAN key CONT cursor [COUNT page]      -> [names...]   (empty = done)
    VSCAN key END cursor                    -> :1 / :0
    PING

Engine semantics live in `diskann_tpu.service` (registry, name<->id maps,
write buffering, incremental label sync, paged cursors); this module is
pure protocol: parse RESP2 arrays, dispatch, encode replies.  Commands
execute under one lock — the host owns ONE chip and device dispatch
serializes anyway, so per-connection parallelism would only interleave
half-built states.
"""

from __future__ import annotations

import json
import socket
import socketserver
import threading

import numpy as np

from diskann_tpu.service import VectorService

# --------------------------------------------------------------------- RESP2


def _encode(obj) -> bytes:
    """Python value -> RESP2 reply bytes."""
    if obj is None:
        return b"$-1\r\n"
    if isinstance(obj, bool):
        return f":{int(obj)}\r\n".encode()
    if isinstance(obj, int):
        return f":{obj}\r\n".encode()
    if isinstance(obj, SimpleString):
        return f"+{obj}\r\n".encode()
    if isinstance(obj, Error):
        return f"-ERR {obj}\r\n".encode()
    if isinstance(obj, float):
        obj = repr(obj)
    if isinstance(obj, str):
        obj = obj.encode()
    if isinstance(obj, bytes):
        return b"$%d\r\n%s\r\n" % (len(obj), obj)
    if isinstance(obj, (list, tuple)):
        return b"*%d\r\n%s" % (len(obj), b"".join(_encode(o) for o in obj))
    raise TypeError(f"cannot encode {type(obj)!r}")


class SimpleString(str):
    """Reply rendered as +str instead of a bulk string."""


class Error(str):
    """Reply rendered as -ERR str."""


OK = SimpleString("OK")


class _Reader:
    """Incremental RESP2 parser over a socket file."""

    def __init__(self, rfile):
        self.rfile = rfile

    def _line(self) -> bytes:
        line = self.rfile.readline()
        if not line:
            raise ConnectionError("peer closed")
        return line.rstrip(b"\r\n")

    def read(self):
        line = self._line()
        t, body = line[:1], line[1:]
        if t == b"*":                       # array
            n = int(body)
            if n < 0:
                return None
            return [self.read() for _ in range(n)]
        if t == b"$":                       # bulk string
            n = int(body)
            if n < 0:
                return None
            data = self.rfile.read(n + 2)[:-2]
            return data
        if t == b":":
            return int(body)
        if t == b"+":
            return body.decode()
        if t == b"-":
            raise ResponseError(body.decode())
        raise ProtocolError(f"bad RESP type byte {t!r}")


class ProtocolError(Exception):
    pass


class ResponseError(Exception):
    """Server-side -ERR reply, raised client-side."""


# -------------------------------------------------------------------- server


def _s(b) -> str:
    return b.decode() if isinstance(b, (bytes, bytearray)) else str(b)


def _parse_values(args: list, i: int) -> tuple[np.ndarray, int]:
    """Parse `VALUES n v1..vn` at position i; returns (vector, next_i)."""
    if _s(args[i]).upper() != "VALUES":
        raise ValueError("expected VALUES")
    n = int(_s(args[i + 1]))
    vec = np.array([float(_s(v)) for v in args[i + 2 : i + 2 + n]],
                   np.float32)
    if len(vec) != n:
        raise ValueError(f"VALUES promised {n} floats, got {len(vec)}")
    return vec, i + 2 + n


class VectorSetHandler(socketserver.StreamRequestHandler):
    def handle(self):
        reader = _Reader(self.rfile)
        while True:
            try:
                cmd = reader.read()
            except (ConnectionError, ValueError):
                return
            if cmd is None or not isinstance(cmd, list) or not cmd:
                self.wfile.write(_encode(Error("expected command array")))
                continue
            name = _s(cmd[0]).upper()
            if name == "QUIT":
                self.wfile.write(_encode(OK))
                return
            with self.server.lock:
                try:
                    reply = self.server.dispatch(name, cmd[1:])
                except ResponseError as e:
                    reply = Error(str(e))
                except KeyError as e:
                    reply = Error(f"no such index/element {e}")
                except Exception as e:  # malformed args, engine errors
                    reply = Error(f"{type(e).__name__}: {e}")
            self.wfile.write(_encode(reply))
            self.wfile.flush()


class VectorSetServer(socketserver.ThreadingTCPServer):
    """RESP2 front-end over a `VectorService` registry."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 service: VectorService | None = None):
        super().__init__((host, port), VectorSetHandler)
        self.service = service or VectorService()
        self.lock = threading.RLock()

    @property
    def address(self) -> tuple[str, int]:
        return self.server_address[:2]

    def serve_background(self) -> tuple[str, int]:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        self._thread = t
        return self.address

    # ---------------------------------------------------------- dispatch
    def dispatch(self, name: str, args: list):
        svc = self.service
        if name == "PING":
            return SimpleString("PONG")
        if name == "VLIST":
            return svc.names()
        if name == "VCREATE":
            key, dim = _s(args[0]), int(_s(args[1]))
            kw = {}
            i = 2
            while i < len(args):
                opt = _s(args[i]).upper()
                if opt == "METRIC":
                    kw["metric"] = _s(args[i + 1]).lower()
                elif opt == "M":
                    kw["max_degree"] = int(_s(args[i + 1]))
                elif opt == "EF":
                    kw["l_build"] = int(_s(args[i + 1]))
                else:
                    return Error(f"unknown VCREATE option {opt}")
                i += 2
            svc.create_index(key, dim, **kw)
            return OK
        if name == "VDROP":
            return svc.drop_index(_s(args[0]))

        vs = svc.get(_s(args[0]))
        args = args[1:]
        if name == "VADD":
            vec, i = _parse_values(args, 0)
            if _s(args[i]).upper() != "ELE":
                return Error("expected ELE name")
            ele = _s(args[i + 1])
            attr = None
            if len(args) > i + 2 and _s(args[i + 2]).upper() == "SETATTR":
                attr = json.loads(_s(args[i + 3]))
            return vs.add(ele, vec, attr)
        if name == "VREM":
            return vs.remove(_s(args[0]))
        if name == "VCARD":
            return vs.card()
        if name == "VSETATTR":
            return vs.set_attribute(_s(args[0]), json.loads(_s(args[1])))
        if name == "VGETATTR":
            a = vs.get_attribute(_s(args[0]))
            return None if a is None else json.dumps(a)
        if name == "VQUANT":
            vs.build_quant_table(_s(args[0]).lower() if args else "spherical")
            vs.backfill_quant_vectors()
            return OK
        if name == "VSIM":
            i = 0
            ele = None
            if _s(args[0]).upper() == "ELE":
                ele, i = _s(args[1]), 2
            else:
                vec, i = _parse_values(args, 0)
            k, l, flt, withscores = 10, None, None, False
            while i < len(args):
                opt = _s(args[i]).upper()
                if opt == "COUNT":
                    k, i = int(_s(args[i + 1])), i + 2
                elif opt == "EF":
                    l, i = int(_s(args[i + 1])), i + 2
                elif opt == "FILTER":
                    flt, i = _s(args[i + 1]), i + 2
                elif opt == "WITHSCORES":
                    withscores, i = True, i + 1
                else:
                    return Error(f"unknown VSIM option {opt}")
            if ele is not None:
                if flt is not None:
                    return Error("FILTER with ELE is not supported")
                out = vs.search_element(ele, k, l_search=l)
            elif flt is not None:
                out = vs.search_vector_filtered(vec, flt, k, l_search=l)
            else:
                out = vs.search_vector(vec, k, l_search=l)
            if withscores:
                return [x for n_, d_ in out for x in (n_, d_)]
            return [n_ for n_, _ in out]
        if name == "VSCAN":
            sub = _s(args[0]).upper()
            if sub == "CONT":
                cursor = int(_s(args[1]))
                page = int(_s(args[3])) if len(args) > 3 else 10
                return [n_ for n_, _ in vs.continue_search(cursor, page)]
            if sub == "END":
                return vs.end_search(int(_s(args[1])))
            vec, i = _parse_values(args, 0)
            page = 10
            if i < len(args) and _s(args[i]).upper() == "COUNT":
                page = int(_s(args[i + 1]))
            cursor, first = vs.start_search(vec, page)
            return [cursor] + [n_ for n_, _ in first]
        return Error(f"unknown command {name}")


# -------------------------------------------------------------------- client


class VectorSetClient:
    """Minimal blocking RESP2 client for `VectorSetServer` (the analogue of
    the reference's `vectorset` client crate)."""

    def __init__(self, host: str, port: int, timeout: float = 60.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.rfile = self.sock.makefile("rb")
        self.reader = _Reader(self.rfile)

    def close(self):
        try:
            self.execute("QUIT")
        except Exception:
            pass
        self.rfile.close()
        self.sock.close()

    def execute(self, *args):
        out = []
        for a in args:
            if isinstance(a, float):
                a = repr(a)
            if not isinstance(a, (bytes, bytearray)):
                a = str(a).encode()
            out.append(b"$%d\r\n%s\r\n" % (len(a), a))
        self.sock.sendall(b"*%d\r\n%s" % (len(args), b"".join(out)))
        return self.reader.read()

    # convenience wrappers
    def create(self, key: str, dim: int, **opts):
        args = ["VCREATE", key, dim]
        for k, v in opts.items():
            args += [k.upper(), v]
        return self.execute(*args)

    def add(self, key: str, name: str, vector, attribute=None) -> int:
        vector = np.asarray(vector, np.float32).ravel()
        args = ["VADD", key, "VALUES", len(vector), *vector.tolist(),
                "ELE", name]
        if attribute is not None:
            args += ["SETATTR", json.dumps(attribute)]
        return self.execute(*args)

    def sim(self, key: str, vector, k: int = 10, *, ef: int | None = None,
            filter: str | None = None, withscores: bool = False):
        vector = np.asarray(vector, np.float32).ravel()
        args = ["VSIM", key, "VALUES", len(vector), *vector.tolist(),
                "COUNT", k]
        if ef is not None:
            args += ["EF", ef]
        if filter is not None:
            args += ["FILTER", filter]
        if withscores:
            args.append("WITHSCORES")
        out = self.execute(*args)
        if withscores:
            return [(_s(out[i]), float(out[i + 1]))
                    for i in range(0, len(out), 2)]
        return [_s(x) for x in out]

    def sim_element(self, key: str, name: str, k: int = 10):
        return [_s(x) for x in
                self.execute("VSIM", key, "ELE", name, "COUNT", k)]

    def remove(self, key: str, name: str) -> int:
        return self.execute("VREM", key, name)

    def card(self, key: str) -> int:
        return self.execute("VCARD", key)


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="diskann_tpu vector-set server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=6399)
    a = p.parse_args(argv)
    srv = VectorSetServer(a.host, a.port)
    print(f"vector-set RESP2 server on {srv.address[0]}:{srv.address[1]}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
