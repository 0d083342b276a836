"""RESP2 wire protocol: server + client round-trip over a real socket.

The reference's vector-set surface is a Garnet (Redis-dialect) module
(`diskann-garnet/src/lib.rs:222-835`) plus the `vectorset` wire client;
this drives the same VADD/VSIM contract end-to-end over TCP.
"""

import numpy as np
import pytest

from diskann_tpu.server import VectorSetClient, VectorSetServer


@pytest.fixture(scope="module")
def server():
    srv = VectorSetServer(port=0)
    host, port = srv.serve_background()
    yield host, port
    srv.shutdown()


@pytest.fixture(scope="module")
def client(server):
    # generous socket timeout: the first VSIM compiles inside the server
    # thread, and on a contended single-core box that can exceed 60s
    c = VectorSetClient(*server, timeout=600.0)
    yield c
    c.close()


def test_wire_protocol_end_to_end(client):
    rng = np.random.default_rng(11)
    from diskann_tpu.server import ResponseError

    assert client.execute("PING") == "PONG"
    assert client.create("idx", 8, m=16, ef=32) == "OK"
    with pytest.raises(ResponseError):
        client.create("idx", 8)  # duplicate create is an -ERR

    centers = rng.standard_normal((4, 8)).astype(np.float32) * 2
    vecs = {}
    for i in range(96):
        v = centers[i % 4] + 0.1 * rng.standard_normal(8).astype(np.float32)
        name = f"e{i}"
        vecs[name] = v
        assert client.add("idx", name, v,
                          attribute=f"cat{i % 4}") == 1
    assert client.add("idx", "e0", vecs["e0"]) == 0  # dup name
    assert client.card("idx") == 96

    # plain VSIM: nearest to e7's vector should be e7 itself
    out = client.sim("idx", vecs["e7"], k=5, withscores=True)
    assert out[0][0] == "e7" and out[0][1] <= 1e-5
    assert len(out) == 5

    # VSIM ELE excludes the query element
    out = client.sim_element("idx", "e7", k=5)
    assert "e7" not in out and len(out) == 5

    # filtered VSIM: only cat2 elements come back
    out = client.sim("idx", vecs["e2"], k=5, filter="cat2")
    assert out and all(int(n[1:]) % 4 == 2 for n in out)

    # attributes round-trip as JSON
    assert client.execute("VSETATTR", "idx", "e3", '{"k": [1, 2]}') == 1
    import json

    assert json.loads(client.execute("VGETATTR", "idx", "e3")) == {"k": [1, 2]}
    assert client.execute("VGETATTR", "idx", "nope") is None

    # VSCAN pages a resumable cursor, no overlap between pages
    out = client.execute("VSCAN", "idx", "VALUES", 8,
                         *[repr(float(x)) for x in vecs["e1"]], "COUNT", 6)
    cursor, page1 = int(out[0]), [x.decode() for x in out[1:]]
    assert len(page1) == 6
    page2 = [x.decode() for x in
             client.execute("VSCAN", "idx", "CONT", cursor, "COUNT", 6)]
    assert page2 and not (set(page1) & set(page2))
    assert client.execute("VSCAN", "idx", "END", cursor) == 1

    # VREM removes from results
    assert client.remove("idx", "e7") == 1
    assert client.remove("idx", "e7") == 0
    out = client.sim("idx", vecs["e7"], k=5)
    assert "e7" not in out
    assert client.card("idx") == 95

    # VQUANT switches the default search mode to the quantized path
    assert client.execute("VQUANT", "idx", "spherical") == "OK"
    out = client.sim("idx", vecs["e6"], k=5)
    assert out[0] == "e6"

    # registry commands
    assert client.execute("VLIST") == [b"idx"]
    assert client.execute("VDROP", "idx") == 1
    assert client.execute("VDROP", "idx") == 0

    # unknown command -> -ERR
    from diskann_tpu.server import ResponseError

    with pytest.raises(ResponseError):
        client.execute("BOGUS")
