"""Append kernel: TPU parity vs XLA scatter fallback + timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_append_check.py
Env: KA_CAP (default 200_000 for parity; use 1_000_000 for the perf run)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from diskann_tpu.graph import packed as pk  # noqa: E402
from diskann_tpu.ops.distance import Metric  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

CAP = int(os.environ.get("KA_CAP", 200_000))
E = int(os.environ.get("KA_E", 524_288))
D, DP, RS = 64, 64, 83


def build_state(key):
    rng = np.random.default_rng(0)
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((4096, D)).astype(np.float32), DP, Metric.L2
    )
    p = pk.alloc_packed(proj, pscale, pbias2, CAP, RS)
    codes = jax.random.randint(key, (CAP, DP), -127, 128, dtype=jnp.int8)
    aux = jax.random.uniform(key, (CAP,), jnp.float32, 0.0, 50.0)
    return p._replace(self_codes=codes, self_aux=aux)


def main():
    LOG(f"[ka] backend={jax.default_backend()} cap={CAP} E={E} "
        f"rp={pk.padded_degree(RS, DP)}")
    key = jax.random.key(1)
    p = build_state(key)
    nsec = p.nsec

    # edges: sorted by target, unique (tgt, slot)
    rng = np.random.default_rng(2)
    tgt = np.sort(rng.choice(CAP, size=E, replace=True)).astype(np.int32)
    # rank within equal-target runs -> slot
    slot = np.zeros(E, np.int32)
    run = 0
    for i in range(1, E):
        run = run + 1 if tgt[i] == tgt[i - 1] else 0
        slot[i] = run
    rp = p.r_pack
    ok = (slot < rp) & (rng.random(E) > 0.05)
    src = rng.integers(0, CAP, size=E).astype(np.int32)

    tgt_j = jnp.asarray(tgt)
    slot_j = jnp.asarray(slot)
    src_j = jnp.asarray(src)
    ok_j = jnp.asarray(ok)

    # append_edges dispatches on the env var at PYTHON level, so call it
    # eagerly (its internals are jitted) — a shared jit wrapper would reuse
    # one traced branch for both paths
    os.environ["DISKANN_NO_WORD_APPEND"] = "1"
    ref = pk.append_edges(p, tgt_j, slot_j, src_j, ok_j)
    ref_rows = np.asarray(ref.rows)
    LOG("[ka] oracle (XLA byte-scatter fallback) done")

    os.environ["DISKANN_NO_WORD_APPEND"] = "0"
    got = pk.append_edges(p, tgt_j, slot_j, src_j, ok_j)
    got_rows = np.asarray(got.rows)
    # dump-row (last nsec sector rows) order of dropped writes differs
    live = CAP * nsec
    match = (got_rows[:live] == ref_rows[:live]).all()
    LOG(f"[ka] word-append parity: {match}")
    if not match:
        bad = np.nonzero((got_rows[:live] != ref_rows[:live]).any(axis=1))[0]
        LOG(f"[ka] mismatching sector rows: {len(bad)}; first: {bad[:5]}")
        i = bad[0]
        db = np.nonzero(got_rows[i] != ref_rows[i])[0]
        LOG(f"[ka] sector row {i} (node {i // nsec} sec {i % nsec}) "
            f"byte diffs at {db[:12]} "
            f"got={got_rows[i][db[:6]]} ref={ref_rows[i][db[:6]]}")
        print("PARITY FAIL")
        return

    # timing (word path), donated chained calls
    t0 = time.time()
    q = pk.append_edges(got, tgt_j, slot_j, src_j, ok_j)
    np.asarray(q.rows[:1, :1])
    first = time.time() - t0
    t0 = time.time()
    iters = 4
    for _ in range(iters):
        q = pk.append_edges(q, tgt_j, slot_j, src_j, ok_j)
    np.asarray(q.rows[:1, :1])
    LOG(f"[ka] word append:  {(time.time()-t0)/iters*1e3:.1f} ms/batch "
        f"(first {first:.0f}s)")

    os.environ["DISKANN_NO_WORD_APPEND"] = "1"
    t0 = time.time()
    q = pk.append_edges(q, tgt_j, slot_j, src_j, ok_j)
    np.asarray(q.rows[:1, :1])
    first = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        q = pk.append_edges(q, tgt_j, slot_j, src_j, ok_j)
    np.asarray(q.rows[:1, :1])
    LOG(f"[ka] xla append:    {(time.time()-t0)/iters*1e3:.1f} ms/batch "
        f"(first {first:.0f}s)")
    print("DONE")


if __name__ == "__main__":
    main()
