"""Decompose the streaming-insert cycle cost at 1M (VERDICT r3 item 5:
864 inserts/s vs 3.7-5.2k pts/s bulk build on the same chip class).

Builds a 1M packed index, deletes 50k (so the freelist is populated like a
churn cycle), then times ONE 50k insert with phase-level wall splits:
- host prep (slot assignment, padding, chunking)
- per-batch device dispatch wall (the one-behind sync makes batch i's wall
  include batch i-1's device time — the same overlap production uses)
- medoid + router refresh overhead (first batch vs steady batches)
A known-constant probe op runs before/after so contention is decidable.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
       scripts/profile_stream_insert.py > /tmp/prof_stream.log 2>&1 &
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

LOG = lambda *a: print("[pstream]", *a, file=sys.stderr, flush=True)

N = int(os.environ.get("PS_N", 1_000_000))
STEP = int(os.environ.get("PS_STEP", 50_000))
D = 128


@jax.jit
def _probe_op(a):
    def body(_, s):
        return jnp.tanh(s @ a)
    return jax.lax.fori_loop(0, 8, body, a)[:1, :1]


def probe():
    a = jnp.full((2048, 2048), 0.01, jnp.bfloat16)
    t0 = time.time()
    np.asarray(_probe_op(a))
    return round(time.time() - t0, 3)


def main():
    from diskann_tpu import GraphConfig, GraphIndex
    from diskann_tpu.bench.harness import make_clustered

    x_dev, _ = make_clustered(11, N + STEP, 64, D, n_clusters=4096,
                              sigma=0.35, device=True)
    cfg = GraphConfig(max_degree=64, l_build=100, alpha=1.2, beam_width=4,
                      build_max_hops=12, max_occlusion_size=256)
    cap = N + 40_000
    t0 = time.time()
    idx = GraphIndex.build(
        x_dev[:N], cfg, insert_batch_size=8192, search_batch_size=2048,
        build_mode="packed", packed_dp=64, capacity=cap,
    )
    build_s = time.time() - t0
    LOG(f"build {build_s:.0f}s ({N/build_s:.0f} pts/s) — the bulk anchor")

    probe(); LOG(f"probe after build: {probe()}s (clean ~1s)")

    # one churn cycle's delete to populate the freelist like the bench
    dead = np.arange(0, STEP, dtype=np.int64)
    t0 = time.time()
    idx.delete(dead, method="scan")
    np.asarray(idx.state.valid[:1])
    LOG(f"delete 50k: {time.time()-t0:.1f}s")

    new = np.asarray(x_dev[N:N + STEP])
    LOG(f"probe before insert: {probe()}s")

    # instrumented insert: wrap the span tracer to capture per-batch walls
    import diskann_tpu.trace as trace
    batch_walls = []
    orig_span = trace.span

    class timed_span:
        def __init__(self, name, **kw):
            self.name, self.kw = name, kw
        def __enter__(self):
            self.t0 = time.time()
        def __exit__(self, *a):
            if self.name == "insert.batch":
                batch_walls.append(round(time.time() - self.t0, 3))

    # insert() does `from diskann_tpu.trace import span` at call time, so
    # patching the trace module attribute is sufficient
    trace.span = timed_span
    try:
        t0 = time.time()
        idx.insert(new)
        np.asarray(idx.state.valid[:1])
        total = time.time() - t0
    finally:
        trace.span = orig_span

    LOG(f"insert 50k total: {total:.1f}s ({STEP/total:.0f}/s)")
    LOG(f"per-batch walls: {batch_walls}")
    LOG(f"sum(batch walls): {sum(batch_walls):.1f}s "
        f"(host overhead outside batches: {total - sum(batch_walls):.1f}s)")
    LOG(f"probe after insert: {probe()}s")

    # steady-state: a second 50k insert (no recompiles, freelist from the
    # same delete round is exhausted -> fresh slots past the HWM)
    idx.delete(np.arange(STEP, 2 * STEP, dtype=np.int64), method="scan")
    np.asarray(idx.state.valid[:1])
    batch_walls.clear()
    trace.span = timed_span
    try:
        t0 = time.time()
        idx.insert(np.asarray(x_dev[:STEP]) + 0.01)
        np.asarray(idx.state.valid[:1])
        total2 = time.time() - t0
    finally:
        trace.span = orig_span
    LOG(f"insert#2 50k total: {total2:.1f}s ({STEP/total2:.0f}/s); "
        f"batches: {batch_walls}")
    LOG(f"probe final: {probe()}s")


if __name__ == "__main__":
    main()
