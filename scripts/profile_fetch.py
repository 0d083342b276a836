"""Does copy_to_host_async overlap D2H with compute on the axon relay?

Times three ways of getting a [4, 2048, 22] i32 result set to host:
  A. stacked:   jnp.stack(outs) on device, ONE np.asarray     (current search)
  B. seq:       np.asarray per sub-batch output, back to back
  C. async:     copy_to_host_async per output right after dispatch,
                then np.asarray after a compute-sized delay

If C's final asarray is ~free, index.search should prefetch per sub-batch
instead of the stacked fetch (saves the whole fetch+RTT tail, ~38ms per
8192-query batch at bench shape = ~24% of search wall).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fetch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)


@jax.jit
def work(q, w):
    # stand-in for one sub-batch search: a few chained matmuls + pack
    def body(i, x):
        return jnp.tanh(x @ w)

    x = jax.lax.fori_loop(0, 8, body, q)
    return (x[:, :22] * 1e4).astype(jnp.int32)


def main():
    rng = np.random.default_rng(0)
    q = [jnp.asarray(rng.standard_normal((2048, 512)).astype(np.float32))
         for _ in range(4)]
    w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32))

    # warm
    np.asarray(work(q[0], w)[:1, :1])

    for label in ("stacked", "seq", "async"):
        t0 = time.time()
        outs = [work(qi, w) for qi in q]
        if label == "async":
            for o in outs:
                try:
                    o.copy_to_host_async()
                except Exception as e:
                    LOG("copy_to_host_async unavailable:", e)
        t_dispatch = time.time() - t0
        if label == "stacked":
            arr = np.asarray(jnp.stack(outs))
        else:
            arr = np.stack([np.asarray(o) for o in outs])
        dt = time.time() - t0
        LOG(f"[fetch] {label:8s} total {dt*1e3:7.1f} ms "
            f"(dispatch {t_dispatch*1e3:.1f} ms) sum={int(arr.sum())}")


if __name__ == "__main__":
    main()
