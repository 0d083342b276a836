"""Fat-row expand kernel: TPU parity vs oracle + per-hop timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_fatrow_check.py
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

from diskann_tpu.ops.kernels.fatrow_expand import (  # noqa: E402
    fatrow_expand, fatrow_expand_ref,
)

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = int(os.environ.get("KC_N", 1_000_000))
B, W, RP, DP = 4096, 4, 84, 64
ROW = -(-(RP * (8 + DP)) // 128) * 128
ITERS = 24


def main():
    LOG(f"[kc] backend={jax.default_backend()} N={N} ROW={ROW}")
    key = jax.random.key(3)
    gen = jax.jit(lambda k: jax.random.randint(
        k, (N // 8, ROW), -127, 128, dtype=jnp.int8))
    rows = jnp.concatenate(
        [gen(jax.random.fold_in(key, i)) for i in range(8)], axis=0
    )
    beam = jax.random.randint(key, (B * W,), 0, N, dtype=jnp.int32)
    qiw = jax.random.randint(key, (B * W, DP), -127, 128, dtype=jnp.int8)
    np.asarray(rows[:1, :1])

    # ---- parity on a slice ----
    hdr_k, dots_k = fatrow_expand(rows, beam, qiw, rp=RP, dp=DP)
    hdr_r, dots_r = fatrow_expand_ref(rows, beam, qiw, rp=RP, dp=DP)
    hk, hr = np.asarray(hdr_k), np.asarray(hdr_r)
    dk, dr = np.asarray(dots_k), np.asarray(dots_r)
    LOG(f"[kc] hdr match: {(hk == hr).all()}  dots match: {(dk == dr).all()}")
    if not (hk == hr).all() or not (dk == dr).all():
        bad = np.nonzero((dk != dr).any(axis=1))[0][:5]
        LOG(f"[kc] first bad rows: {bad}, kernel={dk[bad[:1]][:, :6]}, "
            f"ref={dr[bad[:1]][:, :6]}")
        print("PARITY FAIL")
        return

    # ---- timing: chained hops (beam evolves from outputs) ----
    def chain(fn):
        def run(rows, beam0, qiw):
            def body(carry, _):
                beam, acc = carry
                hdr, dots = fn(rows, beam, qiw, rp=RP, dp=DP)
                nxt = jnp.abs(dots[:, 0] + beam) % N
                return (nxt.astype(jnp.int32),
                        acc + dots[:, 1].astype(jnp.float32) * 1e-30), None
            (b, acc), _ = jax.lax.scan(
                body, (beam0, jnp.zeros((B * W,), jnp.float32)),
                None, length=ITERS,
            )
            return acc
        return jax.jit(run)

    for name, fn in (("kernel", fatrow_expand), ("xla_ref", fatrow_expand_ref)):
        cf = chain(fn)
        t0 = time.time()
        out = cf(rows, beam, qiw)
        np.asarray(out[:1])
        first = time.time() - t0
        t0 = time.time()
        out = cf(rows, beam, qiw)
        np.asarray(out[:1])
        dt = time.time() - t0
        LOG(f"[kc] {name:8s} {dt/ITERS*1e3:8.3f} ms/hop (first {first:.0f}s)")
    print("DONE")


if __name__ == "__main__":
    main()
