"""AOT compile probe for insert_batch at 1M bench shapes.

Compiles (never runs) the batched insert program with ShapeDtypeStructs —
no data materialized — to bisect remote-compiler crashes by feature flag.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/compile_probe.py \
        [wordappend=0|1] [blockpatch=0|1] [n=1003520]
"""

import os
import sys
import time

for a in sys.argv[1:]:
    k, v = a.split("=")
    if k == "wordappend":
        os.environ["DISKANN_NO_WORD_APPEND"] = "0" if v == "1" else "1"
    if k == "blockpatch":
        os.environ["DISKANN_NO_BLOCK_PATCH"] = "0" if v == "1" else "1"

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/diskann_tpu_jax_cache"),
)

from diskann_tpu.graph import packed as pk  # noqa: E402
from diskann_tpu.graph.build import insert_batch  # noqa: E402
from diskann_tpu.graph.config import GraphConfig  # noqa: E402
from diskann_tpu.graph.state import GraphArrays  # noqa: E402

LOG = lambda *a: print(*a, file=sys.stderr, flush=True)

N = 1_003_520
M = 8192
D = 128
CFG = GraphConfig(max_degree=64, l_build=100, alpha=1.2, beam_width=4)
RS = CFG.max_degree_with_slack
DP = 64
RP = pk.padded_degree(RS, DP)
NSEC = pk.n_sectors(RP, DP)

for a in sys.argv[1:]:
    k, v = a.split("=")
    if k == "n":
        N = int(v)


def sds(shape, dt):
    return jax.ShapeDtypeStruct(shape, dt)


def main():
    LOG(f"[cp] backend={jax.default_backend()} N={N} "
        f"word={os.environ.get('DISKANN_NO_WORD_APPEND')} "
        f"patch={os.environ.get('DISKANN_NO_BLOCK_PATCH')}")
    state = GraphArrays(
        vectors=sds((N, D), jnp.float32),
        sq_norms=sds((N,), jnp.float32),
        adjacency=sds((N, RS), jnp.int32),
        degrees=sds((N,), jnp.int32),
        valid=sds((N,), jnp.bool_),
        vec_sum=sds((D,), jnp.float32),
    )
    packed = pk.PackedState(
        proj=sds((D, DP), jnp.float32),
        pscale=sds((DP,), jnp.float32),
        pbias2=sds((DP,), jnp.float32),
        self_codes=sds((N, DP), jnp.int8),
        self_aux=sds((N,), jnp.float32),
        rows=sds(((N + 1) * NSEC, 128), jnp.int8),
        r_pack=RP,
    )
    t0 = time.time()
    lowered = insert_batch.lower(
        state,
        sds((M,), jnp.int32),
        sds((M, D), jnp.float32),
        sds((M,), jnp.bool_),
        sds((1,), jnp.int32),
        CFG,
        packed,
    )
    LOG(f"[cp] lowered in {time.time()-t0:.0f}s")
    t0 = time.time()
    compiled = lowered.compile()
    LOG(f"[cp] compiled in {time.time()-t0:.0f}s")
    mem = compiled.memory_analysis()
    LOG(f"[cp] memory: {mem}")
    print("COMPILE OK")


if __name__ == "__main__":
    main()
